package graft.sources

import scala.xml.XML

/** Atom feed link extraction (S7, etl/handlers/atom_feed.py:34-116):
  * parse the feed XML, collect enclosure/alternate link hrefs plus
  * entry-content hrefs, dedup preserving first-seen order (T4's
  * `urls_seen` set semantics, atom_feed.py:83-103).
  *
  * Driver-side by design: a feed is a handful of links; the downloads
  * they point at are what Spark reads.
  */
object AtomFeedSource {

  def extractLinks(atomXml: String): Seq[String] = {
    val feed = XML.loadString(atomXml)
    val linkHrefs = (feed \\ "link").flatMap { l =>
      val rel = (l \ "@rel").text
      if (rel.isEmpty || rel == "enclosure" || rel == "alternate")
        Option((l \ "@href").text).filter(_.nonEmpty)
      else None
    }
    val contentSrcs = (feed \\ "content").flatMap(c =>
      Option((c \ "@src").text).filter(_.nonEmpty))
    val seen = scala.collection.mutable.LinkedHashSet[String]()
    (linkHrefs ++ contentSrcs).foreach(seen.add)
    seen.toSeq
  }

  /** Keep only data-bearing links (zip/gpkg/geojson), mirroring the
    * per-link type routing at atom_feed.py:118-263.
    */
  def dataLinks(links: Seq[String]): Seq[String] =
    links.filter { u =>
      val lower = u.toLowerCase
      lower.endsWith(".zip") || lower.endsWith(".gpkg") ||
        lower.endsWith(".json") || lower.endsWith(".geojson")
    }
}
