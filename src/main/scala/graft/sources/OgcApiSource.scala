package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.geo.{GeoFunctions, Geometry}

/** OGC API Features reader (S6, etl/handlers/ogc_api.py:170-539):
  * collection discovery → per-collection items paging via HATEOAS
  * `next` links → normalized feature rows; CRS determination with the
  * reference's storageCrs parse + WGS84 coordinate-range sniff
  * (G5, ogc_api.py:541-656).
  *
  * Zero-egress shape: a service is a directory; `collections.json` is
  * the discovery document; item pages are GeoJSON files whose
  * `links[rel=next].href` name the next page file. Link-following is a
  * DRIVER loop (as in the reference — the link chain is inherently
  * sequential), but it only collects FILE NAMES; the data read is one
  * Spark job over all discovered pages, so page parsing is distributed.
  */
object OgcApiSource {

  private def mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  final case class Collection(id: String, title: String, storageCrs: Option[String])

  // R5 wiring: the collections.json discovery document is re-fetched by
  // EVERY readCollection (each needs its collection's storageCrs), so a
  // k-collection readService would hit the server k+1 times without
  // caching — with it, one fetch + k cache hits inside the TTL window
  // (performance.py:435-466 cached_request over ogc_api.py discovery).
  private[sources] val discoveryCache =
    new graft.util.ResponseCache[Seq[Collection]](maxSize = 256)

  /** Collection discovery (cached per service path for `ttlSeconds`,
    * the source-config knob — performance.py:155 analog).
    */
  def discoverCollections(serviceDir: String, ttlSeconds: Long = 3600): Seq[Collection] =
    discoveryCache.getOrElseUpdate(
      graft.util.ResponseCache.requestKey(serviceDir,
        Map("op" -> "discoverCollections")), Some(ttlSeconds)) {
      val f = java.nio.file.Paths.get(serviceDir, "collections.json")
      val root = mapper.readTree(java.nio.file.Files.readString(f))
      Option(root.get("collections")).map(_.elements().asScala.toSeq).getOrElse(Seq.empty)
        .map { c =>
          Collection(
            id = c.get("id").asText(),
            title = Option(c.get("title")).map(_.asText()).getOrElse(""),
            storageCrs = Option(c.get("storageCrs")).map(_.asText()))
        }
    }

  /** Follow `next` links from the first page, returning the page files
    * in order (terminates on missing/duplicate link — the reference's
    * loop guard, ogc_api.py:811-816).
    */
  def pageChain(collectionDir: String, first: String = "items-1.json"): Seq[String] = {
    val seen = scala.collection.mutable.LinkedHashSet[String]()
    var cur: Option[String] = Some(first)
    while (cur.isDefined && !seen.contains(cur.get)) {
      val name = cur.get
      seen += name
      val p = java.nio.file.Paths.get(collectionDir, name)
      cur =
        if (!java.nio.file.Files.exists(p)) None
        else {
          val root = mapper.readTree(java.nio.file.Files.readString(p))
          Option(root.get("links")).flatMap(_.elements().asScala
            .find(l => Option(l.get("rel")).exists(_.asText() == "next"))
            .flatMap(l => Option(l.get("href")).map(_.asText())))
        }
    }
    seen.toSeq.map(n => s"$collectionDir/$n")
  }

  /** storageCrs → EPSG (regex parse, CRS84 → 4326), overridable per
    * source; the WGS84 coordinate-range sniff corrects mislabeled data
    * (ogc_api.py:621-656: |x|≤180 ∧ |y|≤90 over a sample ⇒ 4326).
    */
  def determineSrid(
      storageCrs: Option[String],
      sampleBounds: Seq[(Double, Double)],
      override_ : Option[Int] = None): Int = {
    override_.getOrElse {
      val declared = storageCrs.map(GeoJsonSource.parseSrid(_, 4326)).getOrElse(4326)
      if (declared != 4326 && Geometry.looksLikeWgs84(sampleBounds)) 4326 else declared
    }
  }

  /** Read one collection: page chain → one distributed GeoJSON read →
    * normalized rows with collection lineage + corrected srid.
    */
  def readCollection(
      spark: SparkSession,
      serviceDir: String,
      collectionId: String,
      bbox: Option[Geometry.BBox] = None,
      crsOverride: Option[Int] = None): DataFrame = {
    val dir   = s"$serviceDir/collections/$collectionId"
    val pages = pageChain(dir)
    require(pages.nonEmpty, s"no item pages for collection $collectionId")
    val base = GeoJsonSource.readPaths(spark, pages)
    val meta = discoverCollections(serviceDir).find(_.id == collectionId)
    val sample = base.select("xmin", "ymin").limit(10).collect()
      .map(r => (r.getDouble(0), r.getDouble(1))).toSeq
    val srid = determineSrid(meta.flatMap(_.storageCrs), sample, crsOverride)
    val withMeta = base
      .withColumn("srid", lit(srid))
      .withColumn("collection_id", lit(collectionId))
    bbox match {
      case Some(b) => withMeta.filter(GeoFunctions.bboxIntersects(
        col("xmin"), col("ymin"), col("xmax"), col("ymax"), b))
      case None => withMeta
    }
  }

  /** All (or selected) collections unioned, mirroring the reference's
    * per-collection fan-out (ogc_api.py:299-420).
    */
  def readService(
      spark: SparkSession,
      serviceDir: String,
      collectionIds: Seq[String] = Seq.empty,
      bbox: Option[Geometry.BBox] = None,
      discoveryTtlSeconds: Long = 3600): DataFrame = {
    val ids = if (collectionIds.nonEmpty) collectionIds
      else discoverCollections(serviceDir, discoveryTtlSeconds).map(_.id)
    ids.map(readCollection(spark, serviceDir, _, bbox)).reduce(_ unionByName _)
  }
}
