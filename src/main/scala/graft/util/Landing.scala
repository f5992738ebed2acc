package graft.util

import java.io.{BufferedOutputStream, FileOutputStream, InputStream}
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.zip.ZipInputStream

/** File-landing utilities (SURVEY §2.1 S1/S2 + §2.5 F7): the driver-side
  * concerns around getting bytes onto storage Spark can scan —
  * idempotent cached copy (the "download" in a zero-egress environment
  * is stream-to-disk), zip extraction into a staging dir, and
  * Content-Disposition filename parsing.
  *
  * References: etl/utils/io.py:25-91 (download cache check :28-30,
  * 8 KiB chunking :56-79, extract_zip :87-91), etl/utils/http.py:19-48.
  */
object Landing {

  final val ChunkSize = 8192 // io.py:12

  /** Stream to `dest` unless it already exists non-empty (the cache
    * check at io.py:28-30). Returns (path, bytes, fromCache).
    *
    * `maxAgeMillis` adds the R5 TTL semantics of the reference's
    * response cache (performance.py:233: entries expire `ttl` after
    * being stored): a landed file older than the TTL is re-streamed
    * rather than served from cache, so a long-running pipeline picks up
    * upstream changes without manual cache busting. `None` keeps the
    * original land-once behavior. The clock is injectable for specs.
    */
  def land(
      in: () => InputStream,
      dest: Path,
      maxAgeMillis: Option[Long] = None,
      clock: () => Long = () => System.currentTimeMillis()): (Path, Long, Boolean) = {
    val fresh = Files.exists(dest) && Files.size(dest) > 0 && (maxAgeMillis match {
      case Some(maxAge) => clock() - Files.getLastModifiedTime(dest).toMillis <= maxAge
      case None         => true
    })
    if (fresh)
      return (dest, Files.size(dest), true)
    Files.createDirectories(dest.getParent)
    val tmp = dest.resolveSibling(dest.getFileName.toString + ".part")
    val out = new BufferedOutputStream(new FileOutputStream(tmp.toFile))
    var total = 0L
    try {
      val stream = in()
      try {
        val buf = new Array[Byte](ChunkSize)
        var n   = stream.read(buf)
        while (n >= 0) {
          if (n > 0) { out.write(buf, 0, n); total += n }
          n = stream.read(buf)
        }
      } finally stream.close()
    } finally out.close()
    Files.move(tmp, dest, StandardCopyOption.REPLACE_EXISTING) // atomic-ish commit
    (dest, total, false)
  }

  /** Unpack a zip into `destDir` (io.py:87-91); entry names sanitized
    * against path traversal. Returns extracted paths.
    */
  def extractZip(archive: Path, destDir: Path): Seq[Path] = {
    Files.createDirectories(destDir)
    val out = Seq.newBuilder[Path]
    val zin = new ZipInputStream(Files.newInputStream(archive))
    try {
      var e = zin.getNextEntry
      while (e != null) {
        if (!e.isDirectory) {
          val target = destDir.resolve(e.getName).normalize()
          require(target.startsWith(destDir.normalize()),
            s"zip entry escapes destination: ${e.getName}")
          Files.createDirectories(target.getParent)
          Files.copy(zin, target, StandardCopyOption.REPLACE_EXISTING)
          out += target
        }
        zin.closeEntry()
        e = zin.getNextEntry
      }
    } finally zin.close()
    out.result()
  }

  /** Land a URL through the pooled per-origin HTTP session (R6 + S1 —
    * the reference's `_download_and_stage_one` download half,
    * file.py:228-371 riding http_session.py's pooled session): the
    * landed filename prefers the response's Content-Disposition (F7,
    * http.py:19-48), falling back to the URL basename; bytes stream to
    * `destDir/<filename>` through the [[land]] cache (re-runs inside
    * `maxAgeMillis` never re-request — the fresh-file short-circuit
    * fires before any connection is made). Returns
    * (path, bytes, fromCache).
    *
    * The filename probe only runs on a cache MISS: when every candidate
    * name (URL basename, prior Content-Disposition names recorded as
    * siblings) is stale or absent, one streaming GET serves both the
    * name and the bytes.
    */
  def landUrl(
      url: String,
      destDir: Path,
      maxAgeMillis: Option[Long] = None,
      httpCfg: Http.SessionConfig = Http.SessionConfig(),
      clock: () => Long = () => System.currentTimeMillis()): (Path, Long, Boolean) = {
    // the extractZip traversal rule applied to SERVER-influenced names:
    // no separators, no dot-prefixed/relative names — a hostile value
    // falls back to the generic stem rather than escaping destDir
    def safeName(n: String): Option[String] =
      Some(n).filter(v => v.nonEmpty && !v.contains('/') &&
        !v.contains('\\') && !v.startsWith("."))
    val basename = {
      // URI.getPath percent-decodes ONCE; decoding again would turn a
      // literal '%2F' segment into a separator (and '+' into a space)
      val p = Option(java.net.URI.create(url).getPath).getOrElse("")
      safeName(p.split('/').lastOption.getOrElse("")).getOrElse("download")
    }
    // fast path: a prior landing of THIS URL is fresh — serve it with
    // no network touch at all. The sidecar records (url, landed name):
    // the name because Content-Disposition may beat the URL basename,
    // the url because two URLs sharing a basename (a version-bumped
    // path) must never serve each other's bytes.
    val sidecar = destDir.resolve(s".landed-$basename")
    val knownName: Option[String] =
      if (Files.isRegularFile(sidecar)) {
        val lines = Files.readAllLines(
          sidecar, java.nio.charset.StandardCharsets.UTF_8)
        if (lines.size >= 2 && lines.get(0) == url)
          Some(lines.get(1).trim).filter(_.nonEmpty)
        else None
      } else None
    knownName.foreach { name =>
      val cached = destDir.resolve(name)
      val fresh = Files.exists(cached) && Files.size(cached) > 0 &&
        maxAgeMillis.forall(a =>
          clock() - Files.getLastModifiedTime(cached).toMillis <= a)
      if (fresh) return (cached, Files.size(cached), true)
    }
    // miss: ONE streaming GET supplies the authoritative filename and
    // the bytes. A URL change invalidates the landed file even when the
    // target name collides (maxAge -1 forces the re-stream); same-URL
    // expiry re-streams through the normal TTL leg.
    val (_, headers, body) = Http.fetchStream(url, httpCfg)
    val name = headers.get("content-disposition")
      .flatMap(filenameFromContentDisposition)
      .flatMap(safeName)
      .getOrElse(basename)
    val age = if (knownName.contains(name)) maxAgeMillis else Some(-1L)
    val out =
      try land(() => body, destDir.resolve(name), age, clock)
      finally body.close()
    // tmp + ATOMIC_MOVE, matching land()'s commit discipline: a crash
    // mid-write must never leave a truncated sidecar
    val sidecarTmp = sidecar.resolveSibling(s"${sidecar.getFileName}.tmp")
    Files.write(sidecarTmp, s"$url\n$name".getBytes(
      java.nio.charset.StandardCharsets.UTF_8))
    Files.move(sidecarTmp, sidecar,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    out
  }

  /** Content-Disposition filename parse (http.py:19-48):
    * `filename*=UTF-8''…` (RFC 5987) preferred over `filename=…`,
    * quotes stripped, URL-decoded.
    */
  def filenameFromContentDisposition(header: String): Option[String] = {
    if (header == null) return None
    val ext   = "filename\\*\\s*=\\s*(?:UTF-8'')?([^;]+)".r
    val plain = "filename\\s*=\\s*\"?([^\";]+)\"?".r
    val raw = ext.findFirstMatchIn(header).map(_.group(1))
      .orElse(plain.findFirstMatchIn(header).map(_.group(1)))
    raw.map(v => java.net.URLDecoder.decode(v.trim.stripPrefix("\"").stripSuffix("\""), "UTF-8"))
      .filter(_.nonEmpty)
  }

  /** stem/extension split used for staged-file naming (http.py:51-130). */
  def stemAndExt(filename: String): (String, String) = {
    val i = filename.lastIndexOf('.')
    if (i <= 0) (filename, "") else (filename.substring(0, i), filename.substring(i + 1))
  }

  /** F8: authority = first path component under the staging root
    * (etl/utils/paths.py:22-28), `UNKNOWN` fallback.
    */
  def authorityFromPath(stagingRoot: Path, file: Path): String = {
    val rel = stagingRoot.normalize().relativize(file.normalize())
    if (rel.getNameCount > 1) rel.getName(0).toString else "UNKNOWN"
  }
}
