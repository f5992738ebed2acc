package graft.tools

import org.apache.spark.sql.SparkSession

import graft.operators.Multimodal.MediaRow

/** One-shot generator for the committed media fixture
  * (fixtures/media.parquet). Pure function of the ids — xorshift PRNG, no
  * java.util.Random — so the committed bytes are reproducible.
  *
  * Layout per blob: 16-byte header (big-endian width at 0-3, height at
  * 4-7, channels-1 at byte 11, rest zero; all values small positive so
  * header parsing needs no signed-int mirroring in the oracle), then a
  * pseudo-random payload of ≥ 48 bytes (images) / ≥ 64 bytes (videos,
  * so every video has at least one 64-byte frame).
  */
object GenMediaFixture {

  def blob(id: Long, kind: String): Array[Byte] = {
    var s = id * 2654435761L +
      (kind match { case "video" => 99991L; case "audio" => 31337L; case _ => 7L })
    def nx(): Long = { s ^= s << 13; s ^= s >>> 7; s ^= s << 17; s }
    def pos(m: Int): Int = ((nx() >>> 1) % m).toInt
    val payload = if (kind == "video") 64 + pos(960) else 48 + pos(480)
    val b = new Array[Byte](16 + payload)
    val w  = 16 + pos(2000)
    val h  = 16 + pos(2000)
    val ch = 1 + pos(4)
    b(0) = (w >> 24).toByte; b(1) = (w >> 16).toByte; b(2) = (w >> 8).toByte; b(3) = w.toByte
    b(4) = (h >> 24).toByte; b(5) = (h >> 16).toByte; b(6) = (h >> 8).toByte; b(7) = h.toByte
    b(11) = (ch - 1).toByte
    var i = 16
    while (i < b.length) { b(i) = nx().toByte; i += 1 }
    b
  }

  def rows: Seq[MediaRow] =
    (0L until 300L).map(i => MediaRow(i, "image", blob(i, "image"))) ++
      (1000L until 1050L).map(i => MediaRow(i, "video", blob(i, "video"))) ++
      (2000L until 2100L).map(i => MediaRow(i, "audio", blob(i, "audio")))

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse(graft.operators.Multimodal.MediaFixturePath)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    rows.toDF().coalesce(1).write.mode("overwrite").parquet(out)
    println(s"[gen-media-fixture] wrote ${rows.size} rows to $out")
    spark.stop()
  }
}
