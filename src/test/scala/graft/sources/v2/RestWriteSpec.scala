package graft.sources.v2

import java.io.File

import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RestWriteSpec extends SparkSpec {
  import spark.implicits._

  private def editFiles(dir: String): Seq[File] =
    Option(new File(dir, "edits").listFiles()).getOrElse(Array.empty)
      .filter(_.getName.startsWith("applyEdits-")).toSeq.sortBy(_.getName)

  private def manifest(dir: String) =
    new ObjectMapper().readTree(new File(new File(dir, "edits"), "_SUCCESS"))

  private def totalEdits(dir: String): Int = {
    val m = new ObjectMapper()
    editFiles(dir).map(f => m.readTree(f).get("edits").size()).sum
  }

  test("append writes one committed batch per partition plus a manifest") {
    val dir = java.nio.file.Files.createTempDirectory("graft_rest_write").toString
    val df  = (1L to 100L).map(i => (i, s"name$i", i * 1.5)).toDF("id", "name", "score")
    df.repartition(4).write.format("graft-rest").mode("append").save(dir)

    assert(editFiles(dir).size == 4)
    assert(totalEdits(dir) == 100)
    assert(manifest(dir).get("n_edits").asLong() == 100L)
    assert(manifest(dir).get("n_batches").asInt() == 4)
    // two-phase commit leaves no stragglers behind
    val staging = Option(new File(dir, ".staging").listFiles()).getOrElse(Array.empty)
    assert(staging.isEmpty, s"staging not drained: ${staging.map(_.getName).mkString(",")}")
  }

  test("overwrite truncates the previous edit session") {
    val dir = java.nio.file.Files.createTempDirectory("graft_rest_write_t").toString
    (1L to 50L).toDF("id").repartition(2)
      .write.format("graft-rest").mode("append").save(dir)
    assert(totalEdits(dir) == 50)
    (1L to 7L).toDF("id").repartition(1)
      .write.format("graft-rest").mode("overwrite").save(dir)
    assert(editFiles(dir).size == 1)
    assert(totalEdits(dir) == 7)
    assert(manifest(dir).get("n_edits").asLong() == 7L)
  }

  test("abort paths leave no partial state: task abort and job abort") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.types._
    import org.apache.spark.unsafe.types.UTF8String
    val dir    = java.nio.file.Files.createTempDirectory("graft_rest_abort").toString
    val schema = StructType(Seq(StructField("id", LongType), StructField("name", StringType)))
    def staged = Option(new File(dir, ".staging").listFiles()).getOrElse(Array.empty)

    // task abort before commit: nothing was ever staged
    val w1 = new RestEditsWriter(dir, schema, 0, 1L)
    w1.write(InternalRow(1L, UTF8String.fromString("a")))
    w1.abort()
    assert(staged.isEmpty)

    // job abort after task commit: the staged batch is rolled back
    val w2  = new RestEditsWriter(dir, schema, 1, 2L)
    w2.write(InternalRow(2L, UTF8String.fromString("b")))
    val msg = w2.commit()
    assert(staged.length == 1)
    new RestBatchWrite(dir, schema, truncate = false)
      .abort(Array(msg))
    assert(staged.isEmpty)
    assert(!new File(dir, "edits").exists())
  }

  test("feature rows round-trip through the connector schema types") {
    val dir = java.nio.file.Files.createTempDirectory("graft_rest_write_m").toString
    val df = Seq((0, 1L, Map("name" -> "a", "kind" -> "x"), "POLYGON", "POLYGON((0 0,1 0,1 1,0 0))",
        3006, 0.0, 0.0, 1.0, 1.0))
      .toDF("layer_id", "feature_id", "properties", "geom_type", "geometry",
        "srid", "xmin", "ymin", "xmax", "ymax")
    df.write.format("graft-rest").mode("append").save(dir)
    val edit = new ObjectMapper().readTree(editFiles(dir).head).get("edits").get(0)
    assert(edit.get("feature_id").asLong() == 1L)
    assert(edit.get("properties").get("name").asText() == "a")
    assert(edit.get("geometry").asText().startsWith("POLYGON"))
    assert(edit.get("xmax").asDouble() == 1.0)
  }
}
