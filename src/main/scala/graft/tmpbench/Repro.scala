package graft.tmpbench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Repro {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val df = Seq((1L, "only two"), (2L, ""), (3L, "a b c d")).toDF("doc_id", "text")
    try {
      val r = df.select($"doc_id",
        graft.functions.TextFunctions.shingles(col("text"), 3).as("sh")).collect()
      println("SHORTDOC OK: " + r.mkString(" | "))
    } catch { case e: Throwable => println("SHORTDOC THROWS: " + e.getMessage.take(300)) }
    spark.stop()
  }
}
