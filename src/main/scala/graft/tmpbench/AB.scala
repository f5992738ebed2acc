import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object AB {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.ui.enabled","false")
      .config("spark.sql.legacy.parquet.nanosAsLong","true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").filter(col("doc_id") < 10000)
    def t(name: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime()-t0)/1e9
      }
      println("ABRES " + name + " median=" + times.sorted.apply(1) + " runs=" + times.mkString(","))
    }
    t("warm")(docs.limit(10))
    t("sig_fused")(graft.operators.Dedup.minhashSignaturesPortable(docs, 3, 64))
    t("sig_composed")(graft.operators.Dedup.minhashSignaturesPortableComposed(docs, 3, 64))
    t("pairs_full")(graft.operators.Dedup.minhashNearDupPairsPortable(docs))
    spark.stop()
  }
}
