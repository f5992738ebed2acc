package graft.tmpbench
import org.apache.spark.sql.SparkSession
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder.master("local[4]")
      .config("spark.sql.legacy.parquet.nanosAsLong","true")
      .config("spark.ui.enabled","false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    println("ENTRY_ROWS=" + graft.SparkEntry.entry(s).count)
    s.stop()
  }
}
