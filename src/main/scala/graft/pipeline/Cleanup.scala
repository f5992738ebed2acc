package graft.pipeline

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Pre-write hygiene (R8, etl/utils/cleanup.py:19-100): a managed-table
  * write fails with LOCATION_ALREADY_EXISTS when a previous run crashed
  * between writing files and committing catalog metadata. Mirror the
  * reference's pre-run wipe: if the catalog does not know the table but
  * its warehouse location exists, remove the orphan directory.
  */
object Cleanup {

  def ensureWritable(spark: SparkSession, db: String, table: String): Unit = {
    if (spark.catalog.tableExists(s"`$db`.`$table`")) return
    if (!spark.catalog.databaseExists(db)) return
    val dbLocation = spark.catalog.getDatabase(db).locationUri
    val loc  = new Path(new Path(dbLocation), table.toLowerCase)
    val fs   = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
  }
}
