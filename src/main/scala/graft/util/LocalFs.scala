package graft.util

/** Local-filesystem walking shared by the bench tools and specs that
  * inspect layout directories. LOCAL ONLY by design (java.io.File): the
  * call sites measure warehouse-/tmpdir-resident layouts; production
  * layout access goes through the Hadoop FileSystem API in the
  * operators themselves.
  */
object LocalFs {

  /** Every regular file under `dir`, recursively. */
  def walkFiles(dir: java.io.File): Seq[java.io.File] =
    if (dir.isDirectory)
      Option(dir.listFiles).toSeq.flatten.toSeq.flatMap(walkFiles)
    else Seq(dir)

  /** Count of parquet data files under `dir`. */
  def parquetFileCount(dir: String): Int =
    walkFiles(new java.io.File(dir)).count(_.getName.endsWith(".parquet"))

  /** Total bytes under `dir`. */
  def dirBytes(dir: String): Long =
    walkFiles(new java.io.File(dir)).map(_.length()).sum
}
