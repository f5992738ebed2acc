package graft.tools

import org.apache.hadoop.fs.Path

import graft.operators.WriterLease

/** Two-process mutual-exclusion drill for the writer lease
  * (`runMain`/fork target of WriterLeaseSpec's two-JVM test — no Spark
  * session, raw Hadoop FS only, so a child JVM costs ~1 s to start):
  * loop `iters` times acquiring the lease at `lockPath`, and inside
  * each hold assert SOLE ownership through a witness directory — drop
  * a token file, check no other racer's token is present, remove it,
  * release. Any co-presence writes a `VIOLATION_*` marker the parent
  * spec fails on. This races the actual atomic-create acquire path
  * across real process boundaries — the thing the in-process specs
  * can only simulate with planted lease files.
  */
object LeaseRacer {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: LeaseRacer <lockPath> <witnessDir> <iters>")
    val lock    = new Path(args(0))
    val witness = new java.io.File(args(1))
    val iters   = args(2).toInt
    val fs   = lock.getFileSystem(new org.apache.hadoop.conf.Configuration())
    val self = ProcessHandle.current().pid()
    witness.mkdirs()
    var i = 0
    while (i < iters) {
      WriterLease.acquireRaw(fs, lock, staleMs = 600000L, waitMs = 120000L)
      try {
        val others = Option(witness.listFiles()).getOrElse(Array.empty)
          .filter(f => f.getName.startsWith("tok_") &&
            f.getName != s"tok_$self")
        if (others.nonEmpty) {
          val v = new java.io.File(witness, s"VIOLATION_${self}_$i")
          val out = new java.io.FileOutputStream(v)
          try out.write(others.map(_.getName).mkString(",").getBytes("UTF-8"))
          finally out.close()
        }
        val tok = new java.io.File(witness, s"tok_$self")
        tok.createNewFile()
        Thread.sleep(2L)
        tok.delete()
        ()
      } finally WriterLease.releaseRaw(fs, lock)
      i += 1
    }
    println(s"RACER_DONE pid=$self iters=$iters")
  }
}
