package graft.operators

import scala.sys.process._

import graft.SparkSpec
import graft.tools.CkptFailureDrill

/** Executor-loss drill for the reliable-checkpoint path (r12 verdict
  * #4): [[graft.tools.CkptFailureDrill]] runs connectedComponents on a
  * `local-cluster[2,1,1024]` (real executor JVMs) and kills BOTH
  * executors mid-run. Launched here as child JVMs (a second
  * SparkContext cannot share this suite JVM):
  *
  *  - `reliable` (checkpoint dir on shared storage) must CONVERGE to
  *    labels bit-identical to a healthy in-process run;
  *  - `local` (localCheckpoint) must DIE — the blocks died with the
  *    executors and the truncated lineage cannot replay — which is
  *    exactly why `spark.graft.checkpointDir` exists for cluster runs.
  */
class ClusterFailureSpec extends SparkSpec {

  private def runDrill(args: String*): (Int, String) = {
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar"
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val javaBin = s"${sys.props("java.home")}/bin/java"
    val cmd = Seq(javaBin) ++ addOpens ++ Seq(
      "-Xmx2g", "-Dspark.ui.enabled=false",
      "-cp", sys.props("java.class.path"),
      "graft.tools.CkptFailureDrill") ++ args
    val out = new StringBuilder
    val proc = Process(cmd, None,
      "SPARK_HOME" -> "/opt/spark", "SPARK_SCALA_VERSION" -> "2.13")
      .run(ProcessLogger(
        l => out.synchronized { out.append(l).append('\n') },
        l => if (l.contains("[drill]")) out.synchronized { out.append(l).append('\n') }))
    // hard timebox: a hung cluster drill must fail, not wedge the suite
    val done = new java.util.concurrent.CompletableFuture[Int]()
    new Thread(() => done.complete(proc.exitValue())).start()
    val rc =
      try done.get(8, java.util.concurrent.TimeUnit.MINUTES)
      catch { case _: java.util.concurrent.TimeoutException =>
        proc.destroy(); fail("drill timed out after 8 minutes")
      }
    (rc, out.synchronized(out.toString))
  }

  test("reliable checkpoints survive losing every executor mid-CC, bit-identically") {
    // healthy in-process run = the expected labels (and their digest)
    val healthy = Clusters.connectedComponents(
        CkptFailureDrill.chainEdges(spark), "a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(healthy.size == 1000 &&
      healthy.forall { case (id, c) => c == (id / 25) * 25 },
      "healthy CC must label every node with its chain head")
    val expectDigest = CkptFailureDrill.labelDigest(healthy)

    val ckpt = java.nio.file.Files.createTempDirectory("graft_drill_ckpt")
    val (rc, out) = runDrill("reliable", ckpt.toString)
    assert(rc == 0 && out.contains("DRILL_OK"),
      s"reliable drill did not converge (rc=$rc):\n${out.takeRight(2000)}")
    assert(out.contains(s"LABELS $expectDigest n=1000"),
      s"reliable drill labels diverged from the healthy run:\n" +
        out.linesIterator.filter(_.startsWith("LABELS")).mkString("\n"))
    assert(out.contains("killing executor"), "the drill never killed an executor")
  }

  test("localCheckpoint dies with the executors (why checkpointDir exists)") {
    val (rc, out) = runDrill("local")
    assert(rc == 0, s"drill JVM itself must exit cleanly, got rc=$rc")
    assert(out.contains("DRILL_FAILED"),
      s"localCheckpoint run unexpectedly survived executor loss:\n${out.takeRight(2000)}")
    assert(out.contains("CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND") ||
        out.contains("Checkpoint block"),
      s"expected the lost-block failure class:\n" +
        out.linesIterator.filter(_.startsWith("DRILL_FAILED")).mkString("\n"))
  }
}
