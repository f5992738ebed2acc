package graft.util

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Clusters
import graft.streaming.IncrementalSink

class CheckpointsSpec extends SparkSpec {
  import spark.implicits._

  private def withTempDir[A](f: String => A): A = {
    val dir = Files.createTempDirectory("graft_ckpt_spec").toFile
    try f(dir.getAbsolutePath)
    finally {
      def rm(x: java.io.File): Unit = {
        Option(x.listFiles()).foreach(_.foreach(rm)); x.delete(); ()
      }
      rm(dir)
    }
  }

  test("stage with a reliable dir writes checkpoint files under it") {
    withTempDir { dir =>
      val staged = Checkpoints.stage(Seq(1, 2, 3).toDF("x"), Some(dir))
      assert(staged.as[Int].collect().sorted.sameElements(Array(1, 2, 3)))
      // the RDD must actually be reliably checkpointed (not local):
      // its checkpoint file lives under the requested root
      val cf = staged.rdd.getCheckpointFile
        .orElse(staged.queryExecution.toRdd.getCheckpointFile)
      def hasCkptFiles(f: java.io.File): Boolean =
        f.isFile && f.getName.startsWith("part-") ||
          Option(f.listFiles()).exists(_.exists(hasCkptFiles))
      assert(hasCkptFiles(new java.io.File(dir)),
        s"no checkpoint part-files under $dir (getCheckpointFile=$cf)")
    }
  }

  test("repeated stage calls reuse one checkpoint subdir (no littering)") {
    withTempDir { dir =>
      Checkpoints.stage(Seq(1).toDF("x"), Some(dir))
      Checkpoints.stage(Seq(2).toDF("x"), Some(dir))
      // setCheckpointDir appends one UUID subdir; both calls share it
      val subdirs = Option(new java.io.File(dir).listFiles()).get.filter(_.isDirectory)
      assert(subdirs.length == 1, s"expected one shared subdir, got ${subdirs.length}")
    }
  }

  test("connectedComponents converges identically with a reliable dir") {
    withTempDir { dir =>
      // multi-round graph: 3-hop chain + a second component
      val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("a", "b")
      val local    = Clusters.connectedComponents(edges)
        .as[(Long, Long)].collect().toMap
      val reliable = Clusters.connectedComponents(edges, checkpointDir = Some(dir))
        .as[(Long, Long)].collect().toMap
      assert(reliable == local)
      assert(reliable == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
        10L -> 10L, 11L -> 10L))
    }
  }

  test("session conf spark.graft.checkpointDir is the operator default") {
    withTempDir { dir =>
      spark.conf.set(Checkpoints.ConfKey, dir)
      try {
        val edges = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
        val labels = Clusters.connectedComponents(edges)
          .as[(Long, Long)].collect().toMap
        assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
        // the conf-configured dir was actually used
        assert(Option(new java.io.File(dir).listFiles()).exists(_.nonEmpty),
          s"conf-set dir $dir untouched — operator ignored the session default")
      } finally spark.conf.unset(Checkpoints.ConfKey)
    }
  }

  test("drainFolded folds identically with a reliable dir") {
    withTempDir { dir =>
      val zero = Seq.empty[(Long, Long)].toDF("k", "s")
      val b0   = Seq((1L, 10L), (2L, 5L)).toDF("k", "v")
      val b1   = Seq((1L, 1L), (3L, 7L)).toDF("k", "v")
      def fold(state: org.apache.spark.sql.DataFrame,
               batch: org.apache.spark.sql.DataFrame) =
        state.select(col("k"), col("s").as("v")).unionByName(batch)
          .groupBy("k").agg(sum("v").as("s"))
      val got = IncrementalSink.drainFolded(Seq(b0, b1), zero, fold, Some(dir))
        .as[(Long, Long)].collect().toMap
      assert(got == Map(1L -> 11L, 2L -> 5L, 3L -> 7L))
    }
  }
}
