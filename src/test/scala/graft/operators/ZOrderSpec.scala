package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.plans.ZOrderKernel

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("interleave kernel: exact bit placement, wrap on out-of-range") {
    // a=0b101 (bits 0,2 → z bits 0,4), b=0b011 (bits 0,1 → z bits 1,3)
    assert(ZOrderKernel.interleave(5L, 3L, 3) == ((1L << 0) | (1L << 4) | (1L << 1) | (1L << 3)))
    assert(ZOrderKernel.interleave(0L, 0L, 16) == 0L)
    // monotone on the diagonal: z(k,k) for k in 0..n is increasing
    val diag = (0L to 100L).map(k => ZOrderKernel.interleave(k, k, 8))
    assert(diag == diag.sorted)
    // out-of-range wraps to low bits instead of failing
    assert(ZOrderKernel.interleave((1L << 8) + 5L, 3L, 8) ==
      ZOrderKernel.interleave(5L, 3L, 8))
  }

  test("expression matches the kernel and is null-safe") {
    val df = Seq((5L, 3L), (255L, 0L), (0L, 255L)).toDF("a", "b")
      .withColumn("z", ZOrder.zValue($"a", $"b", 8))
    val got = df.select($"a", $"b", $"z").as[(Long, Long, Long)].collect()
    got.foreach { case (a, b, z) => assert(z == ZOrderKernel.interleave(a, b, 8)) }
    val withNull = Seq((Some(1L), None: Option[Long])).toDF("a", "b")
      .withColumn("z", ZOrder.zValue($"a", $"b", 8))
    assert(withNull.select("z").collect().head.isNullAt(0))
  }

  test("z-ordered layout decodes far fewer rows than a one-dim sort for a 2-d box") {
    spark.conf.set("spark.sql.adaptive.enabled", "false") // reachable leaf metrics
    try {
      val li = spark.read.parquet(s"${sf()}/lineitem.parquet")
        .select($"l_orderkey", $"l_partkey", $"l_suppkey", $"l_quantity")
      val dir = Files.createTempDirectory("zorder_spec").toString
      // tiny row groups so the 6k-row fixture yields many skippable groups
      ZOrder.writeZOrdered(li, s"$dir/z", "l_partkey", "l_suppkey", 20, 16L * 1024)
      li.repartition(1).sortWithinPartitions("l_orderkey")
        .write.option("parquet.block.size", 16L * 1024).parquet(s"$dir/plain")

      def box(path: String) = spark.read.parquet(path)
        .filter($"l_partkey" <= 50L && $"l_suppkey" <= 5L)
      val total   = li.count()
      val zRows   = ZOrder.scanRowsDecoded(box(s"$dir/z"))
      val pRows   = ZOrder.scanRowsDecoded(box(s"$dir/plain"))
      val zResult = box(s"$dir/z").agg(sum($"l_quantity")).head.getDouble(0)
      val pResult = box(s"$dir/plain").agg(sum($"l_quantity")).head.getDouble(0)
      assert(zResult == pResult, "layout changed query results")
      assert(zRows < total, s"z layout decoded everything ($zRows of $total)")
      assert(zRows * 2 <= pRows,
        s"z layout ($zRows rows) should decode <= half of the 1-d sort ($pRows rows)")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("ensureZOrdered writes once per tag and layout") {
    val li = spark.read.parquet(s"${sf()}/lineitem.parquet")
      .select($"l_orderkey", $"l_partkey", $"l_suppkey")
    val p1 = ZOrder.ensureZOrdered(li, "l_partkey", "l_suppkey", 20, srcTag = "tagA")
    val m1 = new java.io.File(s"$p1/_SUCCESS").lastModified()
    val p2 = ZOrder.ensureZOrdered(li, "l_partkey", "l_suppkey", 20, srcTag = "tagA")
    assert(p1 == p2)
    assert(new java.io.File(s"$p2/_SUCCESS").lastModified() == m1, "same tag must reuse")
    val p3 = ZOrder.ensureZOrdered(li, "l_partkey", "l_suppkey", 20, srcTag = "tagB")
    assert(p3 != p1, "a new tag must get its own layout")
  }
}
