package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MonitoringSpec extends SparkSpec {
  import spark.implicits._

  // metric series: stable around 100 with one obvious spike and a level shift
  private val series = (
    (1 to 20).map(i => ("api", i, 100.0 + (i % 3))) ++   // baseline ~101
    Seq(("api", 21, 500.0)) ++                           // spike (anomaly)
    (22 to 30).map(i => ("api", i, 100.0 + (i % 3))) ++
    (31 to 40).map(i => ("api", i, 200.0 + (i % 3)))     // level shift (change point)
  ).toDF("metric", "ts", "value")

  test("baselineStats + isRegression match the >20%-and-2σ rule") {
    val stats = Monitoring.baselineStats(
      series.filter($"ts" <= 20), Seq("metric"), "value").collect().head
    val mean = stats.getAs[Double]("mean")
    val std  = stats.getAs[Double]("std")
    val flag = series.filter($"ts" === 21)
      .select(Monitoring.isRegression(lit(500.0), lit(mean), lit(std)).as("r"))
      .as[Boolean].head()
    assert(flag)
    val notFlag = spark.range(1)
      .select(Monitoring.isRegression(lit(102.0), lit(mean), lit(std)).as("r"))
      .as[Boolean].head()
    assert(!notFlag)
  }

  test("zscores flag the spike and only the spike at 3σ") {
    val z = Monitoring.zscores(series, Seq("metric"), "value")
      .filter(abs($"zscore") > 3.0).select("ts").as[Int].collect()
    assert(z.toSeq == Seq(21))
  }

  test("exactSigmaAnomalies agrees with the double z-score on clear outliers") {
    val flagged = Monitoring.exactSigmaAnomalies(series, Seq("metric"), "ts", "value", sigmas = 3)
      .select("ts").as[Int].collect()
    assert(flagged.toSeq == Seq(21))
  }

  test("rollingMean has the right trailing-window count") {
    val out = Monitoring.rollingMean(series, Seq("metric"), "ts", "value", 5)
    assert(out.filter($"ts" === 3).select("rolling_n").as[Long].head() == 3L)
    assert(out.filter($"ts" === 20).select("rolling_n").as[Long].head() == 5L)
  }

  test("changePoints find the level shift, not the steady state") {
    val cps = Monitoring.changePoints(series, Seq("metric"), "ts", "value",
      windowRows = 5, pct = 50).select("ts").as[Int].collect().toSet
    // shift happens at ts=31; windows containing the spike (21) also move
    assert(cps.exists(t => t >= 29 && t <= 33), s"expected shift near 31, got $cps")
  }

  test("binnedQuantiles: hand-computed bins and within-binWidth accuracy") {
    val vals = (1 to 100).map(v => ("a", v.toLong)).toDF("k", "v")
    val row = Monitoring.binnedQuantiles(vals, Seq("k"), "v", binWidth = 10L,
        percents = Seq(50, 95, 100))
      .select("n", "p50_lo", "p95_lo", "p100_lo")
      .as[(Long, Long, Long, Long)].head()
    // bin 5 (values 50-59) is the first with cum ≥ 50 of 100; bin 9 ≥ 95
    assert(row == ((100L, 50L, 90L, 100L)))
    // pseudo-random corpus: the bin lower bound is within binWidth of the
    // true discrete percentile
    val rnd = (0 until 1000).map(i => ("b", (i * 7919L) % 5000L)).toDF("k", "v")
    val got = Monitoring.binnedQuantiles(rnd, Seq("k"), "v", 100L, Seq(50, 95))
      .select("p50_lo", "p95_lo").as[(Long, Long)].head()
    val sorted = (0 until 1000).map(i => (i * 7919L) % 5000L).sorted
    def exact(p: Int) = sorted((p * 1000 / 100) - 1)
    assert(math.abs(got._1 - exact(50)) <= 100, s"p50 ${got._1} vs ${exact(50)}")
    assert(math.abs(got._2 - exact(95)) <= 100, s"p95 ${got._2} vs ${exact(95)}")
  }
}
