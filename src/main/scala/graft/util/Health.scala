package graft.util

/** Health checks with thresholds (SURVEY §2.7 A5 — the reference's
  * `HealthMonitor`, `etl/monitoring.py:250-438`; thresholds
  * `config/config.yaml:87-91`).
  *
  * The reference polls psutil for system memory/disk and flags
  * warning/unhealthy bands; here the same check surface reads the JVM's
  * own beans (`com.sun.management.OperatingSystemMXBean` for system
  * memory, `java.nio.file.FileStore` for disk) — driver-side preflight,
  * per the SURVEY disposition: the DATA path's health is Spark's job
  * (task retries, excludeOnFailure), this guards the coordinator
  * process that builds plans and lands files. Readings are injectable
  * so the threshold bands are spec-pinned exactly.
  *
  * Status model (monitoring.py:22-41): healthy | warning | unhealthy;
  * overall = unhealthy if ANY check is unhealthy, else warning if any
  * warns (monitoring.py:325-341).
  */
object Health {

  final case class HealthCheck(
      name: String,
      status: String, // healthy | warning | unhealthy
      message: String,
      timestampMs: Long,
      durationMs: Double = 0.0,
      details: Map[String, String] = Map.empty)

  final case class HealthStatus(
      status: String,
      timestampMs: Long,
      checks: Map[String, HealthCheck],
      healthy: Int,
      warning: Int,
      unhealthy: Int)

  /** memory_usage bands (monitoring.py:373-399: >90 unhealthy, >75
    * warning; config.yaml:90 memory_threshold_percent).
    */
  final val MemoryWarnPct   = 75.0
  final val MemoryFailPct   = 90.0

  /** disk_space bands on FREE percent (monitoring.py:401-430: <5
    * unhealthy, <15 warning; config.yaml:91 disk_threshold_percent 95
    * used = 5 free).
    */
  final val DiskWarnFreePct = 15.0
  final val DiskFailFreePct = 5.0

  /** system_time sanity window (monitoring.py:354-371). */
  final val MinSaneYear = 2020
  final val MaxSaneYear = 2030

  /** Register/run/aggregate (monitoring.py:250-341). Checks run in
    * registration order; a check that THROWS reports unhealthy rather
    * than failing the run (monitoring.py:303-311), and an unknown name
    * reports unhealthy (monitoring.py:277-283).
    */
  final class Monitor(clock: () => Long = () => System.currentTimeMillis()) {
    private val checks =
      new java.util.LinkedHashMap[String, () => HealthCheck]()

    def registerCheck(name: String)(body: => HealthCheck): Unit =
      synchronized { checks.put(name, () => body); () }

    def checkNames: Seq[String] = synchronized {
      import scala.jdk.CollectionConverters._
      checks.keySet().asScala.toSeq
    }

    def runCheck(name: String): HealthCheck = {
      val fn = synchronized(Option(checks.get(name)))
      fn match {
        case None =>
          HealthCheck(name, "unhealthy", s"Unknown health check: $name", clock())
        case Some(f) =>
          val t0 = System.nanoTime()
          try f().copy(durationMs = (System.nanoTime() - t0) / 1e6)
          catch {
            case e: Exception =>
              HealthCheck(name, "unhealthy", s"Health check failed: $e",
                clock(), (System.nanoTime() - t0) / 1e6)
          }
      }
    }

    def runAllChecks(): Map[String, HealthCheck] =
      checkNames.map(n => n -> runCheck(n)).toMap

    /** Overall roll-up (monitoring.py:325-341). Deliberate deviation
      * from the reference: an UNRECOGNIZED status string from a custom
      * check counts as unhealthy — the reference counts only the three
      * known strings, so a check returning "degraded" (or "UNHEALTHY")
      * would silently roll up green; fail-closed beats parity here.
      */
    def status(): HealthStatus = {
      val all = runAllChecks()
      val h   = all.values.count(_.status == "healthy")
      val w   = all.values.count(_.status == "warning")
      val u   = all.size - h - w
      val overall =
        if (u > 0) "unhealthy" else if (w > 0) "warning" else "healthy"
      HealthStatus(overall, clock(), all, h, w, u)
    }
  }

  // ---------------------------------------------------------------------
  // Default checks (monitoring.py:262-267 _register_default_checks)

  /** (usedPercent, availableBytes, totalBytes) — psutil.virtual_memory
    * analog from the OS bean; Runtime heap fallback when the platform
    * bean is unavailable.
    */
  def memoryReading(): (Double, Long, Long) =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
      case os: com.sun.management.OperatingSystemMXBean
          if os.getTotalMemorySize > 0 =>
        val total = os.getTotalMemorySize
        val free  = os.getFreeMemorySize
        ((total - free).toDouble * 100.0 / total, free, total)
      case _ =>
        val rt    = Runtime.getRuntime
        val total = rt.maxMemory()
        val used  = rt.totalMemory() - rt.freeMemory()
        (used.toDouble * 100.0 / total, total - used, total)
    }

  /** (freePercent, freeBytes, totalBytes) — shutil.disk_usage analog.
    * A not-yet-created path (a configured download dir before the first
    * landing) reads its nearest EXISTING ancestor's filestore — the
    * store the landing would actually hit — instead of reporting a
    * spurious unhealthy.
    */
  def diskReading(path: java.nio.file.Path = java.nio.file.Paths.get(".")): (Double, Long, Long) = {
    var p = path.toAbsolutePath
    while (p.getParent != null && !java.nio.file.Files.exists(p)) p = p.getParent
    val store = java.nio.file.Files.getFileStore(p)
    val total = store.getTotalSpace
    val free  = store.getUsableSpace
    (free.toDouble * 100.0 / total, free, total)
  }

  def systemTimeCheck(clock: () => Long): HealthCheck = {
    val now  = clock()
    val year = java.time.Instant.ofEpochMilli(now)
      .atZone(java.time.ZoneOffset.UTC).getYear
    if (year < MinSaneYear || year > MaxSaneYear)
      HealthCheck("system_time", "unhealthy",
        s"System time appears incorrect: year $year", now)
    else
      HealthCheck("system_time", "healthy", "System time is reasonable", now)
  }

  def memoryCheck(
      reading: () => (Double, Long, Long),
      clock: () => Long): HealthCheck = {
    val (pct, avail, total) = reading()
    val (status, message) =
      if (pct > MemoryFailPct) ("unhealthy", f"High memory usage: $pct%.1f%%")
      else if (pct > MemoryWarnPct) ("warning", f"Elevated memory usage: $pct%.1f%%")
      else ("healthy", f"Memory usage: $pct%.1f%%")
    HealthCheck("memory_usage", status, message, clock(), details = Map(
      "percent" -> f"$pct%.1f",
      "available_gb" -> f"${avail / 1073741824.0}%.2f",
      "total_gb" -> f"${total / 1073741824.0}%.2f"))
  }

  def diskCheck(
      reading: () => (Double, Long, Long),
      clock: () => Long): HealthCheck = {
    val (freePct, free, total) = reading()
    val (status, message) =
      if (freePct < DiskFailFreePct) ("unhealthy", f"Low disk space: $freePct%.1f%% free")
      else if (freePct < DiskWarnFreePct) ("warning", f"Limited disk space: $freePct%.1f%% free")
      else ("healthy", f"Disk space: $freePct%.1f%% free")
    HealthCheck("disk_space", status, message, clock(), details = Map(
      "free_percent" -> f"$freePct%.1f",
      "free_gb" -> f"${free / 1073741824.0}%.2f",
      "total_gb" -> f"${total / 1073741824.0}%.2f"))
  }

  /** A monitor with the reference's three default checks registered
    * (system_time, memory_usage, disk_space) against this process and
    * `diskPath`'s filestore.
    */
  def defaultMonitor(
      diskPath: java.nio.file.Path = java.nio.file.Paths.get("."),
      memory: () => (Double, Long, Long) = () => memoryReading(),
      disk: Option[() => (Double, Long, Long)] = None,
      clock: () => Long = () => System.currentTimeMillis()): Monitor = {
    val m = new Monitor(clock)
    val d = disk.getOrElse(() => diskReading(diskPath))
    m.registerCheck("system_time")(systemTimeCheck(clock))
    m.registerCheck("memory_usage")(memoryCheck(memory, clock))
    m.registerCheck("disk_space")(diskCheck(d, clock))
    m
  }

  /** Engine-side extra: executor liveness from the Spark status
    * tracker — the 1000-executor-cluster analog of "is the box ok".
    * Warning when live executors have fallen below `expected`,
    * unhealthy when below half of it (dynamic allocation scale-to-zero
    * on an idle cluster is the caller's `expected = 0`).
    */
  def sparkExecutorsCheck(
      spark: org.apache.spark.sql.SparkSession,
      expected: Int,
      clock: () => Long = () => System.currentTimeMillis()): HealthCheck = {
    // executorInfos includes a row for the driver: in local mode the
    // driver IS the executor (count it), on a cluster it is not —
    // subtract it so 4 live of 10 expected reads 4, not 5, and zero
    // live executors can never satisfy expected=1
    val infos = spark.sparkContext.statusTracker.getExecutorInfos.length
    val live =
      if (spark.sparkContext.isLocal) infos else math.max(infos - 1, 0)
    val status =
      if (expected <= 0 || live >= expected) "healthy"
      else if (live * 2 >= expected) "warning"
      else "unhealthy"
    HealthCheck("spark_executors", status,
      s"$live executor(s) live, $expected expected", clock(),
      details = Map("live" -> live.toString, "expected" -> expected.toString))
  }
}
