package graft.util

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

/** Driver-side keyed response cache with TTL expiry, LRU capacity
  * eviction and hit/miss statistics — the R5 analog of the reference's
  * ResponseCache (etl/utils/performance.py:149-272) plus the adaptive
  * per-key TTL policy of IntelligentCache
  * (etl/utils/intelligent_cache.py:358-378).
  *
  * Scope note (SURVEY §2.8 R5): Spark-side data caching is `persist()`
  * and the idempotent landing copy; this class covers the remaining
  * user-visible piece — repeated REST/catalog requests inside a TTL
  * window served without re-fetching. It is driver-side metadata
  * machinery (page counts, layer catalogs, token responses), never a
  * row path, so a plain synchronized LinkedHashMap is the right tool —
  * at 100 TB the entries here are still O(#sources), not O(rows).
  *
  * The clock is injectable so specs can cross TTL boundaries
  * deterministically; production callers use the default wall clock.
  */
final class ResponseCache[V](
    maxSize: Int = 1000,                 // performance.py:152 max_size
    defaultTtlSeconds: Long = 3600,      // performance.py:155 default_ttl
    adaptiveTtl: Boolean = false,        // intelligent_cache.py:105
    clock: () => Long = () => System.currentTimeMillis()) {

  require(maxSize > 0, s"maxSize must be positive: $maxSize")

  private final case class Entry(value: V, expiresAt: Long)

  // accessOrder=true → iteration order is least-recently-used first,
  // which makes LRU eviction (performance.py:245-254) a head removal.
  private val entries = new java.util.LinkedHashMap[String, Entry](16, 0.75f, true)
  // per-key recent access times (ms), trimmed to the last hour — the
  // frequency signal behind adaptive TTL (intelligent_cache.py:380-393)
  private val accessLog = scala.collection.mutable.Map.empty[String, List[Long]]

  private var hits = 0L
  private var misses = 0L
  private var evictions = 0L
  private var expirations = 0L

  /** Lookup; an entry past its expiry is removed and counted as a miss
    * (performance.py:185-209: expired entries are purged on read).
    */
  def get(key: String): Option[V] = synchronized {
    recordAccess(key)
    val e = entries.get(key)
    if (e == null) { misses += 1; None }
    else if (clock() > e.expiresAt) {
      entries.remove(key); expirations += 1; misses += 1; None
    } else { hits += 1; Some(e.value) }
  }

  /** Insert with optional per-entry TTL override (performance.py:211-243).
    * When the cache is full the least-recently-used entry is evicted.
    */
  def put(key: String, value: V, ttlSeconds: Option[Long] = None): Unit = synchronized {
    val ttl = ttlSeconds.getOrElse(effectiveTtl(key))
    entries.put(key, Entry(value, clock() + ttl * 1000L))
    while (entries.size() > maxSize) {
      val lru = entries.keySet().iterator().next()
      entries.remove(lru)
      evictions += 1
    }
  }

  // per-key computation locks: concurrent callers for the same missing
  // key serialize here, and the losers read the winner's entry instead
  // of recomputing (anti-stampede; the cache-wide lock is NOT held
  // during compute, so unrelated keys proceed). Best-effort: a lock
  // object removed while still contended can admit one extra compute —
  // acceptable, callers' fetches are idempotent by the R5 contract.
  private val inFlight =
    new java.util.concurrent.ConcurrentHashMap[String, AnyRef]()

  /** Non-counting lookup (no hit/miss accounting, no expiry purge) —
    * the double-check read inside [[getOrElseUpdate]]'s key lock must
    * not double-count the stats of the outer [[get]].
    */
  private def peek(key: String): Option[V] = synchronized {
    Option(entries.get(key)).filter(e => clock() <= e.expiresAt).map(_.value)
  }

  /** Fetch-through: serve a live entry or compute, store and return —
    * the cached_request decorator shape (performance.py:435-466).
    * Concurrent callers for the same missing key coalesce: one
    * computes, the rest block on the key lock and read its entry.
    */
  def getOrElseUpdate(key: String, ttlSeconds: Option[Long] = None)(compute: => V): V =
    // explicit TTL ≤ 0 = caching disabled for this request: compute
    // without consulting or populating the cache (the "0 disables"
    // config contract; a 0-TTL put would still serve same-millisecond)
    if (ttlSeconds.exists(_ <= 0)) compute
    else get(key) match {
      case Some(v) => v
      case None =>
        val lock = inFlight.computeIfAbsent(key, _ => new Object)
        try lock.synchronized {
          peek(key) match {
            case Some(v) => v
            case None =>
              val v = compute
              put(key, v, ttlSeconds)
              v
          }
        } finally inFlight.remove(key, lock)
    }

  def clear(): Unit = synchronized { entries.clear(); accessLog.clear() }

  def size: Int = synchronized(entries.size())

  /** (hits, misses, evictions, expirations, hitRate) — performance.py:263-272. */
  def stats: ResponseCache.Stats = synchronized {
    ResponseCache.Stats(hits, misses, evictions, expirations, entries.size())
  }

  /** Adaptive TTL (intelligent_cache.py:358-378): keys re-requested more
    * than once per 10 s cache twice as long; keys colder than once per
    * 100 s cache half as long. Disabled (flat default) unless opted in.
    */
  private def effectiveTtl(key: String): Long = {
    if (!adaptiveTtl) return defaultTtlSeconds
    val accesses = accessLog.getOrElse(key, Nil)
    if (accesses.length < 2) return defaultTtlSeconds
    val spanSec = math.max((accesses.head - accesses.last) / 1000.0, 1.0)
    val freq    = accesses.length / spanSec
    if (freq > 0.1) defaultTtlSeconds * 2
    else if (freq < 0.01) defaultTtlSeconds / 2
    else defaultTtlSeconds
  }

  private def recordAccess(key: String): Unit = {
    if (adaptiveTtl) {
      val now    = clock()
      val cutoff = now - 3600 * 1000L // keep the last hour, intelligent_cache.py:390
      accessLog(key) = (now :: accessLog.getOrElse(key, Nil)).filter(_ > cutoff)
    }
  }
}

object ResponseCache {

  final case class Stats(
      hits: Long, misses: Long, evictions: Long, expirations: Long, size: Int) {
    def hitRate: Double =
      if (hits + misses == 0) 0.0 else hits.toDouble / (hits + misses)
  }

  /** Canonical request key: md5 over url + sorted params + sorted headers
    * (performance.py:171-183 _generate_key) — parameter order must not
    * fragment the cache. Every component is LENGTH-PREFIXED before
    * hashing (the reference gets unambiguity from json.dumps): with
    * bare '&'/'=' delimiters, params a="1&b=2" and a="1",b="2" would
    * canonicalize identically and serve each other's responses.
    */
  def requestKey(
      url: String,
      params: Map[String, String] = Map.empty,
      headers: Map[String, String] = Map.empty): String = {
    val canonical = new StringBuilder
    def part(tag: Char, s: String): Unit =
      canonical.append(tag).append(s.length).append(':').append(s)
    part('u', url)
    params.toSeq.sorted.foreach { case (k, v) => part('p', k); part('v', v) }
    headers.toSeq.sorted.foreach { case (k, v) => part('h', k); part('v', v) }
    val digest = MessageDigest.getInstance("MD5")
      .digest(canonical.toString.getBytes(StandardCharsets.UTF_8))
    digest.map("%02x".format(_)).mkString
  }
}
