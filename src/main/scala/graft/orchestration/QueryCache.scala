package graft.orchestration

import java.security.MessageDigest
import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, Row}

import graft.Lakehouse

case class CacheEntry(key: String, sql: String, tables: Seq[String],
    rows: Seq[Row], schemaJson: String, createdMs: Long, var lastAccessMs: Long)

case class CacheStats(hits: Long, misses: Long, entries: Int)

/** Per-table cache policy (reference query_cache.py set_cache_policy):
  * `enabled = false` bypasses the cache for queries touching the table;
  * a custom TTL overrides the default for those queries. */
case class CachePolicy(enabled: Boolean, ttlMs: Option[Long])

/** Query result cache (reference query_cache.py): key = sha256 of
  * normalized SQL (upper, collapsed whitespace, stripped `;`), TTL,
  * invalidation by referenced table, LRU-ish eviction at 100 entries,
  * hit/miss stats. Results are bounded (maxRows) before caching — the cache
  * stores API result pages, never full tables. */
class QueryCache(lh: Lakehouse, ttlMs: Long = 5 * 60 * 1000L,
    maxEntries: Int = 100) {
  private val cache = TrieMap.empty[String, CacheEntry]
  private var hits = 0L
  private var misses = 0L

  /** Policies persist to the meta dir (reference query_cache.py:246-261
    * `_save_meta`) so a fresh process — each CLI invocation, an MCP server
    * restart — sees policies set by earlier ones. Cached *results* stay
    * in-memory only, matching the reference. */
  private def policyPath = lh.metaDir.resolve("cache_policies.json")
  private val policies = TrieMap.empty[String, CachePolicy]
  if (java.nio.file.Files.exists(policyPath))
    // policies are an optional optimization: a corrupt/incompatible file
    // must degrade to "no policies", not poison every cache operation
    try policies ++= graft.core.Jsons.readFile[Map[String, CachePolicy]](policyPath)
    catch { case _: Exception => () }

  private def qualify(t: String): String =
    if (t.contains(".")) t else s"default.$t"

  def setPolicy(table: String, enabled: Boolean = true,
      ttlSeconds: Option[Long] = None): CachePolicy = {
    val p = CachePolicy(enabled, ttlSeconds.map(_ * 1000L))
    policies.put(qualify(table), p)
    // Jsons.writeFile is unique-temp + atomic-move, so concurrent writers
    // (CLI + MCP server) can never expose a torn file to a reader. That is
    // the only cross-process guarantee: the read-modify-write itself is
    // guarded per-JVM (synchronized), so two PROCESSES updating the same
    // store race last-whole-map-write-wins — acceptable for these small
    // metadata stores, where the alternative is file locking on every write.
    synchronized { graft.core.Jsons.writeFile(policyPath, policies.toMap) }
    if (!enabled) invalidateTable(table)
    p
  }

  def policy(table: String): Option[CachePolicy] = policies.get(qualify(table))

  def listPolicies(): Map[String, CachePolicy] = policies.toMap

  private def effective(tables: Seq[String]): (Boolean, Long) = {
    val ps = tables.map(qualify).flatMap(policies.get)
    val enabled = ps.forall(_.enabled)
    val ttl = ps.flatMap(_.ttlMs).minOption.getOrElse(ttlMs)
    (enabled, ttl)
  }

  /** Normalization parity with query_cache.py:21-30. */
  def normalize(sql: String): String =
    sql.trim.stripSuffix(";").replaceAll("\\s+", " ").toUpperCase

  def keyOf(sql: String): String =
    MessageDigest.getInstance("SHA-256").digest(normalize(sql).getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  def execute(sql: String, maxRows: Int = 1000): (Seq[Row], Boolean) = {
    val key = keyOf(sql)
    val now = System.currentTimeMillis()
    val hit = cache.get(key).filter { e =>
      val (enabled, ttl) = effective(e.tables)
      enabled && now - e.createdMs < ttl
    }
    hit match {
      case Some(e) =>
        synchronized { hits += 1 }
        e.lastAccessMs = now
        (e.rows, true)
      case None =>
        synchronized { misses += 1 }
        val df = lh.engine.execute(sql, maxRows)
        val rows = df.collect().toSeq
        val tables = lh.engine.referencedTables(sql)
        if (effective(tables.map(qualify))._1)
          put(key, sql, tables, rows, df)
        (rows, false)
    }
  }

  private def put(key: String, sql: String, tables: Seq[String], rows: Seq[Row],
      df: DataFrame): Unit = synchronized {
    if (cache.size >= maxEntries) {
      // evict least-recently-accessed (query_cache.py eviction at 100)
      cache.toSeq.sortBy(_._2.lastAccessMs).take(cache.size - maxEntries + 1)
        .foreach { case (k, _) => cache.remove(k) }
    }
    val now = System.currentTimeMillis()
    cache.put(key, CacheEntry(key, sql,
      tables.map(t => if (t.contains(".")) t else s"default.$t"),
      rows, df.schema.json, now, now))
  }

  /** Invalidate all entries touching a table (query_cache.py:55-62 uses a
    * FROM/JOIN regex; we use the parsed-plan table list captured at insert). */
  def invalidateTable(table: String): Int = {
    val t = if (table.contains(".")) table else s"default.$table"
    val keys = cache.collect { case (k, e) if e.tables.contains(t) => k }.toSeq
    keys.foreach(cache.remove)
    keys.size
  }

  def invalidateAll(): Unit = cache.clear()

  /** Cached entries, most recently used first (reference query_cache.py
    * list_cached_queries). */
  def entries(): List[CacheEntry] =
    cache.values.toList.sortBy(-_.lastAccessMs)

  def stats: CacheStats = CacheStats(hits, misses, cache.size)
}
