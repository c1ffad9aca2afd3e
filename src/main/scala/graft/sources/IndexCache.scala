package graft.sources

import org.apache.spark.sql.SparkSession

/** Session-scoped cache for DETERMINISTIC derived index structures —
  * LSH band tables, k-means cell assignments — built once per corpus
  * snapshot and reused by every query that probes them.
  *
  * This is the operational model of every ANN/near-dup system at scale:
  * the index (IVF lists, LSH buckets) is built ONCE over a corpus
  * snapshot and amortized across all queries; rebuilding it per query
  * would be like rebuilding a B-tree per lookup. The reference encodes
  * the same idea as its persisted path/search indexes (the Azure Search
  * index IS a prebuilt structure the indexer merely probes and merges
  * into).
  *
  * Rules for cached builders:
  *  - the built frame MUST be deterministic for (kind, dir) — the
  *    engine's index builders are (md5-derived hashes, first-k seeds,
  *    no RNG);
  *  - the built frame MUST already be materialized (eager
  *    localCheckpoint) so the cached value replays executor-local
  *    blocks, never the build lineage;
  *  - `dir` must reference an immutable snapshot (the testdata
  *    contract; at cluster scale, a versioned IndexStore snapshot). A
  *    mutated corpus needs [[invalidate]] — or better, a new snapshot
  *    path.
  *
  * Keyed by applicationId so entries can never leak across
  * SparkContexts (checkpointed blocks die with their executors).
  */
object IndexCache {
  private val cache = new java.util.concurrent.ConcurrentHashMap[String, AnyRef]()

  def getOrBuild[T <: AnyRef](spark: SparkSession, kind: String, dir: String)(build: => T): T = {
    val key = s"${spark.sparkContext.applicationId}|$kind|$dir"
    // NOT computeIfAbsent: cached builders NEST (the embedding
    // near-pair index builds on the bounded cell index, which builds
    // on the k-means base; shingle sets build on the shingle index),
    // and ConcurrentHashMap.computeIfAbsent is non-reentrant — a
    // nested getOrBuild whose key lands in the SAME hash bin throws
    // IllegalStateException("Recursive update"), which key strings
    // and table size make nondeterministic (observed as sporadic
    // single-query bench failures at new snapshot dirs). Build
    // outside any map lock; on the single-threaded driver the benign
    // lost-race duplicate build cannot happen.
    val hit = cache.get(key)
    if (hit != null) hit.asInstanceOf[T]
    else {
      val v = build
      val prev = cache.putIfAbsent(key, v)
      (if (prev != null) prev else v).asInstanceOf[T]
    }
  }

  /** Drop every cached index (all snapshots, all kinds). */
  def invalidate(): Unit = cache.clear()
}
