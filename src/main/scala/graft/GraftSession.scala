package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's standard tuning.
  *
  * Designed for cluster use (the knobs below are what matter at 100 TB:
  * AQE for runtime re-planning + skew joins, modest advisory partition
  * sizes, broadcast threshold for dimension tables); tests run it on
  * local[N].
  */
object GraftSession {
  def builder(master: String = "local[*]", shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      // ObjectHashAggregate (collect_set/collect_list builds: basket
      // arrays, shingle sets, posting lists) falls back to SORT-based
      // aggregation after only 128 distinct keys per task by default —
      // on any real aggregation that means every object agg is
      // sort-based, paying a full per-partition sort of wide buffer
      // rows on both sides of the exchange (measured: basket-pair
      // path 8.3s → 5.8s at sf1 warm with 4096). 4096 keys × a
      // bounded per-key buffer (every collect_* in this repo is
      // order/doc-scoped, ≤ a few KB) ≈ single-digit MB per task —
      // safe at any executor size a cluster would run.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4096")
      .config("spark.sql.parquet.filterPushdown", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")

  def local(): SparkSession = builder().getOrCreate()
}
