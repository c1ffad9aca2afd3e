package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-generated parquet tables (see TESTDATA.md).
  *
  * At cluster scale these would be partitioned/bucketed external tables;
  * reads stay declarative so Catalyst pushes filters + prunes columns
  * down to the parquet scans.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** events.ts is parquet TIMESTAMP(NANOS): Spark reads it only as a
    * long (spark.sql.legacy.parquet.nanosAsLong=true, set by
    * GraftSession/Verify/Bench). Expose both the exact ns (`ts_ns`, for
    * gap arithmetic that must match DuckDB's epoch_ns) and a
    * us-truncated timestamp (`ts`).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    // runtime-settable; required to read the TIMESTAMP(NANOS) column
    // even when the caller's session wasn't built by GraftSession
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts_ns", col("ts"))
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw.withColumn("ts_ns", unix_micros(col("ts")) * 1000L)
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Redistribute a scan that collapsed to fewer splits than cores (a
    * tiny local file = one split; a real lake scan = thousands, where
    * this is a no-op) so CPU-bound per-row kernels engage every core.
    * Hash-partitioning on the group key keeps a downstream per-key
    * aggregation exchange-free, so when the redistribute fires it
    * replaces (not adds to) that shuffle.
    */
  def parallelized(spark: SparkSession, df: DataFrame, key: String): DataFrame = {
    val cores = spark.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < cores) df.repartition(cores, col(key)) else df
  }
}

/** A family of operators: named queries plus (where SQL-expressible)
  * DuckDB oracle SQL with IDENTICAL output column names.
  */
trait QueryPack {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracles: Map[String, String]
}
