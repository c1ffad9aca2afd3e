package graft

import graft.sources.Bucketing
import org.apache.spark.sql.functions._

/** Co-located joins via bucketed tables: same key, same bucket count on
  * both sides ⇒ the join plan has NO exchange at all — the shuffle was
  * paid once at write time. This is the storage layout a 100 TB
  * deployment uses for its repeated fact-fact joins.
  */
class BucketedJoinSpec extends SparkSpec {

  test("same-bucket join plans with zero exchange and matches the plain join") {
    val l = Tables.lineitem(spark, sf).select(col("l_orderkey"), col("l_quantity"))
    val o = Tables.orders(spark, sf).select(col("o_orderkey"), col("o_totalprice"))

    spark.sql("DROP TABLE IF EXISTS graft_li_bucketed")
    spark.sql("DROP TABLE IF EXISTS graft_ord_bucketed")
    Bucketing.saveBucketed(l, "graft_li_bucketed", "l_orderkey", buckets = 8)
    Bucketing.saveBucketed(o, "graft_ord_bucketed", "o_orderkey", buckets = 8)

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the shuffle-join path
    try {
      val j = spark.table("graft_li_bucketed")
        .join(spark.table("graft_ord_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("q"))
      val rows = j.collect()
      assert(rows.nonEmpty)

      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$plan")

      // same answer as the unbucketed formulation
      val plain = l.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("q"))
        .collect()
      val toMap = (rs: Array[org.apache.spark.sql.Row]) =>
        rs.map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
      assert(toMap(rows) == toMap(plain))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_li_bucketed")
      spark.sql("DROP TABLE IF EXISTS graft_ord_bucketed")
    }
  }

  test("join_bucketed keyed query matches the raw-parquet formulation") {
    val got = operators.Analytics.joinBucketed(spark, sf).collect()
    assert(got.nonEmpty)
    val li = Tables.lineitem(spark, sf)
    val o = Tables.orders(spark, sf)
    val plain = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        round(lit(1e-9) +
          sum(floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100 + 0.5)
            .cast("long")) / 100.0, 2).as("revenue"))
      .orderBy(col("o_orderpriority")).collect()
    assert(got.map(_.toString).toSeq == plain.map(_.toString).toSeq)
  }

  test("join_incremental: merge == rebuild, and maintenance scans only the delta") {
    val merged = operators.Analytics.joinIncremental(spark, sf)
    val rows = merged.collect()
    assert(rows.nonEmpty)
    // maintenance reads orders.parquet exactly once (the delta leg) —
    // the base view is a cached checkpoint, never re-scanned
    // AQE's toString prints the final AND initial plans — count scans
    // in the final section only
    val plan = merged.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val ordersScans = "orders\\.parquet".r.findAllIn(plan).length
    assert(ordersScans == 1, s"expected one orders scan (the delta), got $ordersScans:\n$plan")
    assert(plan.contains("Scan ExistingRDD") || plan.toLowerCase.contains("checkpoint"),
      "expected the cached base aggregate in the plan")
  }
}
