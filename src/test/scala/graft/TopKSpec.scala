package graft

import graft.expressions.TopKBuffer
import graft.functions.Vectors
import graft.operators.Analytics
import org.apache.spark.sql.functions._

class TopKSpec extends SparkSpec {

  test("heap buffer keeps k best with deterministic tiebreaks") {
    val b = new TopKBuffer(3)
    Seq((5.0, 10L), (7.0, 2L), (5.0, 3L), (9.0, 8L), (1.0, 1L)).foreach((b.insert _).tupled)
    assert(b.sortedIds.sameElements(Array(8L, 2L, 3L))) // 9.0, 7.0, then 5.0 with id 3 < 10
  }

  test("buffer serialization round-trips") {
    val b = new TopKBuffer(4)
    Seq((5.0, 10L), (7.0, 2L), (3.0, 3L)).foreach((b.insert _).tupled)
    val b2 = TopKBuffer.fromBytes(b.toBytes)
    assert(b2.sortedIds.sameElements(b.sortedIds))
    // merge works after deserialize
    val b3 = new TopKBuffer(4)
    b3.insert(6.0, 99L)
    b3.mergeWith(b2)
    assert(b3.sortedIds.sameElements(Array(2L, 99L, 10L, 3L)))
  }

  test("topk aggregate matches the window formulation exactly") {
    val viaAgg = Analytics.topKAgg(spark, sf).collect()
      .map(r => (r.getAs[Long]("o_custkey"), r.getAs[Long]("o_orderkey"), r.getAs[Long]("rn")))
    val viaWindow = Analytics.windowTopN(spark, sf).collect()
      .map(r => (r.getAs[Long]("o_custkey"), r.getAs[Long]("o_orderkey"), r.getAs[Int]("rn").toLong))
    assert(viaAgg.sorted.sameElements(viaWindow.sorted))
  }

  test("aggregate partial-aggregates map-side (ObjectHashAggregate partials)") {
    val df = Tables.orders(spark, sf)
      .groupBy(col("o_custkey"))
      .agg(Vectors.topKIds(col("o_totalprice"), col("o_orderkey"), 3).as("ids"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("partial_top_k_ids"), s"plan:\n$plan")
  }

  test("top_k_ids is callable from SQL via extensions") {
    Tables.orders(spark, sf).createOrReplaceTempView("orders_v")
    val rows = spark.sql(
      "SELECT o_custkey, top_k_ids(o_totalprice, o_orderkey, 2) AS ids FROM orders_v GROUP BY o_custkey")
      .collect()
    assert(rows.nonEmpty && rows.forall(_.getSeq[Long](1).length <= 2))
  }
}
