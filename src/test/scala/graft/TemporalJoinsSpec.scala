package graft

import graft.operators.TemporalJoins
import org.apache.spark.sql.functions._

class TemporalJoinsSpec extends SparkSpec {

  private lazy val events = Tables.events(spark, sf)
    .select(col("user_id"), col("event_id"), col("event_type"), col("ts_ns"))
    .collect()

  test("as-of join picks the true latest view at or before each purchase") {
    val views = events.filter(_.getAs[String]("event_type") == "view")
      .groupBy(_.getAs[Long]("user_id"))
    val rows = TemporalJoins.purchaseAttribution(spark, sf).collect()
    assert(rows.nonEmpty)
    val purchases = events.filter(_.getAs[String]("event_type") == "purchase")
    assert(rows.length == purchases.length) // left semantics: every probe survives
    rows.foreach { r =>
      val u = r.getAs[Long]("user_id")
      val pNs = purchases.find(_.getAs[Long]("event_id") == r.getAs[Long]("purchase_id"))
        .get.getAs[Long]("ts_ns")
      // brute-force expected: max (ts, event_id) view with ts <= purchase ts
      val expected = views.getOrElse(u, Array.empty)
        .filter(_.getAs[Long]("ts_ns") <= pNs)
        .sortBy(v => (v.getAs[Long]("ts_ns"), v.getAs[Long]("event_id")))
        .lastOption
      expected match {
        case Some(v) => assert(r.getAs[Long]("view_id") == v.getAs[Long]("event_id"),
          s"purchase ${r.getAs[Long]("purchase_id")} user $u")
        case None => assert(r.isNullAt(r.fieldIndex("view_id")))
      }
    }
  }

  test("as-of gap is non-negative and null only for view-less purchases") {
    val rows = TemporalJoins.purchaseAttribution(spark, sf).collect()
    rows.foreach { r =>
      val hasView = !r.isNullAt(r.fieldIndex("view_id"))
      assert(r.isNullAt(r.fieldIndex("gap_s")) != hasView)
      if (hasView) assert(r.getAs[Long]("gap_s") >= 0)
    }
  }

  test("bucketed interval join equals the brute-force theta join") {
    val rows = TemporalJoins.sessionOverlapPurchases(spark, sf).collect()
    assert(rows.nonEmpty)
    // brute-force: rebuild sessions from collected events, count overlaps
    val byUser = events.groupBy(_.getAs[Long]("user_id"))
    val sessions = byUser.flatMap { case (u, evs) =>
      val sorted = evs.map(_.getAs[Long]("ts_ns")).sorted
      val bounds = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      var start = sorted.head; var prev = sorted.head
      sorted.tail.foreach { t =>
        if (t - prev > 1800000000000L) { bounds += ((start, prev)); start = t }
        prev = t
      }
      bounds += ((start, prev))
      bounds.zipWithIndex.map { case ((s, e), i) => (u, i + 1L, s, e) }
    }.toSeq
    val purchases = events.filter(_.getAs[String]("event_type") == "purchase")
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("ts_ns")))
    val expected = sessions.map { case (u, sid, s, e) =>
      (u, sid) -> purchases.count { case (pu, pt) => pu != u && pt >= s && pt <= e }.toLong
    }.toMap
    assert(rows.length == sessions.size)
    rows.foreach { r =>
      val k = (r.getAs[Long]("user_id"), r.getAs[Long]("session_id"))
      assert(r.getAs[Long]("n_other_purchases") == expected(k), s"session $k")
    }
  }

  test("time-decay attribution distributes exactly 1.0 of credit per purchase, most-recent touch first") {
    val rows = graft.operators.TemporalJoins.attributionCredits(spark, sf).collect()
    assert(rows.nonEmpty)
    val byPurchase = rows.groupBy(_.getAs[Long]("purchase_id"))
    byPurchase.foreach { case (pid, ts) =>
      val total = ts.map(_.getAs[Double]("credit")).sum
      // per-touch rounding to 4dp bounds the sum drift by touches*5e-5
      assert(math.abs(total - 1.0) <= ts.length * 5e-5 + 1e-9, s"purchase $pid credit sum $total")
      val byPos = ts.sortBy(_.getAs[Int]("touch_pos"))
      assert(byPos.head.getAs[Int]("touch_pos") == 1)
      // touch_pos orders by recency, and the decay makes credit non-increasing in it
      val credits = byPos.map(_.getAs[Double]("credit"))
      credits.sliding(2).foreach {
        case Array(a, b) => assert(a >= b - 1e-9, s"purchase $pid credit not decaying: $a < $b")
        case _ =>
      }
      val gaps = byPos.map(_.getAs[Long]("gap_s"))
      assert(gaps.forall(g => g >= 0 && g <= 3600))
      assert(gaps.sameElements(gaps.sorted))
    }
  }

  test("interval join computes the session frame once (checkpointed, shared by all consumers)") {
    // r17: the session frame feeds both probe legs of the union, which
    // itself feeds the counting windows and the bucket-prefix distinct.
    // Without the checkpoint the lag+cumsum window pass re-ran once per
    // consumer; every LogicalRDD leaf must be the SAME materialized RDD.
    val df = graft.operators.TemporalJoins.sessionOverlapPurchases(spark, sf)
    val leaves = df.queryExecution.optimizedPlan.collectWithSubqueries {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.id
    }
    assert(leaves.nonEmpty && leaves.distinct.size == 1,
      s"session frame must be one shared checkpointed RDD, got rdd ids $leaves")
  }

  test("interval join never pairs sessions with purchases (prefix counts, no interval join stage)") {
    // r17: the hour-bucket equi-join of exploded session intervals
    // against purchases built a pair stream of sessions_b × purchases_b
    // per bucket — quadratic in corpus density at a fixed time range.
    // The prefix-count shape must carry NO Generate (no interval
    // explode) and only broadcast joins (the bucket-prefix frame).
    val df = graft.operators.TemporalJoins.sessionOverlapPurchases(spark, sf)
    val gens = df.queryExecution.optimizedPlan.collectWithSubqueries {
      case g: org.apache.spark.sql.catalyst.plans.logical.Generate => g
    }
    assert(gens.isEmpty, s"expected no interval explode, got ${gens.size} Generates")
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!plan.contains("SortMergeJoin"),
      "prefix-count shape must not shuffle-join sessions against purchases")
  }
}
