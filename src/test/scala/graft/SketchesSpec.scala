package graft

import graft.operators.Sketches
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {

  test("HLL estimate is within the expected error band of exact") {
    val rows = Sketches.eventsHll(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val est = r.getAs[Double]("hll_estimate")
      val exact = r.getAs[Long]("exact_users")
      // 1.04/sqrt(64) ≈ 13% standard error; allow 3σ
      assert(math.abs(est - exact) / exact < 0.4,
        s"${r.getAs[String]("event_type")}: est $est vs exact $exact")
      assert(r.getAs[Double]("rel_err") >= 0.0)
    }
  }

  test("CMS point estimates are upper bounds that match exact sans collisions") {
    val rows = Sketches.eventsCms(spark, sf).collect()
    assert(rows.length > 0 && rows.length <= 20)
    rows.foreach { r =>
      assert(r.getAs[Long]("est_count") >= r.getAs[Long]("exact_count"),
        s"user ${r.getAs[Long]("user_id")} undercounted")
      assert(r.getAs[Long]("overcount") == r.getAs[Long]("est_count") - r.getAs[Long]("exact_count"))
    }
    // estimates are sorted descending
    val ests = rows.map(_.getAs[Long]("est_count"))
    assert(ests.sameElements(ests.sortBy(-(_: Long))))
  }

  test("CMS counter grid off the pre-aggregated frame equals the raw-row grid") {
    // the round-12 rewrite rests on this algebra: counter increments
    // are additive, so count-of-raw-rows per (row, cell) must equal
    // sum of per-user counts — the grids are bit-identical, not
    // approximately equal
    val e = Tables.events(spark, sf).select(col("user_id"))
    // THE production hash (Sketches.cmsCell), not a copy — round-12
    // advice: a hash drift in eventsCms must fail this spec
    def cell(i: org.apache.spark.sql.Column) = Sketches.cmsCell(i, col("user_id"))
    val iArr = array((0 until Sketches.CmsDepth).map(lit(_)): _*)
    val raw = e.select(col("user_id"), explode(iArr).as("i"))
      .withColumn("cell", cell(col("i")))
      .groupBy(col("i"), col("cell")).agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getAs[Int]("i"), r.getAs[Long]("cell")) -> r.getAs[Long]("c")).toMap
    val pre = e.groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("n"), explode(iArr).as("i"))
      .withColumn("cell", cell(col("i")))
      .groupBy(col("i"), col("cell")).agg(sum(col("n")).as("c"))
      .collect().map(r => (r.getAs[Int]("i"), r.getAs[Long]("cell")) -> r.getAs[Long]("c")).toMap
    assert(raw.nonEmpty && raw == pre)
  }

  test("KMV overlap: small-range fallback is exact; estimator path lands in the error band") {
    // accuracy gate lives HERE, against the spec-side exact reference
    // (Sketches.exactOverlapOf) — the serving path never rescans the
    // corpus for an accuracy column. Shipped corpus: every type has
    // < k distinct users, so the sketch IS the set and every estimate
    // must equal the exact overlap.
    val ev = Tables.events(spark, sf).select(col("event_type"), col("user_id"))
    val exact = Sketches.exactOverlapOf(ev).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("exact_overlap")).toMap
    val served = Sketches.eventsKmvOverlap(spark, sf).collect()
    assert(served.nonEmpty)
    served.foreach { r =>
      val ex = exact.getOrElse((r.getString(0), r.getString(1)), 0L)
      assert(r.getAs[Double]("est_overlap") == ex.toDouble,
        s"complete sketch not exact (exact=$ex): $r")
    }
    // synthetic corpus with per-type cardinality ≫ k exercises the real
    // theta/ratio estimator: types A and B have 8000 users each sharing
    // exactly 4000 (A: 0-7999, B: 4000-11999)
    import spark.implicits._
    val e = spark.range(0, 8000).select(lit("A").as("event_type"), col("id").as("user_id"))
      .union(spark.range(4000, 12000).select(lit("B").as("event_type"), col("id").as("user_id")))
    val row = Sketches.kmvOverlapFrom(e).collect().head
    // KMV with k=256: SE ≈ 1/√k ≈ 6.3% on the union, the ratio
    // estimator adds binomial noise on ρ̂ — allow a generous 25%
    assert(math.abs(row.getAs[Double]("est_union") - 12000.0) / 12000.0 < 0.25,
      s"union estimate off: $row")
    assert(math.abs(row.getAs[Double]("est_overlap") - 4000.0) / 4000.0 < 0.25,
      s"overlap estimate off: $row")
    val exSyn = Sketches.exactOverlapOf(e).collect()
    assert(exSyn.length == 1 && exSyn.head.getAs[Long]("exact_overlap") == 4000L)
  }

  test("streaming HLL register maintenance converges to the batch registers") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode

    val rows = Tables.events(spark, sf).select(col("user_id"))
      .as[Long].collect()
    val input = MemoryStream[Long]
    val query = operators.Sketches.withHllCoords(input.toDS().toDF("user_id"))
      .groupBy(col("bucket")).agg(max(col("rho")).as("mr"))
      .writeStream.format("memory").queryName("hll_regs")
      .outputMode(OutputMode.Update()).start()
    try {
      val (b1, b2) = rows.splitAt(rows.length / 2)
      input.addData(b1.toSeq); query.processAllAvailable()
      input.addData(b2.toSeq); query.processAllAvailable()
      // Update mode emits every register revision; the final state per
      // bucket is the max — exactly the merge the sketch permits
      val streamed = spark.table("hll_regs").collect()
        .map(r => (r.getAs[Long]("bucket"), r.getAs[Int]("mr")))
        .groupBy(_._1).map { case (b, vs) => (b, vs.map(_._2).max) }
      val batch = operators.Sketches.withHllCoords(
        Tables.events(spark, sf).select(col("user_id")))
        .groupBy(col("bucket")).agg(max(col("rho")).as("mr")).collect()
        .map(r => (r.getAs[Long]("bucket"), r.getAs[Int]("mr"))).toMap
      assert(streamed.toMap == batch)
    } finally query.stop()
  }

  test("KMV a-not-b: complete-sketch fallback exact; estimator path lands in the error band") {
    // accuracy gated here against Sketches.exactDiffOf (see the overlap
    // test). Shipped corpus: every sketch is complete (θ = 1), so the
    // retained set IS A∖B and the estimate must equal the exact diff.
    val ev = Tables.events(spark, sf).select(col("event_type"), col("user_id"))
    val exact = Sketches.exactDiffOf(ev).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("exact_diff")).toMap
    val served = Sketches.eventsKmvDiff(spark, sf).collect()
    assert(served.nonEmpty)
    served.foreach { r =>
      val ex = exact((r.getString(0), r.getString(1)))
      assert(r.getAs[Double]("est_diff") == ex.toDouble,
        s"complete sketch not exact (exact=$ex): $r")
    }
    // synthetic corpus with per-type cardinality ≫ k drives the real
    // θ = min(θ_A, θ_B) estimator; |A∖B| = |B∖A| = 4000 by construction
    val e = spark.range(0, 8000).select(lit("A").as("event_type"), col("id").as("user_id"))
      .union(spark.range(4000, 12000).select(lit("B").as("event_type"), col("id").as("user_id")))
    val rows = Sketches.kmvDiffFrom(e).collect()
    assert(rows.length == 2) // the pair frame is ordered: A∖B and B∖A
    val exSyn = Sketches.exactDiffOf(e).collect()
    assert(exSyn.length == 2 && exSyn.forall(_.getAs[Long]("exact_diff") == 4000L))
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("est_diff") - 4000.0) / 4000.0 < 0.25,
        s"diff estimate off: $r")
    }
  }

  test("Misra–Gries: lossy summary certifies the heavy superset; two-pass query is exact") {
    import spark.implicits._
    import graft.functions.Vectors.misraGries
    val k = 64
    // Zipf corpus: term i appears 40000/i times — 1000 distinct ≫ k, so
    // the decrement and merge-reduction paths both actually run
    val freqs = (1 to 1000).map(i => (f"t$i%04d", 40000 / i))
    val corpus = freqs.flatMap { case (t, f) => Seq.fill(f)(t) }
    val n = corpus.length.toLong
    val toks = corpus.toDF("term").repartition(8)
    val cands = toks.agg(misraGries(col("term"), k).as("cands"))
      .collect().head.getSeq[String](0).toSet
    assert(cands.size <= k, s"summary overflowed: ${cands.size}")
    val trueHeavy = freqs.filter { case (_, f) => f.toLong * k > n }.map(_._1).toSet
    assert(trueHeavy.nonEmpty && trueHeavy.size < k)
    assert(trueHeavy.subsetOf(cands),
      s"MG guarantee violated: missing ${trueHeavy -- cands}")
    // the two-pass readout (candidate filter → exact count → threshold)
    // equals the full GROUP BY ... HAVING regardless of summary contents
    val sk2 = toks.agg(misraGries(col("term"), k).as("cands"),
      count(lit(1)).as("n_tokens"))
    val got = toks.crossJoin(broadcast(sk2))
      .filter(array_contains(col("cands"), col("term")))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("cnt"), max(col("n_tokens")).as("nt"))
      .filter(col("cnt") * k > col("nt"))
      .select(col("term"), col("cnt")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val want = freqs.filter { case (_, f) => f.toLong * k > n }
      .map { case (t, f) => (t, f.toLong) }.toSet
    assert(got == want)
  }

  test("Misra–Gries maintains its certified superset under a streaming aggregation") {
    // the custom TypedImperativeAggregate's serialize/merge must also
    // hold as STREAMING STATE: the partial MG buffer is what the state
    // store persists between micro-batches (mirrors the streaming-HLL
    // register test — continuous heavy-hitter monitoring)
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import graft.functions.Vectors.misraGries

    val k = 64
    val freqs = (1 to 500).map(i => (f"s$i%04d", 20000 / i))
    val corpus = freqs.flatMap { case (t, f) => Seq.fill(f)(t) }
    val n = corpus.length.toLong
    val input = MemoryStream[String]
    val query = input.toDS().toDF("term")
      .agg(misraGries(col("term"), k).as("cands"), count(lit(1)).as("n_seen"))
      .writeStream.format("memory").queryName("mg_stream")
      .outputMode(OutputMode.Update()).start()
    try {
      val (b1, b2) = corpus.splitAt(corpus.length / 2)
      input.addData(b1); query.processAllAvailable()
      input.addData(b2); query.processAllAvailable()
      // update mode emits one revision per batch; the complete one has
      // n_seen == full corpus size
      val fin = spark.table("mg_stream").collect()
        .maxBy(_.getAs[Long]("n_seen"))
      assert(fin.getAs[Long]("n_seen") == n)
      val cands = fin.getSeq[String](fin.fieldIndex("cands")).toSet
      assert(cands.size <= k)
      val trueHeavy = freqs.filter { case (_, f) => f.toLong * k > n }.map(_._1).toSet
      assert(trueHeavy.nonEmpty && trueHeavy.subsetOf(cands),
        s"cross-batch MG state lost heavies: ${trueHeavy -- cands}")
    } finally query.stop()
  }

  test("binned quantile sketch brackets the rank-ceil(qn) order statistic") {
    val est = operators.Sketches.eventsQuantileSketch(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Double]("p50_est"), r.getAs[Double]("p95_est"), r.getAs[Double]("p99_est"))).toMap
    assert(est.nonEmpty)
    val byType = Tables.events(spark, sf).select(col("event_type"), col("value")).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Double]("value")))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    // the sketch picks the bin holding the ceil(q·n)-th smallest value,
    // so its midpoint is within half a bin width of that order statistic
    byType.foreach { case (t, vs) =>
      val binw = (vs.last - vs.head) / 1024.0
      def rankStat(pct: Int): Double = vs((pct * vs.length + 99) / 100 - 1)
      val (e50, e95, e99) = est(t)
      assert(math.abs(e50 - rankStat(50)) <= binw, s"$t p50")
      assert(math.abs(e95 - rankStat(95)) <= binw, s"$t p95")
      assert(math.abs(e99 - rankStat(99)) <= binw, s"$t p99")
    }
  }

  test("bitmap distinct is exact and its words are mergeable") {
    // exactness: word-popcount == count(distinct) per (type, day)
    val got = operators.Sketches.eventsBitmapDistinct(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("n_users")).toMap
    val exact = Tables.events(spark, sf)
      .groupBy(col("event_type"), date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(countDistinct(col("user_id")).as("n")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("n")).toMap
    assert(got == exact && got.nonEmpty)

    // mergeability: OR-ing two slices' words == the union's distinct
    // count (the algebra that rolls day bitmaps into weeks/months)
    val ev = Tables.events(spark, sf)
    def words(f: org.apache.spark.sql.DataFrame) = f
      .groupBy(expr("user_id div 64").as("bucket"))
      .agg(bit_or(expr("shiftleft(1L, int(user_id % 64))")).as("word"))
    val a = words(ev.filter(col("event_type") === "click"))
    val b = words(ev.filter(col("event_type") === "view"))
    val merged = a.select(col("bucket"), col("word")).union(b.select(col("bucket"), col("word")))
      .groupBy(col("bucket")).agg(bit_or(col("word")).as("word"))
      .agg(sum(bit_count(col("word")))).collect()(0).getLong(0)
    val exactUnion = ev.filter(col("event_type").isin("click", "view"))
      .select(col("user_id")).distinct().count()
    assert(merged == exactUnion)
  }

  test("Bloom screen never false-negatives against the band index") {
    val rows = operators.Dedup.dedupBloom(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      if (r.getAs[Boolean]("is_dup"))
        assert(r.getAs[Boolean]("maybe_dup"),
          s"doc ${r.getAs[Long]("doc_id")}: in-index doc screened out")
      assert(r.getAs[Boolean]("false_positive") ==
        (r.getAs[Boolean]("maybe_dup") && !r.getAs[Boolean]("is_dup")))
    }
  }

  test("tf-idf emits ranked top-3 per doc with descending scores") {
    val rows = operators.TextAnalysis.tfidfTop(spark, sf).collect()
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc.nonEmpty)
    byDoc.values.foreach { ts =>
      val ranked = ts.sortBy(_.getAs[Int]("rk"))
      assert(ranked.map(_.getAs[Int]("rk")).sameElements(1 to ranked.length))
      val scores = ranked.map(_.getAs[Double]("tfidf"))
      assert(scores.sameElements(scores.sortBy(-(_: Double))))
    }
  }
}
