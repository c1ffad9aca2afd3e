package graft.operators

import graft.{QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Mergeable cardinality / frequency sketches over the events stream.
  *
  * Both sketches are built the way a 1000-executor cluster would build
  * them: one narrow projection of the fact table, a map-side-combinable
  * groupBy whose key space is the SKETCH (256 HLL registers, 4×256 CMS
  * counters — kilobytes, independent of data size), and a final
  * estimate read off the tiny sketch frame. Nothing downstream of the
  * first aggregation scales with row count, which is what makes a
  * 100 TB cardinality estimate a single cheap pass — and the register /
  * counter frames are associatively mergeable across days or
  * partitions (max for HLL, + for CMS).
  *
  * Everything is md5-derived and integer-exact until the final
  * estimate arithmetic (whose IEEE ops are bit-deterministic across
  * engines), so the DuckDB oracle hash-matches.
  */
object Sketches extends QueryPack {

  private val HllBuckets = 256           // p = 8 ⇒ ~6.5% standard error
  private val HllRemBits = 24            // low 24 bits feed the rank
  private val HllRem = 1 << HllRemBits
  private val HllRho0 = HllRemBits + 1   // rank when the low bits are all zero
  private val HllLcThreshold = 2.5 * HllBuckets
  // 0.7213/(1 + 1.079/m) — the standard bias constant; built from the
  // same literals in the oracle SQL so both engines get the same double
  private val HllAlphaSql = s"(0.7213/(1.0 + 1.079/$HllBuckets.0))"
  private[graft] val CmsDepth = 4
  private[graft] val CmsWidth = 256

  /** HyperLogLog (Flajolet et al. 2007) distinct-user estimate per
    * event type — with the standard linear-counting fallback in the
    * small-range regime — next to the exact count and relative error. The
    * 32-bit hash comes from the first 8 md5 hex chars (engine-portable,
    * no RNG): top 8 bits pick one of 256 registers, the rank is the
    * leading-zero count of the low 24 bits (via floor(log2)). Registers
    * are a groupBy(type, bucket) max — map-side combinable, 256 rows per
    * type. Z-sums of 2⁻ʳ are dyadic rationals ≥ 2⁻²⁵ so the fp sum is
    * exact in any order; the alpha·m²/Z estimate is a fixed IEEE
    * expression both engines evaluate identically.
    */
  /** Adds (bucket, rho) register coordinates derived from `user_id` —
    * shared by the batch estimators and the streaming register
    * maintenance (the same expression graph works under a streaming
    * aggregation, because register max is just a groupBy max).
    */
  private[graft] def withHllCoords(df: DataFrame): DataFrame = df
    .withColumn("h",
      conv(substring(md5(col("user_id").cast("string").cast("binary")), 1, 8), 16, 10).cast("long"))
    .withColumn("bucket", expr(s"h div $HllRem"))
    .withColumn("r", col("h") % HllRem)
    .withColumn("rho",
      when(col("r") === 0, lit(HllRho0))
        .otherwise(lit(HllRemBits) - floor(log2(col("r"))).cast("int")))

  def eventsHll(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir).select(col("event_type"), col("user_id"))
    val hashed = withHllCoords(e)
    val registers = hashed.groupBy(col("event_type"), col("bucket"))
      .agg(max(col("rho")).as("mr"))
    val alpha = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(HllBuckets.toDouble))
    val z = registers.groupBy(col("event_type"))
      .agg((sum(pow(lit(2.0), -col("mr"))) + (lit(HllBuckets) - count(lit(1)))).as("zsum"),
        (lit(HllBuckets) - count(lit(1))).as("v"))
      .withColumn("raw", alpha * lit(HllBuckets.toDouble) * lit(HllBuckets.toDouble) / col("zsum"))
      // small-range regime (raw ≤ 2.5m with empty registers): linear
      // counting m·ln(m/V) — raw HLL is badly biased high when most
      // registers are empty
      .withColumn("est",
        when(col("raw") <= lit(HllLcThreshold) && col("v") > 0,
          lit(HllBuckets.toDouble) * log(lit(HllBuckets.toDouble) / col("v")))
          .otherwise(col("raw")))
    val exact = e.groupBy(col("event_type"))
      .agg(count_distinct(col("user_id")).as("exact_users"))
    z.join(exact, Seq("event_type"))
      .select(col("event_type"),
        round(lit(1e-9) + col("est"), 2).as("hll_estimate"),
        col("exact_users"),
        round(lit(1e-9) + abs(col("est") - col("exact_users")) / col("exact_users"), 4).as("rel_err"))
      .orderBy(col("event_type"))
  }

  /** Rolling 7-day distinct users per day, computed by MERGING daily
    * HLL registers — the pattern that replaces count(distinct) window
    * re-scans at 100 TB: the raw stream is reduced ONCE to per-day
    * registers (256 rows/day), and every rolling window is a groupBy-max
    * over those tiny frames, never a second pass over the data. The
    * window itself is an explode of each source day to the ≤ 7 target
    * days it feeds (a narrow map, no range join), so the whole merge is
    * map-side-combinable. Exact counts ride along to surface the
    * sketch's (deterministic) error.
    */
  def eventsHllRolling(spark: SparkSession, dir: String): DataFrame = {
    // Pre-aggregate to the distinct (day, user) frame BEFORE hashing
    // and before the 7-day replay (the events_cms commute): HLL
    // registers are max-aggregates and the exact arm is a
    // count_distinct, so duplicates within a day contribute nothing —
    // one map-side-combinable groupBy reduces the corpus to
    // |days|·|users| rows, and the per-row hash kernel plus the 7×
    // fan-out both run over that frame instead of the raw event log.
    val dayUser = Tables.events(spark, dir)
      .select(expr("ts_ns div 86400000000000").as("day"), col("user_id"))
      .distinct()
    val hashed = withHllCoords(dayUser)
    val regs = hashed.groupBy(col("day"), col("bucket")).agg(max(col("rho")).as("mr"))
    val days = regs.select(col("day")).distinct()
    // source day s feeds targets s..s+6 (t sees s ∈ [t-6, t]); targets
    // past the observed range drop out in the semi join
    val merged = regs
      .withColumn("t", explode(sequence(col("day"), col("day") + 6)))
      .join(broadcast(days.select(col("day").as("t"))), Seq("t"), "left_semi")
      .groupBy(col("t"), col("bucket")).agg(max(col("mr")).as("mr"))
    val alpha = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(HllBuckets.toDouble))
    val est = merged.groupBy(col("t"))
      .agg((sum(pow(lit(2.0), -col("mr"))) + (lit(HllBuckets) - count(lit(1)))).as("zsum"),
        (lit(HllBuckets) - count(lit(1))).as("v"))
      .withColumn("raw", alpha * lit(HllBuckets.toDouble) * lit(HllBuckets.toDouble) / col("zsum"))
      .withColumn("est",
        when(col("raw") <= lit(HllLcThreshold) && col("v") > 0,
          lit(HllBuckets.toDouble) * log(lit(HllBuckets.toDouble) / col("v")))
          .otherwise(col("raw")))
    val exact = dayUser
      .withColumn("t", explode(sequence(col("day"), col("day") + 6)))
      .join(broadcast(days.select(col("day").as("t"))), Seq("t"), "left_semi")
      .groupBy(col("t")).agg(count_distinct(col("user_id")).as("exact_users"))
    est.join(exact, Seq("t"))
      .select(col("t").as("day"),
        round(lit(1e-9) + col("est"), 2).as("hll_users"),
        col("exact_users"),
        round(lit(1e-9) + abs(col("est") - col("exact_users")) / col("exact_users"), 4).as("rel_err"))
      .orderBy(col("day"))
  }

  /** Mergeable binned-quantile sketch: p50/p95/p99 of `value` per event
    * type read from a 1024-bin equi-width histogram. One pass reduces
    * the stream to (type, bin) counts — map-side combinable, ≤ 1024
    * rows per type, mergeable by + across partitions/days — then the
    * quantiles are a cumulative-sum walk over the tiny histogram.
    * Rank thresholds use INTEGER cross-multiplication (100·cum ≥ k·n),
    * so bin selection involves no floating-point at all; only the final
    * midpoint estimate does double math (identical IEEE expressions in
    * both engines). The degenerate all-equal case (max = min) pins
    * bin 0 rather than dividing by zero.
    */
  def eventsQuantileSketch(spark: SparkSession, dir: String): DataFrame =
    binnedQuantiles(
      Tables.events(spark, dir).select(col("event_type"), col("value")),
      key = "event_type", value = "value", pcts = Seq(50, 95, 99))
      .orderBy(col("event_type"))

  /** The reusable form of the 1024-bin sketch: per `key` group, binned
    * estimates of `value` at the given integer percentiles, as columns
    * `p{pct}_est` next to `n`. Everything upstream of the final walk is
    * a constant-space mergeable aggregate (group stats, then ≤ 1024
    * (key, bin) counts), so this is the percentile form the engine uses
    * wherever group sizes grow with data — the exact `percentile`
    * aggregate buffers whole groups in the final reduce. The cum-sum
    * window runs over the ≤ 1024-row histogram per key, never the data.
    * The DuckDB twin is [[binnedQuantilesSql]]; `value` must be
    * non-null (filter first — both engines — so ranks agree).
    */
  private[graft] def binnedQuantiles(e: DataFrame, key: String, value: String,
      pcts: Seq[Int]): DataFrame =
    binnedQuantiles(e, key, value, pcts,
      e.groupBy(col(key))
        .agg(min(col(value)).as("mn"), max(col(value)).as("mx"),
          count(lit(1)).as("n")))

  /** Variant taking a PRECOMPUTED per-key stats frame (`key`, `mn`,
    * `mx`, `n` — exact, unrounded) so a caller that already aggregated
    * min/max/count (profile_columns' one-row stats pass) does not pay
    * a second full pass of `e` just to rebuild them (r16; guide §2.4 —
    * the bin range needs the same min/max the profile already has).
    */
  private[graft] def binnedQuantiles(e: DataFrame, key: String, value: String,
      pcts: Seq[Int], stats: DataFrame): DataFrame = {
    val v = col(value)
    val binned = e.join(broadcast(stats), Seq(key))
      .withColumn("bin",
        when(col("mx") > col("mn"),
          least(lit(1023), floor((v - col("mn")) / (col("mx") - col("mn")) * 1024).cast("int")))
          .otherwise(lit(0)))
      .groupBy(col(key), col("bin")).agg(count(lit(1)).as("c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(key)).orderBy(col("bin"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val cum = binned.withColumn("cum", sum(col("c")).over(w))
      .join(broadcast(stats), Seq(key))
    def estAt(pct: Int): org.apache.spark.sql.Column = {
      val qbin = min(when(col("cum") * 100 >= col("n") * pct, col("bin")))
      when(col("mx_") > col("mn_"),
        col("mn_") + (qbin + lit(0.5)) * ((col("mx_") - col("mn_")) / lit(1024.0)))
        .otherwise(col("mn_"))
    }
    cum
      .withColumnRenamed("mn", "mn_").withColumnRenamed("mx", "mx_")
      .groupBy(col(key), col("mn_"), col("mx_"), col("n"))
      .agg(
        round(lit(1e-9) + estAt(pcts.head), 4).as(s"p${pcts.head}_est"),
        pcts.tail.map(p => round(lit(1e-9) + estAt(p), 4).as(s"p${p}_est")): _*)
      .select(col(key) +: col("n") +: pcts.map(p => col(s"p${p}_est")): _*)
  }

  /** DuckDB twin of [[binnedQuantiles]]: CTE fragment over a relation
    * `u(key, value)` defining `bq(key, n, p{pct}_est…)` — byte-identical
    * binning and integer rank selection, so sketch outputs hash-match.
    */
  private[graft] def binnedQuantilesSql(key: String, pcts: Seq[Int]): String = {
    val ests = pcts.map(p =>
      s"round(1e-9 + CASE WHEN s.mx > s.mn THEN s.mn + (min(CASE WHEN c.cum*100 >= s.n*$p THEN c.bin END) + 0.5) * ((s.mx - s.mn)/1024.0) ELSE s.mn END, 4) AS p${p}_est")
      .mkString(",\n |  ")
    s"""bstats AS (SELECT $key, min(value) AS mn, max(value) AS mx, count(*) AS n FROM u GROUP BY 1),
       |bbinned AS (
       | SELECT u.$key,
       |  CASE WHEN s.mx > s.mn
       |   THEN least(1023, CAST(floor((u.value - s.mn)/(s.mx - s.mn)*1024) AS INT))
       |   ELSE 0 END AS bin,
       |  count(*) AS c
       | FROM u JOIN bstats s USING ($key) GROUP BY 1, 2),
       |bcum AS (
       | SELECT $key, bin,
       |  sum(c) OVER (PARTITION BY $key ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cum
       | FROM bbinned),
       |bq AS (
       | SELECT c.$key, s.n,
       |  $ests
       | FROM bcum c JOIN bstats s USING ($key)
       | GROUP BY c.$key, s.mn, s.mx, s.n)""".stripMargin
  }

  /** Count-Min sketch (Cormode & Muthukrishnan 2005) heavy hitters:
    * per-user event counts read back from a 4×256 counter grid, vs the
    * exact counts. The counter increment is additive, so the build
    * commutes with pre-aggregation: ONE corpus pass groups events by
    * user (map-side combined), and the 4 hash cells are computed per
    * DISTINCT user — 4·|users| md5 evaluations instead of 4·|events|
    * (the first cut hashed every raw event row: measured 61s at sf10 vs
    * the same grid off the pre-aggregated frame; counter values are
    * identical because count-of-rows ≡ sum of per-user counts). The
    * (row, cell) counter shuffle has key space 1024 regardless of data
    * size; the grid broadcasts back onto the same per-user frame for
    * the min-over-rows point estimate (an upper bound that overcounts
    * only on collisions). Top-20 by estimate, integer-exact end to end.
    */
  /** The CMS cell hash — shared with SketchesSpec's bit-identity test
    * so the spec exercises THE production hash (a drift here must fail
    * the spec, not silently diverge from a copy).
    */
  private[graft] def cmsCell(i: org.apache.spark.sql.Column,
                             user: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    conv(substring(md5(concat(i.cast("string"), lit("_"), user.cast("string")).cast("binary")), 1, 4), 16, 10)
      .cast("long") % CmsWidth

  def eventsCms(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Tables.events(spark, dir).select(col("user_id"))
      .groupBy(col("user_id")).agg(count(lit(1)).as("exact_count"))
    val keyed = byUser
      .select(col("user_id"), col("exact_count"),
        explode(array((0 until CmsDepth).map(lit(_)): _*)).as("i"))
      .withColumn("cell", cmsCell(col("i"), col("user_id")))
    val counters = keyed.groupBy(col("i"), col("cell")).agg(sum(col("exact_count")).as("c"))
    val est = keyed.join(broadcast(counters), Seq("i", "cell"))
      .groupBy(col("user_id"), col("exact_count")).agg(min(col("c")).as("est_count"))
    est
      .select(col("user_id"), col("est_count"), col("exact_count"),
        (col("est_count") - col("exact_count")).as("overcount"))
      .orderBy(col("est_count").desc, col("user_id"))
      .limit(20)
  }

  private[graft] val KmvK = 256
  // 48-bit hash domain (12 md5 hex chars): every hash is exactly
  // representable in BOTH a BIGINT and an IEEE double, so the estimate
  // arithmetic is bit-identical across engines
  private[graft] val KmvDomain = 281474976710656.0 // 2^48

  /** KMV / theta-sketch audience overlap (Beyer et al., SIGMOD 2007):
    * the distinct-count sketch that supports set INTERSECTION — the one
    * set operation HLL registers cannot serve (HLL unions by register
    * max; intersection via inclusion-exclusion explodes the error).
    * Per event type, the sketch is the k=256 SMALLEST distinct 48-bit
    * md5 hashes of user_id; for a pair (A, B):
    *
    *   L      = the k smallest of sketch(A) ∪ sketch(B)   (= KMV of A∪B)
    *   D̂_∪    = (k−1) / frac(kth(L))            (the KMV estimator)
    *   ρ̂      = |L ∩ A ∩ B| / |L|               (overlap fraction in L)
    *   D̂_∩    = ρ̂ · D̂_∪                          (the ratio estimator)
    *
    * Degenerate small-range case (sketch holds the whole set) falls
    * back to exact counts through the same formulas. Scale shape: one
    * distinct shuffle on the skew-free (type, hash) composite key, then
    * the bounded-heap [[graft.expressions.TopKIds]] aggregate ships ≤ k
    * rows per type into the final shuffle — the sketch build is one
    * corpus pass at any size, and everything pairwise runs on
    * |types| k-row arrays (kilobytes). Accuracy is gated OUTSIDE the
    * serving path: SketchesSpec joins this output against an exact
    * pairwise overlap (computed spec-side) on both the shipped corpus
    * (complete sketches ⇒ exact) and a synthetic >k corpus (estimator
    * within the 1/√k error band) — the measured query never rescans
    * the corpus for an accuracy column (rounds ≤11 did, and the
    * C(|types|,2)-fanout self-join dominated the sf10 point).
    */
  def eventsKmvOverlap(spark: SparkSession, dir: String): DataFrame =
    kmvOverlapFrom(Tables.events(spark, dir).select(col("event_type"), col("user_id")))

  /** The KMV kernel over any (event_type, user_id) frame — split out so
    * the spec can drive the ESTIMATOR path with a synthetic corpus
    * whose per-type cardinality exceeds k (the shipped sf0.01 corpus
    * has 150 users, so every sketch there is complete and the small-
    * range exact fallback is what the oracle gates).
    */
  private[graft] def kmvOverlapFrom(e: DataFrame): DataFrame = {
    val dh = e
      .withColumn("h",
        conv(substring(md5(col("user_id").cast("string").cast("binary")), 1, 12), 16, 10)
          .cast("long"))
      .select(col("event_type"), col("h")).distinct()
    // TopKIds keeps the k LARGEST ord: negate, so sortedIds comes back
    // as the k smallest hashes in ASCENDING order (kth = last element)
    val sk = dh.groupBy(col("event_type"))
      .agg(graft.functions.Vectors.topKIds(negate(col("h").cast("double")), col("h"), KmvK)
        .as("sketch"))
    def kthFrac(arr: org.apache.spark.sql.Column) =
      element_at(arr, size(arr)).cast("double") / lit(KmvDomain)
    def estOf(arr: org.apache.spark.sql.Column) =
      when(size(arr) < KmvK, size(arr).cast("double"))
        .otherwise(lit((KmvK - 1).toDouble) / kthFrac(arr))
    val paired = sk.select(col("event_type").as("type_a"), col("sketch").as("sa"))
      .crossJoin(broadcast(sk.select(col("event_type").as("type_b"), col("sketch").as("sb"))))
      .filter(col("type_a") < col("type_b"))
    val merged = array_sort(array_union(col("sa"), col("sb")))
    val lCap = slice(merged, 1, KmvK)
    val estU = when(size(merged) < KmvK, size(merged).cast("double"))
      .otherwise(lit((KmvK - 1).toDouble) / kthFrac(lCap))
    val kcap = size(array_intersect(lCap, array_intersect(col("sa"), col("sb"))))
    val estI = kcap.cast("double") / size(lCap).cast("double") * estU
    paired
      .withColumn("est_a", estOf(col("sa")))
      .withColumn("est_b", estOf(col("sb")))
      .withColumn("est_union", estU)
      .withColumn("est_overlap", estI)
      .select(col("type_a"), col("type_b"),
        round(lit(1e-9) + col("est_a"), 2).as("est_a"),
        round(lit(1e-9) + col("est_b"), 2).as("est_b"),
        round(lit(1e-9) + col("est_union"), 2).as("est_union"),
        round(lit(1e-9) + col("est_overlap"), 2).as("est_overlap"))
      .orderBy(col("type_a"), col("type_b"))
  }

  /** Exact pairwise distinct-user overlap — the ACCURACY REFERENCE for
    * [[kmvOverlapFrom]]/[[kmvDiffFrom]], used only by SketchesSpec (and
    * available to offline audits). Corpus-sized by design (the distinct
    * (type,user) self-join with ≤ C(|types|,2) fanout per user), which
    * is exactly why it must never ride inside the measured sketch
    * probes.
    */
  private[graft] def exactOverlapOf(e: DataFrame): DataFrame = {
    val du = e.distinct()
    du.as("x")
      .join(du.as("y"),
        col("x.user_id") === col("y.user_id") && col("x.event_type") < col("y.event_type"))
      .groupBy(col("x.event_type").as("type_a"), col("y.event_type").as("type_b"))
      .agg(count(lit(1)).as("exact_overlap"))
  }

  /** KMV/theta-sketch a-not-b (set DIFFERENCE) — completes the sketch
    * set algebra next to [[eventsKmvOverlap]]'s union/intersection: for
    * an ordered pair (A, B), D̂_{A∖B} estimated entirely from the two
    * k-row sketches. θ = min(θ_A, θ_B) where θ_S = frac(kth(S)) (1.0
    * for a complete sketch): below θ BOTH sets' membership is fully
    * known, so the retained set R = {h ∈ sketch(A) : frac(h) < θ,
    * h ∉ sketch(B)} is an exact uniform sample of A∖B at rate θ and
    * D̂ = |R| / θ (Dasgupta et al., "Theta Sketch Framework", 2016).
    * Small-range degenerate case (both sketches complete, θ = 1) falls
    * back to exact through the same formula. Same scale shape as the
    * overlap probe: one skew-free distinct shuffle builds the sketches,
    * everything pairwise runs on k-row arrays; accuracy is gated
    * spec-side against [[exactDiffOf]], never inside the measured
    * probe.
    */
  def eventsKmvDiff(spark: SparkSession, dir: String): DataFrame =
    kmvDiffFrom(Tables.events(spark, dir).select(col("event_type"), col("user_id")))

  /** The a-not-b kernel over any (event_type, user_id) frame — split
    * out (like [[kmvOverlapFrom]]) so the spec can drive the estimator
    * path on a synthetic corpus whose per-type cardinality exceeds k.
    */
  private[graft] def kmvDiffFrom(e: DataFrame): DataFrame = {
    val dh = e
      .withColumn("h",
        conv(substring(md5(col("user_id").cast("string").cast("binary")), 1, 12), 16, 10)
          .cast("long"))
      .select(col("event_type"), col("h")).distinct()
    val sk = dh.groupBy(col("event_type"))
      .agg(graft.functions.Vectors.topKIds(negate(col("h").cast("double")), col("h"), KmvK)
        .as("sketch"))
    def thetaOf(arr: org.apache.spark.sql.Column) =
      when(size(arr) < KmvK, lit(1.0))
        .otherwise(element_at(arr, size(arr)).cast("double") / lit(KmvDomain))
    val paired = sk.select(col("event_type").as("type_a"), col("sketch").as("sa"))
      .crossJoin(broadcast(sk.select(col("event_type").as("type_b"), col("sketch").as("sb"))))
      .filter(col("type_a") =!= col("type_b"))
      .withColumn("theta", least(thetaOf(col("sa")), thetaOf(col("sb"))))
    val below = filter(col("sa"),
      h => h.cast("double") / lit(KmvDomain) < col("theta"))
    val estD = size(array_except(below, col("sb"))).cast("double") / col("theta")
    paired
      .select(col("type_a"), col("type_b"),
        round(lit(1e-9) + estD, 2).as("est_diff"))
      .orderBy(col("type_a"), col("type_b"))
  }

  /** Exact a-not-b distinct-user counts per ordered type pair — the
    * spec-side accuracy reference for [[kmvDiffFrom]] (see
    * [[exactOverlapOf]]; same never-in-the-serving-path rule).
    */
  private[graft] def exactDiffOf(e: DataFrame): DataFrame = {
    val du = e.distinct()
    val nPer = du.groupBy(col("event_type").as("type_a")).agg(count(lit(1)).as("n_a"))
    val pairs = nPer.select(col("type_a"))
      .crossJoin(broadcast(nPer.select(col("type_a").as("type_b"))))
      .filter(col("type_a") =!= col("type_b"))
    pairs
      .join(nPer, Seq("type_a"))
      .join(exactOverlapOf(e).withColumnRenamed("type_a", "ta").withColumnRenamed("type_b", "tb"),
        least(col("type_a"), col("type_b")) === col("ta") &&
          greatest(col("type_a"), col("type_b")) === col("tb"), "left")
      .select(col("type_a"), col("type_b"),
        (col("n_a") - coalesce(col("exact_overlap"), lit(0L))).as("exact_diff"))
  }

  private[graft] val HhK = 64

  /** EXACT corpus heavy hitters in two bounded passes (the pattern that
    * replaces a full-vocabulary groupBy at 100 TB): pass 1 runs the
    * mergeable Misra–Gries aggregate ([[graft.expressions.MisraGries]],
    * ≤ [[HhK]] counters per map task, ≤ HhK candidate terms out — every
    * term with frequency > n/k is guaranteed present); pass 2 counts
    * ONLY the broadcast candidates exactly (map-side combine over ≤ k
    * keys) and keeps count·k > n. The output is exactly `GROUP BY term
    * HAVING count·k > n` — deterministic regardless of MG arrival/merge
    * order, because the MG summary is a certified superset of the
    * emitted set — but neither pass ever shuffles the distinct-term
    * space. On the shipped const-vocab corpora |vocab| < k so the
    * summary is lossless (the oracle gates that regime); SketchesSpec
    * drives the lossy decrement/merge path on a synthetic Zipf corpus
    * with |vocab| ≫ k.
    */
  def textHeavyHitters(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("term"))
      .filter(length(col("term")) > 0)
    val sk = toks.agg(
      graft.functions.Vectors.misraGries(col("term"), HhK).as("cands"),
      count(lit(1)).as("n_tokens"))
    toks.crossJoin(broadcast(sk))
      .filter(array_contains(col("cands"), col("term")))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("cnt"), max(col("n_tokens")).as("n_tokens"))
      .filter(col("cnt") * HhK > col("n_tokens"))
      .select(col("term"), col("cnt"))
      .orderBy(col("cnt").desc, col("term"))
  }

  /** EXACT distinct users per (type, day) via bitmap words — the
    * roaring-bitmap OLAP pattern reduced to Spark primitives: user_id
    * space is chunked into 64-id buckets, each (type, day, bucket)
    * collapses to ONE 64-bit word (`bit_or` of `1 << (id % 64)` —
    * combinable, so map-side partials enter the shuffle as single
    * longs), and the readout is `sum(bit_count(word))`. Versus
    * count(distinct): the shuffled payload is one long per POPULATED
    * 64-id chunk instead of one row per distinct (type, day, user)
    * triple — a ≥ 64× reduction on dense id spaces — and the words
    * are mergeable state (day bitmaps OR together into week/month
    * rollups without re-touching events, the same algebra the HLL
    * rolling query rides, but exact). Both aggregations partial
    * map-side; keys are high-cardinality composites, skew-free.
    */
  def eventsBitmapDistinct(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(
      col("event_type"),
      date_format(col("ts"), "yyyy-MM-dd").as("day"),
      col("user_id"))
    ev.groupBy(col("event_type"), col("day"),
        expr("user_id div 64").as("bucket"))
      .agg(bit_or(expr("shiftleft(1L, int(user_id % 64))")).as("word"))
      .groupBy(col("event_type"), col("day"))
      .agg(sum(bit_count(col("word"))).as("n_users"))
      .orderBy(col("event_type"), col("day"))
  }

  /** EXACT rolling 7-day distinct users by OR-MERGING daily bitmap
    * words — [[eventsBitmapDistinct]]'s merge algebra exercised as a
    * query, and the exact twin of [[eventsHllRolling]]: the corpus is
    * touched ONCE (the daily word build); the rolling window then
    * replays day t's words into targets t..t+6 and re-ORs — a 7×
    * fan-out of the compact WORD frame (one long per populated 64-id
    * chunk per day), never of the event stream (contrast the HLL
    * key's exact-readout leg, which explodes hashed events 7×). This
    * is how a 100 TB deployment serves "distinct users, trailing
    * week, any day": daily bitmap segments merged at read time, no
    * count-distinct re-scan.
    */
  def eventsBitmapRolling(spark: SparkSession, dir: String): DataFrame = {
    val words = Tables.events(spark, dir)
      .select(expr("ts_ns div 86400000000000").as("day"), col("user_id"))
      .groupBy(col("day"), expr("user_id div 64").as("bucket"))
      .agg(bit_or(expr("shiftleft(1L, int(user_id % 64))")).as("word"))
    val days = words.select(col("day")).distinct()
    words
      .withColumn("t", explode(sequence(col("day"), col("day") + 6)))
      .join(broadcast(days.select(col("day").as("t"))), Seq("t"), "left_semi")
      .groupBy(col("t"), col("bucket")).agg(bit_or(col("word")).as("word"))
      .groupBy(col("t"))
      .agg(sum(bit_count(col("word"))).as("n_users_7d"))
      .select(col("t").as("day"), col("n_users_7d"))
      .orderBy(col("day"))
  }

  /** Scale bands: every key here is a constant-space mergeable sketch
    * (HLL registers, CMS counters, KMV k-minima, 1024-bin quantiles,
    * Misra-Gries heavy hitters, roaring-style bitmap words) — the
    * STATE is constant and merge-exact (spec-proven); the TIME is one
    * linear corpus pass, so the sketch band's time bound equals
    * linear's (see [[graft.QueryPack.bands]]).
    */
  override def bands: Map[String, String] =
    queries.keys.map(_ -> graft.Band.Sketch).toMap

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_bitmap_distinct" -> (eventsBitmapDistinct _),
    "events_bitmap_rolling" -> (eventsBitmapRolling _),
    "events_hll" -> (eventsHll _),
    "events_hll_rolling" -> (eventsHllRolling _),
    "events_kmv_overlap" -> (eventsKmvOverlap _),
    "events_kmv_diff" -> (eventsKmvDiff _),
    "text_heavy_hitters" -> (textHeavyHitters _),
    "events_quantile_sketch" -> (eventsQuantileSketch _),
    "events_cms" -> (eventsCms _))

  val oracles: Map[String, String] = Map(
    "events_bitmap_rolling" ->
      """WITH du AS (
        | SELECT DISTINCT epoch_ns(ts) // 86400000000000 AS day, user_id FROM events),
        |days AS (SELECT DISTINCT day FROM du)
        |SELECT d.day, count(DISTINCT du.user_id) AS n_users_7d
        |FROM days d JOIN du ON du.day BETWEEN d.day - 6 AND d.day
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "events_bitmap_distinct" ->
      """SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
        | count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "events_hll" ->
      s"""WITH h AS (
         | SELECT event_type, user_id,
         |  ('0x'||substring(md5(user_id::VARCHAR),1,8))::BIGINT AS h
         | FROM events),
         |b AS (
         | SELECT event_type, h // $HllRem AS bucket, h % $HllRem AS r FROM h),
         |reg AS (
         | SELECT event_type, bucket,
         |  max(CASE WHEN r = 0 THEN $HllRho0 ELSE $HllRemBits - CAST(floor(log2(r)) AS INT) END) AS mr
         | FROM b GROUP BY 1, 2),
         |z AS (
         | SELECT event_type,
         |  sum(power(2.0, -mr)) + ($HllBuckets - count(*)) AS zsum,
         |  $HllBuckets - count(*) AS v
         | FROM reg GROUP BY 1),
         |e0 AS (
         | SELECT event_type,
         |  $HllAlphaSql * $HllBuckets.0 * $HllBuckets.0 / zsum AS raw, v
         | FROM z),
         |e1 AS (
         | SELECT event_type,
         |  CASE WHEN raw <= $HllLcThreshold AND v > 0 THEN $HllBuckets.0 * ln($HllBuckets.0 / v) ELSE raw END AS est
         | FROM e0),
         |ex AS (SELECT event_type, count(DISTINCT user_id) AS exact_users FROM events GROUP BY 1)
         |SELECT e1.event_type,
         | round(1e-9 + est, 2) AS hll_estimate,
         | ex.exact_users,
         | round(1e-9 + abs(est - exact_users) / exact_users, 4) AS rel_err
         |FROM e1 JOIN ex USING (event_type)
         |ORDER BY event_type""".stripMargin,
    "events_hll_rolling" ->
      s"""WITH h AS (
         | SELECT epoch_ns(ts) // 86400000000000 AS day, user_id,
         |  ('0x'||substring(md5(user_id::VARCHAR),1,8))::BIGINT AS h
         | FROM events),
         |b AS (
         | SELECT day, h // $HllRem AS bucket, h % $HllRem AS r FROM h),
         |reg AS (
         | SELECT day, bucket,
         |  max(CASE WHEN r = 0 THEN $HllRho0 ELSE $HllRemBits - CAST(floor(log2(r)) AS INT) END) AS mr
         | FROM b GROUP BY 1, 2),
         |days AS (SELECT DISTINCT day FROM reg),
         |mreg AS (
         | SELECT t.t AS t, bucket, max(mr) AS mr
         | FROM reg, LATERAL (SELECT unnest(generate_series(day, day + 6)) AS t) t
         | WHERE t.t IN (SELECT day FROM days)
         | GROUP BY 1, 2),
         |z AS (
         | SELECT t, sum(power(2.0, -mr)) + ($HllBuckets - count(*)) AS zsum,
         |  $HllBuckets - count(*) AS v
         | FROM mreg GROUP BY 1),
         |e0 AS (
         | SELECT t, $HllAlphaSql * $HllBuckets.0 * $HllBuckets.0 / zsum AS raw, v FROM z),
         |e1 AS (
         | SELECT t, CASE WHEN raw <= $HllLcThreshold AND v > 0 THEN $HllBuckets.0 * ln($HllBuckets.0 / v) ELSE raw END AS est
         | FROM e0),
         |ex AS (
         | SELECT t.t AS t, count(DISTINCT user_id) AS exact_users
         | FROM h, LATERAL (SELECT unnest(generate_series(day, day + 6)) AS t) t
         | WHERE t.t IN (SELECT day FROM days)
         | GROUP BY 1)
         |SELECT e1.t AS day,
         | round(1e-9 + est, 2) AS hll_users,
         | ex.exact_users,
         | round(1e-9 + abs(est - exact_users) / exact_users, 4) AS rel_err
         |FROM e1 JOIN ex USING (t)
         |ORDER BY day""".stripMargin,
    "events_kmv_overlap" ->
      s"""WITH dh AS (
         | SELECT DISTINCT event_type,
         |  ('0x'||substring(md5(user_id::VARCHAR),1,12))::BIGINT AS h
         | FROM events),
         |r AS (
         | SELECT event_type, h,
         |  row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
         | FROM dh),
         |sk AS (SELECT event_type, h FROM r WHERE rn <= $KmvK),
         |stat AS (SELECT event_type, count(*) AS sz, max(h) AS kth FROM sk GROUP BY 1),
         |est1 AS (
         | SELECT event_type,
         |  CASE WHEN sz < $KmvK THEN sz::DOUBLE
         |   ELSE ${KmvK - 1}.0 / (kth::DOUBLE / 281474976710656.0) END AS est
         | FROM stat),
         |pairs AS (
         | SELECT a.event_type AS type_a, b.event_type AS type_b
         | FROM stat a JOIN stat b ON a.event_type < b.event_type),
         |m AS (
         | SELECT p.type_a, p.type_b, s.h
         | FROM pairs p JOIN sk s ON s.event_type IN (p.type_a, p.type_b)
         | GROUP BY 1, 2, 3),
         |mr AS (
         | SELECT type_a, type_b, h,
         |  row_number() OVER (PARTITION BY type_a, type_b ORDER BY h) AS rn,
         |  count(*) OVER (PARTITION BY type_a, type_b) AS msz
         | FROM m),
         |lcap AS (SELECT type_a, type_b, h, msz FROM mr WHERE rn <= $KmvK),
         |lagg AS (
         | SELECT type_a, type_b, count(*) AS lsz, max(h) AS kth, max(msz) AS msz
         | FROM lcap GROUP BY 1, 2),
         |icap AS (
         | SELECT l.type_a, l.type_b, count(*) AS kcap
         | FROM lcap l
         | JOIN sk sa ON sa.event_type = l.type_a AND sa.h = l.h
         | JOIN sk sb ON sb.event_type = l.type_b AND sb.h = l.h
         | GROUP BY 1, 2),
         |eu AS (
         | SELECT g.type_a, g.type_b, g.lsz,
         |  CASE WHEN g.msz < $KmvK THEN g.msz::DOUBLE
         |   ELSE ${KmvK - 1}.0 / (g.kth::DOUBLE / 281474976710656.0) END AS est_union,
         |  coalesce(i.kcap, 0) AS kcap
         | FROM lagg g LEFT JOIN icap i ON i.type_a = g.type_a AND i.type_b = g.type_b)
         |SELECT u.type_a, u.type_b,
         | round(1e-9 + ea.est, 2) AS est_a,
         | round(1e-9 + eb.est, 2) AS est_b,
         | round(1e-9 + u.est_union, 2) AS est_union,
         | round(1e-9 + (u.kcap::DOUBLE / u.lsz * u.est_union), 2) AS est_overlap
         |FROM eu u
         |JOIN est1 ea ON ea.event_type = u.type_a
         |JOIN est1 eb ON eb.event_type = u.type_b
         |ORDER BY u.type_a, u.type_b""".stripMargin,
    "events_kmv_diff" ->
      s"""WITH dh AS (
         | SELECT DISTINCT event_type,
         |  ('0x'||substring(md5(user_id::VARCHAR),1,12))::BIGINT AS h
         | FROM events),
         |r AS (
         | SELECT event_type, h,
         |  row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
         | FROM dh),
         |sk AS (SELECT event_type, h FROM r WHERE rn <= $KmvK),
         |stat AS (SELECT event_type, count(*) AS sz, max(h) AS kth FROM sk GROUP BY 1),
         |th AS (
         | SELECT event_type,
         |  CASE WHEN sz < $KmvK THEN 1.0 ELSE kth::DOUBLE / 281474976710656.0 END AS theta
         | FROM stat),
         |pairs AS (
         | SELECT a.event_type AS type_a, b.event_type AS type_b,
         |  least(a.theta, b.theta) AS theta
         | FROM th a JOIN th b ON a.event_type <> b.event_type),
         |ret AS (
         | SELECT p.type_a, p.type_b, count(*) AS retained
         | FROM pairs p
         | JOIN sk sa ON sa.event_type = p.type_a
         |  AND sa.h::DOUBLE / 281474976710656.0 < p.theta
         | LEFT JOIN sk sb ON sb.event_type = p.type_b AND sb.h = sa.h
         | WHERE sb.h IS NULL
         | GROUP BY 1, 2)
         |SELECT p.type_a, p.type_b,
         | round(1e-9 + coalesce(r.retained, 0)::DOUBLE / p.theta, 2) AS est_diff
         |FROM pairs p
         |LEFT JOIN ret r ON r.type_a = p.type_a AND r.type_b = p.type_b
         |ORDER BY p.type_a, p.type_b""".stripMargin,
    "text_heavy_hitters" ->
      s"""WITH t AS (
         | SELECT unnest(string_split(text, ' ')) AS term FROM documents),
         |tt AS (SELECT term FROM t WHERE len(term) > 0),
         |n AS (SELECT count(*) AS n_tokens FROM tt)
         |SELECT term, count(*) AS cnt
         |FROM tt
         |GROUP BY term
         |HAVING count(*) * $HhK > (SELECT n_tokens FROM n)
         |ORDER BY cnt DESC, term""".stripMargin,
    "events_quantile_sketch" ->
      """WITH stats AS (
        | SELECT event_type, min(value) AS mn, max(value) AS mx, count(*) AS n
        | FROM events GROUP BY 1),
        |binned AS (
        | SELECT e.event_type,
        |  CASE WHEN s.mx > s.mn
        |   THEN least(1023, CAST(floor((e.value - s.mn)/(s.mx - s.mn)*1024) AS INT))
        |   ELSE 0 END AS bin,
        |  count(*) AS c
        | FROM events e JOIN stats s USING (event_type) GROUP BY 1, 2),
        |cum AS (
        | SELECT event_type, bin,
        |  sum(c) OVER (PARTITION BY event_type ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cum
        | FROM binned),
        |j AS (SELECT c.event_type, c.bin, c.cum, s.mn, s.mx, s.n FROM cum c JOIN stats s USING (event_type))
        |SELECT event_type, n,
        | round(1e-9 + CASE WHEN mx > mn THEN mn + (min(CASE WHEN cum*100 >= n*50 THEN bin END) + 0.5) * ((mx - mn)/1024.0) ELSE mn END, 4) AS p50_est,
        | round(1e-9 + CASE WHEN mx > mn THEN mn + (min(CASE WHEN cum*100 >= n*95 THEN bin END) + 0.5) * ((mx - mn)/1024.0) ELSE mn END, 4) AS p95_est,
        | round(1e-9 + CASE WHEN mx > mn THEN mn + (min(CASE WHEN cum*100 >= n*99 THEN bin END) + 0.5) * ((mx - mn)/1024.0) ELSE mn END, 4) AS p99_est
        |FROM j GROUP BY event_type, mn, mx, n
        |ORDER BY event_type""".stripMargin,
    "events_cms" ->
      s"""WITH rows_h AS (
         | SELECT user_id, i.i AS i,
         |  ('0x'||substring(md5(i.i::VARCHAR || '_' || user_id::VARCHAR),1,4))::BIGINT % $CmsWidth AS cell
         | FROM events, (SELECT unnest(generate_series(0, ${CmsDepth - 1})) AS i) i),
         |counters AS (SELECT i, cell, count(*) AS c FROM rows_h GROUP BY 1, 2),
         |keys_h AS (
         | SELECT DISTINCT user_id, i.i AS i,
         |  ('0x'||substring(md5(i.i::VARCHAR || '_' || user_id::VARCHAR),1,4))::BIGINT % $CmsWidth AS cell
         | FROM events, (SELECT unnest(generate_series(0, ${CmsDepth - 1})) AS i) i),
         |est AS (
         | SELECT user_id, min(c) AS est_count
         | FROM keys_h JOIN counters USING (i, cell) GROUP BY 1),
         |exact AS (SELECT user_id, count(*) AS exact_count FROM events GROUP BY 1)
         |SELECT user_id, est_count, exact_count, est_count - exact_count AS overcount
         |FROM est JOIN exact USING (user_id)
         |ORDER BY est_count DESC, user_id LIMIT 20""".stripMargin)
}
