package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic scale-up generator for bench scale points beyond the
  * driver-shipped sf0.1 (TESTDATA.md ships sf0.001/0.01/0.1 only; the
  * driver's generator is not in this repo). Replicates a source scale
  * factor `factor`× with per-replica key-domain shifts so referential
  * integrity holds within every replica (custkey/orderkey/partkey/
  * suppkey/event_id/user_id/doc_id/vec_id each shift by
  * rep · (max+1) of their own domain), and de-duplicates the content
  * tables deterministically (replica-tagged document text with n_chars
  * recomputed; one embedding dimension nudged per replica) so the
  * dedup/ANN index builds see a realistically grown corpus rather
  * than 10 exact copies. No RNG anywhere — same inputs, same bytes.
  *
  * Usage: runMain graft.GenData <srcDir> <outDir> [factor=10] [vocab=const]
  * Never writes into /root/testdata (driver data is read-only).
  *
  * Vocab modes for the documents table:
  *  - `const` (default): text copies through with a single ` r<rep>`
  *    replica tag — the word vocabulary stays the source's ~31 words at
  *    every factor (measured 31 at driver sf0.01/sf0.1, 40 at the
  *    replicated sf1/sf10). The scan/shuffle cost of the token family
  *    (text_tokens, sample_token_budget, bpe_train_step) under this
  *    mode is therefore pure corpus-token work, zero vocabulary growth.
  *  - `heaps`: additionally appends three deterministic rare tokens per
  *    doc (`h<md5(doc_id±salt) mod pool>`) from a pool sized
  *    ceil(8·√totalDocs), so the DISTINCT-word vocabulary grows as a
  *    true Heaps curve (V ∝ N^0.5, β = 0.5 — the published shape of
  *    real web corpora) while the corpus is otherwise identical. This
  *    is the stress shape for every "tokenize-the-vocab, never the
  *    corpus" claim: the per-distinct-word BPE fold must track √N,
  *    not N.
  */
object GenData {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: GenData <srcDir> <outDir> [factor] [vocab=const|heaps]")
    val src = args(0)
    val out = args(1)
    val factor = if (args.length >= 3) args(2).toInt else 10
    val vocabMode = if (args.length >= 4) args(3) else "const"
    require(Set("const", "heaps")(vocabMode), s"unknown vocab mode $vocabMode")
    require(!out.startsWith("/root/testdata"), "driver testdata is read-only")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val reps = spark.range(factor).select(col("id").as("rep"))
    def maxOf(name: String, c: String): Long =
      Tables.load(spark, src, name).agg(max(col(c)).cast("long")).first().getLong(0) + 1L
    val mCust = maxOf("customer", "c_custkey")
    val mSupp = maxOf("supplier", "s_suppkey")
    val mPart = maxOf("part", "p_partkey")
    val mOrd = maxOf("orders", "o_orderkey")
    val mEv = maxOf("events", "event_id")
    val mUser = maxOf("events", "user_id")
    val mDoc = maxOf("documents", "doc_id")
    val mVec = maxOf("embeddings", "vec_id")

    def write(df: DataFrame, name: String): Unit = {
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[gendata] $name: ${spark.read.parquet(s"$out/$name.parquet").count()} rows")
    }
    def scaled(name: String)(shift: DataFrame => DataFrame): Unit =
      write(shift(Tables.load(spark, src, name).crossJoin(broadcast(reps))).drop("rep"), name)
    def shifted(c: String, m: Long): Column = (col(c) + col("rep") * m).cast("long")

    // fixed-size dims copy through unscaled
    Seq("region", "nation").foreach(n => write(Tables.load(spark, src, n), n))

    scaled("customer")(_.withColumn("c_custkey", shifted("c_custkey", mCust)))
    scaled("supplier")(_.withColumn("s_suppkey", shifted("s_suppkey", mSupp)))
    scaled("part")(_.withColumn("p_partkey", shifted("p_partkey", mPart)))
    scaled("orders")(_
      .withColumn("o_orderkey", shifted("o_orderkey", mOrd))
      .withColumn("o_custkey", shifted("o_custkey", mCust)))
    scaled("lineitem")(_
      .withColumn("l_orderkey", shifted("l_orderkey", mOrd))
      .withColumn("l_partkey", shifted("l_partkey", mPart))
      .withColumn("l_suppkey", shifted("l_suppkey", mSupp)))
    scaled("events")(_
      .withColumn("event_id", shifted("event_id", mEv))
      .withColumn("user_id", shifted("user_id", mUser)))
    // heaps mode: three md5-derived rare tokens per doc from a
    // ceil(8·√totalDocs) pool — expected distinct ≈ the pool (draws ≫
    // pool), so vocabulary measures √10 ≈ 3.2× per decade by
    // construction. doc_id is already replica-shifted, so every
    // replica draws fresh pool members deterministically. Lazy: the
    // sizing count() is a full documents pass, paid only in heaps mode.
    lazy val nDocs = Tables.load(spark, src, "documents").count() * factor
    lazy val pool = math.ceil(8.0 * math.sqrt(nDocs.toDouble)).toLong
    def rare(salt: String): Column = concat(lit(" h"),
      pmod(conv(substring(md5(concat(col("doc_id").cast("string"), lit(salt))), 1, 8), 16, 10)
        .cast("long"), lit(pool)))
    scaled("documents")(_
      .withColumn("doc_id", shifted("doc_id", mDoc))
      .withColumn("text",
        when(col("rep") === 0, col("text"))
          .otherwise(concat(col("text"), lit(" r"), col("rep"))))
      .withColumn("text",
        if (vocabMode == "heaps")
          concat(col("text"), rare("a"), rare("b"), rare("c"))
        else col("text"))
      .withColumn("n_chars", length(col("text")).cast("long")))
    scaled("embeddings")(_
      .withColumn("vec_id", shifted("vec_id", mVec))
      .withColumn("embedding", transform(col("embedding"), (x, i) =>
        (x + col("rep").cast("float") * lit(1e-3f) *
          when(i === pmod(col("vec_id"), lit(64)), lit(1.0f)).otherwise(lit(0.0f))).cast("float"))))

    spark.stop()
  }
}
