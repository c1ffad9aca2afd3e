package graft

import graft.expressions.JaroWinklerAlgo
import graft.functions.Strings
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class JaroWinklerSpec extends SparkSpec {

  private def jw(a: String, b: String): Double =
    JaroWinklerAlgo.sim(UTF8String.fromString(a), UTF8String.fromString(b))

  test("matches DuckDB jaro_winkler_similarity on pinned probe values") {
    // values read directly from DuckDB 1.0.0 (the oracle engine)
    val pinned = Seq(
      ("MARTHA", "MARHTA", 0.9611111111111111),       // one transposition
      ("DIXON", "DICKSONX", 0.8133333333333332),      // prefix boost p=2
      ("JELLYFISH", "SMELLYFISH", 0.8962962962962964),// jaro>0.7 but p=0
      ("DWAYNE", "DUANE", 0.8400000000000001),
      ("abc", "abc", 1.0),
      ("ab", "ba", 0.0),                               // window 0: no matches
      ("a", "b", 0.0),
      ("", "abc", 0.0),
      ("", "", 0.0),                                   // DuckDB: empty → 0
      ("abcdefgh", "abzzzzzz", 0.5),                   // jaro ≤ 0.7: NO boost
      ("ab", "abcdefghijklmnop", 0.7666666666666667),  // jaro 0.7083 > 0.7: boost
      // odd out-of-order count: t = floor(3/2) = 1, NOT 1.5 — the
      // calibrated integer-floor semantics (see the expression Scaladoc)
      ("head", "gaadedceef", 0.5722222222222223))
    pinned.foreach { case (a, b, want) =>
      assert(math.abs(jw(a, b) - want) < 1e-12, s"('$a','$b')")
    }
  }

  test("codegen and interpreted paths agree on corpus tokens") {
    import spark.implicits._
    val toks = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("tok")).distinct()
      .crossJoin(broadcast(Seq("qery", "windw").toDF("q")))
    val rows = toks
      .select(col("tok"), col("q"), Strings.jaroWinkler(col("tok"), col("q")).as("s"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val want = jw(r.getString(0), r.getString(1))
      assert(r.getDouble(2) == want, s"codegen vs interpreted on ('${r.getString(0)}','${r.getString(1)}')")
    }
  }

  test("jaro_winkler is registered as a SQL function") {
    val r = spark.sql("SELECT jaro_winkler('MARTHA', 'MARHTA') AS s").collect()
    assert(math.abs(r(0).getDouble(0) - 0.9611111111111111) < 1e-12)
  }

  test("link_part_names: token blocking keeps cross-prefix matches prefix blocking loses") {
    val rows = operators.Analytics.linkPartNames(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(2) >= 0.9)
      assert(r.getString(0) < r.getString(1)) // canonical pair order
      assert(r.getLong(3) > 0 && r.getLong(4) > 0)
    }
    // the corpus's own strongest matches differ in FIRST character
    // ('cold X' ↔ 'old X') — they must survive, which single-character
    // prefix blocking could not deliver
    assert(rows.exists(r => r.getString(0).charAt(0) != r.getString(1).charAt(0)),
      "expected at least one cross-prefix linked pair")
  }

  test("link blocking: stop-token cap drops ubiquitous-token candidates, keeps rare-token pairs") {
    import spark.implicits._
    // 'common' appears in 66 names (> LinkDfCap = 64) → stop token.
    // The two 'common abcdefghN' names are JW-similar ABOVE τ but share
    // ONLY the stop token — the cap must drop them at BLOCKING time
    // (that is what bounds candidates to cap·Σdf ~ linear at 100× the
    // vocabulary). 'cold widget'/'old widget' share the rare token
    // 'widget' (df = 2 ≤ cap) and must still link.
    val filler = (0 until 64).map(i => (s"common u${i}x", 1L))
    val names = (filler ++ Seq(
      ("common abcdefgh1", 1L), ("common abcdefgh2", 1L),
      ("cold widget", 1L), ("old widget", 1L)))
      .toDF("p_name", "n")
    val out = operators.Analytics.linkNamesFrom(names).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    // the dropped pair WOULD clear the score threshold — prove the
    // absence is the blocker's doing, not the verifier's
    val jwRow = names.sparkSession.sql(
      "SELECT jaro_winkler('common abcdefgh1', 'common abcdefgh2') AS s").collect()
    assert(jwRow(0).getDouble(0) >= 0.9)
    assert(!out.contains(("common abcdefgh1", "common abcdefgh2")),
      s"stop-token pair should be blocked out: $out")
    assert(out.contains(("cold widget", "old widget")),
      s"rare-token pair must survive the cap: $out")
  }

  test("search_fuzzy_jw suggests the intended corrections, pruning by length band") {
    val out = operators.Search.searchFuzzyJw(spark, sf).collect()
    assert(out.nonEmpty)
    val byQ = out.groupBy(_.getString(0))
    // each mention's top suggestion is its source vocabulary word
    val expected = Map(
      "qery" -> "query", "windw" -> "window", "custmer" -> "customer",
      "strem" -> "stream", "vektor" -> "vector")
    expected.foreach { case (q, corr) =>
      byQ.get(q).foreach { rows =>
        assert(rows.head.getString(1) == corr, s"top suggestion for '$q'")
      }
    }
    // every emitted similarity clears the threshold
    assert(out.forall(_.getDouble(2) >= 0.9))
    // the length-band prune reached the plan: the persisted vocab scan
    // carries tok_len partition filters
    val plan = operators.Search.searchFuzzyJw(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("tok_len"), "expected tok_len pruning in the physical plan")
  }
}
