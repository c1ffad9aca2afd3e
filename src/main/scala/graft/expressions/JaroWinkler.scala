package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro–Winkler string similarity as a native codegen'd expression.
  *
  * The scorer of every record-linkage / spell-correction pipeline
  * (Winkler 1990). Spark ships levenshtein but no Jaro–Winkler; a Scala
  * UDF would force serialization in and out of Tungsten rows on a
  * kernel that runs |queries|·|vocab| times, so this is a Catalyst
  * `BinaryExpression` whose generated code calls one static method on
  * the raw UTF8Strings — the same shape as Spark's own Levenshtein
  * (which delegates to UTF8String.levenshteinDistance).
  *
  * Semantics match DuckDB's `jaro_winkler_similarity` (the oracle):
  *  - match window = max(len1,len2)/2 − 1 (floor, can be 0);
  *  - t = FLOOR(out-of-order matched positions / 2) — integer
  *    division, calibrated empirically: the /2.0 variant diverges from
  *    DuckDB on 300 of 4000 random pairs, the floor variant on 0;
  *  - jaro = (m/l1 + m/l2 + (m−t)/m) / 3, 0.0 when m = 0;
  *  - Winkler boost ONLY when jaro > 0.7: jw = jaro + 0.1·p·(1−jaro)
  *    with p = common prefix length capped at 4;
  *  - either side empty → 0.0 (DuckDB returns 0 even for ""≡"").
  * Verified against DuckDB probe values in JaroWinklerSpec.
  */
object JaroWinklerAlgo {

  /** Static entry point shared by eval and generated code.
    *
    * CALIBRATION SCOPE: comparison is per UTF-16 char, DuckDB's
    * jaro_winkler_similarity is per byte. On ASCII the two units
    * coincide, and the 4000-pair fuzz calibration in JaroWinklerSpec
    * runs on ASCII input — so DuckDB-identical semantics are claimed
    * (and SQL-registered) for ASCII strings only. Multi-byte input
    * changes l1/l2 and the match window differently per engine; the
    * engine's dictionary/name columns are ASCII, so the keyed queries
    * never leave the calibrated regime.
    */
  def sim(a: UTF8String, b: UTF8String): Double = {
    val s1 = a.toString
    val s2 = b.toString
    val jaro = jaroKernel(s1, s2)
    if (jaro <= 0.7) jaro
    else {
      var p = 0
      val pMax = math.min(4, math.min(s1.length, s2.length))
      while (p < pMax && s1.charAt(p) == s2.charAt(p)) p += 1
      jaro + 0.1 * p * (1.0 - jaro)
    }
  }

  /** The jaro component alone — [[sim]] without the Winkler prefix
    * boost. Not on any query path; PropertySpec uses it to assert the
    * boost-dominance property (boosted >= unboosted) against the REAL
    * unboosted value rather than an algebraic floor. Shares
    * [[jaroKernel]] with [[sim]] by construction, so the two cannot
    * drift (which would invalidate that test's premise).
    */
  def jaroOnly(a: UTF8String, b: UTF8String): Double =
    jaroKernel(a.toString, b.toString)

  /** The shared match/transposition kernel: plain Jaro similarity.
    * 0.0 when either side is empty or nothing matches.
    */
  private def jaroKernel(s1: String, s2: String): Double = {
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(0, math.max(l1, l2) / 2 - 1)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var matches = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2 - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!m2(j) && s1.charAt(i) == s2.charAt(j)) {
          m1(i) = true; m2(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    // transpositions: walk matched chars of both strings in order
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val m = matches.toDouble
    (m / l1 + m / l2 + (m - t / 2) / m) / 3.0
  }
}

/** `jaro_winkler(left, right)` — see [[JaroWinklerAlgo.sim]]. */
case class JaroWinkler(left: Expression, right: Expression) extends BinaryExpression {

  override def prettyName: String = "jaro_winkler"
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two string arguments, got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerAlgo.sim(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expressions.JaroWinklerAlgo.sim($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}
