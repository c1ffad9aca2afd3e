package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over Array[Float] columns as pure Column
  * expressions (whole-stage codegen; no UDF serialization cost).
  *
  * All arithmetic is forced to double before accumulating so results
  * are engine-portable (float32 accumulation order would not be).
  */
object Vectors {

  import org.apache.spark.sql.graftbridge.Bridge.{column => toCol, expression => ex}

  /** Native single-pass kernels (graft.expressions.*, codegen'd). */
  def dot(a: Column, b: Column): Column =
    toCol(graft.expressions.DotProduct(ex(a), ex(b)))

  def cosine(a: Column, b: Column): Column =
    toCol(graft.expressions.CosineSimilarity(ex(a), ex(b)))

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Bounded-heap top-k aggregate (graft.expressions.TopKIds): ids of
    * the k largest `ord` values per group, partial-aggregated map-side.
    */
  def topKIds(ord: Column, id: Column, k: Int): Column =
    toCol(graft.expressions.TopKIds(ex(ord), ex(id), k).toAggregateExpression())

  // Composable Column fallbacks (kept for engines/tests that want the
  // pure-functions formulation; math identical to the native kernels).
  private def asDouble(v: Column): Column = transform(v, x => x.cast("double"))

  def dotExpr(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def normExpr(a: Column): Column =
    sqrt(aggregate(asDouble(a), lit(0.0), (acc, x) => acc + x * x))

  def cosineExpr(a: Column, b: Column): Column = dotExpr(a, b) / (normExpr(a) * normExpr(b))

  /** Deterministic pseudo-random hyperplane weight for LSH: md5-derived
    * value in [-1, 1), a function of (plane, dim) only — reproducible
    * across engines and runs with no RNG.
    */
  def planeWeight(plane: Column, dim: Column): Column =
    (conv(substring(md5(concat(plane.cast("string"), lit("_"), dim.cast("string")).cast("binary")), 1, 4), 16, 10)
      .cast("double") - 32768.0) / 32768.0
}
