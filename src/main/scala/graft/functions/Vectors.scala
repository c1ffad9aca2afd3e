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

  private def asDouble(v: Column): Column = transform(v, x => x.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column =
    sqrt(aggregate(asDouble(a), lit(0.0), (acc, x) => acc + x * x))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Deterministic pseudo-random hyperplane weight for LSH: md5-derived
    * value in [-1, 1), a function of (plane, dim) only — reproducible
    * across engines and runs with no RNG.
    */
  def planeWeight(plane: Column, dim: Column): Column =
    (conv(substring(md5(concat(plane.cast("string"), lit("_"), dim.cast("string")).cast("binary")), 1, 4), 16, 10)
      .cast("double") - 32768.0) / 32768.0
}
