package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted join for skewed keys.
  *
  * When one join key carries a disproportionate share of rows (hot
  * filesystem, hot document, hot user), the shuffle partition holding
  * it becomes the straggler. Salting splits each hot key into
  * `saltBuckets` sub-keys: the skewed (large) side gets a random-ish
  * but DETERMINISTIC salt derived from a row column, the small side is
  * replicated once per bucket. Equivalent to the plain join, but the
  * hot key's rows spread over `saltBuckets` reducers.
  *
  * AQE's skew-join handles sort-merge cases adaptively; explicit
  * salting still wins when the skew is extreme or the join is
  * broadcast-unfriendly — and it composes with aggregations
  * (salt → partial agg → de-salt → final agg).
  */
object SkewJoin {

  /** Join `big` (skewed) with `small` on `key`, spreading each key over
    * `saltBuckets` partitions. `saltSource` must be a column of `big`
    * with roughly unique values (used only to derive a stable salt).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 saltSource: String, saltBuckets: Int = 16): DataFrame = {
    val salted = big.withColumn("_salt", pmod(hash(col(saltSource)), lit(saltBuckets)))
    val replicated = small
      .withColumn("_salt", explode(sequence(lit(0), lit(saltBuckets - 1))))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }
}
