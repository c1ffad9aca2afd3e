package graft

import graft.functions.SkewJoin
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpec {

  test("salted join returns exactly the plain join's rows under skew") {
    import spark.implicits._
    // heavily skewed: 90% of rows on one key
    val big = spark.range(10000)
      .select(when(col("id") < 9000, lit("hot")).otherwise(concat(lit("k"), col("id"))).as("key"),
        col("id").as("payload"))
    val small = Seq(("hot", 1), ("k9001", 2), ("k9500", 3), ("missing", 4)).toDF("key", "weight")

    val plain = big.join(small, "key")
      .select("key", "payload", "weight").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).sorted
    val salted = SkewJoin.saltedJoin(big, small, "key", "payload")
      .select("key", "payload", "weight").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).sorted

    assert(salted.length == plain.length)
    assert(salted.sameElements(plain))
  }

  test("salted join spreads a hot key across many partitions") {
    import spark.implicits._
    val big = spark.range(5000).select(lit("hot").as("key"), col("id").as("payload"))
    val small = Seq(("hot", 1)).toDF("key", "weight")
    val parts = SkewJoin.saltedJoin(big, small, "key", "payload", saltBuckets = 8)
      .groupBy(pmod(hash(col("key"), col("payload")), lit(8))).count().count()
    assert(parts > 1) // payload-derived salt distributes the key
  }
}
