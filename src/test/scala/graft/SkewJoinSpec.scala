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

  test("salt reaches the exchange: shuffle partitions on (key, _salt), not key alone") {
    import spark.implicits._
    val big = spark.range(20000)
      .select(when(col("id") < 18000, lit("hot")).otherwise(concat(lit("k"), col("id"))).as("key"),
        col("id").as("payload"))
    val small = (0 until 200).map(i => (s"k$i", i)).toDF("key", "weight")
      .union(Seq(("hot", -1)).toDF("key", "weight"))
    // force a shuffle join (the salted pattern's target regime: the
    // small side too large to broadcast) and read the executed plan
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = SkewJoin.saltedJoin(big, small, "key", "payload", saltBuckets = 8)
      joined.count()
      val plan = joined.queryExecution.executedPlan.toString
      // the hot key's rows spread across 8 reducers: the partitioning
      // expression must include the salt beside the key
      val parts = plan.linesIterator.filter(_.contains("hashpartitioning")).mkString("\n")
      assert(parts.contains("_salt"), s"salt missing from exchange partitioning:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("salted join spreads a hot key across many partitions") {
    import spark.implicits._
    val big = spark.range(5000).select(lit("hot").as("key"), col("id").as("payload"))
    val small = Seq(("hot", 1)).toDF("key", "weight")
    val parts = SkewJoin.saltedJoin(big, small, "key", "payload", saltBuckets = 8)
      .groupBy(pmod(hash(col("key"), col("payload")), lit(8))).count().count()
    assert(parts > 1) // payload-derived salt distributes the key
  }

  test("join_skew_salted equals the unsalted join + aggregate on corpus data") {
    val salted = operators.Analytics.joinSkewSalted(spark, sf).collect()
    val ev = Tables.events(spark, sf)
    val dim = ev.select(col("event_type")).distinct()
      .withColumn("weight", length(col("event_type")).cast("double"))
    val plain = ev.join(dim, Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(lit(1e-9) + sum(col("value") * col("weight")), 2).as("wsum"))
      .orderBy(col("event_type")).collect()
    assert(salted.map(_.toString).toSeq == plain.map(_.toString).toSeq)
  }
}
