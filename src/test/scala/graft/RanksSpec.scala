package graft

import graft.functions.Ranks
import org.apache.spark.sql.functions._

class RanksSpec extends SparkSpec {

  /** Skewed multi-partition frame: many duplicate-ish keys clumped at
    * the low end so range-partition boundaries land inside dense runs —
    * the shape that exposed the round-2 stale-offset hazard (sampled
    * boundaries shifting between executions).
    */
  private def skewed = {
    import spark.implicits._
    val rows = (1 to 5000).map { i =>
      val k = if (i % 3 == 0) f"aaa_$i%07d" else f"zz_${i}%07d"
      (k, i.toLong)
    }
    rows.toDF("key", "payload").repartition(16)
  }

  test("globalRowNumber emits exactly 1..N, ordered by the key") {
    val df = skewed
    val n = df.count()
    val out = Ranks.globalRowNumber(df, "key", partitions = 8)
      .select(col("key"), col("rn")).collect()
    assert(out.length == n)
    val rns = out.map(_.getAs[Long]("rn")).sorted
    assert(rns.sameElements(1L to n), "sequence must be a bijection onto 1..N")
    // rn order must agree with key order
    val byRn = out.sortBy(_.getAs[Long]("rn")).map(_.getAs[String]("key"))
    assert(byRn.sameElements(byRn.sorted), "rn must follow the range order of the key")
  }

  test("globalCumSum equals the single-task window formulation") {
    import org.apache.spark.sql.expressions.Window
    val df = skewed.withColumn("v", col("payload").cast("double"))
    val out = Ranks.globalCumSum(df, "key", "v", partitions = 8)
      .select(col("key"), col("cum")).collect()
      .map(r => r.getAs[String]("key") -> r.getAs[Double]("cum")).toMap
    val expected = df.withColumn("cum",
        sum(col("v")).over(Window.orderBy(col("key"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("key"), col("cum")).collect()
      .map(r => r.getAs[String]("key") -> r.getAs[Double]("cum")).toMap
    assert(out.keySet == expected.keySet)
    out.foreach { case (k, c) =>
      assert(math.abs(c - expected(k)) < 1e-6, s"cum mismatch at $k: $c vs ${expected(k)}")
    }
  }

  test("globalRowNumber is stable across repeated actions on the same frame") {
    // the round-2 hazard: offsets collected in one action, result
    // computed in another — a re-sampled range partitioner could place
    // boundary rows differently, duplicating/skipping numbers. The
    // returned frame is materialized, so every re-execution must agree.
    val out = Ranks.globalRowNumber(skewed, "key", partitions = 8)
    val first = out.select("key", "rn").collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    val second = out.select("key", "rn").collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    assert(first.sameElements(second))
    val rns = first.map(_._2).sorted
    assert(rns.sameElements(1L to rns.length))
  }

  test("globalRowNumber releases its internal cache") {
    val before = spark.sharedState.cacheManager.isEmpty
    Ranks.globalRowNumber(skewed, "key", partitions = 8).count()
    // the scratch range-partitioned persist must not outlive the call
    // (the returned frame's checkpoint blocks are RDD-level, not
    // CacheManager entries, so the manager state is unchanged)
    assert(spark.sharedState.cacheManager.isEmpty == before)
  }
}
