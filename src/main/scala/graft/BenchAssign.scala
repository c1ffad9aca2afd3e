package graft

import org.apache.spark.sql.functions._

/** Isolated measurement of the big-k nearest-centroid assignment
  * crossover (VERDICT r6 item 6): flat n×k broadcast assignment vs the
  * two-level coarse→fine path ([[graft.operators.Similarity
  * .assignToCellsTwoLevel]]) at a production-scale centroid count
  * (k > TwoLevelK = 4096, the regime a ~268M-vector corpus reaches
  * with k = √(n/16)). Prints one JSON line with best-of-3 wall times
  * for both paths plus their assignment agreement rate (the recall
  * trade of coarse probing at coarseProbes = 2).
  *
  * Usage: SPARK_GRAFT_SF_DIR=/tmp/sf1 SPARK_GRAFT_ASSIGN_K=4500 \
  *   sbt "runMain graft.BenchAssign"
  */
object BenchAssign {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf1")
    val k = sys.env.getOrElse("SPARK_GRAFT_ASSIGN_K", "4500").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Similarity

    val e = Tables.parallelized(spark,
      Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding")), "vec_id")
      .persist()
    val n = e.count()
    // first-k seed centroids, exactly kmeansOn's init (materialized so
    // neither path pays build cost inside the timed region)
    val cents = e.orderBy(col("vec_id")).limit(k)
      .select(col("vec_id").cast("int").as("cell"),
        transform(col("embedding"), x => x.cast("double")).as("centroid"))
      .localCheckpoint(true)

    def bestOf3(run: () => Long): Double =
      (1 to 3).map { _ =>
        val t0 = System.nanoTime(); run(); (System.nanoTime() - t0) / 1e9
      }.min

    def flat() = Similarity.assignToCells(e, cents, probes = 1, twoLevelK = Long.MaxValue, k = k)
    def two() = Similarity.assignToCells(e, cents, probes = 1, twoLevelK = 1L, k = k)
    flat().count(); two().count() // warm codegen + page cache
    val tFlat = bestOf3(() => flat().count())
    val tTwo = bestOf3(() => two().count())
    // agreement of the dispatched (approximate at coarse boundaries)
    // path with the exact flat assignment
    val agree = flat().withColumnRenamed("cell", "cf")
      .join(two().withColumnRenamed("cell", "ct"), Seq("vec_id"))
      .agg(avg(when(col("cf") === col("ct"), 1.0).otherwise(0.0))).first().getDouble(0)
    val loadAvgs =
      try scala.io.Source.fromFile("/proc/loadavg").mkString.split(" ").take(3).mkString("[", ",", "]")
      catch { case _: Throwable => "[]" }
    val json = s"""{"metric":"assign_crossover","sf":"$sfDir","n":$n,"k":$k,""" +
      s""""flat_sec":$tFlat,"two_level_sec":$tTwo,"agreement":$agree,""" +
      s""""loadavg":$loadAvgs,"cpus":$cpus}"""
    println(json)
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_ASSIGN_LAST.json")), json + "\n")
    catch { case _: Throwable => () }
    spark.stop()
  }
}
