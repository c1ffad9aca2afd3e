package graft

import graft.functions.Vectors
import graft.operators.Similarity
import org.apache.spark.sql.functions._

class KMeansSpec extends SparkSpec {

  test("kmeans partitions all vectors into k cells deterministically") {
    val (assign1, cents1) = Similarity.kmeans(spark, sf, k = 8, iters = 2)
    val a1 = assign1.collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("cell")).toMap
    assert(a1.size == Tables.embeddings(spark, sf).count())
    assert(a1.values.toSet.subsetOf((0 until 8).toSet))
    // deterministic: same result on a second run
    val (assign2, _) = Similarity.kmeans(spark, sf, k = 8, iters = 2)
    val a2 = assign2.collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("cell")).toMap
    assert(a1 == a2)
    assert(cents1.collect().forall(_.getAs[Seq[Double]]("centroid").length == 64))
  }

  test("kmeans iterations do not increase within-cluster distance (Lloyd's monotonicity)") {
    def cost(iters: Int): Double = {
      val (assign, cents) = Similarity.kmeans(spark, sf, k = 8, iters = iters)
      Tables.embeddings(spark, sf)
        .join(assign, "vec_id").join(cents, "cell")
        .withColumn("d2", aggregate(
          zip_with(col("embedding"), col("centroid"), (x, c) => (x.cast("double") - c) * (x.cast("double") - c)),
          lit(0.0), (acc, v) => acc + v))
        .agg(sum("d2")).collect().head.getDouble(0)
    }
    val c1 = cost(1)
    val c3 = cost(3)
    assert(c3 <= c1 + 1e-6, s"cost increased: $c1 -> $c3")
  }

  test("kmeans assignment is a map-side partial aggregate, not a per-vector window") {
    val e = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
    val cents = e.filter(col("vec_id") < 8)
      .select(col("vec_id").cast("int").as("cell"),
        transform(col("embedding"), x => x.cast("double")).as("centroid"))
    val asg = Similarity.assignToCells(e, cents, probes = 2)
    val rows = asg.collect()
    assert(rows.length == 2 * Tables.embeddings(spark, sf).count(),
      "every vector must carry exactly `probes` assignments")
    val plan = asg.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"assignment must not use a window:\n$plan")
    // partial aggregate BELOW the exchange: Spark prints Partial-mode
    // TopKIds as `partial_top_k_ids` in the map-side ObjectHashAggregate,
    // i.e. the n×k candidate rows are reduced to one bounded-heap
    // partial per vector before any shuffle.
    assert(plan.contains("partial_top_k_ids"),
      s"expected a map-side partial_top_k_ids aggregate before the exchange:\n$plan")
  }

  test("multi-probe assignment ranks cells nearest-first with cell-asc tiebreak") {
    // probes=2 must equal the top-2 rows of the brute-force (d2, cell)
    // ordering per vector — the contract knn_join/dedup_embedding rely on.
    val e = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
    val cents = e.filter(col("vec_id") < 8)
      .select(col("vec_id").cast("int").as("cell"),
        transform(col("embedding"), x => x.cast("double")).as("centroid"))
    val got = Similarity.assignToCells(e, cents, probes = 2)
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("rk")) -> r.getAs[Int]("cell")).toMap
    val brute = e.crossJoin(broadcast(cents))
      .withColumn("d2", aggregate(
        zip_with(col("embedding"), col("centroid"), (x, c) => (x.cast("double") - c) * (x.cast("double") - c)),
        lit(0.0), (acc, v) => acc + v))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("vec_id")).orderBy(col("d2"), col("cell"))))
      .filter(col("rk") <= 2)
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("rk")) -> r.getAs[Int]("cell")).toMap
    assert(got == brute)
  }

  test("IVF over kmeans cells recovers most brute-force neighbors (recall)") {
    val (assign, cents) = Similarity.kmeans(spark, sf, k = 8, iters = 2)
    val q = Tables.embeddings(spark, sf).filter(col("vec_id") === 0)
      .select(col("embedding").as("qv"))
    // brute-force top-10
    val bf = Tables.embeddings(spark, sf).filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), Vectors.cosine(col("embedding"), col("qv")).as("cos"))
      .orderBy(col("cos").desc).limit(10)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    // probe the 3 nearest cells
    val qCell = cents.crossJoin(broadcast(q))
      .withColumn("d2", aggregate(
        zip_with(col("qv"), col("centroid"), (x, c) => (x.cast("double") - c) * (x.cast("double") - c)),
        lit(0.0), (acc, v) => acc + v))
      .orderBy(col("d2")).limit(3).select(col("cell"))
    val ivf = Tables.embeddings(spark, sf).join(assign, "vec_id")
      .join(broadcast(qCell), "cell")
      .filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), Vectors.cosine(col("embedding"), col("qv")).as("cos"))
      .orderBy(col("cos").desc).limit(10)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    val recall = bf.intersect(ivf).size / 10.0
    assert(recall >= 0.3, s"IVF recall too low: $recall (bf=$bf ivf=$ivf)")
  }
}
