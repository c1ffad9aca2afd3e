package graft

import graft.functions.Vectors
import org.apache.spark.sql.functions._

class VectorExprSpec extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, sf)

  test("native cosine kernel matches the composable Column formulation") {
    val both = emb.limit(100)
      .crossJoin(broadcast(emb.filter(col("vec_id") === 0).select(col("embedding").as("q"))))
      .select(
        Vectors.cosine(col("embedding"), col("q")).as("native"),
        Vectors.cosineExpr(col("embedding"), col("q")).as("composed"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(math.abs(r.getAs[Double]("native") - r.getAs[Double]("composed")) < 1e-12)
    }
  }

  test("native dot kernel matches the composable form") {
    val both = emb.limit(100)
      .crossJoin(broadcast(emb.filter(col("vec_id") === 1).select(col("embedding").as("q"))))
      .select(
        Vectors.dot(col("embedding"), col("q")).as("native"),
        Vectors.dotExpr(col("embedding"), col("q")).as("composed"))
      .collect()
    both.foreach { r =>
      assert(math.abs(r.getAs[Double]("native") - r.getAs[Double]("composed")) < 1e-12)
    }
  }

  test("extensions register cosine_sim/dot_product as SQL functions") {
    emb.createOrReplaceTempView("emb_v")
    val viaSql = spark.sql(
      """SELECT a.vec_id, cosine_sim(a.embedding, b.embedding) AS c, dot_product(a.embedding, b.embedding) AS d
        |FROM emb_v a JOIN emb_v b ON b.vec_id = 0 WHERE a.vec_id < 5""".stripMargin).collect()
    assert(viaSql.length == 5)
    assert(viaSql.forall(r => !r.isNullAt(1) && !r.isNullAt(2)))
  }

  test("int8 quantized cosine tracks exact cosine within 3e-2") {
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    val quantized = emb.limit(200)
      .crossJoin(broadcast(q))
      .withColumn("s_a", Vectors.int8Scale(col("embedding")))
      .withColumn("s_q", Vectors.int8Scale(col("qv")))
      .withColumn("qa", Vectors.quantizeInt8(col("embedding"), col("s_a")))
      .withColumn("qq", Vectors.quantizeInt8(col("qv"), col("s_q")))
      .select(
        Vectors.cosine(col("embedding"), col("qv")).as("exact"),
        Vectors.cosineInt8(col("qa"), col("qq")).as("approx"))
      .collect()
    assert(quantized.nonEmpty)
    val maxErr = quantized.map(r => math.abs(r.getAs[Double]("exact") - r.getAs[Double]("approx"))).max
    assert(maxErr < 0.03, s"max quantization error $maxErr")
  }

  test("cosine of a zero vector is NULL, not NaN (interpreted + codegen)") {
    import spark.implicits._
    val df = Seq(
      (1, Array(0f, 0f, 0f), Array(1f, 2f, 3f)),
      (2, Array(1f, 0f, 0f), Array(0f, 0f, 0f)),
      (3, Array(1f, 2f, 2f), Array(1f, 2f, 2f))
    ).toDF("id", "a", "b")
    // codegen path
    val rows = df.select(col("id"), Vectors.cosine(col("a"), col("b")).as("c"))
      .orderBy(col("id")).collect()
    assert(rows(0).isNullAt(1) && rows(1).isNullAt(1))
    assert(math.abs(rows(2).getDouble(1) - 1.0) < 1e-12)
    // interpreted path: eval the expression directly on literal children
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    def litVec(v: Array[Float]) = Literal.create(v, ArrayType(FloatType, containsNull = false))
    assert(graft.expressions.CosineSimilarity(litVec(Array(0f, 0f)), litVec(Array(1f, 2f))).eval(null) == null)
    val ok = graft.expressions.CosineSimilarity(litVec(Array(1f, 0f)), litVec(Array(1f, 0f))).eval(null)
    assert(math.abs(ok.asInstanceOf[Double] - 1.0) < 1e-12)
  }

  test("native kernel stays inside whole-stage codegen") {
    val df = emb
      .crossJoin(broadcast(emb.filter(col("vec_id") === 0).select(col("embedding").as("q"))))
      .select(Vectors.cosine(col("embedding"), col("q")).as("c"))
    df.collect() // materialize so AQE finalizes the physical plan
    val plan = df.queryExecution.executedPlan.toString
    // the "*(n)" stage prefix marks whole-stage-codegen'd operators in
    // AQE's final-plan rendering
    assert(plan.matches("(?s).*\\*\\(\\d+\\) Project \\[cosine_sim.*"), s"plan:\n$plan")
  }
}
