package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ad-hoc stage profiler for the r17 optimization round. NOT part of
  * the driver contract; delete before the round ends.
  */
object Scratch {
  def gcMs(): Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
      .map(_.getCollectionTime).sum
  }
  def time(spark: SparkSession, label: String)(df: => DataFrame): Unit = {
    spark.sparkContext.setJobDescription(label)
    val g0 = gcMs(); val t0 = System.nanoTime()
    val d = df
    d.write.format("noop").mode("overwrite").save()
    val el = (System.nanoTime() - t0) / 1e9
    println(f"[scratch] $label%-40s ${el}%8.2f s  gc=${(gcMs() - g0) / 1000.0}%6.1f s")
  }
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val reps = sys.env.getOrElse("SCRATCH_REPS", "2").toInt
    for (r <- 1 to reps) {
      println(s"[scratch] ---- rep $r ----")
      time(spark, "b1 explode+count, no parallelized") {
        Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
          .select(explode(split(col("text"), " ")).as("w"))
          .groupBy(col("w")).agg(count(lit(1)).as("k"))
      }
      time(spark, "b2 explode+count, parallelized") {
        Tables.parallelized(spark,
          Tables.documents(spark, sfDir).select(col("doc_id"), col("text")), "doc_id")
          .select(explode(split(col("text"), " ")).as("w"))
          .groupBy(col("w")).agg(count(lit(1)).as("k"))
      }
      time(spark, "b3 full bpeTrainStep") {
        graft.operators.TextAnalysis.bpeTrainStep(spark, sfDir)
      }
      time(spark, "b4 full bigramLogprob") {
        graft.operators.TextAnalysis.bigramLogprob(spark, sfDir)
      }
    }
    spark.stop()
  }
}
