package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global sequence numbers.
  *
  * `Window.orderBy(...)` with no partition key funnels every row
  * through ONE task — fine at test scale, fatal at 100 TB. This helper
  * computes the identical global row_number in three scalable steps:
  * range-repartition on the order key, rank within each partition,
  * then offset by the cumulative counts of the preceding partitions
  * (a tiny driver-side prefix sum over ≤ numPartitions values).
  *
  * The result is identical to the single-task formulation whenever the
  * order key is unique (range partitioning preserves global order
  * across partitions).
  */
object Ranks {

  def globalRowNumber(df: DataFrame, orderCol: String, outCol: String = "rn", partitions: Int = 32): DataFrame = {
    val parted = df.repartitionByRange(partitions, col(orderCol))
      .withColumn("_pid", spark_partition_id())
    val local = parted.withColumn("_lrn",
      row_number().over(Window.partitionBy(col("_pid")).orderBy(col(orderCol))))
    val counts = local.groupBy(col("_pid")).agg(count(lit(1)).as("_cnt"))
      .collect().map(r => r.getAs[Int]("_pid") -> r.getAs[Long]("_cnt")).sortBy(_._1)
    val offsets = counts.scanLeft(0L)(_ + _._2).zip(counts).map { case (off, (pid, _)) => (pid, off) }.toMap
    val offsetExpr = offsets.foldLeft(lit(0L)) { case (acc, (pid, off)) =>
      when(col("_pid") === pid, lit(off)).otherwise(acc)
    }
    local.withColumn(outCol, col("_lrn").cast("long") + offsetExpr).drop("_pid", "_lrn")
  }
}
