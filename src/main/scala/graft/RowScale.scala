package graft

import org.apache.spark.sql.SparkSession

/** Output-cardinality scaling probe (round-14 sort harvest, companion
  * to [[SortAudit]]): counts each named key's output rows at two scale
  * factors. A key whose output GROWS with the corpus and ends in a
  * terminal global sort pays a corpus-sized range exchange for a
  * presentational ordering the correctness gate provably ignores
  * (probe_rowhash_ord readout, CORRECTNESS_r13.json); a fixed-k output
  * (top-k, page, facet table) keeps its sort — it is kilobytes.
  *
  * Output: `key  rows@dirA  rows@dirB` per line.
  */
object RowScale {
  def main(args: Array[String]): Unit = {
    val dirA = sys.env.getOrElse("SPARK_GRAFT_DIR_A", "/root/testdata/sf0.01")
    val dirB = sys.env.getOrElse("SPARK_GRAFT_DIR_B", "/root/testdata/sf0.1")
    val spark = GraftSession.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      SparkEntry.queries.get(name).foreach { fn =>
        val (a, b) =
          try (fn(spark, dirA).count(), fn(spark, dirB).count())
          catch { case _: Throwable => (-1L, -1L) }
        println(s"$name\t$a\t$b")
      }
    }
    spark.stop()
  }
}
