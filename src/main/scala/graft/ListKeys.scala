package graft

/** Print the registered query keys, one per line — the shard planner in
  * tools/certify_sf10.sh uses this to split the full surface into
  * fresh-JVM bench shards (no JVM-side registry means no drift between
  * the shard lists and the code).
  *
  * With arg `bands`: print `key<TAB>band` instead — the export the
  * certification harness feeds tools/adjudicate_sf10.py, so the scale
  * bands graded at cert time are EXACTLY the ones declared next to the
  * registry bindings (round-13 verdict #4: single source of truth).
  */
object ListKeys {
  def main(args: Array[String]): Unit =
    if (args.headOption.contains("bands"))
      SparkEntry.bands.toSeq.sortBy(_._1)
        .foreach { case (k, b) => println(s"$k\t$b") }
    else SparkEntry.queries.keys.toSeq.sorted.foreach(println)
}
