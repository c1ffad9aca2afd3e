package graft

/** Print the registered query keys, one per line — the shard planner in
  * tools/certify_sf10.sh uses this to split the full surface into
  * fresh-JVM bench shards (no JVM-side registry means no drift between
  * the shard lists and the code).
  */
object ListKeys {
  def main(args: Array[String]): Unit =
    SparkEntry.queries.keys.toSeq.sorted.foreach(println)
}
