package graft

/** The driver may call SparkEntry.entry with a session that lacks the
  * graft runtime confs — the contract must hold anyway.
  */
class EntrySpec extends SparkSpec {

  test("entry() works on a session without graft confs and returns rows") {
    // newSession(): fresh SQLConf (no nanosAsLong), like a driver-built
    // session; Tables.events must self-provision what it needs
    val bare = spark.newSession()
    bare.conf.unset("spark.sql.legacy.parquet.nanosAsLong") // simulate driver defaults
    assert(bare.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "false")
    val df = SparkEntry.entry(bare)
    assert(df.count() > 0)
  }

  test("every oracle key has a matching query") {
    assert(SparkEntry.oracleSql.keySet == SparkEntry.queries.keySet)
  }
}
