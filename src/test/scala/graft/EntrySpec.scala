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

  test("declared scale bands reference real keys with legal band names") {
    // single-source-of-truth pin (r13 verdict #4): a band declared for
    // a key that was renamed/removed, or a typo'd band name, must fail
    // CI — not silently grade as linear at certification time.
    // iterate the REAL registry (SparkEntry.packs), not a hand-kept
    // copy — a pack added to SparkEntry is validated here automatically
    val declared = SparkEntry.packs.flatMap(_.bands)
    val orphans = declared.map(_._1).filterNot(SparkEntry.queries.keySet)
    assert(orphans.isEmpty, s"bands declared for unknown keys: $orphans")
    val illegal = declared.filterNot { case (_, b) => Band.All(b) }
    assert(illegal.isEmpty, s"illegal band names: $illegal")
    // and the resolved map covers the full surface
    assert(SparkEntry.bands.keySet == SparkEntry.queries.keySet)
  }
}
