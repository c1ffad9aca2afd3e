package graft

import graft.operators.Indexer
import graft.sources.IndexStore
import java.nio.file.Files

/** End-to-end incremental indexer: run → state advances → rerun is a
  * no-op → new events produce a delta-only merge.
  */
class IndexerE2ESpec extends SparkSpec {

  test("incremental runs are watermarked, idempotent, and mergeable") {
    val idxDir = Files.createTempDirectory("graft_e2e_idx").toString
    val stateDir = Files.createTempDirectory("graft_e2e_state").toString
    val store = new IndexStore(spark, idxDir, "key")

    // first run: everything since epoch
    val r1 = Indexer.runIncremental(spark, sf, store, stateDir)
    assert(r1.metrics.uploadCreatedCount > 0)
    assert(r1.metrics.uploadModifiedCount == 0)
    assert(r1.metrics.readCount ==
      r1.metrics.uploadCreatedCount + r1.metrics.uploadFailedTooLargeCount)
    val state1 = store.read().get.count()
    assert(state1 == r1.metrics.uploadCreatedCount)
    assert(Indexer.readWatermark(stateDir) == r1.newWatermarkNs)

    // second run with no new events: complete no-op
    val r2 = Indexer.runIncremental(spark, sf, store, stateDir)
    assert(r2.metrics.readCount == 0 && r2.metrics.processedCount == 0)
    assert(store.currentVersion.contains(0L)) // no new snapshot version
    assert(store.read().get.count() == state1)

    // simulate catching up from a mid-stream watermark (5 days earlier)
    Indexer.writeWatermark(stateDir, r1.newWatermarkNs - 5L * 24 * 3600 * 1000000000L)
    val r3 = Indexer.runIncremental(spark, sf, store, stateDir)
    assert(r3.metrics.readCount > 0)
    assert(r3.metrics.uploadModifiedCount > 0) // overlapping keys merged, not duplicated
    assert(store.read().get.select("key").distinct().count() == store.read().get.count())
  }
}
