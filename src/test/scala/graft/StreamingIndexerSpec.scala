package graft

import graft.sources.IndexStore
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** End-to-end streaming indexer: a parquet file source streams change
  * batches into the merge-or-upload IndexStore via foreachBatch — the
  * full reference loop (events arrive → upsert index) in Structured
  * Streaming form.
  */
class StreamingIndexerSpec extends SparkSpec {

  test("file-source stream drives IndexStore merges batch by batch") {
    val inDir = Files.createTempDirectory("graft_stream_in").toString
    val ckDir = Files.createTempDirectory("graft_stream_ck").toString
    val idxDir = Files.createTempDirectory("graft_stream_idx").toString
    import spark.implicits._

    val schema = "key STRING, value STRING, seq LONG"
    val store = new IndexStore(spark, idxDir, "key")

    // first file lands before the stream starts
    Seq(("k1", "v1", 1L), ("k2", "v2", 1L)).toDF("key", "value", "seq")
      .write.mode(SaveMode.Append).parquet(inDir)

    val stream = spark.readStream.schema(schema).parquet(inDir)
    val query = stream.writeStream
      .option("checkpointLocation", ckDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) { store.mergeOrUpload(batch); () }
      }
      .start()
    try {
      query.processAllAvailable()
      assert(store.read().get.count() == 2)

      // second file: one update, one insert — arrives mid-stream
      Seq(("k2", "v2b", 2L), ("k3", "v3", 2L)).toDF("key", "value", "seq")
        .write.mode(SaveMode.Append).parquet(inDir)
      query.processAllAvailable()

      val state = store.read().get.collect()
        .map(r => r.getAs[String]("key") -> r.getAs[String]("value")).toMap
      assert(state == Map("k1" -> "v1", "k2" -> "v2b", "k3" -> "v3"))
      assert(store.currentVersion.contains(1L))
    } finally query.stop()
  }
}
