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

  test("EventGrid envelope stream dispatches upserts and tombstones per micro-batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ckDir = Files.createTempDirectory("graft_env_ck").toString
    val idxDir = Files.createTempDirectory("graft_env_idx").toString
    val store = new IndexStore(spark, idxDir, "key")

    def env(id: Long, fs: String, path: String, evType: String, t: String): (Long, String) =
      id -> (s"""{"topic":"/subscriptions/s/resourceGroups/r/providers/Microsoft.Storage/storageAccounts/a",""" +
        s""""subject":"/blobServices/default/containers/$fs/blobs/$path","eventType":"Microsoft.Storage.$evType",""" +
        s""""eventTime":"$t","id":"$id","data":{"api":"x","eTag":"etag$id","contentType":"application/json",""" +
        s""""contentLength":${id * 10},"blobType":"BlockBlob","url":"https://acct.dfs.core.windows.net/$fs/$path",""" +
        s""""sequencer":"s$id"},"dataVersion":"1","metadataVersion":"1"}""")

    val input = MemoryStream[(Long, String)]
    val deadLetters = spark.sparkContext.longAccumulator("dead_letters")
    val query = graft.streaming.StreamingOps.indexBlobEventStream(
      input.toDF().toDF("event_id", "envelope"), store, ckDir, Some(deadLetters))
    try {
      // batch 1: two creates, plus a create+delete of the same path —
      // the delete is later, so the key must NOT survive
      input.addData(
        env(1, "fsA", "data/a.json", "BlobCreated", "2024-01-01T00:00:01Z"),
        env(2, "fsA", "data/b.json", "BlobCreated", "2024-01-01T00:00:02Z"),
        env(3, "fsA", "data/c.json", "BlobCreated", "2024-01-01T00:00:03Z"),
        env(4, "fsA", "data/c.json", "BlobDeleted", "2024-01-01T00:00:04Z"),
        // malformed envelope: must dead-letter, not upsert a null key
        99L -> "{not an envelope at all")
      query.processAllAvailable()
      val keys1 = store.read().get.collect().map(r =>
        new String(java.util.Base64.getDecoder.decode(r.getAs[String]("key")), "UTF-8")).sorted
      assert(keys1.sameElements(Array("fsA%2fdata%2fa.json", "fsA%2fdata%2fb.json")))
      assert(deadLetters.value == 1L) // the malformed envelope was counted, not lost

      // batch 2: modify a, delete b
      input.addData(
        env(5, "fsA", "data/a.json", "BlobCreated", "2024-01-01T01:00:00Z"),
        env(6, "fsA", "data/b.json", "BlobDeleted", "2024-01-01T01:00:01Z"))
      query.processAllAvailable()
      val state = store.read().get.collect()
      assert(state.length == 1)
      assert(state.head.getAs[String]("eTag") == "etag5") // modified, latest wins
    } finally query.stop()
  }
}
