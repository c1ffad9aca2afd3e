package graft.operators

import graft.model.RunMetrics
import graft.sources.IndexStore
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** The complete reference workflow as one callable: list delta paths
  * since the last successful run → read + map documents → merge-or-
  * upload into the data index → record the new watermark. This is
  * RunDocumentIndexerOnPathsAsync + the function host's scheduling
  * state (reference: AzureSearchIndexer/DataLakeIndexer.cs:22,
  * DatalakePathIndexerFunc/DatalakeIndexerFunc.cs:40-46 "this should
  * actually be the time of the last successful run").
  *
  * The watermark is a tiny text file beside the index (on a cluster:
  * the same object store); reruns with no new events are no-ops, so
  * the indexer is idempotent and restartable.
  */
object Indexer {

  final case class IncrementalResult(metrics: RunMetrics, newWatermarkNs: Long)

  def readWatermark(stateDir: String): Long = {
    val p = Paths.get(stateDir, "last_run_ns")
    if (Files.exists(p)) Files.readString(p).trim.toLong else Long.MinValue
  }

  def writeWatermark(stateDir: String, ns: Long): Unit = {
    Files.createDirectories(Paths.get(stateDir))
    Files.writeString(Paths.get(stateDir, "last_run_ns"), ns.toString)
  }

  /** One incremental run against the synthetic change-log + documents. */
  def runIncremental(spark: SparkSession, dir: String, store: IndexStore, stateDir: String): IncrementalResult = {
    val since = readWatermark(stateDir)
    val log = PathIndexOps.changeLog(spark, dir).filter(col("ts_ns") > since).persist()

    val maxNsRow = log.agg(max(col("ts_ns"))).collect().head
    if (maxNsRow.isNullAt(0)) {
      log.unpersist()
      return IncrementalResult(RunMetrics(0, 0, 0, 0, 0, 0, 0), since)
    }
    val newWatermark = maxNsRow.getLong(0)

    val delta = PathIndexOps.upsertState(log)
      .filter(!col("is_delete"))
      .withColumn("doc_id", col("event_id") % 500)
      .select(col("key"), col("doc_id"), col("filesystem"))

    val docs = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"), col("n_chars"))
    val readable = docs.filter(col("n_chars") >= 60L)
    val readFailed = delta.join(docs.filter(col("n_chars") < 60L), Seq("doc_id")).count()

    val mapped = delta.join(readable, Seq("doc_id"))
      .select(col("key"), col("doc_id"), col("filesystem"),
        substring(col("text"), 1, 100).as("stringvalue"),
        col("n_chars").as("numbervalue"),
        md5(col("text").cast("binary")).as("eTag"))
    val tooLarge = mapped.filter(col("numbervalue") > 512L).count()
    val uploadable = mapped.filter(col("numbervalue") <= 512L)

    val merge = store.mergeOrUpload(uploadable)
    log.unpersist()

    val metrics = RunMetrics(
      readCount = delta.count() - readFailed,
      readFailedCount = readFailed,
      processedCount = merge.created + merge.modified,
      uploadCreatedCount = merge.created,
      uploadModifiedCount = merge.modified,
      uploadFailedCount = 0L,
      uploadFailedTooLargeCount = tooLarge)
    writeWatermark(stateDir, newWatermark)
    IncrementalResult(metrics, newWatermark)
  }
}
