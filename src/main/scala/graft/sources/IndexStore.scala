package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Parquet-backed search-index store with merge-or-upload semantics.
  *
  * This is the engine's stand-in for the reference's Azure Search
  * indexes (both the path index and the data index): a keyed table
  * where a batch write merges by key — latest write wins — and reports
  * created/modified/failed counts, exactly the semantics of
  * MergeOrUploadDocumentsAsync
  * (reference: AzureSearchIndexer/PathIndexClient.cs:24,
  * BatchingUploader.cs:35, DataLakeIndexer.cs:120-141 for the
  * failed-upload accounting).
  *
  * Storage layout: snapshot directories `v=N` under the index root;
  * a merge reads the live snapshot, unions the batch, window-dedups on
  * the key and writes `v=N+1` — an atomic-swap pattern (the pointer is
  * "largest committed version"), so readers never see partial writes.
  * At cluster scale both sides of the merge shuffle once on the key;
  * the batch is usually small ⇒ AQE broadcasts it.
  *
  * All filesystem access goes through the Hadoop FileSystem API, so the
  * root may live on any supported store (local, HDFS, ABFS/ADLS, S3) —
  * the same deployment surface as the engine's scans.
  *
  * @param seqCol optional caller-supplied sequence column: when a batch
  *   contains the same key more than once, the row with the LARGEST
  *   seqCol value wins (then, rows from the batch always beat rows from
  *   the snapshot). Without it, within-batch duplicate keys would be
  *   resolved arbitrarily — "latest write wins" is only well-defined if
  *   the caller says what "latest" means inside one batch.
  */
final case class MergeResult(created: Long, modified: Long, failed: Long, version: Long)

class IndexStore(spark: SparkSession, root: String, keyCol: String,
                 partitionCol: Option[String] = None,
                 seqCol: Option[String] = None) {

  private def hadoopFs = new org.apache.hadoop.fs.Path(root)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def versions: Seq[Long] = {
    val fs = hadoopFs
    val rootPath = new org.apache.hadoop.fs.Path(root)
    if (!fs.exists(rootPath)) Seq.empty
    else fs.listStatus(rootPath).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("v="))
      .map(_.getPath.getName.stripPrefix("v=").toLong)
      .sorted
  }

  def currentVersion: Option[Long] = versions.lastOption

  def read(): Option[DataFrame] =
    currentVersion.map(v => spark.read.parquet(s"$root/v=$v"))

  /** Run `write` (one action) and harvest the named `observe(...)`
    * metrics from its QueryExecution via a scoped listener. Returns
    * None when the metrics never arrive — QueryExecutionListener does
    * not fire for executions nested inside a streaming micro-batch
    * (foreachBatch), so blocking unconditionally (as
    * `org.apache.spark.sql.Observation.get` does) would hang there;
    * callers fall back to computing the metrics directly instead.
    */
  private def writeObserving(names: Set[String])(write: => Unit): Option[Map[String, org.apache.spark.sql.Row]] = {
    // inside a streaming micro-batch (foreachBatch) the listener will
    // never fire — don't pay the timeout on every batch, go straight
    // to the caller's fallback (the stream execution thread carries
    // the query-id local property)
    if (spark.sparkContext.getLocalProperty("sql.streaming.queryId") != null) {
      write
      return None
    }
    @volatile var rows: Map[String, org.apache.spark.sql.Row] = Map.empty
    val latch = new java.util.concurrent.CountDownLatch(1)
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             durationNs: Long): Unit = {
        val hit = qe.observedMetrics.filter { case (k, _) => names(k) }
        if (hit.size == names.size) { rows = hit; latch.countDown() }
      }
      override def onFailure(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      write
      if (latch.await(5, java.util.concurrent.TimeUnit.SECONDS)) Some(rows) else None
    } finally spark.listenerManager.unregister(listener)
  }

  /** Unwrap an observed aggregate (null on zero rows → 0). */
  private def metric(m: org.apache.spark.sql.Row, name: String): Long = {
    val i = m.fieldIndex(name)
    if (m.isNullAt(i)) 0L else m.getLong(i)
  }

  /** Every snapshot writer goes through here so the hive-partitioned
    * layout (→ partition pruning for "filesystem eq 'x'" reads)
    * survives merges, compactions and deletes alike.
    */
  private def writeSnapshot(df: DataFrame, v: Long): Unit = {
    val writer = df.write.mode(SaveMode.Overwrite)
    partitionCol.fold(writer)(c => writer.partitionBy(c)).parquet(s"$root/v=$v")
  }

  /** Within-batch then batch-vs-snapshot precedence for the merge
    * window: highest `_seq` first (batch=1 beats snapshot=0), then the
    * caller's sequence column descending when configured.
    */
  private def mergeOrder: Seq[Column] =
    col("_seq").desc +: seqCol.map(c => col(c).desc).toSeq

  /** Merge-or-upload a batch: batch rows override snapshot rows per
    * key; ties within the batch resolved by `seqCol` (see class doc).
    * Returns created/modified/failed counts like UpsertPathsResult
    * (reference: Models/UpsertPathsResult.cs).
    *
    * @param reject failure injection: rows matching this predicate are
    *   NOT merged and are counted in `MergeResult.failed` — the analog
    *   of per-document upload failures in the service response
    *   (reference: DataLakeIndexer.cs:120-141 UploadFailedCount).
    */
  def mergeOrUpload(batch: DataFrame, reject: Option[Column] = None): MergeResult = {
    val existing = read()
    val prevV = currentVersion
    val nextV = prevV.getOrElse(-1L) + 1

    // ALL metrics ride the snapshot-write job as observed aggregates
    // (CollectMetrics accumulators): one pass over the merge window, no
    // snapshot re-counts, and — because the batch plan executes exactly
    // once — the failed count can never disagree with what was written,
    // even for a nondeterministic batch frame.
    val tag = java.util.UUID.randomUUID().toString
    val batchName = s"graft_batch_$tag"
    val mergeName = s"graft_merge_$tag"

    // a NULL predicate result counts as rejected: under three-valued
    // logic filter(p) and filter(!p) would BOTH drop the row — it would
    // vanish from the merge and the failure count alike. (Catalyst does
    // not push filters through CollectMetrics, so the reject filter
    // below cannot starve the observed sum.)
    val flagged = batch
      .withColumn("_rej", reject.map(p => coalesce(p, lit(true))).getOrElse(lit(false)))
      .observe(batchName, sum(col("_rej").cast("long")).as("failed"))
    val accepted = flagged.filter(!col("_rej")).drop("_rej")

    val deduped = existing match {
      case None =>
        val within =
          if (seqCol.isDefined) {
            val w = Window.partitionBy(col(keyCol)).orderBy(seqCol.map(c => col(c).desc).toSeq: _*)
            accepted.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
          } else accepted.dropDuplicates(keyCol)
        within.observe(mergeName,
          count(lit(1)).as("created"),
          sum(lit(0L)).as("modified"))
      case Some(cur) =>
        // allowMissingColumns: batches may add columns over time
        // (schema evolution); absent columns null-fill on either side
        val tagged = cur.withColumn("_seq", lit(0))
          .unionByName(accepted.withColumn("_seq", lit(1)), allowMissingColumns = true)
        val w = Window.partitionBy(col(keyCol)).orderBy(mergeOrder: _*)
        // per-key "did the snapshot already hold this key" flag shares
        // the row_number window's partitioning — no extra shuffle. The
        // surviving row for any batch-touched key is always a batch row
        // (_seq sorts first), so _seq=1 ∧ _had=0 ⇔ created and
        // _seq=1 ∧ _had=1 ⇔ modified.
        tagged.withColumn("_rn", row_number().over(w))
          .withColumn("_had",
            max(when(col("_seq") === 0, 1).otherwise(0)).over(Window.partitionBy(col(keyCol))))
          .filter(col("_rn") === 1)
          .observe(mergeName,
            sum(when(col("_seq") === 1 && col("_had") === 0, 1L).otherwise(0L)).as("created"),
            sum(when(col("_seq") === 1 && col("_had") === 1, 1L).otherwise(0L)).as("modified"))
          .drop("_rn", "_seq", "_had")
    }

    writeObserving(Set(batchName, mergeName)) { writeSnapshot(deduped, nextV) } match {
      case Some(rows) =>
        MergeResult(metric(rows(mergeName), "created"), metric(rows(mergeName), "modified"),
          metric(rows(batchName), "failed"), nextV)
      case None =>
        // listener never fired (streaming micro-batch context): recompute
        // from the written snapshots — extra actions, same answers
        val failed = reject.map(p => batch.filter(coalesce(p, lit(true))).count()).getOrElse(0L)
        val newCount = spark.read.parquet(s"$root/v=$nextV").count()
        val created = newCount - prevV.map(v => spark.read.parquet(s"$root/v=$v").count()).getOrElse(0L)
        val batchKeys = accepted.select(col(keyCol)).distinct().count()
        MergeResult(created, batchKeys - created, failed, nextV)
    }
  }

  /** Rewrite the live snapshot into `numFiles` part files — the
    * small-files compaction every lake index needs after many
    * incremental merges (thousands of tiny parquet files kill scan
    * throughput; the optimize pass restores fat, scan-friendly files).
    */
  def optimize(numFiles: Int = 1): Long = {
    read() match {
      case None => 0L
      case Some(cur) =>
        val nextV = currentVersion.get + 1
        val name = s"graft_opt_${java.util.UUID.randomUUID()}"
        // counted during the rewrite job; fallback scans only if the
        // listener context swallowed the metrics (streaming micro-batch)
        writeObserving(Set(name)) {
          writeSnapshot(cur.observe(name, count(lit(1)).as("n")).repartition(numFiles), nextV)
        }.map(rows => metric(rows(name), "n"))
          .getOrElse(spark.read.parquet(s"$root/v=$nextV").count())
    }
  }

  /** Drop all but the newest `keepLast` snapshot versions (vacuum).
    * Returns the number of versions removed. Readers of the live
    * snapshot are unaffected — only superseded `v=N` dirs are deleted.
    */
  def compact(keepLast: Int = 1): Int = {
    require(keepLast >= 1, "must keep at least the live snapshot")
    val fs = hadoopFs
    val old = versions.dropRight(keepLast)
    old.foreach(v => fs.delete(new org.apache.hadoop.fs.Path(s"$root/v=$v"), true))
    old.length
  }

  /** Delete-by-key (the deleted-paths flow): next snapshot excludes the
    * tombstoned keys.
    */
  def deleteKeys(keys: DataFrame): Long = {
    read() match {
      case None => 0L
      case Some(cur) =>
        val nextV = currentVersion.get + 1
        // left join + null filter instead of left_anti so the tombstone
        // hits can be counted inside the write job (no before/after
        // snapshot counts)
        val name = s"graft_del_${java.util.UUID.randomUUID()}"
        val marked = cur
          .join(keys.select(col(keyCol)).distinct().withColumn("_del", lit(true)), Seq(keyCol), "left")
          .observe(name, sum(when(col("_del"), 1L).otherwise(0L)).as("deleted"))
        writeObserving(Set(name)) {
          writeSnapshot(marked.filter(col("_del").isNull).drop("_del"), nextV)
        }.map(rows => metric(rows(name), "deleted")).getOrElse {
          spark.read.parquet(s"$root/v=${nextV - 1}").count() -
            spark.read.parquet(s"$root/v=$nextV").count()
        }
    }
  }
}
