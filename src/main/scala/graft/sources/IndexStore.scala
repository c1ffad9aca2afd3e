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

  /** Footer-only row count of a snapshot (no data scan). */
  private def snapshotCount(v: Long): Long = spark.read.parquet(s"$root/v=$v").count()

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

    // a NULL predicate result counts as rejected: under three-valued
    // logic filter(p) and filter(!p) would BOTH drop the row — it would
    // vanish from the merge and the failure count alike
    val rejectedPred = reject.map(p => coalesce(p, lit(true)))
    val failed = rejectedPred.map(p => batch.filter(p).count()).getOrElse(0L)
    val accepted = rejectedPred.map(p => batch.filter(!p)).getOrElse(batch)

    val deduped = existing match {
      case None =>
        if (seqCol.isDefined) {
          val w = Window.partitionBy(col(keyCol)).orderBy(seqCol.map(c => col(c).desc).toSeq: _*)
          accepted.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
        } else accepted.dropDuplicates(keyCol)
      case Some(cur) =>
        // allowMissingColumns: batches may add columns over time
        // (schema evolution); absent columns null-fill on either side
        val tagged = cur.withColumn("_seq", lit(0))
          .unionByName(accepted.withColumn("_seq", lit(1)), allowMissingColumns = true)
        val w = Window.partitionBy(col(keyCol)).orderBy(mergeOrder: _*)
        tagged.withColumn("_rn", row_number().over(w))
          .filter(col("_rn") === 1).drop("_rn", "_seq")
    }

    writeSnapshot(deduped, nextV)

    // metrics without re-joining batch and snapshot: a merge never drops
    // keys, so created = |new snapshot| - |old snapshot| (footer-only
    // counts), and modified = distinct accepted batch keys - created
    val batchKeys = accepted.select(col(keyCol)).distinct().count()
    val created = snapshotCount(nextV) - prevV.map(snapshotCount).getOrElse(0L)
    MergeResult(created, batchKeys - created, failed, nextV)
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
        val n = cur.count()
        writeSnapshot(cur.repartition(numFiles), nextV)
        n
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
        val remaining = cur.join(keys.select(col(keyCol)).distinct(), Seq(keyCol), "left_anti")
        writeSnapshot(remaining, nextV)
        snapshotCount(nextV - 1) - snapshotCount(nextV)
    }
  }
}
