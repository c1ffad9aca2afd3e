package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Parquet-backed search-index store with merge-or-upload semantics.
  *
  * This is the engine's stand-in for the reference's Azure Search
  * indexes (both the path index and the data index): a keyed table
  * where a batch write merges by key — latest write wins — and reports
  * created/modified counts, exactly the semantics of
  * MergeOrUploadDocumentsAsync
  * (reference: AzureSearchIndexer/PathIndexClient.cs:24,
  * BatchingUploader.cs:35).
  *
  * Storage layout: snapshot directories `v=N` under the index root;
  * a merge reads the live snapshot, unions the batch, window-dedups on
  * the key and writes `v=N+1` — an atomic-swap pattern (the pointer is
  * "largest committed version"), so readers never see partial writes.
  * At cluster scale both sides of the merge shuffle once on the key;
  * the batch is usually small ⇒ AQE broadcasts it.
  */
final case class MergeResult(created: Long, modified: Long, version: Long)

class IndexStore(spark: SparkSession, root: String, keyCol: String,
                 partitionCol: Option[String] = None) {

  private val fs = new java.io.File(root)

  private def versions: Seq[Long] =
    Option(fs.listFiles()).map(_.toSeq).getOrElse(Seq.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("v="))
      .map(_.getName.stripPrefix("v=").toLong)
      .sorted

  def currentVersion: Option[Long] = versions.lastOption

  def read(): Option[DataFrame] =
    currentVersion.map(v => spark.read.parquet(s"$root/v=$v"))

  /** Merge-or-upload a batch: latest `_seq` wins per key; rows in the
    * batch override rows in the snapshot. Returns created/modified
    * counts like UpsertPathsResult (reference: Models/UpsertPathsResult.cs).
    */
  def mergeOrUpload(batch: DataFrame): MergeResult = {
    val existing = read()
    val nextV = currentVersion.getOrElse(-1L) + 1

    val deduped = existing match {
      case None => batch.dropDuplicates(keyCol)
      case Some(cur) =>
        // allowMissingColumns: batches may add columns over time
        // (schema evolution); absent columns null-fill on either side
        val tagged = cur.withColumn("_seq", lit(0))
          .unionByName(batch.withColumn("_seq", lit(1)), allowMissingColumns = true)
        val w = Window.partitionBy(col(keyCol)).orderBy(col("_seq").desc)
        tagged.withColumn("_rn", row_number().over(w))
          .filter(col("_rn") === 1).drop("_rn", "_seq")
    }

    val writer = deduped.write.mode(SaveMode.Overwrite)
    // hive-partitioned layout → partition pruning for filtered reads
    // (the "filesystem eq 'x'" listing pattern never scans other partitions)
    partitionCol.fold(writer)(c => writer.partitionBy(c)).parquet(s"$root/v=$nextV")

    val result = existing match {
      case None => MergeResult(batch.dropDuplicates(keyCol).count(), 0L, nextV)
      case Some(cur) =>
        val batchKeys = batch.select(col(keyCol)).distinct()
        val existingKeys = cur.select(col(keyCol)).distinct()
        val modified = batchKeys.join(existingKeys, keyCol).count()
        MergeResult(batchKeys.count() - modified, modified, nextV)
    }
    result
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
        cur.repartition(numFiles).write.mode(SaveMode.Overwrite).parquet(s"$root/v=$nextV")
        n
    }
  }

  /** Drop all but the newest `keepLast` snapshot versions (vacuum).
    * Returns the number of versions removed. Readers of the live
    * snapshot are unaffected — only superseded `v=N` dirs are deleted.
    */
  def compact(keepLast: Int = 1): Int = {
    require(keepLast >= 1, "must keep at least the live snapshot")
    val old = versions.dropRight(keepLast)
    old.foreach { v =>
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete()
      }
      rm(new java.io.File(s"$root/v=$v"))
    }
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
        remaining.write.mode(SaveMode.Overwrite).parquet(s"$root/v=$nextV")
        cur.count() - remaining.count()
    }
  }
}
