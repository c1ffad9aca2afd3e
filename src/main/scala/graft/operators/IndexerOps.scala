package graft.operators

import graft.{QueryPack, Tables}
import graft.functions.Keys
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Document-indexer pipeline, re-expressing DataLakeIndexer semantics.
  *
  * Reference: AzureSearchIndexer/DataLakeIndexer.cs — list paths → read
  * files (parallel; read failures counted, not fatal) → user map fn
  * (null ⇒ skip) → BatchingUploader.cs — batch by doc count AND byte
  * cap, docs above the max size counted FailedTooLargeCount and
  * dropped; merge-or-upload; run metrics.
  *
  * On Spark the whole chain is one declarative plan: the "parallel
  * read" is the distributed scan itself, the map fn is a projection,
  * and the upload batching is a deterministic batch-id assignment (the
  * real sink on a cluster would be foreachPartition → HTTP client, so
  * the batching column is exactly what each executor would replay).
  *
  * Synthetic read semantics (SURVEY.md §3): a document "read" fails
  * when the payload is too short to parse (n_chars < 60 ⇒ mapper
  * returns null, mirroring IndexMapper.cs:14's null return); a doc is
  * too large for upload when n_chars > 512 (maxDocumentSizeBytes
  * analog).
  */
object IndexerOps extends QueryPack {

  private val ReadFailBelow = 60L
  private val TooLargeAbove = 512L
  private val BatchDocCount = 100L
  private[graft] val MaxBatchBytes = 8192L

  /** documents mapped to the index model (IndexMapper.cs analog). */
  def mappedDocs(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.parallelized(spark, Tables.documents(spark, dir), "doc_id")
    val path = concat(lit("docs/"), col("lang"), lit("/"), col("doc_id").cast("string"), lit(".json"))
    val encoded = Keys.pathUrlEncode(path)
    d.filter(col("n_chars") >= ReadFailBelow) // mapper returned null ⇒ skip
      .select(
        col("doc_id"),
        Keys.pathKey(col("source"), encoded).as("pathbase64"),
        substring(col("text"), 1, 100).as("stringvalue"),
        col("n_chars").as("numbervalue"),
        (col("n_chars") > 300).as("booleanvalue"),
        md5(col("text").cast("binary")).as("eTag"),
        encoded.as("pathUrlEncoded"))
  }

  // (terminal-sort retirement, round 14: see PathIndexOps §2.A note —
  // the r13 probe proved the gate hash order-insensitive, so the
  // corpus-sized keys here no longer pay a presentational range sort)
  def docReadMap(spark: SparkSession, dir: String): DataFrame =
    mappedDocs(spark, dir)

  /** Byte-accurate upload size of one index document: the octet length
    * of its JSON serialization — the reference sizes every doc by
    * serializing through a counting stream rather than guessing from
    * field lengths (reference: AzureSearchIndexer/BatchingUploader.cs:66-99,
    * CountingStream.cs:1-46).
    */
  private def uploadDocBytes: org.apache.spark.sql.Column =
    octet_length(to_json(struct(
      col("pathbase64"), col("stringvalue"), col("numbervalue"), col("booleanvalue")))).cast("long")

  /** Upload batch assignment over upload order (key order, like the
    * reference's stable channel order), capped by doc count AND by
    * serialized batch bytes (BatchingUploader's dual caps) with the
    * reference's GREEDY flush-before-exceed semantics: a doc whose
    * bytes would cross `MaxBatchBytes` starts the next batch, so no
    * emitted batch ever exceeds the cap (sound because too-large docs
    * are excluded first — a single doc always fits). Too-large docs are
    * grouped under batch_id -1 (FailedTooLargeCount analog).
    *
    * The greedy fold is inherently sequential, so it runs per
    * count-bucket: buckets are bounded at `BatchDocCount` docs (a
    * per-row `aggregate` over a collected ≤100-element array) and fold
    * in parallel across the cluster. The one concession to distribution
    * is that the byte accumulator restarts at each count-bucket
    * boundary, where the reference's single sequential uploader carries
    * it through — batch CONTENTS can differ at bucket seams, the
    * flush-before-exceed invariant never does.
    */
  def batchAssign(spark: SparkSession, dir: String): DataFrame = {
    val docs = mappedDocs(spark, dir).withColumn("doc_bytes", uploadDocBytes)
    val kept = docs.filter(col("numbervalue") <= TooLargeAbove)
    // distributed global sequence (no single-task window) → count-capped runs
    val assigned = graft.functions.Ranks.globalRowNumber(kept, "pathbase64")
      .withColumn("cb", ((col("rn") - 1) / BatchDocCount).cast("long"))
    // greedy byte-cap fold within each bucket, in upload (rn) order
    val zero = struct(lit(0L).as("acc"), lit(0L).as("sub"),
      array().cast("array<struct<sub_id:bigint,doc_bytes:bigint>>").as("out"))
    val folded = assigned.groupBy(col("cb"))
      .agg(array_sort(collect_list(struct(col("rn"), col("doc_bytes")))).as("ds"))
      .select(col("cb"), explode(aggregate(col("ds"), zero,
        (st, d) => {
          val tryAcc = st.getField("acc") + d.getField("doc_bytes")
          val cross = tryAcc > MaxBatchBytes
          val sub = when(cross, st.getField("sub") + 1L).otherwise(st.getField("sub"))
          val acc = when(cross, d.getField("doc_bytes")).otherwise(tryAcc)
          struct(acc.as("acc"), sub.as("sub"),
            concat(st.getField("out"),
              array(struct(sub.as("sub_id"), d.getField("doc_bytes").as("doc_bytes")))).as("out"))
        },
        st => st.getField("out"))).as("e"))
      .select(col("cb"), col("e.sub_id").as("sub_id"), col("e.doc_bytes").as("doc_bytes"))
    // composite id: sub_id < 1e6 provably (≤ BatchDocCount sub-batches
    // per bucket), so the encoding cannot collide across count buckets
    val batches = folded.groupBy(col("cb"), col("sub_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("doc_bytes")).as("total_bytes"))
      .select((col("cb") * 1000000L + col("sub_id")).as("batch_id"), col("n_docs"), col("total_bytes"))
    val tooLarge = docs.filter(col("numbervalue") > TooLargeAbove)
      .agg(count(lit(1)).as("n_docs"), sum(col("doc_bytes")).as("total_bytes"))
      .select(lit(-1L).as("batch_id"), col("n_docs"), col("total_bytes"))
    batches.unionByName(tooLarge).filter(col("n_docs") > 0).orderBy(col("batch_id"))
  }

  /** IndexerRunMetrics analog over one full run. */
  def indexerMetrics(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    d.agg(
      sum(when(col("n_chars") >= ReadFailBelow, 1L).otherwise(0L)).as("readCount"),
      sum(when(col("n_chars") < ReadFailBelow, 1L).otherwise(0L)).as("readFailedCount"),
      sum(when(col("n_chars") >= ReadFailBelow && col("n_chars") <= TooLargeAbove, 1L).otherwise(0L)).as("uploadCount"),
      sum(when(col("n_chars") > TooLargeAbove, 1L).otherwise(0L)).as("uploadFailedTooLargeCount"))
  }

  /** Flagship end-to-end incremental run: delta paths since cutoff →
    * read+map the backing documents → merge-or-upload rows for the data
    * index. One shuffle for the delta dedup, one broadcast-able join to
    * the documents "read".
    */
  def incrementalRun(spark: SparkSession, dir: String): DataFrame = {
    val delta = PathIndexOps.upsertState(
      PathIndexOps.changeLog(spark, dir)
        .filter(Tables.tsSinceNs(PathIndexOps.CutoffNs)))
      .filter(!col("is_delete"))
      .withColumn("doc_id", col("event_id") % 500)
      .select(col("key"), col("doc_id"), col("filesystem"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("fileLastModified"))
    val docs = Tables.documents(spark, dir)
      .filter(col("n_chars") >= ReadFailBelow)
      .select(col("doc_id"), substring(col("text"), 1, 100).as("stringvalue"),
        col("n_chars").as("numbervalue"), md5(col("text").cast("binary")).as("eTag"))
    delta.join(docs, Seq("doc_id"))
      .filter(col("numbervalue") <= TooLargeAbove)
      .select(col("key"), col("doc_id"), col("filesystem"), col("fileLastModified"),
        col("stringvalue"), col("numbervalue"), col("eTag"))
  }

  /** Queryable per-run metrics history for the reference's N staggered
    * scheduled indexer runs (IndexerRunMetrics.cs rows keyed by run;
    * DatalakeIndexerFunc.cs:21-49 — one function per path-prefix
    * partition, `search.ismatch('data%2fpart_N*')`). One change-log
    * scan computes every run's row: the schedule partition is the
    * FIRST DECIMAL DIGIT of the part folder (`part_1*` ⇒ {1, 10..19} —
    * prefix semantics, exactly the arithmetic `CASE p < 10 THEN p ELSE
    * p div 10` since the folder number is `event_id % 50`), the
    * watermark is max(ts) of the partition's post-cutoff log INCLUDING
    * deletes (Indexer.runIncremental advances its watermark before the
    * tombstone filter), and read/upload counts mirror runIncremental's
    * join-to-documents classification (a delta row with no matching
    * doc_id counts as READ — runIncremental's readCount is
    * delta.count() − readFailed, which includes unmatched docs — but
    * is never uploadable). Scale shape: groupBy on a
    * 10-value key after the per-key upsert dedup — the dedup shuffle
    * dominates and is the same one every upsert query pays; the run
    * grid itself is constant-size.
    */
  def indexerRunHistory(spark: SparkSession, dir: String): DataFrame = {
    val part = col("event_id") % 50
    val runId = when(part < 10, part).otherwise(expr("(event_id % 50) div 10")).cast("long")
    val log = PathIndexOps.changeLog(spark, dir)
      .filter(Tables.tsSinceNs(PathIndexOps.CutoffNs))
      .withColumn("run_id", runId)
    val wm = log.groupBy(col("run_id"))
      .agg(date_format(max(col("ts")), TsFmtRun).as("watermark"))
    val delta = PathIndexOps.upsertState(log)
      .filter(!col("is_delete"))
      .withColumn("doc_id", col("event_id") % 500)
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("n_chars"))
    val m = delta.join(docs, Seq("doc_id"), "left")
      .groupBy(col("run_id"))
      .agg(
        sum(when(col("n_chars").isNotNull && col("n_chars") < ReadFailBelow, 1L)
          .otherwise(0L)).as("read_failed_count"),
        sum(when(col("n_chars").isNotNull && col("n_chars") < ReadFailBelow, 0L)
          .otherwise(1L)).as("read_count"),
        sum(when(col("n_chars").isNotNull && col("n_chars") >= ReadFailBelow
          && col("n_chars") <= TooLargeAbove, 1L).otherwise(0L)).as("upload_count"),
        sum(when(col("n_chars").isNotNull && col("n_chars") > TooLargeAbove, 1L)
          .otherwise(0L)).as("upload_failed_too_large_count"))
    m.join(wm, Seq("run_id"))
      .select(col("run_id"),
        concat(lit("search.ismatch('data%2fpart_"), col("run_id").cast("string"),
          lit("*')")).as("partition_filter"),
        col("read_count"), col("read_failed_count"), col("upload_count"),
        col("upload_failed_too_large_count"), col("watermark"))
      .orderBy(col("run_id"))
  }

  private val TsFmtRun = "yyyy-MM-dd HH:mm:ss"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "doc_read_map" -> (docReadMap _),
    "batch_assign" -> (batchAssign _),
    "indexer_metrics" -> (indexerMetrics _),
    "incremental_run" -> (incrementalRun _),
    "indexer_run_history" -> (indexerRunHistory _))

  private val mappedSql =
    s"""SELECT doc_id,
       | to_base64(encode(source || '%2f' || replace('docs/' || lang || '/' || doc_id || '.json', '/', '%2f'))) AS pathbase64,
       | substring(text, 1, 100) AS stringvalue,
       | n_chars AS numbervalue,
       | (n_chars > 300) AS booleanvalue,
       | md5(text) AS eTag,
       | replace('docs/' || lang || '/' || doc_id || '.json', '/', '%2f') AS pathUrlEncoded
       |FROM documents WHERE n_chars >= $ReadFailBelow""".stripMargin

  val oracles: Map[String, String] = Map(
    "doc_read_map" -> (mappedSql + " ORDER BY doc_id"),
    "batch_assign" ->
      s"""WITH RECURSIVE mapped AS (
         |  SELECT *, CAST(octet_length(encode(to_json(struct_pack(
         |    pathbase64 := pathbase64, stringvalue := stringvalue,
         |    numbervalue := numbervalue, booleanvalue := booleanvalue))::VARCHAR)) AS BIGINT) AS doc_bytes
         |  FROM ($mappedSql)),
         |kept AS (SELECT *, row_number() OVER (ORDER BY pathbase64) AS rn
         |  FROM mapped WHERE numbervalue <= $TooLargeAbove),
         |cb AS (SELECT *, CAST((rn - 1) // $BatchDocCount AS BIGINT) AS cb FROM kept),
         |g AS (
         |  SELECT cb, rn, doc_bytes, doc_bytes AS acc, CAST(0 AS BIGINT) AS sub_id
         |  FROM cb WHERE (rn - 1) % $BatchDocCount = 0
         |  UNION ALL
         |  SELECT c.cb, c.rn, c.doc_bytes,
         |   CASE WHEN g.acc + c.doc_bytes > $MaxBatchBytes THEN c.doc_bytes ELSE g.acc + c.doc_bytes END,
         |   CASE WHEN g.acc + c.doc_bytes > $MaxBatchBytes THEN g.sub_id + 1 ELSE g.sub_id END
         |  FROM cb c JOIN g ON c.cb = g.cb AND c.rn = g.rn + 1),
         |batches AS (SELECT cb * 1000000 + sub_id AS batch_id, count(*) AS n_docs, CAST(sum(doc_bytes) AS BIGINT) AS total_bytes
         |  FROM g GROUP BY cb, sub_id),
         |toolarge AS (SELECT CAST(-1 AS BIGINT) AS batch_id, count(*) AS n_docs, CAST(sum(doc_bytes) AS BIGINT) AS total_bytes
         |  FROM mapped WHERE numbervalue > $TooLargeAbove)
         |SELECT * FROM (SELECT * FROM batches UNION ALL SELECT * FROM toolarge)
         |WHERE n_docs > 0 ORDER BY batch_id""".stripMargin,
    "indexer_metrics" ->
      s"""SELECT
         | CAST(sum(CASE WHEN n_chars >= $ReadFailBelow THEN 1 ELSE 0 END) AS BIGINT) AS readCount,
         | CAST(sum(CASE WHEN n_chars < $ReadFailBelow THEN 1 ELSE 0 END) AS BIGINT) AS readFailedCount,
         | CAST(sum(CASE WHEN n_chars >= $ReadFailBelow AND n_chars <= $TooLargeAbove THEN 1 ELSE 0 END) AS BIGINT) AS uploadCount,
         | CAST(sum(CASE WHEN n_chars > $TooLargeAbove THEN 1 ELSE 0 END) AS BIGINT) AS uploadFailedTooLargeCount
         |FROM documents""".stripMargin,
    "incremental_run" ->
      s"""WITH log AS (
         | SELECT event_id, ts, event_type,
         |  'fs' || (user_id % 4) AS filesystem,
         |  to_base64(encode('fs' || (user_id % 4) || '%2f' ||
         |    replace('data/part_' || (event_id % 50) || '/file_' || (event_id % 500) || '.json', '/', '%2f'))) AS key
         | FROM events WHERE ts >= TIMESTAMP '2024-01-20 00:00:00'),
         |delta AS (
         | SELECT * FROM (
         |  SELECT *, row_number() OVER (PARTITION BY key ORDER BY ts DESC, event_id DESC) AS rn
         |  FROM log) WHERE rn = 1 AND event_type <> 'error'),
         |docs AS (
         | SELECT doc_id, substring(text, 1, 100) AS stringvalue, n_chars AS numbervalue, md5(text) AS eTag
         | FROM documents WHERE n_chars >= $ReadFailBelow)
         |SELECT key, (event_id % 500) AS doc_id, filesystem,
         | strftime(ts, '%Y-%m-%d %H:%M:%S') AS fileLastModified,
         | stringvalue, numbervalue, eTag
         |FROM delta JOIN docs ON (event_id % 500) = docs.doc_id
         |WHERE numbervalue <= $TooLargeAbove ORDER BY key""".stripMargin,
    "indexer_run_history" ->
      s"""WITH log AS (
         | SELECT event_id, ts, event_type,
         |  CASE WHEN event_id % 50 < 10 THEN event_id % 50 ELSE (event_id % 50) // 10 END AS run_id,
         |  to_base64(encode('fs' || (user_id % 4) || '%2f' ||
         |    replace('data/part_' || (event_id % 50) || '/file_' || (event_id % 500) || '.json', '/', '%2f'))) AS key
         | FROM events WHERE ts >= TIMESTAMP '2024-01-20 00:00:00'),
         |wm AS (SELECT run_id, strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS watermark
         | FROM log GROUP BY run_id),
         |delta AS (
         | SELECT * FROM (
         |  SELECT *, row_number() OVER (PARTITION BY key ORDER BY ts DESC, event_id DESC) AS rn
         |  FROM log) WHERE rn = 1 AND event_type <> 'error'),
         |j AS (SELECT d.run_id, doc.n_chars
         | FROM delta d LEFT JOIN documents doc ON (d.event_id % 500) = doc.doc_id),
         |m AS (SELECT run_id,
         |  CAST(sum(CASE WHEN n_chars IS NOT NULL AND n_chars < $ReadFailBelow THEN 0 ELSE 1 END) AS BIGINT) AS read_count,
         |  CAST(sum(CASE WHEN n_chars IS NOT NULL AND n_chars < $ReadFailBelow THEN 1 ELSE 0 END) AS BIGINT) AS read_failed_count,
         |  CAST(sum(CASE WHEN n_chars IS NOT NULL AND n_chars >= $ReadFailBelow AND n_chars <= $TooLargeAbove THEN 1 ELSE 0 END) AS BIGINT) AS upload_count,
         |  CAST(sum(CASE WHEN n_chars IS NOT NULL AND n_chars > $TooLargeAbove THEN 1 ELSE 0 END) AS BIGINT) AS upload_failed_too_large_count
         | FROM j GROUP BY run_id)
         |SELECT m.run_id,
         | 'search.ismatch(''data%2fpart_' || m.run_id || '*'')' AS partition_filter,
         | read_count, read_failed_count, upload_count,
         | upload_failed_too_large_count, watermark
         |FROM m JOIN wm ON m.run_id = wm.run_id ORDER BY m.run_id""".stripMargin)
}
