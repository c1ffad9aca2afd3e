package graft.operators

import graft.{QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** A raw media asset: opaque bytes + typed metadata. In production the
  * binary column holds image/audio/video payloads (read via
  * spark.read.format("binaryFile") or parquet binary columns); here the
  * bytes are synthesized from the documents table.
  */
final case class MediaAsset(
    doc_id: Long,
    payload: Array[Byte],
    mime: String,
    width: Int,
    height: Int,
    duration_s: Int)

/** Decoded features. The decode itself is STUBBED (no media libs in
  * this environment) with a deterministic digest-based fake — but the
  * Spark plumbing (typed Dataset, per-partition batch decode, feature
  * schema) is the real production shape.
  */
final case class MediaFeatures(
    doc_id: Long,
    byte_len: Long,
    md5_head: String,
    hist_bucket: Long,
    width: Int,
    height: Int)

/** Multimodal-column plumbing: binary payloads with typed metadata,
  * batch "decode" via mapPartitions (the JVM analog of mapInPandas —
  * one decoder instance per partition, streaming over rows), and
  * frame-sampling fan-out.
  *
  * At scale: payload columns make rows wide — partition count must
  * track bytes not rows (spark.sql.files.maxPartitionBytes), and the
  * decode stage is CPU-bound per partition, so parallelism = cores, not
  * I/O. Frame sampling is a generator (explode) — row count multiplies
  * by fps×duration, so it runs AFTER any filtering.
  */
object Multimodal extends QueryPack {

  /** Synthesize the asset table: payload = utf8 bytes of the text. */
  def assets(spark: SparkSession, dir: String): Dataset[MediaAsset] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        col("text").cast("binary").as("payload"),
        when(col("doc_id") % 3 === 0, "image/png")
          .when(col("doc_id") % 3 === 1, "audio/wav")
          .otherwise("video/mp4").as("mime"),
        ((col("doc_id") % 64) * 10 + 16).cast("int").as("width"),
        ((col("doc_id") % 48) * 10 + 16).cast("int").as("height"),
        (col("n_chars") % 120).cast("int").as("duration_s"))
      .as[MediaAsset]
  }

  /** STUB decoder: a real implementation would wrap an image/audio
    * codec here (one instance per partition). The fake is a
    * deterministic digest so tests and oracles can verify the plumbing.
    */
  private def decodeStub(a: MediaAsset): MediaFeatures = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(a.payload).map("%02x".format(_)).mkString
    MediaFeatures(
      doc_id = a.doc_id,
      byte_len = a.payload.length.toLong,
      md5_head = hex.substring(0, 8),
      hist_bucket = java.lang.Long.parseLong(hex.substring(0, 2), 16) % 16,
      width = a.width,
      height = a.height)
  }

  /** Per-partition batch decode — mapPartitions so a real codec would
    * amortize its init across the partition, like mapInPandas batches.
    */
  def decodeFeatures(spark: SparkSession, assets: Dataset[MediaAsset]): Dataset[MediaFeatures] = {
    import spark.implicits._
    assets.mapPartitions(_.map(decodeStub))
  }

  def mmDecode(spark: SparkSession, dir: String): DataFrame =
    decodeFeatures(spark, assets(spark, dir)).toDF().orderBy(col("doc_id"))

  /** Frame sampling at 0.5 fps: one row per sampled frame timestamp. */
  def mmFrameSample(spark: SparkSession, dir: String): DataFrame =
    assets(spark, dir).toDF()
      .filter(col("mime") === "video/mp4" && col("duration_s") > 0)
      .select(col("doc_id"), col("duration_s"),
        explode(sequence(lit(0), col("duration_s"), lit(2))).as("frame_t"))
      .orderBy(col("doc_id"), col("frame_t"))

  /** Aspect-preserving resize planning: compute the (w, h) a decoder
    * would scale each asset to for a max-512 long edge, plus the scale
    * factor — the pure-metadata half of an image resize stage (the
    * pixel work happens in the stubbed decoder).
    */
  def mmResize(spark: SparkSession, dir: String): DataFrame = {
    val a = assets(spark, dir).toDF()
    val longEdge = greatest(col("width"), col("height"))
    val needs = longEdge > 512
    // integer `div` keeps it engine-exact (matches DuckDB's `//`);
    // double division could land at x.9999… and truncate off-by-one
    val newW = when(needs,
      expr("CAST(width AS BIGINT) * 512 div CAST(greatest(width, height) AS BIGINT)"))
      .otherwise(col("width").cast("long"))
    val newH = when(needs,
      expr("CAST(height AS BIGINT) * 512 div CAST(greatest(width, height) AS BIGINT)"))
      .otherwise(col("height").cast("long"))
    a.filter(col("mime") === "image/png")
      .select(col("doc_id"), col("width"), col("height"),
        newW.as("target_w"), newH.as("target_h"), needs.as("downscaled"))
      .orderBy(col("doc_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_decode" -> (mmDecode _),
    "mm_framesample" -> (mmFrameSample _),
    "mm_resize" -> (mmResize _))

  val oracles: Map[String, String] = Map(
    "mm_decode" ->
      """SELECT doc_id,
        | CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        | substring(md5(text), 1, 8) AS md5_head,
        | ('0x'||substring(md5(text), 1, 2))::BIGINT % 16 AS hist_bucket,
        | CAST((doc_id % 64) * 10 + 16 AS INT) AS width,
        | CAST((doc_id % 48) * 10 + 16 AS INT) AS height
        |FROM documents ORDER BY doc_id""".stripMargin,
    "mm_framesample" ->
      """SELECT doc_id, CAST(n_chars % 120 AS INT) AS duration_s, f.f AS frame_t
        |FROM documents, LATERAL (SELECT unnest(generate_series(0, CAST(n_chars % 120 AS INT), 2)) AS f) f
        |WHERE doc_id % 3 = 2 AND n_chars % 120 > 0
        |ORDER BY doc_id, frame_t""".stripMargin,
    "mm_resize" ->
      """WITH dims AS (
        | SELECT doc_id,
        |  CAST((doc_id % 64) * 10 + 16 AS INT) AS width,
        |  CAST((doc_id % 48) * 10 + 16 AS INT) AS height
        | FROM documents WHERE doc_id % 3 = 0)
        |SELECT doc_id, width, height,
        | CASE WHEN greatest(width, height) > 512
        |  THEN width * 512 // greatest(width, height) ELSE width END AS target_w,
        | CASE WHEN greatest(width, height) > 512
        |  THEN height * 512 // greatest(width, height) ELSE height END AS target_h,
        | greatest(width, height) > 512 AS downscaled
        |FROM dims ORDER BY doc_id""".stripMargin)
}
