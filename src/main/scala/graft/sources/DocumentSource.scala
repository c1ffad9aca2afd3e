package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Document readers for the lake-side of the pipeline — the Spark
  * analog of the reference's file reads + JSON deserialization
  * (reference: AzureSearchIndexer/DataLakeIndexer.cs:95 ReadAsync +
  * DatalakePathIndexerFunc/IndexMapper.cs:14 DeserializeAsync).
  *
  * On a cluster these are the entry scans for 100 TB: schema is always
  * supplied explicitly (never inferred — inference is a full extra
  * pass), bad records are tolerated not fatal (PERMISSIVE +
  * `_corrupt_record`, mirroring the reference counting read failures
  * instead of aborting the run).
  */
object DocumentSource {

  /** Read a directory of JSON documents with explicit schema; corrupt
    * records land in `_corrupt_record` instead of failing the job.
    */
  def json(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema.add("_corrupt_record", "string"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)

  /** Split a JSON read into (good, failed) — the ReadDocumentsMetrics
    * split (reference: Models/ReadDocumentsMetrics.cs).
    */
  def jsonWithMetrics(spark: SparkSession, path: String, schema: StructType): (DataFrame, DataFrame) = {
    val df = json(spark, path, schema).cache()
    (df.filter(col("_corrupt_record").isNull).drop("_corrupt_record"),
      df.filter(col("_corrupt_record").isNotNull).select(col("_corrupt_record")))
  }

  /** Opaque binary reads (images/audio/any payload) with file metadata —
    * the multimodal entry point.
    */
  def binaryFiles(spark: SparkSession, path: String, glob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(path)
      .select(col("path"), col("modificationTime"), col("length"), col("content"))
}
