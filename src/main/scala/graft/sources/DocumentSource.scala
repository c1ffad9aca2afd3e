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

  /** Recursive lake listing → DataFrame(path, length, mtime) — the
    * rebuild entry point (reference: PathIndexClient.RebuildPathsIndexAsync
    * consumes ListPathsParallelAsync's recursive listing the same way;
    * directories are skipped there too, PathIndexClient.cs:110).
    *
    * Uses the Hadoop FileSystem recursive iterator (one listing call
    * per directory server-side, streamed); the result is parallelized
    * so downstream keying/upserting is distributed.
    */
  def listFilesRecursive(spark: SparkSession, root: String): DataFrame = {
    import org.apache.hadoop.fs.Path
    import scala.collection.mutable.ArrayBuffer
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(new Path(root), true)
    val rows = ArrayBuffer[(String, Long, Long)]()
    while (it.hasNext) {
      val st = it.next()
      if (st.isFile)
        rows += ((st.getPath.toUri.getPath, st.getLen, st.getModificationTime))
    }
    import spark.implicits._
    spark.createDataset(rows.toSeq)
      .toDF("path", "length", "mtime_ms")
      .withColumn("modificationTime", timestamp_millis(col("mtime_ms")))
      .drop("mtime_ms")
  }
}
