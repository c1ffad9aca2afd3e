package graft

import graft.sources.{DocumentSource, IndexStore}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files

class SourcesSpec extends SparkSpec {

  test("IndexStore merge-or-upload: created/modified counts and latest-wins") {
    val root = Files.createTempDirectory("graft_idx").toString
    val store = new IndexStore(spark, root, "key")
    import spark.implicits._

    val b1 = Seq(("k1", "v1"), ("k2", "v2")).toDF("key", "value")
    val r1 = store.mergeOrUpload(b1)
    assert(r1 == graft.sources.MergeResult(2, 0, 0, 0))

    // second batch: one update, one insert
    val b2 = Seq(("k2", "v2b"), ("k3", "v3")).toDF("key", "value")
    val r2 = store.mergeOrUpload(b2)
    assert(r2.created == 1 && r2.modified == 1 && r2.version == 1)

    val state = store.read().get.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(state == Map("k1" -> "v1", "k2" -> "v2b", "k3" -> "v3"))
  }

  test("IndexStore merge runs exactly one action (metrics ride the write job)") {
    val root = Files.createTempDirectory("graft_idx1a").toString
    val store = new IndexStore(spark, root, "key")
    import spark.implicits._
    store.mergeOrUpload(Seq(("k1", "v1"), ("k2", "v2")).toDF("key", "value"))

    val executions = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             durationNs: Long): Unit = executions.incrementAndGet()
      override def onFailure(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val r = store.mergeOrUpload(
        Seq(("k2", "v2b"), ("k3", "v3"), ("bad", "x")).toDF("key", "value"),
        reject = Some(col("key") === "bad"))
      assert(r.created == 1 && r.modified == 1 && r.failed == 1)
      // QueryExecutionListener events are posted asynchronously: wait
      // for the first, then settle to catch any stragglers
      val deadline = System.nanoTime() + 30L * 1000000000L
      while (executions.get() < 1 && System.nanoTime() < deadline) Thread.sleep(50)
      Thread.sleep(500)
      assert(executions.get() == 1,
        s"merge should be a single action (the snapshot write), saw ${executions.get()}")
    } finally spark.listenerManager.unregister(listener)
  }

  test("IndexStore delete-by-key removes tombstoned keys") {
    val root = Files.createTempDirectory("graft_idx2").toString
    val store = new IndexStore(spark, root, "key")
    import spark.implicits._
    store.mergeOrUpload(Seq(("a", 1), ("b", 2), ("c", 3)).toDF("key", "n"))
    val deleted = store.deleteKeys(Seq("b", "zz").toDF("key"))
    assert(deleted == 1)
    assert(store.read().get.select("key").collect().map(_.getString(0)).sorted
      .sameElements(Array("a", "c")))
  }

  test("partitioned IndexStore prunes partitions on filtered reads") {
    val root = Files.createTempDirectory("graft_idx3").toString
    val store = new IndexStore(spark, root, "key", partitionCol = Some("fs"))
    import spark.implicits._
    store.mergeOrUpload(Seq(
      ("k1", "fs0", 1), ("k2", "fs0", 2), ("k3", "fs1", 3), ("k4", "fs2", 4))
      .toDF("key", "fs", "n"))
    // hive layout on disk
    val dirs = new java.io.File(s"$root/v=0").listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.sameElements(Array("fs=fs0", "fs=fs1", "fs=fs2")))
    // filtered read prunes to one partition
    val df = store.read().get.filter(col("fs") === "fs1")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("fs1"), s"plan:\n$plan")
    assert(df.count() == 1)
    // merge keeps partitioning across versions
    store.mergeOrUpload(Seq(("k5", "fs1", 5)).toDF("key", "fs", "n"))
    assert(store.read().get.filter(col("fs") === "fs1").count() == 2)
    // ...and so do delete-by-key and optimize (pruning must survive
    // vacuum/compaction, not just merges)
    store.deleteKeys(Seq("k1").toDF("key"))
    val afterDelete = new java.io.File(s"$root/v=${store.currentVersion.get}")
      .listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(afterDelete.forall(_.startsWith("fs=")) && afterDelete.nonEmpty)
    store.optimize(numFiles = 1)
    val afterOptimize = new java.io.File(s"$root/v=${store.currentVersion.get}")
      .listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(afterOptimize.forall(_.startsWith("fs=")) && afterOptimize.nonEmpty)
    assert(store.read().get.filter(col("fs") === "fs1").count() == 2)
  }

  test("IndexStore within-batch duplicate keys resolve by the caller's sequence column") {
    val root = Files.createTempDirectory("graft_idx_seq").toString
    val store = new IndexStore(spark, root, "key", seqCol = Some("ts"))
    import spark.implicits._
    // same key twice in ONE batch: highest ts must win, deterministically
    store.mergeOrUpload(Seq(("k1", 5L, "old"), ("k1", 9L, "new"), ("k2", 1L, "x"))
      .toDF("key", "ts", "v"))
    val s1 = store.read().get.collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(s1 == Map("k1" -> "new", "k2" -> "x"))
    // merge path (snapshot exists): batch-internal tie again, and batch
    // beats snapshot even when the snapshot ts is higher
    store.mergeOrUpload(Seq(("k1", 2L, "later-a"), ("k1", 3L, "later-b"))
      .toDF("key", "ts", "v"))
    val s2 = store.read().get.collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(s2 == Map("k1" -> "later-b", "k2" -> "x"))
  }

  test("IndexStore works through the Hadoop FileSystem API (file: URI root)") {
    // an explicit scheme'd URI exercises the same code path an
    // hdfs:///abfs:// root would take (no java.io.File assumptions)
    val root = "file://" + Files.createTempDirectory("graft_idx_uri").toString
    val store = new IndexStore(spark, root, "key")
    import spark.implicits._
    store.mergeOrUpload(Seq(("a", 1), ("b", 2)).toDF("key", "n"))
    store.mergeOrUpload(Seq(("b", 20), ("c", 3)).toDF("key", "n"))
    assert(store.currentVersion.contains(1L))
    assert(store.read().get.count() == 3)
    assert(store.compact(keepLast = 1) == 1)
    assert(store.read().get.count() == 3)
  }

  test("IndexStore failure injection counts rejected rows as failed uploads") {
    val root = Files.createTempDirectory("graft_idx_fail").toString
    val store = new IndexStore(spark, root, "key")
    import spark.implicits._
    val r = store.mergeOrUpload(
      Seq(("a", 1), ("b", -2), ("c", 3)).toDF("key", "n"),
      reject = Some(col("n") < 0))
    assert(r.failed == 1 && r.created == 2)
    assert(store.read().get.select("key").collect().map(_.getString(0)).sorted
      .sameElements(Array("a", "c")))
  }

  test("json source tolerates corrupt records and reports them") {
    val dir = Files.createTempDirectory("graft_json")
    Files.writeString(dir.resolve("docs.json"),
      """{"id": 1, "s": "ok"}
        |{"id": 2, "s": "also ok"}
        |{not json at all
        |{"id": "wrongtype", "s": 3}
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("s", StringType)))
    val (good, bad) = DocumentSource.jsonWithMetrics(spark, dir.toString, schema)
    assert(good.count() == 2)
    assert(bad.count() == 2) // malformed line + type mismatch
    assert(good.collect().map(_.getAs[Long]("id")).sorted.sameElements(Array(1L, 2L)))
  }

  test("recursive listing finds nested files and skips directories") {
    val dir = Files.createTempDirectory("graft_ls")
    Files.createDirectories(dir.resolve("a/b"))
    Files.write(dir.resolve("root.txt"), Array[Byte](1))
    Files.write(dir.resolve("a/mid.txt"), Array[Byte](1, 2))
    Files.write(dir.resolve("a/b/leaf.txt"), Array[Byte](1, 2, 3))
    val df = DocumentSource.listFilesRecursive(spark, dir.toString)
    val rows = df.collect()
    assert(rows.length == 3)
    val byName = rows.map(r => r.getString(0).split('/').last -> r.getLong(1)).toMap
    assert(byName == Map("root.txt" -> 1L, "mid.txt" -> 2L, "leaf.txt" -> 3L))
  }

  test("IndexStore schema evolution and compaction") {
    val root = Files.createTempDirectory("graft_idx4").toString
    val store = new IndexStore(spark, root, "key")
    import spark.implicits._
    store.mergeOrUpload(Seq(("a", 1)).toDF("key", "n"))
    // evolved batch adds a column
    store.mergeOrUpload(Seq(("b", 2, "extra")).toDF("key", "n", "tag"))
    val state = store.read().get
    assert(state.columns.sorted.sameElements(Array("key", "n", "tag")))
    assert(state.filter(col("key") === "a").collect().head.getAs[String]("tag") == null)
    // three versions exist? (v0, v1); add one more then compact
    store.mergeOrUpload(Seq(("c", 3, "t")).toDF("key", "n", "tag"))
    assert(store.currentVersion.contains(2L))
    val removed = store.compact(keepLast = 1)
    assert(removed == 2)
    assert(store.read().get.count() == 3) // live snapshot intact
  }

  test("optimize compacts the live snapshot into few files") {
    val root = Files.createTempDirectory("graft_idx5").toString
    val store = new IndexStore(spark, root, "key")
    import spark.implicits._
    // many merges → many small files
    (1 to 4).foreach(i => store.mergeOrUpload(Seq((s"k$i", i)).toDF("key", "n")))
    val rows = store.optimize(numFiles = 1)
    assert(rows == 4)
    val files = new java.io.File(s"$root/v=${store.currentVersion.get}")
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(files == 1)
    assert(store.read().get.count() == 4)
  }

  test("binary source reads payload bytes with metadata") {
    val dir = Files.createTempDirectory("graft_bin")
    Files.write(dir.resolve("a.bin"), Array[Byte](1, 2, 3))
    Files.write(dir.resolve("b.bin"), Array[Byte](4, 5))
    val df = DocumentSource.binaryFiles(spark, dir.toString, "*.bin")
    val rows = df.collect()
    assert(rows.length == 2)
    assert(rows.map(_.getAs[Long]("length")).sorted.sameElements(Array(2L, 3L)))
    assert(rows.forall(r => r.getAs[Array[Byte]]("content").length == r.getAs[Long]("length")))
  }
}
