package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Bucketed managed tables: the co-located-join storage layout.
  *
  * Two fact tables bucketed by the same join key into the same bucket
  * count join with ZERO exchange — each task reads matching bucket
  * files from both sides. At 100 TB this turns the nightly fact-fact
  * join (lineitem⋈orders-shaped) from a full corpus shuffle into a
  * local merge per bucket; the shuffle is paid ONCE at write time and
  * amortized over every subsequent join. `sortBy` on the key
  * additionally removes the per-task sort from sort-merge joins.
  *
  * (The reference has no analog — its joins happen inside Azure Search.
  * This is the Spark-native answer to the same "query the index without
  * re-shuffling the world" requirement.)
  */
object Bucketing {

  /** Persist `df` as a parquet-backed managed table bucketed (and
    * sorted) by `key` into `buckets` files per partition.
    */
  def saveBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .format("parquet")
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)
}
