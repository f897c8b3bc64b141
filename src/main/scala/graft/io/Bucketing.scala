package graft.io

import org.apache.spark.sql.DataFrame

/** Bucketed-layout co-location (SURVEY §6 scale design): the 100 TB
  * answer to repeated large-×-large equi-joins is to pay the shuffle
  * ONCE at write time — both sides bucketed (and sorted) by the join
  * key — after which every join on that key is shuffle-free: Spark
  * reads matching buckets pair-wise and merges them in place.
  *
  * This is the batch analog of the reference's per-symbol Redis
  * keyspaces: data lives pre-partitioned by the access key. Use for the
  * fact↔fact joins that broadcast can't cover (fills ⋈ positions
  * history, candles ⋈ signals at full scale); dimension joins should
  * stay broadcast.
  */
object Bucketing {

  /** Write `df` as a bucketed, bucket-sorted parquet table. `path`
    * makes it an external table (data under `path`, metadata in the
    * session catalog). Bucket count is a layout contract: both join
    * sides must use the SAME count for co-location.
    */
  def writeBucketed(df: DataFrame, table: String, path: String, key: String, buckets: Int): Unit =
    df.write
      .mode("overwrite")
      .format("parquet")
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)
}
