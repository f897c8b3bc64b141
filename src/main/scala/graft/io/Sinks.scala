package graft.io

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.Row

/** Sinks (SURVEY S5/S6/S11): the reference's Redis HSET / InfluxDB
  * point / Redis Streams writers become partitioned parquet appends and
  * `foreachBatch` upserts.
  *
  * Partition layout IS the scale strategy: history partitioned by
  * (symbol-bucket, date) gives structural predicate pushdown for the P1
  * range/symbol filters — the Flux-query pattern — without touching the
  * query code.
  */
object Sinks {

  /** S6 — time-series history append, partitioned for pruning. Use a
    * bucketed symbol column (`pmod(hash(symbol), nBuckets)`) when symbol
    * cardinality is high — one directory per raw symbol does not scale.
    */
  def writeHistory(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode("append").partitionBy(partitionCols: _*).parquet(path)

  /** S6 streaming — append stream to the same layout. */
  def streamHistory(df: DataFrame, path: String, checkpoint: String, partitionCols: Seq[String]): DataStreamWriter[Row] =
    df.writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .partitionBy(partitionCols: _*)
      .trigger(Trigger.AvailableNow())

  /** S5 — latest-value table materialization: overwrite the compacted
    * latest-per-key snapshot (the Redis HSET analog). In streaming the
    * same thing runs as `foreachBatch { (batch, _) => writeLatest(...) }`
    * over [[graft.streaming.Streams.latestPerKey]] output.
    */
  def writeLatest(latest: DataFrame, path: String): Unit =
    latest.write.mode("overwrite").parquet(path)
}
