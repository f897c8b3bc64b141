package graft.io

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Compact-array wire decoder (SURVEY S2, reference
  * `messaging/handlers.py:150-232`): DXLink FEED_DATA frames carry
  * `["EventType", [v1, v2, v3, ...]]` where the flat value array is
  * `k` fields per event, concatenated. Decoding = chunk the flat array
  * by the event type's field count and zip each chunk with the declared
  * field names.
  *
  * Spark shape: a pure explode pipeline — `transform(sequence(...))` to
  * chunk, `posexplode` to emit one row per event, one typed column per
  * field — fully codegen'd, scan-local, no shuffle (the reference's
  * per-channel asyncio queue hop disappears; routing is a filter).
  */
object WireDecoder {

  /** Decode frames with columns (eventType: string, values:
    * array<string>) given per-type field lists. Emits one row per event:
    * (eventType, seq, field1, ..., fieldN as string) for the requested
    * `eventFields` type. Rows whose value count is not a multiple of the
    * field count keep only complete chunks (reference chunks by
    * `len(fields)` and zips — trailing partials drop).
    */
  def decode(frames: DataFrame, eventType: String, fields: Seq[String]): DataFrame = {
    val k = fields.size
    val passThrough = frames.columns.filterNot(_ == "values").map(col).toSeq
    val chunked = frames
      .filter(col("eventType") === eventType)
      .select(
        passThrough :+ posexplode(
          // empty-guard: sequence(0, -1) would COUNT DOWN (negative step)
          expr(
            s"""case when size(values) >= $k
               | then transform(sequence(0, cast(size(values) / $k as int) - 1), i -> slice(values, i * $k + 1, $k))
               | else cast(array() as array<array<string>>) end""".stripMargin
          )
        ).as(Seq("seq", "chunk")): _*
      )
    fields.zipWithIndex.foldLeft(chunked) { case (d, (f, i)) =>
      d.withColumn(f, element_at(col("chunk"), i + 1))
    }.drop("chunk")
  }
}
