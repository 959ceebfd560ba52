package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Streaming mode (SURVEY.md §2.12 — pure extension; the reference has
  * no streaming engine). The same operators that serve the batch
  * `events` table are exposed over Structured Streaming: tumbling /
  * sliding / session windows, watermarked dedup, stream-static as-of
  * enrichment. State stores hash-partition by the grouping keys, so a
  * 1000-executor cluster shards state horizontally.
  */
object Streams {

  /** readStream over a parquet directory with an explicit schema (stream
    * sources cannot infer). Use `maxFilesPerTrigger` to pace backfills.
    */
  def readParquetStream(spark: SparkSession, path: String, schema: StructType,
                        maxFilesPerTrigger: Int = 1): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(path)

  /** Tumbling/sliding window aggregation with watermark — the streaming
    * twin of the batch date_trunc query (q_window_tumbling).
    */
  def windowedAgg(events: DataFrame, tsCol: String, watermark: String,
                  windowLen: String, slide: Option[String] = None,
                  keys: Seq[String] = Nil, aggs: Seq[Column] = Seq(count(lit(1)).as("n"))): DataFrame = {
    val win = slide match {
      case Some(s) => window(col(tsCol), windowLen, s)
      case None    => window(col(tsCol), windowLen)
    }
    events.withWatermark(tsCol, watermark)
      .groupBy((win +: keys.map(col)): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Session windows (gap-based), keyed per user. */
  def sessionAgg(events: DataFrame, tsCol: String, watermark: String,
                 gap: String, keys: Seq[String],
                 aggs: Seq[Column] = Seq(count(lit(1)).as("n"))): DataFrame =
    events.withWatermark(tsCol, watermark)
      .groupBy((session_window(col(tsCol), gap) +: keys.map(col)): _*)
      .agg(aggs.head, aggs.tail: _*)

  /** Watermarked streaming dedup — the streaming form of exact dedup:
    * duplicates arriving within the watermark horizon are dropped.
    */
  def dedupWithinWatermark(events: DataFrame, tsCol: String, watermark: String,
                           keyCols: Seq[String]): DataFrame =
    events.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Stream-static enrichment: join each streaming row against a static
    * dimension (broadcast by Catalyst when small) — the streaming
    * counterpart of the keyed equi join x[i].
    */
  def enrich(stream: DataFrame, dim: DataFrame, on: Seq[String],
             how: String = "left"): DataFrame =
    stream.join(broadcast(dim), on, how)
}
