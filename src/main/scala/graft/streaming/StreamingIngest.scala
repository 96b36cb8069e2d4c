package graft.streaming

import graft.mergetree.{ColumnarMergeTree, KVRow, MergeTreeTable}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Structured-Streaming ingest for MergeTree tables (SURVEY §7 Phase 5).
  *
  * The reference's only "streaming" is a background thread draining its own
  * memtable (src/merge_tree.cpp:207-226); the Spark-native equivalent of a
  * continuous ingest feed is a streaming query where EACH micro-batch lands
  * as one distributed sorted part via `insertBatch` — no rows transit the
  * driver, checkpointing gives exactly-once part commits per batch, and the
  * background merge worker (O19) compacts independently, exactly like the
  * reference's writer/merger split.
  *
  * Scale posture: micro-batch size controls part size (tune trigger
  * interval so parts land near the target part bytes); concurrent batch
  * writers are safe (insertBatch only locks id-allocation + manifest
  * append); watermarked operators below bound state for unbounded streams.
  */
object StreamingIngest {

  /** Start a stream writing every micro-batch as one part. */
  def start(table: MergeTreeTable, rows: Dataset[KVRow], checkpointDir: String): StreamingQuery =
    rows.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: Dataset[KVRow], _: Long) =>
        if (!batch.isEmpty) table.insertBatch(batch)
      }
      .start()

  /** Same for the schema-generic table: a training-data pipeline streams
    * into arbitrary schemas, not just the KV compatibility row. Each
    * micro-batch lands as one sorted part under the table's ORDER BY; merge
    * semantics (Replacing/Summing) apply at read/compaction as usual, so a
    * streaming upsert feed into a Replacing table is exactly this plus
    * `scan()`.
    */
  def startGeneric(table: ColumnarMergeTree, rows: DataFrame,
                   checkpointDir: String): StreamingQuery =
    rows.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        if (!batch.isEmpty) table.insertBatch(batch.toDF())
      }
      .start()

  /** Watermarked tumbling-window aggregate per event_type — the streaming
    * analogue of Q18: late data beyond the watermark is dropped, state is
    * bounded, windows emit once finalized (append mode).
    */
  def windowedCounts(events: DataFrame,
                     watermark: String = "10 minutes",
                     width: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width).as("win"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("win.start").as("win_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Streaming exact-dup elimination — the streaming analogue of O14:
    * duplicates of (user_id, event_id) arriving within the watermark are
    * dropped with bounded state (dropDuplicatesWithinWatermark).
    */
  def dedupWithinWatermark(events: DataFrame,
                           watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("user_id", "event_id")
}
