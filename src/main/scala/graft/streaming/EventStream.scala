package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.index.{IVFIndex, IVFModel}

/** Structured Streaming surface.
  *
  * The reference's only streaming-ish construct is the sliding window of
  * time-partitioned sub-indexes (`Auncel/IVFlib.h:83-106`); here that
  * becomes a real streaming ingest: vectors arrive, get IVF-assigned,
  * and append to the partitioned table, while retention drops old
  * batches (Management.slidingWindow). Plus the standard
  * watermark+window aggregation and stateful sessionization over the
  * events table shape.
  */
object EventStream {

  /** Tumbling-window aggregation with watermark — works identically on
    * a batch DataFrame (the batch twin is q08_events_hourly). */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("hour"), col("event_type"),
        col("n"), col("total_value"))

  /** Streaming vector ingest: assign arriving vectors to their inverted
    * list and tag the ingest batch — the sink appends to a
    * `partitionBy(list_no, batch_id)` table, so the sliding-window
    * retention is partition-drop, never a rewrite. */
  def assignStream(vectors: DataFrame, model: IVFModel, batchId: Long): DataFrame =
    IVFIndex.assign(vectors, model).withColumn("batch_id", lit(batchId))

  /** Streaming exact dedup — the streaming twin of d01 for continuous
    * training-data ingest: fingerprint the normalized text, then keep
    * the first arrival of each fingerprint, with state bounded by the
    * event-time watermark (`dropDuplicatesWithinWatermark`: duplicates
    * farther apart than the delay are out of dedup scope by contract,
    * which is what bounds state at 100 TB/day ingest rates). */
  def dedupStream(docs: DataFrame, tsCol: String = "ts",
                  textCol: String = "text", delay: String = "1 hour"): DataFrame =
    docs
      .withColumn("fp", md5(trim(regexp_replace(lower(col(textCol)), "\\s+", " "))))
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("fp")

  final case class Session(userId: Long, nEvents: Long, totalValue: Double)

  /** Stateful per-user session aggregation via mapGroupsWithState —
    * the KeyValueGroupedDataset custom-state path. */
  def sessionize(events: Dataset[(Long, Double)])(
      implicit spark: SparkSession): Dataset[Session] = {
    import spark.implicits._
    events.groupByKey(_._1)
      .mapGroupsWithState[Session, Session](GroupStateTimeout.NoTimeout()) {
        case (uid, it, state: GroupState[Session]) =>
          val prev = state.getOption.getOrElse(Session(uid, 0L, 0.0))
          val batch = it.toSeq
          val next = Session(uid, prev.nEvents + batch.size,
            prev.totalValue + batch.map(_._2).sum)
          state.update(next)
          next
      }
  }
}
