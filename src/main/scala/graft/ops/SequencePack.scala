package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequence-packing layout for training-data pipelines: concatenate
  * documents in a stable global order and chunk the token stream into
  * fixed-size context windows ("concat-then-chunk" packing — the
  * standard way pre-training corpora are laid out into equal-length
  * training sequences with zero padding).
  *
  * The operator assigns every document its global `start_token` offset
  * (exclusive prefix sum of token counts in id order), the training
  * window its first token lands in, and whether it crosses a window
  * boundary — everything a writer needs to emit packed sequences, and
  * everything an auditor needs to count boundary-split documents.
  *
  * The scale problem is the prefix sum: the obvious
  * `sum(...) over (order by id)` window has NO partition key, which
  * Spark executes as a single-partition sort — a non-starter on 100 TB.
  * This implementation is the classic distributed two-pass scan:
  * range-partition by id, per-partition token sums (one tiny row per
  * partition to the driver), exclusive prefix over those P sums, then a
  * per-partition pass that adds its partition's offset — O(rows/P) per
  * task, O(P) on the driver, one range shuffle total. Both passes hang
  * off the SAME partitioned RDD instance, so they see the same range
  * boundaries (the RangePartitioner samples once at construction and
  * its boundary array is immutable; the second pass reuses the first
  * pass's shuffle output, and even a lost-block recompute re-shuffles
  * against those same fixed boundaries). Offsets are therefore always
  * applied to the partitioning they were summed on.
  */
object SequencePack {

  /** One row per document: `(idCol, n_tokens, start_token, window_id,
    * end_window, spans_boundary)`, where `window_id` is the
    * `windowTokens`-sized chunk the document's first token lands in and
    * `spans_boundary` marks documents split across chunks.
    *
    * Offsets depend only on the id order and token counts — partition
    * count/boundaries never change the output, so the result is
    * deterministic under any parallelism.
    *
    * Zero-token rows: `end_window` treats them as occupying one token
    * (`greatest(n_tokens, 1)`), so an empty document gets
    * `end_window == window_id` rather than the nonsensical
    * `window_id - 1`; the d10/d12 oracle SQL mirrors the same
    * GREATEST guard. */
  def packOffsets(df: DataFrame, idCol: String, tokensCol: String,
                  windowTokens: Long, numPartitions: Int = 0): DataFrame = {
    require(windowTokens > 0, "windowTokens must be positive")
    val s = df.sparkSession
    import s.implicits._
    val parts =
      if (numPartitions > 0) numPartitions
      else s.sessionState.conf.numShufflePartitions
    val sorted = df
      .select(col(idCol).cast("long"), col(tokensCol).cast("long"))
      .repartitionByRange(parts, col(idCol))
      .sortWithinPartitions(col(idCol))
      .as[(Long, Long)]
    // Dataset.rdd is a lazy val: both passes below share this one RDD
    // instance (and so one set of range boundaries + shuffle output)
    val rdd = sorted.rdd
    // pass 1: per-partition token sums — P rows to the driver
    val sums = rdd
      .mapPartitionsWithIndex { (pid, it) =>
        var acc = 0L
        it.foreach(acc += _._2)
        Iterator((pid, acc))
      }
      .collect().sortBy(_._1).map(_._2)
    val offsets = sums.scanLeft(0L)(_ + _) // exclusive prefix per partition
    // pass 2: running offset within each partition
    val packed = rdd.mapPartitionsWithIndex { (pid, it) =>
      var run = offsets(pid)
      it.map { case (id, tok) =>
        val start = run
        run += tok
        (id, tok, start)
      }
    }
    packed.toDF(idCol, "n_tokens", "start_token")
      .withColumn("window_id", floor(col("start_token") / windowTokens))
      .withColumn("end_window",
        floor((col("start_token") + greatest(col("n_tokens"), lit(1L)) - 1)
          / windowTokens))
      .withColumn("spans_boundary", col("end_window") > col("window_id"))
  }
}
