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

  /** Runs `body` — which should build, start and drain a STATEFUL
    * streaming query — with the session's shuffle-partition setting
    * (i.e. the query's state-store partition count, pinned at stream
    * start in its checkpoint) set to
    * [[graft.GraftConf.streamStatePartitions]], restoring the caller's
    * setting afterwards. Results are unchanged: stateful operators
    * hash-partition state by key, so the partition COUNT only sets how
    * many per-micro-batch store open/commit (checkpoint fsync) cycles
    * run — the measured fixed cost this knob exists to size to the
    * state, not to the scan cores (numbers in the GraftConf scaladoc).
    * Queries in one session run sequentially through the driver
    * contract; callers starting streams concurrently from several
    * threads should set the conf themselves. */
  def withStatePartitions[T](s: SparkSession)(body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val prev = s.conf.getOption(key)
    s.conf.set(key, graft.GraftConf.streamStatePartitions(
      s.sparkContext.defaultParallelism).toString)
    try body
    finally prev match {
      case Some(v) => s.conf.set(key, v)
      case None    => s.conf.unset(key)
    }
  }

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

  /** Streaming vector-search serving: queries arrive as a stream, each
    * micro-batch runs the exact batch k-NN kernel against the static
    * corpus, and results append to a parquet sink. The standard
    * continuous-serving pattern — `foreachBatch` reuses
    * [[graft.search.FlatSearch.knn]] verbatim, so per-query results are
    * BIT-IDENTICAL to a batch run regardless of how the stream is
    * micro-batched (each query's top-k depends only on that query and
    * the corpus; the union over micro-batches IS the batch answer —
    * pinned by PipelineOpsSpec and the s05 oracle). Swap the kernel for
    * `IVFSearch.topk` / `BoundedSearch.search` for approximate/bounded
    * serving — the plumbing is identical; at cluster scale the static
    * corpus side stays partition-parallel per micro-batch while query
    * arrival drives scheduling.
    *
    * Exactly-once sink contract: each micro-batch OVERWRITES its own
    * `outDir/batch-<batchId>` directory (read the sink with
    * `outDir/batch-*`). foreachBatch is at-least-once — on a restart
    * (run with `option("checkpointLocation", …)` so batch ids are
    * stable) a re-delivered batch rewrites the same path instead of
    * double-appending rows, which a plain `mode("append")` sink on
    * `outDir` cannot guarantee. Checkpoint-less one-shot runs (the
    * in-repo s05/s06 pattern) should delete `outDir` first: a rerun
    * that lands fewer micro-batches would otherwise leave stale
    * higher-numbered batch directories behind.
    *
    * @return the started query — caller awaits termination (default
    *         trigger AvailableNow: drain the backlog, then stop). */
  def knnServe(queryStream: DataFrame, corpus: DataFrame, k: Int,
               outDir: String,
               trigger: org.apache.spark.sql.streaming.Trigger =
                 org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val fn: (Dataset[org.apache.spark.sql.Row], Long) => Unit = (batch, bid) =>
      if (!batch.isEmpty)
        graft.search.FlatSearch.knn(corpus, batch, k)
          .write.mode("overwrite").parquet(s"$outDir/batch-$bid")
    queryStream.writeStream.foreachBatch(fn).trigger(trigger).start()
  }

  /** Streaming ingest-time decontamination: arriving documents are
    * checked against the (static, broadcast) benchmark n-gram set as
    * they land — the admission-control shape of the batch d09 operator.
    * Per-document flags depend only on that document and the benchmark
    * set, so the sink union over micro-batches is bit-identical to the
    * batch answer (the same argument as [[knnServe]]) — which lets a
    * plain batch SQL oracle verify a real streaming run. Same
    * exactly-once sink contract as [[knnServe]]: per-batch
    * `outDir/batch-<batchId>` directories, overwritten on
    * re-delivery; read with `outDir/batch-*`. */
  def decontamServe(docStream: DataFrame, bench: DataFrame, n: Int,
                    outDir: String,
                    trigger: org.apache.spark.sql.streaming.Trigger =
                      org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery = {
    // the benchmark side is STATIC across the query's lifetime: gram it
    // once and cache, instead of re-running the gram kernel + distinct
    // over the whole benchmark set inside every micro-batch (output
    // identical — same distinct gram set feeds the same broadcast join;
    // the cache is megabytes, benchmark-sized, and lives with the
    // session like every other decontamination broadcast)
    val bg = graft.ops.Decontaminate.benchGramSet(bench, n = n).cache()
    val fn: (Dataset[org.apache.spark.sql.Row], Long) => Unit = (batch, bid) =>
      if (!batch.isEmpty)
        graft.ops.Decontaminate.flagContaminatedAgainst(batch, bg, n = n)
          .write.mode("overwrite").parquet(s"$outDir/batch-$bid")
    docStream.writeStream.foreachBatch(fn).trigger(trigger).start()
  }

  /** Starts `df` into per-batch parquet directories under `outDir` —
    * the [[knnServe]] exactly-once sink contract (each micro-batch
    * overwrites its own `outDir/batch-<batchId>`; read the sink back
    * with `outDir/batch-*`). This is the scale-safe replacement for
    * the driver-`memory` sink the one-shot streaming rows used to
    * drain into: a memory sink buffers the query's ENTIRE output in
    * driver RAM, which at a 100 TB-shaped stream IS a driver OOM,
    * while per-batch parquet lands on storage and the read-back is an
    * ordinary distributed scan. Emitted rows are identical — the sink
    * only changes where the same micro-batch output goes. `outDir` is
    * cleared first (checkpoint-less one-shot contract: a rerun landing
    * fewer micro-batches must not see stale higher-numbered batch
    * dirs). */
  def parquetSink(df: DataFrame, outDir: String, mode: String,
                  trigger: org.apache.spark.sql.streaming.Trigger =
                    org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      df.sparkSession.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(outDir), true)
    // no isEmpty pre-probe: every action on the batch frame re-executes
    // the micro-batch plan (for the stateful rows that is the whole
    // state-store pass), so the write is the batch's ONLY action —
    // an empty batch just writes an empty (schema-preserving) dir
    val fn: (Dataset[org.apache.spark.sql.Row], Long) => Unit = (batch, bid) =>
      batch.write.mode("overwrite").parquet(s"$outDir/batch-$bid")
    df.writeStream.outputMode(mode).foreachBatch(fn).trigger(trigger).start()
  }

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

  final case class BandRow(key: String, docId: Long, ts: java.sql.Timestamp)

  /** Streaming MinHash-LSH near-dup candidates — the streaming twin of
    * d02+d03 for continuous ingest. Signatures are a pure projection
    * ([[graft.ops.MinHash.sigExpr]] — no aggregation, so the plan
    * streams); banded keys become groupByKey state, and the moment a
    * band bucket sees a second distinct document it emits a candidate
    * pair (anchor = the bucket's first-seen doc). State is one
    * (anchor id, ts) per live bucket, expired by event-time timeout at
    * watermark + `delay`, which is what bounds state on an unbounded
    * stream. Output: (bucket, a, b) with a the anchor — downstream
    * dedups on (a, b) and reranks exactly like batch d03 → d04. */
  def lshCandidateStream(docs: DataFrame, numHashes: Int = 16, bands: Int = 4,
                         tsCol: String = "ts", idCol: String = "doc_id",
                         textCol: String = "text", delay: String = "1 hour")(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    require(numHashes % bands == 0, s"bands $bands must divide numHashes $numHashes")
    val rows = numHashes / bands
    val delayMs = parseDelayMs(delay)
    val banded = docs
      .withColumn("sig", graft.ops.MinHash.sigExpr(col(textCol), numHashes))
      .filter(size(col("sig")) > 0 && col("sig").getItem(0).isNotNull)
      .withWatermark(tsCol, delay)
      .select(col(idCol).cast("long").as("docId"), col(tsCol).as("ts"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => concat_ws("", slice(col("sig"), b * lit(rows) + 1, lit(rows)))))
          .as(Seq("bandIdx", "bandKey")))
      .select(concat(col("bandIdx").cast("string"), lit("|"), col("bandKey")).as("key"),
        col("docId"), col("ts"))
      .as[BandRow]
    banded.groupByKey(_.key)
      .flatMapGroupsWithState[(Long, Long), (String, Long, Long)](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (key, it, state: GroupState[(Long, Long)]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val arrivals = it.toSeq.sortBy(r => (r.ts.getTime, r.docId))
            var (anchor, anchorTs) = state.getOption
              .getOrElse((arrivals.head.docId, arrivals.head.ts.getTime))
            val out = scala.collection.mutable.LinkedHashSet.empty[(String, Long, Long)]
            arrivals.foreach { r =>
              if (r.docId != anchor) {
                if (r.ts.getTime < anchorTs ||
                    (r.ts.getTime == anchorTs && r.docId < anchor)) {
                  // a later batch delivered an EARLIER event (within the
                  // watermark): it becomes the bucket's anchor going
                  // forward, and the old anchor is now one of its dups —
                  // already-emitted pairs stand (append-only sink), but
                  // the anchor converges to the event-time minimum
                  out += ((key, r.docId, anchor))
                  anchor = r.docId; anchorTs = r.ts.getTime
                } else out += ((key, anchor, r.docId))
              }
            }
            state.update((anchor, anchorTs))
            state.setTimeoutTimestamp(arrivals.map(_.ts.getTime).max + delayMs)
            out.iterator
          }
      }.toDF("bucket", "a", "b")
  }

  /** Parse any interval string withWatermark itself accepts for the
    * units below — multi-part ("1 hour 30 minutes") and compact
    * ("90min") forms included. */
  private def parseDelayMs(delay: String): Long = {
    val parts = "(\\d+)\\s*([a-zA-Z]+)".r.findAllMatchIn(delay).toSeq
    require(parts.nonEmpty, s"cannot parse delay '$delay'")
    parts.map { m =>
      val base = m.group(2).toLowerCase match {
        case u if u.startsWith("day")  => 86400000L
        case u if u.startsWith("hour") => 3600000L
        case u if u.startsWith("min")  => 60000L
        case u if u.startsWith("sec")  => 1000L
        case u => throw new IllegalArgumentException(s"unsupported delay unit $u")
      }
      m.group(1).toLong * base
    }.sum
  }

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
