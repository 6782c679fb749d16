package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The composed training-data preparation job (driver row d12):
  * quality gate → exact dedup → [optional MinHash-LSH near-dup
  * dedup] → benchmark decontamination → sequence packing, as ONE
  * declarative DAG over caller-supplied corpus and benchmark frames
  * (`doc_id`, `text`).
  *
  * Stage shapes at scale (see `Documents.d12PrepareE2e` for the
  * row-level commentary): the gate is map-side and fuses into the
  * scan; dedup is the only text-keyed shuffle (16-byte md5 digest);
  * decontamination broadcasts the benchmark gram set and LEFT ANTI
  * joins just the contaminated ids ([[Decontaminate.contaminatedIds]]
  * — sized by the contamination rate, so AQE broadcasts it);
  * packing is the distributed two-pass prefix sum
  * ([[SequencePack.packOffsets]]).
  *
  * Petabyte knobs, OFF by default so the composed output stays
  * byte-exact against the d12 oracle:
  *  - [[Config.hashGrams]] switches the decontamination join keys to
  *    `xxhash64(gram)` 8-byte longs (identical flags proven on 2M
  *    docs, `tools/evidence/r14_decontam_hashgrams_2m.log`);
  *  - [[Config.fuzzy]] enables the near-dup stage: fused MinHash
  *    signatures → banded LSH candidates → signature-estimated
  *    Jaccard filter → connected components ([[Components]]
  *    min-label propagation, with [[FuzzyDedup.checkpointDir]]
  *    threaded through for reliable per-round checkpoints on a
  *    fault-tolerant cluster run) → keep each cluster's min-id
  *    representative. Candidate volume is governed by the band
  *    width (numHashes/bands minhashes per band key) AND the
  *    [[FuzzyDedup.maxBucket]] degenerate-bucket cap — a single hot
  *    band key can otherwise still go B² — so it is never O(N²).
  *
  * Deliberate trade: the deduped corpus text is read TWICE (once to
  * generate grams for the contamination probe, once as the anti-join
  * left side) instead of carrying each document's gram array through
  * the dedup shuffle — columnar scans with pushdown are cheap at any
  * scale, while shuffling every document's n-grams alongside the
  * 16-byte dedup key would multiply the one corpus-sized shuffle's
  * bytes by the gram blow-up factor. */
object PreparePipeline {

  /** Near-dup stage config. `numHashes` must be a multiple of
    * `bands`; a candidate pair must agree on all numHashes/bands
    * minhashes of ≥1 band. `minJaccard` filters candidates on the
    * signature-estimated Jaccard ([[MinHash.estimate]]).
    *
    * Recall tuning (measured at 20M docs,
    * `tools/evidence/r16_fuzzydedup_20m.log`): per-pair est
    * agreements are Binomial(numHashes, J), so a duplicate class at
    * Jaccard J is caught reliably only when J sits well above
    * `minJaccard` — aim for J − minJaccard ≥ 5·√(J(1−J)/numHashes).
    * At the margin, recall degrades measurably (19 missed members in
    * 2M planted at 2–3σ margins), and misses CORRELATE across pairs
    * sharing documents (they share hash draws), so transitive chains
    * can cut where independent-miss math says they can't.
    *
    * `maxBucket`: band buckets larger than this are DROPPED from
    * candidate generation (counted and logged), exactly as
    * [[EmbeddingDedup.lshPairs]] caps its banded join — a degenerate
    * band key (template/boilerplate docs all agreeing on a band, the
    * common case at the petabyte scale this knob targets) otherwise
    * yields B² join rows before the a<b filter (observed as a filled
    * disk at 10M rows, r5). Bit-identical docs are NOT at risk: the
    * exact-dedup stage upstream already collapsed them, so an
    * oversized bucket can only cost recall on non-identical near-dups
    * whose every agreeing band is degenerate. */
  final case class FuzzyDedup(numHashes: Int = 64, bands: Int = 16,
                              minJaccard: Double = 0.8, maxIter: Int = 20,
                              checkpointDir: Option[String] = None,
                              maxBucket: Int = 8192)

  final case class Config(stopwords: Seq[String], minStopRatio: Double,
                          minTokens: Int, gramN: Int, windowTokens: Long,
                          packParts: Int = 0, hashGrams: Boolean = false,
                          fuzzy: Option[FuzzyDedup] = None)

  def run(train: DataFrame, bench: DataFrame, stopwords: Seq[String],
          minStopRatio: Double, minTokens: Int, gramN: Int,
          windowTokens: Long, packParts: Int = 0): DataFrame =
    run(train, bench, Config(stopwords, minStopRatio, minTokens, gramN,
      windowTokens, packParts))

  def run(train: DataFrame, bench: DataFrame, cfg: Config): DataFrame = {
    // packOffsets executes its input at least twice (range-boundary
    // sampling + the shuffle write), so at collectable sizes the
    // survivors projection is materialized once first — narrow (two
    // LONG columns, never the text) and size-gated like `deduped`
    // below (guide §1.2: don't re-run the whole gate→dedup→decontam
    // DAG to sample range bounds).
    val clean = materializeIfSmall(
      cleanCorpus(train, bench, cfg).select(col("doc_id"), col("n_tokens")),
      train, cfg)
    SequencePack.packOffsets(clean,
      "doc_id", "n_tokens", cfg.windowTokens, cfg.packParts)
  }

  def cleanCorpus(train: DataFrame, bench: DataFrame, stopwords: Seq[String],
                  minStopRatio: Double, minTokens: Int,
                  gramN: Int): DataFrame =
    cleanCorpus(train, bench,
      Config(stopwords, minStopRatio, minTokens, gramN, windowTokens = 0L))

  /** Stages 1-3 (gate → dedup [→ near-dup] → decontaminate) without
    * the packing pass — the survivors frame. Exposed so plan audits
    * can inspect the join strategies (packOffsets returns an
    * RDD-backed frame whose queryExecution no longer shows the
    * upstream joins). */
  def cleanCorpus(train: DataFrame, bench: DataFrame,
                  cfg: Config): DataFrame = {
    val ws = split(col("text"), " ")
    val sw = array(cfg.stopwords.map(lit): _*)
    val normText = trim(regexp_replace(lower(col("text")), "\\s+", " "))
    val quality = train
      .withColumn("wsArr", ws)
      .withColumn("stop_ratio",
        size(filter(col("wsArr"), w => array_contains(sw, w))).cast("double") /
          size(col("wsArr")))
      .filter(col("stop_ratio") >= cfg.minStopRatio &&
        size(col("wsArr")) >= cfg.minTokens)
      .select(col("doc_id"), col("text"),
        size(col("wsArr")).as("n_tokens"), md5(normText).as("fp"))
    val keepers = quality.groupBy(col("fp")).agg(min(col("doc_id")).as("doc_id"))
    // Size-gated materialization (guide §1.2/§5), FUZZY PATH ONLY:
    // with the near-dup stage on, this gate+dedup subtree re-executes
    // for the signature pass, the near-dup anti-join left side,
    // decontamination's gram scan and the final anti-join (the d13
    // shape measured ~6 re-scans end-to-end; same-window stash A/B:
    // 9.8 s → 4.4 s median, summed task time 21 s → 10 s). At or
    // below graft.prepare.materializeMaxBytes of corpus input, ONE
    // eager snapshot feeds them all; above it the re-scan stays the
    // documented 100 TB trade (columnar scans are cheap at any scale,
    // a corpus-sized persisted intermediate is not). WITHOUT the fuzzy
    // stage the re-scan is only the map-side gate + one 16-byte-key
    // shuffle and the snapshot must store the TEXT column — measured
    // strictly slower at sf0.1 (d12 A/B 1.76 → 2.28 median), so the
    // batch-d12 shape keeps the re-scan at every size.
    val deduped0 = quality.join(keepers, Seq("fp", "doc_id")).drop("fp")
    val deduped =
      if (cfg.fuzzy.isDefined) materializeIfSmall(deduped0, train, cfg)
      else deduped0
    val survivors = cfg.fuzzy match {
      case None => deduped
      case Some(fz) =>
        deduped.join(fuzzyDropIds(deduped, fz), Seq("doc_id"), "left_anti")
    }
    val bad = Decontaminate.contaminatedIds(survivors, bench,
      n = cfg.gramN, hashGrams = cfg.hashGrams)
    survivors.join(bad, Seq("doc_id"), "left_anti")
  }

  /** Near-dup member ids to DROP (every cluster member except its
    * min-id representative): fused MinHash signatures → banded LSH
    * equi-join (band key = xxhash64 of numHashes/bands consecutive
    * minhashes, so a candidate must agree on a full band) →
    * estimated-Jaccard filter → [[Components.connectedComponents]]
    * (transitive closure: A≈B, B≈C land in one cluster even when A,C
    * share no band). The component label IS the min member id, so the
    * drop set is exactly `component != node`. The returned frame is
    * eagerly materialized (the components loop is iterative — it
    * cannot be part of one lazy DAG anyway) and the signature cache is
    * released before returning. */
  private def fuzzyDropIds(docs: DataFrame, fz: FuzzyDedup): DataFrame = {
    require(fz.numHashes % fz.bands == 0,
      s"numHashes ${fz.numHashes} must be a multiple of bands ${fz.bands}")
    val spark = docs.sparkSession
    import spark.implicits._
    // register the reliable-checkpoint dir up front: the oversized-key
    // fallback below may checkpoint() BEFORE Components (which also
    // registers it) runs
    fz.checkpointDir.foreach(spark.sparkContext.setCheckpointDir)
    val rows = fz.numHashes / fz.bands
    // cache: the band explode (bucket agg + both join sides) and
    // estimate's two signature joins would otherwise each re-run the
    // fused MD5 kernel over the corpus
    val sigs = MinHash.signatures(docs, fz.numHashes).cache()
    val bands = sigs.select(col("doc_id"), posexplode(
      array((0 until fz.bands).map(b =>
        xxhash64(slice(col("sig"), b * rows + 1, rows))): _*))
      .as(Seq("band_idx", "band_key")))
    // degenerate-bucket cap, the EmbeddingDedup.bandedPairs discipline:
    // oversized buckets are few by construction (each holds > maxBucket
    // rows, so ≤ N·bands/maxBucket exist) — collect their keys, log the
    // recall change, and filter with a broadcast anti-join. The collect
    // is CAPPED like EmbeddingDedup.subSplitPairs' (one job either way:
    // limit(cap+1) returns the full set iff it is ≤ cap); at 10¹¹+
    // boilerplate-heavy docs the bound is ~10⁸ driver tuples, so beyond
    // the cap the keys never come to the driver — the filter runs as a
    // shuffle anti-join against the aggregated key frame instead
    // (identical drop set, spec-pinned)
    val sizeAgg = bands
      .groupBy(col("band_idx"), col("band_key"))
      .agg(count(lit(1)).as("bsize"))
      .filter(col("bsize") > fz.maxBucket)
    val head: Array[(Int, Long, Long)] = sizeAgg
      .select(col("band_idx").cast("int"), col("band_key").cast("long"),
        col("bsize").cast("long"))
      .as[(Int, Long, Long)].limit(bandKeyCollectCap + 1).collect()
    val kept = if (head.isEmpty) bands else {
      val keys =
        if (head.length <= bandKeyCollectCap) {
          log.warn(s"fuzzy near-dup: dropping ${head.length} oversized " +
            s"band buckets (${head.map(_._3).sum} id rows, " +
            s"maxBucket=${fz.maxBucket}) from candidate generation; pairs " +
            "whose every agreeing band is oversized lose LSH candidacy — " +
            "bit-identical docs were already collapsed by the exact stage")
          broadcast(head.map { case (b, k, _) => (b, k) }.toSeq
            .toDF("band_idx", "band_key"))
        } else {
          // key set too large to collect: materialize the aggregate
          // once — reliably when a checkpoint dir is configured
          // (mirrors the drop-set handling below: a localCheckpoint
          // here would make the fault-tolerant path unrecoverable on
          // executor loss at exactly the scale this branch targets)
          val agg =
            if (fz.checkpointDir.isDefined) sizeAgg.checkpoint()
            else sizeAgg.localCheckpoint(true)
          val st = agg.agg(count(lit(1)), sum(col("bsize")))
            .as[(Long, Long)].collect()(0)
          log.warn(s"fuzzy near-dup: ${st._1} oversized band buckets " +
            s"(${st._2} id rows, maxBucket=${fz.maxBucket}) exceed the " +
            s"driver collect cap $bandKeyCollectCap — dropping them via " +
            "a shuffle anti-join on the aggregated key frame")
          agg.select(col("band_idx"), col("band_key"))
        }
      bands.join(keys, Seq("band_idx", "band_key"), "left_anti")
    }
    val x = kept.select(col("band_idx"), col("band_key"), col("doc_id").as("a"))
    val y = kept.select(col("band_idx"), col("band_key"), col("doc_id").as("b"))
    val cand = x.join(y, Seq("band_idx", "band_key"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b")).distinct()
    val edges = MinHash.estimate(cand, sigs)
      .filter(col("est_jaccard") >= fz.minJaccard)
      .select(col("a"), col("b"))
    val res = Components.connectedComponents(edges, fz.maxIter,
      fz.checkpointDir)
    require(res.converged,
      s"near-dup component propagation did not converge in ${res.rounds} " +
        s"rounds (maxIter=${fz.maxIter})")
    // materialize eagerly (the components loop already ran); on the
    // fault-tolerant checkpointDir path use a reliable checkpoint —
    // localCheckpoint stores executor-local blocks, so an executor loss
    // after this point would make the drop set unrecoverable, undoing
    // the reliable-checkpoint intent threaded into Components.
    // EXCEPT the driver union-find arm (rounds == 0): its labels are a
    // driver-resident LocalTableScan with nothing distributed to lose
    // or recompute — snapshotting them is a pure extra job (r18).
    val dropLazy = res.labels.filter(col("component") =!= col("node"))
      .select(col("node").as("doc_id"))
    val drop =
      if (res.rounds == 0) dropLazy
      else if (fz.checkpointDir.isDefined) dropLazy.checkpoint()
      else dropLazy.localCheckpoint(true)
    sigs.unpersist()
    drop
  }

  /** Eagerly materializes a dedup-chain intermediate when the corpus
    * input is small enough that re-executing the subtree per consumer
    * is the wrong trade — size-gated by
    * [[graft.GraftConf.prepareMaterializeMaxBytes]] against the SUMMED
    * LEAF PARQUET bytes feeding `train` (driver-side file status, no
    * job; plan-stats estimates swing wildly across the UDF/array
    * projections in the gate). Frames with no file provenance (pure
    * in-memory test frames) are treated as unknown scale and NOT
    * materialized — the re-scan shape stays spec-covered. Reliable
    * `checkpoint()` when the fuzzy config carries a checkpoint dir
    * (registered here — this runs before Components would register
    * it), `localCheckpoint` otherwise; rows are identical either way,
    * only the snapshot storage differs. */
  private def materializeIfSmall(df: DataFrame, train: DataFrame,
                                 cfg: Config): DataFrame = {
    val cap = graft.GraftConf.prepareMaterializeMaxBytes
    if (cap <= 0) return df
    val files = train.inputFiles
    if (files.isEmpty) return df
    val conf = train.sparkSession.sparkContext.hadoopConfiguration
    val bytes = files.distinct.iterator.map { f =>
      val p = new org.apache.hadoop.fs.Path(f)
      try p.getFileSystem(conf).getFileStatus(p).getLen
      catch { case scala.util.control.NonFatal(_) => return df }
    }.sum
    if (bytes > cap) df
    else cfg.fuzzy.flatMap(_.checkpointDir) match {
      case Some(dir) =>
        df.sparkSession.sparkContext.setCheckpointDir(dir)
        df.checkpoint()
      case None => df.localCheckpoint(true)
    }
  }

  /** Driver-collect cap for the oversized-band-key set (the
    * [[EmbeddingDedup.subSplitCollectCap]] discipline): above this many
    * flagged buckets the drop filter switches from a collected
    * broadcast to a shuffle anti-join on the aggregated key frame —
    * identical drop set (spec-pinned via the cap-0 fallback test).
    * `var` only so the spec can force the fallback path. */
  private[graft] var bandKeyCollectCap: Int = 1 << 20

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)
}
