package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The composed training-data preparation job (driver row d12):
  * quality gate → exact dedup → benchmark decontamination → sequence
  * packing, as ONE declarative DAG over caller-supplied corpus and
  * benchmark frames (`doc_id`, `text`).
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
  * Deliberate trade: the deduped corpus text is read TWICE (once to
  * generate grams for the contamination probe, once as the anti-join
  * left side) instead of carrying each document's gram array through
  * the dedup shuffle — columnar scans with pushdown are cheap at any
  * scale, while shuffling every document's n-grams alongside the
  * 16-byte dedup key would multiply the one corpus-sized shuffle's
  * bytes by the gram blow-up factor. */
object PreparePipeline {

  def run(train: DataFrame, bench: DataFrame, stopwords: Seq[String],
          minStopRatio: Double, minTokens: Int, gramN: Int,
          windowTokens: Long, packParts: Int = 0): DataFrame =
    SequencePack.packOffsets(
      cleanCorpus(train, bench, stopwords, minStopRatio, minTokens, gramN),
      "doc_id", "n_tokens", windowTokens, packParts)

  /** Stages 1-3 (gate → dedup → decontaminate) without the packing
    * pass — the survivors frame. Exposed so plan audits can inspect
    * the join strategies (packOffsets returns an RDD-backed frame
    * whose queryExecution no longer shows the upstream joins). */
  def cleanCorpus(train: DataFrame, bench: DataFrame, stopwords: Seq[String],
                  minStopRatio: Double, minTokens: Int, gramN: Int): DataFrame = {
    val ws = split(col("text"), " ")
    val sw = array(stopwords.map(lit): _*)
    val normText = trim(regexp_replace(lower(col("text")), "\\s+", " "))
    val quality = train
      .withColumn("wsArr", ws)
      .withColumn("stop_ratio",
        size(filter(col("wsArr"), w => array_contains(sw, w))).cast("double") /
          size(col("wsArr")))
      .filter(col("stop_ratio") >= minStopRatio && size(col("wsArr")) >= minTokens)
      .select(col("doc_id"), col("text"),
        size(col("wsArr")).as("n_tokens"), md5(normText).as("fp"))
    val keepers = quality.groupBy(col("fp")).agg(min(col("doc_id")).as("doc_id"))
    val deduped = quality.join(keepers, Seq("fp", "doc_id")).drop("fp")
    val bad = Decontaminate.contaminatedIds(deduped, bench, n = gramN)
    deduped.join(bad, Seq("doc_id"), "left_anti")
  }
}
