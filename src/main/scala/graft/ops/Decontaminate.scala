package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag training documents that share any
  * word n-gram with an evaluation/benchmark set.
  *
  * A pre-training corpus must not contain the benchmarks it will be
  * evaluated on; the standard defence (GPT-3 appendix C, PaLM §8,
  * Llama eval hygiene) is n-gram overlap — a training document is
  * contaminated if any of its n-grams appears in any benchmark
  * document. The shape at 100 TB: the TRAINING side is huge, the
  * BENCHMARK side is tiny (benchmarks are megabytes), so the join is
  * a broadcast of the distinct benchmark gram set against a map-side
  * scan of training grams — zero shuffle of corpus data; the only
  * shuffle is the final per-document aggregate, keyed on doc id.
  *
  * Gram generation is a fused scalar kernel (the d02/shingleU
  * precedent: one pass per document, per-document dedup locally)
  * rather than explode + distinct, so the corpus-side cost is one
  * projection. Grams are joined as strings for engine portability
  * (the DuckDB oracle replays them verbatim); at petabyte scale the
  * join key would be xxhash64(gram) — same plan shape, 8-byte keys.
  */
object Decontaminate {

  /** Distinct word n-grams of a space-tokenized text, as a fused
    * per-row kernel. Documents with fewer than n words have no
    * n-grams (empty array). */
  private[graft] def gramUdf(n: Int) = udf { text: String =>
    val ws = text.split(" ", -1)
    if (ws.length < n) Array.empty[String]
    else {
      val out = new scala.collection.mutable.LinkedHashSet[String]
      var i = 0
      while (i <= ws.length - n) {
        val sb = new StringBuilder(ws(i))
        var j = 1
        while (j < n) { sb.append(' ').append(ws(i + j)); j += 1 }
        out += sb.result()
        i += 1
      }
      out.toArray
    }
  }

  /** One row per training document: `n_hit_grams` distinct n-grams
    * shared with the benchmark set, and a `contaminated` flag.
    * Training documents with fewer than n words report 0 hits.
    *
    * @param train    the (huge) training corpus
    * @param bench    the (small) benchmark/eval set — broadcast
    * @param n        n-gram length (contamination granularity; 4 by
    *                 default — long enough that common phrases do not
    *                 flood the flag, short enough to catch excerpts)
    */
  /** Just the contaminated document ids — the anti-join input for a
    * filter-out pipeline (d12). Skips [[flagContaminated]]'s corpus-wide
    * left join back: only HIT rows enter the shuffle (one distinct on
    * the id), so the output is sized by the contamination rate, not the
    * corpus — at normal rates it is broadcastable into the caller's
    * anti-join (AQE picks that up from the runtime size). */
  def contaminatedIds(train: DataFrame, bench: DataFrame,
                      idCol: String = "doc_id", textCol: String = "text",
                      n: Int = 4): DataFrame = {
    val grams = gramUdf(n)
    val benchGrams = bench
      .select(explode(grams(col(textCol))).as("gram")).distinct()
    train
      .select(col(idCol), explode(grams(col(textCol))).as("gram"))
      .join(broadcast(benchGrams), Seq("gram"))
      .select(col(idCol)).distinct()
  }

  def flagContaminated(train: DataFrame, bench: DataFrame,
                       idCol: String = "doc_id", textCol: String = "text",
                       n: Int = 4): DataFrame = {
    val grams = gramUdf(n)
    val benchGrams = bench
      .select(explode(grams(col(textCol))).as("gram")).distinct()
    val hits = train
      .select(col(idCol), explode(grams(col(textCol))).as("gram"))
      .join(broadcast(benchGrams), Seq("gram"))
      // gramUdf dedups per document, so plain count == distinct hits
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_hit_grams"))
    train.select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_hit_grams"), lit(0L)).as("n_hit_grams"))
      .withColumn("contaminated", col("n_hit_grams") > 0)
  }
}
