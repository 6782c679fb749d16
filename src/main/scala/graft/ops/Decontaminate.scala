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
  * projection. Grams join as strings by default for engine
  * portability (the DuckDB oracle replays them verbatim); at
  * petabyte scale pass `hashGrams = true` to join on
  * `xxhash64(gram)` instead — IDENTICAL plan shape (fused kernel →
  * explode → broadcast hash join → per-doc aggregate) with 8-byte
  * keys in the broadcast and the corpus-side projection, so the
  * broadcast table shrinks ~10× for 4-gram English text. A 64-bit
  * hash collision can only ADD a false contamination hit (never
  * lose one); with |bench grams| ~ 10⁷ the per-gram collision odds
  * are ~10⁷/2⁶⁴ ≈ 5·10⁻¹³ — the right trade at scale, kept off by
  * default so oracle SQL replays stay byte-exact.
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

  /** The distinct benchmark gram-key set — the broadcast side of every
    * decontamination join. Exposed so a STREAMING caller can build (and
    * cache) it once per query instead of re-gramming the static
    * benchmark set on every micro-batch ([[flagContaminatedAgainst]];
    * the batch forms below inline it unchanged). */
  private[graft] def benchGramSet(bench: DataFrame, textCol: String = "text",
                                  n: Int = 4,
                                  hashGrams: Boolean = false): DataFrame = {
    val grams = gramUdf(n)
    def key(c: org.apache.spark.sql.Column) =
      if (hashGrams) xxhash64(c) else c
    bench.select(explode(grams(col(textCol))).as("g"))
      .select(key(col("g")).as("gram")).distinct()
  }

  /** Shared prefix of both public forms: fused gram kernel on both
    * sides, optional xxhash64 key projection, distinct bench gram set
    * broadcast against the exploded corpus grams. One row per
    * (training doc, hit gram-key). gramUdf dedups per document, so
    * when `hashGrams` is off the hit rows per doc are exactly its
    * distinct shared grams (hashed: modulo the ~2⁻⁶⁴ in-doc collision
    * caveat in the object doc). */
  private def gramHits(train: DataFrame, bench: DataFrame,
                       idCol: String, textCol: String,
                       n: Int, hashGrams: Boolean): DataFrame =
    gramHitsAgainst(train, benchGramSet(bench, textCol, n, hashGrams),
      idCol, textCol, n, hashGrams)

  private def gramHitsAgainst(train: DataFrame, benchGrams: DataFrame,
                              idCol: String, textCol: String,
                              n: Int, hashGrams: Boolean): DataFrame = {
    val grams = gramUdf(n)
    def key(c: org.apache.spark.sql.Column) =
      if (hashGrams) xxhash64(c) else c
    train
      .select(col(idCol), explode(grams(col(textCol))).as("g"))
      .select(col(idCol), key(col("g")).as("gram"))
      .join(broadcast(benchGrams), Seq("gram"))
  }

  /** [[flagContaminated]] against a PREBUILT benchmark gram-key frame
    * (from [[benchGramSet]], with the same `n`/`hashGrams`) — the
    * per-micro-batch form: the static benchmark side is grammed once
    * per streaming query, not once per batch. Output is identical to
    * [[flagContaminated]] with the frame's source bench set. */
  def flagContaminatedAgainst(train: DataFrame, benchGrams: DataFrame,
                              idCol: String = "doc_id",
                              textCol: String = "text",
                              n: Int = 4,
                              hashGrams: Boolean = false): DataFrame = {
    val hits = gramHitsAgainst(train, benchGrams, idCol, textCol, n, hashGrams)
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_hit_grams"))
    train.select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_hit_grams"), lit(0L)).as("n_hit_grams"))
      .withColumn("contaminated", col("n_hit_grams") > 0)
  }

  /** Just the contaminated document ids — the anti-join input for a
    * filter-out pipeline (d12). Skips [[flagContaminated]]'s corpus-wide
    * left join back: only HIT rows enter the shuffle (one distinct on
    * the id), so the output is sized by the contamination rate, not the
    * corpus — at normal rates it is broadcastable into the caller's
    * anti-join (AQE picks that up from the runtime size). */
  def contaminatedIds(train: DataFrame, bench: DataFrame,
                      idCol: String = "doc_id", textCol: String = "text",
                      n: Int = 4, hashGrams: Boolean = false): DataFrame =
    gramHits(train, bench, idCol, textCol, n, hashGrams)
      .select(col(idCol)).distinct()

  /** One row per training document: `n_hit_grams` distinct n-grams
    * shared with the benchmark set, and a `contaminated` flag.
    * Training documents with fewer than n words report 0 hits.
    *
    * @param train     the (huge) training corpus
    * @param bench     the (small) benchmark/eval set — broadcast
    * @param n         n-gram length (contamination granularity; 4 by
    *                  default — long enough that common phrases do not
    *                  flood the flag, short enough to catch excerpts)
    * @param hashGrams join on `xxhash64(gram)` instead of the gram
    *                  string — the petabyte-scale key (object doc) */
  def flagContaminated(train: DataFrame, bench: DataFrame,
                       idCol: String = "doc_id", textCol: String = "text",
                       n: Int = 4, hashGrams: Boolean = false): DataFrame =
    flagContaminatedAgainst(train,
      benchGramSet(bench, textCol, n, hashGrams), idCol, textCol, n,
      hashGrams)
}
