package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: language ID
  * (stopword/character n-gram heuristic), 64-bit SimHash fingerprints,
  * and near-dup pairing by SimHash hamming distance. All distributed
  * column/`explode` pipelines — no driver loops.
  */
object TextAnalysis {

  /** Tiny per-language stopword profiles (function words are the
    * standard cheap discriminator). */
  val profiles: Map[String, Set[String]] = Map(
    "en" -> Set("the", "and", "of", "to", "in", "is", "that", "it", "was", "for"),
    "es" -> Set("el", "la", "de", "que", "y", "en", "un", "los", "del", "las"),
    "de" -> Set("der", "die", "und", "das", "von", "zu", "den", "mit", "ist", "nicht"),
    "fr" -> Set("le", "la", "de", "et", "les", "des", "un", "une", "du", "est"),
    "zh" -> Set("的", "了", "是", "在", "我", "有", "他", "这", "中", "大"))

  /** Language ID: argmax over per-language stopword hit counts
    * (ties → "und", as is conventional for undetermined).
    *
    * Fused scalar kernel (the shingleU/v16 precedent): one pass over
    * the word array scores all five languages — the higher-order
    * `filter(ws, array_contains)` form runs interpreted, 5 lambda
    * passes per row. Semantics identical: split on `\s+` of the
    * lowercased text, argmax by (hits, lang) — equal hits break to the
    * lexicographically larger lang, all-zero → "und". */
  def languageId(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val ordered = profiles.toSeq.sortBy(_._1)
    val predU = udf { (text: String) =>
      // Locale.ROOT: Spark's lower() is locale-insensitive — the JVM
      // default locale must not leak in (Turkish-I class of bugs)
      val ws = text.toLowerCase(java.util.Locale.ROOT).split("\\s+", -1)
      var bestLang = ""
      var bestHits = 0
      var any = false
      ordered.foreach { case (lang, set) =>
        var h = 0
        var i = 0
        while (i < ws.length) { if (set(ws(i))) h += 1; i += 1 }
        if (h > 0) any = true
        // max over (hits, lang) tuples, lang as the tie-breaker —
        // exactly array_max over struct(hits, lang)
        if (bestLang.isEmpty || h > bestHits ||
            (h == bestHits && lang > bestLang)) {
          bestHits = h; bestLang = lang
        }
      }
      if (!any) "und" else bestLang
    }
    docs.withColumn("pred_lang", predU(col(textCol)))
  }

  /** 64-bit SimHash over word features: each word votes its md5-derived
    * 64-bit hash, per-bit majority forms the fingerprint. Pure
    * aggregation shape: explode words → per-bit votes → groupBy doc. */
  def simhash(docs: DataFrame, idCol: String = "doc_id",
              textCol: String = "text"): DataFrame = {
    val words = docs
      .select(col(idCol), explode(split(lower(col(textCol)), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      // 64-bit word hash from the first 16 hex chars of md5
      .withColumn("h", conv(substring(md5(col("w")), 1, 15), 16, 10).cast("long"))
    val bitVotes = (0 until 60).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1).otherwise(-1))
        .as(s"b$b")
    }
    val votes = words.groupBy(col(idCol)).agg(bitVotes.head, bitVotes.tail: _*)
    val fp = (0 until 60).map { b =>
      when(col(s"b$b") > 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
    votes.select(col(idCol), fp.as("simhash"))
  }

  /** Near-dup candidate pairs by SimHash hamming distance ≤ maxDist.
    * Banded join over `nBands` bands of 60/nBands bits: by pigeonhole,
    * fingerprints with hamming < nBands share at least one exact band,
    * so the all-pairs product is avoided — the 100 TB-safe shape.
    * Choose nBands > the maxDist you care about. */
  def simhashPairs(fps: DataFrame, maxDist: Int, nBands: Int = 6): DataFrame = {
    val width = 60 / nBands
    val mask = (1L << width) - 1
    val bands = (0 until nBands).map { b =>
      fps.select(col("doc_id"), col("simhash"), lit(b).as("band"),
        shiftright(col("simhash"), b * width).bitwiseAND(mask).as("key"))
    }.reduce(_ unionByName _)
    val a = bands.select(col("band"), col("key"),
      col("doc_id").as("a"), col("simhash").as("ha"))
    val b = bands.select(col("band"), col("key"),
      col("doc_id").as("b"), col("simhash").as("hb"))
    a.join(b, Seq("band", "key")).filter(col("a") < col("b"))
      .select(col("a"), col("b"),
        bit_count(col("ha").bitwiseXOR(col("hb"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
  }

  /** Document fingerprint via a polynomial rolling hash (Rabin-style)
    * over the normalized text — the classic content-defined fingerprint,
    * as a codegen'd aggregate over characters. Modular (1e9+7) rather
    * than wrapping: engines differ on int64 overflow (DuckDB raises),
    * and the mod keeps the fold portable to the SQL oracle. */
  def rollingFingerprint(docs: DataFrame, idCol: String = "doc_id",
                         textCol: String = "text"): DataFrame = {
    // fused scalar kernel (the shingleU/v16 precedent) — the
    // per-character transform/aggregate chain runs interpreted, one
    // lambda dispatch per CHARACTER. Same fold: lowercase (ROOT
    // locale, matching Spark's lower), collapse \s+ to one space,
    // trim, then (acc·31 + codepoint) mod 1e9+7 left-to-right —
    // codepoint iteration matches split("")+ascii on BMP and keeps
    // surrogate pairs whole exactly as Java regex split("") does.
    val fpU = udf { (text: String) =>
      val norm = text.toLowerCase(java.util.Locale.ROOT)
        .replaceAll("\\s+", " ").trim
      var acc = 0L
      val it = norm.codePoints().iterator()
      while (it.hasNext) acc = (acc * 31 + it.next()) % 1000000007L
      acc
    }
    docs.select(col(idCol), fpU(col(textCol)).as("fingerprint"))
  }
}
