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
      // Locale.ROOT is CANONICAL here (it matches DuckDB's
      // locale-independent lower(), i.e. the oracle). Spark's own
      // lower() is locale-free only on the ASCII fast path — for
      // non-ASCII it lowercases under the DEFAULT JVM locale, so under
      // tr/az/lt defaults the declarative form this kernel replaced
      // would diverge from both this kernel and the oracle
      // (Turkish-I class of bugs); we pin ROOT and accept that
      // documented divergence
      val ws = wsSplit(text.toLowerCase(java.util.Locale.ROOT))
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

  /** Per-thread MD5 digest — `MessageDigest.getInstance` per hash is
    * the dominant cost when a fused kernel hashes every shingle×salt of
    * a corpus; one instance per executor thread, reset per use. */
  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private[graft] def localMd5(): java.security.MessageDigest = {
    val md = mdLocal.get(); md.reset(); md
  }

  /** Pre-compiled `\s+` splitter — `String.split("\\s+")` has no
    * single-char fast path, so it re-compiles the regex on every call
    * (once per ROW in the fused kernels). Same split semantics. */
  private val wsPattern = java.util.regex.Pattern.compile("\\s+")
  private[graft] def wsSplit(s: String): Array[String] =
    wsPattern.split(s, -1)

  private[graft] def toHex(d: Array[Byte]): String = {
    val hex = "0123456789abcdef"
    val out = new Array[Char](d.length * 2)
    var i = 0
    while (i < d.length) {
      out(2 * i) = hex((d(i) >> 4) & 0xf)
      out(2 * i + 1) = hex(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** Lowercase-hex MD5 — the scalar twin of Spark's `md5()` (hex over
    * UTF-8 bytes). */
  private[graft] def md5Hex(s: String): String =
    toHex(localMd5().digest(
      s.getBytes(java.nio.charset.StandardCharsets.UTF_8)))

  /** 64-bit SimHash over word features: each word votes its md5-derived
    * 60-bit hash, per-bit majority forms the fingerprint.
    *
    * Fused scalar kernel (the shingleU/v16 precedent): one pass per
    * document holds the 60 vote counters locally — the explode +
    * 60-column vote aggregate shuffled every word of the corpus and
    * ran the votes as interpreted per-bit sums. Semantics identical:
    * words = `\s+` split of the lowercased text, hash = first 15 hex
    * chars of md5 (60 bits), vote +1/−1 per bit, fingerprint bit set
    * on positive vote. Docs with no words keep their all-zero
    * fingerprint via the groupBy-absent ≡ no-vote equivalence (both
    * forms emit fp 0 only when some word exists but votes ≤ 0 — and
    * absent-row semantics match because empty docs produce no words
    * row in the old form and fp 0 here; the oracle pins it). */
  def simhash(docs: DataFrame, idCol: String = "doc_id",
              textCol: String = "text"): DataFrame = {
    val simU = udf { (text: String) =>
      val votes = new Array[Int](60)
      var anyWord = false
      val buf = new Array[Byte](16)
      val md = localMd5()
      wsSplit(text.toLowerCase(java.util.Locale.ROOT)).foreach { w =>
        if (w.nonEmpty) {
          anyWord = true
          // first 15 hex chars of md5 parsed base-16 ≡ the unsigned
          // big-endian first-8-bytes value shifted right one nibble —
          // same 60 bits without the hex string + parseLong round trip
          md.reset()
          md.update(w.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          md.digest(buf, 0, 16)
          var hbe = 0L
          var i = 0
          while (i < 8) { hbe = (hbe << 8) | (buf(i) & 0xffL); i += 1 }
          val h = hbe >>> 4
          var b = 0
          while (b < 60) {
            if (((h >> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
            b += 1
          }
        }
      }
      if (!anyWord) None
      else {
        var fp = 0L
        var b = 0
        while (b < 60) { if (votes(b) > 0) fp |= (1L << b); b += 1 }
        Some(fp)
      }
    // non-deterministic marker (guide §4.4): the isNotNull filter below
    // otherwise duplicates the UDF into a pushed-down Filter — every
    // word of the corpus was hashed twice (r17 t08 before-plan)
    }.asNondeterministic()
    docs.select(col(idCol), simU(col(textCol)).as("simhash"))
      .filter(col("simhash").isNotNull)
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
    // locale — canonical, matching the DuckDB oracle; Spark's lower()
    // uses the default JVM locale off the ASCII fast path, a
    // documented accepted divergence), collapse \s+ to one space,
    // trim, then (acc·31 + codepoint) mod 1e9+7 left-to-right —
    // codepoint iteration matches split("")+ascii on BMP and keeps
    // surrogate pairs whole exactly as Java regex split("") does.
    val fpU = udf { (text: String) =>
      val norm = wsPattern.matcher(text.toLowerCase(java.util.Locale.ROOT))
        .replaceAll(" ").trim
      var acc = 0L
      val it = norm.codePoints().iterator()
      while (it.hasNext) acc = (acc * 31 + it.next()) % 1000000007L
      acc
    }
    docs.select(col(idCol), fpU(col(textCol)).as("fingerprint"))
  }

  /** Gopher-style intra-document repetition signals over word bigrams:
    * per document, the total and distinct bigram counts, the duplicate
    * fraction `(n − distinct) / n`, the top-bigram frequency fraction
    * `max_count / n`, and a `repetitive` flag (either fraction over its
    * threshold) — the standard cheap filter for boilerplate/spam pages
    * whose text loops (Rae et al. 2021 "Scaling Language Models",
    * table A1's duplicate/top n-gram fraction rules).
    *
    * Fused scalar kernel (the shingleU/v16 precedent): one pass per
    * document counts bigrams in a local hash map — the
    * explode-bigrams + two-level groupBy form shuffles every bigram of
    * the corpus on (doc_id, bigram); this shuffles nothing per doc and
    * emits one row. Bigrams split on a single space, exactly the
    * shingle convention (`shingleSqlCte`), so the DuckDB oracle
    * replays it verbatim. Documents with fewer than two words have no
    * bigrams and are dropped (both engines). Fractions are exact-int
    * IEEE divisions — bit-identical across engines. */
  /** Default repetition-flag thresholds (Gopher-ish): duplicate-bigram
    * fraction and top-bigram frequency fraction. Shared with the t09
    * oracle SQL so the two engines cannot drift. */
  val DupThreshold = 0.2
  val TopThreshold = 0.1

  def repetitionSignals(docs: DataFrame, idCol: String = "doc_id",
                        textCol: String = "text",
                        dupThreshold: Double = DupThreshold,
                        topThreshold: Double = TopThreshold): DataFrame = {
    val repU = udf { (text: String) =>
      val ws = text.split(" ", -1)
      if (ws.length < 2) None
      else {
        val m = new java.util.HashMap[String, Integer]()
        var top = 0
        var i = 0
        while (i < ws.length - 1) {
          val c = m.merge(ws(i) + " " + ws(i + 1), Integer.valueOf(1),
            (a: Integer, b: Integer) => Integer.valueOf(a.intValue + b.intValue))
          if (c.intValue > top) top = c.intValue
          i += 1
        }
        Some((ws.length - 1L, m.size.toLong, top.toLong))
      }
    // non-deterministic marker (guide §4.4): the isNotNull filter plus
    // FOUR field extractions reference this column — collapsed/pushed
    // copies would re-count the document's bigrams per reference
    }.asNondeterministic()
    docs.select(col(idCol), repU(col(textCol)).as("r"))
      .filter(col("r").isNotNull)
      .select(col(idCol),
        col("r._1").as("n_bigrams"),
        col("r._2").as("n_distinct"),
        ((col("r._1") - col("r._2")).cast("double") / col("r._1"))
          .as("dup_frac"),
        (col("r._3").cast("double") / col("r._1")).as("top_frac"))
      .withColumn("repetitive",
        col("dup_frac") > dupThreshold || col("top_frac") > topThreshold)
  }
}
