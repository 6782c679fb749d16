package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.search.FlatSearch

/** Training-data-pipeline operators over the `documents` table
  * (doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG):
  * deduplication (exact / MinHash+LSH / n-gram Jaccard), text quality
  * scoring, token counting, fingerprinting.
  *
  * Everything is expressed with codegen'd built-ins (split / transform /
  * explode / md5 / window) — no UDFs — so the pipelines scale: shingling
  * is a per-row generator, signatures are a groupBy, and LSH banding
  * turns all-pairs similarity into an equi-join on band keys.
  *
  * MinHash here uses salted-md5 min-strings (min over k salted hashes of
  * the shingle set), which both Spark and DuckDB compute identically —
  * the classic integer-permutation construction replaced by an
  * engine-portable one.
  */
object Documents {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  private val normText: Column =
    trim(regexp_replace(lower(col("text")), "\\s+", " "))

  /** Word 3-shingles of the space-tokenized text. Scalar UDF rather than
    * transform(sequence(...)) — the interpreted higher-order chain costs
    * ~20× on long documents; the shingle strings (and so every
    * downstream hash) are identical either way. */
  private val shingleU = udf { text: String =>
    val ws = text.split(" ", -1)
    if (ws.length < 3) Array.empty[String]
    else Array.tabulate(ws.length - 2)(i => s"${ws(i)} ${ws(i + 1)} ${ws(i + 2)}")
  }

  private def shingled(d: DataFrame): DataFrame =
    d.select(col("doc_id"), explode(shingleU(col("text"))).as("s"))

  private val shingleSqlCte =
    """w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents WHERE len(string_split(text, ' ')) >= 3),
      |sh AS (SELECT doc_id, unnest(list_transform(range(1, len(ws) - 1),
      |       i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS s FROM w)""".stripMargin

  /** Exact dedup: group by md5 of whitespace-normalized lowercase text,
    * keep the smallest doc_id (hash-groupBy — one shuffle on a short
    * digest key at any scale). */
  def d01DedupExact(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .withColumn("fp", md5(normText))
      .groupBy(col("fp"))
      .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n_copies"))
      .orderBy(col("keeper"))

  val d01Sql: String =
    """SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp,
      |  MIN(doc_id) AS keeper, COUNT(*) AS n_copies
      |FROM documents GROUP BY 1 ORDER BY keeper""".stripMargin

  /** MinHash signatures (4 salted hash functions over 3-shingles).
    *
    * Fused scalar kernel (the shingleU precedent): one pass per
    * document keeps the 4 running minima locally instead of exploding
    * every shingle into a corpus-wide groupBy shuffle. Identical
    * output: same shingles (raw-text space split, 3-grams), same
    * salted-md5 hex strings, and ASCII-hex min ≡ Spark's binary
    * UTF8 string min; docs with < 3 words are absent in both forms. */
  def d02MinhashSig(s: SparkSession, dir: String): DataFrame = {
    // the shared fused MinHash kernel (ops.MinHash.minhashHex): salted
    // md5 minima with one UTF-8 encode per word, a reused digest
    // buffer, and (hi, lo)-long minima — hex rendered once per doc
    val salts = graft.ops.MinHash.saltBytes(4)
    // non-deterministic marker (guide §4.4): without it the
    // `m IS NOT NULL` filter is pushed below the repartition exchange
    // with its own copy of the UDF — the corpus was signed twice, one
    // pass single-threaded (the r17 d02 before-plan pins this)
    val sigU = udf { (text: String) =>
      val m = graft.ops.MinHash.minhashHex(text, salts)
      if (m(0) == null) None else Some((m(0), m(1), m(2), m(3)))
    }.asNondeterministic()
    // repartition before the kernel: the sf-test corpus is ONE parquet
    // split, which would run the whole hash pass single-threaded; a real
    // corpus arrives in thousands of splits and skips this. Shuffling
    // raw text is strictly smaller than the exploded-shingle shuffle
    // the fused kernel replaced.
    docs(s, dir).repartition(col("doc_id"))
      .select(col("doc_id"), sigU(col("text")).as("m"))
      .filter(col("m").isNotNull)
      .select(col("doc_id"), col("m._1").as("mh0"), col("m._2").as("mh1"),
        col("m._3").as("mh2"), col("m._4").as("mh3"))
      .orderBy(col("doc_id"))
  }

  val d02Sql: String =
    s"""WITH $shingleSqlCte
       |SELECT doc_id, MIN(md5('0|' || s)) AS mh0, MIN(md5('1|' || s)) AS mh1,
       |  MIN(md5('2|' || s)) AS mh2, MIN(md5('3|' || s)) AS mh3
       |FROM sh GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** MinHash + LSH candidate pairs: band = 4-hex-char prefix of each
    * signature component; docs sharing any band bucket become candidate
    * pairs (equi-join on (band_idx, band_key) — never all-pairs).
    * The candidate set is a session-cached artifact shared with d05. */
  def d03LshCandidates(s: SparkSession, dir: String): DataFrame =
    graft.index.IndexCache.frame(s"$dir|d03cands", {
      val sig = d02MinhashSig(s, dir)
      val bands = sig.select(col("doc_id"), posexplode(array(
        substring(col("mh0"), 1, 4), substring(col("mh1"), 1, 4),
        substring(col("mh2"), 1, 4), substring(col("mh3"), 1, 4)))
        .as(Seq("band_idx", "band_key")))
      val a = bands.select(col("band_idx"), col("band_key"), col("doc_id").as("a"))
      val b = bands.select(col("band_idx"), col("band_key"), col("doc_id").as("b"))
      a.join(b, Seq("band_idx", "band_key"))
        .filter(col("a") < col("b"))
        .select(col("a"), col("b")).distinct()
    }).orderBy(col("a"), col("b"))

  /** Streaming MinHash-LSH near-dup candidates, executed as a REAL
    * Structured Streaming query (AvailableNow over a staged copy of the
    * documents table → `EventStream.lshCandidateStream` → memory sink):
    * each LSH band bucket emits (anchor = first-seen doc, later doc)
    * pairs from flatMapGroupsWithState. Event time is doc_id-ordered
    * (ts = epoch + doc_id), so the anchor is deterministically the
    * bucket's min doc_id — which is what the batch SQL oracle replays.
    * The streaming twin of d03 with an exact oracle. */
  def s02StreamLsh(s: SparkSession, dir: String): DataFrame = {
    val staged = s"${Vector.sdir(dir)}/s02_docs.parquet"
    // multiple staged files: the AvailableNow microbatch parallelizes
    // the signature UDF across them (anchor choice is arrival-order
    // independent — each bucket sorts by event time inside the group)
    docs(s, dir)
      .select(col("doc_id"),
        timestamp_seconds(lit(1767225600L) + col("doc_id")).as("ts"), col("text"))
      .repartition(16).write.mode("overwrite").parquet(staged)
    val schema = s.read.parquet(staged).schema
    val stream = s.readStream.schema(schema).parquet(staged)
    val outDir = s"${Vector.sdir(dir)}/s02_out.parquet"
    // state partitions sized to the state, not the scan cores (see
    // EventStream.withStatePartitions); per-batch parquet sink instead
    // of driver-memory (EventStream.parquetSink — identical rows)
    graft.streaming.EventStream.withStatePartitions(s) {
      val q = graft.streaming.EventStream.parquetSink(
        graft.streaming.EventStream
          .lshCandidateStream(stream, numHashes = 16, bands = 4)(s),
        outDir, mode = "append")
      require(q.awaitTermination(300000),
        "s02 streaming query did not finish within 300s — partial sink")
    }
    s.read.parquet(s"$outDir/batch-*").select(col("bucket"), col("a"), col("b"))
      .orderBy(col("bucket"), col("a"), col("b"))
  }

  val s02Sql: String = {
    val mins = (0 until 16).map(h => s"MIN(md5('$h|' || s)) AS mh$h").mkString(", ")
    val bandRows = (0 until 4).map { b =>
      val key = (0 until 4).map(i => s"mh${b * 4 + i}").mkString(" || ")
      val sel = if (b == 0) "doc_id, 0 AS bi, " + key + " AS bk" else s"doc_id, $b, $key"
      s"SELECT $sel FROM sig"
    }.mkString(" UNION ALL ")
    s"""WITH $shingleSqlCte,
       |sig AS (SELECT doc_id, $mins FROM sh GROUP BY doc_id),
       |bands AS ($bandRows),
       |anch AS (SELECT bi, bk, MIN(doc_id) AS a FROM bands GROUP BY 1, 2)
       |SELECT CAST(b.bi AS VARCHAR) || '|' || b.bk AS bucket, anch.a, b.doc_id AS b
       |FROM bands b JOIN anch ON anch.bi = b.bi AND anch.bk = b.bk
       |WHERE b.doc_id != anch.a
       |ORDER BY bucket, a, b""".stripMargin
  }

  /** Streaming exact dedup as a REAL Structured Streaming run
    * (AvailableNow over a staged corpus → `EventStream.dedupStream` —
    * watermark-bounded `dropDuplicatesWithinWatermark` — → memory
    * sink): the streaming twin of d01 for continuous training-data
    * ingest. The corpus is staged WITH planted duplicates (every
    * doc_id % 10 == 0 doc re-appears under id+1e6, event time +60 s —
    * inside the 1-hour delay) so the dedup actually dedups. WHICH
    * physical row survives per fingerprint is arrival-order-dependent,
    * so the verified output is arrival-order-free: per fingerprint the
    * sink's emission count (the dedup contract: exactly one) and the
    * staged corpus's duplicate count. Event time is doc_id-ordered;
    * state is bounded by the watermark delay (the 100 TB/day knob). */
  def s04StreamDedup(s: SparkSession, dir: String): DataFrame = {
    val staged = s"${Vector.sdir(dir)}/s04_docs.parquet"
    val epoch = 1767225600L
    val orig = docs(s, dir).select(col("doc_id"), col("text"),
      timestamp_seconds(lit(epoch) + col("doc_id")).as("ts"))
    val planted = docs(s, dir).filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"),
        timestamp_seconds(lit(epoch) + col("doc_id") + 60).as("ts"))
    orig.unionByName(planted)
      .repartition(16).write.mode("overwrite").parquet(staged)
    val schema = s.read.parquet(staged).schema
    val stream = s.readStream.schema(schema).parquet(staged)
    val outDir = s"${Vector.sdir(dir)}/s04_out.parquet"
    // state partitions sized to the state, not the scan cores (see
    // EventStream.withStatePartitions); per-batch parquet sink instead
    // of driver-memory (EventStream.parquetSink — identical rows)
    graft.streaming.EventStream.withStatePartitions(s) {
      val q = graft.streaming.EventStream.parquetSink(
        graft.streaming.EventStream.dedupStream(stream).select(col("fp")),
        outDir, mode = "append")
      require(q.awaitTermination(300000),
        "s04 streaming query did not finish within 300s — partial sink")
      // the n_emitted=1-per-fingerprint oracle holds only while
      // AvailableNow consumes the staged corpus in ONE micro-batch:
      // split batches could legitimately re-emit a fingerprint whose
      // duplicates straddle the 1h watermark. Assert the contract via
      // query progress so a future staging change fails loudly here, not
      // as an opaque hash mismatch downstream.
      val dataBatches = q.recentProgress.count(_.numInputRows > 0)
      require(dataBatches == 1,
        s"s04 staged corpus processed in $dataBatches micro-batches " +
          "(expected 1); the n_emitted=1 oracle requires single-batch staging")
    }
    val emitted = s.read.parquet(s"$outDir/batch-*").groupBy(col("fp"))
      .agg(count(lit(1)).as("n_emitted"))
    val batchCounts = s.read.parquet(staged)
      .select(md5(normText).as("bfp"))
      .groupBy(col("bfp")).agg(count(lit(1)).as("n_docs"))
    emitted.join(batchCounts, col("fp") === col("bfp"))
      .select(col("fp"), col("n_emitted"), col("n_docs"))
      .orderBy(col("fp"))
  }

  val s04Sql: String =
    """WITH corpus AS (
      |  SELECT text FROM documents
      |  UNION ALL
      |  SELECT text FROM documents WHERE doc_id % 10 = 0)
      |SELECT fp, CAST(1 AS BIGINT) AS n_emitted, COUNT(*) AS n_docs FROM (
      |  SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
      |  FROM corpus)
      |GROUP BY fp ORDER BY fp""".stripMargin

  /** The d03 LSH candidate set as a reusable CTE chain (consumed by
    * both the d03 oracle and d08's recursive component closure). */
  private val lshCandCte =
    """sig AS (SELECT doc_id, MIN(md5('0|' || s)) AS mh0, MIN(md5('1|' || s)) AS mh1,
      |        MIN(md5('2|' || s)) AS mh2, MIN(md5('3|' || s)) AS mh3 FROM sh GROUP BY doc_id),
      |bands AS (
      |  SELECT doc_id, 0 AS band_idx, substring(mh0, 1, 4) AS band_key FROM sig UNION ALL
      |  SELECT doc_id, 1, substring(mh1, 1, 4) FROM sig UNION ALL
      |  SELECT doc_id, 2, substring(mh2, 1, 4) FROM sig UNION ALL
      |  SELECT doc_id, 3, substring(mh3, 1, 4) FROM sig),
      |cand AS (
      |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
      |  FROM bands x JOIN bands y ON x.band_idx = y.band_idx AND x.band_key = y.band_key
      |  WHERE x.doc_id < y.doc_id)""".stripMargin

  val d03Sql: String =
    s"""WITH $shingleSqlCte,
       |$lshCandCte
       |SELECT a, b FROM cand ORDER BY a, b""".stripMargin

  /** Shingles appearing in more than this many documents are dropped
    * before the d04 self-join (on BOTH engines — it is part of the
    * operator's semantics, the standard stop-shingle rule): a hot
    * shingle ("of the and") otherwise makes the per-key join quadratic
    * at scale. Never engages on this corpus (max df is 25 at sf0.1),
    * so results are identical to the uncapped form; at 100 TB it
    * bounds any one key's fan-out to df² ≤ 16k pairs. */
  val ShingleDfCap = 128

  /** n-gram Jaccard near-dup: top-20 pairs by exact Jaccard over distinct
    * 3-shingles (those under the document-frequency cap). The shingle
    * equi-join computes |A∩B| without an all-pairs product.
    *
    * The df-capped distinct shingle table is the corpus's shingle
    * inverted index — a built-once dedup artifact like d03/d05's
    * signature and candidate tables (and persisted the same way), so
    * queries pay the joins, not a per-run re-shingle. The df cap stays
    * a shuffle join on `s`, NOT a collected broadcast: shingle
    * frequencies are Zipfian, so the over-cap set is unbounded at
    * corpus scale (unlike LSH's oversized buckets). */
  def d04JaccardTop(s: SparkSession, dir: String): DataFrame = {
    val sh = graft.index.IndexCache.frameDisk(s"$dir|d04shingles", s, {
      val all = shingled(docs(s, dir)).distinct()
      val rare = all.groupBy(col("s"))
        .agg(count(lit(1)).as("df"))
        .filter(col("df") <= ShingleDfCap)
        .select(col("s"))
      all.join(rare, Seq("s"))
    })
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val inter = sh.as("x").join(sh.as("y"), col("x.s") === col("y.s"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .agg(count(lit(1)).as("c"))
    inter
      .join(sizes.select(col("doc_id").as("a"), col("sz").as("sza")), Seq("a"))
      .join(sizes.select(col("doc_id").as("b"), col("sz").as("szb")), Seq("b"))
      .withColumn("jaccard",
        col("c").cast("double") / (col("sza") + col("szb") - col("c")))
      .select(col("a"), col("b"), col("jaccard"))
      .orderBy(col("jaccard").desc, col("a"), col("b"))
      .limit(20)
  }

  val d04Sql: String =
    s"""WITH $shingleSqlCte,
       |dall AS (SELECT DISTINCT doc_id, s FROM sh),
       |rare AS (SELECT s FROM dall GROUP BY s HAVING COUNT(*) <= $ShingleDfCap),
       |ds AS (SELECT dall.doc_id, dall.s FROM dall JOIN rare ON dall.s = rare.s),
       |sizes AS (SELECT doc_id, COUNT(*) AS sz FROM ds GROUP BY doc_id),
       |inter AS (SELECT x.doc_id AS a, y.doc_id AS b, COUNT(*) AS c
       |          FROM ds x JOIN ds y ON x.s = y.s WHERE x.doc_id < y.doc_id
       |          GROUP BY 1, 2)
       |SELECT a, b, CAST(c AS DOUBLE) / (sa.sz + sb.sz - c) AS jaccard
       |FROM inter JOIN sizes sa ON inter.a = sa.doc_id
       |JOIN sizes sb ON inter.b = sb.doc_id
       |ORDER BY jaccard DESC, a, b LIMIT 20""".stripMargin

  /** MinHash Jaccard estimation over the LSH candidate pairs (the full
    * dedup pipeline: shingle → sign → band → candidates → estimate).
    * Candidates and the 16-hash signature table are session-cached
    * model artifacts — shared with d03 instead of re-shingling the
    * corpus per query. */
  def d05MinhashEstimate(s: SparkSession, dir: String): DataFrame = {
    val pairs = d03LshCandidates(s, dir) // cached artifact (shared with d03)
    val sigs = graft.index.IndexCache.frameDisk(s"$dir|minhash16", s,
      graft.ops.MinHash.signatures(docs(s, dir), numHashes = 16))
    graft.ops.MinHash.estimate(pairs, sigs)
      .orderBy(col("a"), col("b"))
  }

  val d05Sql: String = {
    val minCols = (0 until 16).map(h => s"MIN(md5('$h|' || s)) AS m$h").mkString(",\n  ")
    val eqSum = (0 until 16).map(h => s"CASE WHEN x.m$h = y.m$h THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""WITH $shingleSqlCte,
       |sig AS (SELECT doc_id, MIN(md5('0|' || s)) AS mh0, MIN(md5('1|' || s)) AS mh1,
       |        MIN(md5('2|' || s)) AS mh2, MIN(md5('3|' || s)) AS mh3 FROM sh GROUP BY doc_id),
       |bands AS (
       |  SELECT doc_id, 0 AS band_idx, substring(mh0, 1, 4) AS band_key FROM sig UNION ALL
       |  SELECT doc_id, 1, substring(mh1, 1, 4) FROM sig UNION ALL
       |  SELECT doc_id, 2, substring(mh2, 1, 4) FROM sig UNION ALL
       |  SELECT doc_id, 3, substring(mh3, 1, 4) FROM sig),
       |cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
       |  FROM bands x JOIN bands y ON x.band_idx = y.band_idx AND x.band_key = y.band_key
       |  WHERE x.doc_id < y.doc_id),
       |sig16 AS (SELECT doc_id, $minCols FROM sh GROUP BY doc_id)
       |SELECT a, b, CAST($eqSum AS DOUBLE) / 16 AS est_jaccard
       |FROM cand JOIN sig16 x ON cand.a = x.doc_id JOIN sig16 y ON cand.b = y.doc_id
       |ORDER BY a, b""".stripMargin
  }

  /** End-to-end curation pipeline — the composite a training-data run
    * performs: quality gate (stopword ratio + length) → exact dedup
    * (normalized fingerprint, keep smallest id) → per-language corpus
    * stats of the surviving set. One declarative plan: filter →
    * groupBy(fp) → groupBy(lang). */
  def d06CurationPipeline(s: SparkSession, dir: String): DataFrame = {
    val ws = split(col("text"), " ")
    val sw = array(Seq("the", "a", "of", "and", "or", "is", "to", "in").map(lit): _*)
    val scored = docs(s, dir)
      .withColumn("ws", ws)
      .withColumn("stop_ratio",
        size(filter(col("ws"), w => array_contains(sw, w))).cast("double") /
          size(col("ws")))
      .filter(col("stop_ratio") >= 0.02 && size(col("ws")) >= 20)
      .withColumn("fp", md5(normText))
    val deduped = scored
      .groupBy(col("fp"))
      .agg(min(col("doc_id")).as("doc_id"), min(col("lang")).as("lang"),
        min(size(col("ws"))).as("n_tokens")) // min: deterministic under duplicate fps
    deduped.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        min(col("doc_id")).as("first_doc"))
      .orderBy(col("lang"))
  }

  val d06Sql: String =
    """WITH scored AS (
      |  SELECT doc_id, lang, text,
      |    len(list_filter(string_split(text, ' '), w -> list_contains(['the','a','of','and','or','is','to','in'], w)))::DOUBLE
      |      / len(string_split(text, ' ')) AS stop_ratio,
      |    len(string_split(text, ' ')) AS n_tokens,
      |    md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
      |  FROM documents),
      |deduped AS (
      |  SELECT fp, MIN(doc_id) AS doc_id, MIN(lang) AS lang, MIN(n_tokens) AS n_tokens
      |  FROM scored WHERE stop_ratio >= 0.02 AND n_tokens >= 20
      |  GROUP BY fp)
      |SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
      |  MIN(doc_id) AS first_doc
      |FROM deduped GROUP BY lang ORDER BY lang""".stripMargin

  /** Per-doc token statistics. */
  def t01TextStats(s: SparkSession, dir: String): DataFrame = {
    val ws = split(col("text"), " ")
    docs(s, dir)
      .withColumn("ws", ws)
      .select(
        col("doc_id"),
        size(col("ws")).as("n_tokens"),
        size(array_distinct(col("ws"))).as("n_distinct"),
        length(col("text")).as("len_chars"),
        (size(array_distinct(col("ws"))).cast("double") / size(col("ws")))
          .as("type_token_ratio"))
      .orderBy(col("doc_id"))
  }

  val t01Sql: String =
    """SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
      |  len(list_distinct(string_split(text, ' '))) AS n_distinct,
      |  length(text) AS len_chars,
      |  CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) / len(string_split(text, ' ')) AS type_token_ratio
      |FROM documents ORDER BY doc_id""".stripMargin

  private val stopwords = Seq("the", "a", "of", "and", "or", "is", "to", "in")

  /** Quality score: stopword ratio + mean token length — the standard
    * cheap text-quality heuristics. */
  def t02QualityScore(s: SparkSession, dir: String): DataFrame = {
    val ws = split(col("text"), " ")
    val sw = array(stopwords.map(lit): _*)
    docs(s, dir)
      .withColumn("ws", ws)
      .select(
        col("doc_id"),
        (size(filter(col("ws"), w => array_contains(sw, w))).cast("double") /
          size(col("ws"))).as("stopword_ratio"),
        (aggregate(transform(col("ws"), w => length(w).cast("long")),
          lit(0L), (acc, x) => acc + x).cast("double") / size(col("ws")))
          .as("mean_token_len"))
      .orderBy(col("doc_id"))
  }

  val t02Sql: String = {
    val swList = stopwords.map(w => s"'$w'").mkString("[", ", ", "]")
    s"""SELECT doc_id,
       |  CAST(len(list_filter(string_split(text, ' '), w -> list_contains($swList, w))) AS DOUBLE)
       |    / len(string_split(text, ' ')) AS stopword_ratio,
       |  CAST(list_sum(list_transform(string_split(text, ' '), w -> CAST(length(w) AS BIGINT))) AS DOUBLE)
       |    / len(string_split(text, ' ')) AS mean_token_len
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  /** Regex token counting (BPE-ish pre-tokenizer: words + punctuation). */
  def t03TokenCount(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"),
        size(regexp_extract_all(col("text"), lit("\\w+|[^\\w\\s]"), lit(0)))
          .as("n_bpe_tokens"),
        size(split(col("text"), " ")).as("n_ws_tokens"))
      .orderBy(col("doc_id"))

  val t03Sql: String =
    """SELECT doc_id, len(regexp_extract_all(text, '\w+|[^\w\s]')) AS n_bpe_tokens,
      |  len(string_split(text, ' ')) AS n_ws_tokens
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Corpus language distribution + length stats. */
  def t04LangDist(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        (sum(col("n_chars")).cast("double") / count(lit(1))).as("avg_chars"),
        max(col("n_chars")).as("max_chars"))
      .orderBy(col("lang"))

  val t04Sql: String =
    """SELECT lang, COUNT(*) AS n_docs,
      |  CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars, MAX(n_chars) AS max_chars
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  /** Document fingerprint: full digest + a 16-hex prefix bucket (the
    * rolling-hash fingerprint family, engine-portable via md5). */
  def t05Fingerprint(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"), md5(normText).as("fp"),
        substring(md5(normText), 1, 16).as("fp64"))
      .orderBy(col("doc_id"))

  val t05Sql: String =
    """SELECT doc_id, md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp,
      |  substring(md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))), 1, 16) AS fp64
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Rolling-hash fingerprint (modular fold over characters). */
  def t06RollingFp(s: SparkSession, dir: String): DataFrame =
    graft.ops.TextAnalysis.rollingFingerprint(docs(s, dir))
      .orderBy(col("doc_id"))

  val t06Sql: String =
    """SELECT doc_id, list_reduce(list_prepend(CAST(0 AS BIGINT),
      |  list_transform(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ''),
      |    c -> CAST(ascii(c) AS BIGINT))),
      |  (a, b) -> (a * 31 + b) % 1000000007) AS fingerprint
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Language-ID heuristic: argmax of per-language stopword hits (tie →
    * lexicographically larger lang, matching array_max on (hits, lang);
    * all-zero → 'und'). */
  def t07LangId(s: SparkSession, dir: String): DataFrame =
    graft.ops.TextAnalysis.languageId(docs(s, dir))
      .select(col("doc_id"), col("lang"), col("pred_lang"))
      .orderBy(col("doc_id"))

  val t07Sql: String = {
    val langs = graft.ops.TextAnalysis.profiles.toSeq.sortBy(_._1)
    def cnt(l: String, ws: Set[String]) =
      s"len(list_filter(regexp_split_to_array(lower(text), '\\s+'), w -> list_contains(" +
        ws.toSeq.sorted.map(w => s"'$w'").mkString("[", ", ", "]") + s", w))) AS c_$l"
    val cases = langs.map(_._1).sortBy(identity).reverse.map { l =>
      val others = langs.map(_._1).filter(_ != l)
      s"WHEN ${others.map(o => s"c_$l >= c_$o").mkString(" AND ")} THEN '$l'"
    }
    s"""WITH c AS (SELECT doc_id, lang, ${langs.map { case (l, ws) => cnt(l, ws) }.mkString(",\n  ")}
       |FROM documents)
       |SELECT doc_id, lang,
       |  CASE WHEN ${langs.map(l => s"c_${l._1} <= 0").mkString(" AND ")} THEN 'und'
       |  ${cases.mkString("\n  ")} END AS pred_lang
       |FROM c ORDER BY doc_id""".stripMargin
  }

  /** SimHash fingerprints: per-word 60-bit hashes vote per bit, the
    * majority forms the fingerprint. DuckDB twin reproduces the hex
    * parse, shifts and the bit fold exactly (BIGINT xor/shift/and are
    * portable). */
  def t08Simhash(s: SparkSession, dir: String): DataFrame =
    // repartition for the same single-split reason as d02MinhashSig
    graft.ops.TextAnalysis.simhash(docs(s, dir).repartition(col("doc_id")))
      .orderBy(col("doc_id"))

  val t08Sql: String = {
    val votes = (0 until 60)
      .map(b => s"SUM(CASE WHEN ((h >> $b) & 1) = 1 THEN 1 ELSE -1 END) AS b$b")
      .mkString(",\n  ")
    val fp = (0 until 60)
      .map(b => s"(CASE WHEN b$b > 0 THEN (CAST(1 AS BIGINT) << $b) ELSE CAST(0 AS BIGINT) END)")
      .mkString(" | ")
    s"""WITH w AS (SELECT doc_id, w FROM (
       |    SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\\s+')) AS w FROM documents)
       |  WHERE length(w) > 0),
       |hh AS (SELECT doc_id, list_reduce(list_transform(string_split(substring(md5(w), 1, 15), ''),
       |    c -> CAST(strpos('0123456789abcdef', c) AS BIGINT) - 1), (a, b) -> a * 16 + b) AS h FROM w),
       |v AS (SELECT doc_id, $votes FROM hh GROUP BY doc_id)
       |SELECT doc_id, $fp AS simhash FROM v ORDER BY doc_id""".stripMargin
  }

  /** Multimodal bookkeeping layer over binary payloads (text bytes stand
    * in for media blobs — the codecs are stubbed, the plumbing is real). */
  def mm01BinaryStats(s: SparkSession, dir: String): DataFrame = {
    val media = docs(s, dir).select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("payload"),
      lit("text/plain").as("mime"),
      lit(8).as("width"), lit(8).as("height"))
    graft.ops.Multimodal.binaryStats(media).orderBy(col("media_id"))
  }

  val mm01Sql: String =
    """SELECT doc_id AS media_id, 'text/plain' AS mime,
      |  octet_length(encode(text)) AS n_bytes, md5(text) AS digest
      |FROM documents ORDER BY media_id""".stripMargin

  /** Multimodal feature pipeline: decode(stub) → resize → 16-d feature
    * vector → brute-force top-3 self-similarity — exercises the full
    * media → vector-search handoff. The decode stub is deterministic
    * byte arithmetic, so the whole pipeline has an exact SQL twin
    * (feature f = byte[(64·(f/4) + 4·(f%4)) mod len] / 255). */
  def mm02MediaFeatures(s: SparkSession, dir: String): DataFrame = {
    val media = docs(s, dir).filter(col("doc_id") < 64).select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("payload"),
      lit("image/fake").as("mime"),
      lit(16).as("width"), lit(16).as("height"))
    val feats = graft.ops.Multimodal.decodeResizeFeatures(media, w2 = 4, h2 = 4)
      .select(col("media_id").as("id"), col("features").as("vec"))
    val q = feats.filter(col("id") < 8).select(col("id").as("qid"), col("vec"))
    FlatSearch.knn(feats, q, k = 3).orderBy(col("qid"), col("rank"))
  }

  val mm02Sql: String =
    """WITH m AS (SELECT doc_id AS id, text, octet_length(encode(text)) AS len
      |           FROM documents WHERE doc_id < 64),
      |f AS (SELECT id, list_transform(range(0, 16), f ->
      |        CAST(ascii(substring(text, CAST((64 * (f // 4) + 4 * (f % 4)) % len AS INTEGER) + 1, 1)) / 255.0 AS FLOAT)) AS vec
      |      FROM m),
      |q AS (SELECT id AS qid, vec AS qv FROM f WHERE id < 8),
      |d AS (SELECT q.qid, b.id, list_sum(list_transform(range(1, 17), i ->
      |        (CAST(q.qv[i] AS DOUBLE) - CAST(b.vec[i] AS DOUBLE)) *
      |        (CAST(q.qv[i] AS DOUBLE) - CAST(b.vec[i] AS DOUBLE)))) AS dist
      |      FROM q CROSS JOIN f b)
      |SELECT qid, id, dist, rank FROM (
      |  SELECT qid, id, dist,
      |    row_number() OVER (PARTITION BY qid ORDER BY dist, id) AS rank FROM d)
      |WHERE rank <= 3 ORDER BY qid, rank""".stripMargin

  /** Dataset mixing: deterministic per-source weighted sampling plus a
    * hash-disjoint train/val split (`ops.Sampling`) — the op that turns
    * a curated corpus into a training mixture. Reported per (source,
    * split): kept docs, kept chars, first kept id. Membership is pure
    * id arithmetic (no RNG), so the subset is reproducible across
    * runs, retries and engines; the whole selection is a map-side
    * filter — zero shuffles before the final tiny aggregate at any
    * corpus size. */
  def d07SourceMix(s: SparkSession, dir: String): DataFrame = {
    val sampled = graft.ops.Sampling.stratifiedSample(
      docs(s, dir), "source", "doc_id", MixRates, MixDefaultRate)
    sampled
      .withColumn("split",
        graft.ops.Sampling.trainValSplit(col("doc_id"), TrainPermyriad))
      .groupBy(col("source"), col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("n_chars_total"),
        min(col("doc_id")).as("first_doc"))
      .orderBy(col("source"), col("split"))
  }

  /** The d07 mixing spec: a handful of explicitly-weighted sources plus
    * a default — permyriad keep rates. */
  val MixRates: Map[String, Int] =
    Map("src0" -> 9000, "src1" -> 5000, "src2" -> 2500, "src3" -> 1000)
  val MixDefaultRate = 6000
  val TrainPermyriad = 9000

  val d07Sql: String = {
    val cases = MixRates.toSeq.sortBy(_._1)
      .map { case (k, v) => s"WHEN '$k' THEN $v" }.mkString(" ")
    s"""WITH b AS (
       |  SELECT doc_id, source, n_chars,
       |    (doc_id * ${graft.ops.Sampling.SampleMult}) % ${graft.ops.Sampling.HashMod} % 10000 AS b1,
       |    (doc_id * ${graft.ops.Sampling.SplitMult}) % ${graft.ops.Sampling.HashMod} % 10000 AS b2,
       |    CASE source $cases ELSE $MixDefaultRate END AS rate
       |  FROM documents)
       |SELECT source, CASE WHEN b2 < $TrainPermyriad THEN 'train' ELSE 'val' END AS split,
       |  COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS n_chars_total,
       |  MIN(doc_id) AS first_doc
       |FROM b WHERE b1 < rate
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  }

  /** Near-dup cluster resolution: connected components over the d03
    * LSH candidate pairs (`ops.Components` min-label propagation), so
    * transitive near-dups (A≈B, B≈C) land in ONE cluster and the dedup
    * keeps exactly one representative — the min doc_id, which IS the
    * component label. Every document gets a row (singletons are their
    * own component); `is_rep` marks the kept set. The oracle replays
    * the closure with a recursive CTE over the same candidate pairs. */
  def d08DedupClusters(s: SparkSession, dir: String): DataFrame = {
    val cand = d03LshCandidates(s, dir)
    val res = graft.ops.Components.connectedComponents(cand)
    require(res.converged,
      s"component propagation did not converge in ${res.rounds} rounds")
    docs(s, dir).select(col("doc_id"))
      .join(res.labels.withColumnRenamed("node", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("component"), col("doc_id")).as("component"))
      .withColumn("is_rep", col("component") === col("doc_id"))
      .orderBy(col("doc_id"))
  }

  val d08Sql: String =
    s"""WITH RECURSIVE $shingleSqlCte,
       |$lshCandCte,
       |e AS (SELECT a, b FROM cand UNION SELECT b AS a, a AS b FROM cand),
       |cc AS (
       |  SELECT doc_id AS node, doc_id AS label FROM documents
       |  UNION
       |  SELECT e.b AS node, cc.label AS label FROM cc JOIN e ON e.a = cc.node)
       |SELECT node AS doc_id, MIN(label) AS component, MIN(label) = node AS is_rep
       |FROM cc GROUP BY node ORDER BY doc_id""".stripMargin

  /** Intra-document repetition signals (Gopher-style duplicate / top
    * bigram fractions) — `TextAnalysis.repetitionSignals`'s fused
    * kernel; the oracle replays the bigram counting declaratively. */
  def t09Repetition(s: SparkSession, dir: String): DataFrame =
    graft.ops.TextAnalysis.repetitionSignals(docs(s, dir))
      .orderBy(col("doc_id"))

  val t09Sql: String =
    s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents
       |           WHERE len(string_split(text, ' ')) >= 2),
       |bg AS (SELECT doc_id, unnest(list_transform(range(1, len(ws)),
       |       i -> ws[i] || ' ' || ws[i+1])) AS g FROM w),
       |cnt AS (SELECT doc_id, g, COUNT(*) AS c FROM bg GROUP BY 1, 2),
       |agg AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bigrams,
       |        COUNT(*) AS n_distinct, MAX(c) AS top_count FROM cnt GROUP BY 1)
       |SELECT doc_id, n_bigrams, n_distinct,
       |  (n_bigrams - n_distinct)::DOUBLE / n_bigrams AS dup_frac,
       |  top_count::DOUBLE / n_bigrams AS top_frac,
       |  ((n_bigrams - n_distinct)::DOUBLE / n_bigrams > ${graft.ops.TextAnalysis.DupThreshold}
       |    OR top_count::DOUBLE / n_bigrams > ${graft.ops.TextAnalysis.TopThreshold}) AS repetitive
       |FROM agg ORDER BY doc_id""".stripMargin

  /** Benchmark decontamination (n-gram overlap): the held-out tenth of
    * the corpus (doc_id % 10 == 7) stands in for the benchmark set; a
    * training doc is contaminated if it shares any word 4-gram with it.
    * Scale shape: benchmark grams broadcast (benchmarks are megabytes),
    * training side is one map-side gram scan + one groupBy on doc_id —
    * see [[graft.ops.Decontaminate]]. */
  def d09Decontaminate(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    graft.ops.Decontaminate.flagContaminated(
      d.filter(col("doc_id") % 10 =!= BenchResidue),
      d.filter(col("doc_id") % 10 === BenchResidue),
      n = DecontamN)
      .orderBy(col("doc_id"))
  }

  /** Contamination n-gram length: at the sf corpora's vocabulary, 4 is
    * the knee — 3-grams flag ~95% of docs, 5-grams only the planted
    * exact dups. Shared with the d09 oracle text. */
  val DecontamN = 4

  /** doc_id % 10 residue that plays the benchmark set in d09. */
  val BenchResidue = 7

  val d09Sql: String = {
    val n = DecontamN
    val gram = (1 until n).map(j => s" || ' ' || ws[i+$j]")
      .mkString(s"ws[i]", "", "")
    s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       |g0 AS (SELECT doc_id, unnest(list_transform(range(1, len(ws) - ${n - 2}),
       |       i -> $gram)) AS gram FROM w WHERE len(ws) >= $n),
       |g AS (SELECT DISTINCT doc_id, gram FROM g0),
       |ev AS (SELECT DISTINCT gram FROM g WHERE doc_id % 10 = $BenchResidue),
       |hit AS (SELECT g.doc_id, COUNT(*) AS n_hit_grams FROM g JOIN ev USING (gram)
       |        WHERE g.doc_id % 10 <> $BenchResidue GROUP BY 1)
       |SELECT d.doc_id, COALESCE(h.n_hit_grams, 0) AS n_hit_grams,
       |  COALESCE(h.n_hit_grams, 0) > 0 AS contaminated
       |FROM documents d LEFT JOIN hit h USING (doc_id)
       |WHERE d.doc_id % 10 <> $BenchResidue ORDER BY doc_id""".stripMargin
  }

  /** Sequence-packing layout: concat-then-chunk token offsets over the
    * whitespace token stream (the t03 token definition), 512-token
    * windows. The global prefix sum runs as the distributed two-pass
    * scan in [[graft.ops.SequencePack]] — never a single-partition
    * window; the oracle replays it with DuckDB's window cumsum. */
  def d10SequencePack(s: SparkSession, dir: String): DataFrame =
    graft.ops.SequencePack.packOffsets(
      docs(s, dir).withColumn("n_tokens", size(split(col("text"), " "))),
      "doc_id", "n_tokens", PackWindow)
      .orderBy(col("doc_id"))

  /** Training context-window size (tokens) for d10. */
  val PackWindow = 512L

  val d10Sql: String =
    s"""WITH t AS (SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents),
       |p AS (SELECT doc_id, n_tokens,
       |      CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_token
       |      FROM t)
       |SELECT doc_id, n_tokens, start_token,
       |  start_token // $PackWindow AS window_id,
       |  (start_token + GREATEST(n_tokens, 1) - 1) // $PackWindow AS end_window,
       |  ((start_token + GREATEST(n_tokens, 1) - 1) // $PackWindow) > (start_token // $PackWindow) AS spans_boundary
       |FROM p ORDER BY doc_id""".stripMargin

  /** Corpus vocabulary: top-K words by total frequency with document
    * frequency — the tokenizer-training / vocab-prep aggregation. One
    * fused per-document count kernel (local word→count map, no
    * per-token rows into the shuffle), then ONE corpus shuffle keyed by
    * word with map-side partial aggregation, then a TakeOrdered top-K —
    * the classic word-count shape that scales to any corpus size. */
  def d11VocabTop(s: SparkSession, dir: String): DataFrame = {
    val cntU = udf { text: String =>
      val m = scala.collection.mutable.LinkedHashMap.empty[String, Long]
      text.split(" ", -1).foreach(w => m.update(w, m.getOrElse(w, 0L) + 1L))
      m.toMap
    }
    docs(s, dir)
      .select(explode(cntU(col("text"))).as(Seq("word", "c")))
      .groupBy(col("word"))
      .agg(sum(col("c")).as("tf"), count(lit(1)).as("df"))
      .orderBy(col("tf").desc, col("word"))
      .limit(VocabTopK)
  }

  /** Vocabulary size reported by d11 (ties broken by word, so the
    * cutoff is deterministic). */
  val VocabTopK = 50

  val d11Sql: String =
    s"""WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
       |d AS (SELECT doc_id, word, COUNT(*) AS c FROM w GROUP BY 1, 2),
       |a AS (SELECT word, CAST(SUM(c) AS BIGINT) AS tf, COUNT(*) AS df FROM d GROUP BY 1)
       |SELECT word, tf, df FROM a ORDER BY tf DESC, word LIMIT $VocabTopK""".stripMargin

  /** End-to-end training-data preparation — the composed job a
    * pre-training run actually submits, as ONE declarative DAG:
    *
    *   1. quality gate (d06's stopword-ratio + min-length thresholds) —
    *      map-side only, fused into the scan;
    *   2. exact dedup keeping the smallest doc_id per normalized-text
    *      fingerprint — one shuffle on the 16-byte digest;
    *   3. benchmark decontamination — bench grams broadcast
    *      (benchmarks are MBs at any corpus scale), then a LEFT ANTI
    *      join against just the contaminated ids
    *      ([[graft.ops.Decontaminate.contaminatedIds]] — sized by the
    *      contamination rate, not the corpus, so AQE broadcasts it);
    *   4. sequence packing of the survivors into [[PackWindow]]-token
    *      context windows via the distributed two-pass prefix sum.
    *
    * Output: one row per surviving document with its global token
    * offset and context-window ids — the layout manifest a tokenizer
    * shard consumes. Every stage is the production-scale shape: the
    * only corpus-keyed shuffles are the dedup groupBy and the packing
    * range-partition; decontamination never shuffles corpus text. */
  def d12PrepareE2e(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    graft.ops.PreparePipeline.run(
      train = d.filter(col("doc_id") % 10 =!= BenchResidue),
      bench = d.filter(col("doc_id") % 10 === BenchResidue),
      stopwords = Seq("the", "a", "of", "and", "or", "is", "to", "in"),
      minStopRatio = 0.02, minTokens = 20,
      gramN = DecontamN, windowTokens = PackWindow)
      .orderBy(col("doc_id"))
  }

  val d12Sql: String = {
    val n = DecontamN
    val gram = (1 until n).map(j => s" || ' ' || ws[i+$j]").mkString("ws[i]", "", "")
    s"""WITH scored AS (
       |  SELECT doc_id, text,
       |    len(list_filter(string_split(text, ' '), w -> list_contains(['the','a','of','and','or','is','to','in'], w)))::DOUBLE
       |      / len(string_split(text, ' ')) AS stop_ratio,
       |    len(string_split(text, ' ')) AS n_tokens,
       |    md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
       |  FROM documents WHERE doc_id % 10 <> $BenchResidue),
       |q AS (SELECT * FROM scored WHERE stop_ratio >= 0.02 AND n_tokens >= 20),
       |keep AS (SELECT fp, MIN(doc_id) AS doc_id FROM q GROUP BY fp),
       |dd AS (SELECT q.doc_id, q.text, q.n_tokens FROM q
       |       JOIN keep ON q.fp = keep.fp AND q.doc_id = keep.doc_id),
       |w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM dd),
       |g AS (SELECT DISTINCT doc_id, unnest(list_transform(range(1, len(ws) - ${n - 2}),
       |      i -> $gram)) AS gram FROM w WHERE len(ws) >= $n),
       |bw AS (SELECT string_split(text, ' ') AS ws FROM documents
       |       WHERE doc_id % 10 = $BenchResidue),
       |ev AS (SELECT DISTINCT unnest(list_transform(range(1, len(ws) - ${n - 2}),
       |       i -> $gram)) AS gram FROM bw WHERE len(ws) >= $n),
       |bad AS (SELECT DISTINCT doc_id FROM g JOIN ev USING (gram)),
       |clean AS (SELECT doc_id, n_tokens FROM dd
       |          WHERE doc_id NOT IN (SELECT doc_id FROM bad)),
       |p AS (SELECT doc_id, n_tokens,
       |      CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_token
       |      FROM clean)
       |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, start_token,
       |  start_token // $PackWindow AS window_id,
       |  (start_token + GREATEST(n_tokens, 1) - 1) // $PackWindow AS end_window,
       |  ((start_token + GREATEST(n_tokens, 1) - 1) // $PackWindow) > (start_token // $PackWindow) AS spans_boundary
       |FROM p ORDER BY doc_id""".stripMargin
  }

  /** d12 with the fuzzy near-dup stage ON — the petabyte knob's own
    * correctness row. The sf corpus has planted EXACT duplicates but no
    * non-exact near-dups, so the fixture plants them the way the
    * streaming rows stage derived corpora (s04's re-appearing docs):
    * every doc_id % 10 == 3 document re-appears under id + 10⁶ with one
    * word appended — NOT an exact duplicate (the normalized fingerprint
    * differs), but a ≥0.9-Jaccard near-dup of its original, which the
    * MinHash-LSH stage must collapse back to the min-id original.
    * Planted ids keep residue 3 (mod 10), so the benchmark split
    * (residue 7) is untouched.
    *
    * Fuzzy config: 16 salted-md5 minhashes in 4 bands of 4 — the d03/
    * s02 signature family, so DuckDB reproduces it hash-for-hash; a
    * candidate must agree on ALL 4 minhashes of some band (the oracle
    * groups on the concatenated band tuple — fixed-width hex, injective
    * — where Spark keys on xxhash64 of the slice: equal tuples ⇔ equal
    * keys modulo a 2⁻⁶⁴ collision that could only ADD a candidate,
    * which the estimated-Jaccard filter then re-judges identically in
    * both engines). `maxBucket` (8192) never engages at sf scale —
    * exact dedup upstream means a band bucket holds one near-dup
    * cluster, size ≈ 2 — the [[ShingleDfCap]] precedent. Whether a
    * planted pair clears est ≥ 0.8 is the same deterministic md5
    * arithmetic in both engines, so the row is exact by construction
    * at ANY sf. */
  def d13FuzzyPipeline(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val planted = d.filter(col("doc_id") % 10 === 3)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat(col("text"), lit(" zq")).as("text"))
    val corpus = d.select(col("doc_id"), col("text")).unionByName(planted)
    graft.ops.PreparePipeline.run(
      train = corpus.filter(col("doc_id") % 10 =!= BenchResidue),
      bench = corpus.filter(col("doc_id") % 10 === BenchResidue),
      cfg = graft.ops.PreparePipeline.Config(
        stopwords = Seq("the", "a", "of", "and", "or", "is", "to", "in"),
        minStopRatio = 0.02, minTokens = 20, gramN = DecontamN,
        windowTokens = PackWindow,
        fuzzy = Some(graft.ops.PreparePipeline.FuzzyDedup(
          numHashes = 16, bands = 4, minJaccard = FuzzyMinJaccard))))
      .orderBy(col("doc_id"))
  }

  /** d13's estimated-Jaccard keep threshold (matches/16 ≥ this). */
  val FuzzyMinJaccard = 0.8

  val d13Sql: String = {
    val n = DecontamN
    val gram = (1 until n).map(j => s" || ' ' || ws[i+$j]").mkString("ws[i]", "", "")
    val mins = (0 until 16).map(h => s"MIN(md5('$h|' || s)) AS m$h").mkString(", ")
    val bandRows = (0 until 4).map { b =>
      val key = (0 until 4).map(i => s"m${b * 4 + i}").mkString(" || ")
      if (b == 0) s"SELECT doc_id, 0 AS bi, $key AS bk FROM sig"
      else s"SELECT doc_id, $b, $key FROM sig"
    }.mkString(" UNION ALL ")
    val eqSum = (0 until 16).map(h => s"CASE WHEN sa.m$h = sb.m$h THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""WITH RECURSIVE corpus AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 1000000, text || ' zq' FROM documents WHERE doc_id % 10 = 3),
       |scored AS (
       |  SELECT doc_id, text,
       |    len(list_filter(string_split(text, ' '), w -> list_contains(['the','a','of','and','or','is','to','in'], w)))::DOUBLE
       |      / len(string_split(text, ' ')) AS stop_ratio,
       |    len(string_split(text, ' ')) AS n_tokens,
       |    md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
       |  FROM corpus WHERE doc_id % 10 <> $BenchResidue),
       |q AS (SELECT * FROM scored WHERE stop_ratio >= 0.02 AND n_tokens >= 20),
       |keep AS (SELECT fp, MIN(doc_id) AS doc_id FROM q GROUP BY fp),
       |dd AS (SELECT q.doc_id, q.text, q.n_tokens FROM q
       |       JOIN keep ON q.fp = keep.fp AND q.doc_id = keep.doc_id),
       |fw AS (SELECT doc_id, string_split(text, ' ') AS ws FROM dd
       |       WHERE len(string_split(text, ' ')) >= 3),
       |fsh AS (SELECT doc_id, unnest(list_transform(range(1, len(ws) - 1),
       |        i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS s FROM fw),
       |sig AS (SELECT doc_id, $mins FROM fsh GROUP BY doc_id),
       |bands AS ($bandRows),
       |cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
       |  FROM bands x JOIN bands y ON x.bi = y.bi AND x.bk = y.bk
       |  WHERE x.doc_id < y.doc_id),
       |edges AS (SELECT a, b FROM cand
       |  JOIN sig sa ON cand.a = sa.doc_id JOIN sig sb ON cand.b = sb.doc_id
       |  WHERE CAST($eqSum AS DOUBLE) / 16 >= $FuzzyMinJaccard),
       |e AS (SELECT a, b FROM edges UNION SELECT b AS a, a AS b FROM edges),
       |cc AS (
       |  SELECT doc_id AS node, doc_id AS label FROM dd
       |  UNION
       |  SELECT e.b AS node, cc.label AS label FROM cc JOIN e ON e.a = cc.node),
       |lab AS (SELECT node, MIN(label) AS component FROM cc GROUP BY node),
       |surv AS (SELECT dd.doc_id, dd.text, dd.n_tokens FROM dd
       |         JOIN lab ON dd.doc_id = lab.node WHERE lab.component = lab.node),
       |w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM surv),
       |g AS (SELECT DISTINCT doc_id, unnest(list_transform(range(1, len(ws) - ${n - 2}),
       |      i -> $gram)) AS gram FROM w WHERE len(ws) >= $n),
       |bw AS (SELECT string_split(text, ' ') AS ws FROM corpus
       |       WHERE doc_id % 10 = $BenchResidue),
       |ev AS (SELECT DISTINCT unnest(list_transform(range(1, len(ws) - ${n - 2}),
       |       i -> $gram)) AS gram FROM bw WHERE len(ws) >= $n),
       |bad AS (SELECT DISTINCT doc_id FROM g JOIN ev USING (gram)),
       |clean AS (SELECT doc_id, n_tokens FROM surv
       |          WHERE doc_id NOT IN (SELECT doc_id FROM bad)),
       |p AS (SELECT doc_id, n_tokens,
       |      CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_token
       |      FROM clean)
       |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, start_token,
       |  start_token // $PackWindow AS window_id,
       |  (start_token + GREATEST(n_tokens, 1) - 1) // $PackWindow AS end_window,
       |  ((start_token + GREATEST(n_tokens, 1) - 1) // $PackWindow) > (start_token // $PackWindow) AS spans_boundary
       |FROM p ORDER BY doc_id""".stripMargin
  }

  /** Streaming ingest-time decontamination (a REAL Structured Streaming
    * run): the training split is staged to parquet, streamed back
    * admission-capped (4 files/trigger over 8 staged files, so
    * AvailableNow genuinely micro-batches — two batches, the least
    * that still proves it), and every micro-batch is
    * flagged against the static benchmark gram set by
    * [[graft.streaming.EventStream.decontamServe]]. Per-document flags
    * are independent of the micro-batching, so the sink union equals
    * the batch d09 answer bit-exactly — d09's SQL oracle verifies the
    * streaming run. */
  def s06StreamDecontam(s: SparkSession, dir: String): DataFrame = {
    val root = Vector.sdir(dir)
    val staged = s"$root/s06_docs.parquet"
    val outDir = s"$root/s06_out.parquet"
    val d = docs(s, dir)
    d.filter(col("doc_id") % 10 =!= BenchResidue).select("doc_id", "text")
      .repartition(8).write.mode("overwrite").parquet(staged)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      s.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(outDir), true)
    val schema = s.read.parquet(staged).schema
    val stream = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", "4").parquet(staged)
    val q = graft.streaming.EventStream.decontamServe(
      stream, d.filter(col("doc_id") % 10 === BenchResidue), DecontamN, outDir)
    require(q.awaitTermination(300000),
      "s06 streaming query did not finish within 300s — partial sink")
    val dataBatches = q.recentProgress.count(_.numInputRows > 0)
    require(dataBatches >= 2,
      s"s06 ran in $dataBatches micro-batches (expected >= 2)")
    // per-batch sink dirs (the decontamServe exactly-once contract)
    s.read.parquet(s"$outDir/batch-*").orderBy(col("doc_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t06_rolling_fp" -> t06RollingFp _,
    "t07_lang_id" -> t07LangId _,
    "t08_simhash" -> t08Simhash _,
    "mm01_binary_stats" -> mm01BinaryStats _,
    "mm02_media_features" -> mm02MediaFeatures _,
    "d01_dedup_exact" -> d01DedupExact _,
    "d02_minhash_sig" -> d02MinhashSig _,
    "d03_lsh_candidates" -> d03LshCandidates _,
    "s02_stream_lsh" -> s02StreamLsh _,
    "s04_stream_dedup" -> s04StreamDedup _,
    "d04_jaccard_top" -> d04JaccardTop _,
    "d05_minhash_estimate" -> d05MinhashEstimate _,
    "d06_curation_pipeline" -> d06CurationPipeline _,
    "d07_source_mix" -> d07SourceMix _,
    "d08_dedup_clusters" -> d08DedupClusters _,
    "d09_decontaminate" -> d09Decontaminate _,
    "d10_sequence_pack" -> d10SequencePack _,
    "d11_vocab_top" -> d11VocabTop _,
    "d12_prepare_e2e" -> d12PrepareE2e _,
    "d13_fuzzy_pipeline" -> d13FuzzyPipeline _,
    "s06_stream_decontam" -> s06StreamDecontam _,
    "t09_repetition" -> t09Repetition _,
    "t01_text_stats" -> t01TextStats _,
    "t02_quality_score" -> t02QualityScore _,
    "t03_token_count" -> t03TokenCount _,
    "t04_lang_dist" -> t04LangDist _,
    "t05_fingerprint" -> t05Fingerprint _)

  val oracles: Map[String, String] = Map(
    "t06_rolling_fp" -> t06Sql,
    "t07_lang_id" -> t07Sql,
    "t08_simhash" -> t08Sql,
    "mm01_binary_stats" -> mm01Sql,
    "mm02_media_features" -> mm02Sql,
    "d01_dedup_exact" -> d01Sql,
    "s02_stream_lsh" -> s02Sql,
    "s04_stream_dedup" -> s04Sql,
    "d02_minhash_sig" -> d02Sql,
    "d03_lsh_candidates" -> d03Sql,
    "d04_jaccard_top" -> d04Sql,
    "d05_minhash_estimate" -> d05Sql,
    "d06_curation_pipeline" -> d06Sql,
    "d07_source_mix" -> d07Sql,
    "d08_dedup_clusters" -> d08Sql,
    "d09_decontaminate" -> d09Sql,
    "d10_sequence_pack" -> d10Sql,
    "d11_vocab_top" -> d11Sql,
    "d12_prepare_e2e" -> d12Sql,
    "d13_fuzzy_pipeline" -> d13Sql,
    "s06_stream_decontam" -> d09Sql,
    "t09_repetition" -> t09Sql,
    "t01_text_stats" -> t01Sql,
    "t02_quality_score" -> t02Sql,
    "t03_token_count" -> t03Sql,
    "t04_lang_dist" -> t04Sql,
    "t05_fingerprint" -> t05Sql)
}
