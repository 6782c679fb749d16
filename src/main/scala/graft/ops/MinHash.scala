package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MinHash with a proper Jaccard estimator: `numHashes` independent
  * salted hash functions over the shingle set; the estimate for a pair
  * is the fraction of matching signature components. (The 4-hash
  * variant in queries/Documents is the LSH-banding flavor; this one is
  * for measuring similarity, e.g. dedup thresholds.)
  *
  * Shape: shingles explode → `numHashes` min-aggregations in ONE
  * groupBy pass → signatures as an array column; pair estimation is a
  * zip_with equality count — no all-pairs shingle join.
  */
object MinHash {

  private val shingleU = udf { text: String =>
    val ws = text.split(" ", -1)
    if (ws.length < 3) Array.empty[String]
    else Array.tabulate(ws.length - 2)(i => s"${ws(i)} ${ws(i + 1)} ${ws(i + 2)}")
  }

  /** (doc_id, sig ARRAY<STRING>[numHashes]) — min of salted md5 per
    * hash function, computed by the fused per-document scalar kernel
    * ([[sigExpr]]): one projection pass, no shingle explode, no
    * numHashes-way aggregation shuffle (measured 4–10× on the t07/t08
    * kernels this mirrors). Docs with fewer than 3 words are dropped,
    * matching the exploded-groupBy form ([[signaturesGroupBy]], kept as
    * the spec oracle). */
  def signatures(docs: DataFrame, numHashes: Int = 32,
                 idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(col(idCol), sigExpr(col(textCol), numHashes).as("sig"))
      .filter(col("sig").getItem(0).isNotNull)

  /** The declarative exploded-shingle groupBy formulation — the oracle
    * [[signatures]] is spec-checked against (OpsSpec); the fused kernel
    * replaced it on the production path because the explode multiplies
    * every document by its shingle count before the shuffle. */
  def signaturesGroupBy(docs: DataFrame, numHashes: Int = 32,
                 idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val sh = docs.select(col(idCol), explode(shingleU(col(textCol))).as("s"))
    val mins = (0 until numHashes).map { h =>
      min(md5(concat(lit(s"$h|"), col("s")))).as(s"mh$h")
    }
    sh.groupBy(col(idCol))
      .agg(mins.head, mins.tail: _*)
      .select(col(idCol), array((0 until numHashes).map(h => col(s"mh$h")): _*).as("sig"))
  }

  /** Row-local signature expression — identical semantics to
    * [[signatures]] (min of the same salted md5 per hash function over
    * the same 3-word shingles) but computed as a pure projection, so it
    * works in STREAMING plans (no aggregation before the stateful op)
    * and on single rows. One scalar UDF pass rather than numHashes
    * nested higher-order transforms — the interpreted chain costs ~10×
    * on long documents (same reasoning as the shingle UDF in
    * queries/Documents). The kernel ([[minhashHex]]) reproduces Spark's
    * `md5` and `min` exactly, so the batch/SQL oracles still match
    * bit-for-bit. Docs with fewer than 3 words yield a null-component
    * signature (the batch groupBy drops them instead); filter on
    * `sig[0] IS NOT NULL` to match.
    *
    * Marked non-deterministic (guide §4.4): the `sig[0] IS NOT NULL`
    * filter consumers put on this column otherwise gets PUSHED below
    * the projection with its own copy of the UDF — the whole corpus
    * was signed TWICE per query (and the filter copy ran below any
    * parallelizing exchange, i.e. single-threaded on a one-split
    * corpus; the committed r17 d02 before-plan pins this:
    * `Condition: isnotnull(UDF(text))` under the repartition). The
    * kernel is truly deterministic — the marker only stops the
    * optimizer from duplicating or reordering it. */
  def sigExpr(text: org.apache.spark.sql.Column,
              numHashes: Int): org.apache.spark.sql.Column = {
    val salts = saltBytes(numHashes)
    val u = udf { text: String => minhashHex(text, salts) }
      .asNondeterministic()
    u(text)
  }

  /** `"$h|"` salt prefixes as UTF-8 bytes, built once per plan and
    * serialized with the kernel closure (UTF-8 concatenation is
    * byte-concatenation, so update(salt)+update(shingle) ≡
    * md5(salt || shingle)). */
  private[graft] def saltBytes(n: Int): Array[Array[Byte]] =
    Array.tabulate(n)(h =>
      s"$h|".getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** The fused per-document MinHash kernel: for each salt, the minimum
    * `md5(salt || shingle)` lowercase-hex over the document's 3-word
    * shingles — byte-for-byte what `min(md5(concat(salt, s)))` computes
    * in Spark SQL. Returns an all-null array for null/short docs.
    *
    * Hot-loop shape (this is the dominant compute of every MinHash row
    * at sf scale — d02/d03/d05/d13/s02): each word is UTF-8-encoded
    * ONCE (the old form re-encoded every word 3 shingles × n salts
    * times through a per-(shingle,salt) string concat); the digest goes
    * into a reused 16-byte buffer (no per-hash allocation); running
    * minima live as unsigned 128-bit (hi, lo) pairs — lowercase-hex
    * string order ≡ unsigned byte order ≡ unsigned (hi, lo) order, and
    * the all-ones init is ≥ every digest — so hex rendering happens
    * n times per DOCUMENT, not n times per shingle. The MessageDigest
    * itself is the shared per-thread instance ([[TextAnalysis.localMd5]]).
    * OpsSpec/PropertySpec pin this kernel against the declarative
    * exploded-groupBy oracle. */
  private[graft] def minhashHex(text: String,
                                salts: Array[Array[Byte]]): Array[String] = {
    val n = salts.length
    // null text → null signature (filtered like short docs) rather
    // than an NPE that would kill a long-running streaming query
    val ws = if (text == null) Array.empty[String] else text.split(" ", -1)
    if (ws.length < 3) return Array.fill[String](n)(null)
    val md = TextAnalysis.localMd5()
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    val wb = new Array[Array[Byte]](ws.length)
    var w = 0
    while (w < ws.length) { wb(w) = ws(w).getBytes(utf8); w += 1 }
    val minHi = Array.fill(n)(-1L)
    val minLo = Array.fill(n)(-1L)
    val buf = new Array[Byte](16)
    val sp = ' '.toByte
    var i = 0
    while (i < ws.length - 2) {
      var h = 0
      while (h < n) {
        md.reset()
        md.update(salts(h))
        md.update(wb(i)); md.update(sp)
        md.update(wb(i + 1)); md.update(sp)
        md.update(wb(i + 2))
        md.digest(buf, 0, 16)
        var hi = 0L; var lo = 0L
        var b = 0
        while (b < 8) { hi = (hi << 8) | (buf(b) & 0xffL); b += 1 }
        while (b < 16) { lo = (lo << 8) | (buf(b) & 0xffL); b += 1 }
        val c = java.lang.Long.compareUnsigned(hi, minHi(h))
        if (c < 0 || (c == 0 &&
            java.lang.Long.compareUnsigned(lo, minLo(h)) < 0)) {
          minHi(h) = hi; minLo(h) = lo
        }
        h += 1
      }
      i += 1
    }
    Array.tabulate(n)(h => hex32(minHi(h), minLo(h)))
  }

  private val hexChars = "0123456789abcdef".toCharArray

  private def hex32(hi: Long, lo: Long): String = {
    val cs = new Array[Char](32)
    var j = 0
    while (j < 16) { cs(j) = hexChars(((hi >>> ((15 - j) * 4)) & 0xf).toInt); j += 1 }
    while (j < 32) { cs(j) = hexChars(((lo >>> ((31 - j) * 4)) & 0xf).toInt); j += 1 }
    new String(cs)
  }

  /** Estimated Jaccard for candidate pairs (a, b) given signatures. */
  def estimate(pairs: DataFrame, sigs: DataFrame): DataFrame = {
    val sa = sigs.select(col("doc_id").as("a"), col("sig").as("sig_a"))
    val sb = sigs.select(col("doc_id").as("b"), col("sig").as("sig_b"))
    pairs.join(sa, Seq("a")).join(sb, Seq("b"))
      .withColumn("est_jaccard",
        aggregate(
          zip_with(col("sig_a"), col("sig_b"),
            (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, x) => acc + x)
          .cast("double") / size(col("sig_a")))
      .select(col("a"), col("b"), col("est_jaccard"))
  }
}
