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
    * queries/Documents). md5 hex + string min reproduce Spark's `md5`
    * and `min` exactly (lowercase hex; ASCII order ≡ UTF8 binary
    * order), so the batch/SQL oracles still match bit-for-bit. Docs
    * with fewer than 3 words yield a null-component signature (the
    * batch groupBy drops them instead); filter on
    * `sig[0] IS NOT NULL` to match. */
  def sigExpr(text: org.apache.spark.sql.Column,
              numHashes: Int): org.apache.spark.sql.Column = {
    val n = numHashes
    val u = udf { text: String =>
      // null text → null signature (filtered like short docs) rather
      // than an NPE that would kill a long-running streaming query
      val ws = if (text == null) Array.empty[String] else text.split(" ", -1)
      val mins = Array.fill[String](n)(null)
      if (ws.length >= 3) {
        val md = java.security.MessageDigest.getInstance("MD5")
        val hex = "0123456789abcdef".toCharArray
        val salts = Array.tabulate(n)(h => s"$h|")
        var i = 0
        while (i < ws.length - 2) {
          val sh = ws(i) + " " + ws(i + 1) + " " + ws(i + 2)
          var h = 0
          while (h < n) {
            md.reset()
            val dig = md.digest((salts(h) + sh)
              .getBytes(java.nio.charset.StandardCharsets.UTF_8))
            val cs = new Array[Char](32)
            var b = 0
            while (b < 16) {
              cs(b * 2) = hex((dig(b) >> 4) & 0xf)
              cs(b * 2 + 1) = hex(dig(b) & 0xf)
              b += 1
            }
            val hx = new String(cs)
            if (mins(h) == null || hx < mins(h)) mins(h) = hx
            h += 1
          }
          i += 1
        }
      }
      mins
    }
    u(text)
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
