package graft.quantize

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Kernels
import graft.operators.TopK

/** Polysemous codes (Douze, Jégou & Perronnin, ECCV 2016; the
  * reference's `PolysemousTraining.cpp` + the polysemous search path in
  * `IndexPQ.cpp`): reorder each sub-quantizer's codebook so that the
  * HAMMING distance between code words approximates the distance
  * between their centroids. The codes then serve double duty — a cheap
  * per-code Hamming test against the query's own code prunes most
  * candidates before the (more expensive) distance evaluation, and the
  * surviving codes are ranked by the usual PQ distance.
  *
  * Training is seeded simulated annealing over code permutations,
  * re-derived from the paper's objective (squared error between
  * nbits-normalized pairwise Hamming and range-normalized centroid
  * distance), not transcribed from the reference. It runs on the
  * driver: the state is one ksub² distance table per sub-quantizer
  * (256² floats = 256 KiB) — model-sized, like all codebook training
  * here. Encoding and search remain fully distributed.
  */
object Polysemous {

  /** Per-byte Hamming distance between two PQ codes (nbits = 8). */
  def hamming(a: Array[Byte], b: Array[Byte]): Int = {
    var h = 0; var i = 0
    while (i < a.length) {
      h += java.lang.Integer.bitCount((a(i) ^ b(i)) & 0xff); i += 1
    }
    h
  }

  /** Pairwise objective for one sub-quantizer under a permutation:
    * Σ_{p<q} (hamming(p,q)/nbits − d(book(perm(p)), book(perm(q)))/dmax)².
    * Exposed so the spec can assert training lowers it. */
  def objective(pq: PQModel, sub: Int, perm: Array[Int]): Double = {
    val (hn, dn) = tables(pq, sub)
    var loss = 0.0
    var p = 0
    while (p < perm.length) {
      var q = p + 1
      while (q < perm.length) {
        val e = hn(p)(q) - dn(perm(p))(perm(q))
        loss += e * e
        q += 1
      }
      p += 1
    }
    loss
  }

  /** (normalized Hamming between positions, normalized centroid
    * distance between codes) for one sub-quantizer. */
  private def tables(pq: PQModel, sub: Int): (Array[Array[Double]], Array[Array[Double]]) = {
    val k = pq.ksub
    val hn = Array.tabulate(k, k)((p, q) =>
      java.lang.Integer.bitCount(p ^ q).toDouble / pq.nbits)
    val d = Array.tabulate(k, k)((i, j) =>
      Kernels.l2Sqr(pq.codebooks(sub)(i), pq.codebooks(sub)(j)))
    val dmax = d.iterator.flatten.max
    val dn =
      if (dmax == 0.0) d
      else d.map(_.map(_ / dmax))
    (hn, dn)
  }

  /** Reorder each sub-quantizer's codebook (same centroid set — only
    * the code assigned to each centroid changes, so reconstruction and
    * ADC semantics are untouched) to minimize [[objective]] by seeded
    * simulated annealing over position swaps. */
  def train(pq: PQModel, nIter: Int = 60000, seed: Long = 42L): PQModel = {
    val books = Array.tabulate(pq.m) { sub =>
      val perm = annealSub(pq, sub, nIter, seed + sub)
      Array.tabulate(pq.ksub)(p => pq.codebooks(sub)(perm(p)))
    }
    PQModel(pq.m, pq.nbits, books)
  }

  private def annealSub(pq: PQModel, sub: Int, nIter: Int, seed: Long): Array[Int] = {
    val (hn, dn) = tables(pq, sub)
    val k = pq.ksub
    val rnd = new scala.util.Random(seed)
    val perm = Array.tabulate(k)(identity)

    // cost of position p against all other positions under `perm`
    def costAt(p: Int): Double = {
      var s = 0.0; var r = 0
      while (r < k) {
        if (r != p) { val e = hn(p)(r) - dn(perm(p))(perm(r)); s += e * e }
        r += 1
      }
      s
    }

    // geometric cooling; T0 sized to the typical per-position cost so
    // early iterations explore, late ones hill-climb
    val t0 = math.max(1e-9, costAt(0) / k) * 2.0
    val tEnd = t0 * 1e-3
    var it = 0
    while (it < nIter) {
      val p = rnd.nextInt(k)
      var q = rnd.nextInt(k)
      while (q == p) q = rnd.nextInt(k)
      val before = costAt(p) + costAt(q)
      val tp = perm(p); perm(p) = perm(q); perm(q) = tp
      // the (p,q) pair term is counted in both costAt(p) and costAt(q),
      // identically before and after, so the delta stays exact
      val after = costAt(p) + costAt(q)
      val delta = after - before
      val t = t0 * math.pow(tEnd / t0, it.toDouble / nIter)
      if (delta > 0 && rnd.nextDouble() >= math.exp(-delta / t)) {
        val tq = perm(p); perm(p) = perm(q); perm(q) = tq // revert
      }
      it += 1
    }
    perm
  }

  /** Histogram of code-Hamming distances over every (query, stored
    * code) pair in ONE distributed pass: hist(d) = #pairs at distance
    * d, 0 ≤ d ≤ m·nbits. Its CDF prices every candidate threshold at
    * once — Σ_{d≤ht} hist(d) / (N·nq) is the fraction of codes that
    * survive the filter at `ht` and pay the ADC evaluation — so an ht
    * sweep costs one scan, not one per threshold. */
  def hammingHistogram(codes: DataFrame, model: PQModel,
                       queries: DataFrame): Array[Long] = {
    val spark = codes.sparkSession
    import spark.implicits._
    val q = queries.select(col("qid").cast("long"), col("vec"))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    val bqCodes = spark.sparkContext.broadcast(q.map { case (_, v) => model.encode(v) })
    val bins = model.m * model.nbits + 1
    codes.select(col("code")).as[Array[Byte]]
      .mapPartitions { it =>
        val qCodes = bqCodes.value
        val h = new Array[Long](bins)
        it.foreach { code =>
          var i = 0
          while (i < qCodes.length) { h(hamming(qCodes(i), code)) += 1L; i += 1 }
        }
        Iterator.single(h)
      }.reduce((a, b) => Array.tabulate(bins)(i => a(i) + b(i)))
  }

  /** k-NN over polysemous codes: Hamming-filter each stored code
    * against the query's own code (≤ `ht` passes), then rank survivors
    * by the exact code distance ‖q − decode(code)‖² (≡ ADC: the
    * per-subspace sums telescope). Per-partition bounded heaps +
    * global top-k merge — the candidate generation never leaves the
    * partition, and only parts×nq×k rows shuffle. Queries that prune
    * everything return fewer than k rows, exactly like the reference's
    * polysemous path. */
  def knn(codes: DataFrame, model: PQModel, queries: DataFrame, k: Int,
          ht: Int): DataFrame = {
    val spark = codes.sparkSession
    import spark.implicits._
    val q = queries.select(col("qid").cast("long"), col("vec"))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    val bm = spark.sparkContext.broadcast(model)
    val bq = spark.sparkContext.broadcast(q)
    val bqCodes = spark.sparkContext.broadcast(q.map { case (_, v) => model.encode(v) })
    val threshold = ht
    val partials = codes.select(col("id").cast("long"), col("code"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val pq = bm.value
        val qs = bq.value
        val qCodes = bqCodes.value
        val heaps = qs.map(_ => new TopK(k))
        it.foreach { case (id, code) =>
          var i = 0
          var decoded: Array[Float] = null // decode at most once per row
          while (i < qs.length) {
            if (hamming(qCodes(i), code) <= threshold) {
              if (decoded == null) decoded = pq.decode(code)
              heaps(i).add(Kernels.l2Sqr(qs(i)._2, decoded), id)
            }
            i += 1
          }
        }
        heaps.iterator.zipWithIndex.flatMap { case (h, i) =>
          h.sorted.iterator.map { case (d, id) => (qs(i)._1, id, d) }
        }
      }.toDF("qid", "id", "dist")
    graft.search.FlatSearch.mergeTopK(partials, k)
  }
}
