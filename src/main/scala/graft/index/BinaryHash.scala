package graft.index

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Kernels

/** LSH / binary-code index (`Auncel/IndexLSH.cpp`, `IndexBinaryFlat` +
  * Hamming kernels `hamming.cpp`): random-hyperplane signatures packed
  * into a LONG column; search is Hamming distance = `bit_count(xor)` —
  * a fully codegen'd integer pipeline, no floats touched at scan time.
  * 64 bits per vector is a 32× scan-size reduction over d=64 floats.
  */
object BinaryHash {

  final case class LSHModel(planes: Array[Array[Float]]) extends Serializable {
    val nbits: Int = planes.length
    // flattened TRANSPOSED planes (planesT(i·nbits + b) = planes(b)(i)),
    // built lazily once per JVM/executor after broadcast: signature()
    // walks the vector ONCE with a sequential inner loop over bits —
    // unit-stride loads the JIT can vectorize — instead of nbits
    // separate plane-array walks (nbits pointer chases + d·nbits
    // strided loads per row). Per-bit accumulation order (i ascending,
    // float product widened into a double sum) is exactly Kernels.dot's,
    // so every dot — and every sign — is bit-identical.
    @transient private lazy val d0: Int =
      if (nbits == 0) 0 else planes(0).length
    @transient private lazy val planesT: Array[Float] = {
      val t = new Array[Float](d0 * nbits)
      var b = 0
      while (b < nbits) {
        val p = planes(b)
        var i = 0
        while (i < d0) { t(i * nbits + b) = p(i); i += 1 }
        b += 1
      }
      t
    }
    def signature(v: Array[Float]): Long = {
      val acc = new Array[Double](nbits)
      val t = planesT
      var i = 0
      while (i < d0) {
        val vi = v(i)
        val base = i * nbits
        var b = 0
        while (b < nbits) { acc(b) += t(base + b) * vi; b += 1 }
        i += 1
      }
      var sig = 0L
      var b = 0
      while (b < nbits) {
        if (acc(b) >= 0) sig |= (1L << b)
        b += 1
      }
      sig
    }
  }

  /** Seeded Gaussian hyperplanes (≤ 63 bits to stay in a signed LONG). */
  def train(d: Int, nbits: Int = 63, seed: Long = 42L): LSHModel = {
    require(nbits <= 63, "signatures are packed in a signed LONG")
    val rnd = new scala.util.Random(seed)
    LSHModel(Array.fill(nbits)(Array.fill(d)(rnd.nextGaussian().toFloat)))
  }

  /** Arbitrary-width binary codes (`Auncel/IndexBinaryFlat.h:21`,
    * `hamming.cpp`): signatures packed 64 bits per LONG word in an
    * ARRAY<LONG> column; Hamming distance = per-word xor popcount sum. */
  final case class WideLSHModel(planes: Array[Array[Float]]) extends Serializable {
    val nbits: Int = planes.length
    val nWords: Int = (nbits + 63) / 64
    // same transposed-flat layout + loop interchange as [[LSHModel]];
    // per-bit double sums bit-identical to the per-plane form
    @transient private lazy val d0: Int =
      if (nbits == 0) 0 else planes(0).length
    @transient private lazy val planesT: Array[Float] = {
      val t = new Array[Float](d0 * nbits)
      var b = 0
      while (b < nbits) {
        val p = planes(b)
        var i = 0
        while (i < d0) { t(i * nbits + b) = p(i); i += 1 }
        b += 1
      }
      t
    }
    def signature(v: Array[Float]): Array[Long] = {
      val acc = new Array[Double](nbits)
      val t = planesT
      var i = 0
      while (i < d0) {
        val vi = v(i)
        val base = i * nbits
        var b = 0
        while (b < nbits) { acc(b) += t(base + b) * vi; b += 1 }
        i += 1
      }
      val sig = new Array[Long](nWords)
      var b = 0
      while (b < nbits) {
        if (acc(b) >= 0) sig(b >> 6) |= (1L << (b & 63))
        b += 1
      }
      sig
    }
  }

  def trainWide(d: Int, nbits: Int, seed: Long = 42L): WideLSHModel = {
    val rnd = new scala.util.Random(seed)
    WideLSHModel(Array.fill(nbits)(Array.fill(d)(rnd.nextGaussian().toFloat)))
  }

  def encodeWide(df: DataFrame, model: WideLSHModel,
                 vecCol: String = "vec"): DataFrame = {
    val bm = df.sparkSession.sparkContext.broadcast(model)
    val u = udf { v: Seq[Float] => bm.value.signature(v.toArray) }
    df.withColumn("sig", u(col(vecCol)))
  }

  def hammingWide(a: Array[Long], b: Array[Long]): Int = {
    var s = 0; var i = 0
    while (i < a.length) { s += java.lang.Long.bitCount(a(i) ^ b(i)); i += 1 }
    s
  }

  /** Wide twin of [[knnHammingLarge]]: codegen'd per-word xor popcount
    * ([[org.apache.spark.sql.graft.VectorExpressions.hammingWide]],
    * bit-identical to [[hammingWide]]) over the block-cartesian, no
    * driver-side query collect. */
  def knnHammingWideLarge(sigs: DataFrame, querySigs: DataFrame,
                          k: Int): DataFrame = {
    import org.apache.spark.sql.graft.VectorExpressions
    val scored = sigs.select(col("id").cast("long").as("id"), col("sig"))
      .crossJoin(querySigs.select(col("qid").cast("long").as("qid"),
        col("sig").as("qsig")))
      .select(col("qid"), col("id"),
        VectorExpressions.hammingWide(col("sig"), col("qsig"))
          .cast("double").as("dist"))
    graft.search.FlatSearch.mergeTopK(
      graft.search.FlatSearch.partialTopK(scored, k), k)
  }

  /** Hamming k-NN over multi-word signatures — same bounded partial-heap
    * shape as [[knnHamming]]; >131k-query batches route to
    * [[knnHammingWideLarge]] via the same LIMIT-bounded guard. */
  def knnHammingWide(sigs: DataFrame, querySigs: DataFrame, k: Int): DataFrame = {
    val spark = sigs.sparkSession
    import spark.implicits._
    val qRaw: Array[(Long, Array[Long])] = querySigs
      .select(col("qid").cast("long"), col("sig"))
      .limit(DistributedMinQueries + 1)
      .as[(Long, Array[Long])].collect()
    if (qRaw.length > DistributedMinQueries)
      return knnHammingWideLarge(sigs, querySigs, k)
    val q = qRaw.sortBy(_._1)
    val bq = spark.sparkContext.broadcast(q)
    val partials = sigs.select(col("id").cast("long"), col("sig"))
      .as[(Long, Array[Long])]
      .mapPartitions { it =>
        val qs = bq.value
        val heaps = qs.map(_ => new graft.operators.TopK(k))
        it.foreach { case (id, sig) =>
          var i = 0
          while (i < qs.length) {
            heaps(i).add(hammingWide(sig, qs(i)._2).toDouble, id)
            i += 1
          }
        }
        heaps.iterator.zipWithIndex.flatMap { case (h, i) =>
          h.sorted.iterator.map { case (d, id) => (qs(i)._1, id, d) }
        }
      }.toDF("qid", "id", "dist")
    graft.search.FlatSearch.mergeTopK(partials, k)
  }

  /** `Auncel/IndexBinaryIVF.cpp` — IVF-bucketed binary codes: vectors
    * are coarse-quantized by the float k-means (the reference trains
    * its coarse quantizer from floats via `IndexBinaryFromFloat`),
    * signatures are stored partitioned by inverted list, and search
    * Hamming-scans ONLY the nprobe probed lists — sub-linear binary
    * search: list-pruned IO plus an integer xor/popcount scan, the
    * 100 TB shape for binary codes. Input is the IVF-assigned table
    * (id, vec, list_no); output drops the floats. */
  def encodeIvf(assigned: DataFrame, model: WideLSHModel): DataFrame =
    encodeWide(assigned, model).select(col("id"), col("list_no"), col("sig"))

  /** Hamming k-NN over the probed lists — the shared probed-list scan
    * ([[graft.search.IVFSearch.probedTopK]]: metric-correct rankTop
    * coarse ranking, partition pruning, per-partition bounded heaps)
    * scored by wide Hamming against the broadcast query signatures.
    * At nprobe = nlist this equals the flat wide scan exactly (same
    * distances, same id tie-break). */
  def knnHammingIvf(encoded: DataFrame, ivf: IVFModel, model: WideLSHModel,
                    queries: DataFrame, k: Int, nprobe: Int): DataFrame = {
    val spark = encoded.sparkSession
    import spark.implicits._
    val q = queries.select(col("qid").cast("long"), col("vec"))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    val bq = spark.sparkContext.broadcast(q.map { case (_, v) => model.signature(v) })
    graft.search.IVFSearch.probedTopK[Array[Long]](encoded,
      df => df.select(col("list_no").cast("int"), col("id").cast("long"),
        col("sig")).as[(Int, Long, Array[Long])],
      ivf, q, k, nprobe,
      () => (qi, _, sig) => hammingWide(sig, bq.value(qi)).toDouble)
  }

  def encode(df: DataFrame, model: LSHModel, vecCol: String = "vec"): DataFrame = {
    val bm = df.sparkSession.sparkContext.broadcast(model)
    val u = udf { v: Seq[Float] => bm.value.signature(v.toArray) }
    df.withColumn("sig", u(col(vecCol)))
  }

  /** The reference's driver contract bound (`Auncel/dist/worker.cpp`
    * holds query batches in RAM) — past it, [[knnHammingLarge]] keeps
    * the query signatures in a DataFrame end-to-end
    * ([[graft.GraftConf.distributedMinQueries]]). */
  private def DistributedMinQueries = graft.GraftConf.distributedMinQueries

  /** Query-DataFrame-resident Hamming k-NN for batches past the driver
    * contract: block-cartesian of signatures × query signatures scored
    * by the codegen'd `bit_count(xor)` integer pipeline, per-task
    * bounded-heap combine ([[graft.search.FlatSearch.partialTopK]]).
    * No driver-side query collect anywhere. */
  def knnHammingLarge(sigs: DataFrame, querySigs: DataFrame, k: Int): DataFrame = {
    val scored = sigs.select(col("id").cast("long").as("id"),
        col("sig").cast("long").as("sig"))
      .crossJoin(querySigs.select(col("qid").cast("long").as("qid"),
        col("sig").cast("long").as("qsig")))
      .select(col("qid"), col("id"),
        bit_count(col("sig").bitwiseXOR(col("qsig"))).cast("double").as("dist"))
    graft.search.FlatSearch.mergeTopK(
      graft.search.FlatSearch.partialTopK(scored, k), k)
  }

  /** Hamming k-NN over signatures — broadcast query signatures, integer
    * xor/popcount scan with per-partition bounded heaps: the shuffle
    * carries parts × nq × k candidate rows, never N × nq. Batches past
    * the driver contract route to [[knnHammingLarge]] (the collect is
    * LIMIT-bounded, so routing itself never materializes nq rows). */
  def knnHamming(sigs: DataFrame, querySigs: DataFrame, k: Int): DataFrame = {
    val spark = sigs.sparkSession
    import spark.implicits._
    val qRaw: Array[(Long, Long)] = querySigs
      .select(col("qid").cast("long"), col("sig").cast("long"))
      .limit(DistributedMinQueries + 1)
      .as[(Long, Long)].collect()
    if (qRaw.length > DistributedMinQueries)
      return knnHammingLarge(sigs, querySigs, k)
    knnHammingLocal(sigs, qRaw.sortBy(_._1), k)
  }

  /** Broadcast-scan core over an already-collected query batch — shared
    * by [[knnHamming]] and [[search]] (which feeds the SAME one collect
    * into both the signature scan and the exact rescore). */
  private def knnHammingLocal(sigs: DataFrame, q: Array[(Long, Long)],
                              k: Int): DataFrame = {
    val spark = sigs.sparkSession
    import spark.implicits._
    val bq = spark.sparkContext.broadcast(q)
    val partials = sigs.select(col("id").cast("long"), col("sig").cast("long"))
      .as[(Long, Long)]
      .mapPartitions { it =>
        val qs = bq.value
        val heaps = qs.map(_ => new graft.operators.TopK(k))
        it.foreach { case (id, sig) =>
          var i = 0
          while (i < qs.length) {
            heaps(i).add(java.lang.Long.bitCount(sig ^ qs(i)._2).toDouble, id)
            i += 1
          }
        }
        heaps.iterator.zipWithIndex.flatMap { case (h, i) =>
          h.sorted.iterator.map { case (d, id) => (qs(i)._1, id, d) }
        }
      }.toDF("qid", "id", "dist")
    graft.search.FlatSearch.mergeTopK(partials, k)
  }

  /** End-to-end: encode base + queries, Hamming search, then exact
    * rerank of the top k·kFactor candidates (the standard LSH recipe).
    * ONE driver collect of the query batch feeds both the signature
    * scan (signed driver-side via the model) and the exact-rescore
    * broadcast map. */
  def search(base: DataFrame, queries: DataFrame, model: LSHModel, k: Int,
             kFactor: Int = 4, metric: String = "l2"): DataFrame = {
    val spark = base.sparkSession
    import spark.implicits._
    val q: Array[(Long, Array[Float])] = queries
      .select(col("qid").cast("long"), col("vec"))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    val qSigs = q.map { case (qid, v) => (qid, model.signature(v)) }
    val cand = knnHammingLocal(
      encode(base, model).select(col("id"), col("sig")), qSigs,
      k * kFactor).select(col("qid"), col("id"))
    val bq = spark.sparkContext.broadcast(q.toMap)
    val m = metric
    val exactU = udf { (qid: Long, v: Seq[Float]) =>
      Kernels.distance(m, bq.value(qid), v.toArray)
    }
    val rescored = cand.join(base.select(col("id"), col("vec")), Seq("id"))
      .withColumn("dist", exactU(col("qid"), col("vec")))
      .select(col("qid"), col("id"), col("dist"))
    graft.search.FlatSearch.mergeTopK(rescored, k)
  }
}
