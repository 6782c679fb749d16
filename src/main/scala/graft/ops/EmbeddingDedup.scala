package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{Kernels, VectorFunctions}
import graft.index.BinaryHash
import graft.operators.TopK

/** Embedding-cosine near-duplicate detection, three regimes:
  *
  *  - [[exactPairs]]: all-pairs cosine ≥ threshold as one declarative
  *    join — the small-data / verification-oracle form;
  *  - [[exactPairTopK]]: exact top-k pairs via block-partitioned pair
  *    enumeration — rows are bucketed into B blocks, each of the
  *    B(B+1)/2 block-pairs is one bounded task holding exactly two
  *    blocks; no driver collect and no full-collection broadcast, so
  *    the O(N²) compute is spread over tasks with O(N/B·d) memory
  *    each (the classic distributed all-pairs layout);
  *  - [[lshPairs]]: the 100 TB thresholded path — random-hyperplane
  *    signatures, banded equi-join for candidates (near-identical
  *    vectors agree on most sign bits → share a band), exact cosine
  *    only on candidate id pairs. Cost: O(N·bands) + O(candidates),
  *    never O(N²).
  */
object EmbeddingDedup {

  def exactPairs(df: DataFrame, threshold: Double): DataFrame = {
    val a = df.select(col("id").as("a"), col("vec").as("va"))
    val b = df.select(col("id").as("b"), col("vec").as("vb"))
    a.join(b, col("a") < col("b"))
      .withColumn("cos", VectorFunctions.cosine(col("va"), col("vb")))
      .filter(col("cos") >= threshold)
      .select(col("a"), col("b"), col("cos"))
  }

  /** Semantic near-dup via coarse-cluster bucketing — the SemDeDup
    * shape (Abbas et al. 2023: k-means the embeddings, look for
    * duplicates only WITHIN a cluster): pairs sharing a trained IVF
    * list with exact cosine ≥ threshold. `assigned` is an
    * IVFIndex.assign output (`id`, `vec`, `list_no`).
    *
    * Scale shape: the pair enumeration is an equi-join on `list_no` —
    * per-cluster quadratic work sharded across executors, never
    * corpus-quadratic, with task cost bounded by the largest list
    * exactly as IVF probe cost is. A corpus that is already
    * IVF-indexed for ANN gets semantic dedup from its existing layout
    * for one within-list join — no signatures, no extra passes
    * (contrast [[lshPairs]], which buckets by sign-bit bands and
    * needs no trained model). Near-identical vectors assign to the
    * same list (assignment is a deterministic argmin over centroid
    * distances), so recall on true duplicates is governed by the
    * clustering only at the threshold margin. */
  def ivfPairs(assigned: DataFrame, threshold: Double): DataFrame = {
    val a = assigned.select(col("list_no"), col("id").as("a"), col("vec").as("va"))
    val b = assigned.select(col("list_no"), col("id").as("b"), col("vec").as("vb"))
    a.join(b, Seq("list_no"))
      .filter(col("a") < col("b"))
      .withColumn("cos", VectorFunctions.cosine(col("va"), col("vb")))
      .filter(col("cos") >= threshold)
      .select(col("a"), col("b"), col("cos"))
  }

  /** Exact top-k most-similar pairs by cosine, distributed: each task
    * sees two row blocks and keeps a bounded pair heap; the global merge
    * is a k-row sort. Ties break on (a, b) ascending. Ids must fit in
    * 32/31 bits (packed for the heap; checked).
    *
    * Shuffle volume is N×B rows; per-task memory two blocks — pick
    * `nBlocks` so a block (≈N/B vectors) fits an executor core.
    */
  def exactPairTopK(df: DataFrame, k: Int, nBlocks: Int = 8): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bCount = nBlocks
    val replicated = df.select(col("id").cast("long"), col("vec"))
      .as[(Long, Array[Float])]
      .flatMap { case (id, v) =>
        require(id >= 0 && id < (1L << 31), s"pair packing needs id < 2^31: $id")
        val blk = (id % bCount).toInt
        // one copy per block-pair task this row participates in
        (0 until bCount).iterator.map { o =>
          val lo = math.min(blk, o); val hi = math.max(blk, o)
          (lo * bCount + hi, blk, id, v)
        }
      }
    val partials = replicated
      .groupByKey(_._1)
      .flatMapGroups { (task: Int, it: Iterator[(Int, Int, Long, Array[Float])]) =>
        val i = task / bCount; val j = task % bCount
        // two bounded blocks (the memory contract of this operator)
        val left = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Float], Double)]
        val right = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Float], Double)]
        it.foreach { case (_, blk, id, v) =>
          val row = (id, v, Kernels.norm(v))
          if (blk == i) left += row else right += row
        }
        val heap = new TopK(k) // key = -cos, id = (a << 32) | b
        def consider(x: (Long, Array[Float], Double), y: (Long, Array[Float], Double)): Unit = {
          val (a, b) = if (x._1 < y._1) (x, y) else (y, x)
          val cos = Kernels.dot(a._2, b._2) / (a._3 * b._3)
          heap.add(-cos, (a._1 << 32) | b._1)
        }
        if (i == j) {
          var p = 0
          while (p < left.length) {
            var q = p + 1
            while (q < left.length) { consider(left(p), left(q)); q += 1 }
            p += 1
          }
        } else {
          var p = 0
          while (p < left.length) {
            var q = 0
            while (q < right.length) { consider(left(p), right(q)); q += 1 }
            p += 1
          }
        }
        heap.sorted.iterator.map { case (negCos, packed) =>
          (packed >>> 32, packed & 0xffffffffL, -negCos)
        }
      }
      .toDF("a", "b", "cos")
    partials.orderBy(col("cos").desc, col("a"), col("b")).limit(k)
  }

  /** Exact-duplicate pairs — bit-identical vectors — via ONE shuffle
    * keyed on `xxhash64(vec)` (8 bytes) with a bit-exact in-bucket
    * recheck, the [[graft.index.IVFDedup]] build trick. This is the
    * production pre-pass in front of [[lshPairs]]: it guarantees
    * recall 1.0 on identical vectors REGARDLESS of local density, so
    * the banded join is free to cap its degenerate buckets (see the
    * `maxBucket` contract there).
    *
    * Emits STAR-shaped pairs — (min-id representative → each duplicate,
    * `a < b`, cos 1.0), the [[graft.index.IVFDedup]] instances-table
    * shape: a group of m duplicates costs m−1 rows, so a dead/zero
    * embedding repeated 10⁵+ times (common in real corpora) cannot
    * reintroduce the quadratic pair blowup the banded path's
    * `maxBucket` cap exists to prevent. The full within-group pair set
    * is the star's transitive closure if a caller ever needs it. Task
    * memory per hash bucket: one representative vector + an id buffer
    * per DISTINCT vector, never the bucket's full vector set. */
  def exactDupPairs(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("id").cast("long"), col("vec"))
      .withColumn("vh", xxhash64(col("vec")))
      .as[(Long, Array[Float], Long)]
      .groupByKey(_._3)
      .flatMapGroups { (_: Long, it: Iterator[(Long, Array[Float], Long)]) =>
        val groups = scala.collection.mutable.LinkedHashMap
          .empty[scala.collection.immutable.ArraySeq[Int],
                 scala.collection.mutable.ArrayBuffer[Long]]
        it.foreach { case (id, v, _) =>
          val key = scala.collection.immutable.ArraySeq
            .unsafeWrapArray(v.map(java.lang.Float.floatToRawIntBits))
          groups.getOrElseUpdate(key,
            scala.collection.mutable.ArrayBuffer.empty[Long]) += id
        }
        groups.valuesIterator.filter(_.length > 1).flatMap { ids =>
          val sorted = ids.sorted
          val rep = sorted.head
          sorted.iterator.drop(1).map(dup => (rep, dup, 1.0))
        }
      }.toDF("a", "b", "cos")
  }

  /** @param nBands bands over the 63-bit signature; a candidate pair
    *               must agree exactly on ≥1 band (9 bits for 7 bands).
    *               More bands → higher recall at lower thresholds.
    * @param maxBucket band buckets larger than this are DROPPED from
    *               candidate generation. A bucket of size B costs B²
    *               join rows, so one degenerate key (all of a tight
    *               cluster sharing a band value) turns the banded plan
    *               into all-pairs — at 10M rows that is billions of
    *               candidates and a filled disk (observed, r5 scale
    *               rehearsal). An oversized bucket means the band
    *               carries no selectivity there anyway; pairs whose
    *               EVERY agreeing band is oversized lose their LSH
    *               candidacy — run [[exactDupPairs]] first for the
    *               identical-vector guarantee (the standard
    *               exact-pass-then-LSH pipeline).
    *
    * Only (band, key, id) rows travel through the candidate shuffle and
    * the distinct; vectors are re-joined once per surviving pair and
    * scored with the codegen'd cosine. */
  def lshPairs(df: DataFrame, model: BinaryHash.LSHModel, threshold: Double,
               nBands: Int = 7, maxBucket: Int = 8192): DataFrame = {
    // cache: each band branch and each of the tail's three consumers
    // (bucket-size agg, both join sides) would otherwise re-run the
    // signature projection — ~3·nBands encode passes of the corpus
    val sigs = BinaryHash.encode(df, model).select(col("id"), col("sig"))
      .cache()
    val width = 63 / nBands
    val mask = (1L << width) - 1
    val bands = (0 until nBands).map { b =>
      sigs.select(col("id"), lit(b).as("band"),
        shiftright(col("sig"), b * width).bitwiseAND(mask).as("key"))
    }.reduce(_ unionByName _)
    bandedPairs(df, bands, sigs, threshold, maxBucket, "lshPairs")
  }

  /** Banded near-dup over WIDE signatures (`BinaryHash.WideLSHModel`,
    * ARRAY<LONG>) — the 10M+-row form of [[lshPairs]]. The 63-bit model
    * caps bands at 9 bits = 512 keys: at 10M rows even uniform data
    * puts ~20k ids in every bucket and the banded join degenerates to
    * all-pairs (measured: >80 GB of candidate shuffle at 10M). Wide
    * bands (nbits/nBands, e.g. 128/4 = 32 bits → 4G-key space) keep
    * buckets at collision-survivor size, so candidates ∝ genuine
    * near-dup density. Identical vectors agree on every band by
    * construction; run [[exactDupPairs]] first anyway for the
    * density-independent guarantee.
    *
    * `bandBits = nbits / nBands` must divide 64 (16/32/64) so a band
    * never straddles signature words. */
  def lshPairsWide(df: DataFrame, model: BinaryHash.WideLSHModel,
                   threshold: Double, nBands: Int = 4,
                   maxBucket: Int = 8192): DataFrame = {
    val width = model.nbits / nBands
    require(width > 0 && 64 % width == 0,
      s"band width $width (=${model.nbits}/$nBands) must divide 64")
    val perWord = 64 / width
    val mask = if (width == 64) -1L else (1L << width) - 1
    val sigs = BinaryHash.encodeWide(df, model).select(col("id"), col("sig"))
      .cache() // same 3·nBands re-encode reasoning as lshPairs
    val bands = (0 until nBands).map { b =>
      val word = b / perWord
      val off = (b % perWord) * width
      sigs.select(col("id"), lit(b).as("band"),
        shiftright(element_at(col("sig"), word + 1), off)
          .bitwiseAND(mask).as("key"))
    }.reduce(_ unionByName _)
    bandedPairs(df, bands, sigs, threshold, maxBucket, "lshPairsWide")
  }

  /** Shared banded tail: bucket-size filter → band equi-join →
    * id-distinct → exact-cosine rerank. The `maxBucket` drop is NOT
    * silent: oversized buckets (and the id rows inside them) are
    * counted and logged before candidate generation, so a run whose
    * recall semantics changed — pairs whose every agreeing band was
    * oversized lose LSH candidacy — says so in its log.
    *
    * Oversized buckets are FEW by construction (each holds > maxBucket
    * rows, so ≤ N·bands/maxBucket exist), so their keys collect to the
    * driver and the filter is a broadcast ANTI-join — cheaper than
    * shuffling the bands frame against its own bucket-size aggregate,
    * and the discovery job doubles as the logged count. */
  private def bandedPairs(df: DataFrame, bands: DataFrame,
                          sigs: DataFrame, threshold: Double, maxBucket: Int,
                          what: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val oversized: Array[(Int, Long, Long)] = bands
      .groupBy(col("band"), col("key"))
      .agg(count(lit(1)).as("bsize"))
      .filter(col("bsize") > maxBucket)
      .select(col("band").cast("int"), col("key").cast("long"),
        col("bsize").cast("long"))
      .as[(Int, Long, Long)].collect()
    val kept = if (oversized.isEmpty) bands else {
      log.warn(s"$what: dropping ${oversized.length} oversized band " +
        s"buckets (${oversized.map(_._3).sum} id rows, " +
        s"maxBucket=$maxBucket) from candidate generation; pairs whose " +
        "every agreeing band is oversized lose LSH candidacy — run " +
        "exactDupPairs first for the identical-vector guarantee")
      val keys = oversized.map { case (b, k2, _) => (b, k2) }.toSeq
        .toDF("band", "key")
      bands.join(broadcast(keys), Seq("band", "key"), "left_anti")
    }
    val x = kept.select(col("band"), col("key"), col("id").as("a"))
    val y = kept.select(col("band"), col("key"), col("id").as("b"))
    val cand = x.join(y, Seq("band", "key")).filter(col("a") < col("b"))
      .select(col("a"), col("b")).distinct()
    // materialize the (small) surviving-pair output, then RELEASE the
    // cached signature frame — long-lived sessions (bench's 3×3 passes,
    // repeated verify runs) otherwise accumulate a MEMORY_AND_DISK
    // entry per invocation until eviction pressure
    val out = rerank(df, cand, threshold).localCheckpoint(eager = true)
    sigs.unpersist()
    out
  }

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Exact-cosine rescoring of candidate id pairs: vectors join in once
    * per surviving pair, scored with the codegen'd cosine. */
  private def rerank(df: DataFrame, cand: DataFrame,
                     threshold: Double): DataFrame = {
    val va = df.select(col("id").as("a"), col("vec").as("va"))
    val vb = df.select(col("id").as("b"), col("vec").as("vb"))
    cand.join(va, Seq("a")).join(vb, Seq("b"))
      .withColumn("cos", VectorFunctions.cosine(col("va"), col("vb")))
      .filter(col("cos") >= threshold)
      .select(col("a"), col("b"), col("cos"))
  }
}
