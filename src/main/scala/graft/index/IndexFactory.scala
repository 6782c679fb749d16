package graft.index

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.quantize.{FP16Codec, ProductQuantizer, PQModel, ScalarCodec, ScalarQuantizer, ScalarVariants, SQ4, SQ6}
import graft.search.{FlatSearch, IVFSearch}
import graft.transforms._

/** The index-spec string DSL (`Auncel/AutoTune.cpp:741-960`):
  * `index_factory("PCA32,IVF64,Flat")`, `"L2norm,IVF256,PQ8"`,
  * `"IVF64,SQ8"`, `"IDMap,Flat"`, `"RR64,Flat"` … parsed into a
  * transform chain + coarse index + encoding, trained and searched
  * through one handle.
  *
  * Supported tokens: `PCA<d>` / `PCAW<d>` (whitened), `RR<d>` (random
  * rotation), `L2norm`, `Remap<d>`, `IDMap` (no-op — ids are explicit
  * columns here), coarse `IVF<nlist>` or `IMI2x<nbits>` (multi-index
  * quantizer) or flat, encodings `Flat`,
  * `PQ<M>`, `SQ8`; `FlatDedup` (IVF-only add-time deduplication,
  * `IndexIVFFlatDedup` via [[IVFDedup]]); `HNSW<M>` as the graph-index
  * alternative to IVF (partitioned build-at-search, `index.HNSW`);
  * `RFlat` (exact-rerank refinement over stored raw vectors,
  * `IndexRefineFlat`).
  */
object IndexFactory {

  sealed trait Encoding
  case object FlatEnc extends Encoding
  final case class PQEnc(m: Int) extends Encoding
  case object SQ8Enc extends Encoding
  case object SQ8UEnc extends Encoding
  case object SQ4Enc extends Encoding
  case object SQ4UEnc extends Encoding
  case object SQ6Enc extends Encoding
  case object FP16Enc extends Encoding

  final case class Spec(pre: Seq[PreTok], nlist: Option[Int], enc: Encoding,
                        hnswM: Option[Int] = None, refine: Boolean = false,
                        imiBits: Option[Int] = None, dedup: Boolean = false)
  sealed trait PreTok
  final case class OpqTok(m: Int) extends PreTok
  final case class PcaTok(d: Int, whiten: Boolean) extends PreTok
  final case class RrTok(d: Int) extends PreTok
  case object L2Tok extends PreTok
  final case class RemapTok(d: Int) extends PreTok

  def parse(spec: String): Spec = {
    var pre = Vector.empty[PreTok]
    var nlist: Option[Int] = None
    var enc: Option[Encoding] = None
    var hnswM: Option[Int] = None
    var refine = false
    var imiBits: Option[Int] = None
    var dedup = false
    val pcaW = "PCAW(\\d+)".r; val pca = "PCA(\\d+)".r; val rr = "RR(\\d+)".r
    val opq = "OPQ(\\d+)".r; val hnsw = "HNSW(\\d+)".r
    val ivf = "IVF(\\d+)".r; val pqp = "PQ(\\d+)".r; val remap = "Remap(\\d+)".r
    val imi = "IMI2x(\\d+)".r
    spec.split(",").map(_.trim).filter(_.nonEmpty).foreach {
      case pcaW(d)   => pre :+= PcaTok(d.toInt, whiten = true)
      case pca(d)    => pre :+= PcaTok(d.toInt, whiten = false)
      case rr(d)     => pre :+= RrTok(d.toInt)
      case opq(m)    => pre :+= OpqTok(m.toInt)
      case "L2norm"  => pre :+= L2Tok
      case remap(d)  => pre :+= RemapTok(d.toInt)
      case "IDMap" | "IDMap2" => // ids are explicit columns; nothing to do
      case ivf(n)    => nlist = Some(n.toInt)
      case imi(nb)   => imiBits = Some(nb.toInt) // MIQ coarse (IMI2x<nbits>)
      case hnsw(mm)  => hnswM = Some(mm.toInt)
      case "Flat"    => enc = Some(FlatEnc)
      case "FlatDedup" => enc = Some(FlatEnc); dedup = true // IndexIVFFlatDedup
      case pqp(m)    => enc = Some(PQEnc(m.toInt))
      case "SQ8"     => enc = Some(SQ8Enc)
      case "SQ8U"    => enc = Some(SQ8UEnc)
      case "SQ4"     => enc = Some(SQ4Enc)
      case "SQ4U"    => enc = Some(SQ4UEnc)
      case "SQ6"     => enc = Some(SQ6Enc)
      case "SQfp16"  => enc = Some(FP16Enc)
      case "RFlat"   => refine = true // IndexRefineFlat suffix (`AutoTune.cpp`)
      case tok => throw new IllegalArgumentException(
        s"index_factory: unsupported token '$tok' in '$spec'")
    }
    require(hnswM.isEmpty || (nlist.isEmpty && imiBits.isEmpty),
      "HNSW and IVF/IMI are alternative coarse structures")
    require(nlist.isEmpty || imiBits.isEmpty,
      "IVF<n> and IMI2x<b> are alternative coarse quantizers")
    // `AutoTune.cpp:831`: "Dedup supported only for IVFFlat" — reject
    // both a missing coarse quantizer and a later PQ/SQ token silently
    // overwriting the Flat encoding while dedup stays set
    require(!dedup || (nlist.nonEmpty && enc.contains(FlatEnc)),
      "Dedup supported only for IVFFlat (IVF<n>,FlatDedup)")
    Spec(pre, nlist, enc.getOrElse(FlatEnc), hnswM, refine, imiBits, dedup)
  }

  /** A trained index: transform chain + optional IVF coarse model +
    * optional code model, the encoded collection, and (for HNSW specs)
    * the built-once graph adjacency. */
  final case class GraftIndex(spec: Spec, chain: TransformChain,
                              ivf: Option[IVFModel], pq: Option[PQModel],
                              sq: Option[ScalarCodec], data: DataFrame,
                              graph: Option[DataFrame] = None,
                              raw: Option[DataFrame] = None,
                              instances: Option[DataFrame] = None) {

    def search(queries: DataFrame, k: Int, nprobe: Int = 8,
               kFactor: Int = 4): DataFrame = {
      val spark = queries.sparkSession
      import spark.implicits._
      val tq = {
        val bc = spark.sparkContext.broadcast(chain)
        val u = udf { v: Seq[Float] => bc.value.applyVec(v.toArray) }
        queries.withColumn("vec", u(col("vec")))
      }
      // RFlat: the codec path only generates candidates (k·kFactor),
      // the answer is an exact rerank against the stored raw vectors
      val kCand = if (spec.refine) k * kFactor else k
      val cands = spec.hnswM match {
        case Some(mm) =>
          val g = graph.getOrElse(HNSW.buildGraph(data, m = mm))
          HNSW.searchGraph(g, tq, kCand, efSearch = math.max(64, 4 * kCand))
        case None =>
          (ivf, pq, sq) match {
            case (Some(m), Some(p), _) => IVFPQ.search(data, m, p, tq, kCand, nprobe)
            case (Some(m), None, Some(s)) =>
              // SQ inside IVF: decode-scan the probed lists
              decodeScanIVF(m, s, tq, kCand, nprobe)
            case (Some(m), None, None) if spec.dedup =>
              IVFDedup.search(IVFDedup.DedupIndex(data, instances.get),
                m, tq, kCand, nprobe)
            case (Some(m), None, None) => IVFSearch.search(data, m, tq, kCand, nprobe)
            case (None, Some(p), _)    => ProductQuantizer.knnADC(data, p, tq, kCand)
            case (None, None, Some(s)) => ScalarQuantizer.knn(data, s, tq, kCand)
            case (None, None, None)    => FlatSearch.knn(data, tq, kCand)
          }
      }
      if (!spec.refine) cands else rerankExact(cands, tq, k)
    }

    /** `IndexRefineFlat` (the factory's `RFlat` suffix): rerank codec
      * candidates with exact L2 against the raw (chain-transformed)
      * vectors — a broadcast of the query block plus one equi-join on
      * id; candidate cardinality is queries × k·kFactor, never N. */
    private def rerankExact(cands: DataFrame, tq: DataFrame, k: Int): DataFrame = {
      val spark = cands.sparkSession
      import spark.implicits._
      val rawData = raw.getOrElse(throw new IllegalStateException(
        "RFlat spec built without raw vectors"))
      val q = tq.select(col("qid").cast("long"), col("vec"))
        .as[(Long, Array[Float])].collect().toMap
      val bq = spark.sparkContext.broadcast(q)
      val exactU = udf { (qid: Long, v: Seq[Float]) =>
        graft.functions.Kernels.l2Sqr(bq.value(qid), v.toArray)
      }
      val rescored = cands.select(col("qid"), col("id"))
        .join(rawData.select(col("id"), col("vec")), Seq("id"))
        .withColumn("dist", exactU(col("qid"), col("vec")))
        .select(col("qid"), col("id"), col("dist"))
      FlatSearch.mergeTopK(rescored, k)
    }

    private def decodeScanIVF(m: IVFModel, s: ScalarCodec, tq: DataFrame,
                              k: Int, nprobe: Int): DataFrame = {
      val spark = data.sparkSession
      val bs = spark.sparkContext.broadcast(s)
      val dec = udf { code: Array[Byte] => bs.value.decode(code) }
      val decoded = data.withColumn("vec", dec(col("code")))
      IVFSearch.search(decoded, m, tq, k, nprobe)
    }
  }

  /** Train everything the spec needs and encode the collection.
    * @param df (id, vec) */
  def build(spec: String, df: DataFrame, metric: String = "l2",
            seed: Long = 42L): GraftIndex = {
    val s = parse(spec)
    import df.sparkSession.implicits._
    val dIn = df.select(size(col("vec"))).as[Int].head()
    // fit the transform chain left-to-right
    var dim = dIn
    var cur = df
    val fitted = s.pre.map { tok =>
      val t: VecTransform = tok match {
        case OpqTok(m)    => OPQTransform.fit(cur, m, seed = seed)
        case PcaTok(d, w) => PCATransform.fit(cur, d, w)
        case RrTok(d)     => LinearTransform.randomRotation(d, seed)
        case L2Tok        => L2NormTransform
        case RemapTok(d)  => RemapTransform(d)
      }
      cur = t.apply(cur); dim = t.outDim(dim)
      t
    }
    val chain = TransformChain(fitted)

    // IMI2x<b>: the MIQ composite table is a plain IVFModel, so every
    // downstream pairing (Flat scan, residual PQ, SQ decode-scan) and
    // the persistence layer work unchanged.
    val ivfModel = s.imiBits
      .map { nb =>
        require(metric == "l2", "IMI coarse quantization is L2-only")
        IMI.train(cur, nb, seed).toIVFModel
      }
      .orElse(s.nlist.map { n =>
        // FlatDedup also dedups the training set (`IndexIVFFlat.cpp:258-275`)
        val trainSet = if (s.dedup) cur.dropDuplicates("vec") else cur
        IVFIndex.train(trainSet, n, metric, seed)
      })
    val assigned = ivfModel.map(m => IVFIndex.assign(cur, m)).getOrElse(cur)
    // RFlat keeps the chain-transformed raw vectors beside the codes —
    // the reference's IndexRefineFlat stores the same flat copy
    val rawKeep =
      if (s.refine) Some(assigned.select(col("id"), col("vec")).cache())
      else None

    /** HNSW over a compressed codec (IndexHNSWSQ / IndexHNSWPQ,
      * `Auncel/IndexHNSW.h:116-150`): the graph lives in the codec's
      * decoded space — distances at build and search time go through
      * the quantizer, exactly like the reference's storage-backed
      * distance computers. */
    def codecGraphF(roundTrip: Array[Float] => Array[Float]): Option[DataFrame] =
      s.hnswM.map { mm =>
        val bc = assigned.sparkSession.sparkContext.broadcast(roundTrip)
        val decU = udf { v: Seq[Float] => bc.value(v.toArray) }
        val dec = assigned.select(col("id"), decU(col("vec")).as("vec"))
        val g = HNSW.buildGraph(dec, m = mm).cache(); g.count(); g
      }
    def codecGraph(codec: ScalarCodec): Option[DataFrame] =
      codecGraphF(v => codec.decode(codec.encode(v)))

    s.enc match {
      case FlatEnc if s.dedup =>
        val idx = IVFDedup.fromAssigned(assigned)
        GraftIndex(s, chain, ivfModel, None, None, idx.unique.cache(),
          raw = rawKeep, instances = Some(idx.instances.cache()))
      case FlatEnc =>
        val graph = s.hnswM.map { mm =>
          val g = HNSW.buildGraph(assigned, m = mm).cache(); g.count(); g
        }
        GraftIndex(s, chain, ivfModel, None, None, assigned.cache(), graph, rawKeep)
      case PQEnc(m) =>
        ivfModel match {
          case Some(im) => // parse forbids HNSW+IVF, so no graph here
            val pq = IVFPQ.trainResidualPQ(assigned, im, m, seed = seed)
            GraftIndex(s, chain, ivfModel, Some(pq), None,
              IVFPQ.encode(assigned, im, pq).drop("vec").cache(), raw = rawKeep)
          case None =>
            // IndexHNSWPQ (`Auncel/IndexHNSW.h:131-140`): the graph
            // lives in the PQ-decoded space, like the SQ family —
            // without it, HNSW×PQ specs crashed at search time on the
            // vec-less code table
            val pq = ProductQuantizer.train(assigned, m, seed = seed)
            GraftIndex(s, chain, None, Some(pq), None,
              ProductQuantizer.encode(assigned, pq).drop("vec").cache(),
              codecGraphF(v => pq.decode(pq.encode(v))), rawKeep)
        }
      case SQ8Enc | SQ8UEnc =>
        val sq = ScalarQuantizer.train(assigned, uniform = s.enc == SQ8UEnc)
        GraftIndex(s, chain, ivfModel, None, Some(sq),
          ScalarQuantizer.encode(assigned, sq).drop("vec").cache(),
          codecGraph(sq), rawKeep)
      case SQ4Enc | SQ4UEnc =>
        val sq = SQ4.train(assigned, uniform = s.enc == SQ4UEnc)
        GraftIndex(s, chain, ivfModel, None, Some(sq),
          ScalarVariants.encode(assigned, sq).drop("vec").cache(),
          codecGraph(sq), rawKeep)
      case SQ6Enc =>
        val sq = SQ6.train(assigned)
        GraftIndex(s, chain, ivfModel, None, Some(sq),
          ScalarVariants.encode(assigned, sq).drop("vec").cache(),
          codecGraph(sq), rawKeep)
      case FP16Enc =>
        val codec = FP16Codec(dim)
        GraftIndex(s, chain, ivfModel, None, Some(codec),
          ScalarVariants.encode(assigned, codec).drop("vec").cache(),
          codecGraph(codec), rawKeep)
    }
  }
}
