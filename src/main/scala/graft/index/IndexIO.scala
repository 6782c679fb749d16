package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.quantize.{FP16Codec, PQModel, ScalarCodec, SQModel, SQ4Model, SQ6Model}
import graft.transforms._

/** Model persistence — the Spark form of the reference's
  * `write_index`/`read_index` (`Auncel/index_io.h:37-54`, impl
  * `index_io.cpp`): every trained artifact (PQ codebooks, SQ ranges,
  * LSH hyperplanes, linear transforms, whole factory-built indexes)
  * round-trips through small parquet "model tables", so a trained
  * index is reusable across sessions exactly like the reference's
  * on-disk indexes. IVFModel and HNSW adjacency have their own
  * save/load ([[IVFIndex.saveModel]], [[HNSW.writeGraph]]); this file
  * covers the rest and composes them for [[IndexFactory.GraftIndex]].
  */
object IndexIO {

  // ---- product quantizer: (sub, code, centroid) + nbits ----

  def savePQ(pq: PQModel, path: String, spark: SparkSession): Unit = {
    import spark.implicits._
    val rows = for {
      sub <- 0 until pq.m
      code <- 0 until pq.ksub
    } yield (sub, code, pq.codebooks(sub)(code), pq.nbits)
    rows.toDF("sub", "code", "centroid", "nbits")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def loadPQ(path: String, spark: SparkSession): PQModel = {
    import spark.implicits._
    val rows = spark.read.parquet(path)
      .select(col("sub"), col("code"), col("centroid"), col("nbits"))
      .as[(Int, Int, Array[Float], Int)].collect()
    val nbits = rows.head._4
    val m = rows.map(_._1).max + 1
    val ksub = 1 << nbits
    val books = Array.ofDim[Array[Float]](m, ksub)
    rows.foreach { case (sub, code, cent, _) => books(sub)(code) = cent }
    PQModel(m, nbits, books.map(_.toArray))
  }

  // ---- scalar codecs: (pos, vmin, vmax) ranges, or dim-only (fp16) ----

  def saveSQ(sq: SQModel, path: String, spark: SparkSession): Unit =
    saveRanges(sq.vmin, sq.vmax, path, spark)

  def loadSQ(path: String, spark: SparkSession): SQModel = {
    val (vmin, vmax) = loadRanges(path, spark)
    SQModel(vmin, vmax)
  }

  private def saveRanges(vmin: Array[Float], vmax: Array[Float], path: String,
                         spark: SparkSession): Unit = {
    import spark.implicits._
    vmin.indices.map(i => (i, vmin(i), vmax(i)))
      .toDF("pos", "vmin", "vmax")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  private def loadRanges(path: String, spark: SparkSession): (Array[Float], Array[Float]) = {
    import spark.implicits._
    val rows = spark.read.parquet(path)
      .select(col("pos"), col("vmin"), col("vmax"))
      .as[(Int, Float, Float)].collect().sortBy(_._1)
    (rows.map(_._2), rows.map(_._3))
  }

  /** Which scalar codec a [[ScalarCodec]] instance is, for manifests. */
  private def sqKind(c: ScalarCodec): String = c match {
    case _: SQModel   => "sq8"
    case _: SQ4Model  => "sq4"
    case _: SQ6Model  => "sq6"
    case _: FP16Codec => "fp16"
  }

  def saveCodec(c: ScalarCodec, path: String, spark: SparkSession): Unit = c match {
    case s: SQModel   => saveRanges(s.vmin, s.vmax, path, spark)
    case s: SQ4Model  => saveRanges(s.vmin, s.vmax, path, spark)
    case s: SQ6Model  => saveRanges(s.vmin, s.vmax, path, spark)
    case _: FP16Codec => // dim-only; recorded in the manifest
  }

  def loadCodec(kind: String, dim: Int, path: String,
                spark: SparkSession): ScalarCodec = kind match {
    case "sq8"  => val (mn, mx) = loadRanges(path, spark); SQModel(mn, mx)
    case "sq4"  => val (mn, mx) = loadRanges(path, spark); SQ4Model(mn, mx)
    case "sq6"  => val (mn, mx) = loadRanges(path, spark); SQ6Model(mn, mx)
    case "fp16" => FP16Codec(dim)
    case k => throw new IllegalArgumentException(s"unknown codec kind $k")
  }

  // ---- LSH hyperplanes: (bit, plane) ----

  // shared (bit, plane) table for both LSH model widths
  private def savePlanes(planes: Array[Array[Float]], path: String,
                         spark: SparkSession): Unit = {
    import spark.implicits._
    planes.zipWithIndex.map { case (p, b) => (b, p) }.toSeq
      .toDF("bit", "plane")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  private def loadPlanes(path: String, spark: SparkSession): Array[Array[Float]] = {
    import spark.implicits._
    spark.read.parquet(path)
      .select(col("bit"), col("plane"))
      .as[(Int, Array[Float])].collect().sortBy(_._1).map(_._2)
  }

  def saveLSH(model: BinaryHash.LSHModel, path: String, spark: SparkSession): Unit =
    savePlanes(model.planes, path, spark)

  def loadLSH(path: String, spark: SparkSession): BinaryHash.LSHModel =
    BinaryHash.LSHModel(loadPlanes(path, spark))

  /** Wide (ARRAY<LONG>-signature) LSH model — same (bit, plane) table
    * as [[saveLSH]]; the packing width is derived from the bit count. */
  def saveWideLSH(model: BinaryHash.WideLSHModel, path: String,
                  spark: SparkSession): Unit =
    savePlanes(model.planes, path, spark)

  def loadWideLSH(path: String, spark: SparkSession): BinaryHash.WideLSHModel =
    BinaryHash.WideLSHModel(loadPlanes(path, spark))

  // ---- linear transform: (row, arow, bias) ----

  def saveLinear(t: LinearTransform, path: String, spark: SparkSession): Unit = {
    import spark.implicits._
    t.a.zipWithIndex.map { case (row, i) =>
      (i, row, t.b.map(_(i)))
    }.toSeq.toDF("row", "arow", "bias")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def loadLinear(path: String, spark: SparkSession): LinearTransform = {
    import spark.implicits._
    val rows = spark.read.parquet(path)
      .select(col("row"), col("arow"), col("bias"))
      .as[(Int, Array[Float], Option[Float])].collect().sortBy(_._1)
    val bias = if (rows.forall(_._3.isDefined)) Some(rows.map(_._3.get)) else None
    LinearTransform(rows.map(_._2), bias)
  }

  // ---- transform chain: manifest (idx, kind, param) + payload dirs ----

  def saveChain(chain: TransformChain, path: String, spark: SparkSession): Unit = {
    import spark.implicits._
    val manifest = chain.transforms.zipWithIndex.map {
      case (t: LinearTransform, i) =>
        saveLinear(t, s"$path/t$i", spark); (i, "linear", 0)
      case (L2NormTransform, i)    => (i, "l2norm", 0)
      case (CenterTransform(mean), i) =>
        mean.zipWithIndex.map { case (m, p) => (p, m) }.toSeq
          .toDF("pos", "mean").coalesce(1)
          .write.mode("overwrite").parquet(s"$path/t$i")
        (i, "center", 0)
      case (RemapTransform(d), i)  => (i, "remap", d)
      case (t, _) => throw new IllegalArgumentException(s"unsaveable transform $t")
    }
    manifest.toDF("idx", "kind", "param")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/manifest")
  }

  def loadChain(path: String, spark: SparkSession): TransformChain = {
    import spark.implicits._
    val manifest = spark.read.parquet(s"$path/manifest")
      .select(col("idx"), col("kind"), col("param"))
      .as[(Int, String, Int)].collect().sortBy(_._1)
    TransformChain(manifest.map {
      case (i, "linear", _) => loadLinear(s"$path/t$i", spark)
      case (_, "l2norm", _) => L2NormTransform
      case (i, "center", _) =>
        val mean = spark.read.parquet(s"$path/t$i")
          .select(col("pos"), col("mean"))
          .as[(Int, Float)].collect().sortBy(_._1).map(_._2)
        CenterTransform(mean)
      case (_, "remap", d)  => RemapTransform(d)
      case (_, k, _) => throw new IllegalArgumentException(s"unknown transform kind $k")
    }.toSeq)
  }

  // ---- whole factory-built index ----

  /** Persist a [[IndexFactory.GraftIndex]]: spec manifest, transform
    * chain, coarse/code models, and the encoded collection (IVF data
    * partitioned by list for pruned probes). */
  def saveIndex(gi: IndexFactory.GraftIndex, spec: String, path: String): Unit = {
    val spark = gi.data.sparkSession
    import spark.implicits._
    Seq((spec, gi.ivf.isDefined, gi.pq.isDefined,
        gi.sq.map(sqKind).getOrElse("none"),
        gi.sq.map(_.dim).getOrElse(0), gi.graph.isDefined, gi.raw.isDefined,
        gi.instances.isDefined))
      .toDF("spec", "has_ivf", "has_pq", "sq_kind", "sq_dim", "has_graph",
        "has_raw", "has_instances")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/manifest")
    saveChain(gi.chain, s"$path/chain", spark)
    gi.ivf.foreach(m => IVFIndex.saveModel(m, s"$path/ivf", spark))
    gi.pq.foreach(p => savePQ(p, s"$path/pq", spark))
    gi.sq.foreach(q => saveCodec(q, s"$path/sq", spark))
    gi.graph.foreach(g => HNSW.writeGraph(g, s"$path/graph"))
    gi.raw.foreach(r => r.write.mode("overwrite").parquet(s"$path/raw"))
    // FlatDedup's rep_id -> dup_id side table: without it a reloaded
    // dedup index crashes at search time on instances.get
    gi.instances.foreach(i => i.write.mode("overwrite").parquet(s"$path/instances"))
    if (gi.data.columns.contains("list_no"))
      IVFIndex.write(gi.data, s"$path/data")
    else gi.data.write.mode("overwrite").parquet(s"$path/data")
  }

  def loadIndex(path: String, spark: SparkSession): IndexFactory.GraftIndex = {
    import spark.implicits._
    val manifest = spark.read.parquet(s"$path/manifest")
    // manifests written before the dedup column existed lack it
    val hasInst = manifest.columns.contains("has_instances") &&
      manifest.select(col("has_instances")).as[Boolean].head()
    val (spec, hasIvf, hasPq, sqKindS, sqDim, hasGraph, hasRaw) =
      manifest
        .select(col("spec"), col("has_ivf"), col("has_pq"), col("sq_kind"),
          col("sq_dim"), col("has_graph"), col("has_raw"))
        .as[(String, Boolean, Boolean, String, Int, Boolean, Boolean)].head()
    IndexFactory.GraftIndex(
      IndexFactory.parse(spec),
      loadChain(s"$path/chain", spark),
      if (hasIvf) Some(IVFIndex.loadModel(s"$path/ivf", spark)) else None,
      if (hasPq) Some(loadPQ(s"$path/pq", spark)) else None,
      if (sqKindS != "none") Some(loadCodec(sqKindS, sqDim, s"$path/sq", spark)) else None,
      spark.read.parquet(s"$path/data"),
      if (hasGraph) Some(HNSW.readGraph(spark, s"$path/graph")) else None,
      if (hasRaw) Some(spark.read.parquet(s"$path/raw")) else None,
      if (hasInst) Some(spark.read.parquet(s"$path/instances")) else None)
  }
}
