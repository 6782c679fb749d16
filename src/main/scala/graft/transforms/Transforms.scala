package graft.transforms

import org.apache.spark.ml.feature.{PCA => MlPCA}
import org.apache.spark.ml.linalg.{Vectors, DenseMatrix => MlDenseMatrix}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Kernels

/** Vector transform pipeline — the Spark form of the reference's
  * `VectorTransform` chain (`Auncel/VectorTransform.h:75-320`,
  * `IndexPreTransform`): each transform maps the `vec` column; chains
  * compose left-to-right before indexing/search.
  */
sealed trait VecTransform extends Serializable {
  /** Output dimensionality given input dim. */
  def outDim(inDim: Int): Int
  /** Rewrite the vector column. */
  def apply(df: DataFrame, vecCol: String = "vec"): DataFrame
  /** Apply to a single driver-side vector (for query-time transform). */
  def applyVec(v: Array[Float]): Array[Float]
}

/** y = Ax + b (`VectorTransform.h:75-112`). A is dOut×dIn row-major. */
final case class LinearTransform(a: Array[Array[Float]], b: Option[Array[Float]])
    extends VecTransform {
  def outDim(inDim: Int): Int = a.length
  def applyVec(v: Array[Float]): Array[Float] = {
    val out = new Array[Float](a.length)
    var i = 0
    while (i < a.length) {
      var s = if (b.isDefined) b.get(i).toDouble else 0.0
      val row = a(i)
      var j = 0
      while (j < row.length) { s += row(j).toDouble * v(j); j += 1 }
      out(i) = s.toFloat
      i += 1
    }
    out
  }
  def apply(df: DataFrame, vecCol: String): DataFrame = {
    val self = this
    val u = udf { v: Seq[Float] => self.applyVec(v.toArray) }
    df.withColumn(vecCol, u(col(vecCol)))
  }
}

object LinearTransform {
  /** Seeded random orthonormal rotation (`VectorTransform.h:115-126`)
    * via QR of a Gaussian matrix (Breeze ships with Spark MLlib). */
  def randomRotation(d: Int, seed: Long): LinearTransform = {
    val rnd = new scala.util.Random(seed)
    val g = breeze.linalg.DenseMatrix.fill[Double](d, d)(rnd.nextGaussian())
    val q = breeze.linalg.qr(g).q
    LinearTransform(
      Array.tabulate(d)(i => Array.tabulate(d)(j => q(i, j).toFloat)), None)
  }
}

/** L2 normalization (`VectorTransform.h:236-247`). */
case object L2NormTransform extends VecTransform {
  def outDim(inDim: Int): Int = inDim
  def applyVec(v: Array[Float]): Array[Float] = Kernels.l2Normalize(v)
  def apply(df: DataFrame, vecCol: String): DataFrame = {
    val u = udf { v: Seq[Float] => Kernels.l2Normalize(v.toArray) }
    df.withColumn(vecCol, u(col(vecCol)))
  }
}

/** Centering (`VectorTransform.h:249-268`): subtract the collection
  * mean (computed distributed via posexplode + per-position avg). */
final case class CenterTransform(mean: Array[Float]) extends VecTransform {
  def outDim(inDim: Int): Int = inDim
  def applyVec(v: Array[Float]): Array[Float] =
    Array.tabulate(v.length)(i => v(i) - mean(i))
  def apply(df: DataFrame, vecCol: String): DataFrame = {
    val m = lit(mean)
    df.withColumn(vecCol,
      zip_with(col(vecCol), m, (x, mu) => x - mu))
  }
}

object CenterTransform {
  def fit(df: DataFrame, vecCol: String = "vec"): CenterTransform = {
    import df.sparkSession.implicits._
    val mean = df.select(posexplode(col(vecCol)).as(Seq("pos", "x")))
      .groupBy(col("pos")).agg(avg(col("x")).as("m"))
      .as[(Int, Double)].collect().sortBy(_._1).map(_._2.toFloat)
    CenterTransform(mean)
  }
}

/** Dimension remap / pad (`VectorTransform.h:213-233`): keep first
  * `dOut` dims, zero-padding if dOut > dIn. */
final case class RemapTransform(dOut: Int) extends VecTransform {
  def outDim(inDim: Int): Int = dOut
  def applyVec(v: Array[Float]): Array[Float] =
    Array.tabulate(dOut)(i => if (i < v.length) v(i) else 0f)
  def apply(df: DataFrame, vecCol: String): DataFrame = {
    val self = this
    val u = udf { v: Seq[Float] => self.applyVec(v.toArray) }
    df.withColumn(vecCol, u(col(vecCol)))
  }
}

object PCATransform {
  /** PCA to `dOut` dims, optionally whitened
    * (`VectorTransform.h:133-176`) — MLlib PCA fit, then folded into a
    * LinearTransform (with the mean folded into the bias so apply is a
    * single y = A(x-μ) = Ax + b). */
  def fit(df: DataFrame, dOut: Int, whiten: Boolean = false,
          vecCol: String = "vec"): LinearTransform = {
    val toVec = udf { a: Seq[Float] => Vectors.dense(a.map(_.toDouble).toArray) }
    val feat = df.select(toVec(col(vecCol)).as("features"))
    val model = new MlPCA().setInputCol("features").setOutputCol("pca")
      .setK(dOut).fit(feat)
    val pc: MlDenseMatrix = model.pc // dIn × dOut, column-major principal axes
    val dIn = pc.numRows
    val ev = model.explainedVariance.toArray
    // rows of A = principal axes (transposed), scaled 1/√λ if whitening
    val a = Array.tabulate(dOut) { o =>
      val scale = if (whiten && ev(o) > 0) 1.0 / math.sqrt(ev(o)) else 1.0
      Array.tabulate(dIn)(i => (pc(i, o) * scale).toFloat)
    }
    LinearTransform(a, None)
  }
}

object OPQTransform {
  /** OPQ rotation (`VectorTransform.h:188-210`): learn an orthonormal
    * rotation that minimizes PQ reconstruction error, by alternating
    * (a) PQ codebook training on the rotated sample and (b) the
    * orthogonal-Procrustes solve R = UVᵀ from SVD(XᵀX̂) — the standard
    * OPQ-NP iteration. Trains on a driver-side sample (like PQ
    * codebooks); application is the resulting LinearTransform.
    */
  def fit(df: DataFrame, m: Int, nbits: Int = 8, iters: Int = 10,
          seed: Long = 42L, vecCol: String = "vec",
          maxSample: Int = 16384): LinearTransform = {
    import df.sparkSession.implicits._
    import breeze.linalg.{svd, DenseMatrix => BDM}
    val total = df.count()
    val sample =
      (if (total <= maxSample) df.select(col(vecCol))
       else df.select(col(vecCol)).sample(maxSample.toDouble / total, seed))
        .as[Array[Float]].collect()
    val n = sample.length
    val d = sample.head.length
    val x = BDM.tabulate(n, d)((i, j) => sample(i)(j).toDouble)

    var rot = {
      val r = LinearTransform.randomRotation(d, seed)
      BDM.tabulate(d, d)((i, j) => r.a(i)(j).toDouble).t // columns rotate
    }
    var it = 0
    while (it < iters) {
      val xr = x * rot
      // PQ on the rotated sample
      val pts = Array.tabulate(n)(i => Array.tabulate(d)(j => xr(i, j).toFloat))
      val pq = graft.quantize.PQModel(m, nbits,
        Array.tabulate(m) { sub =>
          val dsub = d / m
          val slices = pts.map(_.slice(sub * dsub, (sub + 1) * dsub))
          val centers = graft.quantize.ProductQuantizer
            .localKMeansPublic(slices, math.min(1 << nbits, n), seed + sub, 15)
          Array.tabulate(1 << nbits)(c => centers(math.min(c, centers.length - 1)))
        })
      val xhat = BDM.tabulate(n, d) { (i, j) =>
        pq.decode(pq.encode(pts(i)))(j).toDouble
      }
      // Procrustes: R = U Vᵀ of SVD(Xᵀ X̂)
      val s = svd(x.t * xhat)
      rot = s.U * s.Vt
      it += 1
    }
    // row form: y = Aᵀ? — our LinearTransform computes y = A·x with A rows;
    // x·R (row convention) ≡ Rᵀ·x (column convention) → A = Rᵀ
    LinearTransform(
      Array.tabulate(d)(i => Array.tabulate(d)(j => rot(j, i).toFloat)), None)
  }
}

/** A chain of transforms (`IndexPreTransform`,
  * `VectorTransform.h:271-320`). */
final case class TransformChain(transforms: Seq[VecTransform]) extends VecTransform {
  def outDim(inDim: Int): Int =
    transforms.foldLeft(inDim)((d, t) => t.outDim(d))
  def applyVec(v: Array[Float]): Array[Float] =
    transforms.foldLeft(v)((x, t) => t.applyVec(x))
  def apply(df: DataFrame, vecCol: String): DataFrame =
    transforms.foldLeft(df)((d, t) => t.apply(d, vecCol))
}
