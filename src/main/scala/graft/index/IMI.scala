package graft.index

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** IMI — the multi-index coarse quantizer (`MultiIndexQuantizer`,
  * `Auncel/IndexPQ.cpp:868-937`, used as the `IndexIVF` quantizer by the
  * `IMI2x<nbits>` factory specs, `Auncel/AutoTune.cpp`): the coarse
  * assignment is PQ-structured over 2 sub-spaces — each half of the
  * vector quantizes independently against 2^nbits sub-centroids, and the
  * composite list label packs sub-0 into the LOW bits
  * (`label |= lmin << (s * nbits)`, `IndexPQ.cpp:913`), giving
  * nlist = 2^(2·nbits) lists whose effective centroid is the
  * concatenation c0(i0) ++ c1(i1).
  *
  * Squared L2 against that concatenation is exactly the sum of the two
  * per-sub distances, so the composite centroid table IS a valid
  * [[IVFModel]]: assignment, partitioned write, probed scans, bounded
  * search, and the DuckDB oracle replay all apply unchanged. The
  * factored form ([[IMIModel.assign]]) never materializes the cross
  * product — that is the shape that scales to the reference's IMI2x12+
  * (16M lists) regimes; [[IMISpec]] proves it equal to the composite
  * argmin.
  */
object IMI {

  /** Factored two-subspace coarse quantizer. `sub(s)(j)` is sub-space
    * s's j-th centroid over dims [s·dsub, (s+1)·dsub). */
  final case class IMIModel(nbits: Int, sub: Array[Array[Array[Float]]]) {
    val ksub: Int = 1 << nbits
    def dsub: Int = sub(0)(0).length
    def nlist: Int = ksub * ksub

    /** Factored assignment: per-sub argmin (strict `<`, first wins —
      * `IndexPQ.cpp:906-911`) then label packing. O(ksub·d) instead of
      * the composite table's O(ksub²·d). */
    def assign(v: Array[Float]): Int = {
      var label = 0
      var s = 0
      while (s < 2) {
        val off = s * dsub
        var best = 0
        var bestD = Double.MaxValue
        var j = 0
        while (j < ksub) {
          val c = sub(s)(j)
          var d = 0.0
          var i = 0
          while (i < dsub) {
            val t = v(off + i) - c(i)
            d += t * t
            i += 1
          }
          if (d < bestD) { bestD = d; best = j }
          j += 1
        }
        label |= best << (s * nbits)
        s += 1
      }
      label
    }

    /** The composite table in reference label order: centroid(label) =
      * sub0(label & (ksub−1)) ++ sub1(label >> nbits). */
    def toIVFModel: IVFModel = {
      val mask = ksub - 1
      val centroids = Array.tabulate(nlist) { label =>
        sub(0)(label & mask) ++ sub(1)(label >> nbits)
      }
      IVFModel("l2", centroids)
    }
  }

  /** Train the two sub-space k-means (same MLlib recipe as
    * [[IVFIndex.train]]: niter 25 per `Auncel/Clustering.h:25`; seeds
    * seed and seed+1 keep the sub-quantizers independent). L2-only —
    * the reference's MIQ has no inner-product path
    * (`IndexIVFPQ.cpp:369-375` skips IP for MIQ tables). */
  def train(df: DataFrame, nbits: Int, seed: Long = 42L,
            vecCol: String = "vec"): IMIModel = {
    import df.sparkSession.implicits._
    val d = df.select(size(col(vecCol))).as[Int].head()
    require(d % 2 == 0, s"IMI splits dims in half; got odd d=$d")
    val dsub = d / 2
    val ksub = 1 << nbits
    val sub = Array.tabulate(2) { s =>
      val off = s * dsub
      val toVec = udf { a: Seq[Float] =>
        Vectors.dense(Array.tabulate(dsub)(i => a(off + i).toDouble))
      }
      val feat = df.select(toVec(col(vecCol)).as("features"))
      val km = new KMeans().setK(ksub).setSeed(seed + s).setMaxIter(25)
        .setFeaturesCol("features")
      km.fit(feat).clusterCenters.map(_.toArray.map(_.toFloat))
    }
    IMIModel(nbits, sub)
  }
}
