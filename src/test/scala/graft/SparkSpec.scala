package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Kernels

/** Shared test session + seeded synthetic vector data, mirroring the
  * reference's `tests/common.py:18-52` (Randu10k): Gaussian vectors with
  * fixed seeds, exact ground truth computed in-test by brute force. */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
  def sf(dir: String) = s"/root/testdata/$dir"

  /** Deterministic Gaussian vectors, optionally L2-normalized. */
  def randVecs(n: Int, d: Int, seed: Long, normalize: Boolean = true): Array[Array[Float]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(n) {
      val v = Array.fill(d)(rnd.nextGaussian().toFloat)
      if (normalize) Kernels.l2Normalize(v) else v
    }
  }

  /** Clustered vectors (the structure IVF exploits, like SIFT/DEEP):
    * `nClusters` Gaussian centers, points = center + noise·N(0,1). */
  def clusteredVecs(n: Int, d: Int, nClusters: Int, seed: Long,
                    noise: Double = 0.15): Array[Array[Float]] = {
    val rnd = new scala.util.Random(seed)
    val centers = Array.fill(nClusters)(Array.fill(d)(rnd.nextGaussian().toFloat))
    Array.fill(n) {
      val c = centers(rnd.nextInt(nClusters))
      Array.tabulate(d)(i => (c(i) + noise * rnd.nextGaussian()).toFloat)
    }
  }

  def vecDF(vecs: Array[Array[Float]], idCol: String = "id"): DataFrame = {
    import spark.implicits._
    vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toSeq
      .toDF(idCol, "vec")
  }

  /** Exact top-k by metric — plain Scala oracle. */
  def bruteForce(base: Array[Array[Float]], q: Array[Float], k: Int,
                 metric: String = "l2"): Array[(Double, Long)] =
    base.zipWithIndex
      .map { case (v, i) => (Kernels.distance(metric, q, v), i.toLong) }
      .sortBy { case (d, i) => (d, i) }.take(k)
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[8]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
