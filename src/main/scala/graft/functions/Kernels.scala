package graft.functions

/** Scalar distance kernels over raw `Array[Float]`, used inside
  * `mapPartitions` hot loops (partial top-k scans) and the error-profile
  * math. Plain `while` loops — the JVM auto-vectorizes these; we do NOT
  * hand-port the reference's SSE/AVX kernels (`Auncel/utils_simd.cpp`).
  *
  * Accumulation is left-to-right in double, bit-identical to
  * [[VectorFunctions]] column expressions (and to DuckDB's
  * `list_sum(list_transform(...))`), so results from either path agree
  * exactly.
  */
object Kernels extends Serializable {

  /** Squared L2 distance. Cf. `Auncel/utils.cpp:417-492` (fvec_L2sqr). */
  def l2Sqr(a: Array[Float], b: Array[Float]): Double = {
    var i = 0; var s = 0.0
    val n = a.length
    while (i < n) { val d = a(i).toDouble - b(i).toDouble; s += d * d; i += 1 }
    s
  }

  /** Inner product. Cf. `Auncel/utils.cpp` (fvec_inner_product). */
  def dot(a: Array[Float], b: Array[Float]): Double = {
    var i = 0; var s = 0.0
    val n = a.length
    while (i < n) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }

  def normSqr(a: Array[Float]): Double = dot(a, a)

  def norm(a: Array[Float]): Double = math.sqrt(normSqr(a))

  def cosine(a: Array[Float], b: Array[Float]): Double =
    dot(a, b) / (norm(a) * norm(b))

  def l2Normalize(a: Array[Float]): Array[Float] = {
    val n = norm(a)
    if (n == 0.0) a.clone()
    else {
      val out = new Array[Float](a.length)
      var i = 0
      while (i < a.length) { out(i) = (a(i).toDouble / n).toFloat; i += 1 }
      out
    }
  }

  /** Distance under metric; smaller is better ("ip" is negated). */
  def distance(metric: String, a: Array[Float], b: Array[Float]): Double =
    metric match {
      case "l2" => l2Sqr(a, b)
      case "ip" => -dot(a, b)
      case m    => throw new IllegalArgumentException(s"unknown metric $m")
    }
}
