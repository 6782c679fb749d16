package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Column-level vector math built ONLY from Spark's codegen'd
  * higher-order functions (`zip_with` / `aggregate` / `transform`) so the
  * whole expression stays inside WholeStageCodegen — no UDF boundary.
  *
  * Summation is left-to-right over the array (deterministic), matching
  * the scalar kernels in [[Kernels]] bit-for-bit, which is what lets the
  * DuckDB oracle reproduce distances exactly.
  *
  * Reference semantics: L2² and inner-product distance kernels of
  * Auncel (`Auncel/utils.cpp:417-655`, `utils.h:136-156`) re-expressed
  * as Catalyst expressions instead of SIMD loops.
  */
object VectorFunctions {

  private def d(c: Column): Column = c.cast(DoubleType)

  /** Squared L2 distance between two ARRAY<FLOAT> columns (double) —
    * native codegen expression (see
    * [[org.apache.spark.sql.graft.L2SqrExpr]]); bit-identical to the
    * higher-order formulation in [[l2SqrHof]] but compiles to a tight
    * loop inside WholeStageCodegen. */
  def l2Sqr(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.VectorExpressions.l2Sqr(a, b)

  /** Inner product of two ARRAY<FLOAT> columns (double) — codegen. */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.VectorExpressions.dot(a, b)

  /** Reference formulation via Spark's built-in higher-order functions —
    * slower (interpreted per element) but dependency-free; kept for
    * cross-checking the codegen kernels. */
  def l2SqrHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => { val diff = d(x) - d(y); diff * diff }),
      lit(0.0),
      (acc, x) => acc + x)

  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => d(x) * d(y)), lit(0.0),
      (acc, x) => acc + x)

  /** Squared L2 norm of an ARRAY<FLOAT> column (double). */
  def normSqr(a: Column): Column = dot(a, a)

  /** L2 norm (double). */
  def norm(a: Column): Column = sqrt(normSqr(a))

  /** Cosine similarity (double). */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** L2-normalized copy of an ARRAY<FLOAT> vector (stays FLOAT). */
  def l2Normalize(a: Column): Column = {
    val n = norm(a)
    transform(a, x => (d(x) / n).cast("float"))
  }

  /** Distance under the given metric: "l2" → squared L2, "ip" → negated
    * inner product (so that smaller is always better, mirroring how the
    * reference flips comparisons via CMin/CMax heaps, `Heap.h:46-62`). */
  def distance(metric: String, a: Column, b: Column): Column = metric match {
    case "l2" => l2Sqr(a, b)
    case "ip" => -dot(a, b)
    case m    => throw new IllegalArgumentException(s"unknown metric $m")
  }
}
