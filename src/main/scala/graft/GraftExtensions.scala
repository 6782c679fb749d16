package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graft.{CosineExpr, DotExpr, HammingWideExpr,
  L2SqrExpr}

/** SQL-surface registration of the codegen vector kernels so
  * `spark.sql("SELECT graft_l2sqr(a, b) ...")` works — which is also
  * the PYTHON surface: a PySpark session built with
  * `spark.sql.extensions=graft.GraftExtensions` (and the library on
  * the driver classpath) reaches every kernel by name with zero
  * Python UDFs, so the hot path stays inside whole-stage codegen
  * (`tools/pyspark_smoke.py`, `docs/PYTHON.md`).
  *
  * Two routes:
  *  - config `spark.sql.extensions=graft.GraftExtensions` at session
  *    build (the SparkSessionExtensions path);
  *  - [[GraftFunctions.register]] on a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach { case (name, info, builder) =>
      e.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftFunctions {
  val all: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("graft_l2sqr",
      new ExpressionInfo(classOf[L2SqrExpr].getName, "graft_l2sqr"),
      (es: Seq[Expression]) => L2SqrExpr(es(0), es(1))),
    ("graft_dot",
      new ExpressionInfo(classOf[DotExpr].getName, "graft_dot"),
      (es: Seq[Expression]) => DotExpr(es(0), es(1))),
    // one fused pass (dot + both norms accumulate together) with IEEE
    // division, so the documented 0/0 = NaN raw-cosine semantics hold
    // regardless of spark.sql.ansi.enabled — a composed Catalyst
    // Divide returns NULL in legacy mode and THROWS under Spark 4's
    // default ANSI conf (caught by the smoke's NaN assertion), and
    // traverses the arrays three times. Dedup callers guard the
    // zero-vector case themselves; NOTE Spark sorts/compares NaN as
    // larger than every number, so filter nulls/zeros first if that
    // matters to your query
    ("graft_cosine",
      new ExpressionInfo(classOf[CosineExpr].getName, "graft_cosine"),
      (es: Seq[Expression]) => CosineExpr(es(0), es(1))),
    ("graft_hamming",
      new ExpressionInfo(classOf[HammingWideExpr].getName, "graft_hamming"),
      (es: Seq[Expression]) => HammingWideExpr(es(0), es(1))))

  /** Register on an existing session (temp-function registry). */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}
