package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}

/** Native Catalyst expressions (with `doGenCode`) for the two hot
  * distance kernels — the codegen'd fast path the reference implements
  * as SIMD loops (`Auncel/utils_simd.cpp`). Unlike the
  * `zip_with`/`aggregate` higher-order formulation (interpreted per
  * element, allocating) these compile into a tight scalar loop inside
  * WholeStageCodegen; the summation order (left-to-right, double) is
  * identical, so results are bit-for-bit the same.
  */
abstract class VectorBinaryKernel extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
}

/** Squared L2 distance over two ARRAY<FLOAT> columns. */
case class L2SqrExpr(left: Expression, right: Expression) extends VectorBinaryKernel {
  override def prettyName: String = "graft_l2sqr"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0; var i = 0
    while (i < n) {
      val d = x.getFloat(i).toDouble - y.getFloat(i).toDouble
      s += d * d; i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val s = ctx.freshName("s"); val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      s"""
         |double $s = 0.0;
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = (double) $x.getFloat($i) - (double) $y.getFloat($i);
         |  $s += $d * $d;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Inner product over two ARRAY<FLOAT> columns. */
case class DotExpr(left: Expression, right: Expression) extends VectorBinaryKernel {
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0; var i = 0
    while (i < n) { s += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val s = ctx.freshName("s"); val i = ctx.freshName("i"); val n = ctx.freshName("n")
      s"""
         |double $s = 0.0;
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (double) $x.getFloat($i) * (double) $y.getFloat($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Cosine similarity over two ARRAY<FLOAT> columns, FUSED: dot product
  * and both squared norms accumulate in ONE pass over the arrays
  * (composing three [[DotExpr]]s traverses them three times), then
  * IEEE division — so `0/0` is NaN regardless of
  * `spark.sql.ansi.enabled`, the documented raw-cosine semantics of
  * the SQL/Python surface (`graft_cosine`, docs/PYTHON.md). Catalyst's
  * `Divide` can express neither: it returns NULL in legacy mode and
  * throws DIVIDE_BY_ZERO under ANSI. The factor order
  * `dot / (sqrt(na) * sqrt(nb))` matches
  * `graft.functions.VectorFunctions.cosine` bit-for-bit on non-zero
  * vectors (same left-to-right double summation, same sqrt-product). */
case class CosineExpr(left: Expression, right: Expression) extends VectorBinaryKernel {
  override def prettyName: String = "graft_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble; val yi = y.getFloat(i).toDouble
      s += xi * yi; na += xi * xi; nb += yi * yi; i += 1
    }
    s / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val s = ctx.freshName("s"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb"); val i = ctx.freshName("i")
      val n = ctx.freshName("n"); val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |double $s = 0.0; double $na = 0.0; double $nb = 0.0;
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = (double) $x.getFloat($i);
         |  double $yi = (double) $y.getFloat($i);
         |  $s += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |}
         |${ev.value} = $s / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Hamming distance over two ARRAY<LONG> packed signatures — per-word
  * xor popcount, the codegen'd twin of `BinaryHash.hammingWide` (same
  * word order, bit-identical integer result). */
case class HammingWideExpr(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def prettyName: String = "graft_hamming_wide"
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0; var i = 0
    while (i < n) {
      s += java.lang.Long.bitCount(x.getLong(i) ^ y.getLong(i)); i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val s = ctx.freshName("s"); val i = ctx.freshName("i"); val n = ctx.freshName("n")
      s"""
         |int $s = 0;
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += java.lang.Long.bitCount($x.getLong($i) ^ $y.getLong($i));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object VectorExpressions {
  def l2Sqr(a: Column, b: Column): Column =
    ColumnBridge.column(L2SqrExpr(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(DotExpr(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def hammingWide(a: Column, b: Column): Column =
    ColumnBridge.column(HammingWideExpr(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
