package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Σ aᵢ·bᵢ over two `array<float>` columns as a native codegen'd Catalyst
  * expression.
  *
  * Semantically identical to
  * `aggregate(zip_with(a, b, (x, y) => x*y), 0d, (acc, v) => acc + v)` —
  * float→double widening then a strict left-to-right IEEE sum — but compiled
  * to a tight primitive loop instead of two materialized lambda arrays per
  * row. On the brute-force similarity path (|Q|·|N| pairs × dim elements)
  * this is the hot inner kernel, so it is the one place the engine drops
  * below the DataFrame API to a custom `Expression` (SURVEY §7.3 preference
  * order: built-ins first, then Expression).
  *
  * The summation order is the contract: it matches both the higher-order-
  * function formulation and an ordered SQL sum, so DuckDB-oracle parity (to
  * the 6-dp rounding the similarity queries apply) is preserved.
  */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> arguments, " +
        s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_vec_dot"

  // Strictness matches the zip_with/aggregate formulation exactly: a length
  // mismatch (zip_with pads with null) or a null element yields NULL, never
  // a silently-truncated partial sum — a malformed embedding must be
  // detectable, not produce a plausible wrong cosine.
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $s; }
         |}
       """.stripMargin
    })

  override def nullable: Boolean = true

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Σ aᵢ·bᵢ over two `array<long>` columns — the EXACT integer companion to
  * [[FloatVecDot]], for fixed-point-quantized vectors. Because the sum is
  * integer arithmetic it is association-free: any evaluation order, any
  * engine, any cluster layout produces the same bits, which is what lets
  * the similarity queries derive cosines from quantized moments and emit
  * them raw (no cross-engine rounding in the path at all — see
  * [[graft.ext.Similarity]]'s parity note). Overflow is the caller's
  * contract (|qᵢ| ≤ ~1e6 at 64–4096 dims is ≤ ~1e15 ≪ 2⁶³); same strict
  * NULL semantics as [[FloatVecDot]].
  */
case class LongVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> arguments, " +
        s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "long_vec_dot"
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getLong(i) * y.getLong(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $s = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += $a.getLong($i) * $b.getLong($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $s; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Σ aᵢ·wᵢ of an `array<float>` column against a CONSTANT double weight
  * vector (e.g. a deterministic LSH hyperplane), codegen'd with the weights
  * baked in as a reference object — no per-row literal-array materialization,
  * no lambda interpretation. Same strict left-to-right IEEE fold contract as
  * [[FloatVecDot]]; a length mismatch or null element yields NULL.
  */
case class FloatVecDotConst(child: Expression, weights: IndexedSeq[Double])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  // Seq, not Array, as the case-class field: Array equality is referential,
  // which would make semantically identical kernels compare unequal and
  // defeat Catalyst CSE / canonicalization / exchange reuse. The primitive
  // array used at runtime is derived once here.
  private lazy val weightArr: Array[Double] = weights.toArray

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<float>, got ${other.simpleString}")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_vec_dot_const"
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != weightArr.length) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      s += x.getFloat(i).toDouble * weightArr(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val w = ctx.addReferenceObj("weights", weightArr, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |if ($n != $w.length) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += (double) $a.getFloat($i) * $w[$i];
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $s; }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorFunctions {
  /** Column-level handle for [[FloatVecDot]] (classic-API bridge: Spark 4's
    * public Column no longer exposes `.expr`).
    */
  def vecDot(a: Column, b: Column): Column =
    GraftBridge.column(
      FloatVecDot(GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Column-level handle for [[FloatVecDotConst]]. */
  def vecDotConst(a: Column, weights: Array[Double]): Column =
    GraftBridge.column(
      FloatVecDotConst(GraftBridge.expression(a), weights.toIndexedSeq))

  /** Column-level handle for [[LongVecDot]]. */
  def vecDotLong(a: Column, b: Column): Column =
    GraftBridge.column(
      LongVecDot(GraftBridge.expression(a), GraftBridge.expression(b)))
}
