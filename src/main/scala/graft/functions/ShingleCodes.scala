package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct character n-gram codes `Σ_k cp_{i+k} · 256^(n−1−k)` as a native
  * codegen'd kernel — bit-identical (values AND first-occurrence order) to
  * the higher-order-function formulation in [[graft.ext.Dedup.shingleCodes]]
  * (`array_distinct(transform(sequence(...), i → Σ ascii·256^k))`), which
  * is CodegenFallback and re-enters the interpreter per character. The
  * shingle explode feeds the whole dedup family (n-gram Jaccard q16,
  * MinHash q17/q36/q78, SimHash q18, containment q84, split leakage q155)
  * — the hottest per-row text kernel in the engine after the fingerprint.
  *
  * Parity contract: iterates CODE POINTS (Spark's substr/ascii semantics);
  * on the all-ASCII corpus this equals the DuckDB oracles'
  * `ascii(substr(...))` byte walk. Docs shorter than n yield an empty
  * array, exactly like the guarded HOF (`sequence(1, x)` descends for
  * x < 1, so the guard is load-bearing there and free here).
  */
case class ShingleCodes(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_codes"
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    ShingleCodes.codes(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ShingleCodes.codes($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleCodes {
  private val Empty = new GenericArrayData(Array.empty[Long])

  /** Shared by interpreted eval and generated code. */
  def codes(u: UTF8String, n: Int): ArrayData = {
    val s = u.toString
    // code points first (surrogate-safe, matching substr/ascii semantics)
    var cpCount = 0
    var i = 0
    while (i < s.length) { i += Character.charCount(s.codePointAt(i)); cpCount += 1 }
    if (cpCount < n) return Empty
    val cps = new Array[Int](cpCount)
    i = 0; var j = 0
    while (i < s.length) {
      val cp = s.codePointAt(i); cps(j) = cp
      i += Character.charCount(cp); j += 1
    }
    // distinct in first-occurrence order, same as array_distinct
    val seen = new java.util.LinkedHashSet[java.lang.Long](cpCount * 2)
    var p = 0
    while (p <= cpCount - n) {
      var code = 0L
      var k = 0
      while (k < n) { code = code * 256L + cps(p + k); k += 1 }
      seen.add(code)
      p += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new GenericArrayData(out)
  }

  /** Column-level handle. */
  def shingleCodesCol(text: Column, n: Int): Column =
    GraftBridge.column(ShingleCodes(GraftBridge.expression(text), n))
}
