package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The complete per-document MinHash LSH band-signature computation as ONE
  * codegen'd kernel: `bands` strings, band b joining the decimal minima of
  * hashes j = b·(k/bands) .. b·(k/bands)+rows−1 with `_`, where
  * h_j(x) = (a_j·x + b_j) mod P over the document's n-gram shingle codes
  * ([[ShingleCodes]] arithmetic, [[graft.ext.Dedup.minhashA]]/`minhashB`/
  * `MinhashP` constants).
  *
  * Bit-identical to the previous column formulation
  * `array(concat_ws("_", cast(array_min(transform(shingle_codes(text, n),
  * x → pmod(aⱼ·x + bⱼ, P))) as string), …), …)` — same code-point walk,
  * same hash arithmetic (aⱼ·x + bⱼ is non-negative and ≤ 31·2^53, so pmod
  * is a plain `%`), same `Long.toString` rendering, and the min over ALL
  * shingle windows equals the min over the DISTINCT codes the old path
  * materialized (duplicates never change a minimum) — MinhashKernelSpec
  * asserts equality against the legacy formulation per row.
  *
  * Why an Expression (round 19, guide §1.2 "per-task work"): the column
  * formulation exploded to 16 independent `array_min(transform(
  * shingle_codes(text)))` trees. `CollapseProject`/filter pushdown inlined
  * the whole tree into every consumer — and `InferFiltersFromGenerate`
  * copied it AGAIN into a `size(...)>0` predicate that was pushed into the
  * parquet scan — so one q270 execution evaluated `shingle_codes` (a
  * LinkedHashSet dedup per call) ~50× per row. StageAudit measured 86.7 s
  * of executor CPU on 5,000 300-char docs. This kernel is one string walk
  * and k running minima per evaluation, no shingle array, no hash set, no
  * per-hash lambda interpretation; the inferred generator filter still
  * duplicates it (~3 evaluations/row at worst), which is now harmless.
  *
  * Empty result (fewer than n code points) is an EMPTY ARRAY — callers
  * that posexplode get zero rows, exactly like the old
  * `filter(size(codes) > 0)` + 4-element explode; null text → null.
  */
case class MinhashBandSigs(child: Expression, n: Int, k: Int, bands: Int)
    extends UnaryExpression {
  require(n >= 1 && k >= 1 && bands >= 1 && k % bands == 0,
    s"invalid minhash geometry n=$n k=$k bands=$bands")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "minhash_band_sigs"
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    MinhashBandSigs.sigs(input.asInstanceOf[UTF8String], n, k, bands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MinhashBandSigs.sigs($c, $n, $k, $bands)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinhashBandSigs {
  private val Empty = new GenericArrayData(Array.empty[Any])

  /** Shared by interpreted eval and generated code. */
  def sigs(u: UTF8String, n: Int, k: Int, bands: Int): ArrayData = {
    val s = u.toString
    // code points (surrogate-safe) — the ShingleCodes walk
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
    val P = graft.ext.Dedup.MinhashP
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    // rolling shingle code over every window; min over all windows ==
    // min over distinct codes (duplicates cannot lower a minimum)
    var p = 0
    while (p <= cpCount - n) {
      var code = 0L
      var t = 0
      while (t < n) { code = code * 256L + cps(p + t); t += 1 }
      var h = 0
      while (h < k) {
        val v = (graft.ext.Dedup.minhashA(h) * code +
          graft.ext.Dedup.minhashB(h)) % P
        if (v < mins(h)) mins(h) = v
        h += 1
      }
      p += 1
    }
    val rows = k / bands
    val out = new Array[Any](bands)
    var b = 0
    while (b < bands) {
      val sb = new java.lang.StringBuilder(rows * 11)
      var r = 0
      while (r < rows) {
        if (r > 0) sb.append('_')
        sb.append(mins(b * rows + r))
        r += 1
      }
      out(b) = UTF8String.fromString(sb.toString)
      b += 1
    }
    new GenericArrayData(out)
  }

  /** Column-level handle. */
  def bandSigsCol(text: Column, n: Int, k: Int, bands: Int): Column =
    GraftBridge.column(MinhashBandSigs(GraftBridge.expression(text), n, k, bands))
}
