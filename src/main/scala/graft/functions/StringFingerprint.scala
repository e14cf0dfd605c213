package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The document fingerprint
  * `fp(s) = (Σ_i cp_i · ((i+1)·2654435761 mod 1000003)) mod 2^31`
  * (cp_i = i-th code point) as a native codegen'd expression.
  *
  * Bit-identical to the higher-order-function formulation in
  * [[graft.ext.TextStats.fingerprint]]'s original form —
  * `aggregate(transform(split(text, ""), (c, i) => ascii(c)·w_i), 0, +)` —
  * including Java long wrap-around on pathological lengths (the HOF sums
  * longs with the same wrap) and the empty-string edge (split("") yields
  * [""] whose ascii is 0; an empty loop sums the same 0). HOFs are
  * CodegenFallback and re-enter the interpreter per char; this compiles to
  * one primitive loop per row — the fingerprint feeds q15, the KMV sketch
  * hashing (q44) and the curation pipeline, so it is a hot per-row kernel.
  *
  * Engine-parity contract unchanged: on the all-ASCII corpus, UTF-16 code
  * unit ≡ codepoint ≡ UTF-8 byte, which is what the DuckDB oracles compute
  * with `ascii(substr(...))` (NOTES.md, oracle technique 3).
  */
case class StringFingerprint(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string, got ${other.simpleString}")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "string_fingerprint"
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    StringFingerprint.fingerprint(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.StringFingerprint.fingerprint($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object StringFingerprint {
  /** Shared by interpreted eval and generated code (the loop is already a
    * single JIT-friendly method; inlining its body into generated Java would
    * only duplicate the logic).
    */
  def fingerprint(u: UTF8String): Long = {
    val s = u.toString
    var sum = 0L
    var i = 0   // UTF-16 index
    var idx = 0 // element index, as split("") produces it
    while (i < s.length) {
      // code POINTS, not UTF-16 units: Java's split("") (the HOF
      // formulation's splitter) never separates a surrogate pair, and
      // ascii() returns the full codepoint of the 2-unit element
      val cp = s.codePointAt(i)
      // (idx+1)·K mod P: operands positive, so % is already the pmod
      val w = ((idx + 1L) * 2654435761L) % 1000003L
      sum += cp.toLong * w
      i += Character.charCount(cp)
      idx += 1
    }
    // pmod against 2^31 — sum can wrap negative on pathological inputs,
    // exactly as the long-summing HOF formulation does
    ((sum % 2147483648L) + 2147483648L) % 2147483648L
  }

  /** Column-level handle. */
  def fingerprintCol(text: Column): Column =
    GraftBridge.column(StringFingerprint(GraftBridge.expression(text)))
}
