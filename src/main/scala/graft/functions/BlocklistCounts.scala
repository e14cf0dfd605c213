package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `[n_tokens, n_blocked]` of a text in ONE pass with an O(1) hash-set
  * membership probe per token — the codegen'd kernel behind
  * [[graft.ext.Safety.blocklistScan]].
  *
  * The HOF formulation (`size(filter(tokens, t → array_contains(lit(B), t)))`)
  * scans the blocklist ARRAY per token: O(|B|) per token is invisible at
  * |B| = 3 and fatal at a production 10k-word blocklist over 100 TB of
  * text. This expression carries the blocklist as a shared hash set
  * (referenced from generated code via `addReferenceObj`, one object per
  * plan — NOT 10k literal expressions, which would blow up codegen).
  *
  * Parity contract: tokenization is exactly [[graft.ext.TextStats.tokens]] —
  * SQL `trim` (spaces ONLY — Java `String.trim` would also strip control
  * whitespace and diverge from the HOF/oracle on tab/newline-edged text)
  * then split on `\s+` with Spark's limit=-1 semantics (leading/trailing
  * empty tokens around edge whitespace runs are KEPT), blank text → zero
  * tokens. The blocklist probe NORMALIZES each token first — ASCII case
  * fold (`translate(t, 'A..Z', 'a..z')`, the only fold Java, Spark and
  * RE2/DuckDB implement identically) plus stripping leading/trailing
  * `[^a-z0-9]` runs — so "Bad" and "bad." match a `bad` entry, the way
  * C4's bad-words pass normalizes before matching; the word list itself is
  * ASCII-lowercased at construction (entries are expected edge-clean:
  * a `bad.` entry matches nothing because no normalized token keeps its
  * dot). `n_tokens` counts RAW tokens; only the membership probe sees the
  * normalized form. All of it asserted bit-identical to the HOF form by
  * FunctionsSpec.
  */
case class BlocklistCounts(child: Expression, words: Seq[String])
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "blocklist_counts"
  override def nullable: Boolean = child.nullable

  @transient private lazy val set: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](words.size * 2)
    words.foreach(w => s.add(BlocklistCounts.asciiLower(w)))
    s
  }

  override def nullSafeEval(input: Any): Any =
    BlocklistCounts.counts(input.asInstanceOf[UTF8String], set)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("blockSet", set, "java.util.HashSet")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.BlocklistCounts.counts($c, $setRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BlocklistCounts {
  /** ASCII-only case fold — `translate(t, 'A..Z', 'a..z')`. Full Unicode
    * lowercasing diverges across engines (Java ROOT vs UTF8String vs RE2
    * on e.g. İ → i̇), so the parity contract pins the fold to ASCII.
    */
  private[functions] def asciiLower(s: String): String = {
    var i = 0
    while (i < s.length && !(s.charAt(i) >= 'A' && s.charAt(i) <= 'Z')) i += 1
    if (i == s.length) return s
    val cs = s.toCharArray
    while (i < cs.length) {
      val c = cs(i)
      if (c >= 'A' && c <= 'Z') cs(i) = (c + 32).toChar
      i += 1
    }
    new String(cs)
  }

  @inline private def isAlnum(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')

  /** The normalized probe form of a token: ASCII fold + strip the
    * leading/trailing `[^a-z0-9]` runs — exactly
    * `regexp_replace(translate(t,'A..Z','a..z'), "^[^a-z0-9]+|[^a-z0-9]+$", "")`.
    * All-punctuation tokens normalize to "".
    */
  private[functions] def normalize(tok: String): String = {
    val s = asciiLower(tok)
    var a = 0
    var b = s.length - 1
    while (a <= b && !isAlnum(s.charAt(a))) a += 1
    while (b >= a && !isAlnum(s.charAt(b))) b -= 1
    if (a == 0 && b == s.length - 1) s else s.substring(a, b + 1)
  }

  /** Shared by interpreted eval and generated code. Space-only trim plus
    * `split("\s+", -1)` replicate the SQL `trim`/Spark `split` pair
    * bit-for-bit, including the leading/trailing empty tokens a
    * control-whitespace-edged text produces.
    */
  def counts(u: UTF8String, set: java.util.HashSet[String]): ArrayData = {
    val s = u.toString
    var a = 0
    var b = s.length - 1
    while (a <= b && s.charAt(a) == ' ') a += 1
    while (b >= a && s.charAt(b) == ' ') b -= 1
    if (a > b) return new GenericArrayData(Array(0L, 0L))
    val toks = s.substring(a, b + 1).split("\\s+", -1)
    if (set.isEmpty)
      return new GenericArrayData(Array(toks.length.toLong, 0L))
    var blocked = 0L
    var i = 0
    while (i < toks.length) {
      if (set.contains(normalize(toks(i)))) blocked += 1
      i += 1
    }
    new GenericArrayData(Array(toks.length.toLong, blocked))
  }

  def countsCol(text: Column, words: Seq[String]): Column =
    GraftBridge.column(BlocklistCounts(GraftBridge.expression(text), words))
}
