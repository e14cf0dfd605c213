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
  * `trim` then split on `\s+`, empty/blank text → zero tokens — asserted
  * bit-identical to the HOF form by FunctionsSpec.
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
    words.foreach(s.add)
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
  /** Shared by interpreted eval and generated code. */
  def counts(u: UTF8String, set: java.util.HashSet[String]): ArrayData = {
    val trimmed = u.toString.trim
    if (trimmed.isEmpty) return new GenericArrayData(Array(0L, 0L))
    val toks = trimmed.split("\\s+")
    var blocked = 0L
    var i = 0
    while (i < toks.length) {
      if (set.contains(toks(i))) blocked += 1
      i += 1
    }
    new GenericArrayData(Array(toks.length.toLong, blocked))
  }

  def countsCol(text: Column, words: Seq[String]): Column =
    GraftBridge.column(BlocklistCounts(GraftBridge.expression(text), words))
}
