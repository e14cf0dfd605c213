package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Count of a string array's elements that belong to a LITERAL word set —
  * the codegen'd kernel behind the `size(filter(arr, x →
  * array_contains(lit(words), x)))` marker-count idiom (language-ID
  * scores, stopword hits, the q194 quality features).
  *
  * Why it exists: the HOF form is CodegenFallback (interpreted per row)
  * and probes the word ARRAY per element — O(|words|) each. This kernel
  * is whole-stage-codegen'd and probes an O(1) shared hash set
  * (`addReferenceObj`, one object per plan), so the cost is flat in the
  * marker-set size. It is installed transparently by
  * [[graft.plans.MarkerHitsRule]]; semantics replicate the HOF form
  * bit-for-bit: null array → null (ANSI `size`), null elements never
  * count (`array_contains(words, null)` is null → dropped by `filter`),
  * matching is EXACT (no normalization — that is
  * [[BlocklistCounts]]'s separate contract).
  */
case class MarkerHits(child: Expression, words: Seq[String])
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "marker_hits"
  override def nullable: Boolean = child.nullable

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](words.size * 2)
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  override def nullSafeEval(input: Any): Any =
    MarkerHits.count(input.asInstanceOf[ArrayData], set)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("markerSet", set, "java.util.HashSet")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MarkerHits.count($c, $setRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MarkerHits {
  /** Shared by interpreted eval and generated code. */
  def count(a: ArrayData, set: java.util.HashSet[UTF8String]): Int = {
    val len = a.numElements()
    var n = 0
    var i = 0
    while (i < len) {
      if (!a.isNullAt(i) && set.contains(a.getUTF8String(i))) n += 1
      i += 1
    }
    n
  }
}
