package graft.plans

import graft.functions.MarkerHits
import org.apache.spark.sql.catalyst.expressions.{ArrayContains, CreateArray, Expression, LambdaFunction, Literal, NamedLambdaVariable, Size}
import org.apache.spark.sql.catalyst.expressions.ArrayFilter
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, StringType}

/** Optimizer rule (injected via [[graft.GraftExtensions]]): rewrites the
  * marker-count idiom
  *
  *   `size(filter(arr, x → array_contains(<literal words>, x)))`
  *
  * into the codegen'd [[graft.functions.MarkerHits]] kernel. The HOF form
  * is CodegenFallback (interpreted per row) and scans the word array per
  * element — O(|words|) each; the kernel is whole-stage-codegen'd with an
  * O(1) shared hash-set probe, so language-ID scoring and stopword
  * counting stay flat as marker sets grow. The rewrite fires only when:
  *
  *   - the `size` is ANSI (`legacySizeOfNull = false` — the kernel's
  *     null-array → null contract matches exactly);
  *   - the lambda body is a bare `array_contains(words, x)` over the one
  *     lambda variable (anything else — normalization, negation — is a
  *     different semantic and is left alone);
  *   - `words` is a fully-literal, null-free string array (either already
  *     constant-folded to a `Literal` or a `CreateArray` of foldables).
  *
  * Semantics are value-identical by construction (null elements never
  * count on either form); Round10OpsSpec asserts bit-parity with the rule
  * on vs off, and the full DuckDB-oracle suite re-ran green with the rule
  * installed in the Verify session.
  */
object MarkerHitsRule extends Rule[LogicalPlan] {

  private def literalWords(e: Expression): Option[Seq[String]] = e match {
    case Literal(data: ArrayData, ArrayType(StringType, _)) =>
      val n = data.numElements()
      val out = Seq.newBuilder[String]
      var i = 0
      while (i < n) {
        if (data.isNullAt(i)) return None
        out += data.getUTF8String(i).toString
        i += 1
      }
      Some(out.result())
    case CreateArray(children, _)
        if children.nonEmpty &&
          children.forall(c => c.foldable && c.dataType == StringType) =>
      val vals = children.map(_.eval())
      if (vals.contains(null)) None else Some(vals.map(_.toString))
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case s @ Size(
          ArrayFilter(arg,
            LambdaFunction(ArrayContains(wordsExpr, v: NamedLambdaVariable),
              Seq(lv: NamedLambdaVariable), _)),
          false) if v.exprId == lv.exprId =>
        literalWords(wordsExpr) match {
          case Some(ws) => MarkerHits(arg, ws)
          case None => s
        }
    }
}
