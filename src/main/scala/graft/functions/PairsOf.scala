package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}

/** Native Catalyst expression for all index-ordered pairs of an
  * `array<long>`: `graft_pairs([a, b, c]) = [(a,b), (a,c), (b,c)]` —
  * the C(k, 2) basket-pair expansion every co-occurrence graph build
  * runs ([[graft.llm.LlmGraph]]'s supportEdges feeds eight §2 keys).
  *
  * Why a custom Expression (SURVEY.md §4 extension ladder, the
  * [[Shingles]] rationale): the column-math form is
  * `flatten(transform(ps, (x, i) -> transform(slice(ps, i + 2,
  * size(ps)), y -> struct(x, y))))` — higher-order functions are
  * interpreted (no codegen), and `slice` COPIES an O(k) suffix array
  * per element, so each basket pays O(k²) array copies plus lambda
  * dispatch per pair before the explode even starts. This expression
  * emits the pairs from one tight loop; output order (i < j
  * lexicographic) and values are identical to the column-math form
  * (asserted string-for-string in VectorExprSpec), so consumers and
  * oracles replay unchanged.
  *
  * Contract: elements are non-null (the collect_set-fed use; a null
  * element would surface as 0). Pair COUNT is the caller's bound —
  * Σ C(basket, 2) is basket-size-bounded in every in-repo use; an
  * adversarial single huge array would allocate its C(k, 2) output
  * here just as it would under the lambda form.
  */
case class PairsOf(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_pairs expects array<bigint>, got $t")
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("u", LongType, nullable = false),
      StructField("v", LongType, nullable = false))),
    containsNull = false)

  override def prettyName: String = "graft_pairs"

  override protected def nullSafeEval(a: Any): Any =
    PairsOf.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.PairsOf.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): PairsOf =
    copy(child = newChild)
}

object PairsOf {
  /** One-pass C(k, 2) pair expansion; called from both eval and
    * generated code. C(n, 2) is computed in Long and bounds-checked:
    * `graft_pairs` is registered session-wide, so arbitrary arrays can
    * reach it, and Int arithmetic would wrap at n ≈ 46,341 into a
    * NegativeArraySizeException (or worse, a silently short array).
    */
  def compute(a: ArrayData): ArrayData = {
    val n = a.numElements()
    val size = n.toLong * (n - 1L) / 2L
    require(size <= Int.MaxValue,
      s"graft_pairs: array of $n elements expands to $size pairs (> Int.MaxValue)")
    val out = new Array[Any](size.toInt)
    var k = 0
    var i = 0
    while (i < n) {
      val u = a.getLong(i)
      var j = i + 1
      while (j < n) {
        out(k) = new GenericInternalRow(Array[Any](u, a.getLong(j)))
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}
