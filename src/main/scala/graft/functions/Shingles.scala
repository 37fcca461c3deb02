package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for DISTINCT token n-gram shingles of a
  * string, in ONE pass.
  *
  * Why a custom Expression (SURVEY.md §4 extension ladder, same
  * hot-inner-loop rationale as [[MinhashSig]]): the column-math
  * formulation is `array_distinct(transform(sequence(...), i ->
  * concat_ws(" ", element_at(toks, i+1), …)))` — an interpreted
  * higher-order pass with three array probes and a varargs concat per
  * shingle, plus a separate `split` producing the intermediate token
  * array, plus array_distinct's second pass. Shingling feeds EVERY
  * near-dup pipeline over the corpus (minhash, ngram, cluster, curate)
  * — measured ~0.3 s of each consumer at sf0.1. This expression
  * tokenizes once and emits first-occurrence-distinct n-grams from a
  * single loop (insertion-ordered set, matching `array_distinct` /
  * DuckDB `list_distinct` order so oracles replay unchanged).
  *
  * Tokenization contract: `text.split(" ", -1)` — identical to Spark's
  * `split(text, " ")` (Java regex split, trailing empties kept), so the
  * output equals the column-math formulation string-for-string
  * (asserted in VectorExprSpec). Fewer than n tokens → empty array
  * (callers' `size >= 1` filter replaces the old `size(toks) >= n`).
  */
case class Shingles(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if n >= 1 =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_shingles expects (string, n >= 1), got ($t, $n)")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  override protected def nullSafeEval(s: Any): Any =
    Shingles.compute(s.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.Shingles.compute($s, $n);")

  override protected def withNewChildInternal(newChild: Expression): Shingles =
    copy(child = newChild)
}

object Shingles {
  /** One-pass tokenize + n-gram + first-occurrence dedup; called from
    * both eval and generated code.
    */
  def compute(text: UTF8String, n: Int): ArrayData = {
    val toks = text.toString.split(" ", -1)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String](toks.length * 2)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= toks.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }

  /** Direct helper for specs/driver-side replay. */
  def shinglesOf(text: String, n: Int): Seq[String] = {
    val a = compute(UTF8String.fromString(text), n)
    (0 until a.numElements()).map(i => a.getUTF8String(i).toString)
  }
}
