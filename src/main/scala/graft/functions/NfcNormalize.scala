package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for Unicode NFC normalization — the
  * first transform of every text-corpus pipeline (crawl text arrives
  * with the same glyph in composed AND decomposed form: `café` vs
  * `cafe` + U+0301; hashing, dedup shingles, and tokenizers all see
  * two different strings until canonical composition folds them).
  *
  * Why a custom Expression (SURVEY.md §4 extension ladder): Spark has
  * NO built-in normalization function, so the alternatives are a Scala
  * UDF (ser/de boundary + codegen barrier in the hottest possible
  * path, a per-document string op feeding the whole dedup family) or
  * this — `java.text.Normalizer` behind `doGenCode`, staying inside
  * whole-stage codegen like [[Shingles]]/[[MinhashSig]]. The JDK and
  * DuckDB (utf8proc) both implement the Unicode canonical-composition
  * algorithm, so `nfc_normalize` oracles it exactly.
  *
  * The quick-check fast path in Normalizer (NFC-is-already-normal) is
  * O(n) with no allocation for the ASCII bulk of a real corpus — the
  * common case costs a scan, not a rewrite.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_nfc expects a string, got $t")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override protected def nullSafeEval(s: Any): Any =
    NfcNormalize.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.NfcNormalize.compute($s);")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  /** Shared by eval and generated code. `isNormalized` is the
    * allocation-free quick check; only strings that actually carry
    * decomposed sequences pay the normalize + re-encode.
    */
  def compute(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
