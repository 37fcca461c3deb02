package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression applying a RANKED BPE merge table to a
  * whitespace-tokenized text — the corpus-tokenization step every
  * training pipeline runs between learning merges (`text_bpe_merges`)
  * and packing sequences.
  *
  * Contract (implemented identically by the DuckDB oracle's recursive
  * CTE and PropertySpec's independent fold): each word starts as its
  * code points; repeatedly merge the LOWEST-RANKED applicable adjacent
  * symbol pair, LEFTMOST occurrence first, one occurrence per step,
  * until no merge applies — the canonical sequential (priority-queue)
  * BPE encode, where a merge's output symbol can immediately feed a
  * lower-ranked merge (("aa","a") after ("a","a")). Output is a
  * struct: `encoded` (subwords joined with `.` inside a word, words
  * joined with a single space — a plain string, so the driver's hash
  * compare covers every subword boundary) plus `n_subwords` counted
  * from the symbol lists themselves — NOT reverse-engineered from the
  * joined string, where input text containing `.` would over-count.
  *
  * Why a custom Expression (the [[Shingles]] ladder rationale): the
  * merge loop is inherently iterative per word — column math can't
  * express "repeat until no pair applies", and a Scala UDF would pay
  * Row encoding per doc. The generated code calls one static method,
  * so the expression stays inside whole-stage codegen; the parsed
  * merge table rides along as a codegen reference object, not a
  * re-parsed argument.
  *
  * `merges` entries are "left right" (space-separated — symbols are
  * drawn from whitespace-split words, so they can never contain a
  * space themselves), in rank order.
  */
case class BpeEncode(child: Expression, merges: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if merges.forall(_.split(" ", -1).length == 2) =>
      TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      "graft_bpe merges must each be 'left right' (one space)")
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_bpe expects a string column, got $t")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("encoded", StringType, nullable = false),
    StructField("n_subwords", LongType, nullable = false)))
  override def prettyName: String = "graft_bpe"

  @transient private lazy val table: Array[Array[String]] =
    merges.map(_.split(" ", -1)).toArray

  override protected def nullSafeEval(s: Any): Any =
    BpeEncode.compute(s.asInstanceOf[UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // no explicit class-name arg: addReferenceObj would paste it into
    // a Java cast verbatim, and getName renders arrays as
    // "[[Ljava.lang.String;" — invalid Java source that fails janino
    // and silently drops the WHOLE stage out of codegen. The default
    // (CodeGenerator.typeName) emits "java.lang.String[][]".
    val ref = ctx.addReferenceObj("bpeMerges", table)
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.BpeEncode.compute($s, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}

object BpeEncode {
  /** Encode every whitespace token of `text`; called from both eval
    * and generated code. `table(r) = Array(left, right)` in rank
    * order. Returns (encoded, n_subwords).
    */
  def compute(text: UTF8String, table: Array[Array[String]]): InternalRow = {
    val words = text.toString.split(" ", -1)
    val sb = new java.lang.StringBuilder
    var nSub = 0L
    var wi = 0
    while (wi < words.length) {
      if (wi > 0) sb.append(' ')
      nSub += encodeWord(words(wi), table, sb)
      wi += 1
    }
    new GenericInternalRow(Array[Any](UTF8String.fromString(sb.toString), nSub))
  }

  /** Appends the encoded word; returns its subword count. */
  private def encodeWord(w: String, table: Array[Array[String]],
      sb: java.lang.StringBuilder): Int = {
    // symbols start as code points (DuckDB substr/length are
    // character-semantics; surrogate pairs must stay whole)
    val syms = new java.util.ArrayList[String](w.length)
    var i = 0
    while (i < w.length) {
      val n = Character.charCount(w.codePointAt(i))
      syms.add(w.substring(i, i + n))
      i += n
    }
    var continue = true
    while (continue) {
      var bestRank = Int.MaxValue
      var bestPos = -1
      var p = 0
      while (p < syms.size - 1) {
        var r = 0
        var found = -1
        // table scanned in rank order: first hit IS this position's
        // lowest rank; no point scanning past the current best
        while (r < table.length && r < bestRank && found < 0) {
          if (table(r)(0) == syms.get(p) && table(r)(1) == syms.get(p + 1))
            found = r
          r += 1
        }
        if (found >= 0) { bestRank = found; bestPos = p }
        p += 1
      }
      if (bestPos < 0) continue = false
      else {
        syms.set(bestPos, syms.get(bestPos) + syms.get(bestPos + 1))
        syms.remove(bestPos + 1)
      }
    }
    var k = 0
    while (k < syms.size) {
      if (k > 0) sb.append('.')
      sb.append(syms.get(k))
      k += 1
    }
    syms.size
  }

  /** Direct helper for specs/driver-side replay. */
  def encodeOf(text: String, merges: Seq[(String, String)]): String =
    compute(UTF8String.fromString(text),
      merges.map(m => Array(m._1, m._2)).toArray)
      .getUTF8String(0).toString
}
