package graft.functions

import com.fasterxml.jackson.core.{JsonFactory, JsonParser, JsonToken}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-parse multi-get over a JSON text column:
  * `graft_variant_gets(props, 'k:bigint:k_num', 'k:string:k_str',
  * 'missing:bigint:missing_num')` parses the text ONCE and extracts
  * every requested top-level field as a struct —
  * `struct<k_num: bigint, k_str: string, missing_num: bigint>`.
  *
  * Why a custom Expression (SURVEY.md §4 extension ladder, the
  * [[PairsOf]]/[[Shingles]] recipe): Spark 4.1.2's `parse_json` /
  * `variant_get` are CODEGEN-FALLBACK expressions, so a projection of
  * N typed gets re-parses the text N times per row — no whole-stage
  * subexpression elimination outside codegen (measured ~0.6 s per
  * full-pass parse at sf0.1; the r14 fn_variant battery cost 4 passes
  * and had to hide behind a pushdown-pruned slice). This expression is
  * one streaming Jackson pass per row, IS codegen'd (so projection
  * CSE applies when the struct's fields are projected separately),
  * and makes the VARIANT battery affordable over the FULL table.
  *
  * CONTRACT (the subset of `variant_get(parse_json(x), '$.f', t)`
  * semantics this replaces — parity is spec-pinned against the real
  * battery on the shared fixture, whose props are uniformly
  * `OBJECT<k: BIGINT>`):
  *   - paths are TOP-LEVEL field names (`$.f`); nested paths are out
  *     of scope (use the variant battery for those),
  *   - `bigint`: a JSON integral number → its long; any other type or
  *     a missing field → NULL (variant_get would throw on a true type
  *     MISMATCH under ANSI — this expression is the `try_` flavor),
  *   - `string`: a JSON string → as-is; an integral → its decimal
  *     rendering (variant_get's long→string cast); else NULL,
  *   - malformed JSON throws (parse_json behavior; use
  *     [[JsonValid]] / `try_parse_json` to probe validity first).
  */
case class VariantGets(child: Expression, specs: Seq[VariantGets.Spec])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_variant_gets expects a string column, got $t")
  }

  override def dataType: DataType = StructType(specs.map(s =>
    StructField(s.out, if (s.asString) StringType else LongType,
      nullable = true)))

  override def prettyName: String = "graft_variant_gets"

  override protected def nullSafeEval(a: Any): Any =
    VariantGets.compute(a.asInstanceOf[UTF8String], specs.toArray)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // addReferenceObj WITHOUT the class-name argument (the r11 janino
    // lesson: an array class name like "[L...;" fails compilation and
    // silently drops the whole stage to interpreted eval).
    val ref = ctx.addReferenceObj("specs", specs.toArray)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.VariantGets.compute($a, " +
        s"(graft.functions.VariantGets.Spec[]) $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): VariantGets =
    copy(child = newChild)
}

object VariantGets {
  /** One requested extraction: top-level `field`, rendered `asString`
    * or as a long, projected under `out`.
    */
  case class Spec(field: String, asString: Boolean, out: String)

  /** Parses `'field:type:outname'` (type ∈ bigint|string). */
  def parseSpec(s: String): Spec = s.split(":", -1) match {
    case Array(f, "bigint", o) => Spec(f, asString = false, o)
    case Array(f, "string", o) => Spec(f, asString = true, o)
    case _ => throw new IllegalArgumentException(
      s"graft_variant_gets spec must be 'field:bigint|string:outname', got '$s'")
  }

  private val factory = new JsonFactory()

  /** One streaming parse; called from both eval and generated code.
    * Long/String slots filled as the matching top-level fields stream
    * by; nested values are skipped structurally.
    */
  def compute(text: UTF8String, specs: Array[Spec]): InternalRow = {
    val out = new Array[Any](specs.length)
    val p = factory.createParser(text.toString)
    try {
      if (p.nextToken() != JsonToken.START_OBJECT)
        throw new IllegalArgumentException(
          s"graft_variant_gets: not a JSON object: $text")
      while (p.nextToken() == JsonToken.FIELD_NAME) {
        val name = p.currentName()
        val t = p.nextToken()
        var i = 0
        while (i < specs.length) {
          if (specs(i).field == name) {
            out(i) = t match {
              // getNumberType gate: getLongValue THROWS on a BigInteger
              // literal; an integral that doesn't fit a long is a type
              // mismatch under this battery's try_ semantics → NULL.
              case JsonToken.VALUE_NUMBER_INT
                  if p.getNumberType == JsonParser.NumberType.INT ||
                    p.getNumberType == JsonParser.NumberType.LONG =>
                if (specs(i).asString)
                  UTF8String.fromString(java.lang.Long.toString(p.getLongValue))
                else java.lang.Long.valueOf(p.getLongValue)
              case JsonToken.VALUE_STRING if specs(i).asString =>
                UTF8String.fromString(p.getText)
              case _ => null
            }
          }
          i += 1
        }
        if (t == JsonToken.START_OBJECT || t == JsonToken.START_ARRAY)
          p.skipChildren()
      }
    } finally p.close()
    new GenericInternalRow(out)
  }
}

/** `graft_json_valid(text)`: does the text parse as ONE complete JSON
  * value? The codegen'd replacement for the
  * `try_parse_json(x) IS NOT NULL` validity probe — same
  * one-streaming-pass-no-tree cost profile as [[VariantGets]], where
  * `try_parse_json` pays the full interpreted variant build per row.
  * NULL input → NULL (three-valued, like the try_ form it replaces).
  */
case class JsonValid(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_json_valid expects a string column, got $t")
  }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_json_valid"

  override protected def nullSafeEval(a: Any): Any =
    JsonValid.compute(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.JsonValid.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): JsonValid =
    copy(child = newChild)
}

object JsonValid {
  /** Strict whole-text validation: one RFC 8259 value and nothing but
    * trailing whitespace. Hand-rolled recursive-descent over the UTF-8
    * bytes, NOT a Jackson parse: the probe's common case is an INVALID
    * text, and Jackson signals that with a JsonParseException whose
    * stack-trace capture costs more than the parse itself (measured
    * +0.4 s over 100k malformed rows at sf0.1 — exceptions as
    * per-row control flow). This scanner returns false in a plain
    * loop, no allocation, matching parse_json / DuckDB json_valid on
    * the probed shapes.
    */
  def compute(text: UTF8String): Boolean = {
    val b = text.getBytes
    val n = b.length
    var i = 0
    def ws(): Unit = {
      while (i < n && (b(i) == ' ' || b(i) == '\t' || b(i) == '\n' ||
        b(i) == '\r')) i += 1
    }
    def lit(s: String): Boolean = {
      val m = s.length
      if (i + m > n) return false
      var j = 0
      while (j < m) { if (b(i + j) != s.charAt(j).toByte) return false; j += 1 }
      i += m; true
    }
    def string(): Boolean = {
      if (i >= n || b(i) != '"') return false
      i += 1
      while (i < n) {
        val c = b(i) & 0xff
        if (c == '"') { i += 1; return true }
        if (c < 0x20) return false // unescaped control char
        if (c == '\\') {
          i += 1
          if (i >= n) return false
          (b(i): @unchecked) match {
            case '"' | '\\' | '/' | 'b' | 'f' | 'n' | 'r' | 't' => i += 1
            case 'u' =>
              if (i + 4 >= n) return false
              var j = 1
              while (j <= 4) {
                val h = b(i + j)
                if (!((h >= '0' && h <= '9') || (h >= 'a' && h <= 'f') ||
                  (h >= 'A' && h <= 'F'))) return false
                j += 1
              }
              i += 5
            case _ => return false
          }
        } else i += 1
      }
      false // unterminated
    }
    def digits(): Boolean = {
      val s = i
      while (i < n && b(i) >= '0' && b(i) <= '9') i += 1
      i > s
    }
    def number(): Boolean = {
      if (i < n && b(i) == '-') i += 1
      if (i < n && b(i) == '0') i += 1
      else if (!digits()) return false
      if (i < n && b(i) == '.') { i += 1; if (!digits()) return false }
      if (i < n && (b(i) == 'e' || b(i) == 'E')) {
        i += 1
        if (i < n && (b(i) == '+' || b(i) == '-')) i += 1
        if (!digits()) return false
      }
      true
    }
    def value(): Boolean = {
      ws()
      if (i >= n) return false
      (b(i): @unchecked) match {
        case '{' =>
          i += 1; ws()
          if (i < n && b(i) == '}') { i += 1; return true }
          while (true) {
            ws()
            if (!string()) return false
            ws()
            if (i >= n || b(i) != ':') return false
            i += 1
            if (!value()) return false
            ws()
            if (i < n && b(i) == ',') i += 1
            else if (i < n && b(i) == '}') { i += 1; return true }
            else return false
          }
          false
        case '[' =>
          i += 1; ws()
          if (i < n && b(i) == ']') { i += 1; return true }
          while (true) {
            if (!value()) return false
            ws()
            if (i < n && b(i) == ',') i += 1
            else if (i < n && b(i) == ']') { i += 1; return true }
            else return false
          }
          false
        case '"' => string()
        case 't' => lit("true")
        case 'f' => lit("false")
        case 'n' => lit("null")
        case c if c == '-' || (c >= '0' && c <= '9') => number()
        case _ => false
      }
    }
    val ok = value()
    ws()
    ok && i == n
  }
}
