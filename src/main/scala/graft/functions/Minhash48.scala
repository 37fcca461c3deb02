package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the PORTABLE (cross-engine-
  * replayable) k-entry MinHash battery — the codegen'd form of the
  * exact math `stream_neardup`'s DuckDB oracle replays bit-for-bit:
  * per shingle, the 48-bit md5 hex prefix (`conv(substring(md5(s), 1,
  * 12), 16, 10)`), then k affine rows `(u48·(2i+3) + 1000003·i) &
  * (2⁴⁸−1)` with the per-row minimum over the shingle set.
  *
  * Why it exists next to [[MinhashSig]]: xxhash64 (MinhashSig's base)
  * has no DuckDB equivalent, so anything built on it is no-oracle;
  * this battery is the ORACLED family — every step exact integer math
  * both engines reproduce (products < 2⁶², §2.12) — and since r12 it
  * is the battery behind `dedup_minhash`/`corpus_curate` too (MinhashSig
  * stays registered as the max-throughput engine-internal alternative
  * for callers that never need a cross-engine replay). Before r11 the
  * portable math ran
  * as one interpreted `transform` building the u48 array plus 16
  * interpreted `array_min(transform(...))` passes per doc — per-
  * element lambda dispatch outside WholeStageCodegen, in the posting
  * stage of a key meant for continuous ingest. This expression hashes
  * each shingle once and tracks all k minima in one tight loop,
  * keeping the stage codegen'd. MUST stay bit-identical to the column-
  * math formulation (VectorExprSpec pins elementwise equality; the
  * stream_neardup oracle hash is the cross-engine gate).
  */
case class Minhash48(child: Expression, k: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if k >= 1 && k <= 64 =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash48 expects array<string> and 1 <= k <= 64, got ($t, $k)")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash48"

  override protected def nullSafeEval(a: Any): Any =
    Minhash48.compute(a.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.Minhash48.compute($a, $k);")

  override protected def withNewChildInternal(newChild: Expression): Minhash48 =
    copy(child = newChild)
}

object Minhash48 {
  private val mask = (1L << 48) - 1

  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** One-pass k-minima; called from both eval and generated code.
    * Empty input yields Long.MaxValue sentinels (the [[MinhashSig]]
    * convention; callers filter docs with no shingles first — and the
    * column-math formulation's `array_min(empty)` NULL never arises
    * for the same reason).
    */
  def compute(arr: ArrayData, k: Int): ArrayData = {
    require(k >= 1 && k <= 64, s"minhash48 k must be in [1, 64], got $k")
    val mins = Array.fill(k)(Long.MaxValue)
    val digest = md.get()
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        digest.reset()
        val h = digest.digest(arr.getUTF8String(i).getBytes)
        // first 6 md5 bytes, unsigned big-endian == the 12-hex-char
        // prefix both engines parse with conv(..., 16, 10)
        val u48 =
          ((h(0) & 0xffL) << 40) | ((h(1) & 0xffL) << 32) |
          ((h(2) & 0xffL) << 24) | ((h(3) & 0xffL) << 16) |
          ((h(4) & 0xffL) << 8) | (h(5) & 0xffL)
        var j = 0
        while (j < k) {
          val v = (u48 * (2L * j + 3) + 1000003L * j) & mask
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** Direct helper for specs/driver-side replay. */
  def signatureOf(shingles: Seq[String], k: Int): Seq[Long] =
    compute(new GenericArrayData(
      shingles.map(UTF8String.fromString).toArray[Any]), k)
      .toLongArray().toSeq
}
