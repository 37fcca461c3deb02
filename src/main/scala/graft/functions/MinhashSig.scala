package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for a k-entry MinHash signature over a
  * string array, in ONE pass.
  *
  * Why a custom Expression (SURVEY.md §4 extension ladder, same
  * rationale as [[DotProduct]]): the built-in formulation is k separate
  * `array_min(transform(shingles, sh -> xxhash64(i, sh)))` columns —
  * k interpreted higher-order passes over the array, each re-hashing
  * every shingle STRING from scratch, with per-element lambda dispatch
  * outside WholeStageCodegen. Signature generation is the per-document
  * inner loop of every LSH dedup pass over a 100 TB corpus — exactly
  * where that costs. This expression hashes each shingle once
  * (xxhash64, Spark's own XXH64, seed 42 like the SQL function) and
  * derives the k signature entries via affine maps `h * A_k + B_k`
  * over Z/2^64 — odd multipliers make each map a bijection, the
  * standard universal-hashing MinHash construction — tracking all k
  * minima in one tight primitive loop (no boxing, no lambda dispatch,
  * stage stays codegen'd).
  *
  * The signature VALUES differ from the k-seeded-xxhash64 formulation
  * (any MinHash impl is a hash-family choice); the LSH guarantees are
  * family-independent and the planted-dup recall properties are
  * asserted in PropertySpec/LlmSpec over this implementation.
  */
case class MinhashSig(child: Expression, k: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if k >= 1 && k <= 64 =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash expects array<string> and 1 <= k <= 64, got ($t, $k)")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"

  override protected def nullSafeEval(a: Any): Any =
    MinhashSig.compute(a.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.MinhashSig.compute($a, $k);")

  override protected def withNewChildInternal(newChild: Expression): MinhashSig =
    copy(child = newChild)
}

object MinhashSig {
  /** Affine map constants, fixed for all time (signatures are stored/
    * compared across runs): splitmix64 outputs of 1..64, multipliers
    * forced odd so each map is a bijection on Z/2^64.
    */
  private val mult: Array[Long] = Array.tabulate(64)(i => splitmix(2L * i + 1) | 1L)
  private val add: Array[Long] = Array.tabulate(64)(i => splitmix(2L * i + 2))

  private def splitmix(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** One-pass k-minima; called from both eval and generated code. The
    * bound re-check matters for the public [[signatureOf]] path, which
    * bypasses the expression's type check — k > 64 would otherwise
    * crash into the constant arrays with a bare index error.
    */
  def compute(arr: ArrayData, k: Int): ArrayData = {
    require(k >= 1 && k <= 64, s"minhash k must be in [1, 64], got $k")
    val mins = Array.fill(k)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val h = XXH64.hashUnsafeBytes(
          s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        var j = 0
        while (j < k) {
          val v = h * mult(j) + add(j)
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
