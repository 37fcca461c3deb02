package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Add, AttributeReference,
  BitwiseAnd, Cast, Expression, If, IsNull, Literal, Multiply, ShiftRight}
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, Decimal, DecimalType, LongType}

/** Exact 128-bit integer SUM as a [[DeclarativeAggregate]] — the
  * fast path under every integer-moment statistic (corrMatrix's
  * Σx²/Σxy at scale-2 products reach ~1e14 per row; a 100 TB group
  * sum needs far more than int64).
  *
  * Why not `sum(CAST(x AS DECIMAL(38,0)))`: an aggregation buffer
  * holding a decimal wider than 18 digits leaves UnsafeRow's compact
  * long slot, so EVERY per-row update deserializes a BigInteger, adds
  * through java.math.BigDecimal, and reserializes — measured at ~2×
  * the whole aggregate's runtime with 15 such buffers (agg_corr
  * 2.2 s → 1.0 s after switching). This aggregate instead keeps TWO
  * long buffer slots as base-2^62 limbs; update and merge are pure
  * long adds and bit ops (shift/mask — no division), so the whole
  * stage stays inside WholeStageCodegen, and the exact range is
  * 2^124 ≈ 2.1e37 — decimal(38)-class headroom with long-add costs.
  *
  * Contract: input is LongType, every value in (−2^62, 2^62) —
  * SIGNED addends are exact (r18; formerly documented non-negative,
  * but the algebra never needed that): with t = lo + x the update
  * writes hi += t >> 62 (ARITHMETIC shift) and lo = t & (2^62 − 1),
  * and (t >> 62)·2^62 + (t & mask) = t for every long t, so the
  * invariant value = hi·2^62 + lo is preserved for negative x too —
  * lo stays in [0, 2^62) and hi carries the sign (a borrow is just a
  * negative carry). t cannot overflow: lo < 2^62 and |x| < 2^62 keep
  * t in (−2^62, 2^63). NULLs add 0 and an empty group evaluates to 0
  * (NOT NULL — callers that need SQL's all-null → NULL semantics
  * keep plain sum or count-guard the emit). The final value
  * materializes once per group as DECIMAL(38,0) = hi·2^62 + lo
  * (negative hi descends through the decimal cast exactly).
  * Bit-equality with a BigInt fold is property-pinned in
  * PropertySpec, including forced carries and signed borrows.
  */
case class Sum128(child: Expression) extends DeclarativeAggregate
    with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_sum128 expects a bigint column, got $t")
  }
  override def dataType: DataType = DecimalType(38, 0)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_sum128"

  private lazy val hi = AttributeReference("hi", LongType, nullable = false)()
  private lazy val lo = AttributeReference("lo", LongType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(hi, lo)
  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(0L), Literal(0L))

  // lo' = (lo + x) & (2^62 − 1); hi' = hi + ((lo + x) >> 62).
  // lo ∈ [0, 2^62) and |x| < 2^62, so lo + x ∈ (−2^62, 2^63) — no
  // long overflow, and the arithmetic shift extracts the one possible
  // carry (−1, 0 or +1; −1 is the borrow of a signed addend).
  override lazy val updateExpressions: Seq[Expression] = {
    val x = If(IsNull(child), Literal(0L), child)
    val t = Add(lo, x)
    Seq(
      Add(hi, ShiftRight(t, Literal(62))),
      BitwiseAnd(t, Literal((1L << 62) - 1)))
  }

  // Same shape limb-wise: each side's lo < 2^62, so their sum carries
  // at most one bit; hi limbs add directly (range 2^124 total).
  override lazy val mergeExpressions: Seq[Expression] = {
    val t = Add(lo.left, lo.right)
    Seq(
      Add(Add(hi.left, hi.right), ShiftRight(t, Literal(62))),
      BitwiseAnd(t, Literal((1L << 62) - 1)))
  }

  // hi·2^62 + lo, reconstructed once per group in decimal.
  override lazy val evaluateExpression: Expression =
    Add(
      Multiply(
        Cast(hi, DecimalType(38, 0)),
        Literal(Decimal(BigDecimal(BigInt(1) << 62), 38, 0),
          DecimalType(38, 0))),
      Cast(lo, DecimalType(38, 0)))

  override protected def withNewChildInternal(newChild: Expression): Sum128 =
    copy(child = newChild)
}
