package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for the embedding dot product.
  *
  * Why a custom Expression (SURVEY.md §4 extension ladder): the
  * built-in formulation `aggregate(zip_with(a, b, _*_), 0d, _+_)` is a
  * higher-order function — evaluated INTERPRETED, per lambda-element,
  * outside WholeStageCodegen. For similarity search the dot product is
  * the innermost loop over every candidate pair × dimension, exactly
  * where codegen matters at 100 TB. This expression generates a tight
  * primitive float loop (no lambda dispatch, no boxing) via doGenCode,
  * with an interpreted eval fallback. Null elements contribute 0.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_dot expects (array<float>, array<float>), got ($l, $r)")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0; var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i))
        acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  private val ident = FunctionIdentifier("graft_dot")
  private val mhIdent = FunctionIdentifier("graft_minhash")
  private val shIdent = FunctionIdentifier("graft_shingles")
  private val nfcIdent = FunctionIdentifier("graft_nfc")
  private val bpeIdent = FunctionIdentifier("graft_bpe")
  private val mh48Ident = FunctionIdentifier("graft_minhash48")
  private val s128Ident = FunctionIdentifier("graft_sum128")
  private val pairsIdent = FunctionIdentifier("graft_pairs")
  private val vgIdent = FunctionIdentifier("graft_variant_gets")
  private val jvIdent = FunctionIdentifier("graft_json_valid")

  /** Register once per session; safe to call repeatedly. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      ident,
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => DotProduct(children.head, children(1)))
    spark.sessionState.functionRegistry.registerFunction(
      mhIdent,
      new ExpressionInfo(classOf[MinhashSig].getName, "graft_minhash"),
      (children: Seq[Expression]) => MinhashSig(children.head,
        intLiteral("graft_minhash", children(1))))
    spark.sessionState.functionRegistry.registerFunction(
      shIdent,
      new ExpressionInfo(classOf[Shingles].getName, "graft_shingles"),
      (children: Seq[Expression]) => Shingles(children.head,
        intLiteral("graft_shingles", children(1))))
    spark.sessionState.functionRegistry.registerFunction(
      nfcIdent,
      new ExpressionInfo(classOf[NfcNormalize].getName, "graft_nfc"),
      (children: Seq[Expression]) => NfcNormalize(children.head))
    spark.sessionState.functionRegistry.registerFunction(
      bpeIdent,
      new ExpressionInfo(classOf[BpeEncode].getName, "graft_bpe"),
      (children: Seq[Expression]) => BpeEncode(children.head,
        stringArrayLiteral("graft_bpe", children(1))))
    spark.sessionState.functionRegistry.registerFunction(
      mh48Ident,
      new ExpressionInfo(classOf[Minhash48].getName, "graft_minhash48"),
      (children: Seq[Expression]) => Minhash48(children.head,
        intLiteral("graft_minhash48", children(1))))
    spark.sessionState.functionRegistry.registerFunction(
      s128Ident,
      new ExpressionInfo(classOf[Sum128].getName, "graft_sum128"),
      (children: Seq[Expression]) => Sum128(children.head))
    spark.sessionState.functionRegistry.registerFunction(
      pairsIdent,
      new ExpressionInfo(classOf[PairsOf].getName, "graft_pairs"),
      (children: Seq[Expression]) => PairsOf(children.head))
    spark.sessionState.functionRegistry.registerFunction(
      vgIdent,
      new ExpressionInfo(classOf[VariantGets].getName, "graft_variant_gets"),
      (children: Seq[Expression]) => VariantGets(children.head,
        children.tail.map(c => VariantGets.parseSpec(
          stringLiteral("graft_variant_gets", c)))))
    spark.sessionState.functionRegistry.registerFunction(
      jvIdent,
      new ExpressionInfo(classOf[JsonValid].getName, "graft_json_valid"),
      (children: Seq[Expression]) => JsonValid(children.head))
  }

  /** Second arguments of the custom functions must be integral literals
    * (they parameterize the generated code). A clear analysis error
    * beats the raw ClassCastException / Unevaluable a blind
    * `eval().asInstanceOf[Int]` throws on `CAST(16 AS BIGINT)` or a
    * column argument.
    */
  /** The merge table parameterizes [[BpeEncode]]'s generated code, so
    * it must arrive as a FOLDABLE array<string> (`lit(Array(...))`) —
    * a per-row column argument would mean re-parsing the table per
    * row and defeats the codegen reference object.
    */
  private def stringArrayLiteral(fn: String, e: Expression): Seq[String] =
    e.dataType match {
      case ArrayType(org.apache.spark.sql.types.StringType, _) if e.foldable =>
        val a = e.eval(null).asInstanceOf[ArrayData]
        (0 until a.numElements()).map(i => a.getUTF8String(i).toString)
      case other => throw new IllegalArgumentException(
        s"$fn expects a foldable array<string> second argument, got: $other")
    }

  private def stringLiteral(fn: String, e: Expression): String = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: org.apache.spark.unsafe.types.UTF8String, org.apache.spark.sql.types.StringType) =>
      v.toString
    case other => throw new IllegalArgumentException(
      s"$fn expects string literal spec arguments, got: $other")
  }

  private def intLiteral(fn: String, e: Expression): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _)
        if v.isValidInt => v.toInt
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Short, _) => v.toInt
    case other => throw new IllegalArgumentException(
      s"$fn expects an integer literal as its second argument, got: $other")
  }

  /** Column-API surface for the codegen'd dot product. */
  def dotProduct(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    call_function("graft_dot", a, b)
  }
}
