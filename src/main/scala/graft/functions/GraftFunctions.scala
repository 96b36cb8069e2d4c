package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}
import org.apache.spark.sql.SparkSessionExtensions

/** Native Catalyst cosine similarity over two array<double> columns.
  *
  * The higher-order-function formulation (aggregate + zip_with, see
  * PipelineQueries.cosine) is CodegenFallback — every element evaluation is
  * interpreted. This expression generates a fused Java loop (dot product and
  * both norms in one pass), keeping the whole stage inside codegen — the
  * preferred extension tier when built-ins can't express the computation
  * efficiently (custom Expression > UDF).
  *
  * Semantics match the HOF version bit-for-bit: element-order sequential
  * accumulation, dot / (sqrt(na) * sqrt(nb)); null-free input arrays
  * assumed (embedding vectors). Arrays of unequal length use the common
  * prefix for the dot product and each array's full length for its norm —
  * same as zip_with's null-padding followed by aggregate ignoring nulls
  * would NOT do, so equal lengths are the supported contract (enforced by
  * the embedding pipeline's fixed dimension).
  */
case class ArrayCosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _                        => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_similarity requires array<double> inputs, " +
        s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "cosine_similarity"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i); val y = b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    i = n
    while (i < a.numElements()) { val x = a.getDouble(i); na += x * x; i += 1 }
    i = n
    while (i < b.numElements()) { val y = b.getDouble(i); nb += y * y; i += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = $a.getDouble($i); double $y = $b.getDouble($i);
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |for (int $i = $n; $i < $a.numElements(); $i++) {
         |  double $x = $a.getDouble($i); $na += $x * $x;
         |}
         |for (int $i = $n; $i < $b.numElements(); $i++) {
         |  double $y = $b.getDouble($i); $nb += $y * $y;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native Catalyst dot product over two array<double> columns — the
  * random-hyperplane LSH hot path (32 sign bits per vector in q34): the HOF
  * formulation is CodegenFallback, this stays inside whole-stage codegen.
  * Sequential element-order accumulation over the common prefix, matching
  * both the HOF fold and DuckDB's list_dot_product at 6 dp.
  */
case class ArrayDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _                        => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product requires array<double> inputs, " +
        s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "dot_product"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) { dot += a.getDouble(i) * b.getDouble(i); i += 1 }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Typed UDAF (SURVEY §2.2 last row): per-group numeric summary as a single
  * Aggregator — partial-aggregable (map-side combine via merge), so it
  * shuffles one small buffer per group, not rows.
  */
case class NumSummary(n: Long, sum: Double, min: Double, max: Double)

object SummaryAggregator extends Aggregator[Double, NumSummary, NumSummary] {
  override def zero: NumSummary =
    NumSummary(0L, 0.0, Double.PositiveInfinity, Double.NegativeInfinity)
  override def reduce(b: NumSummary, v: Double): NumSummary =
    NumSummary(b.n + 1, b.sum + v, math.min(b.min, v), math.max(b.max, v))
  override def merge(a: NumSummary, b: NumSummary): NumSummary =
    NumSummary(a.n + b.n, a.sum + b.sum, math.min(a.min, b.min), math.max(a.max, b.max))
  override def finish(r: NumSummary): NumSummary = r
  override def bufferEncoder: Encoder[NumSummary] = Encoders.product[NumSummary]
  override def outputEncoder: Encoder[NumSummary] = Encoders.product[NumSummary]
}

/** Registration: direct (per-session FunctionRegistry) and via
  * SparkSessionExtensions for `spark.sql.extensions=graft.functions.GraftExtensions`.
  */
object GraftFunctions {

  private val cosineInfo = new ExpressionInfo(
    classOf[ArrayCosineSimilarity].getName, "cosine_similarity")

  private val cosineBuilder: Seq[Expression] => Expression = { children =>
    require(children.size == 2, "cosine_similarity takes exactly 2 arguments")
    ArrayCosineSimilarity(children.head, children(1))
  }

  private val dotInfo = new ExpressionInfo(
    classOf[ArrayDotProduct].getName, "dot_product")

  private val dotBuilder: Seq[Expression] => Expression = { children =>
    require(children.size == 2, "dot_product takes exactly 2 arguments")
    ArrayDotProduct(children.head, children(1))
  }

  /** Idempotently register SQL-callable functions on an existing session. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("cosine_similarity"), cosineInfo, cosineBuilder)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("dot_product"), dotInfo, dotBuilder)
    spark.udf.register("num_summary",
      org.apache.spark.sql.functions.udaf(SummaryAggregator))
  }
}

/** `--conf spark.sql.extensions=graft.functions.GraftExtensions` injects the
  * native functions at session build (the deployment path; tests use
  * GraftFunctions.register on the shared session).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[ArrayCosineSimilarity].getName, "cosine_similarity"),
      (children: Seq[Expression]) =>
        ArrayCosineSimilarity(children.head, children(1))))
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[ArrayDotProduct].getName, "dot_product"),
      (children: Seq[Expression]) =>
        ArrayDotProduct(children.head, children(1))))
  }
}
