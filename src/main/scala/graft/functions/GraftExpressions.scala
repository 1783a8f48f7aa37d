package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.types.{DataType, DoubleType}

/** logit(p) = ln(p / (1 − p)) as a native Catalyst expression with
  * whole-stage codegen — the reference's hot scalar op
  * (/root/reference/axolotls/numeric_column.py:118-125) as a
  * first-class engine function rather than a composed tree or (worse)
  * a black-box UDF. Emits NaN/±Inf exactly like torch (never NULL for
  * non-NULL input), matching the reference's semantics where composed
  * `log(p/(1-p))` would yield NULL for p outside (0,1).
  */
case class LogitExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_logit"

  override protected def nullSafeEval(input: Any): Any = {
    val p = input.asInstanceOf[Double]
    java.lang.Math.log(p / (1.0 - p))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"java.lang.Math.log($c / (1.0 - $c))")

  override protected def withNewChildInternal(newChild: Expression): LogitExpr =
    copy(child = newChild)
}

/** Typed Aggregator UDAF: numerically-stable geometric mean via
  * log-space partial sums — map-side combine + mergeable buffers, the
  * distributed-aggregation contract (SURVEY.md §2.2 UDAF row).
  */
object GeoMeanAgg extends Aggregator[Double, (Double, Long), Double] {
  override def zero: (Double, Long) = (0.0, 0L)
  override def reduce(b: (Double, Long), a: Double): (Double, Long) =
    (b._1 + java.lang.Math.log(a), b._2 + 1)
  override def merge(x: (Double, Long), y: (Double, Long)): (Double, Long) =
    (x._1 + y._1, x._2 + y._2)
  override def finish(b: (Double, Long)): Double =
    if (b._2 == 0) Double.NaN else java.lang.Math.exp(b._1 / b._2)
  override def bufferEncoder = org.apache.spark.sql.Encoders.tuple(
    org.apache.spark.sql.Encoders.scalaDouble, org.apache.spark.sql.Encoders.scalaLong)
  override def outputEncoder = org.apache.spark.sql.Encoders.scalaDouble
}

/** Custom Generator (UDTF): explode a text column into its word
  * n-gram shingles — one output row per shingle, the engine-level
  * building block under the dedup operators (SURVEY.md §2.2 UDTF row).
  * CodegenFallback is standard for generators (they emit row sets).
  */
case class ExplodeShingles(child: Expression, n: Expression)
    extends org.apache.spark.sql.catalyst.expressions.Generator
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.types.{StringType, StructField, StructType}
  import org.apache.spark.unsafe.types.UTF8String

  override def elementSchema: StructType =
    StructType(StructField("shingle", StringType) :: Nil)

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = child.eval(input)
    if (t == null) Nil
    else {
      val words = t.asInstanceOf[UTF8String].toString.split(" ")
      val k = n.eval(input).asInstanceOf[Int]
      val m = math.max(words.length - k + 1, 1)
      (0 until m).map(i =>
        InternalRow(UTF8String.fromString(words.slice(i, i + k).mkString(" "))))
    }
  }

  override def children: Seq[Expression] = Seq(child, n)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ExplodeShingles =
    copy(child = newChildren(0), n = newChildren(1))
}

/** Session-level registration of graft's native functions (idempotent).
  * Also installable via `spark.sql.extensions=graft.GraftExtensions`.
  */
object GraftRegistry {

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_logit",
      (exprs: Seq[Expression]) => LogitExpr(Cast(exprs.head, DoubleType)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "explode_shingles",
      (exprs: Seq[Expression]) => ExplodeShingles(exprs.head, exprs(1)), "built-in")
    spark.udf.register("graft_geomean",
      org.apache.spark.sql.functions.udaf(GeoMeanAgg))
  }
}
