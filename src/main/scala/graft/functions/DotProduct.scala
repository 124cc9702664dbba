package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._
import org.apache.spark.sql.SparkSessionExtensions

/**
 * Native Catalyst expression: dot product of two numeric arrays with strict
 * left-to-right double accumulation — semantically identical to
 * `aggregate(zip_with(a, b, (x, y) => x * y), 0d, _ + _)` but compiled to a
 * tight primitive loop inside whole-stage codegen instead of two interpreted
 * higher-order functions allocating an intermediate array per row. This is
 * the §4.3 "custom Expression only where built-ins can't express it fast
 * enough" path: the similarity-search hot loop runs this once per candidate
 * pair.
 *
 * Null semantics mirror the HOF composition: null input array, length
 * mismatch, or a null element → null result.
 */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression): Boolean = e.dataType match {
      case ArrayType(t, _) => Seq(FloatType, DoubleType, IntegerType,
        LongType).contains(t)
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product expects numeric arrays, got ${left.dataType.sql} and " +
        s"${right.dataType.sql}")
  }

  private def get(arr: ArrayData, i: Int, t: DataType): Double = t match {
    case DoubleType => arr.getDouble(i)
    case FloatType => arr.getFloat(i).toDouble
    case LongType => arr.getLong(i).toDouble
    case IntegerType => arr.getInt(i).toDouble
    case other => throw new IllegalStateException(s"unexpected $other")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val (lt, rt) = (elemType(left), elemType(right))
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += get(x, i, lt) * get(y, i, rt)
      i += 1
    }
    acc
  }

  private def getterJava(arr: String, i: String, t: DataType): String =
    t match {
      case DoubleType => s"$arr.getDouble($i)"
      case FloatType => s"(double) $arr.getFloat($i)"
      case LongType => s"(double) $arr.getLong($i)"
      case IntegerType => s"(double) $arr.getInt($i)"
      case other => throw new IllegalStateException(s"unexpected $other")
    }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += ${getterJava(a, i, elemType(left))}
         |      * ${getterJava(b, i, elemType(right))};
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "dot_product"
}

object DotProduct {
  /** Column-level entry point used by graft.ops.Similarity. */
  def apply(a: Column, b: Column): Column =
    ColumnShim.column(DotProduct(
      ColumnShim.expression(a), ColumnShim.expression(b)))
}

/** SparkSessionExtensions hook: registers `dot_product(a, b)` and
  * `minhash_sigs(arr, k)` for SQL use and the
  * [[graft.plans.DotProductRewrite]] optimizer rule (HOF pattern →
  * native expression). Enable with
  * `spark.sql.extensions=graft.functions.GraftExtensions`, or
  * `GraftExtensions.register(spark)` on an already-built session. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("dot_product"),
      GraftExtensions.info,
      GraftExtensions.builder))
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("minhash_sigs"),
      GraftExtensions.mhInfo,
      GraftExtensions.mhBuilder))
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("jaro_winkler"),
      GraftExtensions.jwInfo,
      GraftExtensions.jwBuilder))
    ext.injectOptimizerRule(_ => graft.plans.DotProductRewrite)
    ext.injectOptimizerRule(_ => graft.plans.PivotFusion)
  }
}

object GraftExtensions {
  private[graft] val info =
    new ExpressionInfo(classOf[DotProduct].getName, "dot_product")
  private[graft] val builder: Seq[Expression] => Expression =
    children => DotProduct(children(0), children(1))
  private[graft] val mhInfo =
    new ExpressionInfo(classOf[MinHashSigs].getName, "minhash_sigs")
  private[graft] val mhBuilder: Seq[Expression] => Expression = children => {
    val k = children(1) match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, t)
        if t == IntegerType => v
      case _ => throw new IllegalArgumentException(
        "minhash_sigs(arr, k): k must be an integer literal")
    }
    MinHashSigs(children(0), k)
  }

  private[graft] val jwInfo =
    new ExpressionInfo(classOf[JaroWinklerSim].getName, "jaro_winkler")
  private[graft] val jwBuilder: Seq[Expression] => Expression =
    children => JaroWinklerSim(children(0), children(1))

  /** Register on an existing session (extensions config only affects
    * sessions built afterwards). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    org.apache.spark.sql.graftshim.ColumnShim.registerFunction(
      spark, "dot_product", info, builder)
    org.apache.spark.sql.graftshim.ColumnShim.registerFunction(
      spark, "minhash_sigs", mhInfo, mhBuilder)
    org.apache.spark.sql.graftshim.ColumnShim.registerFunction(
      spark, "jaro_winkler", jwInfo, jwBuilder)
  }
}
