package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the vector hot path.
  *
  * The generic route (`aggregate(zip_with(...))`) is a chain of
  * interpreted higher-order functions — correct, but each element pays
  * lambda-dispatch overhead and the expression tree is opaque to
  * whole-stage codegen. These expressions generate a tight Java loop
  * via `doGenCode`, so a brute-force kNN scan stays inside
  * WholeStageCodegen end-to-end — the difference between "interprets
  * 64 lambdas per row" and "runs a fused multiply-add loop" on a
  * 100 TB vector corpus.
  *
  * Numeric contract: LEFT-TO-RIGHT double accumulation over the
  * element range of the shorter input — exactly the semantics of the
  * `aggregate(zip_with(a, b, (x, y) -> cast(x AS double) * ...))`
  * formulation and of the DuckDB oracle, so swapping them in changes
  * nothing observable.
  */
abstract class VectorFoldExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"${prettyName} expects array<float|double> inputs, got " +
          s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
  }

  protected def elemGet(arr: String, i: String, t: DataType): String =
    t match {
      case ArrayType(FloatType, _) => s"(double) $arr.getFloat($i)"
      case _ => s"$arr.getDouble($i)"
    }

  protected def elemGetEval(arr: ArrayData, i: Int, t: DataType): Double =
    t match {
      case ArrayType(FloatType, _) => arr.getFloat(i).toDouble
      case _ => arr.getDouble(i)
    }
}

/** dot_f(a, b) — dot product with double accumulation. */
case class DotProduct(left: Expression, right: Expression) extends VectorFoldExpression {
  override def prettyName: String = "dot_f"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += elemGetEval(x, i, left.dataType) * elemGetEval(y, i, right.dataType)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ${elemGet(a, i, left.dataType)} * ${elemGet(b, i, right.dataType)};
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** cosine_f(a, b) — cosine similarity in one fused pass (dot and both
  * norms accumulate in the same loop, each left-to-right in double —
  * value-identical to computing the three folds separately).
  */
case class CosineSim(left: Expression, right: Expression) extends VectorFoldExpression {
  override def prettyName: String = "cosine_f"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var xy = 0.0; var xx = 0.0; var yy = 0.0
    var i = 0
    while (i < n) {
      val xv = elemGetEval(x, i, left.dataType)
      val yv = elemGetEval(y, i, right.dataType)
      xy += xv * yv; xx += xv * xv; yy += yv * yv
      i += 1
    }
    xy / (math.sqrt(xx) * math.sqrt(yy))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val xy = ctx.freshName("xy")
      val xx = ctx.freshName("xx")
      val yy = ctx.freshName("yy")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $xy = 0.0; double $xx = 0.0; double $yy = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = ${elemGet(a, i, left.dataType)};
         |  double $yv = ${elemGet(b, i, right.dataType)};
         |  $xy += $xv * $yv; $xx += $xv * $xv; $yy += $yv * $yv;
         |}
         |${ev.value} = $xy / (java.lang.Math.sqrt($xx) * java.lang.Math.sqrt($yy));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Registration — both as a [[org.apache.spark.sql.SparkSessionExtensions]]
  * installer (`spark.sql.extensions=graft.plans.GraftExtensions`) and as
  * an idempotent imperative call for sessions built without the config
  * (the driver harness constructs its own sessions).
  */
object VectorExprs {
  private[plans] val fns: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "dot_f" -> (c => DotProduct(c.head, c(1))),
    "cosine_f" -> (c => CosineSim(c.head, c(1))),
    "hash_tokens" -> (c => HashTokens(c.head)),
    "word_shingles" -> (c => WordShingles(c.head, c(1))),
    "minhash16" -> (c => MinHash16(c.head)),
    "simhash60" -> (c => SimHash60(c.head)))

  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    fns.foreach { case (name, builder) =>
      registry.registerFunction(
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[DotProduct].getName, name),
        builder)
    }
  }
}

/** `spark.sql.extensions` entry point. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    VectorExprs.fns.foreach { case (name, builder) =>
      ext.injectFunction(
        (FunctionIdentifier(name),
          new ExpressionInfo(classOf[DotProduct].getName, name),
          builder))
    }
}
