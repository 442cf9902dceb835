package htmlspark.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression for cosine similarity of two float vectors —
  * the one place this engine drops below the built-in operator surface
  * (brief preference order: compose built-ins > native Expression > UDF).
  *
  * The composed-built-ins version (`aggregate(zip_with(...))`, kept in
  * AnnOps as the fallback) is semantically identical but evaluates the
  * higher-order lambdas INTERPRETED with boxed accumulators — three array
  * traversals per score, each through a lambda-variable indirection. This
  * expression participates in whole-stage codegen: one fused loop over the
  * unsafe array data, primitive doubles throughout.
  *
  * Bitwise parity with the fallback is load-bearing (driver oracles
  * hash-compare): accumulation is in ascending index order for all three
  * sums, exactly like the zip_with/aggregate chain and the Verify-side
  * naive kernel — the three paths produce identical doubles.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  // ExpectsInputTypes is off-limits (AbstractDataType is private[sql] in
  // Spark 4's sql-api), so input validation is a manual type check.
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"cosine_sim expects (array<float>, array<float>), got ($l, $r)")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  // NULL parity with the HOF fallback: zip_with pads a shorter array with
  // nulls and aggregate propagates them, so the HOF chain yields NULL for
  // mismatched lengths or null elements — this expression must too, or
  // which-path-ran would leak into oracle hashes.
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var ab = 0.0; var aa = 0.0; var bb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = x.getFloat(i).toDouble
      val yv = y.getFloat(i).toDouble
      ab += xv * yv; aa += xv * xv; bb += yv * yv
      i += 1
    }
    ab / (math.sqrt(aa) * math.sqrt(bb))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // fresh locals: two cosine_sim instances can share one codegen scope
      // (nullSafeCodeGen emits the body unbraced for non-nullable inputs)
      val n = ctx.freshName("n")
      val ab = ctx.freshName("ab")
      val aa = ctx.freshName("aa")
      val bb = ctx.freshName("bb")
      val i = ctx.freshName("i")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $ab = 0.0, $aa = 0.0, $bb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $x = (double) $a.getFloat($i);
         |    double $y = (double) $b.getFloat($i);
         |    $ab += $x * $y; $aa += $x * $x; $bb += $y * $y;
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $ab / (java.lang.Math.sqrt($aa) * java.lang.Math.sqrt($bb));
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Session extension registering `cosine_sim` (enable with
  * `spark.sql.extensions=htmlspark.functions.GraftExtensions`). Operators
  * fall back to the composed-built-ins cosine when absent, so a vanilla
  * session still works — just without the fused codegen loop. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2,
          s"cosine_sim expects exactly 2 arguments (array<float>, " +
            s"array<float>), got ${exprs.length}")
        CosineSimilarity(exprs.head, exprs(1))
      }))
}
