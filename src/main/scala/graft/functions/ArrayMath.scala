// Lives in the org.apache.spark.sql namespace: AbstractDataType and the
// Column<->Expression bridge (classic.ExpressionUtils) are private[sql].
// This is the standard packaging for third-party native expressions.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType}

/** Native Catalyst expression for the dense-vector hot path.
  *
  * `zip_with`+`aggregate` (higher-order functions) build intermediate
  * arrays and evaluate lambdas per element — measured ~5x slower than a
  * fused loop on the embedding-similarity operators, which evaluate
  * millions of pairs. This expression code-generates a single primitive
  * loop (no allocation, stays inside whole-stage codegen).
  *
  * Precondition: element nulls are not expected (embedding vectors are
  * dense); a null element reads as 0.0 via ArrayData.getDouble semantics.
  */
case class DotProductDouble(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product_double"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double $s = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          $s += $a.getDouble($i) * $b.getDouble($i);
        }
        ${ev.value} = $s;
      """
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): DotProductDouble =
    copy(left = newLeft, right = newRight)
}

object ArrayMath {
  /** Column-level entry for [[DotProductDouble]]. */
  def dotNative(a: Column, b: Column): Column =
    ExpressionUtils.column(DotProductDouble(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Imperative SQL registration for an already-built session (the
    * `spark.sql.extensions=graft.plans.GraftExtensions` config path covers
    * sessions built from config).
    */
  def registerSql(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot",
      exprs => {
        require(exprs.length == 2, "graft_dot(a, b) takes exactly 2 array<double> arguments")
        DotProductDouble(exprs.head, exprs(1))
      },
      "built-in")
}
