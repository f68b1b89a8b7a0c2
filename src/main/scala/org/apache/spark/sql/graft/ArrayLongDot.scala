package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType}

/** Native codegen'd integer dot product over two `array<bigint>` columns.
  *
  * The composable formulation — `aggregate(zip_with(a, b, _*_), 0, _+_)` —
  * is a higher-order-function chain Catalyst cannot codegen: each compared
  * pair allocates a zipped array and interprets two lambdas per element,
  * which dominates the O(|Q|·|C|) similarity stages. This expression
  * compiles to a tight primitive `for` loop inside WholeStageCodegen (no
  * allocation, no virtual calls) while preserving the same left-to-right
  * summation — results are bit-identical to the HOF version and to the
  * DuckDB oracle's `list_dot_product`.
  *
  * The one place (SURVEY §7.3) the engine drops below the DataFrame API: a
  * scalar expression the built-ins can't express efficiently, per the
  * custom-operator preference order (expression > custom plan node >
  * mapPartitions). Lives in the spark.sql namespace for access to the
  * `private[sql]` expression-to-Column bridge.
  */
case class ArrayLongDot(left: Expression, right: Expression,
                        strict: Boolean = false)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def nullable: Boolean = strict || super.nullable
  override def prettyName: String = "array_long_dot"

  /** strict = HOF-exact semantics for the optimizer-rule rewrite of
    * aggregate(zip_with(a,b,*),0,+): zip_with pads the shorter array and a
    * null product nulls the whole sum, so unequal lengths or any null
    * element yield NULL. Non-strict (the engine's own call sites, which
    * guarantee dense equal-length vectors) keeps the branch-free loop. */
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (strict) {
      if (x.numElements() != y.numElements()) return null
      var s = 0L
      var i = 0
      while (i < x.numElements()) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        s += x.getLong(i) * y.getLong(i)
        i += 1
      }
      s
    } else {
      val n = math.min(x.numElements(), y.numElements())
      var s = 0L
      var i = 0
      while (i < n) { s += x.getLong(i) * y.getLong(i); i += 1 }
      s
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (strict) {
      val cls = classOf[ArrayLongDot].getName
      val ref = ctx.addReferenceObj("dotExpr", this, cls)
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val r = ctx.freshName("r")
        s"""
           |Object $r = $ref.nullSafeEval($a, $b);
           |if ($r == null) { ${ev.isNull} = true; }
           |else { ${ev.value} = ((Long) $r).longValue(); }
         """.stripMargin
      })
    } else nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): ArrayLongDot =
    copy(left = newLeft, right = newRight)
}

object ArrayLongDot {
  /** Column API: exact integer dot product of two array<bigint> columns. */
  def apply(a: Column, b: Column): Column =
    ExpressionUtils.column(
      ArrayLongDot(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
