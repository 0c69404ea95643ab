package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expressions for the vector-similarity hot path.
  *
  * Spark's higher-order functions (`zip_with` + `aggregate`) are
  * interpreted — each lambda evaluation goes through the expression tree
  * per element, outside whole-stage codegen. For an all-pairs similarity
  * scan that means ~dim × pairs interpreted evaluations. These expressions
  * generate a tight Java loop over the `ArrayData` (primitive `getDouble`
  * access, no boxing, inlined into WholeStageCodegen), which is the
  * preference order from SURVEY.md §4.2: codegen Expression > UDF > HOF
  * for hot loops.
  *
  * Summation is strictly left-to-right in double precision — identical to
  * both the HOF formulation and the DuckDB oracle's list_sum, so results
  * are bit-equal and oracle checks are unaffected.
  */
object VectorExpressions {

  /** dot(a, b) = Σ a[i]·b[i] over the common prefix length. */
  case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

    override def dataType: DataType = DoubleType

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
        val i = ctx.freshName("i")
        val s = ctx.freshName("s")
        s"""
           |int $n = Math.min($a.numElements(), $b.numElements());
           |double $s = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $s += $a.getDouble($i) * $b.getDouble($i);
           |}
           |${ev.value} = $s;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** l2norm(a) = sqrt(Σ a[i]²). */
  case class L2Norm(child: Expression)
    extends UnaryExpression {

    override def dataType: DataType = DoubleType

    override def nullSafeEval(a: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val n = x.numElements()
      var s = 0.0
      var i = 0
      while (i < n) { val v = x.getDouble(i); s += v * v; i += 1 }
      math.sqrt(s)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val s = ctx.freshName("s")
        val v = ctx.freshName("v")
        s"""
           |int $n = $a.numElements();
           |double $s = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double $v = $a.getDouble($i);
           |  $s += $v * $v;
           |}
           |${ev.value} = Math.sqrt($s);
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Column-API entry points. Inputs must be array<double> (callers cast
    * once via `transform(c, _.cast("double"))`).
    */
  def vec_dot(a: Column, b: Column): Column =
    GraftSqlBridge.column(DotProduct(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  def vec_norm(a: Column): Column =
    GraftSqlBridge.column(L2Norm(GraftSqlBridge.expression(a)))
}
