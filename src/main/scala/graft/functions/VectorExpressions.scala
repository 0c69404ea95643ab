package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

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

  /** Analysis-time input discipline: any child that is not already
    * array<double> goes through a Cast (array<float> — the fixture's
    * embedding type — casts element-wise; non-array inputs fail analysis
    * with Cast's resolution error). Identity casts are removed by
    * SimplifyCasts, so pre-cast callers pay nothing. This replaces
    * ExpectsInputTypes, whose AbstractDataType signature is private[sql].
    */
  private def asDoubleArray(e: Expression): Expression =
    Cast(e, ArrayType(DoubleType, containsNull = true))

  /** dot(a, b) = Σ a[i]·b[i] over the common prefix length.
    * Null semantics: a null ARRAY yields null (null-safe eval); a null
    * ELEMENT also yields null — a dot product with missing components has
    * no honest numeric value (reading it via getDouble would silently
    * treat it as garbage/0).
    */
  case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

    override def dataType: DataType = DoubleType

    override def nullable: Boolean = true // null elements => null result

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var s = 0.0
      var i = 0
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        s += x.getDouble(i) * y.getDouble(i); i += 1
      }
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
           |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
           |  $s += $a.getDouble($i) * $b.getDouble($i);
           |}
           |${ev.value} = $s;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** l2norm(a) = sqrt(Σ a[i]²). Null element => null result (see
    * [[DotProduct]] for the rationale).
    */
  case class L2Norm(child: Expression)
    extends UnaryExpression {

    override def dataType: DataType = DoubleType

    override def nullable: Boolean = true // null elements => null result

    override def nullSafeEval(a: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val n = x.numElements()
      var s = 0.0
      var i = 0
      while (i < n) {
        if (x.isNullAt(i)) return null
        val v = x.getDouble(i); s += v * v; i += 1
      }
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
           |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
           |  double $v = $a.getDouble($i);
           |  $s += $v * $v;
           |}
           |${ev.value} = Math.sqrt($s);
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Column-API entry points. Any numeric-array input is accepted — a Cast
    * to array<double> is inserted at analysis (no-op when already double),
    * so calling these directly on the fixture's array<float> embedding
    * column is safe; non-castable inputs fail analysis.
    */
  def vec_dot(a: Column, b: Column): Column =
    GraftSqlBridge.column(DotProduct(
      asDoubleArray(GraftSqlBridge.expression(a)),
      asDoubleArray(GraftSqlBridge.expression(b))))

  def vec_norm(a: Column): Column =
    GraftSqlBridge.column(L2Norm(asDoubleArray(GraftSqlBridge.expression(a))))

  /** Expression builders for SQL registration (GraftExtensions) — same
    * analysis-time cast discipline as the Column API.
    */
  def dotBuilder(children: Seq[Expression]): Expression = {
    require(children.length == 2, s"vec_dot expects 2 arguments, got ${children.length}")
    DotProduct(asDoubleArray(children(0)), asDoubleArray(children(1)))
  }

  def normBuilder(children: Seq[Expression]): Expression = {
    require(children.length == 1, s"vec_norm expects 1 argument, got ${children.length}")
    L2Norm(asDoubleArray(children.head))
  }
}
