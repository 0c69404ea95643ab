package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}

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

  /** sorted_intersect_size(a, b) = |A ∩ B| for two SORTED-ascending
    * distinct long arrays (the shape `Dedup.shingleArrays*` emit) — a
    * single allocation-free merge scan instead of `size(array_intersect)`,
    * which builds an OpenHashSet AND materializes the intersection array
    * per pair only to take its length. On the dedup verify stage the pair
    * count is what scales, so the per-pair constant is the hot path.
    *
    * PRECONDITION (unchecked, documented): both arrays sorted ascending
    * with distinct elements. On unsorted input the merge undercounts —
    * callers own the invariant, which shingleArrays guarantees at build
    * time. Null array → null; null element → null (same discipline as
    * [[DotProduct]]).
    */
  case class SortedIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

    override def dataType: DataType = IntegerType

    override def nullable: Boolean = true

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val (nx, ny) = (x.numElements(), y.numElements())
      var i = 0; var j = 0; var c = 0
      while (i < nx && j < ny) {
        if (x.isNullAt(i) || y.isNullAt(j)) return null
        val u = x.getLong(i); val v = y.getLong(j)
        if (u < v) i += 1
        else if (u > v) j += 1
        else { c += 1; i += 1; j += 1 }
      }
      c
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
        val i = ctx.freshName("i"); val j = ctx.freshName("j")
        val c = ctx.freshName("c")
        val u = ctx.freshName("u"); val v = ctx.freshName("v")
        s"""
           |int $nx = $a.numElements();
           |int $ny = $b.numElements();
           |int $i = 0, $j = 0, $c = 0;
           |while ($i < $nx && $j < $ny) {
           |  if ($a.isNullAt($i) || $b.isNullAt($j)) { ${ev.isNull} = true; break; }
           |  long $u = $a.getLong($i);
           |  long $v = $b.getLong($j);
           |  if ($u < $v) $i++;
           |  else if ($u > $v) $j++;
           |  else { $c++; $i++; $j++; }
           |}
           |${ev.value} = $c;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
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

  private def asLongArray(e: Expression): Expression =
    Cast(e, ArrayType(LongType, containsNull = true))

  def sorted_intersect_size(a: Column, b: Column): Column =
    GraftSqlBridge.column(SortedIntersectSize(
      asLongArray(GraftSqlBridge.expression(a)),
      asLongArray(GraftSqlBridge.expression(b))))

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

  def intersectSizeBuilder(children: Seq[Expression]): Expression = {
    require(children.length == 2,
      s"sorted_intersect_size expects 2 arguments, got ${children.length}")
    SortedIntersectSize(asLongArray(children(0)), asLongArray(children(1)))
  }
}
