package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for text normalization.
  *
  * Spark has no built-in Unicode normalizer (DuckDB ships `nfc_normalize`,
  * ICU-backed engines ship `normalize(...)`), and a pipeline that hashes,
  * shingles or dedups text MUST canonicalize combining sequences first —
  * "é" as U+00E9 and as "e"+U+0301 are different strings to every hash in
  * the library while being the same text to a reader. Per the SURVEY.md
  * §4.2 preference order this is a codegen `Expression` (not a UDF): the
  * per-row work inlines into WholeStageCodegen with a fast no-allocation
  * path for already-normalized input, which at 100 TB is almost every row
  * (real corpora are overwhelmingly ASCII/NFC already, and
  * `Normalizer.isNormalized` on ASCII is a linear scan with no
  * allocation).
  */
object TextExpressions {

  /** nfc_normalize(s): Unicode NFC (canonical decomposition followed by
    * canonical composition, UAX #15) via `java.text.Normalizer`. Null in,
    * null out; already-NFC strings (the common case) return the input
    * value without allocating. Matches DuckDB's `nfc_normalize` — both
    * implement the same Unicode normalization form, so the expression
    * carries full value oracles.
    */
  case class NfcNormalize(child: Expression) extends UnaryExpression {

    override def dataType: DataType = StringType

    override def nullSafeEval(s: Any): Any = {
      val in = s.asInstanceOf[UTF8String]
      val str = in.toString
      if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) in
      else UTF8String.fromString(
        java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        val str = ctx.freshName("str")
        s"""
           |java.lang.String $str = $c.toString();
           |if (java.text.Normalizer.isNormalized($str, java.text.Normalizer.Form.NFC)) {
           |  ${ev.value} = $c;
           |} else {
           |  ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
           |    java.text.Normalizer.normalize($str, java.text.Normalizer.Form.NFC));
           |}
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Analysis-time input discipline (the [[VectorExpressions]] pattern):
    * non-string children go through a Cast; identity casts are removed by
    * SimplifyCasts.
    */
  private def asString(e: Expression): Expression = Cast(e, StringType)

  def nfc_normalize(s: Column): Column =
    GraftSqlBridge.column(NfcNormalize(asString(GraftSqlBridge.expression(s))))

  def nfcBuilder(children: Seq[Expression]): Expression = {
    require(children.length == 1, s"nfc_normalize expects 1 argument, got ${children.length}")
    NfcNormalize(asString(children.head))
  }
}
