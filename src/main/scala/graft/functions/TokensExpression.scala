package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.analysis.Analyzer

/** `tokens(text)` as a native Catalyst expression (SURVEY.md §2.8 U1/U2
  * upgrade path: "custom Expression beats a Scala UDF").
  *
  * Versus `udf(Analyzer.tokens _)` this removes, per row, the
  * UTF8String→String→Vector[String]→Catalyst-array encoder round trip and
  * the UDF's null-wrapping closure: `doGenCode` emits a direct static
  * call that returns Catalyst `ArrayData` of `UTF8String`, so the
  * surrounding operators stay inside whole-stage codegen. Token semantics
  * are IDENTICAL to [[Analyzer.tokens]] (equivalence property-tested in
  * TokensExpressionSpec) — the analyzer-parity invariant (SURVEY.md
  * §7.8.5) is preserved because both paths call the same boundary logic.
  */
case class TokensExpression(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    TokensExpression.tokenize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TokensExpression.tokenize($c)")

  override protected def withNewChildInternal(newChild: Expression): TokensExpression =
    copy(child = newChild)
}

object TokensExpression {

  /** Static entry used by both interpreted and generated code. Named
    * `tokenize` (not `eval`) so the companion gets a static forwarder —
    * a companion method shadowed by an inherited instance method gets
    * none, and Janino would then fail to resolve the static call and
    * silently fall back to interpreted eval. */
  def tokenize(text: UTF8String): ArrayData = {
    if (text == null) return new GenericArrayData(Array.empty[Any])
    // tokenize on the decoded string (correct Unicode semantics — char
    // classes over code units, same as Analyzer); allocate Catalyst types
    // directly instead of going through Vector[String] + encoder
    val s = text.toString
    val n = s.length
    val out = new java.util.ArrayList[Any]()
    var i = 0
    while (i < n) {
      while (i < n && !isTokenChar(s.charAt(i))) i += 1
      val start = i
      while (i < n && isTokenChar(s.charAt(i))) i += 1
      if (i - start >= Analyzer.MinTokenLength) {
        val tok = Analyzer.fold(s.substring(start, i))
        if (!Analyzer.DefaultStopwords.contains(tok))
          out.add(UTF8String.fromString(tok))
      }
    }
    new GenericArrayData(out.toArray)
  }

  private def isTokenChar(c: Char): Boolean =
    Character.isLetter(c) || Character.isDigit(c)

  /** Column-level constructor. */
  def tokens(c: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      TokensExpression(org.apache.spark.sql.GraftBridge.expression(c)))
}
