package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.analysis.Analyzer

/** `term_counts(text)` → array<struct<term:string, tf:int>> — per-document
  * term frequencies computed INSIDE the row (reference A1 is exactly this:
  * a per-page lemma→count map, CollectLemmasAction.java:37-45).
  *
  * This replaces the `explode(tokens) → groupBy(docId, term).count()`
  * formulation: (docId, term) keys are nearly unique (tf ≈ 1 for most
  * pairs), so that groupBy shuffles ~one row per token with almost no
  * map-side combining — the single most expensive stage of the build.
  * Computing tf doc-locally removes that wide shuffle entirely; the
  * remaining `groupBy(term)` stats aggregation combines massively on the
  * map side (vocab rows per task, not token rows).
  *
  * Output is sorted by term (deterministic; also gives downstream
  * consumers term-ordered iteration). Token semantics identical to
  * [[Analyzer.tokens]] / [[TokensExpression]].
  */
case class TermCountsExpression(child: Expression, stem: Boolean = false)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("term", StringType, nullable = false),
      StructField("tf", IntegerType, nullable = false))),
    containsNull = false)

  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    TermCountsExpression.termCounts(input.asInstanceOf[UTF8String], stem)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TermCountsExpression.termCounts($c, $stem)")

  override protected def withNewChildInternal(newChild: Expression): TermCountsExpression =
    copy(child = newChild)
}

object TermCountsExpression {

  /** Static entry for interpreted + generated code (named to get a static
    * forwarder — see TokensExpression.tokenize). */
  def termCounts(text: UTF8String, stem: Boolean): ArrayData = {
    if (text == null) return new GenericArrayData(Array.empty[Any])
    val raw = Analyzer.tokens(text.toString)
    val toks = if (stem) raw.map(graft.analysis.Stemmer.stem) else raw
    if (toks.isEmpty) return new GenericArrayData(Array.empty[Any])
    // term-sorted; boxed Integer so the absent-key null is visible (a
    // primitive Int value type would silently unbox null to 0)
    val counts = new java.util.TreeMap[String, Integer]()
    toks.foreach { t =>
      val c = counts.get(t)
      counts.put(t, if (c == null) 1 else c + 1)
    }
    val out = new Array[Any](counts.size)
    var i = 0
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out(i) = new GenericInternalRow(Array[Any](
        UTF8String.fromString(e.getKey), e.getValue))
      i += 1
    }
    new GenericArrayData(out)
  }

  def termCountsCol(c: Column, stem: Boolean = false): Column =
    org.apache.spark.sql.GraftBridge.column(
      TermCountsExpression(org.apache.spark.sql.GraftBridge.expression(c), stem))
}
