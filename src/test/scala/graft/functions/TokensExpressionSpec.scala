package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.Props.forAllSeeded
import graft.SparkTestBase
import graft.analysis.Analyzer

/** The native expression must be token-for-token identical to the shared
  * Analyzer (the analyzer-parity invariant, SURVEY.md §7.8.5) and must
  * stay inside whole-stage codegen. */
class TokensExpressionSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("property: expression == Analyzer.tokens on arbitrary strings") {
    val gen = Gen.listOfN(40, Gen.oneOf(
      Gen.asciiPrintableStr,
      Gen.const("Ёлка ЕЛКА  ёж 😀 İstanbul bm25 w0042"),
      Gen.listOf(Gen.choose(Char.MinValue, Char.MaxValue)).map(_.mkString)))
    forAllSeeded(gen, n = 10) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i, t) }.toDF("id", "text")
      val got = df.select($"id", TokensExpression.tokens($"text").as("toks"))
        .collect().map(r => r.getInt(0) -> r.getSeq[String](1).toVector).toMap
      texts.zipWithIndex.foreach { case (t, i) =>
        assert(got(i) == Analyzer.tokens(t), s"mismatch on ${t.take(60)}")
      }
    }
  }

  test("null-safe and empty-safe") {
    val df = Seq((1, "ab cd"), (2, null), (3, "")).toDF("id", "text")
    val got = df.select($"id", TokensExpression.tokens($"text").as("t"))
      .collect().map(r => r.getInt(0) ->
        Option(r.getSeq[String](1)).map(_.toVector)).toMap
    assert(got(1).contains(Vector("ab", "cd")))
    assert(got(2).isEmpty) // null in → null out (NullIntolerant)
    assert(got(3).contains(Vector.empty))
  }

  test("stays inside whole-stage codegen (no UDF fallback)") {
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(explode(TokensExpression.tokens($"text")).as("term"))
      .groupBy($"term").count()
    df.collect()
    val p = df.queryExecution.executedPlan.toString()
    assert(!p.contains("BatchEvalPython") && !p.contains("ScalaUDF"),
      s"expression fell back to UDF:\n$p")
    assert(p.contains("WholeStageCodegen") || p.contains("*("))
  }

  test("explode + count over the expression equals the UDF path") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val viaExpr = docs.select(explode(TokensExpression.tokens($"text")).as("t"))
      .groupBy($"t").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val tokUdf = udf((s: String) => Analyzer.tokens(s))
    val viaUdf = docs.select(explode(tokUdf($"text")).as("t"))
      .groupBy($"t").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaExpr == viaUdf)
  }
}
