package graft.analysis

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import graft.Props.forAllSeeded

class AnalyzerSpec extends AnyFunSuite {

  test("lowercases and folds ё→е (reference CollectLemmasAction.java:34,48)") {
    assert(Analyzer.tokens("Ёлка ЕЛКА ёж") == Vector("елка", "елка", "еж"))
  }

  test("drops tokens shorter than 2 (reference [а-яъ]{2,} analog)") {
    assert(Analyzer.tokens("a bb c dd я ъъ") == Vector("bb", "dd", "ъъ"))
  }

  test("splits on any non-letter/digit run") {
    assert(Analyzer.tokens("foo,bar--baz!!qux\t\nquux") ==
      Vector("foo", "bar", "baz", "qux", "quux"))
  }

  test("keeps digits inside tokens") {
    assert(Analyzer.tokens("bm25 w0042 3.14") == Vector("bm25", "w0042", "14"))
  }

  test("cyrillic + mixed text (reference corpus class)") {
    assert(Analyzer.tokens("Домашняя лошадь — одомашненный потомок") ==
      Vector("домашняя", "лошадь", "одомашненный", "потомок"))
  }

  test("empty / null safe (totality)") {
    assert(Analyzer.tokens("") == Vector.empty)
    assert(Analyzer.tokens(null) == Vector.empty)
    assert(Analyzer.tokens("   \t\n ") == Vector.empty)
  }

  test("analyzeQuery dedups preserving order (SearchServiceImpl.java:68-70 Set analog)") {
    assert(Analyzer.analyzeQuery("foo bar foo baz bar") == Vector("foo", "bar", "baz"))
  }

  test("offsets point into the ORIGINAL text with original casing") {
    val text = "  Hello, Мир! ёлки"
    val toks = Analyzer.tokensWithOffsets(text)
    assert(toks.map(_.term) == Vector("hello", "мир", "елки"))
    toks.foreach { t =>
      assert(text.substring(t.start, t.end) == t.surface)
      assert(Analyzer.fold(t.surface) == t.term)
    }
    assert(toks.map(_.ordinal) == Vector(0, 1, 2))
  }

  test("property: total on arbitrary strings, tokens are normalized") {
    val weird = Gen.listOf(Gen.oneOf(
      Gen.asciiPrintableStr, Gen.const("ёж 😀 İstanbul"), Gen.listOf(Gen.choose(Char.MinValue, Char.MaxValue)).map(_.mkString)
    )).map(_.mkString(" "))
    forAllSeeded(weird) { s =>
      val toks = Analyzer.tokens(s)
      toks.foreach { t => assert(t == Analyzer.fold(t)) }
    }
  }

  test("property: tokens == tokensWithOffsets.map(term) for all inputs") {
    forAllSeeded(Gen.oneOf(Gen.listOf(Gen.choose(Char.MinValue, Char.MaxValue)).map(_.mkString), Gen.asciiPrintableStr)) { s =>
      assert(Analyzer.tokens(s) == Analyzer.tokensWithOffsets(s).map(_.term))
    }
  }
}
