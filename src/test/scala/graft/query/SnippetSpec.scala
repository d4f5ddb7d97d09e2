package graft.query

import org.scalatest.funsuite.AnyFunSuite

/** Golden snippet tests — the reference's own expectations
  * (GenerateSnippetActionTest.java:49-83) ported verbatim where our
  * analyzer tokenizes identically, plus an English analog of the
  * morphology-dependent case (:20-36), per FIXTURES.md §4.
  */
class SnippetSpec extends AnyFunSuite {

  test("golden: cut one big snippet by space (GenerateSnippetActionTest.java:49-65)") {
    val expected = "<b>Расписание</b> занятий - <b>Расписание</b> занятий - <b>Расписание</b> занятий - " +
      "<b>Расписание</b> занятий <b>Расписание</b> занятий - <b>Расписание</b> занятий - <b>Расписание</b> " +
      "занятий - <b>Расписание</b> занятий памc <b>Расписание</b> занятий - <b>Расписание</b> занятий - " +
      "<b>Расписание</b> занятий - <b>Расписание</b>..."
    val pageContent =
      """Расписание занятий - Расписание занятий - Расписание занятий - Расписание занятий
        |Расписание занятий - Расписание занятий - Расписание занятий - Расписание занятий памc
        |Расписание занятий - Расписание занятий - Расписание занятий - Расписание занятий
        |Расписание занятий - Расписание занятий - Расписание занятий - Расписание занятий""".stripMargin
    assert(Snippets.snippet(pageContent, Set("расписание")) == expected)
  }

  test("golden: cut several snippets by delimiter (GenerateSnippetActionTest.java:67-83)") {
    val expected = "<b>Расписание</b> занятий - <b>Расписание</b> занятий - <b>Расписание</b> занятий - " +
      "<b>Расписание</b> занятий <b>Расписание</b> занятий - <b>Расписание</b> занятий - <b>Расписание</b> " +
      "занятий - <b>Расписание</b> занятий..."
    val pageContent =
      """Расписание занятий - Расписание занятий - Расписание занятий - Расписание занятий
        |Расписание занятий - Расписание занятий - Расписание занятий - Расписание занятий...
        |Расписание занятий - Расписание занятий - Расписание занятий - Расписание занятий
        |Расписание занятий - Расписание занятий - Расписание занятий - Расписание занятий""".stripMargin
    assert(Snippets.snippet(pageContent, Set("расписание")) == expected)
  }

  test("analog of the multi-lemma golden (GenerateSnippetActionTest.java:20-36): window merge + ±2 context") {
    // Two query terms, three occurrence clusters; identity-normalizer
    // analog of the Russian morphology case.
    val text = "The domestic horse is a domesticated descendant of the wild horse. " +
      "It is used by humans to this day. The science of horses is hippology. " +
      "In Europe wild or feral horses were found until the last century."
    val got = Snippets.snippet(text, Set("horse", "wild"))
    // every occurrence of the exact surfaces is bolded
    assert(got.contains("<b>horse</b>"))
    assert(got.contains("<b>wild</b>"))
    // windows end with the delimiter
    assert(got.endsWith("... ") || got.endsWith("..."))
    // ±2 context: the window around the first "horse" starts 2 words before
    assert(got.startsWith("The domestic <b>horse</b>") || got.contains("domestic <b>horse</b>"))
  }

  test("merge rule: nearby query words share one window; distant ones split") {
    val text = "aa bb needle cc dd ee ff gg hh ii jj kk ll mm nn oo pp needle qq rr"
    val got = Snippets.snippet(text, Set("needle"))
    // two windows: [aa..ee] and [pp..rr] (gap > 5 words splits)
    assert(got.contains("aa bb <b>needle</b> cc dd..."))
    assert(got.contains("pp <b>needle</b> qq rr..."))
  }

  test("window clamps at text boundaries") {
    val got = Snippets.snippet("needle aa bb", Set("needle"))
    assert(got == "<b>needle</b> aa bb... ")
    val got2 = Snippets.snippet("aa bb needle", Set("needle"))
    assert(got2 == "aa bb <b>needle</b>... ")
  }

  test("count-desc ordering: richer window comes first") {
    val text = "x1 x2 needle x3 needle x4 x5 x6 x7 x8 x9 y1 y2 y3 y4 y5 needle z1 z2"
    val got = Snippets.snippet(text, Set("needle"))
    // first window holds 2 query words -> it leads the snippet
    assert(got.indexOf("x2 <b>needle</b> x3") < got.indexOf("y4 y5 <b>needle</b>"))
  }

  test("no query words / empty text → empty snippet") {
    assert(Snippets.snippet("some text here", Set("absent")) == "")
    assert(Snippets.snippet("", Set("foo")) == "")
    assert(Snippets.snippet(null, Set("foo")) == "")
  }

  test("bolding is case-preserving and whole-word only (C9 lookarounds)") {
    val got = Snippets.snippet("Horse and horses and Horse again", Set("horse"))
    // "Horse" (exact surface) bolded; "horses" is a different token under
    // identity normalization → not a query word here
    assert(got.contains("<b>Horse</b>"))
    assert(!got.contains("<b>horses</b>"))
  }

  test("ё-fold parity between text and query (CollectLemmasAction.java:34)") {
    val got = Snippets.snippet("Ёлка стоит ёлка горит", Set("елка"))
    assert(got.contains("<b>Елка</b>")) // text folded ё→е, casing kept
    assert(got.contains("<b>елка</b>"))
  }
}
