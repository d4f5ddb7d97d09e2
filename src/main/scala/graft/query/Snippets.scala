package graft.query

import java.util.regex.Pattern

import graft.analysis.Analyzer

/** Snippet generation (U6) — a line-by-line re-expression of the
  * reference's algorithm (GenerateSnippetAction.java:23-174 +
  * dto/search/Snippet.java:28-98), golden-tested against the reference's
  * own test expectations (GenerateSnippetActionTest.java:18-83).
  *
  * Semantics preserved:
  *  - text cleaning = whitespace collapse (the Jsoup `.text()` effect) +
  *    `ё`→`е` fold with ORIGINAL casing kept (CollectLemmasAction.java:33-35);
  *  - a snippet window spans from 2 words before the first query word to
  *    2 words after the last (WORDS_BEFORE_OR_AFTER_SNIPPET, Snippet.java:16);
  *  - consecutive query words merge into one window while the gap allows
  *    (`lastOrd + 2 >= (ord - 2) - 1`, Snippet.java:41-44);
  *  - windows are grouped by query-word count, concatenated count-DESC
  *    (TreeMap reverseOrder + String::concat,
  *    GenerateSnippetAction.java:82-100, :170-174);
  *  - result longer than 250 chars is cut at the last `...` delimiter
  *    within the budget, else at the last space, and always ends with
  *    `...` (GenerateSnippetAction.java:103-150);
  *  - query-word surfaces are bold-wrapped with the reference's exact
  *    lookaround regex `(?<!<b>)(word)(?!\p{L})`
  *    (GenerateSnippetAction.java:152-161); we iterate surfaces in sorted
  *    order where the reference iterates a HashSet (its only
  *    nondeterminism — SURVEY.md §7.0.3 spirit: we pick the
  *    deterministic order).
  *
  * Pure Scala — runs driver-side on the top-k rows only (k strings, not a
  * distributed stage; reference does the same per shown page).
  */
object Snippets {

  /** MAX_SNIPPET_LENGTH_IN_SYMBOLS (GenerateSnippetAction.java:19). */
  val MaxSnippetLength = 250
  /** WORDS_BEFORE_OR_AFTER_SNIPPET (Snippet.java:16). */
  val ContextWords = 2
  /** SNIPPET_DELIMITER (Snippet.java:15). */
  val Delimiter = "..."

  /** Whitespace collapse + ё-fold, casing preserved. */
  def cleanText(raw: String): String =
    if (raw == null) ""
    else raw.trim.replaceAll("\\s+", " ")
      .replace('ё', 'е').replace('Ё', 'Е')

  /** `normalize` maps a document token's term to the form the query terms
    * are in — pass [[graft.analysis.Stemmer.stem]] for a stemmed index so
    * inflected surfaces ("лошади", "лошадях") match the query lemma
    * ("лошадь"), exactly like the reference's morphology-aware snippets
    * (GenerateSnippetAction.java:40-66 matches lemmas, bolds surfaces). */
  def snippet(rawText: String, queryTerms: Set[String],
              normalize: String => String = identity): String = {
    val text = cleanText(rawText)
    val words = Analyzer.tokensWithOffsets(text)
    if (words.isEmpty) return ""
    val folded = queryTerms.map(t => normalize(Analyzer.fold(t)))
    val queryWords = words.filter(w => folded.contains(normalize(w.term)))
    if (queryWords.isEmpty) return ""

    // ---- window accumulation (Snippet.updateSnippetInfo semantics) ----
    final case class Win(text: String, count: Int)
    val wins = Vector.newBuilder[Win]
    var curFirstChar = -1
    var curLastOrd = -1
    var curCount = 0

    def complete(): Unit = {
      val lastAppend = math.min(words.size - 1, curLastOrd + ContextWords)
      val slice = text.substring(curFirstChar, words(lastAppend).end)
      wins += Win(slice + Delimiter + " ", curCount)
    }

    queryWords.foreach { w =>
      val supposedFirst = math.max(0, w.ordinal - ContextWords)
      val near = curLastOrd + ContextWords >= supposedFirst - 1
      if (curFirstChar == -1 || near) {
        if (curFirstChar == -1) curFirstChar = words(supposedFirst).start
        curCount += 1
        curLastOrd = w.ordinal
      } else {
        complete()
        curFirstChar = words(supposedFirst).start
        curCount = 1
        curLastOrd = w.ordinal
      }
    }
    complete()

    // ---- group by count desc, concat within group ----------------------
    val grouped = wins.result().groupBy(_.count).toSeq
      .sortBy(-_._1)
      .map { case (c, ws) => ws.map(_.text).mkString }

    // ---- append until over budget, then cut -----------------------------
    val sb = new StringBuilder
    grouped.takeWhile { g =>
      val before = sb.length
      sb.append(g)
      if (sb.length > MaxSnippetLength) {
        cutToBudget(sb)
        false
      } else true
    }
    boldQueryWords(sb.toString, queryWords.map(_.surface).distinct.sorted)
  }

  private def cutToBudget(sb: StringBuilder): Unit = {
    val head = sb.substring(0, MaxSnippetLength)
    val delim = head.lastIndexOf(Delimiter)
    val point = if (delim == -1) math.max(0, head.lastIndexOf(" ")) else delim
    sb.delete(math.min(point + Delimiter.length, sb.length), sb.length)
    if (!sb.endsWith(Delimiter))
      sb.replace(sb.length - Delimiter.length, sb.length, Delimiter)
  }

  private def boldQueryWords(snippetText: String, surfaces: Seq[String]): String =
    surfaces.foldLeft(snippetText) { (acc, w) =>
      acc.replaceAll("(?<!<b>)(" + Pattern.quote(w) + ")(?!\\p{L})", "<b>$1</b>")
    }
}
