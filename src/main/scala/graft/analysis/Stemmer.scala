package graft.analysis

/** Deterministic rule-based stemmer closing the reference's C6 morphology
  * gap (Lucene `russianmorphology` dictionary lemmatization,
  * CollectLemmasAction.java:61-76): the reference matches inflected forms
  * ("лошадь" retrieves "лошади/лошадях/лошадей" —
  * GenerateSnippetActionTest.java:20-36). A dictionary is out of reach in
  * the offline sandbox; the Snowball Russian algorithm (public,
  * snowballstem.org/algorithms/russian/stemmer.html) conflates the same
  * inflection classes rule-based and fully deterministically, which is
  * what rank-identity needs — build and query share this exact code, and
  * the index manifest pins [[Analyzer.StemVersion]] so they can never
  * disagree.
  *
  * Latin-script tokens go through a light suffix stemmer (plural / -ed /
  * -ing / -ly, final-y→i, final-e drop, consonant undoubling) — enough to
  * conflate merge/merged/merging, run/running, study/studies. Mixed or
  * other scripts pass through unchanged. Pure Scala, no allocation beyond
  * the result string.
  */
object Stemmer {

  def stem(token: String): String = {
    if (token == null || token.length < 3) return token
    var hasCyr = false
    var hasLat = false
    var i = 0
    while (i < token.length) {
      val c = token.charAt(i)
      if (c >= 'а' && c <= 'я' || c == 'ё') hasCyr = true
      else if (c >= 'a' && c <= 'z') hasLat = true
      else return token // digits / other scripts: identity
      i += 1
    }
    if (hasCyr && !hasLat) stemRussian(token)
    else if (hasLat && !hasCyr) stemEnglish(token)
    else token
  }

  // ---- Russian (Snowball) ---------------------------------------------

  private val Vowels = "аеиоуыэюя"
  private def isVowel(c: Char): Boolean = Vowels.indexOf(c) >= 0

  /** Start of RV: position after the first vowel. */
  private def rvStart(w: String): Int = {
    var i = 0
    while (i < w.length && !isVowel(w.charAt(i))) i += 1
    if (i == w.length) w.length else i + 1
  }

  /** Start of R2: after the first consonant-after-vowel inside R1. */
  private def r2Start(w: String): Int = {
    def after(from: Int): Int = {
      var i = from
      while (i < w.length && !isVowel(w.charAt(i))) i += 1
      while (i < w.length && isVowel(w.charAt(i))) i += 1
      i
    }
    // R1 = after first non-vowel following a vowel
    var i = 0
    while (i < w.length && !isVowel(w.charAt(i))) i += 1
    while (i < w.length && isVowel(w.charAt(i))) i += 1
    val r1 = i
    after(r1)
  }

  /** Longest suffix from `sufs` at the end of w, with the match contained
    * in w(limit..): returns suffix length or 0. `preAY`: suffix must be
    * preceded by а/я (group-1 endings), and the а/я must also be in RV. */
  private def matchSuffix(w: String, limit: Int, sufs: Seq[String],
                          preAY: Boolean = false): Int = {
    var best = 0
    sufs.foreach { s =>
      if (s.length > best && w.endsWith(s) && w.length - s.length >= limit) {
        if (!preAY) best = s.length
        else {
          val p = w.length - s.length - 1
          if (p >= limit && (w.charAt(p) == 'а' || w.charAt(p) == 'я'))
            best = s.length
        }
      }
    }
    best
  }

  private val PerfGerund1 = Seq("в", "вши", "вшись")
  private val PerfGerund2 = Seq("ив", "ивши", "ившись", "ыв", "ывши", "ывшись")
  private val Adjective = Seq("ее", "ие", "ые", "ое", "ими", "ыми", "ей", "ий",
    "ый", "ой", "ем", "им", "ым", "ом", "его", "ого", "ему", "ому", "их",
    "ых", "ею", "ою", "ую", "юю", "ая", "яя")
  private val Participle1 = Seq("ем", "нн", "вш", "ющ", "щ")
  private val Participle2 = Seq("ивш", "ывш", "ующ")
  private val Verb1 = Seq("ла", "на", "ете", "йте", "ли", "й", "л", "ем", "н",
    "ло", "но", "ет", "ют", "ны", "ть", "ешь", "нно")
  private val Verb2 = Seq("ила", "ыла", "ена", "ейте", "уйте", "ите", "или",
    "ыли", "ей", "уй", "ил", "ыл", "им", "ым", "ен", "ило", "ыло", "ено",
    "ят", "ует", "уют", "ит", "ыт", "ены", "ить", "ыть", "ишь", "ую", "ю")
  private val Noun = Seq("а", "ев", "ов", "ие", "ье", "е", "иями", "ями",
    "ами", "еи", "ии", "и", "ией", "ей", "ой", "ий", "й", "иям", "ям",
    "ием", "ем", "ам", "ом", "о", "у", "ах", "иях", "ях", "ы", "ь", "ию",
    "ью", "ю", "ия", "ья", "я")

  private def stemRussian(word: String): String = {
    var w = word
    val rv = rvStart(w)
    if (rv >= w.length) return w

    // step 1: perfective gerund, else (reflexive?) adjectival/verb/noun
    val pg = math.max(matchSuffix(w, rv, PerfGerund2),
      matchSuffix(w, rv, PerfGerund1, preAY = true))
    if (pg > 0) w = w.dropRight(pg)
    else {
      val refl = matchSuffix(w, rv, Seq("ся", "сь"))
      if (refl > 0) w = w.dropRight(refl)
      val adj = matchSuffix(w, rv, Adjective)
      if (adj > 0) {
        w = w.dropRight(adj)
        // optional preceding participle ending
        val part = math.max(matchSuffix(w, rv, Participle2),
          matchSuffix(w, rv, Participle1, preAY = true))
        if (part > 0) w = w.dropRight(part)
      } else {
        val vb = math.max(matchSuffix(w, rv, Verb2),
          matchSuffix(w, rv, Verb1, preAY = true))
        if (vb > 0) w = w.dropRight(vb)
        else {
          val nn = matchSuffix(w, rv, Noun)
          if (nn > 0) w = w.dropRight(nn)
        }
      }
    }
    // step 2: trailing и
    if (w.length > rv && w.endsWith("и")) w = w.dropRight(1)
    // step 3: derivational ость/ост in R2
    val r2 = r2Start(w)
    val der = matchSuffix(w, r2, Seq("ост", "ость"))
    if (der > 0) w = w.dropRight(der)
    // step 4: superlative / undouble н / trailing ь
    if (w.length > rv && w.endsWith("нн")) w = w.dropRight(1)
    else {
      val sup = matchSuffix(w, rv, Seq("ейш", "ейше"))
      if (sup > 0) {
        w = w.dropRight(sup)
        if (w.length > rv && w.endsWith("нн")) w = w.dropRight(1)
      } else if (w.length > rv && w.endsWith("ь")) w = w.dropRight(1)
    }
    w
  }

  // ---- English (light, deterministic) ----------------------------------

  private def latVowel(c: Char): Boolean =
    c == 'a' || c == 'e' || c == 'i' || c == 'o' || c == 'u'

  private def hasLatVowel(s: String, until: Int): Boolean = {
    var i = 0
    while (i < until) { if (latVowel(s.charAt(i))) return true; i += 1 }
    false
  }

  private def undouble(s: String): String = {
    val n = s.length
    if (n >= 2 && s.charAt(n - 1) == s.charAt(n - 2) &&
        !latVowel(s.charAt(n - 1)) &&
        s.charAt(n - 1) != 'l' && s.charAt(n - 1) != 's' && s.charAt(n - 1) != 'z')
      s.dropRight(1)
    else s
  }

  private def stemEnglish(word: String): String = {
    var w = word
    // plurals
    if (w.endsWith("sses")) w = w.dropRight(2)
    else if (w.endsWith("ies") && w.length >= 5) w = w.dropRight(2)
    else if (!w.endsWith("ss") && !w.endsWith("us") && !w.endsWith("is") &&
      w.endsWith("s") && w.length >= 4) w = w.dropRight(1)
    // -ed / -ing (only when a vowel remains in the stem)
    if (w.endsWith("ing") && w.length >= 6 && hasLatVowel(w, w.length - 3))
      w = undouble(w.dropRight(3))
    else if (w.endsWith("ed") && w.length >= 5 && hasLatVowel(w, w.length - 2))
      w = undouble(w.dropRight(2))
    else if (w.endsWith("ly") && w.length >= 5)
      w = w.dropRight(2)
    // final y -> i after consonant (study/studies agree)
    if (w.length >= 4 && w.endsWith("y") && !latVowel(w.charAt(w.length - 2)))
      w = w.dropRight(1) + "i"
    // final e drop (merge/merged/merging agree)
    if (w.length >= 5 && w.endsWith("e")) w = w.dropRight(1)
    w
  }
}
