package graft.analysis

/** Deterministic text analyzer shared verbatim by index build, query
  * parsing, and the scalar test oracle.
  *
  * The reference enforces the same share-one-analyzer property by reusing a
  * single `CollectLemmasAction` bean on both the indexing and the search
  * path (reference: services/actions/CollectLemmasAction.java:33-76,
  * SearchServiceImpl.java:69-70). Its pipeline is: lowercase, `ё`->`е`,
  * strip non-letters, split on whitespace, keep words of length >= 2,
  * drop particles (stopwords), normalize via dictionary lemmatization.
  *
  * Ours generalizes the character class beyond Cyrillic (transcripts are
  * mixed-language) and replaces the Lucene dictionary lemmatizer with a
  * rule-free identity normalizer — deterministic, total, version-pinned.
  * The version string is stamped into the index manifest so build and
  * query can never disagree (SURVEY.md §7.8.5).
  *
  * Everything here is pure Scala (no Spark imports): the same function
  * object is called from driver-side query parsing, executor-side UDFs,
  * and the single-node oracle.
  */
object Analyzer extends Serializable {

  /** Bumped on ANY behavioral change; recorded in the index manifest. */
  val Version = "graft-analyzer-1"

  /** Version string of the STEMMED analyzer variant (tokens → Stemmer.stem;
    * closes the reference's C6 morphology gap — see [[Stemmer]]). An index
    * built with stemming records this version, and the query path selects
    * the matching analyzer from the manifest, so build and query can never
    * disagree (SURVEY.md §7.8.5). */
  val StemVersion = "graft-analyzer-2-stem"

  /** Tokens under the named analyzer version. */
  def tokensFor(version: String, text: String): Vector[String] =
    if (version == StemVersion) tokens(text).map(Stemmer.stem)
    else tokens(text)

  /** Query analysis under the named analyzer version. */
  def analyzeQueryFor(version: String, query: String): Vector[String] =
    tokensFor(version, query).distinct

  /** Minimum token length, after normalization.
    * Reference: `[а-яъ]{2,}` (CollectLemmasAction.java:19,55). */
  val MinTokenLength = 2

  /** Default stopword set. The reference drops Russian particles by
    * morphological class (МЕЖД/ПРЕДЛ/СОЮЗ/МС — CollectLemmasAction.java:17-21,
    * :65-76); a fixed set is the deterministic analog. Kept EMPTY by default
    * so SQL oracles stay trivially expressible; query-time stop-term
    * suppression is instead handled by the df <= 0.9*N cap
    * (SearchServiceImpl.java:32,151-154), which subsumes particle dropping
    * on real corpora.
    */
  val DefaultStopwords: Set[String] = Set.empty

  /** Lowercase + fold `ё`->`е` (reference CollectLemmasAction.java:34,48).
    * Locale-insensitive lowercase: Char-wise toLowerCase would mishandle
    * some locales; `String.toLowerCase(Locale.ROOT)` is deterministic. */
  def fold(text: String): String =
    text.toLowerCase(java.util.Locale.ROOT).replace('ё', 'е')

  private def isTokenChar(c: Char): Boolean =
    Character.isLetter(c) || Character.isDigit(c)

  /** Tokenize a text into normalized terms, in document order.
    * Single pass, no regex (hot path at 10^12 turns — regex split
    * allocates; this does not beyond the token strings themselves).
    *
    * Boundaries are detected on the ORIGINAL chars and each token is
    * folded individually: Unicode lowercasing can change string length
    * (İ → i̇), so folding the whole text first would desynchronize
    * offsets from [[tokensWithOffsets]]. Invariant (property-tested):
    * `tokens(s) == tokensWithOffsets(s).map(_.term)` for all inputs.
    */
  def tokens(text: String): Vector[String] = {
    if (text == null || text.isEmpty) return Vector.empty
    val out = Vector.newBuilder[String]
    var i = 0
    val n = text.length
    while (i < n) {
      while (i < n && !isTokenChar(text.charAt(i))) i += 1
      val start = i
      while (i < n && isTokenChar(text.charAt(i))) i += 1
      if (i - start >= MinTokenLength) {
        val tok = fold(text.substring(start, i))
        if (!DefaultStopwords.contains(tok)) out += tok
      }
    }
    out.result()
  }

  /** A token with its ordinal and char offsets in the ORIGINAL text —
    * the snippet generator needs original-casing offsets
    * (reference UnalteredWord, dto/search/UnalteredWord.java:9-19;
    * offsets computed in GenerateSnippetAction.java:40-66).
    * Offsets index the original string; the surface form keeps original
    * casing while `term` is normalized.
    */
  final case class Tok(term: String, surface: String, ordinal: Int, start: Int, end: Int)

  /** Tokenize retaining char offsets into the original text.
    * Works because our normalization is 1:1 on chars (lowercase/ё-fold
    * never change string length for the character classes we accept).
    */
  def tokensWithOffsets(text: String): Vector[Tok] = {
    if (text == null || text.isEmpty) return Vector.empty
    val out = Vector.newBuilder[Tok]
    var i = 0
    var ord = 0
    val n = text.length
    while (i < n) {
      while (i < n && !isTokenChar(text.charAt(i))) i += 1
      val start = i
      while (i < n && isTokenChar(text.charAt(i))) i += 1
      if (i - start >= MinTokenLength) {
        val surface = text.substring(start, i)
        val term = fold(surface)
        if (!DefaultStopwords.contains(term)) {
          out += Tok(term, surface, ord, start, i)
          ord += 1
        }
      }
    }
    out.result()
  }

  /** Analyze a query string into its distinct terms, insertion-ordered
    * (reference: query lemma Set, SearchServiceImpl.java:68-70). */
  def analyzeQuery(query: String): Vector[String] = tokens(query).distinct

  /** Normalize a PREFIX pattern (SearchEngine.prefixTopK): keep only
    * token chars, then case/ё fold — but never stem and no minimum
    * length. Lucene parity: multi-term query patterns bypass analysis
    * (PrefixQuery terms are not run through the token filters), so the
    * same `merg*` pattern works against a plain and a stemmed
    * dictionary alike, and a 1-char prefix is legal even though 1-char
    * TOKENS are not. */
  def foldPrefix(raw: String): String =
    if (raw == null) "" else fold(raw.filter(isTokenChar))

  /** Normalize a WILDCARD pattern (SearchEngine.wildcardTopK): keep token
    * chars plus the `*`/`?` metacharacters, then case/ё fold — never
    * stemmed, the same multi-term-query contract as [[foldPrefix]]. */
  def foldWildcard(raw: String): String =
    if (raw == null) ""
    else fold(raw.filter(c => isTokenChar(c) || c == '*' || c == '?'))

  // ---- typed-field posting namespace (r7 format rev) -------------------
  // Keyword fields (role/tool — Lucene StringField analog) index as
  // posting lists in a RESERVED term namespace: the \u0000 marker is a
  // control char, which [[tokens]] treats as a separator in every
  // analyzer version, so a field term can never collide with (or be
  // produced by) any text token, query phrase, prefix/fuzzy/wildcard
  // pattern, or MUST_NOT list. Values fold (lowercase + ё) but are NEVER
  // stemmed or token-filtered — keyword fields match the exact folded
  // string, the same fold-not-stem contract as [[foldPrefix]].

  /** Reserved marker prefixing every field term. */
  val FieldMarker = "\u0000"

  /** The posting term for a (field, value) equality — shared verbatim by
    * the index builder and the query planner so they can never disagree. */
  def fieldTerm(field: String, value: String): String =
    FieldMarker + field + FieldMarker + fold(if (value == null) "" else value.trim)

  /** Is this posting term a typed-field term (vs a text term)? The
    * dictionary (term_stats), every expansion surface and the corpus
    * statistics exclude these. */
  def isFieldTerm(term: String): Boolean = term.startsWith(FieldMarker)

  /** Per-clause boosts (r7, Lucene `term^b`): RAW clause tokens map to
    * ANALYZED terms under the named analyzer version — a raw token that
    * analyzes to several terms boosts each of them; when two raw keys
    * collide on one analyzed term the LARGER boost wins (deterministic,
    * order-free). Boosts must be finite and > 0. ONE definition shared
    * by the engine and the brute-force oracle so resolution can never
    * drift. */
  def resolveBoosts(version: String,
                    raw: Map[String, Double]): Map[String, Double] = {
    raw.foreach { case (t, b) =>
      require(b > 0 && !b.isInfinite && !b.isNaN,
        s"boost for '$t' must be a finite positive number, got $b")
    }
    raw.toSeq
      .flatMap { case (t, b) => analyzeQueryFor(version, t).map(_ -> b) }
      .groupMapReduce(_._1)(_._2)(math.max)
  }
}
