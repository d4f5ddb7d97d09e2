package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.analysis.Analyzer

/** Text-analysis operators for a large-scale training-data pipeline over a
  * `documents(doc_id, text, lang, source, n_chars)` table: token counting,
  * quality scoring, language-ID, fingerprinting. All per-document scalar
  * work (no shuffle beyond the final aggregation a caller adds) — at 100 TB
  * these run as a single map stage over the parquet scan.
  */
object TextOps {

  /** Tokens of `text` via the shared [[Analyzer]] semantics (U2) — the
    * native codegen expression (equivalence: TokensExpressionSpec). */
  val tokensCol: Column = graft.functions.TokensExpression.tokens(col("text"))

  /** tf per (doc, term) — reference A1 (CollectLemmasAction.java:37-45):
    * explode + hash agg with map-side partials. */
  def termFrequencies(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(tokensCol).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))

  /** Document length (token count) per doc — the dl/norms column. */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), size(tokensCol).cast("long").as("dl"))

  /** Per-document quality metrics (length / distinct-ratio / mean token
    * length) — the standard cheap pre-filters of a training-data pipeline.
    * Pure column expressions; whole-stage-codegen'd except the tokenizer. */
  def qualityMetrics(docs: DataFrame): DataFrame = {
    val toks = tokensCol
    docs.select(
      col("doc_id"),
      length(col("text")).cast("long").as("n_chars"),
      size(toks).cast("long").as("n_tokens"),
      size(array_distinct(toks)).cast("long").as("n_distinct"),
      round(
        aggregate(transform(toks, t => length(t).cast("double")),
          lit(0.0), (acc, x) => acc + x) /
          greatest(size(toks), lit(1)).cast("double"),
        6).as("avg_token_len"),
      round(size(array_distinct(toks)).cast("double") /
        greatest(size(toks), lit(1)).cast("double"), 6).as("distinct_ratio"))
  }

  /** Deterministic language-ID heuristic, two marker kinds per script
    * family (rule-based and versioned like the analyzer — NOT a model):
    *
    *  - SPACED scripts score by whole-token function-word hits. Markers
    *    must survive the analyzer: length >= 2 after fold (so no "и"/"в"
    *    — MinTokenLength drops 1-char tokens).
    *  - UNSPACED scripts (zh) score by marker-CHARACTER occurrences in
    *    the folded text: CJK runs tokenize as one long token, so
    *    token-equality markers can never fire for them.
    */
  val LangMarkers: Map[String, Set[String]] = Map(
    "en" -> Set("the", "and", "of", "to", "is", "in", "that", "it"),
    "de" -> Set("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "es" -> Set("el", "la", "los", "las", "es", "en", "que", "un"),
    "fr" -> Set("le", "la", "les", "est", "et", "un", "une", "que"),
    "ru" -> Set("не", "на", "что", "это", "как", "он", "по", "но"))

  /** Single CJK chars counted as substring occurrences of the folded text. */
  val ZhMarkerChars: Set[Char] = Set('的', '是', '在', '了', '我', '有', '和', '不')

  private[ops] def languageOf(text: String): String = {
    val folded = Analyzer.fold(if (text == null) "" else text)
    val toks = Analyzer.tokens(text)
    val wordScores = LangMarkers.map { case (lang, markers) =>
      lang -> toks.count(markers.contains)
    }
    var zh = 0
    var i = 0
    while (i < folded.length) {
      if (ZhMarkerChars.contains(folded.charAt(i))) zh += 1
      i += 1
    }
    val scores = wordScores + ("zh" -> zh)
    val best = scores.maxBy { case (l, s) => (s, l) } // det. tie-break: max lang name
    if (best._2 == 0) "und" else best._1
  }

  private val langIdUdf = udf((text: String) => languageOf(text))

  def languageId(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), langIdUdf(col("text")).as("pred_lang"),
      col("lang").as("labeled_lang"))

  /** BPE-style pre-tokenizer pattern (the GPT-2 pattern with its
    * trailing-whitespace LOOKAHEAD removed so the same pattern runs
    * identically under Java regex (Spark) and RE2 (DuckDB oracle) —
    * RE2 has no lookarounds): contractions, optional-space letter runs,
    * optional-space digit runs, optional-space punctuation runs,
    * whitespace runs. */
  val BpePretokenPattern: String =
    """'(?:[sdmt]|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"""

  /** Token counts the way a training pipeline budgets text: whitespace
    * tokens (the analyzer dl) AND BPE-pretokenizer segments — both pure
    * column expressions (codegen'd regexp), no UDF. */
  def bpeTokenCounts(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      size(tokensCol).cast("long").as("dl"),
      size(regexp_extract_all(col("text"), lit(BpePretokenPattern), lit(0)))
        .cast("long").as("bpe_segments"))

  /** Content fingerprint: md5 over the normalized token stream — the
    * canonical-form dedup key (whitespace/punct/case-insensitive). Uses
    * builtin md5/concat_ws (codegen) rather than a UDF. */
  def fingerprint(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      md5(concat_ws(" ", tokensCol)).as("fingerprint"))

  /** Rolling (Rabin-Karp style) 64-bit hash over the token stream —
    * order-sensitive complement to the md5 canonical form; base/mod fixed,
    * deterministic. Used for shingle fingerprints at scale. */
  val rollingHashUdf = udf { (toks: Seq[String]) =>
    var h = 1469598103934665603L // FNV offset
    toks.foreach { t =>
      var i = 0
      while (i < t.length) { h = (h ^ t.charAt(i)) * 1099511628211L; i += 1 }
      h = (h ^ ' ') * 1099511628211L
    }
    h
  }
}
