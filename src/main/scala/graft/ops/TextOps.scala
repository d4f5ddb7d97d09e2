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

  /** tf per (doc, term) — reference A1 (CollectLemmasAction.java:37-45).
    * r8: computed IN-TASK via the term_counts codegen expression (the
    * IndexBuilder trick, optimization guide §2.3 "aggregate before you
    * shuffle"): the old explode + groupBy(doc_id, term) shuffled ~one row
    * per token with almost no map-side combining, because (doc, term)
    * keys are nearly unique. Per-doc counting inside the row removes that
    * exchange entirely — tf rows are born final, and downstream term
    * aggregations (a2/f4/o1) combine map-side at vocabulary size. Row set
    * and schema are unchanged (tf cast to the old count() long). */
  def termFrequencies(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        explode(graft.functions.TermCountsExpression.termCountsCol(col("text")))
          .as("tc"))
      .select(col("doc_id"), col("tc.term").as("term"),
        col("tc.tf").cast("long").as("tf"))

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

  /** THE canonical content-fingerprint key: md5 over the normalized
    * token stream (whitespace/punct/case-insensitive). One definition —
    * the batch fingerprint op and the streaming ingestion dedup key must
    * never diverge. Builtin md5/concat_ws (codegen), no UDF. */
  val fingerprintCol: Column = md5(concat_ws(" ", tokensCol))

  /** Content fingerprint per doc — the canonical-form dedup key. */
  def fingerprint(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), fingerprintCol.as("fingerprint"))

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

  /** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD
    * 2003 — the MOSS algorithm): hash every k-gram of the token stream,
    * slide a window of `w` consecutive k-gram hashes, select each window's
    * minimum; the distinct selected hashes are the document's fingerprint
    * set. Guarantees every match of length >= k+w-1 tokens shares a
    * fingerprint, with density ~2/(w+1) of all k-grams — the standard
    * sublinear dedup/attribution sketch.
    *
    * Pure column expressions end-to-end (transform/slice/array_min — no
    * UDF, one map stage at 100 TB). The k-gram hash is md5 so the whole
    * pipeline is oracle-checkable bit-for-bit in DuckDB (same trick as
    * SimHash's termHash64); min is over the hex strings (ASCII order,
    * identical in both engines). Docs with fewer than k+w-1 tokens have
    * no window and are dropped (same filter on the oracle side).
    *
    * Output per doc: the fingerprint-set SIZE and a digest (md5 over the
    * sorted fingerprints) — compact and exactly content-checking. Use
    * [[winnowSelected]] for the exploded (doc_id, fp) rows. */
  def winnowFingerprints(docs: DataFrame, k: Int = 3, w: Int = 4): DataFrame =
    winnowSets(docs, k, w).select(
      col("doc_id"),
      size(col("fps")).cast("long").as("n_fps"),
      md5(concat_ws("", array_sort(col("fps")))).as("fp_digest"))

  /** Exploded winnowing fingerprints: one row per (doc_id, fp) — the join
    * key shape for cross-doc overlap/attribution queries.
    *
    * Computed in ONE typed map pass (plain Scala rolling window), not by
    * exploding the [[winnowSets]] expression: Spark's
    * InferFiltersFromGenerate infers `size(fps) > 0` below the explode
    * and INLINES the whole nested transform into that filter, where the
    * inner k-gram transform re-evaluates per outer lambda element —
    * O(tokens²) md5s per document (probed 93 s vs 0.6 s at sf0.1). The
    * map pass is also the right 100 TB shape: narrow, codegen-free hot
    * loop, no pathological Catalyst expression nesting to re-plan.
    * Semantics are bit-identical to the expression path (same analyzer
    * tokens, same md5-hex k-gram hashes, same window-min + first-seen
    * distinct) — OpsSpec's twins and the DuckDB winnowing oracle pin it. */
  def winnowSelected(docs: DataFrame, k: Int = 3, w: Int = 4): DataFrame = {
    require(k >= 1 && w >= 1, s"k=$k w=$w")
    import docs.sparkSession.implicits._
    docs.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val hex = "0123456789abcdef".toCharArray
        def md5hex(s: String): String = {
          md.reset()
          val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          val cs = new Array[Char](32)
          var b = 0
          while (b < 16) {
            cs(2 * b) = hex((d(b) & 0xf0) >> 4)
            cs(2 * b + 1) = hex(d(b) & 0x0f)
            b += 1
          }
          new String(cs)
        }
        it.flatMap { case (id, text) =>
          val toks = graft.analysis.Analyzer.tokens(text)
          if (toks.length < k + w - 1) Iterator.empty
          else {
            val n = toks.length - k + 1
            val hs = new Array[String](n)
            var i = 0
            while (i < n) {
              hs(i) = md5hex(toks.slice(i, i + k).mkString(" "))
              i += 1
            }
            // window minima (md5 hex is ASCII ⇒ String order == the
            // binary order array_min/list_min use), first-seen distinct
            val out = scala.collection.mutable.LinkedHashSet.empty[String]
            var j = 0
            while (j <= n - w) {
              var m = hs(j)
              var l = j + 1
              while (l < j + w) { if (hs(l) < m) m = hs(l); l += 1 }
              out += m
              j += 1
            }
            out.iterator.map(fp => (id, fp))
          }
        }
      }
      .toDF("doc_id", "fp")
  }

  private def winnowSets(docs: DataFrame, k: Int, w: Int): DataFrame = {
    require(k >= 1 && w >= 1, s"k=$k w=$w")
    val toks = tokensCol
    // k-gram md5 hashes: positions 1..n-k+1 (slice is 1-based)
    val grams = transform(
      sequence(lit(1), size(toks) - (k - 1)),
      i => md5(concat_ws(" ", slice(toks, i, lit(k)))))
    docs
      .filter(size(toks) >= k + w - 1) // at least one full window
      .select(col("doc_id"), grams.as("hs"))
      .select(col("doc_id"),
        array_distinct(transform(
          sequence(lit(1), size(col("hs")) - (w - 1)),
          i => array_min(slice(col("hs"), i, lit(w))))).as("fps"))
  }

  /** Exact-substring overlap candidates (r5) — the dedup class of Lee et
    * al. 2022 ("Deduplicating Training Data Makes Language Models
    * Better"): doc pairs sharing ≥ `minShared` winnowing fingerprints.
    * By the winnowing guarantee (Schleimer et al. §3: any shared token
    * run of length ≥ k+w-1 shares ≥ 1 selected fingerprint), a pair
    * with many shared fingerprints is covered by long literal common
    * substrings — the suffix-array use case, in join-friendly form.
    *
    * Shape at 100 TB: self-join ON THE FINGERPRINT KEY (bucket join,
    * never all-pairs), with ubiquitous fingerprints dropped first —
    * a fingerprint in > `maxDocsPerFp` docs is boilerplate whose
    * c² pair blow-up would dominate cost while signaling nothing
    * (the LSH hot-band cap, same reasoning). */
  def substringOverlapPairs(docs: DataFrame, k: Int = 3, w: Int = 4,
                            minShared: Long = 2L,
                            maxDocsPerFp: Long = 64L): DataFrame = {
    // materialize the (doc, fp) frame ONCE (localCheckpoint, the o1 /
    // packSequences pattern): it feeds the frequency filter AND both
    // sides of the self-join — without this the tokenize+md5+winnow
    // pipeline recomputes four times (probed 100 s → ~3 s at sf0.1)
    val sel = winnowSelected(docs, k, w).localCheckpoint(true)
    val usable = sel.groupBy(col("fp")).agg(count(lit(1)).as("c"))
      .filter(col("c") >= 2 && col("c") <= maxDocsPerFp)
      .select(col("fp"))
    val kept = sel.join(usable, Seq("fp")).localCheckpoint(true)
    // kept's eager checkpoint is its own block set — sel (the full
    // fingerprint frame, the job's largest intermediate) is dead from
    // here. NOTE (ADVICE r05 item 1): there is no eager release for a
    // localCheckpoint-backed Dataset — Dataset.unpersist routes through
    // the CacheManager, which only tracks cache()/persist() plans, so a
    // call here would be a silent no-op. The blocks are reclaimed by the
    // ContextCleaner once the checkpointed RDD is unreachable (end of
    // this method for sel; with the returned plan for kept).
    kept.as("a")
      .join(kept.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("shared_fps"))
      .filter(col("shared_fps") >= minShared)
  }

  /** Repetition-based quality signals (the Gopher rules of Rae et al.
    * 2021, §A1.1, restated over the analyzer token stream): the fraction
    * of all 2-grams taken by the single most frequent 2-gram, the fraction
    * of 2-gram occurrences whose 2-gram occurs more than once, and the
    * same top-fraction for unigrams. High values flag boilerplate /
    * degenerate repetition that length or stopword filters miss.
    *
    * Shape at 100 TB: explode + two-level hash agg with map-side partials
    * keyed by (doc_id, gram) then doc_id — no window functions, no skew
    * (keys are per-document). Docs with fewer than 2 tokens have no
    * 2-gram and are dropped (same filter on the oracle side). */
  def repetitionSignals(docs: DataFrame): DataFrame = {
    val toks = tokensCol
    val grams2 = transform(
      sequence(lit(1), size(toks) - 1),
      i => concat_ws(" ", slice(toks, i, lit(2))))
    // ONE tokenize/scan pass: unigrams and 2-grams ride the same explode
    // tagged by kind, then two-level agg (doc,kind,gram) -> (doc) with
    // conditional aggregates — no self-join of two scans
    docs.filter(size(toks) >= 2)
      .select(col("doc_id"), explode(concat(
          transform(grams2, g => struct(lit("g").as("kind"), g.as("gram"))),
          transform(toks, t => struct(lit("t").as("kind"), t.as("gram")))))
        .as("x"))
      .select(col("doc_id"), col("x.kind").as("kind"), col("x.gram").as("gram"))
      .groupBy(col("doc_id"), col("kind"), col("gram"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(
        sum(when(col("kind") === "g", col("c")).otherwise(0L)).as("tot2"),
        max(when(col("kind") === "g", col("c"))).as("mx2"),
        sum(when(col("kind") === "g" && col("c") > 1, col("c"))
          .otherwise(0L)).as("dup2"),
        sum(when(col("kind") === "t", col("c")).otherwise(0L)).as("tot1"),
        max(when(col("kind") === "t", col("c"))).as("mx1"))
      .select(col("doc_id"),
        round(col("mx2").cast("double") / col("tot2").cast("double"), 6)
          .as("top_2gram_frac"),
        round(col("dup2").cast("double") / col("tot2").cast("double"), 6)
          .as("dup_2gram_frac"),
        round(col("mx1").cast("double") / col("tot1").cast("double"), 6)
          .as("top_token_frac"))
  }

  /** PII-style redaction patterns — RE2-safe (no lookarounds/backrefs),
    * so the same pattern text runs identically under Java regex (Spark)
    * and RE2 (DuckDB oracle), the BpePretokenPattern trick. The URL
    * pattern spells out the whitespace class: Java's \s includes \x0B
    * (vertical tab) while RE2's does not, so a bare [^\s]+ would redact
    * different spans on \x0B-bearing text. */
  val RedactEmail: String = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""
  val RedactUrl: String = "https?://[^ \\t\\n\\x0B\\f\\r]+"
  val RedactLongId: String = """\b\d{6,}\b"""

  /** Redact emails / URLs / long digit runs (the cheap PII pass of a
    * training pipeline). Map-only codegen'd regexes; output carries the
    * match counts and the redacted text's md5 so an oracle checks the
    * full replacement semantics without shipping the text. */
  def redact(docs: DataFrame): DataFrame = {
    val redacted = regexp_replace(
      regexp_replace(
        regexp_replace(col("text"), RedactEmail, "<EMAIL>"),
        RedactUrl, "<URL>"),
      RedactLongId, "<ID>")
    docs.select(col("doc_id"),
      size(regexp_extract_all(col("text"), lit(RedactEmail), lit(0)))
        .cast("long").as("n_emails"),
      size(regexp_extract_all(col("text"), lit(RedactUrl), lit(0)))
        .cast("long").as("n_urls"),
      size(regexp_extract_all(col("text"), lit(RedactLongId), lit(0)))
        .cast("long").as("n_ids"),
      md5(redacted).as("redacted_md5"))
  }

  /** Benchmark decontamination: flag corpus docs sharing any token
    * n-gram with a benchmark/eval set — the standard train/test overlap
    * scrub. Scale shape: the benchmark gram set is small and BROADCAST
    * (plan-asserted); the corpus side is one explode + semi-join + agg,
    * no shuffle of the corpus beyond the per-doc count. */
  def contaminationFlags(docs: DataFrame, bench: DataFrame,
                         n: Int = 4): DataFrame = {
    val toks = tokensCol
    val grams = transform(
      sequence(lit(1), size(toks) - (n - 1)),
      i => concat_ws(" ", slice(toks, i, lit(n))))
    def gramRows(df: DataFrame) =
      df.filter(size(toks) >= n)
        .select(col("doc_id"), explode(grams).as("g"))
    val benchGrams = gramRows(bench).select(col("g")).distinct()
    gramRows(docs)
      .join(broadcast(benchGrams), Seq("g"))
      .groupBy(col("doc_id"))
      .agg(count_distinct(col("g")).as("n_shared_grams"))
  }

  /** Deterministic hash split — the reshard-stable train/val/test
    * assignment of a training pipeline: the split is a pure function of
    * the KEY (first two hex chars of md5), so it survives repartitioning,
    * backfills and engine changes, unlike rand()-based sampling. Map-only;
    * thresholds are hex-prefix cuts of the uniform md5 space
    * (test < 0x08 = 1/32, val < 0x18 = next 1/16, train = rest). */
  def deterministicSplit(docs: DataFrame, key: Column): DataFrame = {
    val h = substring(md5(key.cast("string")), 1, 2)
    docs.withColumn("split",
      when(h < "08", "test").when(h < "18", "val").otherwise("train"))
  }

  /** Source-mixture statistics + temperature sampling weight — the
    * multilingual/multi-source α-sampling rule (α = 0.5, the sqrt
    * temperature of Conneau & Lample, "Cross-lingual Language Model
    * Pretraining", NeurIPS'19 §3.1): per source, size share
    * p_s = chars_s / total and unnormalized weight w_s = sqrt(p_s) —
    * the knob that up-samples small sources without letting any one
    * dominate. One hash agg over (source) plus a broadcast 1-row total;
    * sizes stay exact integers, and every double op (one divide, one
    * sqrt) is per-row IEEE-correctly-rounded, so the gate is bit-exact
    * in DuckDB. The ORDER-SENSITIVE normalization Σ w_s happens
    * driver-side in [[normalizedMixture]] over a sorted source list
    * (bit-stable), not in the distributed plan. */
  def mixtureWeights(docs: DataFrame): DataFrame = {
    // ONE corpus scan: the exact integer total re-derives from the tiny
    // grouped frame itself (Σ per-source chars ≡ the separate full agg)
    val grouped = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("chars"))
    val total = grouped.agg(sum(col("chars")).cast("double").as("total"))
    grouped
      .crossJoin(broadcast(total)) // 1 row — never a real cartesian
      .select(col("source"), col("n_docs"), col("chars"),
        (col("chars").cast("double") / col("total")).as("p"),
        sqrt(col("chars").cast("double") / col("total")).as("w"))
      .orderBy(col("source"))
  }

  /** Normalized sampling mixture from [[mixtureWeights]] output: collects
    * the (tiny, one-row-per-source) result, sums weights in SORTED source
    * order (deterministic float fold) and divides. */
  def normalizedMixture(weights: DataFrame): Map[String, Double] = {
    val rows = weights.select(col("source"), col("w")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).sortBy(_._1)
    val z = rows.foldLeft(0.0)(_ + _._2)
    rows.map { case (s, w) => s -> (if (z == 0.0) 0.0 else w / z) }.toMap
  }

  /** Sequence packing for pretraining dataloaders (r5): the standard
    * concatenate-then-chunk scheme — the token streams of all docs, in
    * doc_id order, form one flat stream cut into fixed `budget`-token
    * training sequences ("packs"). Per doc: exact token count, exact
    * GLOBAL start offset in the flat stream, the pack its first token
    * lands in, and whether it straddles a pack boundary (the rows a
    * loss-masking dataloader treats specially).
    *
    * The global exclusive prefix sum runs WITHOUT the single-partition
    * window trap, on the shared DocIdAssigner pid-column scaffold:
    * deterministic value-hash boundary sample → per-pid token sums →
    * broadcast prefix offsets → steered repartition (one pid = one
    * task) + in-task running sum. No partition ever holds more than
    * ~n/p rows and no global sort precedes the (inherently ordered)
    * output — the same shape that ranks a 10^8-term vocabulary in
    * o1_df_order. All arithmetic is exact integers (`div`, not float
    * division), so the gate is bit-stable at any parallelism. */
  def packSequences(docs: DataFrame, budget: Long): DataFrame = {
    require(budget > 0, s"pack budget must be positive: $budget")
    val s = docs.sparkSession
    import graft.index.DocIdAssigner.{bucketOf, prefixOffsets,
      quantileBoundaries, steeringKeys}
    import s.implicits._
    val tl = docs.select(col("doc_id").cast("long").as("doc_id"),
        size(filter(split(col("text"), " "), t => length(t) >= 2))
          .cast("long").as("n_tokens"))
      .cache() // tiny (two longs per doc); three jobs read it
    try {
      val p = math.max(1, s.sessionState.conf.numShufflePartitions / 2)
      val n = tl.count()
      val sampleMod = math.max(1L, n / math.max(1L, p.toLong * 200L))
      val keys = tl
        .filter(pmod(xxhash64(col("doc_id")), lit(sampleMod)) === 0)
        .select(col("doc_id")).collect().map(_.getLong(0)).sorted
      val bnds = quantileBoundaries[Long](
        scala.collection.immutable.ArraySeq.unsafeWrapArray(keys), p)
      val nPids = bnds.length + 1
      val bB = s.sparkContext.broadcast(bnds)
      val bSteer = s.sparkContext.broadcast(steeringKeys(nPids))
      val pidUdf = udf((d: Long) => bucketOf[Long](bB.value, d))
      val withPid = tl.withColumn("pid", pidUdf(col("doc_id")))
      // per-pid TOKEN sums (not row counts) → exclusive prefix offsets
      val sums: Map[Int, Long] =
        if (nPids == 1) Map.empty
        else withPid.groupBy(col("pid"))
          .agg(sum(col("n_tokens")).as("t")).collect()
          .map(r => r.getInt(0) -> r.getLong(1)).toMap
      val bOff = s.sparkContext.broadcast(prefixOffsets(sums, nPids, base = 0L))
      val pkeyUdf = udf((pid: Int) => bSteer.value(pid))
      withPid
        .withColumn("pkey", pkeyUdf(col("pid")))
        .repartition(nPids, col("pkey"))
        .sortWithinPartitions(col("pid"), col("doc_id"))
        .mapPartitions { it =>
          var curPid = -1
          var off = 0L
          it.map { r => // (doc_id, n_tokens, pid, pkey)
            val pid = r.getInt(2)
            if (pid != curPid) { curPid = pid; off = bOff.value(pid) }
            val start = off
            off += r.getLong(1)
            (r.getLong(0), r.getLong(1), start)
          }
        }
        .toDF("doc_id", "n_tokens", "start_offset")
        .select(col("doc_id"), col("n_tokens"), col("start_offset"),
          expr(s"start_offset div $budget").as("pack_id"),
          (col("n_tokens") > 0 &&
            expr(s"start_offset div $budget") =!=
            expr(s"(start_offset + n_tokens - 1) div $budget"))
            .as("spans_boundary"))
        .localCheckpoint(true) // materialize before the finally unpersists
    } finally { tl.unpersist(); () }
  }

  /** Per-doc bigram stream (adjacent token pairs after the length≥2
    * filter). Docs with < 2 tokens contribute no rows. */
  private def bigramPairs(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        filter(split(col("text"), " "), t => length(t) >= 2).as("toks"))
      // size >= 2 FIRST: Spark's sequence(1, 0) would count DOWNWARD
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(toks)-1), " +
        "i -> struct(toks[i-1] AS w1, toks[i] AS w2))")).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))

  /** LM-count quality signals (the exact-arithmetic face of CCNet-style
    * LM filtering, Wenzek et al., "CCNet", LREC'20): per doc over its
    * adjacent-token bigrams,
    *   n_bigrams       — pair count,
    *   known_bigrams   — pairs whose CORPUS frequency ≥ 2 (seen beyond
    *                     this occurrence: boilerplate scores high,
    *                     gibberish scores low),
    *   freq_sum        — Σ corpus frequency (exact BIGINT),
    *   known_ratio     — known/n, the quality score (ONE IEEE divide).
    * Distribution shape at 100 TB: one partial-aggregated bigram count
    * (hot pairs like "of the" pre-combine map-side) and one shuffle join
    * on the bigram key back to the pair stream — no vocab-sized
    * broadcast anywhere; per-doc sums are exact integers so the gate is
    * bit-stable at any parallelism. Docs with < 2 tokens are absent (no
    * bigrams to judge). */
  def bigramQuality(docs: DataFrame): DataFrame = {
    val pairs = bigramPairs(docs)
    val counts = pairs.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c"))
    pairs.join(counts, Seq("w1", "w2"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(when(col("c") >= 2, 1L).otherwise(0L)).as("known_bigrams"),
        sum(col("c")).as("freq_sum"))
      .withColumn("known_ratio",
        col("known_bigrams").cast("double") / col("n_bigrams").cast("double"))
  }

  /** True CCNet-style average log-probability under a Laplace-smoothed
    * corpus bigram LM: per doc, mean over its bigrams of
    * ln((c(w1,w2) + 1) / (c1(w1) + V)) with V = distinct-token count.
    * NOT driver-gated: a many-term float sum cannot be made bit-exact
    * against an independent engine (different libm ulps), so its oracle
    * is OpsSpec's brute-force twin under tolerance; [[bigramQuality]] is
    * the exact-gate sibling. Same 100 TB shape: count aggs + shuffle
    * joins on token keys, nothing broadcast, nothing collected. */
  def lmLogProb(docs: DataFrame): DataFrame = {
    val pairs = bigramPairs(docs)
    val bigramC = pairs.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c2"))
    val toks = docs.select(col("doc_id"),
        explode(filter(split(col("text"), " "), t => length(t) >= 2)).as("w1"))
    val unigramC = toks.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    val vocab = unigramC.agg(count(lit(1)).as("v"))
    pairs
      .join(bigramC, Seq("w1", "w2"))
      .join(unigramC, Seq("w1"))
      .crossJoin(broadcast(vocab)) // 1 row — never a real cartesian
      .select(col("doc_id"),
        log((col("c2").cast("double") + lit(1.0)) /
            (col("c1").cast("double") + col("v").cast("double"))).as("lp"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), avg(col("lp")).as("avg_logp"))
  }
}
