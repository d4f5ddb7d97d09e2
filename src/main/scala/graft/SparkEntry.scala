package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

import graft.entry.{EntryQueries => Q}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Each key is an operator from SURVEY.md §2 (or a training-pipeline
  * extension); `oracleSql` carries the DuckDB twin where SQL-expressible,
  * others get the driver's rows-only check and are pinned by ScalaTest
  * specs instead. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * BM25 top-10 over the documents corpus (the north-star read path). */
  def entry(spark: SparkSession): DataFrame =
    Q.u5Bm25TopK(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // search-engine core (SURVEY.md §2.2-§2.8)
    "a1_tf" -> (Q.a1Tf(_, _)),
    "a2_dictionary" -> (Q.a2Dictionary(_, _)),
    "a6_corpus_stats" -> (Q.a6CorpusStats(_, _)),
    "f4_stopterm_cap" -> (Q.f4StopCap(_, _)),
    "j1_and_intersect" -> (Q.j1AndIntersect(_, _)),
    "o5_or_union" -> (Q.o5OrUnion(_, _)),
    "u5_bm25_topk" -> (Q.u5Bm25TopK(_, _)),
    "u5_bm25_or_topk" -> (Q.u5Bm25OrTopK(_, _)),
    "phrase_topk" -> (Q.phraseTopK(_, _)),
    "near_topk" -> (Q.nearTopK(_, _)),
    "near3_matches" -> (Q.near3Matches(_, _)),
    "near_ordered_topk" -> (Q.nearOrderedTopK(_, _)),
    "bool_not_topk" -> (Q.boolNotTopK(_, _)),
    "bool_should_topk" -> (Q.boolShouldTopK(_, _)),
    "bool_mixed_topk" -> (Q.boolMixedTopK(_, _)),
    "field_filter_topk" -> (Q.fieldFilterTopK(_, _)),
    "range_filter_topk" -> (Q.rangeFilterTopK(_, _)),
    "prefix_term_topk" -> (Q.prefixTermTopK(_, _)),
    "fuzzy_term_topk" -> (Q.fuzzyTermTopK(_, _)),
    "wildcard_topk" -> (Q.wildcardTopK(_, _)),
    "w1_token_positions" -> (Q.w1TokenPositions(_, _)),
    // relational operators (§2.1-§2.7)
    "q1_agg" -> (Q.q1Agg(_, _)),
    "j3_broadcast_join" -> (Q.j3BroadcastJoin(_, _)),
    "j4_multi_join" -> (Q.j4MultiJoin(_, _)),
    "j1_semi_join_rel" -> (Q.j1SemiJoinRel(_, _)),
    "j5_anti_join" -> (Q.j5AntiJoin(_, _)),
    "w3_window_topn" -> (Q.w3WindowTopN(_, _)),
    "w2_running_sum" -> (Q.w2RunningSum(_, _)),
    "o2_topk" -> (Q.o2TopK(_, _)),
    "o6_intersect" -> (Q.o6Intersect(_, _)),
    "o8_except" -> (Q.o8Except(_, _)),
    "c2_scalar_funcs" -> (Q.c2ScalarFuncs(_, _)),
    "a6_events_hourly" -> (Q.a6EventsHourly(_, _)),
    "c_json_extract" -> (Q.cJsonExtract(_, _)),
    "f1_html_strip" -> (Q.f1HtmlStrip(_, _)),
    "j6_prefix_filter" -> (Q.j6PrefixFilter(_, _)),
    "o1_df_order" -> (Q.o1DfOrder(_, _)),
    // training-pipeline operators
    "dedup_exact" -> (Q.dedupExact(_, _)),
    "fingerprint_md5" -> (Q.fingerprintMd5(_, _)),
    "ngram_jaccard_pairs" -> (Q.ngramJaccardPairs(_, _)),
    "ann_cosine_topk" -> (Q.annCosineTopK(_, _)),
    "ann_ivf_topk" -> (Q.annIvfTopK(_, _)),
    "text_quality" -> (Q.textQuality(_, _)),
    "token_count_dl" -> (Q.tokenCountDl(_, _)),
    "token_count_bpe" -> (Q.tokenCountBpe(_, _)),
    // oracle-checked via md5-based SimHash (signatures reproducible in
    // DuckDB; pair recall guaranteed by maxHamming+1 banding)
    "dedup_simhash" -> (Q.dedupSimhash(_, _)),
    "dedup_simhash_pairs" -> (Q.dedupSimhashPairs(_, _)),
    "dedup_clusters" -> (Q.dedupClusters(_, _)),
    "fingerprint_winnow" -> (Q.fingerprintWinnow(_, _)),
    "quality_repetition" -> (Q.qualityRepetition(_, _)),
    "sample_split" -> (Q.sampleSplit(_, _)),
    "mixture_weights" -> (Q.mixtureWeights(_, _)),
    "text_redact" -> (Q.textRedact(_, _)),
    "decontaminate" -> (Q.decontaminate(_, _)),
    "lang_id" -> (Q.langId(_, _)),
    // rows-only (probabilistic recall — not SQL-expressible exactly;
    // pinned by OpsSpec brute-force oracles instead)
    "dedup_minhash_lsh" -> (Q.dedupMinhashLsh(_, _)),
    "ann_lsh_topk" -> (Q.annLshTopK(_, _)),
    "embedding_near_dup" -> (Q.embeddingNearDup(_, _)),
    "u6_snippets" -> (Q.u6Snippets(_, _)),
    "multimodal_signals" -> (Q.multimodalSignals(_, _)),
    "lm_bigram_quality" -> (Q.lmBigramQuality(_, _)),
    "lm_rank" -> (Q.lmRank(_, _)),
    "pack_sequences" -> (Q.packSequencesQ(_, _)),
    "substring_overlap" -> (Q.substringOverlap(_, _)),
    // batch twin of the streaming sessionizer (full SQL oracle)
    "w4_sessionize" -> (Q.w4Sessionize(_, _)),
  )

  def oracleSql: Map[String, String] = Map(
    "a1_tf" -> Q.a1TfSql,
    "a2_dictionary" -> Q.a2DictionarySql,
    "a6_corpus_stats" -> Q.a6CorpusStatsSql,
    "f4_stopterm_cap" -> Q.f4StopCapSql,
    "j1_and_intersect" -> Q.j1AndIntersectSql,
    "o5_or_union" -> Q.o5OrUnionSql,
    "u5_bm25_topk" -> Q.u5Bm25TopKSql,
    "u5_bm25_or_topk" -> Q.u5Bm25OrTopKSql,
    "phrase_topk" -> Q.phraseTopKSql,
    "near_topk" -> Q.nearTopKSql,
    "near3_matches" -> Q.near3MatchesSql,
    "near_ordered_topk" -> Q.nearOrderedTopKSql,
    "bool_not_topk" -> Q.boolNotTopKSql,
    "bool_should_topk" -> Q.boolShouldTopKSql,
    "bool_mixed_topk" -> Q.boolMixedTopKSql,
    "field_filter_topk" -> Q.fieldFilterTopKSql,
    "range_filter_topk" -> Q.rangeFilterTopKSql,
    "prefix_term_topk" -> Q.prefixTermTopKSql,
    "fuzzy_term_topk" -> Q.fuzzyTermTopKSql,
    "wildcard_topk" -> Q.wildcardTopKSql,
    "w1_token_positions" -> Q.w1TokenPositionsSql,
    "q1_agg" -> Q.q1AggSql,
    "j3_broadcast_join" -> Q.j3BroadcastJoinSql,
    "j4_multi_join" -> Q.j4MultiJoinSql,
    "j1_semi_join_rel" -> Q.j1SemiJoinRelSql,
    "j5_anti_join" -> Q.j5AntiJoinSql,
    "w3_window_topn" -> Q.w3WindowTopNSql,
    "w2_running_sum" -> Q.w2RunningSumSql,
    "o2_topk" -> Q.o2TopKSql,
    "o6_intersect" -> Q.o6IntersectSql,
    "o8_except" -> Q.o8ExceptSql,
    "c2_scalar_funcs" -> Q.c2ScalarFuncsSql,
    "a6_events_hourly" -> Q.a6EventsHourlySql,
    "c_json_extract" -> Q.cJsonExtractSql,
    "f1_html_strip" -> Q.f1HtmlStripSql,
    "j6_prefix_filter" -> Q.j6PrefixFilterSql,
    "o1_df_order" -> Q.o1DfOrderSql,
    "dedup_exact" -> Q.dedupExactSql,
    "fingerprint_md5" -> Q.fingerprintMd5Sql,
    "ngram_jaccard_pairs" -> Q.ngramJaccardPairsSql,
    "ann_cosine_topk" -> Q.annCosineTopKSql,
    "text_quality" -> Q.textQualitySql,
    "token_count_dl" -> Q.tokenCountDlSql,
    "w4_sessionize" -> Q.w4SessionizeSql,
    "dedup_simhash" -> Q.dedupSimhashSql,
    "dedup_simhash_pairs" -> Q.dedupSimhashPairsSql,
    "dedup_clusters" -> Q.dedupClustersSql,
    "fingerprint_winnow" -> Q.fingerprintWinnowSql,
    "quality_repetition" -> Q.qualityRepetitionSql,
    "sample_split" -> Q.sampleSplitSql,
    "mixture_weights" -> Q.mixtureWeightsSql,
    "text_redact" -> Q.textRedactSql,
    "decontaminate" -> Q.decontaminateSql,
    "lang_id" -> Q.langIdSql,
    "u6_snippets" -> Q.u6SnippetsSql,
    "multimodal_signals" -> Q.multimodalSignalsSql,
    "lm_bigram_quality" -> Q.lmBigramQualitySql,
    "lm_rank" -> Q.lmRankSql,
    "pack_sequences" -> Q.packSequencesSql,
    "substring_overlap" -> Q.substringOverlapSql,
    "ann_ivf_topk" -> Q.annIvfTopKSql,
    "token_count_bpe" -> Q.tokenCountBpeSql,
    // pinned goldens for the probabilistic ops (deterministic on the
    // fixed corpus; recall semantics pinned by OpsSpec brute force)
    "ann_lsh_topk" -> Q.annLshTopKSql,
    "dedup_minhash_lsh" -> Q.dedupMinhashLshSql,
    "embedding_near_dup" -> Q.embeddingNearDupSql,
  )
}
