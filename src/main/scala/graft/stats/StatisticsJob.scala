package graft.stats

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.index.{IndexBuilder, IndexManifest}

/** Statistics readout (reference `GET /api/statistics` →
  * StatisticsServiceImpl.java:31-77: total pages/lemmas + per-site
  * detail). Ours: totals from the manifest (zero Spark jobs — the metrics
  * were collected at build time, A6 north-rule intent) plus optional
  * live aggregates over the docs table for per-corpus detail.
  */
object StatisticsJob {

  /** TotalStatistics analog: one row of corpus-level totals, straight
    * from the committed manifest (no scan). */
  def totals(spark: SparkSession, root: String): DataFrame = {
    import spark.implicits._
    val m = IndexManifest.read(root).getOrElse(
      throw new IllegalStateException(s"no manifest at $root"))
    Seq((m.nDocs, m.avgdl, m.shards.size.toLong,
      m.shards.map(_.terms).sum, m.shards.map(_.postings).sum,
      m.shards.map(_.bytes).sum, m.analyzerVersion, m.snapshotId))
      .toDF("n_docs", "avgdl", "n_shards", "terms_in_shards",
        "n_postings", "index_bytes", "analyzer_version", "snapshot_id")
  }

  /** DetailedStatisticsItem analog: per-shard metrics from the manifest. */
  def perShard(spark: SparkSession, root: String): DataFrame = {
    import spark.implicits._
    val m = IndexManifest.read(root).getOrElse(
      throw new IllegalStateException(s"no manifest at $root"))
    m.shards.sortBy(_.shard)
      .map(s => (s.shard, s.terms, s.postings, s.bytes,
        s.sourcePartitions.mkString(",")))
      .toDF("shard", "terms", "postings", "bytes", "lineage")
  }

  /** Per-corpus (conv_id) live detail — the per-site counts analog
    * (PageRepository.countBySite :15-17). */
  def perConversation(spark: SparkSession, root: String): DataFrame = {
    import spark.implicits._
    IndexBuilder.loadDocs(spark, root)
      .groupBy($"conv_id")
      .agg(count(lit(1)).as("n_turns"), sum($"dl").as("n_tokens"),
        min($"docId").as("first_doc_id"), max($"docId").as("last_doc_id"))
      .orderBy($"conv_id")
  }
}
