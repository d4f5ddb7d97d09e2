package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SimpleMode
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.entry.{EntryQueries => Q}

/** Physical-plan regression gate (the 100-TB lens, SURVEY.md §4.2):
  * filters must reach the parquet scan, small dimensions must broadcast,
  * aggregations must have map-side partials, scans must prune columns.
  * A plan that silently regresses to shuffle-join / full-schema scan
  * would still pass value checks at sf0.01 while dying at scale —
  * this spec is what catches it. */
class PlanSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.001"

  private def plan(df: DataFrame): String =
    df.queryExecution.explainString(SimpleMode)

  test("dimension joins are broadcast hash joins (J3/J4)") {
    assert(plan(Q.j3BroadcastJoin(spark, dir)).contains("BroadcastHashJoin"))
    val p4 = plan(Q.j4MultiJoin(spark, dir))
    assert("BroadcastHashJoin".r.findAllIn(p4).size >= 2,
      "both nation and region joins must broadcast")
  }

  test("semi/anti joins use the dedicated join types (J1/J5)") {
    assert(plan(Q.j1SemiJoinRel(spark, dir)).contains("LeftSemi"))
    assert(plan(Q.j5AntiJoin(spark, dir)).contains("LeftAnti"))
  }

  test("aggregations are two-phase (map-side partials) — A1/A2/Q1") {
    Seq(Q.q1Agg(spark, dir), Q.a2Dictionary(spark, dir),
      Q.a6EventsHourly(spark, dir)).foreach { df =>
      val p = plan(df)
      assert(p.contains("partial_"), s"no partial aggregation in:\n$p")
    }
  }

  test("column pruning: q1 scan reads only the 4 needed lineitem columns") {
    val p = plan(Q.q1Agg(spark, dir))
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(readSchema.contains("l_quantity") && readSchema.contains("l_returnflag"))
    assert(!readSchema.contains("l_partkey") && !readSchema.contains("l_shipdate"),
      s"scan reads more than it projects: $readSchema")
  }

  test("predicate pushdown: filters reach the parquet scan (S7/F3)") {
    val p = plan(Q.c2ScalarFuncs(spark, dir))
    assert(p.contains("PushedFilters: [") && p.contains("LessThan(o_orderkey,200)"),
      s"o_orderkey < 200 not pushed:\n$p")
  }

  test("postings term lookup is pushed into the scan (S7 analog)") {
    import org.apache.spark.sql.functions._
    val root = SparkTestBase.tmpDir("plan-idx")
    graft.index.IndexBuilder.build(spark,
      graft.fixtures.TranscriptGen.dataset(spark, 42L, 200), root, shards = 4)
    val scan = graft.index.IndexBuilder.loadPostings(spark, root)
      .filter(col("term").isin("needlemid", "w0000"))
    val p = plan(scan)
    assert(p.contains("PushedFilters: [In(term"), s"term filter not pushed:\n$p")
    // shard is a partition column → partition-prunable
    val pruned = graft.index.IndexBuilder.loadPostings(spark, root)
      .filter(col("shard") === 2)
    assert(plan(pruned).contains("PartitionFilters: [isnotnull(shard"),
      "shard filter must be a partition filter, not a data filter")
  }

  test("top-k compiles to TakeOrderedAndProject (O2/O4)") {
    assert(plan(Q.o2TopK(spark, dir)).contains("TakeOrderedAndProject"))
  }

  test("o1 global rank has NO single-partition window (W2 trap)") {
    val p = plan(Q.o1DfOrder(spark, dir))
    assert(!p.contains("Window ["),
      s"o1_df_order must not use a global window:\n$p")
  }

  test("lm_rank has NO single-partition window either (VERDICT r06 item 2)") {
    val p = plan(Q.lmRank(spark, dir))
    assert(!p.contains("Window ["),
      s"lm_rank must not use a global window:\n$p")
  }

  test("lm_rank two-phase rank: identical to a driver-side global sort") {
    import org.apache.spark.sql.functions._
    val got = Q.lmRank(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val scored = graft.ops.TextOps
      .lmLogProb(spark.read.parquet(s"$dir/documents.parquet"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val expected = scored.sortBy { case (id, _, lp) => (-lp, id) }
      .zipWithIndex.map { case ((id, nb, _), i) => (i + 1L, id, nb) }
    assert(got.length == expected.length && got.nonEmpty)
    got.zip(expected).foreach { case (g, e) =>
      assert(g == e, s"rank mismatch: got $g expected $e")
    }
  }

  test("o1 two-phase rank: values identical to a driver-side global sort") {
    import org.apache.spark.sql.functions._
    val got = Q.o1DfOrder(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    val dict = graft.ops.TextOps
      .termFrequencies(spark.read.parquet(s"$dir/documents.parquet"))
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val expected = dict.sortBy { case (t, df) => (df, t) }
      .zipWithIndex.map { case ((t, df), i) => (t, df, i + 1) }
    assert(got.length == expected.length)
    got.zip(expected).foreach { case (g, e) =>
      assert(g == e, s"rank mismatch: got $g expected $e")
    }
  }

  test("scoped query prunes postings and docs scans to manifest-range shards") {
    import org.apache.spark.sql.functions._
    val root = SparkTestBase.tmpDir("plan-scope-idx")
    graft.index.IndexBuilder.build(spark,
      graft.fixtures.TranscriptGen.dataset(spark, 42L, 300), root, shards = 8)
    val m = graft.index.IndexManifest.read(root).get
    assert(m.shards.forall(_.minDocId >= 0))
    // a one-conversation scope must touch exactly one shard's range
    val hits = graft.query.SearchEngine.query(spark, root, "w0000", "OR", 5,
      convPrefix = Some("conv-0000001"))
    assert(hits.nonEmpty)
    // pruning itself: a shard-filtered postings read plans PartitionFilters
    val someShard = m.shards.head.shard
    val pruned = graft.index.IndexBuilder.loadPostings(spark, root)
      .filter(col("shard") === someShard)
    assert(plan(pruned).contains("PartitionFilters: [isnotnull(shard"))
  }

  test("winnowing is a shuffle-free map stage; repetition aggs are two-phase") {
    // fingerprint_winnow: filter + project over the scan — any Exchange
    // here means the map-only 100 TB shape regressed
    val pw = plan(Q.fingerprintWinnow(spark, dir).limit(1))
    assert(!pw.contains("Exchange hashpartitioning"),
      s"winnowing must not shuffle:\n$pw")
    // quality_repetition: explode + (doc,gram) then (doc) hash aggs, both
    // with map-side partials
    val pr = plan(Q.qualityRepetition(spark, dir))
    assert("partial_".r.findAllIn(pr).size >= 2,
      s"repetition aggregations must have partials:\n$pr")
  }

  test("whole-stage codegen covers the relational hot paths") {
    // AQE finalizes the plan only on execution — run, then inspect
    val df = Q.q1Agg(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString()
    assert(p.contains("WholeStageCodegen") || p.contains("*("),
      s"no codegen span in:\n$p")
  }
}
