package graft.engine

import scala.io.Source

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.fixtures.TranscriptGen
import graft.index.IndexBuilder
import graft.model.SearchHit
import graft.query.SearchEngine

/** The committed reference query set (FIXTURES.md §3): queries.tsv +
  * oracle-produced goldens/qNN.tsv. The engine must reproduce every
  * golden file EXACTLY — docIds, ranks, and bit-equal Double scores
  * (scores round-trip through Double.toString). This pins rank-identity
  * against files that cannot drift with code changes: if the analyzer,
  * BM25, or tie-break semantics move, this fails until goldens are
  * consciously regenerated (graft.cli.GenGoldens). */
class GoldenQuerySpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private lazy val root = {
    val dir = SparkTestBase.tmpDir("graft-golden")
    IndexBuilder.build(spark,
      spark.createDataset(TranscriptGen.corpus(seed = 42L, nConvs = 300))(
        org.apache.spark.sql.Encoders.product[graft.model.Turn]),
      dir, shards = 8, waveSize = 8, maxChunkPostings = 64)
    dir
  }

  private def resource(name: String): String = {
    val in = getClass.getResourceAsStream(s"/$name")
    require(in != null, s"missing test resource $name")
    val s = Source.fromInputStream(in, "UTF-8").mkString
    in.close()
    s
  }

  private val queries: Seq[(String, String, String, Int)] =
    resource("queries.tsv").linesIterator.filter(_.nonEmpty).map { l =>
      val Array(qid, mode, q, k) = l.split('\t')
      (qid, mode, q, k.toInt)
    }.toSeq

  test("query set sanity: 12 categories present") {
    assert(queries.size == 12)
    assert(queries.map(_._2).toSet == Set("AND", "OR"))
  }


  test("engine reproduces every committed golden exactly (bit-equal scores)") {
    queries.foreach { case (qid, mode, q, k) =>
      val expected = resource(s"goldens/$qid.tsv").linesIterator
        .filter(_.nonEmpty).map { l =>
          val Array(rank, docId, score) = l.split('\t')
          (rank.toInt, SearchHit(docId.toLong, score.toDouble))
        }.toVector
      val got = SearchEngine.query(spark, root, q, mode, k)
      assert(got.size == expected.size, s"$qid size")
      expected.foreach { case (rank, hit) =>
        assert(got(rank - 1) == hit,
          s"$qid rank $rank: got ${got(rank - 1)}, golden $hit")
      }
    }
  }

  test("pagination slices of a golden respect the reference quirk (O3)") {
    val base = SearchEngine.query(spark, root, "needlemid w0000", "AND", 1000)
    // total > limit → normal slice
    if (base.size > 3) {
      assert(SearchEngine.paginate(base, 3, 3) == base.slice(3, 6))
      // total <= limit → offset ignored
      val firstTwo = base.take(2)
      assert(SearchEngine.paginate(firstTwo, 1, 5) == firstTwo)
    }
  }
}
