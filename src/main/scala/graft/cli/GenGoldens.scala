package graft.cli

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.fixtures.TranscriptGen
import graft.oracle.Oracle

/** Writes the reference query set + oracle goldens (FIXTURES.md §3):
  * `queries.tsv` (qid \t mode \t query \t k) and `goldens/qNN.tsv`
  * (rank \t docId \t score) — produced by the SCALAR oracle, never by
  * Spark, over the deterministic tiny corpus (seed=42, 300 convs).
  * Run once; outputs are committed under src/test/resources. */
object GenGoldens {

  /** The query set, one per FIXTURES.md §3 category. */
  val QuerySet: Seq[(String, String, String, Int)] = Seq(
    ("q01", "AND", "needlerare", 10),                  // 1 single rare term
    ("q02", "AND", "needlemid w0000", 10),             // 2 rare+common AND
    ("q03", "AND", "needlerare needlemid w0003", 10),  // 3 empty intersection
    ("q04", "AND", "stopish needlemid", 10),           // 4 stop-cap drop
    ("q05", "AND", "stopish", 10),                     // 5 all-stop → empty
    ("q06", "OR", "needlemid w0000", 10),              // 6 OR mode
    ("q07", "OR", "w0000 w0001", 25),                  // 7 tie-heavy
    ("q08", "AND", "needlemid w0000", 3),              // 8 pagination slice base
    ("q09", "OR", "roleuser w0001", 25),               // 9 hot-term salting/merge
    ("q10", "AND", "roleassistant roletool", 50),      // 9b hot∩hot
    ("q11", "OR", "w0000", 100),                       // common, large k
    ("q12", "AND", "ведущий пример", 10),              // utf-8 / ё-fold
  )

  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("src/test/resources")
    val oracle = new Oracle(TranscriptGen.corpus(seed = 42L, nConvs = 300))
    Files.createDirectories(Paths.get(outDir, "goldens"))
    val tsv = QuerySet.map { case (qid, mode, q, k) =>
      s"$qid\t$mode\t$q\t$k"
    }.mkString("", "\n", "\n")
    Files.write(Paths.get(outDir, "queries.tsv"),
      tsv.getBytes(StandardCharsets.UTF_8))
    QuerySet.foreach { case (qid, mode, q, k) =>
      val hits = oracle.topK(q, mode, k)
      val lines = hits.zipWithIndex.map { case (h, i) =>
        // Double.toString round-trips exactly — scores stay bit-exact
        s"${i + 1}\t${h.docId}\t${h.score}"
      }.mkString("", "\n", if (hits.isEmpty) "" else "\n")
      Files.write(Paths.get(outDir, "goldens", s"$qid.tsv"),
        lines.getBytes(StandardCharsets.UTF_8))
    }
    println(s"wrote ${QuerySet.size} queries + goldens to $outDir")
  }
}
