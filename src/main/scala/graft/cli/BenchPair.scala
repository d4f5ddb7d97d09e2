package graft.cli

import java.nio.file.{Files, Paths}
import java.util.Locale

import graft.Bench

/** Quiet-window scaling re-measure (the per-round protocol VERDICT r04/r05
  * prescribe): N vs 4N forked-JVM index builds over a PRE-MATERIALIZED
  * input, levels interleaved across rounds, identical rep counts, a
  * 1-thread busy-loop probe timestamping host quietness between runs —
  * without burning the full `graft.Bench` budget on the operator suite.
  *
  * Usage: BenchPair <inputParquet> <nConvs> <levelsCsv> [reps]
  *   e.g.  BenchPair /dev/shm/turns-400k 400000 1,4 3
  *
  * The input comes from [[GenInput]] (same TranscriptGen seed the Bench
  * sections use). Prints one JSON line: per-level samples + best,
  * pairwise N→4N efficiencies over the interleave, and the probe trace
  * (the probe has no absolute meaning — compare readings to the
  * session's own minimum: a reading ≫ min marks a contention window
  * inside the sweep — discard and re-run, r02's protocol). */
object BenchPair {
  private def fmt(d: Double): String = "%.4f".formatLocal(Locale.ROOT, d)

  /** 1-thread register busy loop, ~2 s on a quiet host: the cheapest
    * host-quietness timestamp (no memory traffic, no Spark). */
  private def probeSecs(): Double = {
    val t0 = System.nanoTime()
    var x = 0L
    var i = 0L
    while (i < 800000000L) { x += i * 31; i += 1 }
    if (x == 42) println(x)
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: BenchPair <inputParquet> <nConvs> <levelsCsv> [reps]")
    val input = args(0)
    val convs = args(1).toLong
    val levels = args(2).split(",").toSeq.map(_.trim.toInt)
    val reps = if (args.length > 3) args(3).toInt else 3
    require(Files.exists(Paths.get(input)), s"input not found: $input (GenInput first)")
    val shm = Paths.get("/dev/shm")
    val base = if (Files.isDirectory(shm) && Files.isWritable(shm)) shm
               else Paths.get(System.getProperty("java.io.tmpdir"))
    val scratch = Files.createTempDirectory(base, "graft-benchpair").toString
    val byLevel = scala.collection.mutable.Map.empty[Int, Vector[Double]]
      .withDefaultValue(Vector.empty)
    val probes = Vector.newBuilder[Double]
    try {
      probeSecs() // JIT warmup
      var rep = 0
      while (rep < reps) {
        levels.foreach { c =>
          probes += probeSecs()
          byLevel(c) = byLevel(c) :+ Bench.forkBuild(c, input, convs, scratch)
        }
        rep += 1
      }
      probes += probeSecs()
    } finally {
      try Bench.deleteRecursively(scratch)
      catch { case e: Exception =>
        System.err.println(s"[benchpair] scratch cleanup failed (ignored): ${e.getMessage}")
      }
    }
    def best(c: Int): Double = if (byLevel(c).isEmpty) 0.0 else byLevel(c).max
    def spread(xs: Vector[Double]): Double =
      if (xs.size < 2 || xs.max == 0.0) 0.0 else (xs.max - xs.min) / xs.max
    val samples = levels.map(c =>
      "\"local" + c + "\":{\"samples\":[" + byLevel(c).map(fmt).mkString(",") +
        "],\"best\":" + fmt(best(c)) + ",\"spread\":" + fmt(spread(byLevel(c))) + "}")
      .mkString("{", ",", "}")
    val effs = levels.sliding(2).collect {
      case Seq(lo, hi) if hi == 4 * lo && best(lo) > 0 =>
        "\"" + lo + "_to_" + hi + "\":" + fmt(best(hi) / (4.0 * best(lo)))
    }.mkString("{", ",", "}")
    println(s"""BENCHPAIR {"convs":$convs,"reps":$reps,"levels":$samples,"efficiency":$effs,"probe_secs":[${probes.result().map(fmt).mkString(",")}]}""")
  }
}
