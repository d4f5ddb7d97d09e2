package graft

import org.scalatest.funsuite.AnyFunSuite

/** The un-killable-bench contract (VERDICT r05 item 1): r5's driver bench
  * was killed by timeout and emitted NOTHING (rc=124, parsed: null)
  * because the JSON printed only after an unconditional section chain.
  * `Bench.run` now stamps a global deadline and checks it before every
  * section / build rep / operator query; on breach it SKIPS the rest and
  * STILL returns the one-line JSON. This spec drives the breach path with
  * a zero budget: every section must be recorded skipped, no section may
  * touch a SparkSession or the committed BENCH/BASELINE.md, and the JSON
  * must stay parseable with inert zeros. */
class BenchSpec extends AnyFunSuite {

  test("zero budget: every section skipped, JSON still emitted and well-formed") {
    val t0 = System.nanoTime()
    val json = Bench.run(sfDir = "/root/testdata/sf0.001", cpus = 2,
      nConvs = 1000L, reps = 1, deadlineSec = 0L, writeMd = false)
    val secs = (System.nanoTime() - t0) / 1e9
    // instant: nothing may spin up Spark or fork a build JVM on breach
    assert(secs < 30, f"breach path took $secs%.1f s - a section ran work")
    assert(json.startsWith("{") && json.endsWith("}"))
    assert(json.contains("\"sections_completed\":[]"),
      s"no section may complete at budget 0: $json")
    Seq("operators", "phrase_vs_and", "build_scaling", "build_scaling_large",
        "hw_probes", "query_latency").foreach { s =>
      assert(json.contains("\"" + s + "\""), s"section $s missing from JSON")
    }
    // the artifact keys the driver parses must exist with inert values;
    // metrics a skipped section never measured carry the -1 SKIP MARKER
    // (VERDICT r06 item 1: 0.0000 reads as "instant", not "never ran")
    Seq("\"metric\":", "\"value\":", "\"unit\":\"sec\"", "\"queries\":{}",
        "\"scaling_efficiency_8_to_32\":0.0000",
        "\"p95_sec\":-1.0000", "\"and_topk_sec\":-1.0000",
        "\"phrase_positional_sec\":-1.0000", "\"p50_cached_sec\":-1.0000",
        "\"serving_cache_mb\":-1.0000", "\"probe_quiet_sec\":-1.0000",
        "\"deadline_sec\":0").foreach { k =>
      assert(json.contains(k), s"missing $k in: ${json.take(400)}...")
    }
    // (the MD renderer maps the same -1 markers to the literal `skipped`
    // via fmtS; writeMd=false here keeps the committed BENCH/BASELINE.md
    // untouched, so the marker contract is pinned at the JSON layer)
    // balanced braces = cheap well-formedness proof without a JSON lib
    assert(json.count(_ == '{') == json.count(_ == '}'))
    assert(json.count(_ == '[') == json.count(_ == ']'))
  }

  test("withAddendum carries the builder's quiet-window record across regenerations") {
    val mk = Bench.AddendumMarker
    val fresh = Bench.withAddendum("NEW REPORT", None)
    assert(fresh.startsWith("NEW REPORT") && fresh.contains(mk))
    // a pre-marker file (old format) gains the marker, loses nothing new
    val noMarker = Bench.withAddendum("NEW REPORT", Some("OLD AUTO TEXT"))
    assert(noMarker.startsWith("NEW REPORT") && noMarker.contains(mk) &&
      !noMarker.contains("OLD AUTO TEXT"))
    // the addendum BELOW the marker survives; the auto text above it dies
    val old = s"OLD AUTO TEXT\n$mk\n## builder addendum\nquiet numbers"
    val carried = Bench.withAddendum("NEW REPORT", Some(old))
    assert(carried.startsWith("NEW REPORT"))
    assert(carried.contains("## builder addendum\nquiet numbers"))
    assert(!carried.contains("OLD AUTO TEXT"))
    // idempotent: regenerating again keeps exactly one marker + addendum
    val twice = Bench.withAddendum("NEWER", Some(carried))
    assert(twice.sliding(mk.length).count(_ == mk) == 1)
    assert(twice.contains("quiet numbers"))
  }

  test("the deadline env default leaves headroom inside a plausible harness timeout") {
    // guard against someone fat-fingering the default far above the
    // driver's observed kill window (r5 died somewhere <= 2h; 1500 s
    // leaves margin even at contention x4 on the emit path)
    val src = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("src/main/scala/graft/Bench.scala")))
    assert(src.contains("GRAFT_BENCH_DEADLINE_SEC\", \"1500\""))
  }
}
