package graft.engine

import org.scalatest.funsuite.AnyFunSuite

/** Runs [[SessionRelifeProbe]] in a fresh forked JVM (the shared test
  * SparkSession cannot be stopped mid-run) and asserts the stop → new
  * session → query sequence succeeds against the per-root caches. */
class SessionRelifeSpec extends AnyFunSuite {
  test("stopped-then-recreated session: cached aligned plans revalidated, not served stale") {
    val jvmArgs = java.lang.management.ManagementFactory
      .getRuntimeMXBean.getInputArguments
    val cmd = new java.util.ArrayList[String]()
    cmd.add(System.getProperty("java.home") + "/bin/java")
    jvmArgs.forEach(a => if (!a.startsWith("-agentlib")) cmd.add(a))
    cmd.add("-cp"); cmd.add(System.getProperty("java.class.path"))
    cmd.add("graft.engine.SessionRelifeProbe")
    val pb = new ProcessBuilder(cmd)
    pb.redirectErrorStream(true)
    val proc = pb.start()
    val out = new String(proc.getInputStream.readAllBytes())
    val rc = proc.waitFor()
    assert(rc == 0 && out.contains("RELIFE_OK"),
      s"relife probe failed (rc=$rc):\n${out.takeRight(4000)}")
  }
}
