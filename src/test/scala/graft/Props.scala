package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Minimal deterministic property harness over raw scalacheck `Gen`
  * (org.scalatestplus is not in the offline cache; FIXTURES.md mandates
  * seeded determinism anyway — every run evaluates the same cases). */
object Props {
  def forAllSeeded[A](gen: Gen[A], n: Int = 100)(f: A => Unit): Unit = {
    val params = Gen.Parameters.default
    var i = 0
    var evaluated = 0
    while (i < n * 2 && evaluated < n) { // retry budget for gen failures
      gen.apply(params, Seed(0xC0FFEE + i.toLong)).foreach { a =>
        evaluated += 1
        try f(a)
        catch {
          case e: Throwable =>
            throw new AssertionError(s"property failed for case #$evaluated: $a", e)
        }
      }
      i += 1
    }
    require(evaluated > 0, "generator produced no cases")
  }
}
