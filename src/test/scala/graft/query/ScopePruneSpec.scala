package graft.query

import org.scalatest.funsuite.AnyFunSuite

/** Unit coverage for the conv-prefix shard-pruning predicate
  * (SearchEngine.shardMayHoldPrefix): the p-prefixed key interval is
  * [p, succ(p)) in UTF-8 byte order; a shard range intersecting it may
  * hold scope members, every other shard is skipped. Conservative
  * over-approximation is fine; a FALSE negative would drop scope
  * members, so edges get exact cases. */
class ScopePruneSpec extends AnyFunSuite {

  private def may(mn: String, mx: String, p: String): Boolean =
    SearchEngine.shardMayHoldPrefix(mn, mx, p)

  test("basic containment and exclusion") {
    assert(may("conv-0001", "conv-0500", "conv-02"))
    assert(!may("conv-0001", "conv-0199", "conv-02"), "entirely below")
    assert(!may("conv-0300", "conv-0500", "conv-02"), "entirely above")
    // prefix straddling a shard boundary: both sides kept
    assert(may("conv-0001", "conv-0250", "conv-02"))
    assert(may("conv-0250", "conv-0500", "conv-02"))
  }

  test("prefix equal to / containing the bounds") {
    assert(may("conv-02", "conv-02", "conv-02"), "exact match is in scope")
    assert(may("conv-021", "conv-029", "conv-02"))
    // bound is a strict PREFIX of the query prefix: "conv-0" < "conv-02"
    // but keys under the shard max "conv-0" cannot start with "conv-02"…
    // except none exist above it: mx < p ⇒ excluded
    assert(!may("conv-", "conv-0", "conv-02"))
    // mn itself p-prefixed
    assert(may("conv-020", "zzz", "conv-02"))
  }

  test("empty prefix matches everything") {
    assert(may("a", "b", ""))
    assert(may("", "", ""))
  }

  test("multi-byte UTF-8 bounds compare in byte order") {
    // 'é' (C3 A9) sorts after every ASCII letter in UTF-8 byte order
    assert(may("aaa", "ééé", "z"))
    assert(!may("aaa", "zzz", "é"), "é-prefixed keys sort after zzz")
    assert(may("éa", "éz", "é"))
    // supplementary-plane char (F0 90 80 80) above BMP 'é'
    assert(!may("a", "é", new String(Character.toChars(0x10000))))
  }

  test("successor carries over 0xFF-like tails (unbounded interval)") {
    // UTF-8 never emits 0xFF, but the guard must not misfire on high
    // bytes: prefix of U+FFFF chars (EF BF BF) still bounds correctly
    val high = "￿￿"
    assert(may(high, high + "x", high))
    assert(!may("a", "b", high))
  }
}
