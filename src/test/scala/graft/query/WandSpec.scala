package graft.query

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import graft.Props.forAllSeeded
import graft.index.PostingCodec
import graft.model.SearchHit

/** WAND / intersection exactness: equivalence against a brute-force
  * scorer on random tiny corpora (SURVEY.md §5.2.4, §7.8.2 safety net). */
class WandSpec extends AnyFunSuite {

  /** corpus: docId -> (term -> tf); dl = sum of tfs. */
  type Corpus = Map[Long, Map[String, Int]]

  private val corpusGen: Gen[Corpus] = for {
    nDocs <- Gen.chooseNum(1, 120)
    vocab <- Gen.chooseNum(2, 12)
    docs <- Gen.sequence[Vector[Map[String, Int]], Map[String, Int]](
      Vector.tabulate(nDocs) { _ =>
        Gen.mapOf(for {
          t <- Gen.chooseNum(0, vocab - 1).map(i => s"t$i")
          tf <- Gen.chooseNum(1, 5)
        } yield (t, tf))
      })
  } yield docs.zipWithIndex.map { case (m, i) => i.toLong -> m }.toMap
    .filter(_._2.nonEmpty)

  private def dl(doc: Map[String, Int]): Int = doc.values.sum

  private def buildCursors(corpus: Corpus, terms: Seq[String],
                           chunkCap: Int, blockSize: Int)
      : (Seq[Wand.TermCursor], Long, Double) = {
    val nDocs = corpus.size.toLong
    val avgdl = if (nDocs == 0) 1.0 else corpus.values.map(dl).sum.toDouble / nDocs
    val dfs = terms.map(t => t -> corpus.count(_._2.contains(t)).toLong).toMap
    // canonical order over PRESENT terms only (matches SearchEngine.plan,
    // which builds it from dictionary hits)
    val present = terms.filter(t => dfs(t) > 0)
    val canonical = present.sortBy(t => (dfs(t), t)).zipWithIndex.toMap
    val cursors = present.flatMap { t =>
      val postings = corpus.toVector
        .flatMap { case (d, m) => m.get(t).map(tf => (d, tf, dl(m))) }
        .sortBy(_._1)
      if (postings.isEmpty) None
      else {
        val chunks = postings.grouped(chunkCap).map { g =>
          PostingCodec.encodeBlocked(g.map(_._1).toArray,
            g.map(_._2).toArray, g.map(_._3).toArray, blockSize)
        }.toIndexedSeq
        Some(new Wand.TermCursor(
          Wand.TermPostings(t, dfs(t), canonical(t), chunks), nDocs, avgdl,
          blockSize))
      }
    }
    (cursors, nDocs, avgdl)
  }

  private def brute(corpus: Corpus, terms: Seq[String], mode: String,
                    k: Int): Vector[SearchHit] = {
    val nDocs = corpus.size.toLong
    val avgdl = corpus.values.map(dl).sum.toDouble / nDocs
    val dfs = terms.map(t => t -> corpus.count(_._2.contains(t)).toLong).toMap
    val present = terms.filter(t => dfs(t) > 0)
    if (present.isEmpty || (mode == "AND" && present.size < terms.size))
      return Vector.empty
    val canonical = present.sortBy(t => (dfs(t), t))
    val hits = corpus.toVector.flatMap { case (d, m) =>
      val matched = present.filter(m.contains)
      val ok = if (mode == "AND") matched.size == present.size else matched.nonEmpty
      if (!ok) None
      else {
        var s = 0.0
        canonical.foreach { t =>
          m.get(t).foreach(tf => s += Bm25.score(tf, dfs(t), dl(m), nDocs, avgdl))
        }
        Some(SearchHit(d, s))
      }
    }
    hits.sortBy(h => (-h.score, h.docId)).take(k)
  }

  /** Count-qualified brute force: docs matching >= minMatch of the
    * PRESENT terms, scored over the matched terms in canonical order —
    * the [[Wand.shouldTopKSegments]] contract. minMatch counts against
    * present cursors only because the caller (SearchEngine.queryShould)
    * answers empty when planning drops survivors below minMatch. */
  private def bruteShould(corpus: Corpus, terms: Seq[String], minMatch: Int,
                          k: Int): Vector[SearchHit] = {
    val nDocs = corpus.size.toLong
    val avgdl = corpus.values.map(dl).sum.toDouble / nDocs
    val dfs = terms.map(t => t -> corpus.count(_._2.contains(t)).toLong).toMap
    val present = terms.filter(t => dfs(t) > 0)
    if (present.size < minMatch) return Vector.empty
    val canonical = present.sortBy(t => (dfs(t), t))
    val hits = corpus.toVector.flatMap { case (d, m) =>
      if (present.count(m.contains) < minMatch) None
      else {
        var s = 0.0
        canonical.foreach { t =>
          m.get(t).foreach(tf => s += Bm25.score(tf, dfs(t), dl(m), nDocs, avgdl))
        }
        Some(SearchHit(d, s))
      }
    }
    hits.sortBy(h => (-h.score, h.docId)).take(k)
  }

  private val caseGen = for {
    c <- corpusGen.suchThat(_.nonEmpty)
    nTerms <- Gen.chooseNum(1, 4)
    terms <- Gen.pick(nTerms, (0 until 12).map(i => s"t$i")).map(_.toVector)
    k <- Gen.oneOf(1, 3, 10, 1000)
    chunkCap <- Gen.oneOf(3, 7, 1 << 16) // tiny caps exercise chunk seams
    blockSize <- Gen.oneOf(2, 4, 128)    // tiny blocks exercise BMW skips
  } yield (c, terms.distinct, k, chunkCap, blockSize)

  test("property: AND top-k == brute force (scores bit-equal, ties by docId)") {
    forAllSeeded(caseGen, n = 150) { case (corpus, terms, k, cap, bs) =>
      val (cursors, _, _) = buildCursors(corpus, terms, cap, bs)
      val expected = brute(corpus, terms, "AND", k)
      val got =
        if (cursors.size < terms.size) Vector.empty
        else Wand.andTopK(cursors, k)
      assert(got == expected, s"terms=$terms k=$k cap=$cap bs=$bs")
    }
  }

  test("property: OR WAND top-k == brute force (scores bit-equal, ties by docId)") {
    forAllSeeded(caseGen, n = 150) { case (corpus, terms, k, cap, bs) =>
      val (cursors, _, _) = buildCursors(corpus, terms, cap, bs)
      val expected = brute(corpus, terms, "OR", k)
      val got = Wand.orTopK(cursors, k)
      assert(got == expected, s"terms=$terms k=$k cap=$cap bs=$bs")
    }
  }

  test("property: SHOULD/minMatch top-k == count-qualified brute force") {
    forAllSeeded(caseGen, n = 150) { case (corpus, terms, k, cap, bs) =>
      val (cursors, _, _) = buildCursors(corpus, terms, cap, bs)
      if (cursors.nonEmpty) {
        (1 to cursors.size).foreach { minMatch =>
          val expected = bruteShould(corpus, terms, minMatch, k)
          val fresh = buildCursors(corpus, terms, cap, bs)._1 // per minMatch
          val got = Wand.shouldTopKSegments(fresh, minMatch, k,
            Vector((0L, Long.MaxValue)))
          assert(got == expected,
            s"terms=$terms minMatch=$minMatch k=$k cap=$cap bs=$bs")
        }
      }
    }
  }

  test("property: SHOULD laws — minMatch=1 == OR; minMatch=n == AND (all present)") {
    forAllSeeded(caseGen, n = 120) { case (corpus, terms, k, cap, bs) =>
      def fresh() = buildCursors(corpus, terms, cap, bs)._1
      val cs = fresh()
      if (cs.nonEmpty) {
        assert(Wand.shouldTopKSegments(fresh(), 1, k, Vector((0L, Long.MaxValue)))
          == Wand.orTopK(fresh(), k), s"minMatch=1 vs OR: terms=$terms")
        // the n-of-n law needs every term present (AND of missing = empty
        // by the CALLER's planning; the core sees present cursors only)
        if (cs.size == terms.size)
          assert(Wand.shouldTopKSegments(fresh(), cs.size, k,
              Vector((0L, Long.MaxValue)))
            == Wand.andTopK(fresh(), k), s"minMatch=n vs AND: terms=$terms")
      }
    }
  }

  test("property: segmented SHOULD in one pass == union of per-segment calls") {
    forAllSeeded(segmentedGen, n = 100) { case ((corpus, terms, k, cap, bs), segs) =>
      val probe = buildCursors(corpus, terms, cap, bs)._1
      if (segs.nonEmpty && probe.nonEmpty) {
        def fresh() = buildCursors(corpus, terms, cap, bs)._1
        val minMatch = 1 + (terms.size + k) % probe.size // deterministic pick
        val expected = segs.flatMap { case (lo, hi) =>
          Wand.shouldTopKSegments(fresh(), minMatch, k, Vector((lo, hi)))
        }.sortBy(h => (-h.score, h.docId)).take(k)
        val got = Wand.shouldTopKSegments(fresh(), minMatch, k, segs)
        assert(got == expected,
          s"terms=$terms minMatch=$minMatch k=$k segs=$segs")
      }
    }
  }

  test("property: OR/WAND with prohibited == brute force minus prohibited docs (r8)") {
    forAllSeeded(caseGen, n = 120) { case (corpus, terms, k, cap, bs) =>
      val negTerm = s"t${(k + terms.size) % 12}"
      val (cursors, _, _) = buildCursors(corpus, terms, cap, bs)
      val neg = buildCursors(corpus, Seq(negTerm), cap, bs)._1
      val expected = brute(corpus, terms, "OR", Int.MaxValue)
        .filterNot(h => corpus(h.docId).contains(negTerm))
        .take(k)
      val got = Wand.orTopKSegments(cursors, k,
        Vector((0L, Long.MaxValue)), prohibited = neg)
      assert(got == expected, s"terms=$terms neg=$negTerm k=$k cap=$cap bs=$bs")
    }
  }

  test("property: SHOULD minMatch=1 + prohibited == OR + prohibited (dispatch law, r8)") {
    forAllSeeded(caseGen, n = 120) { case (corpus, terms, k, cap, bs) =>
      val negTerm = s"t${(k + 1 + terms.size) % 12}"
      def fresh() = buildCursors(corpus, terms, cap, bs)._1
      def freshNeg() = buildCursors(corpus, Seq(negTerm), cap, bs)._1
      if (fresh().nonEmpty) {
        val viaShould = Wand.shouldTopKSegments(fresh(), 1, k,
          Vector((0L, Long.MaxValue)), prohibited = freshNeg())
        val viaOr = Wand.orTopKSegments(fresh(), k,
          Vector((0L, Long.MaxValue)), prohibited = freshNeg())
        assert(viaShould == viaOr, s"terms=$terms neg=$negTerm k=$k")
      }
    }
  }

  private val segmentedGen = for {
    base <- caseGen
    nSegs <- Gen.chooseNum(1, 4)
    // ascending disjoint segments carved from the docId space
    cuts <- Gen.listOfN(nSegs * 2, Gen.chooseNum(0L, 40L)).map(_.sorted)
  } yield (base, cuts.grouped(2).collect { case List(a, b) if a <= b => (a, b) }
    // keep segments disjoint: shift each start past the previous end
    .foldLeft(Vector.empty[(Long, Long)]) { case (acc, (a, b)) =>
      val lo = acc.lastOption.map(_._2 + 1).map(math.max(_, a)).getOrElse(a)
      if (lo <= b) acc :+ (lo, b) else acc
    })

  test("property: segmented AND/OR in one pass == union of per-segment calls") {
    forAllSeeded(segmentedGen, n = 120) { case ((corpus, terms, k, cap, bs), segs) =>
      if (segs.nonEmpty) {
        def fresh() = buildCursors(corpus, terms, cap, bs)._1
        Seq("AND", "OR").foreach { mode =>
          // expected: independent per-segment calls on FRESH cursors,
          // unioned, re-topped — the semantics the one-pass version claims
          val expected = segs.flatMap { case (lo, hi) =>
            val cs = fresh()
            if (mode == "AND") {
              if (cs.size < terms.size) Vector.empty
              else Wand.andTopK(cs, k, lo, hi)
            } else Wand.orTopK(cs, k, lo, hi)
          }.sortBy(h => (-h.score, h.docId)).take(k)
          val cs = fresh()
          val got =
            if (mode == "AND") {
              if (cs.size < terms.size) Vector.empty
              else Wand.andTopKSegments(cs, k, segs)
            } else Wand.orTopKSegments(cs, k, segs)
          assert(got == expected,
            s"mode=$mode terms=$terms k=$k cap=$cap bs=$bs segs=$segs")
        }
      }
    }
  }
}
