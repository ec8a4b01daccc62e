package graft.functions

import org.scalacheck.{Gen, Prop, Properties}

import graft.functions.expressions.AhoCorasick

/** ScalaCheck properties for the Aho–Corasick kernel — the matcher
  * every blocklist/canary decision rides on. The reference semantics
  * are Java's own `contains`/index scan; the automaton must agree on
  * ARBITRARY inputs (including multi-byte UTF-8 and patterns that are
  * substrings, prefixes, or borders of each other — exactly where
  * hand-rolled matchers break). */
object MultiMatchProps extends Properties("AhoCorasick") {

  // small alphabets force dense pattern collisions/overlaps; the
  // multi-byte alphabet exercises UTF-8 continuation bytes in the trie
  private val alphabets = Seq("ab", "abc", "ab é日")

  private val caseGen: Gen[(Seq[String], String)] = for {
    alpha <- Gen.oneOf(alphabets)
    nPats <- Gen.choose(1, 8)
    pats <- Gen.listOfN(nPats,
      Gen.choose(1, 5).flatMap(n =>
        Gen.listOfN(n, Gen.oneOf(alpha.toSeq)).map(_.mkString)))
    text <- Gen.choose(0, 60).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(alpha.toSeq)).map(_.mkString))
  } yield (pats.distinct, text)

  private def naiveSet(text: String, pats: Seq[String]): Seq[Int] =
    pats.zipWithIndex.collect { case (p, i) if text.contains(p) => i }

  private def naiveCount(text: String, p: String): Int = {
    var (n, from) = (0, 0)
    var idx = text.indexOf(p, from)
    while (idx >= 0) { n += 1; idx = text.indexOf(p, idx + 1) }
    n
  }

  property("matchSet == contains() on arbitrary text/patterns") =
    Prop.forAll(caseGen) { case (pats, text) =>
      val ac = new AhoCorasick(pats.toArray)
      ac.matchSet(text.getBytes("UTF-8")).toSeq == naiveSet(text, pats)
    }

  property("countAll == all-positions indexOf count (overlaps included)") =
    Prop.forAll(caseGen) { case (pats, text) =>
      val ac = new AhoCorasick(pats.toArray)
      val counts = ac.countAll(text.getBytes("UTF-8"))
      pats.indices.forall(i => counts(i) == naiveCount(text, pats(i)))
    }

  property("matchSet is exactly the nonzero positions of countAll") =
    Prop.forAll(caseGen) { case (pats, text) =>
      val ac = new AhoCorasick(pats.toArray)
      val bytes = text.getBytes("UTF-8")
      ac.matchSet(bytes).toSeq ==
        ac.countAll(bytes).zipWithIndex.collect { case (c, i) if c > 0 => i }.toSeq
    }

  property("concatenation never loses matches: counts(a+b) >= counts(a)+counts(b)") =
    Prop.forAll(caseGen, Gen.oneOf(alphabets).flatMap(a =>
        Gen.choose(0, 30).flatMap(n => Gen.listOfN(n, Gen.oneOf(a.toSeq)).map(_.mkString)))) {
      case ((pats, text), tail) =>
        val ac = new AhoCorasick(pats.toArray)
        val whole = ac.countAll((text + tail).getBytes("UTF-8"))
        val parts = ac.countAll(text.getBytes("UTF-8"))
          .zip(ac.countAll(tail.getBytes("UTF-8"))).map { case (x, y) => x + y }
        pats.indices.forall(i => whole(i) >= parts(i))
    }
}
