package graft.dedup

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property-based checks of the dedup primitives. */
object TextHashingProps extends Properties("TextHashing") {

  private val word = Gen.oneOf("spark", "join", "data", "scan", "sort", "merge",
    "batch", "stream", "row", "key", "hash", "filter")
  private val doc = Gen.chooseNum(4, 40).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))

  property("jaccard is within [0,1] and symmetric") = forAll(doc, doc) { (a, b) =>
    val (sa, sb) = (TextHashing.shingleHashes(a, 3), TextHashing.shingleHashes(b, 3))
    val j1 = TextHashing.jaccard(sa, sb)
    val j2 = TextHashing.jaccard(sb, sa)
    j1 >= 0.0 && j1 <= 1.0 && j1 == j2
  }

  property("jaccard of a doc with itself is 1") = forAll(doc) { a =>
    val s = TextHashing.shingleHashes(a, 3)
    TextHashing.jaccard(s, s) == 1.0
  }

  property("minhash signature agreement estimates jaccard within 0.35") =
    forAll(doc, doc) { (a, b) =>
      val (sa, sb) = (TextHashing.shingleHashes(a, 3), TextHashing.shingleHashes(b, 3))
      val jac = TextHashing.jaccard(sa, sb)
      val (ma, mb) = (TextHashing.minHashSignature(sa, 128), TextHashing.minHashSignature(sb, 128))
      val est = ma.zip(mb).count { case (x, y) => x == y }.toDouble / 128
      // 128 perms: estimator stddev <= ~0.045; 0.35 is a very safe bound
      // that still catches a broken permutation family.
      math.abs(est - jac) < 0.35
    }

  property("identical docs have identical signatures and simhashes") = forAll(doc) { a =>
    TextHashing.minHashSignature(TextHashing.shingleHashes(a, 3), 64).toSeq ==
      TextHashing.minHashSignature(TextHashing.shingleHashes(a, 3), 64).toSeq &&
      TextHashing.simHash64(a) == TextHashing.simHash64(a)
  }

  property("simhash of disjoint-vocab docs differs") = forAll(Gen.chooseNum(1, 20)) { n =>
    val a = List.fill(n)("alpha bravo charlie").mkString(" ")
    val b = List.fill(n)("delta echo foxtrot").mkString(" ")
    TextHashing.simHash64(a) != TextHashing.simHash64(b)
  }

  property("ngrams produces |tokens|-n+1 distinct-capped grams") = forAll(doc) { a =>
    val toks = TextHashing.tokenize(a)
    val grams = TextHashing.ngrams(a, 3)
    grams.length <= math.max(1, toks.length - 2) && grams.distinct.length == grams.length
  }
}
