package graft.dedup

import scala.util.hashing.MurmurHash3

/** Shared deterministic text hashing used by the dedup family.
  *
  * All functions are pure and seed-fixed so every executor computes
  * identical signatures — a hard requirement for hash-partitioned dedup.
  */
object TextHashing {

  def tokenize(text: String): Array[String] =
    if (text == null) Array.empty
    else text.toLowerCase.split("\\W+").filter(_.nonEmpty)

  /** Word k-shingles hashed to Long (murmur128-ish via two murmur32 mixes). */
  def shingleHashes(text: String, k: Int): Array[Long] = {
    val toks = tokenize(text)
    if (toks.length < k) {
      if (toks.isEmpty) Array.empty
      else Array(hash64(toks.mkString(" ")))
    } else {
      val out = new Array[Long](toks.length - k + 1)
      var i = 0
      while (i + k <= toks.length) {
        out(i) = hash64(toks.slice(i, i + k).mkString(" "))
        i += 1
      }
      out.distinct
    }
  }

  def hash64(s: String): Long = {
    val h1 = MurmurHash3.stringHash(s, 0x1b873593)
    val h2 = MurmurHash3.stringHash(s, 0x9747b28c)
    (h1.toLong << 32) | (h2.toLong & 0xffffffffL)
  }

  private val MersennePrime = (1L << 61) - 1

  // permutation coefficients are seed-deterministic; cache per (perms, seed)
  // so the per-row hot path skips Random construction.
  private val coeffCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), (Array[Long], Array[Long])]()

  private def coeffs(numPerms: Int, seed: Int): (Array[Long], Array[Long]) =
    coeffCache.computeIfAbsent((numPerms, seed), { case (n, s) =>
      val rnd = new scala.util.Random(s)
      (Array.fill(n)(1 + rnd.nextLong(MersennePrime - 1)), Array.fill(n)(rnd.nextLong(MersennePrime)))
    })

  /** MinHash signature: numPerms universal-hash permutations (a*h+b mod p),
    * one pass over the shingle set (O(shingles * numPerms)).
    */
  def minHashSignature(shingles: Array[Long], numPerms: Int, seed: Int = 42): Array[Long] = {
    val (as, bs) = coeffs(numPerms, seed)
    val sig = Array.fill(numPerms)(Long.MaxValue)
    var i = 0
    while (i < shingles.length) {
      val h = java.lang.Long.remainderUnsigned(shingles(i), MersennePrime)
      var p = 0
      while (p < numPerms) {
        // (a*h + b) mod p via unsigned 128-free trick: Math.multiplyHigh not
        // needed at this precision for dedup quality; mix then mask.
        val v = java.lang.Long.remainderUnsigned(as(p) * h + bs(p), MersennePrime)
        if (v < sig(p)) sig(p) = v
        p += 1
      }
      i += 1
    }
    sig
  }

  /** Band hashes over a minhash signature: numBands bands of rowsPerBand. */
  def bandHashes(sig: Array[Long], numBands: Int, rowsPerBand: Int): Array[Long] = {
    val out = new Array[Long](numBands)
    var b = 0
    while (b < numBands) {
      var acc = 0xcbf29ce484222325L // FNV offset
      var r = 0
      while (r < rowsPerBand) {
        acc = (acc ^ sig(b * rowsPerBand + r)) * 0x100000001b3L
        r += 1
      }
      out(b) = acc
      b += 1
    }
    out
  }

  /** Exact Jaccard over two shingle-hash sets. */
  def jaccard(a: Array[Long], b: Array[Long]): Double = {
    if (a.isEmpty && b.isEmpty) return 1.0
    if (a.isEmpty || b.isEmpty) return 0.0
    val sa = a.toSet
    val inter = b.count(sa.contains)
    val union = sa.size + b.distinct.length - inter
    inter.toDouble / union
  }

  /** 64-bit SimHash over unigram token hashes (uniform weight). */
  def simHash64(text: String): Long = {
    val counts = new Array[Int](64)
    val toks = tokenize(text)
    var i = 0
    while (i < toks.length) {
      val h = hash64(toks(i))
      var bit = 0
      while (bit < 64) {
        if (((h >>> bit) & 1L) == 1L) counts(bit) += 1 else counts(bit) -= 1
        bit += 1
      }
      i += 1
    }
    var sig = 0L
    var bit = 0
    while (bit < 64) {
      if (counts(bit) > 0) sig |= (1L << bit)
      bit += 1
    }
    sig
  }

  /** Word n-grams as strings (for the inverted-index Jaccard join). */
  def ngrams(text: String, n: Int): Array[String] = {
    val toks = tokenize(text)
    if (toks.length < n) { if (toks.isEmpty) Array.empty else Array(toks.mkString(" ")) }
    else (0 to toks.length - n).map(i => toks.slice(i, i + n).mkString(" ")).toArray.distinct
  }
}
