package graft.dedup

/** Shared deterministic text hashing used by the dedup family.
  *
  * All functions are pure and seed-fixed so every executor computes
  * identical signatures — a hard requirement for hash-partitioned dedup.
  */
object TextHashing {

  def tokenize(text: String): Array[String] =
    if (text == null) Array.empty
    else text.toLowerCase.split("\\W+").filter(_.nonEmpty)

  /** Word k-shingles hashed to Long via [[hash64]].
    * Returned SORTED and distinct — a set in canonical array form, so
    * [[jaccard]] runs as a zero-allocation merge count.
    */
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
      // sort + in-place unique (no boxing, unlike Array.distinct's HashSet)
      java.util.Arrays.sort(out)
      var w = 0
      i = 1
      while (i < out.length) {
        if (out(i) != out(w)) { w += 1; out(w) = out(i) }
        i += 1
      }
      java.util.Arrays.copyOf(out, w + 1)
    }
  }

  /** 64-bit string hash: polynomial base-257 over code points (mod 2^64)
    * finished with the murmur3 fmix64 avalanche — the same construction
    * as [[simTokenHash64]]. Every step is plain 64-bit modular
    * arithmetic + xor/shift, so an independent engine (the DuckDB
    * oracle) can recompute identical values in SQL; the previous
    * MurmurHash3-based form was JVM-only, which forced the minhash
    * driver query to a weaker rows-only check.
    */
  def hash64(s: String): Long = simTokenHash64(s)

  /** murmur3's fmix64 finalizer: a bijective 64-bit avalanche. */
  def fmix64(x0: Long): Long = {
    var x = x0
    x ^= (x >>> 33); x *= 0xff51afd7ed558ccdL
    x ^= (x >>> 33); x *= 0xc4ceb9fe1a85ec53L
    x ^= (x >>> 33)
    x
  }

  /** MinHash signature: per permutation p the value is
    * `fmix64(h ^ k_p)` with `k_p = fmix64((seed << 32) + p)` and the
    * per-doc minimum taken in UNSIGNED order; the empty shingle set
    * yields the unsigned max (-1L) in every slot. fmix64 is a bijection
    * on 64 bits, so each slot is a proper minwise permutation of the
    * shingle space (xor-then-avalanche, the standard splittable-hash
    * construction); closed-form keys replace the former
    * `scala.util.Random` coefficient table so every value is exactly
    * recomputable outside the JVM. One pass over the shingle set
    * (O(shingles * numPerms)).
    */
  def minHashSignature(shingles: Array[Long], numPerms: Int, seed: Int = 42): Array[Long] = {
    val keys = new Array[Long](numPerms)
    var p = 0
    while (p < numPerms) { keys(p) = fmix64((seed.toLong << 32) + p); p += 1 }
    val sig = Array.fill(numPerms)(-1L) // unsigned max
    var i = 0
    while (i < shingles.length) {
      val h = shingles(i)
      p = 0
      while (p < numPerms) {
        val v = fmix64(h ^ keys(p))
        if (java.lang.Long.compareUnsigned(v, sig(p)) < 0) sig(p) = v
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

  /** Exact Jaccard over two shingle-hash sets in canonical (sorted,
    * distinct) array form — [[shingleHashes]] output. A two-pointer merge
    * count: zero allocation on the per-candidate-pair dedup hot path
    * (the previous Set-based form boxed every hash). Unsorted inputs are
    * detected in the same pass and handled via sorted copies.
    */
  def jaccard(a: Array[Long], b: Array[Long]): Double = {
    if (a.isEmpty && b.isEmpty) return 1.0
    if (a.isEmpty || b.isEmpty) return 0.0
    if (!isSortedDistinct(a) || !isSortedDistinct(b))
      return jaccard(canonical(a), canonical(b))
    var i = 0; var j = 0; var inter = 0
    while (i < a.length && j < b.length) {
      if (a(i) == b(j)) { inter += 1; i += 1; j += 1 }
      else if (a(i) < b(j)) i += 1
      else j += 1
    }
    inter.toDouble / (a.length + b.length - inter)
  }

  private def isSortedDistinct(a: Array[Long]): Boolean = {
    var i = 1
    while (i < a.length) { if (a(i) <= a(i - 1)) return false; i += 1 }
    true
  }

  private def canonical(a: Array[Long]): Array[Long] = {
    val s = a.clone()
    java.util.Arrays.sort(s)
    var w = 0; var i = 1
    while (i < s.length) { if (s(i) != s(w)) { w += 1; s(w) = s(i) }; i += 1 }
    java.util.Arrays.copyOf(s, w + 1)
  }

  /** 64-bit SimHash over unigram token hashes (uniform weight). */
  /** Per-token hash for [[simHash64]]: polynomial base-257 over code
    * points (mod 2^64) finished with the murmur3 fmix64 avalanche. Chosen
    * over [[hash64]] because every step is plain 64-bit modular
    * arithmetic + xor/shift — an independent engine (the DuckDB oracle)
    * can recompute it exactly in SQL, while the fmix64 finalizer keeps
    * the per-bit uniformity simhash voting needs.
    */
  def simTokenHash64(s: String): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = h * 257L + cp
      i += Character.charCount(cp)
    }
    fmix64(h)
  }

  def simHash64(text: String): Long = {
    val counts = new Array[Int](64)
    val toks = tokenize(text)
    var i = 0
    while (i < toks.length) {
      val h = simTokenHash64(toks(i))
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
