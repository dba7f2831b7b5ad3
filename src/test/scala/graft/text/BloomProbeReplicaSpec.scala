package graft.text

import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.util.sketch.BloomFilter
import org.scalatest.funsuite.AnyFunSuite

/** Proves the DuckDB oracle's replication of Spark's bloom-filter probe
  * arithmetic is exact at the BIT level, not just "same rows at this
  * scale". The oracle (SparkEntry `q_decontaminate_bloom`) recomputes
  * Murmur3_x86_32.hashLong and the h1 + i*h2 probe schedule in SQL over
  * unsigned 64-bit arithmetic mod 2^32; this spec runs the identical
  * arithmetic in Scala and pins it against (a) the JVM's own Murmur3
  * implementation, (b) golden values recomputed by two independent
  * out-of-JVM implementations (Python and DuckDB SQL), and (c) a
  * deliberately tiny, collision-saturated BloomFilter where
  * mightContainLong must agree probe-for-probe INCLUDING false
  * positives — FP-level agreement is only possible if bit positions,
  * hash count, and bit-array size all match exactly.
  */
class BloomProbeReplicaSpec extends AnyFunSuite {

  // --- the replica: identical arithmetic to the oracle SQL's CTE chain ---
  private val M32 = 0xFFFFFFFFL
  private def rotl32(x: Long, r: Int): Long = ((x << r) | (x >>> (32 - r))) & M32
  private def mixK1(k0: Long): Long = {
    var k = (k0 * 0xcc9e2d51L) & M32
    k = rotl32(k, 15)
    (k * 0x1b873593L) & M32
  }
  private def mixH1(h0: Long, k: Long): Long = {
    var h = h0 ^ k
    h = rotl32(h, 13)
    (h * 5L + 0xe6546b64L) & M32
  }
  private def fmix(h0: Long): Long = {
    var h = h0 ^ 8L // length byte count for a long
    h ^= h >>> 16
    h = (h * 0x85ebca6bL) & M32
    h ^= h >>> 13
    h = (h * 0xc2b2ae35L) & M32
    h ^ (h >>> 16)
  }
  /** Murmur3_x86_32.hashLong as unsigned-mod-2^32 arithmetic. */
  def hashLongU(input: Long, seedU: Long): Long = {
    val low = input & M32
    val high = (input >>> 32) & M32
    var h = mixH1(seedU & M32, mixK1(low))
    h = mixH1(h, mixK1(high))
    fmix(h)
  }
  /** The probe schedule of BloomFilterImplV2 (what `BloomFilter.create`
    * returns in Spark 4.x, per the V2 scatter bytecode): h1/h2 as SIGNED
    * 32-bit ints, `c_i = h1 * Integer.MAX_VALUE + i * h2` accumulated in
    * 64-bit signed arithmetic, `~c` when negative, mod the word-padded
    * bit size.
    */
  def probePositions(item: Long, k: Int, bitSize: Long): Seq[Long] = {
    val h1u = hashLongU(item, 0L)
    val h2u = hashLongU(item, h1u)
    def signed(u: Long): Long = if (u >= 0x80000000L) u - 0x100000000L else u
    val h1 = signed(h1u); val h2 = signed(h2u)
    (1 to k).map { i =>
      val c = h1 * 2147483647L + i * h2
      val x = if (c < 0) ~c else c
      x % bitSize
    }
  }
  /** Spark's sizing formulas (BloomFilterImpl.optimalNumOfHashFunctions +
    * BitArray word padding), replicated for the oracle's inlined literals.
    */
  def numHashFunctions(numItems: Long, numBits: Long): Int =
    math.max(1, math.round(numBits.toDouble / numItems * math.log(2)).toInt)
  def paddedBitSize(numBits: Long): Long = ((numBits + 63) / 64) * 64

  test("replica hashLong matches the JVM Murmur3_x86_32 on goldens and fuzz") {
    // goldens independently recomputed in Python (and by the DuckDB CTE
    // chain during oracle prototyping) — pins all three implementations
    val goldens = Seq(
      (0L, 1669671676L, 3415317804L),
      (1L, 1392991556L, 3101538909L),
      (-1L, 1651860712L, 3498305762L),
      (42L, 1871679806L, 3762749315L),
      (123456789012345L, 3825968124L, 247577926L),
      (-987654321098765L, 565533781L, 3416499933L),
      (Long.MaxValue, 2188461247L, 3082626002L),
      (Long.MinValue, 1366273829L, 3294140310L))
    goldens.foreach { case (x, h1, h2) =>
      assert(hashLongU(x, 0L) == h1, s"h1($x)")
      assert(hashLongU(x, h1) == h2, s"h2($x)")
    }
    val rnd = new scala.util.Random(7)
    (0 until 10000).foreach { _ =>
      val x = rnd.nextLong()
      val seed = rnd.nextInt()
      val jvm = Murmur3_x86_32.hashLong(x, seed) & M32
      assert(hashLongU(x, seed.toLong & M32) == jvm, s"fuzz x=$x seed=$seed")
    }
  }

  test("replica probes agree with BloomFilter.mightContainLong including false positives") {
    // tiny filter: 40 items in 256 bits → dense enough that FP probes are
    // common, so any off-by-anything in k, bitSize, or positions shows up
    val numItems = 40L
    val numBits = 250L // deliberately NOT word-aligned: exercises padding
    val filter = BloomFilter.create(numItems, numBits)
    val k = numHashFunctions(numItems, numBits)
    val bitSize = paddedBitSize(numBits)
    assert(filter.bitSize() == bitSize, "BitArray word padding")

    val rnd = new scala.util.Random(11)
    val planted = Array.fill(40)(rnd.nextLong())
    planted.foreach(filter.putLong)
    val bits = scala.collection.mutable.Set[Long]()
    planted.foreach(x => bits ++= probePositions(x, k, bitSize))

    var fps = 0
    (0 until 5000).foreach { _ =>
      val probe = rnd.nextLong()
      val replica = probePositions(probe, k, bitSize).forall(bits.contains)
      assert(filter.mightContainLong(probe) == replica, s"probe=$probe")
      if (replica && !planted.contains(probe)) fps += 1
    }
    planted.foreach(x => assert(filter.mightContainLong(x) && probePositions(x, k, bitSize).forall(bits.contains)))
    assert(fps > 10, s"saturation check: expected plentiful FPs to make the agreement test meaningful, got $fps")
  }

  test("replica matches the production-sized filter the bloom oracle inlines") {
    // the exact parameters q_decontaminate_bloom uses at driver scale
    val expectedGrams = 100000L
    val fpp = 1e-9
    val bits = math.ceil(-expectedGrams * math.log(fpp) / (math.log(2) * math.log(2))).toLong
    val filter = BloomFilter.create(expectedGrams, bits)
    val k = numHashFunctions(expectedGrams, bits)
    val bitSize = paddedBitSize(bits)
    assert(filter.bitSize() == bitSize)
    val rnd = new scala.util.Random(13)
    val planted = Array.fill(2000)(rnd.nextLong())
    planted.foreach(filter.putLong)
    val bits2 = scala.collection.mutable.Set[Long]()
    planted.foreach(x => bits2 ++= probePositions(x, k, bitSize))
    (0 until 2000).foreach { _ =>
      val probe = rnd.nextLong()
      assert(filter.mightContainLong(probe) ==
        probePositions(probe, k, bitSize).forall(bits2.contains))
    }
  }
}
