package graft.operators

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property tests for the pure (no-session) kernels. */
object PureProps extends Properties("PureKernels") {

  property("fractionToHex is monotone and 8 lowercase hex chars") =
    forAll(Gen.choose(0.0, 1.0), Gen.choose(0.0, 1.0)) { (a, b) =>
      val (ha, hb) = (Sampling.fractionToHex(a), Sampling.fractionToHex(b))
      ha.length == 8 && ha.matches("[0-9a-f]{8}") &&
        ((a <= b) == (ha <= hb) || ha == hb)
    }

  property("byte-level BPE: pre-tokens partition the text; tokens decode to the input") =
    forAll { (s0: String, mergeSeed: Long) =>
      // canonical valid-unicode form (unpaired surrogates are lossy
      // through ANY UTF-8 encoder; byte-level BPE is lossless on bytes)
      val s = new String(s0.getBytes("UTF-8"), "UTF-8")
      val pts = graft.text.BpeByteTable.preTokenize(s)
      val base = pts.flatMap(graft.text.BpeByteTable.toByteSymbols)
      val rnd = new scala.util.Random(mergeSeed)
      val merges = (0 until math.min(5, math.max(0, base.length - 1)))
        .map { _ =>
          val i = rnd.nextInt(base.length - 1)
          s"${base(i)} ${base(i + 1)}"
        }
      val table = new graft.text.BpeByteTable(merges)
      val toks = pts.flatMap(table.encodePreToken)
      val arr = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        toks.map(org.apache.spark.unsafe.types.UTF8String.fromString).toArray[Any])
      pts.mkString == s &&
        graft.text.BpeByteTable.fromByteSymbols(arr).toString == s
    }

  private val dimGen = Gen.choose(1, 12)

  property("resizeNearest integer upscale then downscale is the identity") =
    forAll(dimGen, dimGen, Gen.choose(2, 4), Gen.choose(0, 255)) { (w, h, k, seed) =>
      val img = graft.multimodal.BinaryOps.rawRgbFrame(w, h, seed)
      val up = graft.multimodal.BinaryOps.resizeNearest(img, w, h, w * k, h * k)
      val down = graft.multimodal.BinaryOps.resizeNearest(up, w * k, h * k, w, h)
      up.length == w * k * h * k * 3 && down.toSeq == img.toSeq
    }

  property("localKMeans returns k centroids covering the sample's range") =
    forAll(Gen.choose(4, 40), Gen.choose(1, 4), Gen.long) { (n, k, seed) =>
      val rnd = new scala.util.Random(seed)
      val pts = Array.fill(n)(Array.fill(3)(rnd.nextDouble() * 10))
      val cs = graft.similarity.IvfIndex.localKMeans(pts, k, maxIter = 5, seed = seed)
      cs.length == math.min(k, n) && cs.forall(c => c.forall(x => x >= -1e-9 && x <= 10 + 1e-9))
    }
}
