package graft

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** Repo hygiene guards that don't need a SparkSession. */
class HygieneSpec extends AnyFunSuite {

  private def scalaFiles(root: String): Seq[Path] = {
    val p = Paths.get(root)
    if (!Files.exists(p)) Seq.empty
    else Files.walk(p).iterator().asScala
      .filter(f => f.toString.endsWith(".scala"))
      .toSeq
  }

  // built by concatenation so this spec's own source doesn't match it
  private val needle = "def " + "main("

  test("test sources contain no scratch main entry points") {
    val offenders = scalaFiles("src/test/scala").filter { f =>
      val src = new String(Files.readAllBytes(f), "UTF-8")
      src.contains(needle)
    }
    assert(offenders.isEmpty,
      s"scratch main() found in test sources: ${offenders.mkString(", ")}")
  }

  test("main sources keep entry points to the declared driver contract") {
    // The driver contract allows mains only in Bench / Verify / ScaleBench /
    // PlanDump-style evidence tools at the graft package root.
    val allowed = Set("Bench.scala", "Verify.scala", "ScaleBench.scala", "Explain.scala",
      "TimeCheck.scala", "Sf1Gen.scala", "Sf1Bench.scala", "BucketPoint.scala",
      "SlicePoint.scala", "AnnBytesPoint.scala")
    val offenders = scalaFiles("src/main/scala").filter { f =>
      val src = new String(Files.readAllBytes(f), "UTF-8")
      src.contains(needle) && !allowed.contains(f.getFileName.toString)
    }
    assert(offenders.isEmpty,
      s"unexpected main() in library sources: ${offenders.mkString(", ")}")
  }

  test("eager driver actions in library packages stay on the SURVEY §4 allowlist") {
    // SURVEY §4: transform/query ops are pure plan-builders; the eager
    // exceptions (model/index builders, sinks/sources machinery, and the
    // bounded adaptive-stats reads in Dedup) are ENUMERATED. This pins the
    // exact per-file count of eager-action call sites in the library
    // packages (the root-level evidence mains and hosts are excluded via
    // the package dirs), so a new eager site — or another one in Dedup —
    // fails the suite and must be reviewed against the invariant.
    //
    // Needles cover the action spellings this codebase uses on
    // DataFrames/RDDs: .head(), .collect(), .count(), .show(. A grep
    // confirms zero groupBy(...).count() textual false positives (grouped
    // counts here are agg(count(lit(1)))). `.take(`/`.first()` are NOT
    // pinned: every current occurrence is on Scala collections/strings,
    // where the needle would drown the signal in false positives.
    val pkgs = Seq("api", "dedup", "formats", "functions", "multimodal",
      "operators", "plans", "similarity", "sinks", "sources", "streaming", "text")
    val eager = Seq(".head()", ".collect()", ".count()", ".show(")
    val counts = pkgs.flatMap(p => scalaFiles(s"src/main/scala/graft/$p"))
      .map { f =>
        val src = new String(Files.readAllBytes(f), "UTF-8")
        f.getFileName.toString -> eager.map(n => src.sliding(n.length).count(_ == n)).sum
      }.filter(_._2 > 0).toMap
    val allowed = Map(
      // ngramJaccardPairs: vstats .head() + nDocs path-pick .count();
      // embeddingNearDupPairs: stats .head(); incrementalFromStore:
      // touched .count() broadcast decision; connectedComponents:
      // symRaw RDD .count() partitioner sizing
      "Dedup.scala" -> 5,
      "Profile.scala" -> 2,     // summary aggregates (profiling IS an action)
      "AnnStore.scala" -> 4,    // bounded centroid/codebook/probed-cell loads
      "IvfIndex.scala" -> 3,    // k-means sample + corpus-count for frac (cap-bounded)
      "PqIndex.scala" -> 6,     // k-means + codebook samples + counts (cap-bounded)
      "Bpe.scala" -> 2,         // vocab-merge learning loop (driver-side by design)
      "Pipeline.scala" -> 2,    // in-memory sink materialization (a sink action)
      "Sinks.scala" -> 2,       // assert-sink report row + console-sink show
      "ExcelFormat.scala" -> 1, // xlsx writer's per-partition write force (a sink action)
      "CdcCapture.scala" -> 1)  // localCheckpoint force inside the capture bracket
    assert(counts == allowed,
      s"eager-action sites drifted from the SURVEY §4 allowlist:\n" +
        s"  found:   ${counts.toSeq.sortBy(_._1)}\n" +
        s"  allowed: ${allowed.toSeq.sortBy(_._1)}\n" +
        "If the new site is intentional, document it in SURVEY §4's exception " +
        "list and the operator's scaladoc, then update this allowlist.")
  }
}
