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
}
