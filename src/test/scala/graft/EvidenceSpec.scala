package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** Evidence-artifact integrity (VERDICT r14 #2).
  *
  * Rounds 13 and 14 both shipped PLANS prose citing a SCALE artifact
  * section that was never written (r13: all of SCALE_r13.json; r14:
  * `sf10_full_contract` / `streaming_sf10` / `bench_warmup_validation`),
  * so the round's strongest measured claims existed only as dangling
  * pointers. This spec makes that failure structural: every
  * `SCALE_r<N>.json` file mentioned in any `PLANS_*.md` must exist, and
  * every backticked section reference — "SCALE_r14.json `lsh_slice_factor`"
  * (dotted paths allowed) — must resolve to a key in that JSON. A PLANS
  * file that promises an artifact section now fails the suite until the
  * section is committed.
  */
class EvidenceSpec extends AnyFunSuite {

  private def read(p: java.nio.file.Path): String =
    new String(Files.readAllBytes(p), "UTF-8")

  // Files.list returns a stream holding a directory handle — close it
  // (ADVICE r15) rather than leaking one per suite run.
  private def ls(dir: String, pattern: String): Seq[java.nio.file.Path] =
    scala.util.Using.resource(Files.list(Paths.get(dir))) { s =>
      s.iterator().asScala
        .filter(_.getFileName.toString.matches(pattern)).toSeq.sortBy(_.toString)
    }

  private val plansFiles = ls(".", "PLANS_r\\d+\\.md")

  // "SCALE_r14.json `section`" with any whitespace (incl. a line break)
  // between the file name and the backticked section; dotted paths OK.
  private val sectionRef = """SCALE_r(\d+)\.json\s+`([A-Za-z0-9_.]+)`""".r
  private val fileRef = """SCALE_r(\d+)\.json""".r

  private def topLevelKeys(json: String): Set[String] = {
    // The SCALE artifacts are plain JSON objects; resolve keys with the
    // json4s shipped inside Spark (no extra dependency).
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    JsonMethods.parse(json) match {
      case JObject(fields) => fields.map(_._1).toSet
      case _ => Set.empty
    }
  }

  private def resolves(json: String, path: String): Boolean = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    path.split('.').foldLeft(Option(JsonMethods.parse(json): JValue)) {
      case (Some(JObject(fields)), key) => fields.collectFirst { case (`key`, v) => v }
      case _ => None
    }.isDefined
  }

  test("PLANS files exist for this project") {
    assert(plansFiles.nonEmpty, "no PLANS_r*.md found — spec running from the wrong cwd?")
  }

  test("every SCALE artifact a PLANS file mentions exists on disk") {
    val missing = for {
      pf <- plansFiles
      m <- fileRef.findAllMatchIn(read(pf))
      scale = s"SCALE_r${m.group(1)}.json"
      if !Files.exists(Paths.get(scale))
    } yield s"${pf.getFileName} -> $scale"
    assert(missing.isEmpty,
      s"PLANS references to SCALE artifacts that do not exist: ${missing.distinct.mkString(", ")}")
  }

  test("every backticked SCALE section reference in PLANS resolves") {
    val dangling = for {
      pf <- plansFiles
      m <- sectionRef.findAllMatchIn(read(pf))
      scale = Paths.get(s"SCALE_r${m.group(1)}.json")
      section = m.group(2)
      if !Files.exists(scale) || !resolves(read(scale), section)
    } yield s"${pf.getFileName} -> ${scale.getFileName} `$section`"
    assert(dangling.isEmpty,
      s"PLANS prose cites SCALE sections that were never written: ${dangling.distinct.mkString(", ")}")
  }

  test("every logs/ path cited in PLANS exists") {
    val logRef = """logs/[A-Za-z0-9_.\-]+\.[a-z]+""".r
    val missing = for {
      pf <- plansFiles
      m <- logRef.findAllMatchIn(read(pf))
      if !Files.exists(Paths.get(m.matched))
    } yield s"${pf.getFileName} -> ${m.matched}"
    assert(missing.isEmpty,
      s"PLANS cites log files that do not exist: ${missing.distinct.mkString(", ")}")
  }

  test("every SCALE/BENCH artifact SURVEY.md mentions exists on disk") {
    val artifactRef = """(?:SCALE|BENCH|BENCH_local)_r\d+\.json""".r
    val survey = Paths.get("SURVEY.md")
    val missing =
      if (!Files.exists(survey)) Seq.empty
      else artifactRef.findAllMatchIn(read(survey)).map(_.matched).toSeq.distinct
        .filterNot(f => Files.exists(Paths.get(f)))
    assert(missing.isEmpty,
      s"SURVEY.md mentions artifacts that do not exist: ${missing.mkString(", ")}")
  }

  test("SCALE artifacts parse as JSON objects with at least one section") {
    val bad = ls(".", "SCALE_r\\d+\\.json")
      .filter(p => scala.util.Try(topLevelKeys(read(p))).toOption.forall(_.isEmpty))
      .map(_.getFileName.toString)
    assert(bad.isEmpty, s"unparseable/empty SCALE artifacts: ${bad.mkString(", ")}")
  }

  // ---- value integrity (VERDICT r15 #3) ----------------------------------
  // Pointer integrity (above) can't catch PROSE NUMBERS drifting from the
  // artifact they cite — the exact failure §5 of PLANS_r14 had (it forecast
  // the sf10 exclusion list instead of reporting the measured one). For
  // every section reference whose target JSON carries the contract-sweep
  // counters (queries_ok / mismatches), any "<N> OK / <M> mismatch(es)"
  // claim in the surrounding prose must equal the artifact's counters.

  private val claimRe = """(\d+)\s+OK\s*/\s*(\d+)\s+mismatch(?:es)?""".r

  private def intField(json: String, path: String, field: String): Option[BigInt] = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    (path.split('.').foldLeft(Option(JsonMethods.parse(json): JValue)) {
      case (Some(JObject(fields)), key) => fields.collectFirst { case (`key`, v) => v }
      case _ => None
    }) match {
      case Some(JObject(fields)) =>
        fields.collectFirst { case (`field`, JInt(n)) => n }
      case _ => None
    }
  }

  /** Violations of the OK/mismatch claim contract in `plansText`, resolving
    * cited artifacts through `scaleJson` (file name -> content). Each claim
    * is bound to its NEAREST section reference within 600 chars — not to
    * every reference whose window happens to cover it — so two references
    * sitting close together cannot cross-check each other's claims.
    * Factored out so a seeded-drift fixture can prove the detector fires.
    */
  private def claimViolations(plansText: String,
      scaleJson: String => Option[String]): Seq[String] = {
    val refs = sectionRef.findAllMatchIn(plansText).toSeq
    for {
      c <- claimRe.findAllMatchIn(plansText).toSeq
      m <- refs.minByOption(r =>
        math.min(math.abs(r.start - c.end), math.abs(c.start - r.end))).toSeq
      if math.min(math.abs(m.start - c.end), math.abs(c.start - m.end)) <= 600
      json <- scaleJson(s"SCALE_r${m.group(1)}.json").toSeq
      section = m.group(2)
      okWant <- intField(json, section, "queries_ok").toSeq
      misWant = intField(json, section, "mismatches").getOrElse(BigInt(-1))
      if BigInt(c.group(1)) != okWant ||
        (misWant >= 0 && BigInt(c.group(2)) != misWant)
    } yield s"claim '${c.matched}' nearest to SCALE_r${m.group(1)}.json `$section` " +
      s"contradicts the artifact (queries_ok=$okWant, mismatches=$misWant)"
  }

  test("OK/mismatch claims in PLANS prose match the cited artifact's counters") {
    val cache = scala.collection.mutable.Map.empty[String, Option[String]]
    def lookup(f: String): Option[String] = cache.getOrElseUpdate(f, {
      val p = Paths.get(f)
      if (Files.exists(p)) Some(read(p)) else None
    })
    val bad = plansFiles.flatMap(pf =>
      claimViolations(read(pf), lookup).map(v => s"${pf.getFileName}: $v"))
    assert(bad.isEmpty,
      s"PLANS prose numbers drifted from their cited artifacts:\n  ${bad.mkString("\n  ")}")
  }

  test("the claim detector fires on a seeded prose/artifact drift") {
    val artifact = """{"sweep": {"queries_ok": 140, "mismatches": 0}}"""
    val good = "Measured: SCALE_r99.json `sweep` — 140 OK / 0 mismatches."
    val drifted = "Measured: SCALE_r99.json `sweep` — 141 OK / 0 mismatches."
    def lookup(f: String) = if (f == "SCALE_r99.json") Some(artifact) else None
    assert(claimViolations(good, lookup).isEmpty, "false positive on a correct claim")
    assert(claimViolations(drifted, lookup).nonEmpty, "seeded drift not detected")
  }

  test("each claim binds to its NEAREST section ref, not every ref in range") {
    // two refs within 600 chars of each other: each claim must be checked
    // only against the closer one, so correct prose stays green
    val artifact = """{"full": {"queries_ok": 146, "mismatches": 0},
                      |"subset": {"queries_ok": 6, "mismatches": 0}}""".stripMargin
    def lookup(f: String) = if (f == "SCALE_r99.json") Some(artifact) else None
    val prose = "SCALE_r99.json `full` — 146 OK / 0 mismatches. Separately, " +
      "SCALE_r99.json `subset` re-measured 6 OK / 0 mismatches."
    assert(claimViolations(prose, lookup).isEmpty,
      "cross-attribution false positive between adjacent section refs")
    val drifted = "SCALE_r99.json `full` — 146 OK / 0 mismatches. Separately, " +
      "SCALE_r99.json `subset` re-measured 7 OK / 0 mismatches."
    assert(claimViolations(drifted, lookup).nonEmpty,
      "nearest-bound drift not detected")
  }

  // ---- committed dump manifests stay anchored to the query set (r17) ----
  //
  // SF*_MANIFEST_r*.json fingerprints Verify dumps per QUERY NAME
  // (tools/dump_equiv.py --manifest-check). Renaming or removing a
  // SparkEntry query would strand its manifest entry: the re-anchor
  // check would report it "in-manifest-not-dumped" only when someone
  // actually runs it, possibly rounds later. Pin it here instead: every
  // name in every committed manifest must still be a SparkEntry query.
  // (The converse is intentionally NOT pinned — later rounds add queries
  // older manifests legitimately don't know.)
  private def manifestNames(p: java.nio.file.Path): Seq[String] = {
    // names are the top-level keys: "q_x": { ... } at nesting depth 1
    val json = read(p)
    val key = """"(q[A-Za-z0-9_]*)"\s*:\s*\{""".r
    var depth = 0
    val out = scala.collection.mutable.ListBuffer[String]()
    var i = 0
    while (i < json.length) {
      json.charAt(i) match {
        case '{' => depth += 1
        case '}' => depth -= 1
        case '"' if depth == 1 =>
          key.findPrefixMatchOf(json.subSequence(i, json.length))
            .foreach(m => out += m.group(1))
        case _ =>
      }
      i += 1
    }
    out.toSeq
  }

  test("every query name in a committed dump manifest is a SparkEntry query") {
    val manifests = ls(".", "SF\\d+_MANIFEST_r\\d+\\.json")
    assert(manifests.nonEmpty, "no committed dump manifests found")
    val queries = SparkEntry.queries.keySet
    val stranded = manifests.flatMap { m =>
      val names = manifestNames(m)
      assert(names.size >= 100,
        s"$m: manifest name parse looks stale (only ${names.size} names)")
      names.filterNot(queries).map(n => s"${m.getFileName}: $n")
    }
    assert(stranded.isEmpty,
      s"manifest entries stranded by a query rename/removal: ${stranded.mkString(", ")}")
  }

  test("the stranded-manifest detector fires on a seeded unknown name") {
    val tmp = Files.createTempDirectory("manifest_fixture")
    val f = tmp.resolve("SF1_MANIFEST_r99.json")
    val entries = ("q_zzz_renamed_away" +: SparkEntry.queries.keys.take(120).toSeq)
      .map(n => s""""$n": {"rows": 1}""").mkString("{", ",\n", "}")
    Files.write(f, entries.getBytes("UTF-8"))
    val names = manifestNames(f)
    val stranded = names.filterNot(SparkEntry.queries.keySet)
    assert(stranded == Seq("q_zzz_renamed_away"),
      s"seeded stranded name not (exactly) detected: $stranded")
  }
}
