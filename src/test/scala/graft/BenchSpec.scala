package graft

import org.scalatest.funsuite.AnyFunSuite

/** Bench measurement-protocol invariants (no SparkSession needed).
  *
  * The instability flag's contract (VERDICT r17 #2): the 5-rep adaptive
  * extension exists to dodge a JIT-cold FIRST rep, so the post-extension
  * spread test must not re-count that rep — one cold rep + four stable
  * reps has a stable median and is NOT unstable, while reps that stay
  * noisy after the cold one is dropped ARE.
  */
class BenchSpec extends AnyFunSuite {
  private def ok(ts: Double*): Seq[(Double, Option[String])] =
    ts.map(t => (t, None: Option[String]))

  test("one JIT-cold first rep + four stable reps is NOT flagged") {
    // r15's q_cdc_debezium shape: cold 1.80, then settled ~1.2
    assert(!Bench.unstableAfterExtension(ok(1.80, 1.21, 1.24, 1.19, 1.22)))
  }

  test("genuinely noisy reps stay flagged after the first is excluded") {
    assert(Bench.unstableAfterExtension(ok(1.80, 1.20, 2.10, 1.15, 1.95)))
  }

  test("a cold rep that is NOT first still flags (not a JIT artifact)") {
    // the exclusion is chronological, not max-trimming: a late outlier is
    // real mid-run noise and must keep the flag
    assert(Bench.unstableAfterExtension(ok(1.20, 1.21, 1.80, 1.19, 1.22)))
  }

  test("fewer than three successes: all reps count (no population to trim)") {
    assert(Bench.unstableAfterExtension(ok(1.0, 2.0)))
    assert(!Bench.unstableAfterExtension(ok(1.0, 1.1)))
  }

  test("errored reps are ignored; chronology is over successes only") {
    // first SUCCESSFUL rep is the cold one even when an error precedes it
    val runs = (0.1, Some("boom"): Option[String]) +: ok(1.80, 1.20, 1.21, 1.19)
    assert(!Bench.unstableAfterExtension(runs))
  }

  test("stable reps are not flagged; empty/all-errored never flags") {
    assert(!Bench.unstableAfterExtension(ok(1.0, 1.05, 1.1)))
    assert(!Bench.unstableAfterExtension(Nil))
    assert(!Bench.unstableAfterExtension(Seq((1.0, Some("e")))))
  }

  // ---- deep extension (VERDICT r18 #6): 8+ successful reps switch the
  // verdict and the reported median to the steady-state window (last 5) ----

  test("deep-extended JIT-descent row whose tail settled is NOT flagged") {
    // r18's q_ann_lsh shape extended: monotone descent, settled tail
    assert(Bench.unstableAfterExtension(ok(0.78, 0.62, 0.55, 0.50, 0.46)))
    assert(!Bench.unstableAfterExtension(
      ok(0.78, 0.62, 0.55, 0.50, 0.46, 0.44, 0.43, 0.43)))
  }

  test("deep-extended row still noisy in its tail stays flagged") {
    assert(Bench.unstableAfterExtension(
      ok(1.80, 1.20, 2.10, 1.15, 1.95, 1.30, 2.00, 1.20)))
  }

  test("reportedMedian: steady-state window for deep-extended rows only") {
    // < 8 successes: all-successful-reps median (byte-compatible with
    // prior rounds' artifacts)
    assert(Bench.reportedMedian(ok(1.0, 3.0, 2.0)) == 2.0)
    assert(Bench.reportedMedian(ok(1.80, 1.21, 1.24, 1.19, 1.22)) == 1.22)
    // 8 successes: median of the LAST 5 reps — the descent reps the deep
    // extension ran past must not drag the median up
    assert(Bench.reportedMedian(
      ok(0.78, 0.62, 0.55, 0.50, 0.46, 0.44, 0.43, 0.43)) == 0.44)
    // errored reps don't count toward the 8-success threshold
    val sevenOkOneErr = (9.9, Some("boom"): Option[String]) +:
      ok(0.78, 0.62, 0.55, 0.50, 0.46, 0.44, 0.43)
    assert(Bench.reportedMedian(sevenOkOneErr) == 0.50)
  }
}
