package graft

import java.nio.file.{Files, Path}

import org.scalatest.funsuite.AnyFunSuite

/** The bench artifact's atomic-write contract (round-10 verdict #2): a
  * killed run must never leave the destination holding a partial line —
  * round 10's timed-out driver pass clobbered the committed full-catalog
  * BENCHFULL.json with a main-only fragment. Bench.writeAtomic stages to
  * a `.tmp` sibling and renames, so the destination only ever holds a
  * COMPLETE write. The JVM-kill scenario is simulated at its exact
  * failure point: content staged in `.tmp` but the process dying before
  * the rename — the destination must be untouched.
  */
class BenchArtifactSpec extends AnyFunSuite {

  private def tmpDir(): Path = Files.createTempDirectory("bench-artifact")

  test("writeAtomic creates the destination with the full content") {
    val dest = tmpDir().resolve("BENCHFULL.json")
    Bench.writeAtomic(dest.toString, "{\"value\":1}\n")
    assert(Files.readString(dest) === "{\"value\":1}\n")
    assert(!Files.exists(dest.resolveSibling("BENCHFULL.json.tmp")),
      "staging file must not survive a successful write")
  }

  test("writeAtomic replaces an existing artifact wholesale") {
    val dest = tmpDir().resolve("BENCHFULL.json")
    Files.writeString(dest, "{\"value\":\"old-complete-line\"}\n")
    Bench.writeAtomic(dest.toString, "{\"value\":2}\n")
    assert(Files.readString(dest) === "{\"value\":2}\n")
  }

  test("a run killed between stage and rename leaves the destination untouched") {
    val dir = tmpDir()
    val dest = dir.resolve("BENCHFULL.json")
    val committed = "{\"value\":\"committed-full-catalog-line\"}\n"
    Files.writeString(dest, committed)
    // the kill point: the new line is fully staged in the .tmp sibling
    // (everything writeAtomic does before its rename), then the process
    // dies — no rename ever happens
    Files.writeString(dir.resolve("BENCHFULL.json.tmp"),
      "{\"value\":\"partial")
    assert(Files.readString(dest) === committed,
      "a staged-but-unrenamed write must not alter the committed artifact")
    // and a subsequent successful run replaces both cleanly
    Bench.writeAtomic(dest.toString, "{\"value\":3}\n")
    assert(Files.readString(dest) === "{\"value\":3}\n")
  }

  // Destination routing (round-12 clobber): the committed zero-skip
  // BENCHFULL.json was twice overwritten by a budget-squeezed run whose
  // optional passes were skipped. Only a zero-skip full run may claim
  // the repo-default path; a skip-bearing run diverts to the PARTIAL
  // sibling; a narrow run writes nowhere; an explicit out always wins.
  test("artifactDest routes complete, partial, narrow, and explicit runs") {
    assert(Bench.artifactDest(None, narrow = false, skippedN = 0)
      === Some("/root/repo/BENCHFULL.json"))
    assert(Bench.artifactDest(None, narrow = false, skippedN = 28)
      === Some("/root/repo/BENCHFULL_PARTIAL.json"))
    assert(Bench.artifactDest(None, narrow = true, skippedN = 0) === None)
    assert(Bench.artifactDest(None, narrow = true, skippedN = 3) === None)
    assert(Bench.artifactDest(Some("/tmp/x.json"), narrow = true, skippedN = 9)
      === Some("/tmp/x.json"),
      "an explicit SPARK_GRAFT_BENCH_OUT overrides both guards")
    // a COMPLETE run at a toy SF must not shadow the committed sf0.1
    // record — it gets an sf-suffixed sibling instead
    assert(Bench.artifactDest(None, narrow = false, skippedN = 0, sf = "0.001")
      === Some("/root/repo/BENCHFULL_sf0.001.json"))
    // ... and so must a PARTIAL at a toy SF (round-13 advisory: the
    // un-suffixed partial path let a toy-SF squeeze overwrite an sf0.1
    // partial record — the same shadowing, one artifact over)
    assert(Bench.artifactDest(None, narrow = false, skippedN = 2, sf = "0.001")
      === Some("/root/repo/BENCHFULL_PARTIAL_sf0.001.json"),
      "skip-bearing toy-SF runs get an sf-suffixed PARTIAL sibling")
  }

  test("artifactNotice announces sf-suffixed partials and names the real path") {
    assert(Bench.artifactNotice(None, 0).exists(_.contains("narrow run")))
    // the un-suffixed partial still announces itself, naming its path
    val p = Bench.artifactNotice(Some("/root/repo/BENCHFULL_PARTIAL.json"), 3)
    assert(p.exists(m => m.contains("3 passes skipped")
      && m.contains("/root/repo/BENCHFULL_PARTIAL.json")))
    // round-14 advisory: an SF-SUFFIXED partial used to be written
    // silently while the hardcoded message text named the wrong file —
    // it must announce itself too, with the actual destination
    val ps = Bench.artifactNotice(
      Some("/root/repo/BENCHFULL_PARTIAL_sf0.001.json"), 2)
    assert(ps.exists(_.contains("/root/repo/BENCHFULL_PARTIAL_sf0.001.json")))
    // zero-skip complete records and zero-skip explicit destinations
    // stay quiet
    assert(Bench.artifactNotice(Some("/root/repo/BENCHFULL.json"), 0).isEmpty)
    assert(Bench.artifactNotice(Some("/tmp/custom.json"), 0).isEmpty)
  }

  // Round-15 advisory: the notice used to key on the destination's NAME,
  // so an explicit SPARK_GRAFT_BENCH_OUT aimed at the complete-record
  // path silently took a skip-bearing line, and an explicit path that
  // merely contained "BENCHFULL_PARTIAL" claimed "complete record
  // preserved" with zero skips. The notice now keys on the skip count.
  test("artifactNotice keys on the skip count, not the destination name") {
    // a skip-bearing write to ANY explicit destination announces itself
    val c = Bench.artifactNotice(Some("/tmp/custom.json"), 5)
    assert(c.exists(m => m.contains("5 passes skipped")
      && m.contains("/tmp/custom.json")))
    // ... and over a complete-record path it additionally warns
    val w = Bench.artifactNotice(Some("/root/repo/BENCHFULL.json"), 2)
    assert(w.exists(m => m.contains("2 passes skipped")
      && m.contains("WARNING")))
    // a zero-skip write never uses the "passes skipped" wording, even
    // when the explicit destination contains the partial marker
    val z = Bench.artifactNotice(Some("/tmp/BENCHFULL_PARTIAL_copy.json"), 0)
    assert(z.exists(m => !m.contains("passes skipped")
      && m.contains("/tmp/BENCHFULL_PARTIAL_copy.json")))
    assert(z.exists(_.contains("zero-skip")))
  }

  // Round-15 verdict #6: under the driver's budget the headline pass ran
  // at full fidelity and scaled-full — 238 queries of 5× evidence — was
  // skipped whole. The lookahead drops headline runs (never below 1)
  // exactly when that rescues scaled-full's admission.
  test("lookaheadScaleRuns drops runs only when that rescues scaled-full") {
    // linear cost model: 100 s replica + 300 s per run
    val est = (r: Int) => 100.0 + 300.0 * r
    // plenty of budget: keep the requested fidelity
    assert(Bench.lookaheadScaleRuns(2, 2000.0, est, 600.0) === 2)
    // r15 driver shape: 2 runs + floor overshoot, 1 run + floor fits
    assert(Bench.lookaheadScaleRuns(2, 1200.0, est, 600.0) === 1)
    // even 1 run can't fit both: keep fidelity, let the gate skip full
    assert(Bench.lookaheadScaleRuns(2, 700.0, est, 600.0) === 2)
    // no scaled-full configured: nothing to protect
    assert(Bench.lookaheadScaleRuns(2, 100.0, est, 0.0) === 2)
    // degrades to the LARGEST run count that fits, not straight to 1
    assert(Bench.lookaheadScaleRuns(3, 1600.0, est, 600.0) === 3)
    assert(Bench.lookaheadScaleRuns(3, 1550.0, est, 600.0) === 2)
  }

  // A lookahead-degraded run is zero-skip but NOT full-fidelity: letting
  // it claim BENCHFULL.json would hand the committed quiet record to the
  // first load-contaminated driver run whose budget squeezed the
  // headline pass (the r12 clobber family, zero-skip edition).
  test("a degraded zero-skip run routes to the PARTIAL sibling and announces itself") {
    assert(Bench.artifactDest(None, narrow = false, skippedN = 0,
      degraded = true) === Some("/root/repo/BENCHFULL_PARTIAL.json"))
    assert(Bench.artifactDest(None, narrow = false, skippedN = 0,
      sf = "0.001", degraded = true)
      === Some("/root/repo/BENCHFULL_PARTIAL_sf0.001.json"))
    // undegraded routing unchanged
    assert(Bench.artifactDest(None, narrow = false, skippedN = 0,
      degraded = false) === Some("/root/repo/BENCHFULL.json"))
    val n = Bench.artifactNotice(Some("/root/repo/BENCHFULL_PARTIAL.json"),
      0, degraded = true)
    assert(n.exists(m => m.contains("degraded")
      && m.contains("/root/repo/BENCHFULL_PARTIAL.json")
      && !m.contains("passes skipped")))
    // skip-bearing wording still wins when both apply
    val both = Bench.artifactNotice(Some("/root/repo/BENCHFULL_PARTIAL.json"),
      2, degraded = true)
    assert(both.exists(_.contains("2 passes skipped")))
  }
}
