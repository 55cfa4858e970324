package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver parses Bench's single JSON line out of the LAST ~2 KB of
  * output; the per-query keys must stay short AND unique or the line
  * either truncates (too long) or silently falls back to full names
  * (collision) — both historically broke the round's BENCH parse.
  */
class BenchKeySpec extends AnyFunSuite {

  private val names = SparkEntry.queries.keys.toSeq.sorted

  test("short keys are unique across the declared query suite") {
    val short = Bench.shortKeys(names)
    val dups = short.groupBy(identity).collect { case (k, vs) if vs.size > 1 => k }
    assert(dups.isEmpty, s"colliding short keys: ${dups.mkString(", ")}")
  }

  test("the projected bench line fits the driver's tail window") {
    // budget re-measured r16 from the r15 BENCH tail: the window is
    // EXACTLY 2000 chars and sbt's "[success] Total time: …" trailer
    // (~75 bytes) lands inside it after the line — so the line itself
    // must stay under ~1925. Bench.fmt renders every healthy value in
    // ≤3 chars (0dp from 10 s, 1dp to 0.1 s, 2dp below); the projection
    // uses 3-char values plus a 40-byte allowance for a handful of
    // 4-char outliers (sub-0.1 s gates like q74, or a 10+ s stall — a
    // run where MANY values exceed 10 s is already garbage and its
    // truncation loses nothing). Wrapper: metric/value/unit ~45 + empty
    // errors 12 + sf 14 ≈ 71, plus the r20 drift field (≤14). The r21
    // dg/dd tier fields and stall_windows are NOT reserved: both render
    // only on a partially-inflated/stalled run, where the artifact is
    // already degraded and the diagnosis is worth the marginal tail risk.
    val line = Bench.shortKeys(names).map(k => "\"" + k + "\":9.9")
      .mkString("{", ",", "}").length + 71 + 40 + 14
    assert(line < 1925, s"projected bench line $line bytes — shrink keys " +
      "or compress values further")
  }

  test("recorded per-query levels bind to live short keys only") {
    // a stale key (query renamed/removed) would silently disable that
    // query's drift retry — fail loudly instead
    val live = Bench.shortKeys(names).toSet
    val stale = Bench.recordedSec.keySet -- live
    assert(stale.isEmpty, s"recordedSec keys with no live query: ${stale.mkString(", ")}")
  }

  test("stall_windows renders compact, capped, and absent when empty") {
    assert(Bench.stallField(Nil) == "")
    assert(Bench.stallField(Seq("q15")) == ""","stall_windows":["q15"]""")
    val eight = (1 to 8).map(i => s"q$i")
    val r = Bench.stallField(eight)
    assert(r.contains("\"q6\"") && !r.contains("\"q7\"") && r.contains("\"+2\""),
      r)
    // worst-case field stays small enough for the driver's tail window
    assert(r.length <= 60, s"${r.length}: $r")
  }

  test("drift_ratio renders compact and absent without recorded pairs") {
    assert(Bench.driftField(Nil) == "")
    // a healthy box: measured ≈ recorded
    assert(Bench.driftField(Seq((1.0, 1.0), (0.5, 0.5))) ==
      ""","drift":1""")
    // the r19 profile: ~1.4× uniform inflation, named in the artifact
    assert(Bench.driftField(Seq((1.4, 1.0), (7.0, 5.0))) ==
      ""","drift":1.4""")
    // worst plausible render stays inside the 14-byte budget the line
    // projection reserves
    assert(Bench.driftField(Seq((99.99, 1.0))).length <= 14)
  }

  test("per-tier drift fields render only on partial inflation, compact") {
    // uniform box (healthy or uniformly hot): absent — no information
    // beyond `drift`, and no bytes spent
    assert(Bench.tierDriftFields(Seq((1.0, 1.0)), Seq((1.1, 1.0))) == "")
    assert(Bench.tierDriftFields(Seq((1.4, 1.0)), Seq((1.4, 1.0))) == "")
    // partial inflation: the gate tier ran 1.4×, data tier healthy —
    // both tiers named so the inflation localizes
    assert(Bench.tierDriftFields(Seq((1.4, 1.0)), Seq((1.0, 1.0))) ==
      ""","dg":1.4,"dd":1""")
    // one empty tier can't split anything
    assert(Bench.tierDriftFields(Nil, Seq((1.4, 1.0))) == "")
    // worst plausible render stays small
    assert(Bench.tierDriftFields(
      Seq((99.99, 1.0)), Seq((1.0, 1.0))).length <= 22)
    // the tier split must actually split: both sides populated, and every
    // gate name is a declared query (a module refactor that empties one
    // side would silently turn a tier field into the suite scalar)
    val gates = Bench.gateTierNames
    assert(gates.nonEmpty && gates.subsetOf(names.toSet))
    assert((names.toSet -- gates).nonEmpty)
  }

  test("per-query retry fires on drift the global threshold misses") {
    // r9's actual failure mode: q27 recorded 0.45 s, drifted to 2.50 s —
    // under the 3 s global threshold, >2x its healthy level
    assert(Bench.shouldRetry(2.50, Some(0.45), retrySec = 3.0))
    // r10's failure mode: q108 recorded 0.78 s (since reprobed to 0.53),
    // drifted to 1.77 s — under the global threshold AND under the old 3x
    // trigger (2.34 s); the 2x trigger (1.56 s) catches it
    assert(Bench.shouldRetry(1.77, Some(0.78), retrySec = 3.0))
    // healthy run: no retry
    assert(!Bench.shouldRetry(0.50, Some(0.45), retrySec = 3.0))
    // a run just under 2x its level stays (1.5 s on a 0.78 s level)
    assert(!Bench.shouldRetry(1.50, Some(0.78), retrySec = 3.0))
    // sub-100 ms jitter is floored, not retried (0.04 s query at 0.15 s)
    assert(!Bench.shouldRetry(0.15, Some(0.04), retrySec = 3.0))
    // errors and global-threshold crossings always retry
    assert(Bench.shouldRetry(-1.0, None, retrySec = 3.0))
    assert(Bench.shouldRetry(3.2, None, retrySec = 3.0))
    // no recorded level: only the global threshold governs
    assert(!Bench.shouldRetry(2.9, None, retrySec = 3.0))
  }
}
