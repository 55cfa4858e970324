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
    // worst-case value rendering is 4 chars ("99.9" — Bench.fmt scales
    // precision with magnitude); headroom of ~300 bytes below 2000 covers
    // sbt's [success] trailer and the wrapper keys
    val line = Bench.shortKeys(names).map(k => "\"" + k + "\":99.9")
      .mkString("{", ",", "}").length + 120 // metric/value/unit/sf wrapper
    assert(line < 1700, s"projected bench line $line bytes — shrink keys")
  }
}
