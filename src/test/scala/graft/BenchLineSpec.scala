package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the bench-line contract (SURVEY §5.16): the driver parses ONE
  * JSON line from a 2000-char output tail, so the alias map must stay
  * total, collision-free, and short enough that the full line fits with
  * headroom even when every value prints at worst-case width.
  */
class BenchLineSpec extends AnyFunSuite {

  test("alias map is total over SparkEntry.queries") {
    val missing = SparkEntry.queries.keySet -- Bench.alias.keySet
    assert(missing.isEmpty, s"queries without a bench alias: $missing")
  }

  test("alias map has no dangling keys") {
    val dangling = Bench.alias.keySet -- SparkEntry.queries.keySet
    assert(dangling.isEmpty, s"aliases for queries that no longer exist: $dangling")
  }

  test("aliases are unique") {
    val dupes = Bench.alias.values.groupBy(identity).filter(_._2.size > 1).keys
    assert(dupes.isEmpty, s"colliding aliases: $dupes")
  }

  test("r1 baseline keys are live queries and total the adopted baseline") {
    // the shared-gate fields are only meaningful if every r1 key still
    // names a registered query (a rename would silently shrink the
    // shared set) and the embedded numbers still sum to BASELINE.md's
    // adopted 36.7 s / 57-query figure
    val dead = Bench.r1Baseline.keySet -- SparkEntry.queries.keySet
    assert(dead.isEmpty, s"r1 baseline keys no longer registered: $dead")
    assert(Bench.r1Baseline.size === 57)
    assert(math.abs(Bench.r1Baseline.values.sum - 36.75) < 0.1)
  }

  test("per-query print floor: a query that ran never prints as 0") {
    // r19 verdict item 2: emb_quantize timed 0.04 s, printed "0", and
    // the driver's differ scored it dropped_from_bench. A query that
    // RAN floors at 0.1 s; the failed-both-passes marker -1 is intact.
    assert(Bench.shownSec(0.0) === 0.1)
    assert(Bench.shownSec(0.04) === 0.1)
    assert(Bench.shownSec(0.1) === 0.1)
    assert(Bench.shownSec(0.3) === 0.3)
    assert(Bench.shownSec(12.0) === 12.0)
    assert(Bench.shownSec(-1.0) === -1.0)
  }

  test("worst-case line stays under budget with >=15 queries of headroom") {
    // worst case per entry: "alias":123 — Bench.fmt prints at most 3
    // value chars below 1000 s (>=10 s drops decimals → "999"; <10 s
    // prints d.d). A single 4-digit-second query would mean a dead box
    // (the whole driver round budget is minutes), not a parse problem —
    // and even the all-queries-4-digit pathology only overflows this
    // ESTIMATE, the real line still fits the 2000-char tail.
    val entries = SparkEntry.queries.keySet.toSeq.map { k =>
      Bench.alias(k).length + 2 /*quotes*/ + 1 /*colon*/ + 3 /*value*/
    }
    // preamble+sf suffix ~70, plus the failure fields at full width
    // (,"failed":131,"pf":131 — 22 chars) and the r1-shared gate
    // fields (,"sharedR1":123.45,"r1x":12.34 — 31 chars, r19)
    val line = 123 + entries.sum + entries.size /*commas*/
    // r12 verdict item 6: the NEXT rounds must be able to add queries
    // without re-litigating the alias map — reserve 15 entries at a
    // 7-char alias (worst entry style: "x_yyyyy":123, = 14 chars)
    val headroom = 15 * 14
    assert(line + headroom < 1900,
      s"worst-case bench line $line chars + $headroom reserve >= 1900 — shorten aliases")
  }
}
