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

  test("worst-case line length stays under the 1900-char budget") {
    // worst case per entry: "alias":123.4 — a stalled query prints at
    // most 5 value chars (>=10 s drops decimals; 3-digit seconds would
    // mean a dead box, not a parse problem)
    val entries = SparkEntry.queries.keySet.toSeq.map { k =>
      Bench.alias(k).length + 2 /*quotes*/ + 1 /*colon*/ + 5 /*value*/
    }
    val line = 70 /*preamble+sf suffix*/ + entries.sum + entries.size /*commas*/
    assert(line < 1900, s"estimated worst-case bench line $line chars — shorten aliases")
  }
}
