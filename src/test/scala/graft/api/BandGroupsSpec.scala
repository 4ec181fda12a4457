package graft.api

import graft.SparkSpec

/** Replicates the reference's chunked-read planner vectors
  * (tests/test_stores.py:test_split_indices — width=5, height=5,
  * bands 1..60 at varying max_size) against Api.bandRangeGroups.
  */
class BandGroupsSpec extends SparkSpec {

  private val br = (1, 60)

  test("band range groups match the reference split_indices vectors") {
    def groups(maxSize: Long) = Api.bandRangeGroups(5, 5, br, maxSize)
    assert(groups(34) == (0 until 60).map(i => i + 1 until i + 2))
    assert(groups(57) == (0 until 30).map(i => 2 * i + 1 until 2 * i + 3))
    assert(groups(76) == (0 until 20).map(i => 3 * i + 1 until 3 * i + 4))
    assert(groups(100) == (0 until 15).map(i => 4 * i + 1 until 4 * i + 5))
    assert(groups(129) == (0 until 12).map(i => 5 * i + 1 until 5 * i + 6))
    assert(groups(163) == (0 until 10).map(i => 6 * i + 1 until 6 * i + 7))
    assert(groups(255) == (0 until 6).map(i => 10 * i + 1 until 10 * i + 11))
    assert(groups(923) == Seq(1 until 37, 37 until 61))
  }

  test("groups cover the range exactly once, in order") {
    for (maxSize <- Seq(34L, 57L, 100L, 923L, 10000L)) {
      val flat = Api.bandRangeGroups(5, 5, br, maxSize).flatten
      assert(flat == (br._1 to br._2).toList)
    }
  }

  test("a single band larger than the budget raises too-large") {
    intercept[Api.SelectedAreaTooLargeError] {
      Api.bandRangeGroups(100, 100, (1, 5), maxSize = 9999L)
    }
  }
}
