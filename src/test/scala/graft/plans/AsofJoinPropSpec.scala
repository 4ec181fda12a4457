package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Randomized-differential harness for the custom as-of exec: on
  * random inputs the operator must agree with a direct in-memory
  * reference (per key: latest right row at-or-before / strictly-before
  * the left time, later tiebreak id winning ties). Small key/time
  * domains force collisions, ties, keys with no matches, and
  * multi-partition merges; the seed is fixed so failures reproduce. */
class AsofJoinPropSpec extends SparkSpec {

  private def reference(left: List[(Long, Long, Long)],
      right: List[(Long, Long, Long)], strict: Boolean): Map[Long, Option[Long]] =
    left.map { case (id, k, t) =>
      val matches = right.filter { case (_, rk, rt) =>
        rk == k && (if (strict) rt < t else rt <= t)
      }
      // sort order (time, id): the LAST row ≤ the bound wins, so ties
      // on time resolve to the larger id — same as the exec's
      // (rightTime, tiebreak) requiredChildOrdering
      id -> matches.sortBy { case (rid, _, rt) => (rt, rid) }.lastOption.map(_._1)
    }.toMap

  test("asof exec agrees with the in-memory reference on random inputs") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(1234)
    (1 to 25).foreach { round =>
      val strict = rnd.nextBoolean()
      val nl = 1 + rnd.nextInt(40)
      val nr = rnd.nextInt(40)
      val left = (0 until nl).toList.map(i =>
        (i.toLong, rnd.nextInt(6).toLong, rnd.nextInt(21).toLong))
      val right = (0 until nr).toList.map(i =>
        (1000L + i, rnd.nextInt(6).toLong, rnd.nextInt(21).toLong))
      val expected = reference(left, right, strict)
      val ldf = left.toDF("id", "k", "t")
      val rdf = right.toDF("rid", "rk", "rt")
      val got = AsofJoin.asof(ldf, rdf, "k", "rk", "t", "rt",
          rightTieBreak = Seq("rid"), strict = strict)
        .select(col("id"), col("rid")).collect()
        .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long]))
        .toMap
      assert(got == expected,
        s"round $round strict=$strict\nleft=$left\nright=$right\n" +
          s"got $got\nexpected $expected")
    }
  }
}
