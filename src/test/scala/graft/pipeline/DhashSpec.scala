package graft.pipeline

import graft.SparkSpec
import graft.sources.Png
import org.apache.spark.sql.functions._

/** dHash image near-dup (r18 verdict item 5): gradient hash + banded
  * hamming join. The fixtures are PERTURBED COPIES pushed through the
  * REAL encode → decode → hash path, so the spec pins the property
  * mm_ahash lacks (a mildly perturbed copy stays within the radius
  * and is FOUND) and the losslessness of the banded candidate scheme
  * (join output ≡ brute force at hamming ≤ DhashMaxDist). */
class DhashSpec extends SparkSpec {

  private def sigRow(id: Long, px: Array[Int]): (Long, Int, Int, Int, Int) = {
    // real codec round trip, exactly like the operator
    val decoded = Png.decode(Png.encodeGray(Multimodal.DhW, Multimodal.DhH,
      px.map(_.toByte), stored = true)).pixels.map(_ & 0xff)
    assert(decoded.toSeq === px.toSeq)
    val b = Multimodal.dhashBands(decoded)
    (id, b(0), b(1), b(2), b(3))
  }

  // deterministic base image + perturbations with known gradient impact
  private val base: Array[Int] =
    Array.tabulate(64)(i => (i * 37 + 11) % 251)

  test("perturbed copies are found; far images are not; join equals brute force") {
    import spark.implicits._
    // id 1: base. id 2: one pixel nudged by +1 where it does not flip
    // any ordering (neighbors differ by >2) → hamming 0 (re-encoded
    // near-identical copy). id 3: one pixel forced above its row
    // neighbors → flips at most its two adjacent gradient bits
    // (hamming ≤ 2). id 4: unrelated content (every gradient
    // reversed) → far.
    val p2 = base.clone(); p2(10) = p2(10) + 1
    val p3 = base.clone(); p3(20) = 250
    val p4 = Array.tabulate(64)(i => ((63 - i) * 53 + 7) % 251)
    val sigs = Seq(sigRow(1L, base), sigRow(2L, p2), sigRow(3L, p3),
      sigRow(4L, p4)).toDF("doc_id", "b0", "b1", "b2", "b3")
    val pairs = Multimodal.dhashPairsOf(spark, sigs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val found = pairs.map(p => (p._1, p._2)).toSet
    assert(found.contains((1L, 2L)), s"re-encoded copy missed: $pairs")
    assert(found.contains((1L, 3L)), s"perturbed copy missed: $pairs")
    assert(!found.exists(p => p._1 == 4L || p._2 == 4L),
      s"unrelated image matched: $pairs")
    // each pair exactly once (the first-intact-band canonicalization)
    assert(pairs.length === found.size)

    // losslessness on a wider fixture set: every brute-force pair at
    // hamming ≤ DhashMaxDist is produced by the banded join, with the
    // same distance
    val many = (0 until 40).map { v =>
      val px = base.clone()
      // graded perturbations: v pixels nudged hard
      (0 until v % 7).foreach(j => px((j * 11 + v) % 64) = 255 - j * 30)
      sigRow(100L + v, px)
    }
    val manyDf = many.toDF("doc_id", "b0", "b1", "b2", "b3")
    val joined = Multimodal.dhashPairsOf(spark, manyDf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val brute = (for {
      a <- many; b <- many if a._1 < b._1
      ham = Integer.bitCount(a._2 ^ b._2) + Integer.bitCount(a._3 ^ b._3) +
        Integer.bitCount(a._4 ^ b._4) + Integer.bitCount(a._5 ^ b._5)
      if ham <= Multimodal.DhashMaxDist
    } yield (a._1, b._1, ham.toLong)).toSet
    assert(brute.nonEmpty)
    assert(joined === brute)
  }

  test("brightness shift: dhash stable where ahash flips wholesale") {
    // +40 on every pixel (head-roomed base, so nothing saturates and
    // every gradient ordering is preserved) → dhash identical; the
    // ahash mean comparison flips many bits under the same shift
    val dim = Array.tabulate(64)(i => (i * 37 + 11) % 200)
    val shifted = dim.map(_ + 40)
    val a = sigRow(10L, dim)
    val b = sigRow(11L, shifted)
    assert((a._2, a._3, a._4, a._5) === ((b._2, b._3, b._4, b._5)))
  }
}
