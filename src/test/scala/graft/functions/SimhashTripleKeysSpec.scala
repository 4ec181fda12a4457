package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** The triple-key kernel must stay bit-identical to the column-
  * arithmetic spelling it replaced, and consistent with
  * simhashCanonicalTriple's lex-rank enumeration — a drift between the
  * two silently drops (or duplicates) near-dup pairs.
  */
class SimhashTripleKeysSpec extends AnyFunSuite {

  private val triples = (0 until 10).combinations(3).toSeq

  private def referenceKeys(sim: Long): Seq[Long] =
    triples.zipWithIndex.map { case (Seq(a, b, c), t) =>
      (t.toLong << 18) + (((sim >> (6 * a)) & 63) << 12) +
        (((sim >> (6 * b)) & 63) << 6) + ((sim >> (6 * c)) & 63)
    }

  test("kernel matches the shift/mask spelling on random signatures") {
    val rnd = new scala.util.Random(42)
    (0 until 200).foreach { _ =>
      val sim = rnd.nextLong() & ((1L << 60) - 1)
      val got = HashKernels.simhashTripleKeys(sim).toLongArray().toSeq
      assert(got == referenceKeys(sim), s"sim=$sim")
    }
  }

  test("canonical triple fires on exactly one shared key per close pair") {
    val rnd = new scala.util.Random(7)
    (0 until 100).foreach { _ =>
      val s1 = rnd.nextLong() & ((1L << 60) - 1)
      // flip ≤7 random bits
      val flips = rnd.nextInt(8)
      val s2 = (0 until flips).foldLeft(s1)((s, _) => s ^ (1L << rnd.nextInt(60)))
      val x = s1 ^ s2
      val k1 = HashKernels.simhashTripleKeys(s1).toLongArray()
      val k2 = HashKernels.simhashTripleKeys(s2).toLongArray()
      // pair qualifies (hamming ≤ 7) ⇒ exactly ONE shared key passes
      // the canonical filter; every shared key's triple id is its index
      val sharedCanonical = (0 until 120).count { t =>
        k1(t) == k2(t) && HashKernels.simhashCanonicalTriple(x, t.toLong)
      }
      assert(sharedCanonical == (if (java.lang.Long.bitCount(x) <= 7) 1 else 0),
        s"s1=$s1 s2=$s2 hamming=${java.lang.Long.bitCount(x)}")
    }
  }
}
