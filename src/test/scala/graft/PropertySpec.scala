package graft

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based checks (ScalaCheck) for the pure-JVM kernels and the
  * reference band arithmetic: each property is an INDEPENDENT
  * formulation (BigInt modular arithmetic, Set intersection, per-band
  * recomputation, closed-form bounds) evaluated over hundreds of
  * generated cases — no Spark session involved, so the generators can
  * afford to be dense. */
class PropertySpec extends AnyFunSuite {

  private def check(name: String)(p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(r.passed, s"$name: ${r.status}")
  }

  test("roundEpsJvm fast path is bit-identical to the BigDecimal spelling") {
    // the fast path guards on distance from the half boundary; the
    // generators deliberately hammer that boundary (exact multiples of
    // 1e-6, half-grain offsets, ulp nudges) plus generic magnitudes
    val genGrid = for {
      k <- Gen.choose(-2000000000L, 2000000000L)
      off <- Gen.oneOf(0.0, 5e-7, -5e-7, 4.99e-7, 5.01e-7, 1e-9, -1e-9)
      ulps <- Gen.choose(-2, 2)
    } yield {
      val base = k / 1e6 + off
      (0 until math.abs(ulps)).foldLeft(base)((v, _) =>
        if (ulps > 0) Math.nextUp(v) else Math.nextDown(v))
    }
    val genAny = Gen.choose(-1e7, 1e7)
    check("grid+boundary")(Prop.forAll(genGrid) { x =>
      Num.roundEpsJvm(x, 6) == Num.roundEpsJvmSlow(x, 6)
    })
    check("generic")(Prop.forAll(genAny) { x =>
      Num.roundEpsJvm(x, 6) == Num.roundEpsJvmSlow(x, 6)
    })
  }

  test("bandRangeGroups partitions the range contiguously under the cell budget") {
    // the reference's chunked-read planner (test_split_indices shape):
    // whole-band groups, concatenation = the exact requested range,
    // every group within the cell budget
    val gen = for {
      w <- Gen.choose(1, 40)
      h <- Gen.choose(1, 40)
      gte <- Gen.choose(1, 50)
      len <- Gen.choose(0, 120)
      mult <- Gen.choose(1, 9)
      extra <- Gen.choose(0, 1000)
    } yield (w, h, gte, gte + len, mult.toLong * w * h + extra)
    check("groups")(Prop.forAll(gen) { case (w, h, gte, lte, maxSize) =>
      val gs = api.Api.bandRangeGroups(w, h, (gte, lte), maxSize)
      gs.flatMap(_.toSeq) == (gte to lte) &&
        gs.forall(g => g.length.toLong * w * h <= maxSize) &&
        gs.forall(_.nonEmpty)
    })
  }

  test("daily and monthly band arithmetic are translation-invariant") {
    val gen = for {
      y <- Gen.choose(2019, 2030)
      m <- Gen.choose(1, 12)
      d <- Gen.choose(1, 28)
      k <- Gen.choose(0, 400)
    } yield (java.time.LocalDate.of(y, m, d), k)
    check("daily shift")(Prop.forAll(gen) { case (date, k) =>
      def band(dt: java.time.LocalDate) = api.Api.bandForDate(Some(dt.toString), 0)
      band(date.plusDays(k.toLong)) - band(date) == k
    })
    check("monthly shift")(Prop.forAll(gen) { case (date, k) =>
      def mband(dt: java.time.LocalDate) = api.Api.bandForMonth(
        Some(f"${dt.getYear}%04d-${dt.getMonthValue}%02d"), 0)
      mband(date.plusMonths(k.toLong)) - mband(date) == k
    })
  }

  test("LshKernel band keys match an independent per-band recomputation") {
    import graft.functions.LshKernel
    val vecGen = Gen.listOfN(LshKernel.Dim, Gen.choose(-5.0, 5.0)).map(_.toArray)
    check("lsh keys")(Prop.forAll(vecGen) { v =>
      val keys = LshKernel.bandKeys(new GenericArrayData(v))
      (0 until LshKernel.Bands).forall { b =>
        var expect = 0
        (0 until LshKernel.Rows).foreach { r =>
          val p = b * LshKernel.Rows + r
          val dot = (0 until LshKernel.Dim)
            .map(i => v(i) * LshKernel.matrix(p * LshKernel.Dim + i)).sum
          if (Num.roundEpsJvm(dot, 6) >= 0) expect |= 1 << r
        }
        keys.getInt(b) == expect && keys.getInt(b) >= 0 &&
          keys.getInt(b) < (1 << LshKernel.Rows)
      }
    })
  }

  test("QuantKernel: scale law and reconstruction error bound") {
    val vecGen = Gen.choose(1, 64)
      .flatMap(n => Gen.listOfN(n, Gen.choose(-100.0, 100.0)))
      .map(_.toArray)
    check("quantize")(Prop.forAll(vecGen) { arr =>
      val st = graft.functions.QuantKernel.stats(new GenericArrayData(arr))
      val (scale, mse) = (st.getDouble(0), st.getDouble(1))
      val maxAbs = arr.map(math.abs).max
      if (maxAbs == 0.0) scale == 0.0 && mse == 0.0
      else {
        // per-element rounding error ≤ 0.5/scale = maxAbs/254, so the
        // MEAN squared error is bounded by that square — the closed
        // form the int8 design promises
        val q = maxAbs / 254.0
        math.abs(scale - 127.0 / maxAbs) <= 1e-12 * scale &&
          mse >= 0.0 && mse <= q * q + 1e-12
      }
    })
  }

  test("fingerprint31 equals a BigInt modular reference on arbitrary strings") {
    val strGen = for {
      body <- Gen.listOf(Gen.frequency(
        8 -> Gen.alphaNumChar, 2 -> Gen.oneOf('é', 'ß', '文', ' ', '!')))
      supplementary <- Gen.oneOf("", "𝔘") // U+1D518, a surrogate pair
    } yield supplementary + body.mkString
    check("fingerprint")(Prop.forAll(strGen) { s =>
      val mod = BigInt(1000000007L)
      val expect = s.codePoints().toArray.take(64).zipWithIndex
        .map { case (cp, i) => BigInt(cp) * BigInt(31).modPow(BigInt(i), mod) % mod }
        .foldLeft(BigInt(0))((a, b) => (a + b) % mod)
      graft.functions.HashKernels.fingerprint31(
        org.apache.spark.unsafe.types.UTF8String.fromString(s)) == expect.toLong
    })
  }

  test("sortedIntersectCount equals Set-intersection size") {
    val g = for {
      a <- Gen.listOf(Gen.choose(-100L, 100L))
      b <- Gen.listOf(Gen.choose(-100L, 100L))
    } yield (a.distinct.sorted, b.distinct.sorted)
    check("intersect")(Prop.forAll(g) { case (a, b) =>
      graft.functions.HashKernels.sortedIntersectCount(
        new GenericArrayData(a.toArray), new GenericArrayData(b.toArray)) ==
        a.toSet.intersect(b.toSet).size
    })
  }
}
