package graft.cube

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Randomized differential check of the all_touched SAT masks against
  * an independent algorithm: clip the polygon by each cell square
  * (Sutherland–Hodgman, convex window) and call the cell touched iff
  * the clipped region has positive area. Random star-shaped polygons
  * (angular sort of random points → always simple) exercise the
  * ear-clipping + multi-triangle union path; random doubles make
  * exact-tangency (where the two algorithms may legitimately differ
  * on zero-area touches) a measure-zero event. Seed fixed for
  * reproducibility. */
class GeometryDiffSpec extends SparkSpec {

  import Geometry.{GridPolygon, Pt}

  /** Clip `poly` by the axis-aligned square [x0,x0+1]×[y0,y0+1]. */
  private def clipArea(poly: Seq[Pt], x0: Double, y0: Double): Double = {
    def clipHalf(ps: Seq[Pt], inside: Pt => Boolean,
        intersect: (Pt, Pt) => Pt): Seq[Pt] = {
      if (ps.isEmpty) return Nil
      val out = Seq.newBuilder[Pt]
      ps.indices.foreach { i =>
        val a = ps(i); val b = ps((i + 1) % ps.length)
        (inside(a), inside(b)) match {
          case (true, true) => out += b
          case (true, false) => out += intersect(a, b)
          case (false, true) => out += intersect(a, b) += b
          case _ =>
        }
      }
      out.result()
    }
    def ix(a: Pt, b: Pt, x: Double) = // intersection with vertical x
      Pt(x, a.y + (b.y - a.y) * (x - a.x) / (b.x - a.x))
    def iy(a: Pt, b: Pt, y: Double) = // intersection with horizontal y
      Pt(a.x + (b.x - a.x) * (y - a.y) / (b.y - a.y), y)
    var ps: Seq[Pt] = poly
    ps = clipHalf(ps, _.x >= x0, (a, b) => ix(a, b, x0))
    ps = clipHalf(ps, _.x <= x0 + 1, (a, b) => ix(a, b, x0 + 1))
    ps = clipHalf(ps, _.y >= y0, (a, b) => iy(a, b, y0))
    ps = clipHalf(ps, _.y <= y0 + 1, (a, b) => iy(a, b, y0 + 1))
    if (ps.size < 3) 0.0
    else math.abs(ps.indices.map { i =>
      val a = ps(i); val b = ps((i + 1) % ps.size)
      a.x * b.y - b.x * a.y
    }.sum / 2.0)
  }

  test("SAT all_touched mask agrees with Sutherland-Hodgman clipping") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(77)
    val cells = (0 until 100).map(i => (i % 10, i / 10)).toDF("x", "y")
    (1 to 20).foreach { round =>
      val n = 4 + rnd.nextInt(5)
      val raw = Seq.fill(n)(Pt(rnd.nextDouble() * 10, rnd.nextDouble() * 10))
      val cx = raw.map(_.x).sum / n
      val cy = raw.map(_.y).sum / n
      // angular sort around the centroid → a simple (star-shaped) ring
      val ring = raw.sortBy(p => math.atan2(p.y - cy, p.x - cx))
      val polyOpt =
        try Some(GridPolygon(ring).validate())
        catch { case _: Geometry.PolygonIsNotValid => None } // degenerate draw
      polyOpt.foreach { poly =>
        val got = cells.filter(poly.mask(col("x"), col("y")))
          .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
        val expected = (for {
          x <- 0 until 10; y <- 0 until 10
          if clipArea(ring, x, y) > 1e-9
        } yield (x, y)).toSet
        // the SAT mask must cover every positive-area overlap; extras
        // are only legitimate at zero-area touches (measure-zero here)
        assert(got == expected,
          s"round $round ring=$ring\nonly-sat=${got -- expected}\n" +
            s"only-clip=${expected -- got}")
      }
    }
  }
}
