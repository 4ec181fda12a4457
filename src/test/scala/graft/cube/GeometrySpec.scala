package graft.cube

import graft.cube.Geometry._
import org.scalatest.funsuite.AnyFunSuite

/** Geometry semantics checked against an independent implementation
  * (java.awt.geom.Area boolean ops) and hand-verified cases — the
  * Spark/DuckDB cross-check of the same masks runs in the driver's
  * oracle gate (skope_polygon_mask / skope_polygon_zonal). */
class GeometrySpec extends AnyFunSuite {

  /** Independent all_touched reference: cell square vs polygon via AWT
    * area booleans. Boundary-only contact yields an empty Area, so the
    * helper also reports "touches within eps" via an inflated square. */
  private def awtIntersects(poly: GridPolygon, cx: Int, cy: Int,
      inflate: Double = 0.0): Boolean = {
    import java.awt.geom.{Area, Path2D, Rectangle2D}
    val path = new Path2D.Double()
    val vs = poly.vertices
    path.moveTo(vs.head.x, vs.head.y)
    vs.tail.foreach(p => path.lineTo(p.x, p.y))
    path.closePath()
    val a = new Area(path)
    a.intersect(new Area(new Rectangle2D.Double(
      cx - inflate, cy - inflate, 1 + 2 * inflate, 1 + 2 * inflate)))
    !a.isEmpty
  }

  /** Evaluate the SAT mask driver-side for a cell (same constants the
    * Column/SQL emission uses). */
  private def satMask(poly: GridPolygon, cx: Int, cy: Int): Boolean =
    poly.triangles.exists { case (a, b, c) =>
      val vs = Seq(a, b, c)
      val xOk = cx <= vs.map(_.x).max && cx + 1 >= vs.map(_.x).min
      val yOk = cy <= vs.map(_.y).max && cy + 1 >= vs.map(_.y).min
      xOk && yOk && vs.indices.forall { i =>
        val p = vs(i); val q = vs((i + 1) % 3)
        val nx = -(q.y - p.y); val ny = q.x - p.x
        val projs = vs.map(v => nx * v.x + ny * v.y)
        val proj = nx * cx + ny * cy
        val cMin = math.min(0, nx) + math.min(0, ny)
        val cMax = math.max(0, nx) + math.max(0, ny)
        proj + cMax >= projs.min && proj + cMin <= projs.max
      }
    }

  private def maskCells(poly: GridPolygon, w: Int = 12, h: Int = 16): Set[(Int, Int)] =
    (for (x <- 0 until w; y <- 0 until h if satMask(poly, x, y)) yield (x, y)).toSet

  test("triangle strictly inside one cell masks exactly that cell") {
    val p = GridPolygon(Seq(Pt(0.2, 0.2), Pt(0.8, 0.2), Pt(0.5, 0.8))).validate()
    assert(maskCells(p) === Set((0, 0)))
  }

  test("triangle spanning a cell edge masks both cells") {
    val p = GridPolygon(Seq(Pt(0.5, 0.5), Pt(1.5, 0.5), Pt(1.0, 0.9))).validate()
    assert(maskCells(p) === Set((0, 0), (1, 0)))
  }

  test("all_touched: boundary contact counts (rasterio all_touched=True)") {
    // min x = 1.0 exactly: square [0,1]x[0,1] is touched at its x=1 edge
    val p = GridPolygon(Seq(Pt(1.0, 0.2), Pt(1.8, 0.2), Pt(1.4, 0.8))).validate()
    assert(maskCells(p) === Set((0, 0), (1, 0)))
  }

  test("SAT mask agrees with AWT area booleans on the query polygons") {
    for (poly <- Seq(SkopeQueries.MaskPolygon, SkopeQueries.ZonalPolygon) ++
        SkopeQueries.FcShapes.shapes) {
      for (x <- 0 until 12; y <- 0 until 16) {
        val sat = satMask(poly, x, y)
        val overlap = awtIntersects(poly, x, y)
        if (overlap) assert(sat, s"cell ($x,$y): positive-area overlap missing from mask")
        if (sat) assert(awtIntersects(poly, x, y, inflate = 1e-9),
          s"cell ($x,$y): masked but not even boundary-touching")
      }
    }
  }

  test("non-convex dart triangulates to the polygon's area") {
    val p = SkopeQueries.ZonalPolygon
    val triArea = p.triangles.map { case (a, b, c) =>
      math.abs((b.x - a.x) * (c.y - a.y) - (b.y - a.y) * (c.x - a.x)) / 2
    }.sum
    assert(math.abs(triArea - math.abs(p.signedArea)) < 1e-9)
    assert(p.triangles.length === p.vertices.length - 2)
  }

  test("reflex vertex excludes the notch (non-convex semantics)") {
    // dart with deep notch: cell far inside the notch must NOT be masked
    val p = GridPolygon(Seq(Pt(0.5, 0.5), Pt(9.5, 0.5), Pt(9.5, 9.5), Pt(5.0, 2.0)))
      .validate()
    assert(!satMask(p, 2, 6), "cell in the notch should be outside the mask")
    assert(satMask(p, 8, 4), "cell inside the solid part should be masked")
  }

  test("GeoJSON-closed rings and duplicate points normalize") {
    val closed = GridPolygon(Seq(Pt(1, 1), Pt(4, 1), Pt(4, 1), Pt(2, 3), Pt(1, 1)))
    assert(closed.vertices.length === 3)
    closed.validate()
  }

  test("self-intersecting bowtie is not a valid polygon") {
    val bowtie = GridPolygon(Seq(Pt(0, 0), Pt(2, 2), Pt(2, 0), Pt(0, 2)))
    val e = intercept[PolygonIsNotValid](bowtie.validate())
    assert(e.getMessage.contains("not a valid polygon"))
    assert(e.getMessage.contains("self-intersection"))
  }

  test("degenerate rings are not valid") {
    intercept[PolygonIsNotValid](GridPolygon(Seq(Pt(0, 0), Pt(1, 1))).validate())
    intercept[PolygonIsNotValid](
      GridPolygon(Seq(Pt(0, 0), Pt(2, 2), Pt(4, 4))).validate()) // zero area
    intercept[PolygonIsNotValid]( // spike folding back on itself
      GridPolygon(Seq(Pt(0, 0), Pt(4, 0), Pt(6, 0), Pt(4, 0), Pt(2, 3))).validate())
  }

  test("bounds: interior must intersect the grid interior (DE-9IM T********)") {
    // fully outside
    assert(!GridPolygon(Seq(Pt(20, 20), Pt(25, 20), Pt(22, 24))).interiorIntersectsGrid())
    // touching the x=0 boundary from outside only — zero-area overlap
    assert(!GridPolygon(Seq(Pt(-2, 0), Pt(0, 0), Pt(0, 2), Pt(-2, 2))).interiorIntersectsGrid())
    // straddling the boundary
    assert(GridPolygon(Seq(Pt(-1, 1), Pt(1, 1), Pt(1, 3), Pt(-1, 3))).interiorIntersectsGrid())
    assert(SkopeQueries.MaskPolygon.interiorIntersectsGrid())
  }

  /** Spark-evaluated mask over a synthetic grid (the hole logic lives
    * in the Column emission, not the test-side SAT replica). */
  private def sparkMaskCells(poly: GridPolygon, w: Int = 12, h: Int = 16): Set[(Int, Int)] = {
    val spark = graft.SparkSpec.session
    import spark.implicits._
    (for (x <- 0 until w; y <- 0 until h) yield (x, y)).toDF("x", "y")
      .filter(poly.mask(org.apache.spark.sql.functions.col("x"),
        org.apache.spark.sql.functions.col("y")))
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
  }

  /** AWT even-odd reference for a polygon with holes. */
  private def awtDonut(poly: GridPolygon, cx: Int, cy: Int,
      inflate: Double = 0.0): Boolean = {
    import java.awt.geom.{Area, Path2D, Rectangle2D}
    val path = new Path2D.Double(Path2D.WIND_EVEN_ODD)
    (poly.vertices +: poly.holeRings).foreach { ring =>
      path.moveTo(ring.head.x, ring.head.y)
      ring.tail.foreach(p => path.lineTo(p.x, p.y))
      path.closePath()
    }
    val a = new Area(path)
    a.intersect(new Area(new Rectangle2D.Double(
      cx - inflate, cy - inflate, 1 + 2 * inflate, 1 + 2 * inflate)))
    !a.isEmpty
  }

  test("polygon holes exclude strictly-interior cells, keep boundary-touching ones") {
    val donut = GridPolygon(
      ring = Seq(Pt(0.5, 0.5), Pt(8.5, 0.5), Pt(8.5, 8.5), Pt(0.5, 8.5)),
      holes = Seq(Seq(Pt(2.5, 2.5), Pt(6.5, 2.5), Pt(6.5, 6.5), Pt(2.5, 6.5)))
    ).validate()
    val cells = sparkMaskCells(donut)
    // strictly inside the hole: [x,x+1]x[y,y+1] within (2.5,6.5)^2
    for (x <- 3 to 5; y <- 3 to 5)
      assert(!cells((x, y)), s"cell ($x,$y) inside the hole must be excluded")
    // touching the hole boundary from inside it: still part of the polygon
    assert(cells((2, 3)) && cells((6, 3)) && cells((3, 2)) && cells((3, 6)))
    // ordinary ring cells
    assert(cells((0, 0)) && cells((8, 8)))
    // outside the exterior
    assert(!cells((9, 9)) && !cells((11, 2)))
  }

  test("donut mask agrees with the AWT even-odd reference everywhere") {
    val donut = SkopeQueries.HolePolygon
    val cells = sparkMaskCells(donut)
    for (x <- 0 until 12; y <- 0 until 16) {
      if (awtDonut(donut, x, y)) assert(cells((x, y)),
        s"cell ($x,$y): positive-area donut overlap missing from mask")
      if (cells((x, y))) assert(awtDonut(donut, x, y, inflate = 1e-9),
        s"cell ($x,$y): masked but not even boundary-touching")
    }
  }

  test("a hole outside the shell is rejected") {
    val bad = GridPolygon(
      ring = Seq(Pt(0, 0), Pt(4, 0), Pt(4, 4), Pt(0, 4)),
      holes = Seq(Seq(Pt(6, 6), Pt(8, 6), Pt(7, 8))))
    val e = intercept[PolygonIsNotValid](bad.validate())
    assert(e.getMessage.contains("hole lies outside shell"))
  }

  test("geodesic cell areas match WGS84 magnitudes and ordering") {
    import Geometry.Geo
    // a 1-degree cell at ~45N is ~8.7e9 m^2 (textbook value)
    val mid = Geo.cellAreaM2(5) // row 5 spans 44..45N
    assert(mid > 8.0e9 && mid < 9.5e9, s"implausible cell area $mid")
    // moving south from 50N toward the equator, cells grow
    (1 until Geometry.GridHeight).foreach { y =>
      assert(Geo.cellAreaM2(y) > Geo.cellAreaM2(y - 1))
    }
    // whole-earth consistency: summing 360 lon-degrees x 180 rows of
    // 1-degree zones reproduces the WGS84 authalic surface area
    val earth = (0 until 180).map { i =>
      val ulLat = 90.0 - i
      // reuse the row formula by shifting the grid origin
      val a = Geo.Wgs84A; val e = Geo.Wgs84E
      def zone(lat: Double) = {
        val s = math.sin(math.toRadians(lat))
        math.Pi * a * a * (1 - e * e) *
          (s / (1 - e * e * s * s) + math.log((1 + e * s) / (1 - e * s)) / (2 * e)) / 360.0
      }
      math.abs(zone(ulLat) - zone(ulLat - 1)) * 360.0
    }.sum
    assert(math.abs(earth - 5.1006e14) / 5.1006e14 < 1e-3,
      s"earth surface area off: $earth")
  }

  test("oracle SQL emission round-trips the same constants") {
    val sql = SkopeQueries.MaskPolygon.maskSql()
    // convex triangle: one SAT conjunction, 10 comparisons
    assert(sql.count(_ == '>') + sql.count(_ == '<') === 10)
    // every numeric literal in the SQL parses back to a double exactly
    val nums = "[-+]?[0-9]+\\.[0-9]+(E-?[0-9]+)?".r.findAllIn(sql).toSeq
    assert(nums.nonEmpty)
    nums.foreach(n => assert(java.lang.Double.toString(n.toDouble) === n.replace("+", "")))
  }
}
