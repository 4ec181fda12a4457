package graft.cube

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The scalar cell enumeration (GridPolygon.coveredCells — the batch
  * path's join source) must agree with the Column mask (the
  * per-request path) on EVERY grid cell for arbitrary valid geometry:
  * the two are the same SAT double arithmetic in two spellings, and a
  * single disagreeing cell silently changes a batch zonal mean.
  */
class CellEnumerationSpec extends SparkSpec {
  import Geometry.{GridPolygon, Pt}

  private val W = EventCube.GridWidth
  private val H = Geometry.GridHeight

  private def columnCells(mask: (org.apache.spark.sql.Column,
      org.apache.spark.sql.Column) => org.apache.spark.sql.Column): Set[(Long, Long)] = {
    val s = spark
    import s.implicits._
    (0 until W * H).map(c => (c % W, c / W)).toDF("x", "y")
      .filter(mask(col("x"), col("y")))
      .collect().map(r => (r.getInt(0).toLong, r.getInt(1).toLong)).toSet
  }

  test("random triangles: scalar enumeration == Column mask on the full grid") {
    val rnd = new scala.util.Random(2024)
    var checked = 0
    while (checked < 40) {
      val pts = Seq.fill(3)(Pt(rnd.nextDouble() * W, rnd.nextDouble() * H))
      val poly = try Some(GridPolygon(pts).validate())
        catch { case _: Geometry.PolygonIsNotValid => None }
      poly.foreach { p =>
        assert(p.coveredCells().toSet === columnCells(p.mask),
          s"triangle $pts")
        checked += 1
      }
    }
  }

  test("random quads (incl. boundary-aligned): scalar == Column") {
    val rnd = new scala.util.Random(7)
    var checked = 0
    while (checked < 25) {
      // integer-aligned vertices exercise the x+1 >= tMin boundary case
      val x0 = rnd.nextInt(W - 2).toDouble
      val y0 = rnd.nextInt(H - 2).toDouble
      val w = 1 + rnd.nextInt(4)
      val h = 1 + rnd.nextInt(4)
      val quad = try Some(GridPolygon(Seq(
          Pt(x0, y0), Pt(x0 + w, y0), Pt(x0 + w, y0 + h), Pt(x0, y0 + h)))
        .validate())
        catch { case _: Geometry.PolygonIsNotValid => None }
      quad.foreach { p =>
        assert(p.coveredCells().toSet === columnCells(p.mask),
          s"quad $x0 $y0 $w $h")
        checked += 1
      }
    }
  }

  test("holed polygon: scalar == Column including hole exclusion") {
    val outer = Seq(Pt(1.2, 1.2), Pt(8.6, 1.4), Pt(8.4, 9.6), Pt(1.4, 9.4))
    val hole = Seq(Pt(3.4, 3.4), Pt(6.6, 3.6), Pt(6.4, 7.6), Pt(3.6, 7.4))
    val p = GridPolygon(outer, Seq(hole)).validate()
    val scalar = p.coveredCells().toSet
    assert(scalar === columnCells(p.mask))
    // the hole actually excluded something (non-trivial fixture)
    val noHole = GridPolygon(outer).validate()
    assert(scalar.size < noHole.coveredCells().size)
  }

  test("feature collection union: scalar == Column") {
    val a = GridPolygon(Seq(Pt(0.3, 0.3), Pt(3.7, 0.5), Pt(2.0, 3.7))).validate()
    val b = GridPolygon(Seq(Pt(5.3, 5.3), Pt(8.7, 5.5), Pt(7.0, 8.7))).validate()
    val fc = Geometry.GridFeatureCollection(Seq(a, b))
    assert(fc.coveredCells().toSet === columnCells(fc.mask))
  }
}
