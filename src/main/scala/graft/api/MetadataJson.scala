package graft.api

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

import graft.cube.Catalog

/** `/metadata` response serialization: the catalog rendered as the
  * reference's document list (routers/v2/api.py:15-17 returns the
  * metadata.yml documents VERBATIM — load_api_metadata,
  * dataset.py:142-154), with the yml's NESTING restored from the flat
  * catalog columns: `region` {name, zoom, center, style {color,
  * weight}, extents [[north, west], [south, east]]} and `timespan`
  * {resolution, resolutionLabel, period {timeZero, gte, lte, suffix}}
  * (metadata.yml:1-60). Purely static like the reference — the corpus-
  * derived fields (n_cells) belong to the `skope_metadata` QUERY, not
  * the yml document. */
object MetadataJson {

  private val mapper = new ObjectMapper()

  def toJson: String = mapper.writeValueAsString(tree)

  private[api] def tree: ArrayNode = {
    val arr = mapper.createArrayNode()
    Catalog.activeEntries.foreach { e =>
      val d = arr.addObject()
      d.put("id", e.id)
      d.put("title", e.title)
      d.put("ordering", e.ordering)
      d.put("description", e.description)
      d.put("type", "dataset")
      d.put("status", e.status)
      d.put("revised", e.revised)
      val region = d.putObject("region")
      region.put("zoom", Catalog.RegionZoom)
      val center = region.putArray("center")
      center.add(Catalog.RegionCenterLat)
      center.add(Catalog.RegionCenterLon)
      region.put("name", Catalog.RegionName)
      val style = region.putObject("style")
      style.put("color", Catalog.RegionStyleColor)
      style.put("weight", Catalog.RegionStyleWeight)
      // corner pairs like the yml: [[north, west], [south, east]]
      val extents = region.putArray("extents")
      val nw = extents.addArray()
      nw.add(Catalog.LatMax); nw.add(Catalog.LonMin)
      val se = extents.addArray()
      se.add(Catalog.LatMin); se.add(Catalog.LonMax)
      val timespan = d.putObject("timespan")
      timespan.put("resolution", e.resolution)
      timespan.put("resolutionLabel", e.resolutionLabel)
      val period = timespan.putObject("period")
      period.put("timeZero", e.timeZero)
      period.put("gte", e.timeGte)
      period.put("lte", e.timeLte)
      period.put("suffix", e.eraSuffix)
      d.put("uncertainty", e.uncertainty)
      d.put("methodSummary", e.methodSummary)
      d.put("references", e.references)
      d.put("originator", e.originator)
      // full variable documents (metadata.yml:77-93)
      val vars = d.putArray("variables")
      Catalog.activeVariables(e.id).foreach { v =>
        val vn = vars.addObject()
        vn.put("id", v.id)
        vn.put("class", v.clazz)
        vn.put("name", v.name)
        v.units match {
          case Some(u) => vn.put("units", u)
          case None => vn.putNull("units")
        }
        vn.put("min", v.min)
        vn.put("max", v.max)
        vn.put("visible", v.visible)
        vn.put("styles", v.styles)
        vn.put("timeseriesServiceUri",
          Catalog.timeseriesServiceUri(e.id, v.id))
        vn.put("description", v.description)
        // the synthetic grid has no nodata sentinel; the slot is the
        // contract (metadata.yml nodata / fill handling)
        vn.putNull("fill_value")
      }
    }
    arr
  }
}
