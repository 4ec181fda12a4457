package graft.cube

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.dataformat.yaml.YAMLFactory

import scala.jdk.CollectionConverters._

/** Runtime catalog loading from a metadata.yml-shaped file — the one
  * operational behavior of the reference the static Scala catalog did
  * not reproduce (app/main.py + config.py `metadata_path` load the yml
  * document list at startup; dataset.py:34-41 builds each Dataset from
  * it). With this loader, adding a dataset to a deployment is a yml
  * edit, not a recompile: point `SPARK_GRAFT_CATALOG` at the file.
  *
  * Parsing uses jackson-dataformat-yaml from Spark's own classpath (no
  * new dependency). The loader is deliberately shaped after the
  * reference's documents (metadata.yml:1-93): id/title/ordering/
  * description/status/revised prose fields, `timespan` with
  * resolution + resolutionLabel + period {gte, lte, timeZero, suffix},
  * `region` display hints, `uncertainty`, and the per-dataset
  * `variables` list. Documents whose timespan cannot band a series
  * (empty resolution — e.g. the reference's `srtm` elevation raster)
  * are skipped: they are map layers, not timeseries datasets, and the
  * engine's catalog drives timeseries banding.
  */
object CatalogYaml {

  /** Normalize the yml's period bounds to ISO dates: the reference
    * spells year-resolution bounds as bare year strings ('0001',
    * '2017') and the band arithmetic (Catalog.nBands) wants LocalDate.
    */
  private[cube] def isoDate(s: String): String = s.trim match {
    case y if y.matches("\\d{1,4}") => f"${y.toInt}%04d-01-01"
    case ym if ym.matches("\\d{4}-\\d{2}") => s"$ym-01"
    case iso => iso
  }

  private def text(n: JsonNode, field: String, default: String = ""): String =
    Option(n.get(field)).filterNot(_.isNull).map(_.asText).getOrElse(default)

  private def num(n: JsonNode, field: String, default: Int): Int =
    Option(n.get(field)).filterNot(_.isNull).map(_.asInt).getOrElse(default)

  def load(path: String): (Seq[Catalog.Entry], Map[String, Seq[Catalog.Variable]]) = {
    val root = new ObjectMapper(new YAMLFactory())
      .readTree(java.nio.file.Files.newInputStream(
        java.nio.file.Paths.get(path)))
    require(root != null && root.isArray,
      s"catalog $path must be a yml LIST of dataset documents")

    val docs = root.elements.asScala.toSeq
    val loadable = docs.filter { d =>
      if (d.get("time_range") != null) {
        // compact deploy shape (see below): bandable = resolution +
        // both time_range bounds
        val tr = d.get("time_range")
        text(d, "resolution").nonEmpty &&
          text(tr, "gte").nonEmpty && text(tr, "lte").nonEmpty
      } else {
        val ts = d.get("timespan")
        // bandable = resolution + BOTH period bounds: a document missing
        // any of these is a map layer, not a timeseries dataset
        ts != null && text(ts, "resolution").nonEmpty &&
          ts.get("period") != null &&
          text(ts.get("period"), "gte").nonEmpty &&
          text(ts.get("period"), "lte").nonEmpty
      }
    }

    val entries = loadable.map { d =>
      try if (d.get("time_range") != null) compactEntry(d) else entry(d)
      catch {
        case e: Exception => throw new IllegalArgumentException(
          s"catalog $path: dataset '${text(d, "id", "<no id>")}': " +
            e.getMessage, e)
      }
    }
    val vars = loadable.map { d =>
      val id = text(d, "id")
      val vs = Option(d.get("variables")).filter(_.isArray)
        .map(_.elements.asScala.toSeq).getOrElse(Seq.empty)
        .map { v =>
          if (v.isTextual)
            // compact deploy shape: a variable is just its id string
            Catalog.Variable(id = v.asText, clazz = "", name = v.asText,
              units = None, min = 0.0, max = 0.0, visible = false,
              styles = "default", description = "")
          else Catalog.Variable(
            id = text(v, "id"),
            clazz = text(v, "class"),
            name = text(v, "name"),
            units = Option(v.get("units")).filterNot(_.isNull)
              .map(_.asText).filter(_.nonEmpty),
            min = Option(v.get("min")).map(_.asDouble).getOrElse(0.0),
            max = Option(v.get("max")).map(_.asDouble).getOrElse(0.0),
            visible = Option(v.get("visible")).exists(_.asBoolean),
            styles = text(v, "styles", "default"),
            description = text(v, "description"))
        }
      id -> vs
    }.toMap

    (entries, vars)
  }

  /** The reference's OTHER catalog shape: deploy/metadata/{env}.yml
    * (config.py:52-61 — the FIXME-duplicated validation catalog the
    * prod deployment actually loads), a compact list of
    * `{id, time_range{gte, lte}, resolution, variables: [name, …]}`
    * documents matching the pydantic `Dataset` model
    * (schemas/dataset.py:27-30). Prose/display fields don't exist in
    * this shape, so they default; note the compact shape does NOT mark
    * map layers (prod.yml lists srtm with a one-band year range), so
    * every bandable document loads — same as the reference, which
    * validates requests against exactly this list. */
  private def compactEntry(d: JsonNode): Catalog.Entry = {
    val tr = d.get("time_range")
    val gte = isoDate(text(tr, "gte"))
    Catalog.Entry(
      id = text(d, "id"),
      title = text(d, "id"),
      resolution = text(d, "resolution"),
      timeGte = gte,
      timeLte = isoDate(text(tr, "lte")),
      timeZero = java.time.LocalDate.parse(gte).getYear,
      uncertainty = "No uncertainty estimates available.",
      ordering = 0,
      description = "",
      status = "Published",
      revised = "",
      resolutionLabel = "",
      eraSuffix = "CE",
      methodSummary = "",
      references = "",
      originator = "")
  }

  private def entry(d: JsonNode): Catalog.Entry = {
    val ts = d.get("timespan")
    val period = ts.get("period")
    val gte = isoDate(text(period, "gte"))
    Catalog.Entry(
      id = text(d, "id"),
      title = text(d, "title"),
      resolution = text(ts, "resolution"),
      timeGte = gte,
      timeLte = isoDate(text(period, "lte")),
      // absent timeZero (non-era datasets) anchors the era at the
      // period start, making band 1's label the gte year — the same
      // default the synthetic catalog uses. Resolved lazily so a
      // present timeZero never depends on gte parsing.
      timeZero = Option(period.get("timeZero")).filterNot(_.isNull)
        .map(_.asInt)
        .getOrElse(java.time.LocalDate.parse(gte).getYear),
      uncertainty = text(d, "uncertainty",
        "No uncertainty estimates available."),
      ordering = num(d, "ordering", 0),
      description = text(d, "description"),
      status = text(d, "status", "Published"),
      revised = text(d, "revised"),
      resolutionLabel = text(ts, "resolutionLabel"),
      eraSuffix = text(period, "suffix", "CE"),
      methodSummary = text(d, "methodSummary"),
      references = text(d, "references"),
      originator = text(d, "originator"))
  }
}
