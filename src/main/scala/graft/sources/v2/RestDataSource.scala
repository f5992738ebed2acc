package graft.sources.v2

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.geo.Geometry

/** DataSource V2 connector for the ESRI-REST-style paged source
  * (`spark.read.format("graft-rest").option("path", serviceDir)`),
  * the engine-grade version of graft.sources.PagedRestSource.
  *
  * What the reference hand-implements at the HTTP layer
  * (rest_api.py:189-209 query params, :575-637 pagination), this
  * connector expresses through the DSv2 pushdown contracts, so Catalyst
  * drives it:
  *  - SupportsPushDownFilters → the `where`/bbox params: filters on
  *    layer_id / feature_id / srid / bbox columns are evaluated INSIDE
  *    the page reader ("at the server"); residuals stay in Spark.
  *  - SupportsPushDownRequiredColumns → `outFields`: pruned columns are
  *    never materialized from JSON.
  *  - SupportsPushDownLimit → `resultRecordCount`: page partitions stop
  *    emitting at the limit (early termination, rest_api.py:280-298).
  *
  * Each page file is one InputPartition — pagination becomes a
  * partitioned parallel read instead of the reference's sequential
  * offset loop. At cluster scale each executor fetches its own pages.
  */
class RestDataSource extends TableProvider with org.apache.spark.sql.sources.DataSourceRegister {

  override def shortName(): String = "graft-rest"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    RestTable.Schema

  // writes carry the frame's own schema into getTable (reads still infer)
  override def supportsExternalMetadata(): Boolean = true

  override def getTable(
      schema: StructType, partitioning: Array[Transform], properties: JMap[String, String]): Table =
    new RestTable(properties.get("path"), Option(schema))
}

object RestTable {
  /** the normalized feature schema (same shape as GeoJsonSource.read). */
  val Schema: StructType = StructType(Seq(
    StructField("layer_id", IntegerType),
    StructField("feature_id", LongType),
    StructField("properties", MapType(StringType, StringType)),
    StructField("geom_type", StringType),
    StructField("geometry", StringType),
    StructField("srid", IntegerType),
    StructField("xmin", DoubleType),
    StructField("ymin", DoubleType),
    StructField("xmax", DoubleType),
    StructField("ymax", DoubleType)))

  /** page files under a service dir: layer-<id>/page-<n>.json (single
    * layer dirs are treated as layer 0).
    */
  def discoverPages(path: String): Seq[(Int, java.io.File)] = {
    val root = new java.io.File(path)
    val layerDirs = Option(root.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("layer-"))
    val dirs =
      if (layerDirs.nonEmpty) layerDirs.map(d => d.getName.stripPrefix("layer-").toInt -> d).toSeq
      else Seq(0 -> root)
    dirs.sortBy(_._1).flatMap { case (id, dir) =>
      Option(dir.listFiles()).getOrElse(Array.empty)
        .filter(f => f.getName.startsWith("page-") && f.getName.endsWith(".json"))
        .sortBy(_.getName)
        .map(id -> _)
    }
  }
}

class RestTable(path: String, providedSchema: Option[StructType] = None) extends Table
  with SupportsRead
  with org.apache.spark.sql.connector.catalog.SupportsWrite {
  override def name(): String                          = s"graft-rest:$path"
  override def schema(): StructType                    = providedSchema.getOrElse(RestTable.Schema)
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new RestScanBuilder(path)

  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new RestWriteBuilder(path, info)
}

class RestScanBuilder(path: String)
  extends ScanBuilder
  with SupportsPushDownFilters
  with SupportsPushDownRequiredColumns
  with SupportsPushDownLimit {

  private var pushed: Array[Filter]       = Array.empty
  private var requiredSchema: StructType  = RestTable.Schema
  private var limit: Int                  = -1

  /** which filters the "server" (page reader) can evaluate — the analog
    * of what the reference can put into where/bbox query params.
    */
  private def supported(f: Filter): Boolean = {
    val cols = f.references.toSet
    cols.nonEmpty && cols.subsetOf(Set("layer_id", "feature_id", "srid",
      "xmin", "ymin", "xmax", "ymax", "geom_type"))
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (canPush, residual) = filters.partition(supported)
    pushed = canPush
    residual // Spark re-applies these (standard pushdown contract)
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(required: StructType): Unit =
    requiredSchema = required

  override def pushLimit(l: Int): Boolean = { limit = l; true /* guaranteed */ }

  override def build(): Scan = new RestScan(path, pushed, requiredSchema, limit)
}

class RestScan(path: String, filters: Array[Filter], required: StructType, limit: Int)
  extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch           = this

  override def description(): String =
    s"graft-rest path=$path PushedFilters=[${filters.mkString(", ")}] " +
      s"ReadSchema=[${required.fieldNames.mkString(",")}] limit=$limit"

  override def planInputPartitions(): Array[InputPartition] =
    RestTable.discoverPages(path).map { case (layerId, file) =>
      RestPagePartition(layerId, file.getAbsolutePath): InputPartition
    }.toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new RestReaderFactory(filters, required, limit)
}

case class RestPagePartition(layerId: Int, file: String) extends InputPartition

class RestReaderFactory(filters: Array[Filter], required: StructType, limit: Int)
  extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[RestPagePartition]
    new RestPageReader(part.layerId, part.file, filters, required, limit)
  }
}

/** Reads one canned page (FeatureCollection JSON), applies pushed
  * filters and the limit, emits only required columns.
  */
class RestPageReader(
    layerId: Int, file: String, filters: Array[Filter],
    required: StructType, limit: Int)
  extends PartitionReader[InternalRow] {

  private case class Feature(
      featureId: Long, props: Map[String, String], geomType: String,
      wkt: String, srid: Int, bb: Geometry.BBox)

  private lazy val features: Iterator[Feature] = {
    val text = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(file)))
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root   = mapper.readTree(text)
    val srid   = Option(root.get("crs")).map(_.toString)
      .map(graft.sources.GeoJsonSource.parseSrid(_, 3006)).getOrElse(3006)
    val fs = Option(root.get("features")).map(_.elements().asScala.toSeq).getOrElse(Seq.empty)
    fs.iterator.zipWithIndex.flatMap { case (f, i) =>
      val props = Option(f.get("properties")).map { p =>
        p.properties().asScala.map(e =>
          e.getKey -> (if (e.getValue.isTextual) e.getValue.asText() else e.getValue.toString)).toMap
      }.getOrElse(Map.empty)
      Option(f.get("geometry")).map(_.toString).flatMap(Geometry.fromGeoJson).map { g =>
        Feature(i.toLong, props, g.kind, Geometry.toWkt(g), srid, Geometry.bbox(g))
      }
    }
  }

  private def matches(f: Feature): Boolean = filters.forall(ev(_, f))

  private def fieldVal(name: String, f: Feature): Any = name match {
    case "layer_id"   => layerId
    case "feature_id" => f.featureId
    case "srid"       => f.srid
    case "geom_type"  => f.geomType
    case "xmin"       => f.bb.xmin
    case "ymin"       => f.bb.ymin
    case "xmax"       => f.bb.xmax
    case "ymax"       => f.bb.ymax
    case _            => null
  }

  private def cmp(a: Any, b: Any): Int = (a, b) match {
    case (x: Int, y: Number)    => java.lang.Double.compare(x.toDouble, y.doubleValue())
    case (x: Long, y: Number)   => java.lang.Double.compare(x.toDouble, y.doubleValue())
    case (x: Double, y: Number) => java.lang.Double.compare(x, y.doubleValue())
    case (x: String, y: String) => x.compareTo(y)
    case _                      => 0
  }

  private def ev(flt: Filter, f: Feature): Boolean = flt match {
    case EqualTo(a, v)            => cmp(fieldVal(a, f), v) == 0
    case GreaterThan(a, v)        => cmp(fieldVal(a, f), v) > 0
    case GreaterThanOrEqual(a, v) => cmp(fieldVal(a, f), v) >= 0
    case LessThan(a, v)           => cmp(fieldVal(a, f), v) < 0
    case LessThanOrEqual(a, v)    => cmp(fieldVal(a, f), v) <= 0
    case In(a, vs)                => vs.exists(v => cmp(fieldVal(a, f), v) == 0)
    case IsNotNull(a)             => fieldVal(a, f) != null
    case IsNull(a)                => fieldVal(a, f) == null
    case And(l, r)                => ev(l, f) && ev(r, f)
    case Or(l, r)                 => ev(l, f) || ev(r, f)
    case Not(c)                   => !ev(c, f)
    case _                        => true // unknown → let Spark recheck
  }

  private var current: Feature = _
  private var emitted          = 0

  override def next(): Boolean = {
    if (limit >= 0 && emitted >= limit) return false // early termination
    while (features.hasNext) {
      val f = features.next()
      if (matches(f)) { current = f; emitted += 1; return true }
    }
    false
  }

  override def get(): InternalRow = {
    val values = required.fields.map { sf =>
      sf.name match {
        case "properties" =>
          ArrayBasedMapData(
            current.props.keys.map(k => UTF8String.fromString(k)).toArray,
            current.props.values.map(v => UTF8String.fromString(v)).toArray)
        case "geometry"  => UTF8String.fromString(current.wkt)
        case "geom_type" => UTF8String.fromString(current.geomType)
        case other =>
          fieldVal(other, current) match {
            case s: String => UTF8String.fromString(s)
            case x         => x
          }
      }
    }
    InternalRow.fromSeq(values.toIndexedSeq)
  }

  override def close(): Unit = ()
}
