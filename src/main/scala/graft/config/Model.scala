package graft.config

/** Config data model mirroring the reference's declarative surface:
  * Source (etl/models.py:42-54 + validated twin etl/config.py:175-217),
  * OutputMapping / MappingSettings (etl/mapping.py:22-51), global config
  * (etl/config.py:21-217). Plain case classes — the "IR" the pipeline
  * driver plans from.
  */
final case class Source(
    name: String,
    authority: String,
    sourceType: String, // file | rest_api | ogc_api | atom_feed | database
    url: String,
    enabled: Boolean = true,
    stagedDataType: Option[String] = None, // gpkg | geojson | shapefile_collection
    downloadFormat: Option[String] = None,
    include: Seq[String] = Seq.empty,
    raw: Map[String, Any] = Map.empty,
    timeoutSeconds: Int = 30,
    retryAttempts: Int = 3,
    priority: Int = 50,
    tags: Seq[String] = Seq.empty) {
  require(name.nonEmpty, "source name cannot be empty")
  require(authority.nonEmpty, "source authority cannot be empty")
  require(Source.ValidTypes.contains(sourceType),
    s"invalid source type '$sourceType' (valid: ${Source.ValidTypes.mkString(", ")})")
  require(priority >= 1 && priority <= 100, "priority must be 1-100")

  /** include-list entries: semicolon-split like models.py:17-32. */
  def includeStems: Seq[String] =
    include.flatMap(_.split(";")).map(_.trim).filter(_.nonEmpty)
}

object Source {
  val ValidTypes: Set[String] =
    Set("file", "rest_api", "ogc_api", "atom_feed", "database")
}

final case class OutputMapping(
    stagingFc: String,
    sdeFc: String,
    sdeDataset: String,
    description: Option[String] = None,
    enabled: Boolean = true,
    schema: Option[String] = None) {
  require(stagingFc.trim.nonEmpty, "staging_fc cannot be empty")
  require(sdeFc.trim.nonEmpty, "sde_fc cannot be empty")
  require(sdeDataset.trim.nonEmpty, "sde_dataset cannot be empty")
}

final case class MappingSettings(
    defaultSchema: String = "GNG",
    defaultDatasetPattern: String = "Underlag_{authority}",
    defaultFcPattern: String = "{authority}_{source_name}",
    validateDatasets: Boolean = true,
    createMissingDatasets: Boolean = true,
    skipUnmappableSources: Boolean = false)

final case class GlobalConfig(
    sdeSchema: String = "GNG",
    sdeLoadStrategy: String = "truncate_and_load", // | replace | append
    geoprocessingEnabled: Boolean = true,
    targetSrid: Int = 3010,
    aoi: Option[(Double, Double, Double, Double)] = None,
    /** exact clip boundary (`geoprocessing.aoi_wkt`, a POLYGON WKT —
      * the reference clips to the municipality polygon itself,
      * geoprocess.py:63-98); when set it SUPERSEDES `aoi`, whose bbox
      * remains the scan-pushable prefilter shape.
      */
    aoiWkt: Option[String] = None,
    sdeAuthorityMapping: Map[String, String] = Map("LSTD" -> "GNG.Underlag_LstD"),
    continueOnFailure: Boolean = true,
    /** schemas are inferred on first load, then pinned: re-staging the
      * same table with different columns/types is an error, not a silent
      * rewrite (the reference's validation intent, config.py:104-116).
      */
    pinSchemas: Boolean = true,
    /** landing root for downloaded/extracted archives (config.py:69
      * PathsConfig.download); None → a per-source dir under the system
      * temp dir.
      */
    downloadDir: Option[String] = None,
    /** A5 preflight (config.yaml:87-88 monitoring.health_checks.enabled):
      * when on, [[graft.util.Health]]'s default checks run before
      * staging and land in the ledger as `health` rows; an unhealthy
      * overall status aborts the run unless `continueOnFailure`.
      */
    healthChecksEnabled: Boolean = false)
