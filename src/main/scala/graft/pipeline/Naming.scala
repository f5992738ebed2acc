package graft.pipeline

import graft.config.{GlobalConfig, MappingSettings, OutputMapping, Source}
import graft.functions.{Naming => Names}

/** Staging→SDE name resolution (K6/K7).
  */
object SdeNaming {

  /** `_get_sde_names` (pipeline.py:747-770): `SKS_naturvarden_point` →
    * ("GNG.Underlag_SKS", "naturvarden_point"); no underscore → MISC;
    * authority overrides (config.yaml:159-160, e.g. LSTD → LstD).
    */
  def sdeNames(fcName: String, cfg: GlobalConfig): (String, String) = {
    val (suffix, fcClean) = fcName.split("_", 2) match {
      case Array(only)     => ("MISC", only.toLowerCase)
      case Array(a, rest)  => (a, rest.toLowerCase)
    }
    val dataset = cfg.sdeAuthorityMapping.collectFirst {
      case (k, v) if k.equalsIgnoreCase(suffix) => v
    }.getOrElse(s"${cfg.sdeSchema}.Underlag_$suffix")
    (dataset, fcClean)
  }
}

/** Mapping overlay (etl/mapping.py:128-203): exact key match, then
  * case-insensitive substring partial match (either direction), then the
  * pattern default.
  */
final class MappingManager(
    mappings: Seq[OutputMapping],
    settings: MappingSettings = MappingSettings()) {

  private val byKey = mappings.map(m => m.stagingFc -> m).toMap

  def resolve(source: Source, stagingFc: String): OutputMapping =
    byKey.get(stagingFc)
      .orElse(byKey.collectFirst {
        case (k, m)
            if stagingFc.toLowerCase.contains(k.toLowerCase) ||
              k.toLowerCase.contains(stagingFc.toLowerCase) => m
      })
      .getOrElse(defaultMapping(source, stagingFc))

  private def defaultMapping(source: Source, stagingFc: String): OutputMapping = {
    def fill(pattern: String): String = pattern
      .replace("{authority}", source.authority)
      .replace("{source_name}", Names.sanitizeForArcgisName(source.name))
      .replace("{staging_fc}", stagingFc)
    OutputMapping(
      stagingFc = stagingFc,
      sdeFc = Names.sanitizeForArcgisName(fill(settings.defaultFcPattern)),
      sdeDataset = Names.sanitizeForArcgisName(fill(settings.defaultDatasetPattern)),
      description = Some(s"Auto-generated mapping for ${source.name}"),
      schema = Some(settings.defaultSchema))
  }
}
