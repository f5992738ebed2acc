package graft.functions

import java.util.Locale

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Name/slug scalar functions — the reference's sanitize/naming helpers
  * re-expressed twice: as pure Scala (driver-side naming decisions, tests)
  * and as codegen-friendly Column chains built only from
  * `org.apache.spark.sql.functions` (no UDFs → whole-stage codegen keeps
  * working and the expressions are DuckDB-oracle-expressible).
  *
  * Reference semantics (code, not its drifted unit tests):
  *  - slugify                 — etl/utils/sanitize.py:5-13
  *  - sanitizeForFilename     — etl/utils/naming.py:20-22
  *  - sanitizeForArcgisName   — etl/utils/naming.py:25-32 (limit :13)
  *  - generateFcName          — etl/utils/naming.py:35-57
  *  - sanitizeSdeName         — etl/utils/naming.py:60-96
  *  - ensureUniqueName        — etl/utils/gdb_utils.py:17-106
  *
  * Note on `\w`: the reference runs Python 3 where `\w` is Unicode-aware;
  * Java regex needs the embedded `(?U)` flag for the same behavior.
  */
object Naming {

  final val ArcgisMaxLen = 128
  private final val SwedishFrom = "åäöÅÄÖ"
  private final val SwedishTo   = "aaoAAO"

  private def translateSwedish(s: String): String =
    s.map { c =>
      val i = SwedishFrom.indexOf(c.toInt)
      if (i >= 0) SwedishTo(i) else c
    }

  /** ascii-safe, lower-case, underscore-joined identifier (hyphens kept). */
  def slugify(text: String): String = {
    val t         = translateSwedish(text).toLowerCase(Locale.ROOT)
    val repl      = t.replaceAll("(?U)[^\\w\\-]+", "_")
    val collapsed = repl.replaceAll("__+", "_")
    val stripped  = collapsed.replaceAll("^_+|_+$", "")
    if (stripped.isEmpty) "unnamed" else stripped
  }

  /** Lower-case ASCII-safe slug for file names (hyphens fine on disk). */
  def sanitizeForFilename(name: String): String = slugify(name)

  /** FGDB-safe identifier: letters/digits/underscore, ≤128 chars. */
  def sanitizeForArcgisName(name: String): String = {
    var txt = slugify(name).replace('-', '_')
    txt = txt.replaceAll("[^A-Za-z0-9_]", "_")
    txt = txt.replaceAll("__+", "_").replaceAll("^_+|_+$", "")
    if (txt.nonEmpty && txt.head.isDigit) txt = "_" + txt
    val out = if (txt.isEmpty) "unnamed" else txt
    out.take(ArcgisMaxLen)
  }

  /** `{authority.lower}_{sanitized}` with idempotent prefix, ≤128, no trailing `_`. */
  def generateFcName(authority: String, source: String): String = {
    val authLower   = authority.toLowerCase(Locale.ROOT)
    val sourceClean = sanitizeForArcgisName(source)
    val prefixed =
      if (sourceClean.toLowerCase(Locale.ROOT).startsWith(authLower + "_")) sourceClean
      else s"${authLower}_$sourceClean"
    prefixed.take(ArcgisMaxLen).replaceAll("_+$", "")
  }

  /** SDE-safe name: keeps case, translates only lower-case åäö, `fc_` digit guard. */
  def sanitizeSdeName(name: String): String = {
    var n = name.replaceAll("[-\\s\\.]+", "_")
    n = n.map {
      case 'å' => 'a'
      case 'ä' => 'a'
      case 'ö' => 'o'
      case c   => c
    }
    n = n.replaceAll("(?U)[^\\w]", "_")
    n = n.replaceAll("_{2,}", "_").replaceAll("^_+|_+$", "")
    if (n.nonEmpty && n.head.isDigit) n = "fc_" + n
    if (n.isEmpty) "unnamed_fc" else n
  }

  /** Case-insensitive uniqueness with `_1.._9999` suffixes within maxLength.
    * Order-dependent (mirrors gdb_utils.py:78-99); driver-side by design —
    * naming happens at plan-build time over a handful of tables, never on
    * the data path.
    */
  def ensureUniqueName(
      baseName: String,
      usedNames: scala.collection.mutable.Set[String],
      maxLength: Int = ArcgisMaxLen): String = {
    val sanitized = sanitizeSdeName(baseName)
    val candidate = sanitized.take(maxLength)
    if (candidate.isEmpty)
      throw new IllegalArgumentException(
        s"Base name '$baseName' resulted in empty string after sanitization")
    var finalCandidate = candidate
    var idx            = 1
    val lowerUsed      = scala.collection.mutable.Set(usedNames.map(_.toLowerCase(Locale.ROOT)).toSeq: _*)
    while (lowerUsed.contains(finalCandidate.toLowerCase(Locale.ROOT))) {
      val suffix          = s"_$idx"
      val availableLength = maxLength - suffix.length
      if (availableLength <= 0)
        throw new IllegalArgumentException(
          s"Cannot generate unique name for '$baseName' within $maxLength characters")
      finalCandidate = candidate.take(availableLength) + suffix
      idx += 1
      if (idx > 9999)
        throw new IllegalArgumentException(
          s"Could not find unique name for '$baseName' after ${idx - 1} attempts")
    }
    usedNames.add(finalCandidate)
    finalCandidate
  }

  // --------------------------------------------------------------------------
  // Column (codegen) versions — pure functions._ chains, no UDFs.
  // --------------------------------------------------------------------------

  /** slugify as a Column chain; null in → null out. */
  def slugifyCol(c: Column): Column = {
    val t         = lower(translate(c, SwedishFrom, SwedishTo))
    val repl      = regexp_replace(t, "(?U)[^\\w\\-]+", "_")
    val collapsed = regexp_replace(repl, "__+", "_")
    val stripped  = regexp_replace(collapsed, "^_+|_+$", "")
    when(length(stripped) === 0, lit("unnamed")).otherwise(stripped)
  }

  def sanitizeForArcgisNameCol(c: Column): Column = {
    val s         = slugifyCol(c)
    val hyph      = regexp_replace(s, "-", "_")
    val ascii     = regexp_replace(hyph, "[^A-Za-z0-9_]", "_")
    val collapsed = regexp_replace(regexp_replace(ascii, "__+", "_"), "^_+|_+$", "")
    val guarded = when(collapsed.rlike("^[0-9]"), concat(lit("_"), collapsed))
      .otherwise(collapsed)
    val nonEmpty = when(length(guarded) === 0, lit("unnamed")).otherwise(guarded)
    substring(nonEmpty, 1, ArcgisMaxLen)
  }

  def generateFcNameCol(authority: Column, source: Column): Column = {
    val authLower   = lower(authority)
    val sourceClean = sanitizeForArcgisNameCol(source)
    val prefixed = when(
      lower(sourceClean).startsWith(concat(authLower, lit("_"))),
      sourceClean
    ).otherwise(concat(authLower, lit("_"), sourceClean))
    regexp_replace(substring(prefixed, 1, ArcgisMaxLen), "_+$", "")
  }

  def sanitizeSdeNameCol(c: Column): Column = {
    val dashed    = regexp_replace(c, "[-\\s\\.]+", "_")
    val swedish   = translate(dashed, "åäö", "aao")
    val word      = regexp_replace(swedish, "(?U)[^\\w]", "_")
    val collapsed = regexp_replace(regexp_replace(word, "_{2,}", "_"), "^_+|_+$", "")
    val guarded = when(collapsed.rlike("^[0-9]"), concat(lit("fc_"), collapsed))
      .otherwise(collapsed)
    when(length(guarded) === 0, lit("unnamed_fc")).otherwise(guarded)
  }
}
