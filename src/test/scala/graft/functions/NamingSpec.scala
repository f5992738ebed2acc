package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Golden cases captured by executing the REFERENCE CODE (not its drifted
  * unit tests — e.g. test_utils_naming.py expects "Hello_World" where the
  * code produces "hello_world"). Ground truth from etl/utils/sanitize.py,
  * naming.py run standalone.
  */
class NamingSpec extends SparkSpec {

  /** Deterministic printable-ASCII fuzz corpus (seeded — no flakes). */
  private val fuzz: Seq[String] = {
    val rnd = new scala.util.Random(42)
    Seq.fill(300)(Seq.fill(rnd.nextInt(40))((32 + rnd.nextInt(95)).toChar).mkString)
  }

  val slugCases = Seq(
    "Hello World"      -> "hello_world",
    "Åland Äpplen"     -> "aland_applen",
    "Test@#$Data"      -> "test_data",
    "Hello-World-Test" -> "hello-world-test", // hyphens KEPT by slugify
    "123Test"          -> "123test",
    "Hello___World"    -> "hello_world",
    "_Hello_World_"    -> "hello_world",
    ""                 -> "unnamed",
    "   "              -> "unnamed",
    "!@#$%^&*()"       -> "unnamed",
    "TeSt ÅäÖ DaTa"    -> "test_aao_data",
    "SGU-Berggrund 1:50 000" -> "sgu-berggrund_1_50_000",
    "Naturvårdsverket - Naturvårdsregistret" -> "naturvardsverket_-_naturvardsregistret"
  )

  val arcgisCases = Seq(
    "Hello World"      -> "hello_world",
    "Åland Äpplen"     -> "aland_applen",
    "Hello-World-Test" -> "hello_world_test",
    "123Test"          -> "_123test",
    ""                 -> "unnamed",
    "SGU-Berggrund 1:50 000" -> "sgu_berggrund_1_50_000",
    ("a" * 150)        -> ("a" * 128)
  )

  val sdeCases = Seq(
    "Hello World"   -> "Hello_World",        // keeps case
    "TeSt ÅäÖ DaTa" -> "TeSt_ÅaÖ_DaTa",      // only lower-case åäö translated
    "123abc"        -> "fc_123abc",
    "..."           -> "unnamed_fc",
    "a-b.c d"       -> "a_b_c_d"
  )

  test("slugify golden cases (Scala)") {
    for ((in, want) <- slugCases) assert(Naming.slugify(in) == want, s"slugify($in)")
  }

  test("sanitizeForArcgisName golden cases (Scala)") {
    for ((in, want) <- arcgisCases)
      assert(Naming.sanitizeForArcgisName(in) == want, s"arcgis($in)")
  }

  test("sanitizeSdeName golden cases (Scala)") {
    for ((in, want) <- sdeCases) assert(Naming.sanitizeSdeName(in) == want, s"sde($in)")
  }

  test("generateFcName golden cases (Scala)") {
    assert(Naming.generateFcName("TEST", "Sample Data") == "test_sample_data")
    assert(Naming.generateFcName("RAA", "raa_byggnader_sverige_point") == "raa_byggnader_sverige_point")
    assert(Naming.generateFcName("TEST", "") == "test_unnamed")
    assert(Naming.generateFcName("TEST", "Source___") == "test_source")
    assert(Naming.generateFcName("AUTH123", "Test Data") == "auth123_test_data")
    assert(Naming.generateFcName("NVV", "Naturvårdsområden") == "nvv_naturvardsomraden")
  }

  test("Column versions agree with Scala versions on all golden inputs") {
    import spark.implicits._
    val inputs = (slugCases ++ arcgisCases ++ sdeCases).map(_._1).distinct
    val df = inputs.toDF("s")
    val rows = df.select(
      col("s"),
      Naming.slugifyCol(col("s")).as("slug"),
      Naming.sanitizeForArcgisNameCol(col("s")).as("arc"),
      Naming.sanitizeSdeNameCol(col("s")).as("sde"),
      Naming.generateFcNameCol(lit("TEST"), col("s")).as("fc")
    ).collect()
    for (r <- rows) {
      val in = r.getString(0)
      assert(r.getString(1) == Naming.slugify(in), s"slugifyCol($in)")
      assert(r.getString(2) == Naming.sanitizeForArcgisName(in), s"arcgisCol($in)")
      assert(r.getString(3) == Naming.sanitizeSdeName(in), s"sdeCol($in)")
      assert(r.getString(4) == Naming.generateFcName("TEST", in), s"fcCol($in)")
    }
  }

  test("slugify properties: idempotent, charset-closed, non-empty") {
    for (s <- fuzz) {
      val out = Naming.slugify(s)
      assert(out.nonEmpty, s"empty for ${s.take(40)}")
      assert(Naming.slugify(out) == out, s"not idempotent for ${s.take(40)}")
      assert(out.matches("[a-z0-9_\\-]+"), s"charset for ${s.take(40)} -> $out")
    }
  }

  test("sanitizeForArcgisName properties: ≤128, FGDB charset, no digit start") {
    for (s <- fuzz) {
      val out = Naming.sanitizeForArcgisName(s)
      assert(out.length <= Naming.ArcgisMaxLen)
      assert(out.matches("[A-Za-z0-9_]+"), s"charset for ${s.take(40)} -> $out")
      assert(!out.head.isDigit)
    }
  }

  test("ensureUniqueName suffixes case-insensitively in declaration order") {
    val used = scala.collection.mutable.Set[String]()
    assert(Naming.ensureUniqueName("My FC", used) == "My_FC")
    assert(Naming.ensureUniqueName("my fc", used) == "my_fc_1")
    assert(Naming.ensureUniqueName("MY-FC", used) == "MY_FC_2")
    val long = "x" * 128
    assert(Naming.ensureUniqueName(long, used) == long)
    val suffixed = Naming.ensureUniqueName(long, used)
    assert(suffixed.length == 128 && suffixed.endsWith("_1"))
  }
}
