package graft.util

import java.io.ByteArrayInputStream
import java.nio.file.{Files, Paths}
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.scalatest.funsuite.AnyFunSuite

class LandingSpec extends AnyFunSuite {

  private def tmpDir = Files.createTempDirectory("graft_landing")

  test("land streams once, then serves from cache") {
    val dest  = tmpDir.resolve("sub/file.bin")
    var opens = 0
    def in() = { opens += 1; new ByteArrayInputStream(Array.fill(20000)(7.toByte)) }
    val (_, n1, cached1) = Landing.land(in _, dest)
    assert(n1 == 20000 && !cached1 && opens == 1)
    val (_, n2, cached2) = Landing.land(in _, dest)
    assert(n2 == 20000 && cached2 && opens == 1) // not re-fetched
    assert(Files.size(dest) == 20000)
  }

  test("extractZip unpacks entries and blocks path traversal") {
    val dir = tmpDir
    val zip = dir.resolve("a.zip")
    val zout = new ZipOutputStream(Files.newOutputStream(zip))
    zout.putNextEntry(new ZipEntry("data/alpha.geojson"))
    zout.write("""{"type":"FeatureCollection","features":[]}""".getBytes)
    zout.closeEntry()
    zout.putNextEntry(new ZipEntry("beta.txt"))
    zout.write("hi".getBytes)
    zout.closeEntry()
    zout.close()
    val out = Landing.extractZip(zip, dir.resolve("staging"))
    assert(out.map(_.getFileName.toString).toSet == Set("alpha.geojson", "beta.txt"))

    val evil = dir.resolve("evil.zip")
    val zo2 = new ZipOutputStream(Files.newOutputStream(evil))
    zo2.putNextEntry(new ZipEntry("../escape.txt"))
    zo2.write("x".getBytes)
    zo2.closeEntry()
    zo2.close()
    intercept[IllegalArgumentException] {
      Landing.extractZip(evil, dir.resolve("staging2"))
    }
  }

  test("Content-Disposition parsing: RFC5987, quoted, missing") {
    import Landing.filenameFromContentDisposition
    assert(filenameFromContentDisposition(
      "attachment; filename*=UTF-8''sj%C3%B6ar.gpkg").contains("sjöar.gpkg"))
    assert(filenameFromContentDisposition(
      """attachment; filename="data.zip"""").contains("data.zip"))
    assert(filenameFromContentDisposition("attachment; filename=plain.json").contains("plain.json"))
    assert(filenameFromContentDisposition("attachment").isEmpty)
    assert(filenameFromContentDisposition(null).isEmpty)
  }

  test("stem/ext split and authority-from-path") {
    assert(Landing.stemAndExt("a.geojson") == ("a", "geojson"))
    assert(Landing.stemAndExt("noext") == ("noext", ""))
    assert(Landing.stemAndExt(".hidden") == (".hidden", ""))
    val root = Paths.get("/staging")
    assert(Landing.authorityFromPath(root, Paths.get("/staging/SKS/src/a.json")) == "SKS")
    assert(Landing.authorityFromPath(root, Paths.get("/staging/file.json")) == "UNKNOWN")
  }
}
