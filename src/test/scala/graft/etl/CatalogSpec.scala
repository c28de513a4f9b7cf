package graft.etl

import org.scalatest.funsuite.AnyFunSuite

class CatalogSpec extends AnyFunSuite {

  private val pubHtml =
    """<html><body>
      |<div id="latest-statistics"><a href="/pub/latest-2023">Latest</a></div>
      |<div id="past-publications">
      |  <a class="cta__button" href="/pub/2022">2022</a>
      |  <a class="other" href="/pub/ignore-me">nav</a>
      |  <a class="cta__button" href="/pub/2021">2021</a>
      |</div>
      |<div id="footer"><a href="/nowhere">x</a></div>
      |</body></html>""".stripMargin

  test("parsePages: latest first, past filtered to cta__button, nav links ignored (S3)") {
    assert(Catalog.parsePages(pubHtml) === Seq("/pub/latest-2023", "/pub/2022", "/pub/2021"))
    assert(Catalog.parsePages(pubHtml, Some(1)) === Seq("/pub/latest-2023"))
    assert(Catalog.parsePages(pubHtml, Some(2)) === Seq("/pub/latest-2023", "/pub/2022"))
  }

  private val pageHtml =
    """<div id="resources">
      |  <a href="https://files.nhs.uk/x/Index%20file%2C%202017_2021.xlsx">data</a>
      |  <a href="https://files.nhs.uk/x/notes.pdf">notes</a>
      |  <a href="">placeholder</a>
      |</div>
      |<div id="other"><a href="https://x/else.csv">no</a></div>""".stripMargin

  test("parseFileLinks: %-decoding, comma-split period, extension; no-period fallback (S4)") {
    val links = Catalog.parseFileLinks(pageHtml)
    assert(links.keySet === Set("Index file", "notes"))
    assert(links("Index file") ===
      Catalog.FileLink("https://files.nhs.uk/x/Index%20file%2C%202017_2021.xlsx",
        Some(" 2017_2021"), "xlsx"))
    assert(links("notes") ===
      Catalog.FileLink("https://files.nhs.uk/x/notes.pdf", None, "pdf"))
  }

  test("saveFile writes staged bytes (S6)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stage").toString
    Catalog.saveFile("abc".getBytes, "f.bin", dir)
    assert(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(dir, "f.bin"))
      sameElements "abc".getBytes)
  }
}
