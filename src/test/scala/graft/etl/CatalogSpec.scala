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

  test("resolveTargetFiles: exactly-one-match guard — 0 and many warn and skip") {
    val links = Map(
      "Index file" -> Catalog.FileLink("u1", None, "xlsx"),
      "adult data" -> Catalog.FileLink("u2", None, "xlsx"),
      "adult extra" -> Catalog.FileLink("u3", None, "xlsx"))
    // exactly one
    val (one, w1) = Catalog.resolveTargetFiles(links, Seq("Index"), "index")
    assert(one === Seq("Index file") && w1.isEmpty)
    // zero matches → warn, skip
    val (none, w2) = Catalog.resolveTargetFiles(links, Seq("child"), "index")
    assert(none.isEmpty && w2 === Seq("Warning: No files were found for the index publication."))
    // multiple matches → warn, skip (the reference refuses to guess)
    val (many, w3) = Catalog.resolveTargetFiles(links, Seq("adult"), "cancers-diagnosed")
    assert(many.isEmpty && w3.head.startsWith("Warning: Multiple files were found"))
  }

  test("scrapeLatestData: offline composition — pages → links → resolve → staged files") {
    val dir = java.nio.file.Files.createTempDirectory("graft-scrape").toString
    val indexPage =
      """<div id="resources">
        |  <a href="https://f/Index%20file.xlsx">x</a>
        |</div>""".stripMargin
    val diagPage =
      """<div id="resources">
        |  <a href="https://f/adult%20a.xlsx">x</a>
        |  <a href="https://f/adult%20b.xlsx">x</a>
        |</div>""".stripMargin
    val site = Map(
      "PUB" ->
        """<div id="latest-statistics"><a href="/p/index-2023">l</a></div>
          |<div id="past-publications">
          |  <a class="cta__button" href="/p/cancers-diagnosed-2023">p</a>
          |</div>""".stripMargin.getBytes("UTF-8"),
      "/p/index-2023" -> indexPage.getBytes("UTF-8"),
      "/p/cancers-diagnosed-2023" -> diagPage.getBytes("UTF-8"),
      "https://f/Index%20file.xlsx" -> "bytes!".getBytes("UTF-8"))
    val warnings = scala.collection.mutable.Buffer[String]()
    val staged = Catalog.scrapeLatestData(
      "PUB", destDir = dir, fetchFn = site.get, warn = warnings += _)
    // index target resolves to its single file and stages it
    assert(staged === Seq("Index file.xlsx"))
    assert(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "Index file.xlsx")) sameElements "bytes!".getBytes)
    // the two-adult-file page warned and staged nothing
    assert(warnings.exists(_.startsWith("Warning: Multiple files")))
  }

  test("resolveHref: relative hrefs resolve against the page URL; garbage → None") {
    assert(Catalog.resolveHref("https://digital.nhs.uk/pubs/survival", "/p/index-2023")
      === Some("https://digital.nhs.uk/p/index-2023"))
    assert(Catalog.resolveHref("https://digital.nhs.uk/pubs/survival",
      "https://files.nhs.uk/x/a.xlsx") === Some("https://files.nhs.uk/x/a.xlsx"))
    assert(Catalog.resolveHref("https://digital.nhs.uk", "ht tp://bad url") === None)
  }

  test("scrapeLatestData: target key with no matching page warns and skips") {
    val site = Map(
      "https://x/pub" ->
        """<div id="latest-statistics"><a href="/p/index-2023">l</a></div>""".getBytes("UTF-8"),
      "https://x/p/index-2023" ->
        """<div id="resources"><a href="https://f/Index.xlsx">x</a></div>""".getBytes("UTF-8"),
      "https://f/Index.xlsx" -> "b".getBytes("UTF-8"))
    val warnings = scala.collection.mutable.Buffer[String]()
    val dir = java.nio.file.Files.createTempDirectory("graft-scrape-miss").toString
    val staged = Catalog.scrapeLatestData(
      "https://x/pub",
      targets = Seq("index" -> Seq("Index"), "renamed-slug" -> Seq("adult")),
      destDir = dir, fetchFn = site.get, warn = warnings += _)
    // relative page href resolved against the publication URL; index staged
    assert(staged === Seq("Index.xlsx"))
    // the missing publication is diagnosed, not silently dropped
    assert(warnings.exists(_.contains("No page was found for the renamed-slug")))
  }

  test("scrapeLatestData: path-relative file hrefs resolve against the target page, not the publication") {
    val site = Map(
      "https://x/pub" ->
        """<div id="latest-statistics"><a href="/p/index-2023">l</a></div>""".getBytes("UTF-8"),
      "https://x/p/index-2023" ->
        """<div id="resources"><a href="files/Index.xlsx">x</a></div>""".getBytes("UTF-8"),
      // correct resolution: relative to https://x/p/index-2023 → /p/files/…
      "https://x/p/files/Index.xlsx" -> "b".getBytes("UTF-8"))
    val dir = java.nio.file.Files.createTempDirectory("graft-scrape-rel").toString
    val staged = Catalog.scrapeLatestData(
      "https://x/pub", targets = Seq("index" -> Seq("Index")),
      destDir = dir, fetchFn = site.get, warn = _ => ())
    assert(staged === Seq("Index.xlsx"))
  }

  test("saveFile writes staged bytes (S6)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stage").toString
    Catalog.saveFile("abc".getBytes, "f.bin", dir)
    assert(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(dir, "f.bin"))
      sameElements "abc".getBytes)
  }
}
