package graft.etl

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Paths}

/** The NHS Digital publication-catalog scanner (reference
  * src/utils/scrape_util.py): publications contain pages, pages contain
  * file links, file links point at files. All parsing is pure functions
  * over page text, so the catalog logic unit-tests offline; only
  * [[fetch]]/[[saveFile]] touch the network/disk (driver-side — source
  * discovery feeds file paths into `spark.read`, it is not a cluster op).
  */
object Catalog {

  final case class FileLink(url: String, period: Option[String], ext: String)

  /** Slice out the element with the given id — from its `id="…"` marker to
    * the next id-carrying element (or end of document). A targeted scanner,
    * not a general HTML parser: the NHSD pages this consumes key every
    * section by div id (scrape_util.py:33, :41, :65). */
  private[etl] def sectionById(html: String, id: String): Option[String] = {
    val marker = s"""id="$id""""
    val start = html.indexOf(marker)
    if (start < 0) None
    else {
      val rest = html.substring(start + marker.length)
      val next = rest.indexOf(" id=\"")
      Some(if (next < 0) rest else rest.substring(0, next))
    }
  }

  private val anchorRe = """(?s)<a\s[^>]*?href="([^"]*)"[^>]*>""".r
  private val classRe = """class="([^"]*)"""".r

  private[etl] def anchors(section: String): Seq[(String, String)] =
    anchorRe.findAllMatchIn(section).map { m =>
      val cls = classRe.findFirstMatchIn(m.matched).map(_.group(1)).getOrElse("")
      (m.group(1), cls)
    }.toSeq

  /** Publication page → page hrefs: the latest-statistics link first, then
    * past publications filtered to class cta__button, trimmed to n
    * (reference scrape_util.py:18-53; n=1 → latest only). */
  def parsePages(html: String, n: Option[Int] = None): Seq[String] = {
    val latest = sectionById(html, "latest-statistics")
      .flatMap(s => anchors(s).headOption).map(_._1).toSeq
    if (n.contains(1)) latest
    else {
      val past = sectionById(html, "past-publications").toSeq
        .flatMap(anchors).filter(_._2.contains("cta__button")).map(_._1)
      latest ++ (n match {
        case Some(k) => past.take(k - 1)
        case None => past
      })
    }
  }

  /** Resources section → file-id map: filename = last path segment with
    * %20/%2C decoded; `id,period.ext` when a period is present, `id.ext`
    * otherwise (reference scrape_util.py:56-93). Later duplicate ids win,
    * matching the reference's dict overwrite. */
  def parseFileLinks(html: String): Map[String, FileLink] = {
    val section = sectionById(html, "resources").getOrElse("")
    anchors(section).map(_._1).filter(_.nonEmpty).flatMap { href =>
      val filename = href.split("/").last.replace("%20", " ").replace("%2C", ",")
      val lastComma = filename.lastIndexOf(',')
      if (lastComma >= 0) {
        val (id, periodExt) = (filename.substring(0, lastComma), filename.substring(lastComma + 1))
        periodExt.split('.') match {
          case Array(period, ext, _*) => Some(id -> FileLink(href, Some(period), ext))
          case _ => None
        }
      } else filename.split('.') match {
        case Array(id, ext, _*) => Some(id -> FileLink(href, None, ext))
        case _ => None
      }
    }.toMap
  }

  /** Exactly-one-match file resolution (reference src/main.py:52-63): each
    * target id must select exactly ONE file id from the page's links —
    * zero matches warns and skips, multiple matches warns and skips (the
    * reference deliberately refuses to guess). Returns the resolved ids
    * and the warnings, so orchestration stays a pure, testable function. */
  def resolveTargetFiles(
      links: Map[String, FileLink],
      targetIds: Seq[String],
      publication: String): (Seq[String], Seq[String]) = {
    val (ids, warns) = targetIds.map { targetId =>
      links.keys.filter(_.contains(targetId)).toSeq match {
        case Seq(one) => (Some(one), None)
        case Seq() =>
          (None, Some(s"Warning: No files were found for the $publication publication."))
        case _ =>
          (None, Some(s"Warning: Multiple files were found for the $publication " +
            "publication. These files won't be processed."))
      }
    }.unzip
    (ids.flatten, warns.flatten)
  }

  /** Resolve a possibly-relative href against the page it came from (NHSD
    * pages emit site-relative links); garbage hrefs resolve to None rather
    * than aborting the scrape. */
  private[etl] def resolveHref(base: String, href: String): Option[String] =
    scala.util.Try(URI.create(base).resolve(href).toString).toOption

  /** The scrape orchestrator (reference src/main.py:19-71): publication
    * page → first page whose url contains each target key → file links →
    * [[resolveTargetFiles]] → download each resolved file into the staging
    * dir as `<id>.xlsx`. Hrefs are resolved against the page they came
    * from (pages are typically site-relative); a target key matching no
    * page, and any unresolvable/failed URL, warns and skips — one bad
    * publication never aborts the batch. `fetchFn` is injectable so the
    * whole composition unit-tests offline; warnings go to stderr like the
    * reference's print(). Returns the staged filenames. */
  def scrapeLatestData(
      publicationUrl: String,
      targets: Seq[(String, Seq[String])] = Seq(
        "index" -> Seq("Index"),
        "cancers-diagnosed" -> Seq("adult")),
      destDir: String = "./data",
      fetchFn: String => Option[Array[Byte]] = url => fetch(url),
      warn: String => Unit = System.err.println): Seq[String] = {
    def fetchSafe(url: String): Option[Array[Byte]] =
      scala.util.Try(fetchFn(url)).toOption.flatten.orElse {
        warn(s"Warning: fetch failed for $url."); None
      }
    val pages = fetchSafe(publicationUrl)
      .map(b => parsePages(new String(b, "UTF-8"))).getOrElse(Seq.empty)
    val targetPages = targets.flatMap { case (key, targetIds) =>
      pages.find(_.contains(key)) match {
        case Some(page) => Some((key, targetIds, page))
        case None =>
          warn(s"Warning: No page was found for the $key publication.")
          None
      }
    }
    targetPages.flatMap { case (key, targetIds, page) =>
      resolveHref(publicationUrl, page).toSeq.flatMap { pageUrl =>
        fetchSafe(pageUrl).toSeq.flatMap { bytes =>
          val links = parseFileLinks(new String(bytes, "UTF-8"))
          val (ids, warnings) = resolveTargetFiles(links, targetIds, key)
          warnings.foreach(warn)
          ids.flatMap { id =>
            resolveHref(pageUrl, links(id).url).flatMap(fetchSafe).map { content =>
              val fileName = id + ".xlsx"
              saveFile(content, fileName, destDir)
              fileName
            }
          }
        }
      }
    }
  }

  /** S5 — fetch a file's bytes, status-checked (scrape_util.py:96-112). */
  def fetch(url: String, client: HttpClient = HttpClient.newHttpClient()): Option[Array[Byte]] = {
    val res = client.send(
      HttpRequest.newBuilder(URI.create(url)).GET().build(),
      HttpResponse.BodyHandlers.ofByteArray())
    if (res.statusCode() == 200) Some(res.body()) else None
  }

  /** S6 — save fetched bytes into the staging dir (scrape_util.py:115-123). */
  def saveFile(content: Array[Byte], fileName: String, destDir: String = "./data"): Unit = {
    Files.createDirectories(Paths.get(destDir))
    Files.write(Paths.get(destDir, fileName), content)
  }
}
