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
