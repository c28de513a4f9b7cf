package graft.sources

import java.util.{Map => JMap}

import scala.collection.JavaConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.etl.Xlsx

/** DataSource V2 exposure of the dependency-free [[graft.etl.Xlsx]] parser:
  * `spark.read.format("xlsx").option("sheet", "Table 5").load(path)` — the
  * idiomatic Spark surface for the reference's `pd.read_excel(sheet,
  * skiprows=N)` scan (reference src/main.py:112-113), replacing the
  * imperative stage-to-CSV hop with a planned scan that Catalyst prunes
  * like any other source.
  *
  * Options: `sheet` (default: first sheet), `skipRows` (preamble lines
  * before the header, default 0), `header` (default true: first
  * non-skipped row names the columns; false → _c0.._cN). All columns are
  * StringType — a spreadsheet cell has no reliable type, so typing is a
  * declarative `cast` in the plan, where Catalyst folds it into the same
  * codegen stage as the scan (the CSV staging path keeps the
  * schema-at-parse alternative).
  *
  * Scale shape: a worksheet is ONE deflate stream inside the zip — not
  * splittable — so the honest partitioning is one InputPartition per
  * workbook file, with parallelism across FILES (load a directory of
  * workbooks; the NHS publication is many small workbooks, reference
  * docs/: one file per release). Column pruning is pushed into the reader
  * ([[XlsxScanBuilder]] implements SupportsPushDownRequiredColumns): a
  * `select(2 cols)` of a 40-column sheet materializes 2 strings per row,
  * and `.explain` shows ReadSchema with exactly those columns.
  */
class XlsxDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "xlsx"
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    XlsxDataSource.headerSchema(XlsxDataSource.conf(options))

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: JMap[String, String]): Table = {
    require(schema.fields.forall(_.dataType == StringType),
      "xlsx source reads STRING columns only — cast downstream in the plan")
    XlsxTable(schema, XlsxDataSource.conf(new CaseInsensitiveStringMap(properties)))
  }
}

object XlsxDataSource {
  /** Reader configuration, fully serializable. */
  final case class Conf(files: Seq[String], sheet: String, skipRows: Int, header: Boolean)

  private[sources] def conf(options: CaseInsensitiveStringMap): Conf = {
    val path = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("xlsx source requires a path"))
    val p = java.nio.file.Paths.get(path)
    val files =
      if (java.nio.file.Files.isDirectory(p))
        java.nio.file.Files.list(p).iterator().asScala
          .map(_.toString).filter(_.toLowerCase.endsWith(".xlsx")).toSeq.sorted
      else Seq(path)
    require(files.nonEmpty, s"no .xlsx files under $path")
    val sheet = Option(options.get("sheet")).getOrElse(Xlsx.sheetNames(files.head).head)
    Conf(files, sheet, options.getInt("skipRows", 0), options.getBoolean("header", true))
  }

  private[sources] def headerSchema(c: Conf): StructType = {
    val rows = Xlsx.readSheet(c.files.head, c.sheet).drop(c.skipRows)
    require(rows.nonEmpty, s"sheet '${c.sheet}' has no rows after skipRows=${c.skipRows}")
    val width = rows.map(_.size).max
    val names =
      if (c.header)
        rows.head.padTo(width, None).zipWithIndex.map {
          case (Some(n), _) if n.nonEmpty => n
          case (_, i) => s"_c$i"
        }
      else (0 until width).map(i => s"_c$i")
    StructType(names.map(StructField(_, StringType, nullable = true)))
  }
}

case class XlsxTable(tableSchema: StructType, conf: XlsxDataSource.Conf)
  extends Table with SupportsRead {
  override def schema(): StructType = tableSchema
  override def name(): String = s"xlsx:${conf.files.mkString(",")}#${conf.sheet}"
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    XlsxScanBuilder(tableSchema, conf)
}

case class XlsxScanBuilder(full: StructType, conf: XlsxDataSource.Conf)
  extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = full
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def build(): Scan = XlsxScan(full, required, conf)
}

case class XlsxScan(full: StructType, required: StructType, conf: XlsxDataSource.Conf)
  extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  // one worksheet = one deflate stream: the file is the parallelism unit
  override def planInputPartitions(): Array[InputPartition] =
    conf.files.map(f => XlsxInputPartition(f): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    XlsxReaderFactory(
      conf.sheet, conf.skipRows, conf.header,
      full.fieldNames, required.fieldNames)
}

case class XlsxInputPartition(file: String) extends InputPartition

case class XlsxReaderFactory(
    sheet: String, skipRows: Int, header: Boolean,
    fullNames: Array[String], requiredNames: Array[String])
  extends PartitionReaderFactory {

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val file = p.asInstanceOf[XlsxInputPartition].file
    val body = Xlsx.readSheet(file, sheet).drop(skipRows).drop(if (header) 1 else 0)
    // pruning pushdown: only the required columns' cell positions are read
    val idx = requiredNames.map(n => fullNames.indexOf(n))
    val it = body.iterator
    new PartitionReader[InternalRow] {
      private var row: InternalRow = _
      override def next(): Boolean = {
        if (!it.hasNext) return false
        val cells = it.next()
        val out = new GenericInternalRow(idx.length)
        var i = 0
        while (i < idx.length) {
          val v = if (idx(i) >= 0 && idx(i) < cells.size) cells(idx(i)) else None
          out.update(i, v.map(UTF8String.fromString).orNull)
          i += 1
        }
        row = out
        true
      }
      override def get(): InternalRow = row
      override def close(): Unit = ()
    }
  }
}
