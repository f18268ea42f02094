package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/**
 * Ingestion of extracted document tables (the reference's PDF-table pipeline,
 * ref: datafeeds/pdf_table_extractor.py:34-715). A dependency-free text-layer
 * extractor ships in `PdfTextExtractor` (`ingestPdf` runs it end-to-end);
 * richer engines (pdfbox/tabula-java) plug into the same `ExtractedTable`
 * seam. Everything after extraction is real Spark logic:
 *
 *  - header-continuation stitching across pages
 *    (ref: pdf_table_extractor.py:150-167);
 *  - detail-vs-summary classification (ref: :294-345);
 *  - cleaning: drop empty rows/columns, trim cells, null→"" (ref: :388-419);
 *  - combining page tables on the union of columns (ref: :421-509) →
 *    `unionByName(allowMissingColumns = true)`.
 */
object TableIngest {

  /** One extracted table: header row + string cell grid (page order kept). */
  final case class ExtractedTable(page: Int, header: Seq[String], rows: Seq[Seq[String]])

  /**
   * Multi-page header continuation: a table whose header row looks like data
   * (no alphabetic header tokens) inherits the previous page's header
   * (ref: pdf_table_extractor.py:150-167).
   */
  def stitchContinuations(tables: Seq[ExtractedTable]): Seq[ExtractedTable] = {
    def numericish(c: String): Boolean =
      c != null && c.nonEmpty && c.exists(_.isDigit) &&
        c.forall(ch => ch.isDigit || ".,-/ $%".contains(ch))
    // headers are made of words; a "header" containing any numeric-looking
    // cell is really the first data row of a continuation page
    def looksLikeHeader(cells: Seq[String]): Boolean =
      cells.exists(c => c != null && c.exists(_.isLetter)) && !cells.exists(numericish)
    val out = collection.mutable.ArrayBuffer.empty[ExtractedTable]
    var lastHeader: Option[Seq[String]] = None
    tables.foreach { t =>
      if (looksLikeHeader(t.header)) { lastHeader = Some(t.header); out += t }
      else lastHeader match {
        case Some(h) if h.length == t.header.length =>
          // header row was actually data — keep it as the first data row
          out += ExtractedTable(t.page, h, t.header +: t.rows)
        case _ => out += t
      }
    }
    out.toSeq
  }

  /** Detail tables have ≥ minCols columns and ≥ minRows data rows; summary
    * blocks (page totals etc.) are dropped (ref: pdf_table_extractor.py:294-345). */
  def isDetailTable(t: ExtractedTable, minCols: Int = 3, minRows: Int = 2): Boolean =
    t.header.length >= minCols && t.rows.length >= minRows

  /** To a DataFrame of string columns (empty header cells become col_i). */
  def toDataFrame(spark: SparkSession, t: ExtractedTable): DataFrame = {
    val names = t.header.zipWithIndex.map { case (h, i) =>
      val n = Option(h).map(_.trim).getOrElse("")
      if (n.isEmpty) s"col_$i" else n
    }
    val schema = StructType(names.map(StructField(_, StringType, nullable = true)))
    val rows = t.rows.map(r => Row.fromSeq(
      r.padTo(names.length, null).take(names.length)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows.toList), schema)
  }

  /**
   * Clean: trim all cells, empty→null, drop rows that are entirely null and
   * columns that are entirely null (ref: pdf_table_extractor.py:388-419).
   */
  def cleanDataFrame(df: DataFrame): DataFrame = {
    val trimmed = df.select(df.columns.toIndexedSeq.map(c =>
      when(trim(col(c).cast("string")) === "", lit(null))
        .otherwise(trim(col(c).cast("string"))).as(c)): _*)
    val anyNotNull = df.columns.map(c => col(c).isNotNull).reduce(_ || _)
    val noEmptyRows = trimmed.filter(anyNotNull)
    // drop all-null columns (computed in ONE aggregate pass, not per column)
    val counts = noEmptyRows.agg(
      count(lit(1)).as("__n"),
      df.columns.map(c => count(col(c)).as(s"__c_$c")).toSeq: _*).head()
    val keep = df.columns.filter(c => counts.getAs[Long](s"__c_$c") > 0)
    noEmptyRows.select(keep.map(col).toSeq: _*)
  }

  /** Combine page tables on the union of their columns
    * (ref: pdf_table_extractor.py:421-509). */
  def combineTables(dfs: Seq[DataFrame]): DataFrame =
    dfs.reduce(_.unionByName(_, allowMissingColumns = true))

  /** Full post-extraction pipeline for one document's page tables. */
  def ingest(spark: SparkSession, raw: Seq[ExtractedTable]): DataFrame = {
    val detail = stitchContinuations(raw).filter(isDetailTable(_))
    require(detail.nonEmpty, "no detail tables found")
    cleanDataFrame(combineTables(detail.map(toDataFrame(spark, _))))
  }

  /** End-to-end: text-layer PDF → positioned words → clustered page tables →
    * stitch/classify/clean/combine (see `PdfTextExtractor` for the supported
    * PDF subset; other extractors plug into `ingest` via `ExtractedTable`). */
  def ingestPdf(spark: SparkSession, path: String): DataFrame =
    ingest(spark, PdfTextExtractor.extractTables(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))))
}
