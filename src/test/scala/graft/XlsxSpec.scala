package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.reports.{DatafeedRunner, XlsxWriter}
import graft.meta.MetaStore

class XlsxSpec extends AnyFunSuite with SparkSpec {

  private def zipEntries(path: String): Map[String, String] = {
    val zf = new java.util.zip.ZipFile(path)
    try {
      import scala.jdk.CollectionConverters._
      zf.entries().asScala.map { e =>
        e.getName -> new String(zf.getInputStream(e).readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8)
      }.toMap
    } finally zf.close()
  }

  test("xlsx writer emits a valid minimal package with typed cells") {
    val path = TempDirs.create("graftxlsx").toString + "/r.xlsx"
    XlsxWriter.write(path, Seq(XlsxWriter.Sheet("Report",
      Seq("name", "amount"),
      Seq(Seq("a & b", 12.5), Seq("<x>", 3L), Seq(null, 7)))))
    val entries = zipEntries(path)
    assert(entries.keySet == Set("[Content_Types].xml", "_rels/.rels",
      "xl/workbook.xml", "xl/_rels/workbook.xml.rels", "xl/worksheets/sheet1.xml"))
    val sheet = entries("xl/worksheets/sheet1.xml")
    assert(sheet.contains("<t>a &amp; b</t>") && sheet.contains("<t>&lt;x&gt;</t>"))
    assert(sheet.contains("""<c r="B2"><v>12.5</v></c>"""))
    assert(entries("xl/workbook.xml").contains("""<sheet name="Report""""))
  }

  private def assertWellFormedXml(content: String): Unit = {
    val f = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    f.newDocumentBuilder().parse(
      new java.io.ByteArrayInputStream(content.getBytes("UTF-8")))
  }

  test("styled grouped workbook: styles.xml, widths, merges, subtotal rows") {
    import spark.implicits._
    import graft.reports.ReportRenderer
    val path = TempDirs.create("graftxlsx").toString + "/styled.xlsx"
    val detail = Seq(
      ("G2", "c3", 30.0), ("G1", "c1", 10.5), ("G1", "c2", 20.0))
      .toDF("grp", "claim", "amount")
    ReportRenderer.renderXlsx(path,
      ReportRenderer.ReportHeader("Claims Paid Report", "Acme Carrier",
        "01/01/2024", "01/31/2024", "2024-02-01 00:00:00"),
      detail, "grp", "amount", Seq("claim", "amount"),
      dollarColumns = Set("amount"))
    val entries = zipEntries(path)

    // styles part present, wired, and well-formed
    assert(entries.contains("xl/styles.xml"))
    assert(entries("[Content_Types].xml").contains("/xl/styles.xml"))
    assert(entries("xl/_rels/workbook.xml.rels").contains("styles.xml"))
    entries.values.foreach(assertWellFormedXml)
    val styles = entries("xl/styles.xml")
    assert(styles.contains("""formatCode="$#,##0.00""""), "dollar number format")
    assert(styles.contains("<b/>"), "bold font")
    assert(styles.contains("""fgColor rgb="FFD9D9D9""""), "header fill")
    assert(styles.contains("""<name val="Arial"/>"""))

    val sheet = entries("xl/worksheets/sheet1.xml")
    // header block: merged carrier/executed-on/page/date rows
    assert(sheet.contains("<mergeCells") && sheet.contains("""<mergeCell ref="A3:C3"/>"""))
    assert(sheet.contains("<t>Acme Carrier</t>"))
    assert(sheet.contains("<t>Executed On: 2024-02-01 00:00:00</t>"))
    assert(sheet.contains("<t>For Dates: 01/01/2024 To 01/31/2024</t>"))
    // column widths
    assert(sheet.contains("<cols>") && sheet.contains("""customWidth="1""""))
    // styled cells exist (s= attributes beyond the default style)
    assert(""" s="\d+"""".r.findFirstIn(sheet).isDefined)
    // per-group subtotals + grand total IN the workbook, with values
    assert(sheet.contains("<t>Total G1</t>") && sheet.contains("<t>Total G2</t>"))
    assert(sheet.contains("<t>Grand Total</t>"))
    assert(sheet.contains("<v>30.5</v>"), "G1 subtotal value") // 10.5 + 20.0
    assert(sheet.contains("<v>60.5</v>"), "grand total value")
  }

  test("styled workbook: empty report renders the merged no-data notice") {
    import spark.implicits._
    import graft.reports.ReportRenderer
    val path = TempDirs.create("graftxlsx").toString + "/empty.xlsx"
    val detail = Seq.empty[(String, String, Double)].toDF("grp", "claim", "amount")
    ReportRenderer.renderXlsx(path,
      ReportRenderer.ReportHeader("Claims Paid Report", "Acme Carrier",
        "01/01/2024", "01/31/2024", "2024-02-01 00:00:00"),
      detail, "grp", "amount", Seq("claim", "amount"))
    val sheet = zipEntries(path)("xl/worksheets/sheet1.xml")
    assert(sheet.contains("<t>No data available</t>"))
    assert(!sheet.contains("<t>Grand Total</t>"))
  }

  test("sheet names are sanitized to Excel's rules") {
    assert(XlsxWriter.sanitizeSheetName("Claims: 2024/Q1 [final]*?") == "Claims_ 2024_Q1 _final___")
    assert(XlsxWriter.sanitizeSheetName("x" * 40) == "x" * 31)
    assert(XlsxWriter.sanitizeSheetName("  ") == "Sheet1")
    val path = TempDirs.create("graftxlsx").toString + "/s.xlsx"
    XlsxWriter.write(path, Seq(XlsxWriter.Sheet("bad/name: [x]", Seq("a"), Seq(Seq(1)))))
    assert(zipEntries(path)("xl/workbook.xml").contains("""<sheet name="bad_name_ _x_""""))
  }

  test("colliding sheet names are made unique per workbook") {
    // sanitization collision and 31-char truncation collision
    val got = XlsxWriter.uniqueSheetNames(Seq(
      "a/b", "a:b", ("y" * 31) + "AAA", ("y" * 31) + "BBB", "A_B"))
    assert(got(0) == "a_b" && got(1) == "a_b_2")
    assert(got(2) == "y" * 31 && got(3) == "y" * 29 + "_2")
    assert(got(4) == "A_B_3", "case-insensitive uniqueness") // a_b, a_b_2 taken
    assert(got.map(_.toLowerCase).distinct.size == got.size)
    assert(got.forall(_.length <= 31))
  }

  test("datafeed runner fetches, writes, and logs batch control") {
    import spark.implicits._
    val dir = TempDirs.create("graftfeed").toString
    val meta = new MetaStore(spark, dir + "/meta")
    Seq((2, "b", "x"), (1, "a", "y"), (3, "c", "z"))
      .toDF("k", "v", "drop_me").createOrReplaceTempView("feed_src")

    val csv = DatafeedRunner.run(spark, meta, DatafeedRunner.FeedConfig(
      jobName = "feed1", carrier = "C1", table = "feed_src",
      excludeColumns = Seq("drop_me"), filterRows = Some(col("k") =!= 3),
      sortingColumns = Seq("k"), format = "csv", outputPath = dir + "/out_csv"))
    assert(csv.recordCount == 2)

    val xlsx = DatafeedRunner.run(spark, meta, DatafeedRunner.FeedConfig(
      jobName = "feed2", carrier = "C1", table = "feed_src",
      format = "xlsx", outputPath = dir + "/out.xlsx"))
    assert(xlsx.recordCount == 3)
    assert(zipEntries(dir + "/out.xlsx")("xl/worksheets/sheet1.xml").contains("<v>1</v>"))

    val bc = meta.batchControl.orderBy("job_name").collect()
    assert(bc.map(_.getAs[String]("job_name")).toSeq == Seq("feed1", "feed2"))
    assert(bc.map(_.getAs[Long]("record_count")).toSeq == Seq(2L, 3L))
  }
}
