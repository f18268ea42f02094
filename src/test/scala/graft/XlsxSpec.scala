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
    val path = java.nio.file.Files.createTempDirectory("graftxlsx").toString + "/r.xlsx"
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

  test("datafeed runner fetches, writes, and logs batch control") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graftfeed").toString
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
