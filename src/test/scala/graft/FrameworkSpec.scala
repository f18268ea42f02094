package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.dq.TestFramework
import graft.ops.IncrementalLoad
import graft.meta.MetaStore
import graft.sources.TableIngest
import graft.reports.ReportRenderer

class FrameworkSpec extends AnyFunSuite with SparkSpec {

  private val template =
    """-- some preamble, ignored
      |-- START_TEST
      |@UNIQUE_CHECK
      |@QUERY
      |SELECT {column} AS err_value, COUNT(*) AS err_count
      |FROM {table} GROUP BY 1 HAVING COUNT(*) > 1
      |-- END_TEST
      |-- START_TEST
      |@NOT_NULL_CHECK
      |@QUERY
      |SELECT * FROM {table} WHERE {column} IS NULL
      |-- END_TEST
      |""".stripMargin

  test("parseTemplateBlocks extracts named SQL blocks") {
    val blocks = TestFramework.parseTemplateBlocks(template)
    assert(blocks.keySet == Set("UNIQUE_CHECK", "NOT_NULL_CHECK"))
    assert(blocks("NOT_NULL_CHECK") == "SELECT * FROM {table} WHERE {column} IS NULL")
  }

  test("renderPlaceholders fills {braces} and raises on unbound") {
    val sql = TestFramework.renderPlaceholders(
      "SELECT {c} FROM {t}", Map("c" -> "x", "t" -> "tab"))
    assert(sql == "SELECT x FROM tab")
    intercept[IllegalArgumentException] {
      TestFramework.renderPlaceholders("SELECT {nope}", Map.empty)
    }
  }

  test("loadSpec parses csv rows with ;-separated params") {
    val spec = TestFramework.loadSpec(
      """test_name,query_name,is_enabled,params
        |t1,UNIQUE_CHECK,true,table=tab;column=x
        |t2,NOT_NULL_CHECK,false,table=tab;column=y
        |""".stripMargin)
    assert(spec.length == 2 && spec(1).isEnabled == false)
    assert(spec.head.params == Map("table" -> "tab", "column" -> "x"))
  }

  test("run executes checks against views; runOrThrow raises on FAIL") {
    import spark.implicits._
    Seq((1, "a"), (1, "b"), (2, null)).toDF("k", "v")
      .createOrReplaceTempView("fw_tab")
    val blocks = TestFramework.parseTemplateBlocks(template)
    val cases = Seq(
      TestFramework.TestCase("dup_k", "UNIQUE_CHECK", Map("table" -> "fw_tab", "column" -> "k")),
      TestFramework.TestCase("null_v", "NOT_NULL_CHECK", Map("table" -> "fw_tab", "column" -> "v")))
    val out = TestFramework.run(spark, blocks, cases)
    assert(out.map(o => o.testName -> o.status).toMap ==
      Map("dup_k" -> "FAIL", "null_v" -> "FAIL"))
    assert(out.head.failureCount == 2) // err_count sum, not row count
    intercept[TestFramework.OneOrMoreTestCasesFailedException] {
      TestFramework.runOrThrow(spark, blocks, cases)
    }
    // passing case
    val ok = TestFramework.runOrThrow(spark, blocks,
      Seq(TestFramework.TestCase("uniq_v", "UNIQUE_CHECK",
        Map("table" -> "fw_tab", "column" -> "v"))))
    assert(ok.head.status == "PASS")
  }

  test("carrier condition is derived from the table's schema (all three shapes)") {
    import spark.implicits._
    // shape 1: plain carrier_name column → direct equality
    Seq(("AcmeIns", 1), ("Other", 2)).toDF("carrier_name", "v")
      .createOrReplaceTempView("fw_plain")
    // shape 2: dimensional md5 id → MD5(carrier) condition
    spark.sql("SELECT md5('AcmeIns') AS carrier_name_dim_id, 1 AS v " +
        "UNION ALL SELECT md5('Other'), 2")
      .createOrReplaceTempView("fw_dim")
    // shape 3: neither column → 1=1 fallback keeps everything
    Seq(1, 2, 3).toDF("v").createOrReplaceTempView("fw_bare")
    assert(TestFramework.carrierNameCondition(spark.table("fw_plain"), "AcmeIns")
      == "carrier_name = 'AcmeIns'")
    assert(TestFramework.carrierNameCondition(spark.table("fw_dim"), "AcmeIns")
      == "carrier_name_dim_id = MD5('AcmeIns')")
    assert(TestFramework.carrierNameCondition(spark.table("fw_bare"), "AcmeIns")
      == "1=1")
    // end-to-end: the {carrier_name_condition} placeholder auto-fills per
    // table shape; explicit conditions and quote escaping are respected
    val carrierTemplate = TestFramework.parseTemplateBlocks(
      """-- START_TEST
        |@CARRIER_ROWS
        |@QUERY
        |SELECT * FROM {table} WHERE {carrier_name_condition}
        |-- END_TEST
        |""".stripMargin)
    def rows(table: String) = TestFramework.run(spark, carrierTemplate,
      Seq(TestFramework.TestCase("t", "CARRIER_ROWS",
        Map("table" -> table, "carrier_name" -> "AcmeIns")))).head.failureCount
    assert(rows("fw_plain") == 1) // equality filter
    assert(rows("fw_dim") == 1)   // md5 id filter
    assert(rows("fw_bare") == 3)  // 1=1 keeps all
    assert(TestFramework.carrierNameCondition(spark.table("fw_plain"), "O'Hare")
      == "carrier_name = 'O''Hare'")
  }

  test("TestCaseGenerator emits row-count, dup-PK, sum, and distribution cases") {
    import graft.dq.TestCaseGenerator
    import spark.implicits._
    val df = Seq((1, "O", 10.5), (2, "F", 20.0)).toDF("o_key", "o_status", "o_totalprice")
    df.createOrReplaceTempView("gen_tab")
    val cases = TestCaseGenerator.generate("gen_tab", df.schema,
      pkColumns = Seq("o_key"), groupByColumns = Seq("o_status"))
    assert(cases.map(_.name) == Seq("gen_tab_row_count", "gen_tab_duplicate_pk",
      "gen_tab_sum_o_totalprice", "gen_tab_dist_o_status"))
    // every generated statement must actually run
    cases.foreach(c => spark.sql(c.sql).collect())
    assert(spark.sql(cases.head.sql).head().getLong(0) == 2)
    assert(TestFramework.executeCase(spark, cases(1).sql) == 0) // no dup PKs
  }

  test("IncrementalLoad: first run loads all, second only newer rows") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val dir = TempDirs.create("graftinc").toString
    val meta = new MetaStore(spark, dir)
    val source1 = Seq(
      (1L, "a", ts("2024-01-01 00:00:00")),
      (2L, "b", ts("2024-01-02 00:00:00"))).toDF("k", "v", "updated_at")
    val empty = source1.limit(0)
    val r1 = IncrementalLoad.run(spark, meta, "proc", "c1", source1, empty,
      Seq("k"), "updated_at") { df =>
      df.write.mode("overwrite").parquet(dir + "/target")
    }
    assert(r1.sourceRows == 2 && r1.upsert.inserted == 2)
    assert(meta.lastLoadTimestamp("proc", "c1").contains(ts("2024-01-02 00:00:00")))

    val target2 = spark.read.parquet(dir + "/target")
    val source2 = Seq(
      (2L, "b", ts("2024-01-02 00:00:00")),   // old row — filtered by watermark
      (2L, "b2", ts("2024-01-03 00:00:00")),  // newer version
      (3L, "c", ts("2024-01-04 00:00:00"))).toDF("k", "v", "updated_at")
    val r2 = IncrementalLoad.run(spark, meta, "proc", "c1", source2, target2,
      Seq("k"), "updated_at") { df =>
      df.write.mode("overwrite").parquet(dir + "/target2")
    }
    assert(r2.sourceRows == 2 && r2.upsert.inserted == 1 && r2.upsert.updated == 1)
    assert(meta.lastLoadTimestamp("proc", "c1").contains(ts("2024-01-04 00:00:00")))
    assert(spark.read.parquet(dir + "/target2").count() == 3)
  }

  test("IncrementalLoad keeps the old watermark when the sink fails") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val dir = TempDirs.create("graftincfail").toString
    val meta = new MetaStore(spark, dir)
    val source = Seq((1L, "a", ts("2024-01-01 00:00:00"))).toDF("k", "v", "updated_at")
    intercept[RuntimeException] {
      IncrementalLoad.run(spark, meta, "p2", "c1", source, source.limit(0),
        Seq("k"), "updated_at") { _ => throw new RuntimeException("disk full") }
    }
    // watermark must NOT have advanced — next run re-reads the slice
    assert(meta.lastLoadTimestamp("p2", "c1").isEmpty)
  }

  test("TableIngest stitches continuations, cleans, and combines") {
    val t1 = TableIngest.ExtractedTable(1,
      Seq("Policy", "Amount", "Status"),
      Seq(Seq("P1", "10", "OK"), Seq("P2", "20", "OK"), Seq("", "", "")))
    val cont = TableIngest.ExtractedTable(2,
      Seq("P3", "30", "OK"), // data row mistaken for a header → continuation
      Seq(Seq("P4", "40", "BAD")))
    val summary = TableIngest.ExtractedTable(2, Seq("Total", "100"), Seq(Seq("x", "y")))
    val stitched = TableIngest.stitchContinuations(Seq(t1, cont, summary))
    assert(stitched(1).header == Seq("Policy", "Amount", "Status"))
    assert(stitched(1).rows.head == Seq("P3", "30", "OK"))

    val detail = stitched.filter(TableIngest.isDetailTable(_))
    assert(detail.length == 2) // summary block dropped
    val df = TableIngest.ingest(spark, Seq(t1, cont, summary))
    assert(df.columns.toSeq == Seq("Policy", "Amount", "Status"))
    assert(df.count() == 4) // 2 + 2, all-empty row dropped
  }

  test("PdfTextExtractor: generated 2-page PDF ingests end-to-end") {
    import graft.sources.PdfTextExtractor
    // page 1: header + 2 rows, Tm-positioned cells, uncompressed stream
    val page1 =
      """BT /F1 10 Tf
        |1 0 0 1 72 700 Tm (Claim Id) Tj
        |1 0 0 1 200 700 Tm (Units) Tj
        |1 0 0 1 300 700 Tm (Amount Paid) Tj
        |1 0 0 1 72 686 Tm (CLM-001) Tj
        |1 0 0 1 200 686 Tm (3) Tj
        |1 0 0 1 300 686 Tm (120.50) Tj
        |1 0 0 1 72 672 Tm (CLM-002) Tj
        |1 0 0 1 200 672 Tm (1) Tj
        |1 0 0 1 300 672 Tm (45.00) Tj
        |ET""".stripMargin
    // page 2: continuation (no header row), Td/TJ positioning, FlateDecode
    val page2 =
      """BT /F1 8 Tf 14 TL
        |1 0 0 1 72 700 Tm [(CLM-) (003)] TJ
        |128 0 Td (2) Tj
        |100 0 Td [(80) (.25)] TJ
        |-228 -14 Td (CLM-004) Tj
        |128 0 Td (5) Tj
        |100 0 Td (10.00) Tj
        |ET""".stripMargin

    def deflate(b: Array[Byte]): Array[Byte] = {
      val d = new java.util.zip.Deflater()
      d.setInput(b); d.finish()
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      d.end(); out.toByteArray
    }
    val bos = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = bos.write(s.getBytes("ISO-8859-1"))
    val c1 = page1.getBytes("ISO-8859-1")
    val c2 = deflate(page2.getBytes("ISO-8859-1"))
    w("%PDF-1.4\n")
    w("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    w("2 0 obj << /Type /Pages /Kids [3 0 R 5 0 R] /Count 2 >> endobj\n")
    w("3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n")
    w(s"4 0 obj << /Length ${c1.length} >> stream\n"); bos.write(c1); w("\nendstream endobj\n")
    w("5 0 obj << /Type /Page /Parent 2 0 R /Contents 6 0 R >> endobj\n")
    w(s"6 0 obj << /Length ${c2.length} /Filter /FlateDecode >> stream\n")
    bos.write(c2); w("\nendstream endobj\n")
    w("trailer << /Root 1 0 R >>\n%%EOF")
    val dir = TempDirs.create("graftpdf")
    val path = dir.resolve("claims.pdf")
    java.nio.file.Files.write(path, bos.toByteArray)

    // extraction layer: 2 page tables, page 2's "header" is really data
    val tables = PdfTextExtractor.extractTables(bos.toByteArray)
    assert(tables.map(_.page) == Seq(1, 2))
    assert(tables.head.header == Seq("Claim Id", "Units", "Amount Paid"))
    assert(tables(1).header == Seq("CLM-003", "2", "80.25"))

    // full pipeline: stitch inherits the page-1 header, all 4 rows survive
    val df = TableIngest.ingestPdf(spark, path.toString)
    assert(df.columns.toSeq == Seq("Claim Id", "Units", "Amount Paid"))
    val rows = df.orderBy("Claim Id").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq
    assert(rows == Seq(
      ("CLM-001", "3", "120.50"), ("CLM-002", "1", "45.00"),
      ("CLM-003", "2", "80.25"), ("CLM-004", "5", "10.00")))
  }

  test("PdfTextExtractor lattice mode: bordered table with unaligned cell text") {
    import graft.sources.PdfTextExtractor
    // 3-column bordered grid: verticals at x = 50/110/200/300, horizontals
    // at y = 640/660/680/700. The Amount column's values are centered, so
    // their x-starts (170, 140) never align with the header's 115 — the
    // word-clustering strategy fabricates extra columns from them, the
    // ruling-line grid puts them all in column 1.
    val borders =
      """q 1 0 0 1 0 0 cm
        |50 640 m 50 700 l S
        |110 640 m 110 700 l S
        |200 640 m 200 700 l S
        |300 640 m 300 700 l S
        |50 700 m 300 700 l S
        |50 680 m 300 680 l S
        |50 660 m 300 660 l S
        |50 640 m 300 640 l S
        |Q
        |0 0 10 10 re W n
        |""".stripMargin
    val text =
      """BT /F1 10 Tf
        |1 0 0 1 55 688 Tm (Name) Tj
        |1 0 0 1 115 688 Tm (Amount) Tj
        |1 0 0 1 205 688 Tm (Date) Tj
        |1 0 0 1 55 668 Tm (alpha) Tj
        |1 0 0 1 170 668 Tm (10.50) Tj
        |1 0 0 1 205 668 Tm (2024-01-01) Tj
        |1 0 0 1 55 648 Tm (beta) Tj
        |1 0 0 1 140 648 Tm (7.25) Tj
        |1 0 0 1 205 648 Tm (2024-02-01) Tj
        |ET""".stripMargin
    def onePagePdf(content: String): Array[Byte] = {
      val c = content.getBytes("ISO-8859-1")
      val bos = new java.io.ByteArrayOutputStream()
      def w(s: String): Unit = bos.write(s.getBytes("ISO-8859-1"))
      w("%PDF-1.4\n")
      w("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
      w("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n")
      w("3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n")
      w(s"4 0 obj << /Length ${c.length} >> stream\n"); bos.write(c); w("\nendstream endobj\n")
      w("trailer << /Root 1 0 R >>\n%%EOF")
      bos.toByteArray
    }

    // the same text WITHOUT rulings falls back to word clustering, which
    // fabricates five x-start columns out of the three real ones — the
    // mis-clustering the lattice fixture is built to defeat
    val streamed = PdfTextExtractor.extractTables(onePagePdf(text)).head
    assert(streamed.header.length == 5 && streamed.header.contains(""))

    val table = PdfTextExtractor.extractTables(onePagePdf(borders + text)).head
    assert(table.header == Seq("Name", "Amount", "Date"))
    assert(table.rows == Seq(
      Seq("alpha", "10.50", "2024-01-01"),
      Seq("beta", "7.25", "2024-02-01")))
    // clip-path rectangle (re W n) was discarded, grid came from the 8
    // stroked rulings only; borderless PDFs still fall back to clustering
    val ingested = graft.sources.TableIngest.ingest(spark, Seq(table))
    assert(ingested.columns.toSeq == Seq("Name", "Amount", "Date"))
    assert(ingested.count() == 2)
  }

  test("page tree: split /Contents arrays concatenate; tree order beats file order") {
    import graft.sources.{PdfTextExtractor, TableIngest}
    // page ONE (by tree order) is split across TWO content streams — the
    // header+first row in one, the second row in another (FlateDecode) —
    // and its objects sit LAST in the file, after page two's. A file-order
    // stream scan would (a) break the split page into two phantom pages
    // and (b) emit the pages backwards; the page-tree walk must do neither.
    val p1a =
      """BT /F1 10 Tf
        |1 0 0 1 72 700 Tm (Claim Id) Tj
        |1 0 0 1 200 700 Tm (Units) Tj
        |1 0 0 1 300 700 Tm (Amount Paid) Tj
        |1 0 0 1 72 686 Tm (CLM-001) Tj
        |1 0 0 1 200 686 Tm (3) Tj
        |1 0 0 1 300 686 Tm (120.50) Tj
        |ET""".stripMargin
    val p1b =
      """BT /F1 10 Tf
        |1 0 0 1 72 672 Tm (CLM-002) Tj
        |1 0 0 1 200 672 Tm (1) Tj
        |1 0 0 1 300 672 Tm (45.00) Tj
        |ET""".stripMargin
    val p2 =
      """BT /F1 10 Tf
        |1 0 0 1 72 700 Tm (CLM-003) Tj
        |1 0 0 1 200 700 Tm (2) Tj
        |1 0 0 1 300 700 Tm (80.25) Tj
        |1 0 0 1 72 686 Tm (CLM-004) Tj
        |1 0 0 1 200 686 Tm (5) Tj
        |1 0 0 1 300 686 Tm (10.00) Tj
        |ET""".stripMargin
    def deflate(b: Array[Byte]): Array[Byte] = {
      val d = new java.util.zip.Deflater()
      d.setInput(b); d.finish()
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      d.end(); out.toByteArray
    }
    val (a, b2, c2) =
      (p1a.getBytes("ISO-8859-1"), deflate(p1b.getBytes("ISO-8859-1")),
        p2.getBytes("ISO-8859-1"))
    val bos = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = bos.write(s.getBytes("ISO-8859-1"))
    w("%PDF-1.4\n")
    w("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    // Kids order (5, then 3) is the DOCUMENT order; object order disagrees
    w("2 0 obj << /Type /Pages /Kids [5 0 R 3 0 R] /Count 2 >> endobj\n")
    w("3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n")
    w(s"4 0 obj << /Length ${c2.length} >> stream\n"); bos.write(c2); w("\nendstream endobj\n")
    w("5 0 obj << /Type /Page /Parent 2 0 R /Contents [6 0 R 7 0 R] >> endobj\n")
    w(s"6 0 obj << /Length ${a.length} >> stream\n"); bos.write(a); w("\nendstream endobj\n")
    w(s"7 0 obj << /Length ${b2.length} /Filter /FlateDecode >> stream\n")
    bos.write(b2); w("\nendstream endobj\n")
    w("trailer << /Root 1 0 R >>\n%%EOF")

    val tables = PdfTextExtractor.extractTables(bos.toByteArray)
    assert(tables.map(_.page) == Seq(1, 2), tables.map(_.page).toString)
    // the split page came back WHOLE: both rows under the one header
    assert(tables.head.header == Seq("Claim Id", "Units", "Amount Paid"))
    assert(tables.head.rows == Seq(
      Seq("CLM-001", "3", "120.50"), Seq("CLM-002", "1", "45.00")),
      tables.head.rows.toString)
    // page 2 is the continuation; stitch inherits the page-1 header
    val dir = TempDirs.create("graftpdf-split")
    val path = dir.resolve("split.pdf")
    java.nio.file.Files.write(path, bos.toByteArray)
    val df = TableIngest.ingestPdf(spark, path.toString)
    assert(df.columns.toSeq == Seq("Claim Id", "Units", "Amount Paid"))
    val rows = df.orderBy("Claim Id").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq
    assert(rows == Seq(("CLM-001", "3", "120.50"), ("CLM-002", "1", "45.00"),
      ("CLM-003", "2", "80.25"), ("CLM-004", "5", "10.00")))
  }

  test("lattice mode: two bordered tables on one page extract separately") {
    import graft.sources.{PdfTextExtractor, TableIngest}
    // table A (top): the 3-column detail grid; table B (bottom): a 2-column
    // summary block 40pt below — disjoint ruling components, so the page
    // yields TWO grids (the reference returns a per-page table list and
    // classifies detail-vs-summary across it, pdf_table_extractor.py:294-345)
    val content =
      """q 1 0 0 1 0 0 cm
        |50 640 m 50 700 l S
        |110 640 m 110 700 l S
        |200 640 m 200 700 l S
        |300 640 m 300 700 l S
        |50 700 m 300 700 l S
        |50 680 m 300 680 l S
        |50 660 m 300 660 l S
        |50 640 m 300 640 l S
        |50 560 m 50 600 l S
        |150 560 m 150 600 l S
        |250 560 m 250 600 l S
        |50 600 m 250 600 l S
        |50 580 m 250 580 l S
        |50 560 m 250 560 l S
        |Q
        |BT /F1 10 Tf
        |1 0 0 1 55 688 Tm (Name) Tj
        |1 0 0 1 115 688 Tm (Amount) Tj
        |1 0 0 1 205 688 Tm (Date) Tj
        |1 0 0 1 55 668 Tm (alpha) Tj
        |1 0 0 1 170 668 Tm (10.50) Tj
        |1 0 0 1 205 668 Tm (2024-01-01) Tj
        |1 0 0 1 55 648 Tm (beta) Tj
        |1 0 0 1 140 648 Tm (7.25) Tj
        |1 0 0 1 205 648 Tm (2024-02-01) Tj
        |1 0 0 1 55 588 Tm (Total) Tj
        |1 0 0 1 155 588 Tm (Rows) Tj
        |1 0 0 1 55 568 Tm (17.75) Tj
        |1 0 0 1 155 568 Tm (2) Tj
        |ET""".stripMargin
    val c = content.getBytes("ISO-8859-1")
    val bos = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = bos.write(s.getBytes("ISO-8859-1"))
    w("%PDF-1.4\n")
    w("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    w("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n")
    w("3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n")
    w(s"4 0 obj << /Length ${c.length} >> stream\n"); bos.write(c); w("\nendstream endobj\n")
    w("trailer << /Root 1 0 R >>\n%%EOF")

    val tables = PdfTextExtractor.extractTables(bos.toByteArray)
    assert(tables.length == 2, s"expected both grids, got ${tables.length}: $tables")
    // reading order: detail table (top of page) first
    assert(tables(0).header == Seq("Name", "Amount", "Date"))
    assert(tables(0).rows == Seq(
      Seq("alpha", "10.50", "2024-01-01"),
      Seq("beta", "7.25", "2024-02-01")))
    assert(tables(1).header == Seq("Total", "Rows"))
    assert(tables(1).rows == Seq(Seq("17.75", "2")))
    // the ingest pipeline classifies the 2-column 1-row block as summary
    // and keeps only the detail grid
    assert(TableIngest.isDetailTable(tables(0)) && !TableIngest.isDetailTable(tables(1)))
    val df = TableIngest.ingest(spark, tables)
    assert(df.columns.toSeq == Seq("Name", "Amount", "Date") && df.count() == 2)
  }

  test("rulingSegments: CTM transform, q/Q restore, re edges, n discards") {
    import graft.sources.PdfTextExtractor
    val segs = PdfTextExtractor.rulingSegments(
      """q 2 0 0 1 10 5 cm
        |0 0 m 50 0 l S
        |Q
        |0 0 m 0 40 l S
        |20 20 100 60 re f
        |7 7 m 7 99 l n""".stripMargin)
    // scaled+translated horizontal: (0,0)-(50,0) under [2 0 0 1 10 5] → (10,5)-(110,5)
    assert(segs.contains(PdfTextExtractor.Segment(10, 5, 110, 5)))
    // post-Q vertical back at identity
    assert(segs.contains(PdfTextExtractor.Segment(0, 0, 0, 40)))
    // rectangle contributes its four edges
    assert(segs.count(s => s.isVertical(5) && math.abs(s.x1 - 20) < 0.01) == 1)
    assert(segs.count(s => s.isVertical(5) && math.abs(s.x1 - 120) < 0.01) == 1)
    // the `n`-terminated path painted nothing
    assert(!segs.exists(s => math.abs(s.x1 - 7) < 0.01))
  }

  test("PdfTextExtractor never throws on malformed input") {
    import graft.sources.PdfTextExtractor
    val rnd = new scala.util.Random(42)
    val cases: Seq[Array[Byte]] = Seq(
      Array.emptyByteArray,
      "not a pdf at all".getBytes("ISO-8859-1"),
      // stream dict without endstream
      "%PDF-1.4\n1 0 obj << /Length 5 >> stream\nBT (x".getBytes("ISO-8859-1"),
      // FlateDecode dict over garbage (inflate fails -> stream skipped)
      "%PDF-1.4\n1 0 obj << /Filter /FlateDecode >> stream\n\nendstream".getBytes("ISO-8859-1"),
      // truncated text operators and unbalanced strings
      "%PDF-1.4\n1 0 obj << >> stream\nBT 1 0 0 1 Tm (unclosed Tj [ (a) 5\nendstream".getBytes("ISO-8859-1"),
      // malformed hex string and non-octal escape digit
      "%PDF-1.4\n1 0 obj << >> stream\nBT <zg!> Tj ET\nendstream".getBytes("ISO-8859-1"),
      "%PDF-1.4\n1 0 obj << >> stream\nBT (bad \\9 esc) Tj ET\nendstream".getBytes("ISO-8859-1"),
      Array.fill(4096)(rnd.nextInt(256).toByte))
    cases.foreach { bytes =>
      val tables = PdfTextExtractor.extractTables(bytes) // must not throw
      assert(tables != null)
    }
  }

  test("cleanDataFrame drops all-null columns and trims cells") {
    import spark.implicits._
    val df = Seq((" a ", null: String, "1"), ("b", null: String, " 2 "))
      .toDF("x", "dead", "y")
    val out = TableIngest.cleanDataFrame(df)
    assert(out.columns.toSeq == Seq("x", "y"))
    assert(out.orderBy("x").collect().map(_.getString(0)).toSeq == Seq("a", "b"))
  }

  test("ReportRenderer emits header, sections, subtotals, grand total") {
    import spark.implicits._
    val detail = Seq(("g1", "r1", 10.0), ("g1", "r2", 5.0), ("g2", "r3", 2.5))
      .toDF("grp", "item", "amt")
    val lines = ReportRenderer.render(
      ReportRenderer.ReportHeader("Claims Report", "CARRIER_A",
        "2024-01-01", "2024-01-31", "2024-02-01 00:00:00"),
      detail, "grp", "amt", Seq("item", "amt"))
    assert(lines.head == "Claims Report")
    assert(lines.contains("Total g1\t15.0"))
    assert(lines.contains("Total g2\t2.5"))
    assert(lines.last == "Grand Total\t17.5")
  }
}
