package graft

import java.util.zip.{ZipEntry, ZipOutputStream}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Xlsx

/** Fixture workbooks are written with plain ZipOutputStream — the
  * OOXML subset the importer reads (workbook + rels + sharedStrings +
  * styles + worksheets) is synthesized byte-for-byte here, so the
  * test covers the real parse path with zero external libraries. */
class XlsxSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def writeWorkbook(path: String,
      entries: Map[String, String]): Unit = {
    val zos = new ZipOutputStream(new java.io.FileOutputStream(path))
    try entries.foreach { case (name, content) =>
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes("UTF-8"))
      zos.closeEntry()
    } finally zos.close()
  }

  private val ns = "xmlns=\"http://schemas.openxmlformats.org/spreadsheetml/2006/main\""
  private val rns = "xmlns:r=\"http://schemas.openxmlformats.org/officeDocument/2006/relationships\""

  private def fixture(dir: String): String = {
    val path = s"$dir/wb.xlsx"
    writeWorkbook(path, Map(
      "xl/workbook.xml" ->
        s"""<?xml version="1.0"?><workbook $ns $rns><sheets>
           |<sheet name="data" sheetId="1" r:id="rId1"/>
           |<sheet name="extra" sheetId="2" r:id="rId2"/>
           |</sheets></workbook>""".stripMargin,
      "xl/_rels/workbook.xml.rels" ->
        """<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
          |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
          |<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet2.xml"/>
          |</Relationships>""".stripMargin,
      "xl/sharedStrings.xml" ->
        s"""<?xml version="1.0"?><sst $ns uniqueCount="2">
           |<si><t>hello</t></si>
           |<si><r><t>rich </t></r><r><t>text</t></r></si>
           |</sst>""".stripMargin,
      // style 0: General; style 1: builtin date 14; style 2: custom
      // date-looking; style 3: duration [h]:mm:ss
      "xl/styles.xml" ->
        s"""<?xml version="1.0"?><styleSheet $ns>
           |<numFmts count="2">
           |<numFmt numFmtId="164" formatCode="yyyy-mm-dd"/>
           |<numFmt numFmtId="165" formatCode="[h]:mm:ss"/>
           |</numFmts>
           |<cellXfs count="4">
           |<xf numFmtId="0"/><xf numFmtId="14"/>
           |<xf numFmtId="164"/><xf numFmtId="165"/>
           |</cellXfs></styleSheet>""".stripMargin,
      // row 1: A=number, B=shared string, C=date (serial 45000 =
      // 2023-03-15), D=inline string; row 3 (gap): sparse cells,
      // no r= on the second cell (sequential indexing), boolean,
      // custom-date style, duration
      "xl/worksheets/sheet1.xml" ->
        s"""<?xml version="1.0"?><worksheet $ns><sheetData>
           |<row r="1">
           |<c r="A1"><v>42.5</v></c>
           |<c r="B1" t="s"><v>0</v></c>
           |<c r="C1" s="1"><v>45000</v></c>
           |<c r="D1" t="inlineStr"><is><t>inline</t></is></c>
           |<c r="G1" t="inlineStr"><is><r><t>Hello </t></r><r><t>World</t></r></is></c>
           |</row>
           |<row r="3">
           |<c r="B3" t="s"><v>1</v></c>
           |<c t="b"><v>1</v></c>
           |<c r="E3" s="2"><v>45000.5</v></c>
           |<c r="F3" s="3"><v>1.5</v></c>
           |<c r="AA3"><v>7</v></c>
           |</row>
           |<row r="12"><c r="A12"><v>1</v></c></row>
           |</sheetData></worksheet>""".stripMargin,
      "xl/worksheets/sheet2.xml" ->
        s"""<?xml version="1.0"?><worksheet $ns><sheetData>
           |<row r="1"><c r="A1"><v>9</v></c></row>
           |</sheetData></worksheet>""".stripMargin))
    path
  }

  test("xlsx import: values, types, names, padding, both sheets") {
    val dir = java.nio.file.Files.createTempDirectory("xlsx").toString
    val df = Xlsx.importXlsx(spark, fixture(dir))
    val cells = df.select(col("rowName"), col("column"),
        col("value.num"), col("value.str"),
        date_format(col("value.tsv"), "yyyy-MM-dd HH:mm:ss").as("tsv"),
        col("value.flag"))
      .collect().map(r => (r.getString(0), r.getString(1),
        Option(r.get(2)), Option(r.get(3)), Option(r.get(4)), Option(r.get(5))))
      .toSet

    // max row index 12 → width 2 padding
    assert(cells.contains(("data:01", "A", Some(42.5), None, None, None)))
    assert(cells.contains(("data:01", "B", None, Some("hello"), None, None)))
    // Excel serial 45000 from the 1899-12-30 epoch = 2023-03-15
    assert(cells.contains(("data:01", "C", None, None,
      Some("2023-03-15 00:00:00"), None)))
    assert(cells.contains(("data:01", "D", None, Some("inline"), None, None)))
    // rich-text INLINE string also concatenates runs (one <t> per run)
    assert(cells.contains(("data:01", "G", None, Some("Hello World"), None, None)))
    // rich-text shared string concatenates runs
    assert(cells.contains(("data:03", "B", None, Some("rich text"), None, None)))
    // cell with no r= follows its predecessor (B → C)
    assert(cells.contains(("data:03", "C", None, None, None, Some(true))))
    // custom format code yyyy-mm-dd is a date; .5 serial = noon
    assert(cells.contains(("data:03", "E", None, None,
      Some("2023-03-15 12:00:00"), None)))
    // duration format: 1.5 serial days = 129600 s
    assert(cells.contains(("data:03", "F", Some(129600.0), None, None, None)))
    assert(cells.contains(("data:03", "AA", Some(7.0), None, None, None)))
    assert(cells.contains(("data:12", "A", Some(1.0), None, None, None)))
    assert(cells.contains(("extra:1", "A", Some(9.0), None, None, None)))
    assert(cells.size == 12)
  }

  test("xlsx import: sheet filter and column letter round-trip") {
    val dir = java.nio.file.Files.createTempDirectory("xlsx").toString
    val df = Xlsx.importXlsx(spark, fixture(dir), sheets = Some(Seq("extra")))
    assert(df.select(col("rowName")).collect().map(_.getString(0)).toSet ==
      Set("extra:1"))
    // letters: A=0, Z=25, AA=26, AZ=51, BA=52, ZZ=701, AAA=702
    for (i <- Seq(0L, 25L, 26L, 51L, 52L, 701L, 702L, 16383L))
      assert(Xlsx.colIndex(Xlsx.colName(i) + "1") == i)
    assert(Xlsx.colName(0) == "A" && Xlsx.colName(26) == "AA" &&
      Xlsx.colName(701) == "ZZ" && Xlsx.colName(702) == "AAA")
  }
}
