package graft.xml

import graft.SparkSpec
import graft.config.ExtractionConfig

/**
 * Golden end-to-end parity: both reference example extractions
 * (`/root/reference/scripts/run.sh:23-27`) over both store documents, asserted against
 * the analytically derived goldens in FIXTURES.md §3. Cross-document order is
 * nondeterministic in the reference (random UUID keys) so we compare sorted.
 */
class XmlExtractionGoldenSpec extends SparkSpec {

  private lazy val corpus = {
    import spark.implicits._
    Seq(
      ("InventorySoho.xml", resourceText("InventorySoho.xml")),
      ("InventoryBanks.xml", resourceText("InventoryBanks.xml"))
    ).toDF("docId", "xml")
  }

  private val goldenInventory = Seq(
    "SohoBooks;11553377;January;3;bk101;10;",
    "SohoBooks;11553377;January;3;bk102;3;",
    "SohoBooks;11553377;January;3;bk103;22;",
    "SohoBooks;11553377;January;3;bk106;13;",
    "SohoBooks;11553377;January;3;bk107;20;",
    "SohoBooks;11553377;January;3;bk108;4;",
    "SohoBooks;11553377;February;2;bk101;17;",
    "SohoBooks;11553377;February;2;bk103;32;",
    "SohoBooks;11553377;February;2;bk106;23;",
    "SohoBooks;11553377;February;2;bk107;2;",
    "SohoBooks;11553377;February;2;bk108;3;",
    "BanksBooks;22446688;January;4;bk103;1;",
    "BanksBooks;22446688;January;4;bk104;12;",
    "BanksBooks;22446688;January;4;bk105;3;",
    "BanksBooks;22446688;January;4;bk106;12;",
    "BanksBooks;22446688;January;4;bk107;40;",
    "BanksBooks;22446688;January;4;bk108;2;",
    "BanksBooks;22446688;January;4;bk109;3;",
    "BanksBooks;22446688;January;4;bk110;14;",
    "BanksBooks;22446688;January;4;bk111;8;",
    "BanksBooks;22446688;January;4;bk112;5;",
    "BanksBooks;22446688;February;1;bk103;1;",
    "BanksBooks;22446688;February;1;bk104;3;",
    "BanksBooks;22446688;February;1;bk105;2;",
    "BanksBooks;22446688;February;1;bk106;17;",
    "BanksBooks;22446688;February;1;bk107;40;",
    "BanksBooks;22446688;February;1;bk108;1;",
    "BanksBooks;22446688;February;1;bk110;24;",
    "BanksBooks;22446688;February;1;bk111;3;",
    "BanksBooks;22446688;February;1;bk112;7;"
  ).sorted

  private val goldenBook = Seq(
    "SohoBooks;11553377;January;3;bk106;13;",
    "SohoBooks;11553377;February;2;bk106;23;",
    "BanksBooks;22446688;January;4;bk106;12;",
    "BanksBooks;22446688;February;1;bk106;17;"
  ).sorted

  private def lines(configName: String): Seq[String] = {
    val config = ExtractionConfig.fromXml(resourceText(configName))
    XmlExtraction.run(corpus, config).collect().map(_.getString(0)).toSeq.sorted
  }

  test("ExtractInventory golden: 30 rows, byte-exact (fused path)") {
    assert(lines("ExtractInventory.xml") == goldenInventory)
  }

  test("ExtractBook golden: bk106 filter, 4 rows (fused path)") {
    assert(lines("ExtractBook.xml") == goldenBook)
  }

  test("window formulation produces identical rows to the fused path") {
    for (name <- Seq("ExtractInventory.xml", "ExtractBook.xml")) {
      val config = ExtractionConfig.fromXml(resourceText(name))
      val fused = XmlExtraction.formatLines(XmlExtraction.extractRows(corpus, config), config)
        .collect().map(_.getString(0)).toSeq.sorted
      val windowed = XmlExtraction.formatLines(
        XmlExtraction.pivotRows(XmlExtraction.tuples(corpus, config), config), config)
        .collect().map(_.getString(0)).toSeq.sorted
      assert(fused == windowed, s"paths diverge for $name")
    }
  }

  test("never-populated column renders as a single space") {
    import spark.implicits._
    // trigger (order 1) arrives before any order-0 fragment exists
    val config = ExtractionConfig.fromProperties(Map(
      ExtractionConfig.DelimiterKey -> ";",
      ExtractionConfig.SortOrderDelimiterKey -> "#",
      ExtractionConfig.OutputDelimiterKey -> "|",
      ExtractionConfig.NodesKey -> "never;b;",
      ExtractionConfig.NrOfColumnsKey -> "2",
      "never" -> "never;false;true; ;0#//never/text();",
      "b" -> "b;true;false; ;1#//b/@x;"
    ))
    val doc = Seq(("d1", """<r><b x="7"></b></r>""")).toDF("docId", "xml")
    val out = XmlExtraction.run(doc, config).collect().map(_.getString(0))
    assert(out.toSeq == Seq(" |7|"))
  }

  test("SequenceFile round-trip: write corpus, read back, extract identically") {
    val dir = java.nio.file.Files.createTempDirectory("graft-seq").toFile
    dir.deleteOnExit()
    val path = s"${dir.getAbsolutePath}/corpus.seq"
    import org.apache.hadoop.io.Text
    import spark.implicits._
    corpus.as[(String, String)].rdd
      .map { case (k, v) => (new Text(k), new Text(v)) }
      .saveAsSequenceFile(path)
    val back = XmlExtraction.corpusFromSequenceFile(spark, path)
    val config = ExtractionConfig.fromXml(resourceText("ExtractInventory.xml"))
    val out = XmlExtraction.run(back, config).collect().map(_.getString(0)).toSeq.sorted
    assert(out == goldenInventory)
  }
}
