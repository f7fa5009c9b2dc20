package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.config.ExtractionConfig
import graft.xml.{FragmentScanner, XmlExtraction}

/** The graft-xml DataSource V2: fragment parity with the scanner, pruning,
 * rule-filter pushdown, and the bridge into the pivot pipeline. */
class XmlFragmentSourceSpec extends SparkSpec {

  private lazy val dir = {
    val d = Files.createTempDirectory("graft-dsv2").toFile
    for (name <- Seq("InventorySoho.xml", "InventoryBanks.xml"))
      Files.writeString(new java.io.File(d, name).toPath, resourceText(name))
    d.getAbsolutePath
  }

  private lazy val configPath = {
    val f = Files.createTempFile("graft-dsv2-config", ".xml")
    Files.writeString(f, resourceText("ExtractInventory.xml"))
    f.toString
  }

  private def read() =
    spark.read.format("graft-xml").option("config", configPath).load(dir)

  test("fragments match FragmentScanner run directly on each document") {
    val config = ExtractionConfig.fromXml(resourceText("ExtractInventory.xml"))
    val viaSource = read()
      .select("docId", "seq", "rule", "xml")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getString(3)))
      .toSet
    val direct = (for {
      name <- Seq("InventorySoho.xml", "InventoryBanks.xml")
      frag <- FragmentScanner.scan(resourceText(name), config.rules.toIndexedSeq)
    } yield (name, frag.seq, config.rules(frag.ruleIndex).element, frag.xml)).toSet
    assert(viaSource == direct)
    assert(viaSource.nonEmpty)
  }

  test("rule equality filter is pushed into the scan") {
    val df = read().where(col("rule") === "book")
    val explained = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(explained.contains("pushedRules=book"), explained)
    val rules = df.select("rule").distinct().collect().map(_.getString(0)).toSeq
    assert(rules == Seq("book"))
  }

  test("column pruning reaches the reader (count never materializes xml bodies)") {
    val config = ExtractionConfig.fromXml(resourceText("ExtractInventory.xml"))
    val expected = (for {
      name <- Seq("InventorySoho.xml", "InventoryBanks.xml")
      frag <- FragmentScanner.scan(resourceText(name), config.rules.toIndexedSeq)
      if config.rules(frag.ruleIndex).element == "book"
    } yield frag).size
    val counts = read().groupBy(col("rule")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("book") == expected)
    // the scan's readSchema drops pruned columns
    val scanLine = read().select("rule").queryExecution.executedPlan.toString
    assert(!scanLine.contains("xml#") || scanLine.contains("ReadSchema"), scanLine)
  }

  test("nested directory trees list recursively, globs expand, small files pack") {
    val root = Files.createTempDirectory("graft-dsv2-nested")
    val subA = Files.createDirectory(root.resolve("a"))
    val subB = Files.createDirectory(root.resolve("a").resolve("deep"))
    val subC = Files.createDirectory(root.resolve("b"))
    Files.writeString(subA.resolve("InventorySoho.xml"), resourceText("InventorySoho.xml"))
    Files.writeString(subB.resolve("InventoryBanks.xml"), resourceText("InventoryBanks.xml"))
    Files.writeString(subC.resolve("InventorySoho2.xml"), resourceText("InventorySoho.xml"))
    Files.writeString(root.resolve("_SUCCESS"), "") // marker files are skipped

    def readPath(p: String) =
      spark.read.format("graft-xml").option("config", configPath).load(p)

    val all = readPath(root.toString)
    val docs = all.select("docId").distinct().collect().map(_.getString(0)).toSet
    assert(docs == Set("InventorySoho.xml", "InventoryBanks.xml", "InventorySoho2.xml"))
    // three small files fit one maxPartitionBytes budget → packed together
    assert(all.rdd.getNumPartitions == 1)

    // glob limits to the matching subtree (a/* = the direct file + deep/, recursed)
    val globbed = readPath(s"$root/a/*")
    val globbedDocs = globbed.select("docId").distinct().collect().map(_.getString(0)).toSet
    assert(globbedDocs == Set("InventorySoho.xml", "InventoryBanks.xml"))
  }

  test("conflicting pushed rule equalities yield the empty intersection") {
    val df = read().where(col("rule") === "book" && col("rule") === "store")
    assert(df.count() == 0)
  }

  test("DSv2 fragments + tuple/window pipeline == fused extractRows") {
    val config = ExtractionConfig.fromXml(resourceText("ExtractInventory.xml"))
    val viaDsv2 = XmlExtraction.pivotRows(
      XmlExtraction.tuplesFromFragments(read(), config), config)
      .orderBy("docId", "seq").collect().map(_.toSeq).toSeq
    val fused = XmlExtraction.extractRows(
      XmlExtraction.corpusFromXmlFiles(spark, dir), config)
      .orderBy("docId", "seq").collect().map(_.toSeq).toSeq
    assert(viaDsv2 == fused)
    assert(viaDsv2.nonEmpty)
  }
}
