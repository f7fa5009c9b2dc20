package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.config.ExtractionConfig
import graft.xml.XmlExtraction

/**
 * XML-operator queries made DuckDB-checkable by *synthesizing* XML from the relational
 * tables inside the Spark plan, extracting it back with the engine, and letting the
 * oracle compute the expected values directly from the base table. A value mismatch in
 * scanner / XPath / fill-down semantics surfaces as a hash mismatch.
 */
object XmlQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Extraction config for the synthesized order documents in q25. */
  private val orderConfig = ExtractionConfig.fromProperties(Map(
    ExtractionConfig.DelimiterKey -> ";",
    ExtractionConfig.SortOrderDelimiterKey -> "#",
    ExtractionConfig.OutputDelimiterKey -> ";",
    ExtractionConfig.NodesKey -> "order;line;",
    ExtractionConfig.NrOfColumnsKey -> "3",
    "order" -> "order;true;false; ;0#//order/@id;",
    "line" -> "line;true;false; ;1#//line/@num;2#//line/@qty;"
  ))

  val queries: Map[String, Q] = Map(
    // XPath projection parity (SURVEY.md §2.2 P3) via the built-in, codegen-friendly
    // xpath_* expressions — synthesize, extract, compare against the raw columns.
    "q24_xpath_roundtrip" -> ((s, d) => {
      Tables.part(s, d)
        .filter(col("p_partkey") % 10 === 0)
        .select(concat(
          lit("<part id=\""), col("p_partkey"),
          lit("\"><name>"), col("p_name"),
          lit("</name><size>"), col("p_size"), lit("</size></part>")).as("xml"))
        .select(
          expr("xpath_string(xml, '/part/@id')").cast("long").as("id"),
          expr("xpath_string(xml, '/part/name')").as("name"),
          expr("xpath_int(xml, '/part/size')").as("size"))
        .orderBy(col("id"))
    }),

    // Full parity-engine pipeline (scanner → XPath → window fill-down → trigger):
    // one XML document per order, lineitems as children; the oracle is the plain
    // relational join the denormalization must reproduce.
    "q25_xml_filldown_pipeline" -> ((s, d) => {
      val li = Tables.lineitem(s, d).filter(col("l_orderkey") % 50 === 0)
      val lineXml = li.select(col("l_orderkey"), col("l_linenumber"),
        concat(lit("<line num=\""), col("l_linenumber"),
          lit("\" qty=\""), col("l_quantity").cast("int"), lit("\"></line>")).as("fragment"))
      val docs = lineXml
        .groupBy(col("l_orderkey"))
        .agg(concat(
          lit("<order id=\""), col("l_orderkey"), lit("\">"),
          array_join(transform(
            array_sort(collect_list(struct(col("l_linenumber"), col("fragment")))),
            x => x.getField("fragment")), ""),
          lit("</order>")).as("xml"))
        .select(col("l_orderkey").cast("string").as("docId"), col("xml"))
      // distributed formulation: explicit tuples + window fill-down pivot
      val rows = XmlExtraction.pivotRows(XmlExtraction.tuples(docs, orderConfig), orderConfig)
      rows.select(
        col("c0").cast("long").as("orderkey"),
        col("c1").cast("int").as("linenumber"),
        col("c2").cast("int").as("qty"))
        .orderBy(col("orderkey"), col("linenumber"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q24_xpath_roundtrip" ->
      """SELECT p_partkey AS id, p_name AS name, p_size AS size
         FROM part WHERE p_partkey % 10 = 0 ORDER BY id""",
    "q25_xml_filldown_pipeline" ->
      """SELECT l_orderkey AS orderkey, l_linenumber AS linenumber,
         CAST(l_quantity AS INT) AS qty
         FROM lineitem WHERE l_orderkey % 50 = 0 ORDER BY orderkey, linenumber"""
  )
}
