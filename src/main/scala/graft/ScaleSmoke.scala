package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.config.ExtractionConfig
import graft.xml.XmlExtraction

/**
 * Scale smoke: synthesize a multi-thousand-document XML corpus (store/inventory
 * /book shape, same as the reference testdata), run the fused extraction path
 * end-to-end, and report row counts + MB/s. Exercises the document-count
 * parallelism story on something bigger than the 2-file reference corpus.
 *
 * Usage: `runMain graft.ScaleSmoke [nDocs] [booksPerDoc]` (defaults 2000, 25).
 */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val nDocs = args.lift(0).map(_.toInt).getOrElse(2000)
    val booksPerDoc = args.lift(1).map(_.toInt).getOrElse(25)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = Files.createTempDirectory("graft-scale").toFile
    var bytes = 0L
    for (d <- 0 until nDocs) {
      val sb = new StringBuilder(s"""<?xml version="1.0"?>\n<store name="Store$d">\n""")
      sb.append(s"  <address><street>S$d</street><nr>$d</nr><city>C${d % 97}</city><phone>${10000000 + d}</phone></address>\n")
      for (m <- 0 until 2) {
        sb.append(s"""  <inventory month="M${(d + m) % 12}" day="${(d * 7 + m) % 28 + 1}">\n    <books>\n""")
        for (b <- 0 until booksPerDoc) {
          val id = f"bk${(d * booksPerDoc + b) % 1000}%03d"
          sb.append(s"""      <book id="$id" inStock="${(d + b) % 50}">\n""")
          sb.append(s"        <author>Author ${b % 37}</author><title>Title $b of store $d</title>\n")
          sb.append(s"        <genre>G${b % 11}</genre><price>${b % 40}.95</price>\n")
          sb.append(s"        <publish_date>200${b % 10}-0${b % 9 + 1}-01</publish_date>\n")
          sb.append(s"        <description>A long-ish description line to give the scanner real bytes to skip over, repeated words ${"filler " * 12}</description>\n")
          sb.append("      </book>\n")
        }
        sb.append("    </books>\n  </inventory>\n")
      }
      sb.append("</store>\n")
      val content = sb.toString
      bytes += content.length
      Files.writeString(Paths.get(dir.getAbsolutePath, f"store$d%05d.xml"), content)
    }

    val config = ExtractionConfig.fromFile("/root/reference/testdata/ExtractInventory.xml")
    // stage timings: cold corpus scan, then the full fused pipeline (warm FS)
    var t = System.nanoTime()
    val corpus = XmlExtraction.corpusFromXmlFiles(spark, dir.getAbsolutePath)
    corpus.count()
    println(f"[scalesmoke] scan-only (cold): ${(System.nanoTime() - t) / 1e9}%.2fs " +
      s"partitions=${corpus.rdd.getNumPartitions}")
    t = System.nanoTime()
    val nTuples = XmlExtraction.tuples(corpus, config).toDF().count()
    println(f"[scalesmoke] tuple path: ${(System.nanoTime() - t) / 1e9}%.2fs n=$nTuples")
    val t0 = System.nanoTime()
    val rows = XmlExtraction.run(
      XmlExtraction.corpusFromXmlFiles(spark, dir.getAbsolutePath), config).count()
    val sec = (System.nanoTime() - t0) / 1e9
    val mb = bytes / 1e6
    println(f"[scalesmoke] docs=$nDocs books=${nDocs * booksPerDoc * 2} corpus=$mb%.1f MB " +
      f"rows=$rows time=$sec%.2fs throughput=${mb / sec}%.1f MB/s")

    // expected: one row per book fragment
    assert(rows == nDocs.toLong * booksPerDoc * 2,
      s"expected ${nDocs.toLong * booksPerDoc * 2} rows, got $rows")
    spark.stop()
  }
}
