package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

import graft.SparkSpec

/**
 * Schema-drift canary for the driver-regenerated testdata — the r7 trap
 * generalized from events to EVERY table: the driver can regenerate the
 * parquet between rounds with changed physical types (r7: events.ts
 * nanos→µs broke 24 oracle queries and 16 specs deep inside analysis).
 * Each table loads through its `Tables.*` entry and must surface exactly
 * these loader-normalized dtypes; a regeneration that drifts fails HERE,
 * immediately, with a per-column actual-vs-expected diff naming the
 * loader to fix.
 */
class SchemaCanarySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private val expected: Seq[(String, (String) => DataFrame, Seq[(String, DataType)])] = Seq(
    ("region", Tables.region(spark, _), Seq(
      "r_regionkey" -> IntegerType, "r_name" -> StringType)),
    ("nation", Tables.nation(spark, _), Seq(
      "n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType)),
    ("customer", Tables.customer(spark, _), Seq(
      "c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType)),
    ("supplier", Tables.supplier(spark, _), Seq(
      "s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType)),
    ("part", Tables.part(spark, _), Seq(
      "p_partkey" -> LongType, "p_name" -> StringType, "p_brand" -> StringType,
      "p_type" -> StringType, "p_size" -> IntegerType,
      "p_retailprice" -> DoubleType)),
    ("orders", Tables.orders(spark, _), Seq(
      "o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType)),
    ("lineitem", Tables.lineitem(spark, _), Seq(
      "l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampNTZType)),
    // events is the LOADER-NORMALIZED schema: both parquet vintages
    // (TIMESTAMP(NANOS) long / timestamp[us] NTZ) must surface TIMESTAMP
    ("events", Tables.events(spark, _), Seq(
      "event_id" -> LongType, "ts" -> TimestampType, "user_id" -> LongType,
      "event_type" -> StringType, "value" -> DoubleType,
      "props" -> StringType)),
    ("documents", Tables.documents(spark, _), Seq(
      "doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
      "source" -> StringType, "n_chars" -> LongType)),
    ("embeddings", Tables.embeddings(spark, _), Seq(
      "vec_id" -> LongType, "embedding" -> ArrayType(FloatType),
      "label" -> IntegerType)))

  /** containsNull-insensitive compare: parquet writers differ on list
   * element nullability, which no consumer here depends on. */
  private def sameType(a: DataType, b: DataType): Boolean = (a, b) match {
    case (ArrayType(ae, _), ArrayType(be, _)) => sameType(ae, be)
    case _ => a == b
  }

  test("every table loads with its pinned loader-normalized schema") {
    val diffs = expected.flatMap { case (table, load, cols) =>
      val actual = load(sf).schema
        .map(f => f.name -> f.dataType)
      val missing = cols.collect { case (n, t) if !actual.exists(_._1 == n) =>
        s"$table.$n: expected $t, column MISSING" }
      val extra = actual.collect { case (n, t) if !cols.exists(_._1 == n) =>
        s"$table.$n: UNEXPECTED column of type $t" }
      val changed = cols.flatMap { case (n, t) =>
        actual.find(_._1 == n).collect { case (_, at) if !sameType(at, t) =>
          s"$table.$n: expected $t, got $at" } }
      missing ++ extra ++ changed
    }
    assert(diffs.isEmpty,
      "testdata schema drifted (regenerated parquet? fix the Tables loader " +
        "or oracle types):\n  " + diffs.mkString("\n  "))
  }

  test("loaders tolerate array nullability variance but nothing else in embeddings") {
    // parquet list elements may round-trip nullable or not depending on the
    // writer; the canary above compares with containsNull-insensitive
    // equality via this pin — if it ever fails, the writer changed and the
    // consumers (fixed-point lifts, cosine kernels) need a null audit
    val t = Tables.embeddings(spark, sf).schema("embedding").dataType
    assert(t.isInstanceOf[ArrayType] &&
      t.asInstanceOf[ArrayType].elementType == FloatType, t.toString)
  }
}
