package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * The core relational operator surface (SURVEY.md §2), expressed as oracle-checkable
 * queries over the driver's TPC-H-ish tables. Every query here is declarative
 * DataFrame API — Catalyst handles pushdown, pruning, join selection — with explicit
 * `broadcast()` hints where a dimension is known-small at any scale.
 *
 * Determinism rules (for the DuckDB hash compare):
 *  - every aggregate over doubles is `round(...)`-ed (sum order is engine-dependent);
 *  - every row-returning query has a total ORDER BY with a unique tie-break;
 *  - column names are aliased identically in the Spark plan and the oracle SQL.
 */
object RelationalQueries {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ------------------------------------------------------------------ aggregation
    "q01_agg_pricing" -> ((s, d) => {
      // TPC-H Q1 shape: full-scan aggregate with map-side partial aggregation;
      // at 100 TB this is scan-bound — no shuffle besides the 4-group exchange.
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    "q02_agg_global" -> ((s, d) => {
      Tables.lineitem(s, d).agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col("l_partkey")).as("n_parts"),
        round(sum(col("l_extendedprice")), 2).as("sum_price"),
        round(min(col("l_discount")), 2).as("min_disc"),
        round(max(col("l_tax")), 2).as("max_tax"))
    }),

    "q03_filter_project" -> ((s, d) => {
      // selective predicate + narrow projection: both must reach the parquet scan
      // (PushedFilters / ReadSchema), which is what makes this cheap at 100 TB
      Tables.lineitem(s, d)
        .filter(col("l_quantity") > 45 && col("l_discount") < 0.02)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          round(col("l_extendedprice") * (lit(1) - col("l_discount")), 2).as("net_price"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // ------------------------------------------------------------------ joins
    "q04_join_broadcast" -> ((s, d) => {
      // star join: fact orders joined to customer, then broadcast tiny dims.
      // nation/region stay broadcast-able at any SF (fixed cardinality).
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      val n = Tables.nation(s, d)
      val r = Tables.region(s, d)
      o.join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(round(sum(col("o_totalprice")), 2).as("revenue"), count(lit(1)).as("n_orders"))
        .orderBy(col("r_name"))
    }),

    "q05_join_shuffle" -> ((s, d) => {
      // fact-to-fact equi-join: shuffle on the join key both sides (sort-merge at
      // scale; AQE may pick broadcast at small SF) then re-aggregate
      val li = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_items"), round(sum(col("l_quantity")), 2).as("sum_qty"))
        .orderBy(col("o_orderpriority"))
    }),

    "q06_join_semi" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val big = Tables.orders(s, d).filter(col("o_totalprice") > 100000)
      c.join(big, c("c_custkey") === big("o_custkey"), "left_semi")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_customers"))
        .orderBy(col("c_mktsegment"))
    }),

    "q07_join_anti" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d).filter(col("o_totalprice") > 250000)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_customers_no_orders"))
        .orderBy(col("c_nationkey"))
    }),

    "q08_join_outer" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val lk = Tables.lineitem(s, d).select(col("l_orderkey")).distinct()
      o.join(lk, o("o_orderkey") === lk("l_orderkey"), "left")
        .groupBy(col("o_orderstatus"))
        .agg(
          count(lit(1)).as("n_orders"),
          sum(when(col("l_orderkey").isNull, 1).otherwise(0)).as("n_without_items"))
        .orderBy(col("o_orderstatus"))
    }),

    // ------------------------------------------------------------------ windows
    "q09_window_topk" -> ((s, d) => {
      // top-k per group: rank inside the window partition, filter — the shuffle is
      // one exchange on the partition key; limit never materializes globally
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      o.join(c, o("o_custkey") === c("c_custkey"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("c_mktsegment"), col("rank"), col("o_orderkey"),
          round(col("o_totalprice"), 2).as("totalprice"))
        .orderBy(col("c_mktsegment"), col("rank"))
    }),

    "q10_window_running" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"),
          round(sum(col("value")).over(w), 4).as("running_value"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    "q11_window_lag" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"),
          (unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w)).as("micros_since_prev"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    "q12_fill_forward" -> ((s, d) => {
      // the reference's fill-down semantic (SURVEY.md §2.3 J1) on relational data:
      // carry the last purchase amount forward over each user's event stream
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"),
          round(last(when(col("event_type") === "purchase", col("value")), ignoreNulls = true)
            .over(w), 4).as("last_purchase"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // ------------------------------------------------------------------ sort / limit
    "q13_sort_limit" -> ((s, d) => {
      // global top-k: Spark's TakeOrderedAndProject — per-partition heap + driver
      // merge of k rows, never a full global sort
      Tables.orders(s, d)
        .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("totalprice"))
        .orderBy(col("totalprice").desc, col("o_orderkey").asc)
        .limit(100)
    }),

    // ------------------------------------------------------------------ set ops
    "q14_union_distinct" -> ((s, d) => {
      val a = Tables.customer(s, d).filter(col("c_acctbal") < 0).select(col("c_custkey").as("custkey"))
      val b = Tables.orders(s, d).filter(col("o_totalprice") > 300000).select(col("o_custkey").as("custkey"))
      a.union(b).distinct().orderBy(col("custkey"))
    }),

    "q15_intersect" -> ((s, d) => {
      val a = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey").as("custkey"))
      val b = Tables.orders(s, d).filter(col("o_orderstatus") === "F").select(col("o_custkey").as("custkey"))
      a.intersect(b).orderBy(col("custkey"))
    }),

    "q16_except" -> ((s, d) => {
      val a = Tables.customer(s, d).filter(col("c_acctbal") > 9000).select(col("c_custkey").as("custkey"))
      val b = Tables.orders(s, d).filter(col("o_totalprice") > 250000)
        .select(col("o_custkey").as("custkey"))
      a.except(b).orderBy(col("custkey"))
    }),

    // ------------------------------------------------------------------ multi-dim agg
    "q17_rollup" -> ((s, d) => {
      Tables.lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    }),

    "q18_cube" -> ((s, d) => {
      Tables.orders(s, d)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"))
        .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)
    }),

    "q19_pivot" -> ((s, d) => {
      // pivot with an explicit value list: no extra pass to discover labels, and the
      // plan stays a single hash aggregate — this is the scalable form
      Tables.events(s, d)
        .groupBy(col("user_id"))
        .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
        .agg(round(sum(col("value")), 4))
        .orderBy(col("user_id"))
    }),

    // ------------------------------------------------------------------ unnest / scalar
    "q20_explode_wordcount" -> ((s, d) => {
      Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("word"))
        .groupBy(col("word"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("word").asc)
        .limit(50)
    }),

    "q21_scalar_string" -> ((s, d) => {
      Tables.orders(s, d)
        .filter(col("o_orderkey") % 1000 === 0)
        .select(
          col("o_orderkey"),
          upper(substring(col("o_orderpriority"), 1, 4)).as("pri4"),
          length(col("o_orderpriority")).as("pri_len"),
          concat(col("o_orderstatus"), lit("-"), col("o_orderpriority")).as("tag"))
        .orderBy(col("o_orderkey"))
    }),

    "q22_scalar_datetime" -> ((s, d) => {
      Tables.orders(s, d)
        .groupBy(year(col("o_orderdate")).as("y"), month(col("o_orderdate")).as("m"))
        .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"))
        .orderBy(col("y"), col("m"))
    }),

    "q23_case_bucket" -> ((s, d) => {
      Tables.orders(s, d)
        .select(
          when(col("o_totalprice") < 50000, "small")
            .when(col("o_totalprice") < 200000, "medium")
            .otherwise("large").as("bucket"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("bucket"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q01_agg_pricing" ->
      """SELECT l_returnflag, l_linestatus, round(sum(l_quantity),2) AS sum_qty,
         round(sum(l_extendedprice),2) AS sum_base_price,
         round(sum(l_extendedprice*(1-l_discount)),2) AS sum_disc_price,
         round(avg(l_quantity),4) AS avg_qty, count(*) AS count_order
         FROM lineitem GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "q02_agg_global" ->
      """SELECT count(*) AS n_rows, count(DISTINCT l_partkey) AS n_parts,
         round(sum(l_extendedprice),2) AS sum_price, round(min(l_discount),2) AS min_disc,
         round(max(l_tax),2) AS max_tax FROM lineitem""",
    "q03_filter_project" ->
      """SELECT l_orderkey, l_linenumber, round(l_extendedprice*(1-l_discount),2) AS net_price
         FROM lineitem WHERE l_quantity > 45 AND l_discount < 0.02
         ORDER BY l_orderkey, l_linenumber""",
    "q04_join_broadcast" ->
      """SELECT r_name, round(sum(o_totalprice),2) AS revenue, count(*) AS n_orders
         FROM orders JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name ORDER BY r_name""",
    "q05_join_shuffle" ->
      """SELECT o_orderpriority, count(*) AS n_items, round(sum(l_quantity),2) AS sum_qty
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q06_join_semi" ->
      """SELECT c_mktsegment, count(*) AS n_customers FROM customer
         WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 100000)
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "q07_join_anti" ->
      """SELECT c_nationkey, count(*) AS n_customers_no_orders FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey AND o_totalprice > 250000)
         GROUP BY c_nationkey ORDER BY c_nationkey""",
    "q08_join_outer" ->
      """SELECT o_orderstatus, count(*) AS n_orders,
         CAST(sum(CASE WHEN l.l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_without_items
         FROM orders LEFT JOIN (SELECT DISTINCT l_orderkey FROM lineitem) l
         ON o_orderkey = l.l_orderkey
         GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "q09_window_topk" ->
      """SELECT c_mktsegment, rank, o_orderkey, totalprice FROM (
           SELECT c_mktsegment, o_orderkey, round(o_totalprice,2) AS totalprice,
                  row_number() OVER (PARTITION BY c_mktsegment
                                     ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank
           FROM orders JOIN customer ON o_custkey = c_custkey)
         WHERE rank <= 3 ORDER BY c_mktsegment, rank""",
    "q10_window_running" ->
      """SELECT user_id, event_id,
         round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),4) AS running_value
         FROM events ORDER BY user_id, event_id""",
    "q11_window_lag" ->
      """SELECT user_id, event_id,
         epoch_us(ts) - lag(epoch_us(ts), 1) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS micros_since_prev
         FROM events ORDER BY user_id, event_id""",
    "q12_fill_forward" ->
      """SELECT user_id, event_id,
         round(last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),4) AS last_purchase
         FROM events ORDER BY user_id, event_id""",
    "q13_sort_limit" ->
      """SELECT o_orderkey, round(o_totalprice,2) AS totalprice FROM orders
         ORDER BY totalprice DESC, o_orderkey ASC LIMIT 100""",
    "q14_union_distinct" ->
      """SELECT DISTINCT custkey FROM (
           SELECT c_custkey AS custkey FROM customer WHERE c_acctbal < 0
           UNION ALL
           SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 300000)
         ORDER BY custkey""",
    "q15_intersect" ->
      """SELECT custkey FROM (
           SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
           INTERSECT
           SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F')
         ORDER BY custkey""",
    "q16_except" ->
      """SELECT custkey FROM (
           SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 9000
           EXCEPT
           SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 250000)
         ORDER BY custkey""",
    "q17_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n, round(sum(l_quantity),2) AS sum_qty
         FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
         ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",
    "q18_cube" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n, round(sum(o_totalprice),2) AS total
         FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
         ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""",
    "q19_pivot" ->
      """SELECT user_id,
         round(sum(value) FILTER (WHERE event_type = 'click'),4)    AS click,
         round(sum(value) FILTER (WHERE event_type = 'view'),4)     AS view,
         round(sum(value) FILTER (WHERE event_type = 'purchase'),4) AS purchase,
         round(sum(value) FILTER (WHERE event_type = 'signup'),4)   AS signup,
         round(sum(value) FILTER (WHERE event_type = 'error'),4)    AS error
         FROM events GROUP BY user_id ORDER BY user_id""",
    "q20_explode_wordcount" ->
      """SELECT word, count(*) AS n FROM (
           SELECT unnest(string_split(text, ' ')) AS word FROM documents)
         GROUP BY word ORDER BY n DESC, word ASC LIMIT 50""",
    "q21_scalar_string" ->
      """SELECT o_orderkey, upper(substring(o_orderpriority,1,4)) AS pri4,
         length(o_orderpriority) AS pri_len,
         concat(o_orderstatus, '-', o_orderpriority) AS tag
         FROM orders WHERE o_orderkey % 1000 = 0 ORDER BY o_orderkey""",
    "q22_scalar_datetime" ->
      """SELECT year(o_orderdate) AS y, month(o_orderdate) AS m, count(*) AS n,
         round(sum(o_totalprice),2) AS total
         FROM orders GROUP BY year(o_orderdate), month(o_orderdate) ORDER BY y, m""",
    "q23_case_bucket" ->
      """SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
                     WHEN o_totalprice < 200000 THEN 'medium'
                     ELSE 'large' END AS bucket, count(*) AS n
         FROM orders GROUP BY 1 ORDER BY bucket"""
  )
}
