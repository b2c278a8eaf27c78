package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{BloomPrune, ExactPercentile, SkewTools, Skyline}
import graft.{Q, Tables}

/** Relational core (SURVEY.md §2 block B): the batch query surface.
  * Every query is a declarative DataFrame plan — filters and
  * projections reach the parquet scan, small dimensions are broadcast,
  * aggregations partial-aggregate before their exchange.
  */
object RelationalQueries {

  def all: Seq[Q] = Seq(

    // TPC-H Q1 shape: wide multi-aggregate groupBy with a pushed
    // range filter. 6 groups — map-side partial agg does ~all work.
    Q("q1_agg",
      (s, d) => Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
            .as("sum_disc_price"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
            * (lit(1.0) + col("l_tax"))), 2).as("sum_charge"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          round(avg(col("l_extendedprice")), 4).as("avg_price"),
          round(avg(col("l_discount")), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT l_returnflag, l_linestatus,
             |  round(sum(l_quantity), 2) AS sum_qty,
             |  round(sum(l_extendedprice), 2) AS sum_base_price,
             |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
             |  round(sum(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)), 2) AS sum_charge,
             |  round(avg(l_quantity), 4) AS avg_qty,
             |  round(avg(l_extendedprice), 4) AS avg_price,
             |  round(avg(l_discount), 4) AS avg_disc,
             |  count(*) AS count_order
             |FROM lineitem
             |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
             |GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // Selective filter + 3-column projection: PushedFilters +
    // ReadSchema pruning demo (scan reads 4 of 16 columns).
    Q("q2_filter_project",
      (s, d) => Tables.lineitem(s, d)
        .filter(col("l_quantity") === 1.0 && col("l_returnflag") === "R")
        .select("l_orderkey", "l_partkey", "l_quantity")
        .orderBy("l_orderkey", "l_partkey"),
      Some("""SELECT l_orderkey, l_partkey, l_quantity
             |FROM lineitem WHERE l_quantity = 1.0 AND l_returnflag = 'R'
             |ORDER BY l_orderkey, l_partkey""".stripMargin)),

    // TPC-H Q3 shape: 3-way join, revenue per order, top-10. Customer
    // (the small filtered side) is broadcast; lineitem⋈orders shuffles
    // on orderkey; orderBy+limit plans as TakeOrderedAndProject.
    Q("q3_topk_join",
      (s, d) => {
        val c = Tables.customer(s, d)
          .filter(col("c_mktsegment") === "BUILDING")
        val o = Tables.orders(s, d)
          .filter(col("o_orderdate") < lit("1998-01-01"))
        val l = Tables.lineitem(s, d)
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .groupBy("o_orderkey", "o_orderdate")
          .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
            .as("revenue"))
          .select("o_orderkey", "revenue", "o_orderdate")
          .orderBy(col("revenue").desc, col("o_orderkey"))
          .limit(10)
      },
      Some("""SELECT o_orderkey,
             |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
             |  o_orderdate
             |FROM customer
             |JOIN orders ON c_custkey = o_custkey
             |JOIN lineitem ON l_orderkey = o_orderkey
             |WHERE c_mktsegment = 'BUILDING'
             |  AND o_orderdate < TIMESTAMP '1998-01-01'
             |GROUP BY o_orderkey, o_orderdate
             |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin)),

    // TPC-H Q4 shape: correlated EXISTS with a cross-table predicate
    // (order has >= 1 lineitem shipped after the order date) — a
    // left_semi join whose condition spans both sides.
    Q("q4_exists_late",
      (s, d) => Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1997-01-01") &&
          col("o_orderdate") < lit("1997-04-01"))
        .join(Tables.lineitem(s, d),
          col("o_orderkey") === col("l_orderkey") &&
            col("l_shipdate") > col("o_orderdate"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_orders"))
        .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority, count(*) AS n_orders
             |FROM orders
             |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
             |  AND o_orderdate < TIMESTAMP '1997-04-01'
             |  AND EXISTS (
             |    SELECT 1 FROM lineitem
             |    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
             |GROUP BY o_orderpriority
             |ORDER BY o_orderpriority""".stripMargin)),

    // TPC-H Q5 shape: 6-way join with broadcast dimension chain
    // (supplier/nation/region), local-supplier constraint.
    Q("q5_region_revenue",
      (s, d) => {
        val r = Tables.region(s, d)
          .filter(col("r_name").isin("ASIA", "AMERICA"))
        val n = Tables.nation(s, d)
        val sup = Tables.supplier(s, d)
        val c = Tables.customer(s, d)
        val o = Tables.orders(s, d)
          .filter(col("o_orderdate") >= lit("1996-01-01"))
        val l = Tables.lineitem(s, d)
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .join(broadcast(sup),
            col("l_suppkey") === col("s_suppkey") &&
              col("c_nationkey") === col("s_nationkey"))
          .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .groupBy("n_name")
          .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
            .as("revenue"))
          .orderBy(col("revenue").desc, col("n_name"))
      },
      Some("""SELECT n_name,
             |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
             |FROM customer
             |JOIN orders ON c_custkey = o_custkey
             |JOIN lineitem ON l_orderkey = o_orderkey
             |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
             |JOIN nation ON s_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |WHERE r_name IN ('ASIA', 'AMERICA')
             |  AND o_orderdate >= TIMESTAMP '1996-01-01'
             |GROUP BY n_name
             |ORDER BY revenue DESC, n_name""".stripMargin)),

    // TPC-H Q6 shape: single-pass filtered sum, no pre-final shuffle.
    Q("q6_selective_agg",
      (s, d) => Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1997-01-01") &&
          col("l_shipdate") < lit("1998-01-01") &&
          col("l_discount").between(0.05, 0.07) &&
          col("l_quantity") < 24)
        .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2)
          .as("revenue")),
      Some("""SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
             |FROM lineitem
             |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
             |  AND l_shipdate < TIMESTAMP '1998-01-01'
             |  AND l_discount BETWEEN 0.05 AND 0.07
             |  AND l_quantity < 24""".stripMargin)),

    // Window function: top order per customer (row_number, rank-1
    // filter pushed through the window by Catalyst's LimitPushDown
    // analog for rank filters).
    Q("q7_window_rank",
      (s, d) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        Tables.orders(s, d)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select("o_custkey", "o_orderkey", "o_totalprice")
          .orderBy("o_custkey")
      },
      Some("""WITH r AS (
             |  SELECT o_custkey, o_orderkey, o_totalprice,
             |    row_number() OVER (
             |      PARTITION BY o_custkey
             |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
             |  FROM orders)
             |SELECT o_custkey, o_orderkey, o_totalprice
             |FROM r WHERE rn = 1 ORDER BY o_custkey""".stripMargin)),

    // NOT EXISTS as left_anti join. The orders side is date-filtered
    // (customers with no RECENT orders) so the result is non-empty at
    // every sf — an unfiltered anti join is vacuously empty in this
    // generator (every customer has at least one order) and a 0=0
    // match would prove nothing about anti-join semantics.
    Q("q8_anti_join",
      (s, d) => Tables.customer(s, d)
        .join(Tables.orders(s, d)
          .filter(col("o_orderdate") >= lit("1998-06-01")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE NOT EXISTS (
             |  SELECT 1 FROM orders WHERE o_custkey = c_custkey
             |    AND o_orderdate >= TIMESTAMP '1998-06-01')
             |ORDER BY c_custkey""".stripMargin)),

    // EXISTS as left_semi join.
    Q("q9_semi_join",
      (s, d) => Tables.supplier(s, d)
        .join(Tables.lineitem(s, d)
          .filter(col("l_shipdate") >= lit("1997-01-01") &&
            col("l_shipdate") < lit("1998-01-01")),
          col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey"),
      Some("""SELECT s_suppkey, s_name FROM supplier
             |WHERE EXISTS (
             |  SELECT 1 FROM lineitem WHERE l_suppkey = s_suppkey
             |    AND l_shipdate >= TIMESTAMP '1997-01-01'
             |    AND l_shipdate < TIMESTAMP '1998-01-01')
             |ORDER BY s_suppkey""".stripMargin)),

    // ROLLUP grouping sets (Expand + partial aggregation). NULL group
    // keys coalesced so NULL-ordering differences can't matter.
    Q("q10_rollup",
      (s, d) => {
        // Expressed via SQL: Dataset-API rollup attaches dataset-id tags
        // to the Expand's duplicated grouping attributes, which
        // false-positives Spark's DetectAmbiguousSelfJoin on any later
        // reference. spark.sql builds the identical Catalyst plan
        // (Expand + partial agg, broadcast dims) without the tags.
        Tables.customer(s, d).createOrReplaceTempView("customer")
        Tables.nation(s, d).createOrReplaceTempView("nation")
        Tables.region(s, d).createOrReplaceTempView("region")
        s.sql("""SELECT coalesce(r_name, 'ALL') AS region_name,
                |  coalesce(n_name, 'ALL') AS nation_name,
                |  count(*) AS n_customers,
                |  round(sum(c_acctbal), 2) AS total_acctbal
                |FROM customer
                |JOIN nation ON c_nationkey = n_nationkey
                |JOIN region ON n_regionkey = r_regionkey
                |GROUP BY ROLLUP (r_name, n_name)
                |ORDER BY region_name, nation_name""".stripMargin)
      },
      Some("""SELECT coalesce(r_name, 'ALL') AS region_name,
             |  coalesce(n_name, 'ALL') AS nation_name,
             |  count(*) AS n_customers,
             |  round(sum(c_acctbal), 2) AS total_acctbal
             |FROM customer
             |JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |GROUP BY ROLLUP (r_name, n_name)
             |ORDER BY region_name, nation_name""".stripMargin)),

    // Conditional (CASE WHEN) aggregation — pivot-style, codegen'd.
    Q("q11_case_agg",
      (s, d) => Tables.orders(s, d)
        .groupBy("o_orderpriority")
        .agg(
          count(lit(1)).as("n_orders"),
          sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L))
            .as("n_finished"),
          round(sum(when(col("o_totalprice") > 100000.0, col("o_totalprice"))
            .otherwise(0.0)), 2).as("big_revenue"))
        .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority,
             |  count(*) AS n_orders,
             |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_finished,
             |  round(sum(CASE WHEN o_totalprice > 100000.0 THEN o_totalprice
             |                 ELSE 0.0 END), 2) AS big_revenue
             |FROM orders GROUP BY o_orderpriority
             |ORDER BY o_orderpriority""".stripMargin)),

    // Scalar subquery: parts above the global average retail price.
    Q("q12_subquery",
      (s, d) => {
        val p = Tables.part(s, d)
        val avgPrice = p.agg(avg("p_retailprice").as("a"))
        p.join(broadcast(avgPrice))
          .filter(col("p_retailprice") > col("a"))
          .select("p_partkey", "p_name", "p_retailprice")
          .orderBy("p_partkey")
      },
      Some("""SELECT p_partkey, p_name, p_retailprice FROM part
             |WHERE p_retailprice > (SELECT avg(p_retailprice) FROM part)
             |ORDER BY p_partkey""".stripMargin)),

    // String function pipeline: substr/upper/cast/modulo bucketing.
    Q("q13_string_funcs",
      (s, d) => Tables.customer(s, d)
        .filter(col("c_name").like("Customer#%"))
        .select(
          upper(substring(col("c_name"), 1, 8)).as("prefix"),
          (expr("CAST(substring(c_name, 10) AS BIGINT)") % 7).as("bucket"))
        .groupBy("prefix", "bucket")
        .agg(count(lit(1)).as("n"))
        .orderBy("prefix", "bucket"),
      Some("""SELECT upper(substr(c_name, 1, 8)) AS prefix,
             |  CAST(substr(c_name, 10) AS BIGINT) % 7 AS bucket,
             |  count(*) AS n
             |FROM customer WHERE c_name LIKE 'Customer#%'
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Calendar bucketing: orders per month.
    Q("q14_date_buckets",
      (s, d) => Tables.orders(s, d)
        .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum("o_totalprice"), 2).as("revenue"))
        .orderBy("month"),
      Some("""SELECT date_trunc('month', o_orderdate) AS month,
             |  count(*) AS n_orders,
             |  round(sum(o_totalprice), 2) AS revenue
             |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Exact percentiles (linear interpolation matching DuckDB
    // `quantile_cont`) — computed scale-safe via ExactPercentile:
    // a count-per-(brand, price) partial aggregation + cumulative
    // pick over the bounded distinct-value table, NOT the built-in
    // `percentile` whose per-group buffer is O(rows). Grouping on
    // the raw double (TPC-H prices are discrete cents from a fixed
    // generator domain, so distinct values are domain-bounded) keeps
    // the interpolation bit-identical to the built-in it replaces.
    Q("q15_percentiles",
      (s, d) => graft.operators.ExactPercentile
        .grouped(Tables.part(s, d), Seq("p_brand"), "p_retailprice",
          Seq("median_price" -> 0.5, "p90_price" -> 0.9))
        .select(col("p_brand"),
          round(col("median_price"), 4).as("median_price"),
          round(col("p90_price"), 4).as("p90_price"),
          col("n").as("n_parts"))
        .orderBy("p_brand"),
      Some("""SELECT p_brand,
             |  round(CAST(quantile_cont(p_retailprice, 0.5) AS DOUBLE), 4)
             |    AS median_price,
             |  round(CAST(quantile_cont(p_retailprice, 0.9) AS DOUBLE), 4)
             |    AS p90_price,
             |  count(*) AS n_parts
             |FROM part GROUP BY p_brand ORDER BY p_brand""".stripMargin)),

    // UNION + distinct (partial-agg distinct, no pre-union shuffle).
    Q("q16_union_distinct",
      (s, d) => Tables.customer(s, d)
        .select(col("c_nationkey").as("nationkey"))
        .union(Tables.supplier(s, d).select(col("s_nationkey")))
        .distinct()
        .orderBy("nationkey"),
      Some("""SELECT c_nationkey AS nationkey FROM customer
             |UNION SELECT s_nationkey FROM supplier
             |ORDER BY nationkey""".stripMargin)),

    // PIVOT: order counts per priority, one column per order status.
    // The explicit pivot value list keeps the plan single-pass (no
    // distinct-values pre-query) — the form that scales.
    Q("q22_pivot",
      (s, d) => Tables.orders(s, d)
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .na.fill(0L, Seq("F", "O", "P"))
        .select(col("o_orderpriority"), col("F").as("n_f"),
          col("O").as("n_o"), col("P").as("n_p"))
        .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority,
             |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
             |       AS BIGINT) AS n_f,
             |  CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END)
             |       AS BIGINT) AS n_o,
             |  CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END)
             |       AS BIGINT) AS n_p
             |FROM orders GROUP BY o_orderpriority
             |ORDER BY o_orderpriority""".stripMargin)),

    // Running-total window frame: cumulative spend per customer over
    // their order history (ROWS UNBOUNDED PRECEDING — the frame kind
    // q7's rank and q18's session sum don't cover). One shuffle on
    // custkey; the frame is computed within partitions.
    Q("q23_running_total",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("o_custkey")
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.currentRow)
        Tables.orders(s, d)
          .filter(col("o_custkey") < 100)
          .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
            round(sum("o_totalprice").over(w), 2).as("cum_spend"))
          .orderBy("o_custkey", "o_orderdate", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey, o_orderdate,
             |  round(sum(o_totalprice) OVER (
             |    PARTITION BY o_custkey
             |    ORDER BY o_orderdate, o_orderkey
             |    ROWS UNBOUNDED PRECEDING), 2) AS cum_spend
             |FROM orders WHERE o_custkey < 100
             |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin)),

    // Arbitrary GROUPING SETS (not a rollup/cube prefix chain):
    // detail, per-status, and grand-total sets in ONE pass — Expand
    // duplicates each input row per set, partial aggregation runs
    // before the single exchange. Same SQL text on both engines.
    Q("q25_grouping_sets",
      (s, d) => {
        Tables.orders(s, d).createOrReplaceTempView("orders")
        s.sql(GroupingSetsSql)
      },
      Some(GroupingSetsSql)),

    // Correlated scalar subquery: customers holding more than twice
    // their own nation's average balance. Catalyst decorrelates the
    // per-row subquery into one per-nation aggregate + a broadcast
    // equi-join — the plan a hand-rewrite would build, derived from
    // the declarative form. Same SQL text on both engines.
    Q("q26_corr_subquery",
      (s, d) => {
        Tables.customer(s, d).createOrReplaceTempView("customer")
        s.sql(CorrSubquerySql)
      },
      Some(CorrSubquerySql)),

    // lead/lag window: month-over-month revenue delta. The global
    // window runs over the PRE-AGGREGATED month table (dozens of
    // rows), never the raw orders — the only safe place for an
    // unpartitioned ORDER BY window at scale.
    Q("q27_lag_delta",
      (s, d) => {
        // Single partition BY CONSTRUCTION (input is the month
        // aggregate, ≤ dozens of rows); the non-foldable constant key
        // declares that deliberately, so WindowExec's
        // unpartitioned-window warning only fires on windows that are
        // genuinely unbounded. (A lit key would be stripped by
        // EliminateWindowPartitions and the warning would return.)
        val w = Window.partitionBy(pmod(year(col("month")), lit(1)))
          .orderBy("month")
        Tables.orders(s, d)
          .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
          .agg(round(sum("o_totalprice"), 2).as("rev"))
          .select(col("month"), col("rev"),
            round(col("rev") - coalesce(lag("rev", 1).over(w), col("rev")), 2)
              .as("delta"))
          .orderBy("month")
      },
      Some("""WITH m AS (
             |  SELECT date_trunc('month', o_orderdate) AS month,
             |    round(sum(o_totalprice), 2) AS rev
             |  FROM orders GROUP BY 1
             |)
             |SELECT month, rev,
             |  round(rev - coalesce(lag(rev, 1) OVER (ORDER BY month), rev), 2)
             |    AS delta
             |FROM m ORDER BY month""".stripMargin)),

    // INTERSECT / EXCEPT set semantics in one result: nations with
    // both customers and suppliers vs customer-only nations. Spark
    // plans these as distinct + semi/anti joins (broadcast here).
    Q("q28_set_ops",
      (s, d) => {
        val c = Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
        val sup = Tables.supplier(s, d).select(col("s_nationkey").as("nationkey"))
        c.intersect(sup).withColumn("side", lit("both"))
          .union(c.except(sup).withColumn("side", lit("cust_only")))
          .select("side", "nationkey")
          .orderBy("side", "nationkey")
      },
      Some("""SELECT 'both' AS side, nationkey FROM (
             |  SELECT c_nationkey AS nationkey FROM customer
             |  INTERSECT
             |  SELECT s_nationkey FROM supplier
             |)
             |UNION ALL
             |SELECT 'cust_only' AS side, nationkey FROM (
             |  SELECT c_nationkey AS nationkey FROM customer
             |  EXCEPT
             |  SELECT s_nationkey FROM supplier
             |)
             |ORDER BY side, nationkey""".stripMargin)),

    // Exact multi-column DISTINCT aggregation: two distinct counts at
    // different cardinalities plus a plain count in one pass — the
    // Expand-based distinct-agg plan (each row duplicated per
    // distinct clause, partial agg before the exchange).
    Q("q29_count_distinct",
      (s, d) => Tables.orders(s, d)
        .groupBy("o_orderstatus")
        .agg(countDistinct(col("o_custkey")).as("n_cust"),
          countDistinct(col("o_orderpriority")).as("n_prio"),
          count(lit(1)).as("n_orders"))
        .orderBy("o_orderstatus"),
      Some("""SELECT o_orderstatus,
             |  count(DISTINCT o_custkey) AS n_cust,
             |  count(DISTINCT o_orderpriority) AS n_prio,
             |  count(*) AS n_orders
             |FROM orders GROUP BY o_orderstatus
             |ORDER BY o_orderstatus""".stripMargin)),

    // FULL OUTER join over two pre-aggregated keyed sides, with real
    // unmatched rows on BOTH (the sampled customer set covers 12 of
    // 25 nations, the sampled supplier set 20) — coalesced keys and
    // zero-filled counts so the null-padding semantics are what the
    // oracle hashes.
    Q("q30_full_outer",
      (s, d) => {
        val c = Tables.customer(s, d)
          .filter(col("c_custkey") % 97 === 0)
          .groupBy(col("c_nationkey").as("nationkey"))
          .agg(count(lit(1)).as("n_cust"))
        val sup = Tables.supplier(s, d)
          .filter(col("s_suppkey") % 3 === 0)
          .groupBy(col("s_nationkey").as("nationkey"))
          .agg(count(lit(1)).as("n_supp"))
        c.join(sup, Seq("nationkey"), "full_outer")
          .select(col("nationkey"),
            coalesce(col("n_cust"), lit(0L)).as("n_cust"),
            coalesce(col("n_supp"), lit(0L)).as("n_supp"))
          .orderBy("nationkey")
      },
      Some("""SELECT nationkey,
             |  coalesce(c.n_cust, 0) AS n_cust,
             |  coalesce(s.n_supp, 0) AS n_supp
             |FROM (SELECT c_nationkey AS nationkey, count(*) AS n_cust
             |      FROM customer WHERE c_custkey % 97 = 0
             |      GROUP BY 1) c
             |FULL OUTER JOIN
             |     (SELECT s_nationkey AS nationkey, count(*) AS n_supp
             |      FROM supplier WHERE s_suppkey % 3 = 0
             |      GROUP BY 1) s
             |USING (nationkey)
             |ORDER BY nationkey""".stripMargin)),

    // Time-series gap filling (densification): months with no
    // qualifying orders appear as explicit zero rows. The spine is
    // generated from the aggregated min/max (two scalars broadcast
    // into a sequence — never a driver collect), then left-joined
    // back to the sparse counts. The high-value filter leaves real
    // gaps at the correctness SFs.
    Q("q31_gap_fill",
      (s, d) => {
        def hv = Tables.orders(s, d)
          .filter(col("o_totalprice") > 490000.0)
          .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
          .agg(count(lit(1)).as("n_orders"))
        val spine = hv.agg(min("month").as("lo"), max("month").as("hi"))
          .select(explode(expr("sequence(lo, hi, interval 1 month)"))
            .as("month"))
        spine.join(hv, Seq("month"), "left")
          .select(col("month"),
            coalesce(col("n_orders"), lit(0L)).as("n_orders"))
          .orderBy("month")
      },
      Some("""WITH hv AS (
             |  SELECT date_trunc('month', o_orderdate) AS month,
             |    count(*) AS n_orders
             |  FROM orders WHERE o_totalprice > CAST(490000 AS DOUBLE)
             |  GROUP BY 1
             |),
             |b AS (SELECT min(month) AS lo, max(month) AS hi FROM hv),
             |spine AS (
             |  SELECT unnest(generate_series(lo, hi, INTERVAL 1 MONTH))
             |    AS month
             |  FROM b
             |)
             |SELECT s.month AS month, coalesce(hv.n_orders, 0) AS n_orders
             |FROM spine s LEFT JOIN hv ON hv.month = s.month
             |ORDER BY 1""".stripMargin)),

    // Numeric histogram: fixed-width binning of order totals — one
    // scan, map-side bin computation, partial-agg groupBy on the bin
    // id. Bin arithmetic is integer floor((x - lo) / w) written
    // identically on both engines (no width_bucket dialect
    // divergence); the last bin is right-closed.
    Q("q32_histogram",
      (s, d) => {
        val lo = 0.0; val w = 30000.0; val bins = 20
        Tables.orders(s, d)
          .select(least(floor((col("o_totalprice") - lo) / w),
            lit((bins - 1).toLong)).cast("long").as("bin"))
          .groupBy("bin")
          .agg(count(lit(1)).as("n_orders"))
          .orderBy("bin")
      },
      Some("""SELECT least(CAST(floor((o_totalprice - CAST(0 AS DOUBLE))
             |         / CAST(30000 AS DOUBLE)) AS BIGINT), 19) AS bin,
             |  count(*) AS n_orders
             |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)),

    // CUBE: all four aggregation levels of (priority, status) in one
    // pass — completes the grouping-construct family alongside
    // ROLLUP (q10) and arbitrary GROUPING SETS (q25). Same Expand +
    // partial-agg plan: one exchange regardless of level count.
    Q("q37_cube",
      (s, d) => Tables.orders(s, d)
        .cube(col("o_orderpriority").as("priority"),
          col("o_orderstatus").as("status"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum("o_totalprice"), 2).as("revenue"))
        // Coalesce the nullable CUBE keys before ORDER BY (the q10
        // convention): Spark sorts NULLS FIRST, DuckDB NULLS LAST, so
        // ordering the raw keys would make the two engines' stated
        // output orders differ.
        .orderBy(coalesce(col("priority"), lit("ALL")),
          coalesce(col("status"), lit("ALL"))),
      Some("""SELECT o_orderpriority AS priority, o_orderstatus AS status,
             |  count(*) AS n_orders, round(sum(o_totalprice), 2) AS revenue
             |FROM orders
             |GROUP BY CUBE (o_orderpriority, o_orderstatus)
             |ORDER BY coalesce(priority, 'ALL'), coalesce(status, 'ALL')"""
        .stripMargin)),

    // TPC-H Q13 shape: the customer-order-count DISTRIBUTION,
    // including zero-order customers — the left join + count +
    // re-aggregation double grouping. Filtering the order side before
    // the join is the ON-clause predicate of the SQL form; Spark's
    // count(col) counts non-null matches, so no-order customers land
    // in bucket 0 rather than vanishing.
    Q("q34_custdist",
      (s, d) => {
        val c = Tables.customer(s, d).select("c_custkey")
        val o = Tables.orders(s, d)
          .filter(col("o_orderpriority") =!= "1-URGENT")
          .select("o_custkey", "o_orderkey")
        c.join(o, c("c_custkey") === o("o_custkey"), "left")
          .groupBy(c("c_custkey"))
          .agg(count(col("o_orderkey")).as("c_count"))
          .groupBy("c_count")
          .agg(count(lit(1)).as("custdist"))
          .orderBy(col("custdist").desc, col("c_count").desc)
      },
      Some("""SELECT c_count, count(*) AS custdist
             |FROM (
             |  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
             |  FROM customer c LEFT JOIN orders o
             |    ON c.c_custkey = o.o_custkey
             |   AND o.o_orderpriority <> '1-URGENT'
             |  GROUP BY c.c_custkey
             |)
             |GROUP BY c_count
             |ORDER BY custdist DESC, c_count DESC""".stripMargin)),

    // TPC-H Q21 shape (sole-blame suppliers): suppliers with returned
    // lines on multi-supplier orders where NO other supplier had a
    // return — the EXISTS + NOT-EXISTS double correlation, the
    // hardest decorrelation pattern in the TPC-H suite. Both
    // correlations compile to one semi and one anti hash join on
    // l_orderkey with the supplier inequality as residual; the
    // returned-pairs table is deduplicated once and reused on both
    // sides of the anti join.
    Q("q36_sole_blame",
      (s, d) => {
        val l = Tables.lineitem(s, d)
          .select("l_orderkey", "l_suppkey", "l_returnflag")
        val ret = l.filter(col("l_returnflag") === "R")
          .select("l_orderkey", "l_suppkey").distinct()
        val others = l.select(col("l_orderkey").as("o_k"),
          col("l_suppkey").as("o_s"))
        val otherRet = ret.select(col("l_orderkey").as("r_k"),
          col("l_suppkey").as("r_s"))
        ret
          .join(others, col("l_orderkey") === col("o_k") &&
            col("l_suppkey") =!= col("o_s"), "left_semi")
          .join(otherRet, col("l_orderkey") === col("r_k") &&
            col("l_suppkey") =!= col("r_s"), "left_anti")
          .groupBy(col("l_suppkey").as("suppkey"))
          .agg(count(lit(1)).as("numwait"))
          .orderBy(col("numwait").desc, col("suppkey"))
      },
      Some("""WITH ret AS (
             |  SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
             |  WHERE l_returnflag = 'R'
             |)
             |SELECT r.l_suppkey AS suppkey, count(*) AS numwait
             |FROM ret r
             |WHERE EXISTS (
             |    SELECT 1 FROM lineitem l2
             |    WHERE l2.l_orderkey = r.l_orderkey
             |      AND l2.l_suppkey <> r.l_suppkey)
             |  AND NOT EXISTS (
             |    SELECT 1 FROM ret r2
             |    WHERE r2.l_orderkey = r.l_orderkey
             |      AND r2.l_suppkey <> r.l_suppkey)
             |GROUP BY 1
             |ORDER BY numwait DESC, suppkey""".stripMargin)),

    // Sliding window frame (ROWS 2 PRECEDING): trailing 3-month
    // moving average over the pre-aggregated month table — the frame
    // type q23 (running total) and q27 (lag) don't cover. The window
    // runs over months only (bounded), never raw rows.
    Q("q35_sliding_avg",
      (s, d) => {
        // Constant-key partition: same deliberate single-partition
        // declaration as q27 (bounded month table).
        val w = Window.partitionBy(pmod(year(col("month")), lit(1)))
          .orderBy("month").rowsBetween(-2, 0)
        Tables.orders(s, d)
          .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
          .agg(round(sum("o_totalprice"), 2).as("rev"))
          .select(col("month"), col("rev"),
            round(avg("rev").over(w), 2).as("rev_ma3"))
          .orderBy("month")
      },
      Some("""WITH m AS (
             |  SELECT date_trunc('month', o_orderdate) AS month,
             |    round(sum(o_totalprice), 2) AS rev
             |  FROM orders GROUP BY 1
             |)
             |SELECT month, rev,
             |  round(avg(rev) OVER (ORDER BY month
             |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 2) AS rev_ma3
             |FROM m ORDER BY month""".stripMargin)),

    // TPC-H Q22 shape (global sales opportunity): positive-balance
    // customers above the average balance (scalar subquery → one
    // broadcast literal) with NO orders since 1998 (windowed NOT
    // EXISTS → anti join; every synthetic customer has SOME order,
    // so the unwindowed form is vacuous), re-grouped by nation.
    // Combines the three correlation forms — scalar subquery,
    // anti-join, and double aggregation — in the one query q8/q12
    // cover separately. The strict > against an averaged double is
    // boundary-safe: a 2-decimal balance equalling a many-decimal
    // average to the ulp does not occur.
    Q("q41_no_order_customers",
      (s, d) => {
        Tables.customer(s, d).createOrReplaceTempView("customer")
        Tables.orders(s, d).createOrReplaceTempView("orders")
        s.sql("""SELECT c_nationkey, count(*) AS numcust,
                |  round(sum(c_acctbal), 2) AS totacctbal
                |FROM customer
                |WHERE c_acctbal > (
                |    SELECT avg(c_acctbal) FROM customer
                |    WHERE c_acctbal > 0.0)
                |  AND NOT EXISTS (
                |    SELECT 1 FROM orders WHERE o_custkey = c_custkey
                |    AND o_orderdate >= TIMESTAMP '1998-01-01')
                |GROUP BY c_nationkey
                |ORDER BY c_nationkey""".stripMargin)
      },
      Some("""SELECT c_nationkey, count(*) AS numcust,
             |  round(sum(c_acctbal), 2) AS totacctbal
             |FROM customer
             |WHERE c_acctbal > (
             |    SELECT avg(c_acctbal) FROM customer
             |    WHERE c_acctbal > 0.0)
             |  AND NOT EXISTS (
             |    SELECT 1 FROM orders WHERE o_custkey = c_custkey
             |    AND o_orderdate >= TIMESTAMP '1998-01-01')
             |GROUP BY c_nationkey
             |ORDER BY c_nationkey""".stripMargin)),

    // Value-RANGE window frame — the third frame mode, alongside
    // ROWS-bounded (q35) and unbounded-running (q23): trailing
    // 90-DAY revenue per order date, where the frame is defined by
    // the ORDER-BY VALUE (days elapsed), not a row count — sparse
    // dates contribute exactly the days that fall in the interval.
    // Runs over the pre-aggregated per-day table only (bounded date
    // domain, never raw orders). Daily revenue is carried in integer
    // CENTS so the window sums are exact — a double sum's
    // frame-order rounding could straddle a .005 boundary between
    // engines.
    Q("q39_range_frame",
      (s, d) => {
        Tables.orders(s, d).createOrReplaceTempView("orders")
        s.sql("""WITH dd AS (
                |  SELECT o_orderdate AS d,
                |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                |      AS BIGINT) AS rev_c
                |  FROM orders GROUP BY 1
                |)
                |SELECT d, rev_c,
                |  sum(rev_c) OVER (ORDER BY d
                |    RANGE BETWEEN INTERVAL 90 DAYS PRECEDING
                |    AND CURRENT ROW) AS rev_90d_c
                |FROM dd ORDER BY d""".stripMargin)
      },
      Some("""WITH dd AS (
             |  SELECT o_orderdate AS d,
             |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
             |      AS BIGINT) AS rev_c
             |  FROM orders GROUP BY 1
             |)
             |SELECT d, rev_c,
             |  CAST(sum(rev_c) OVER (ORDER BY d
             |    RANGE BETWEEN INTERVAL 90 DAYS PRECEDING
             |    AND CURRENT ROW) AS BIGINT) AS rev_90d_c
             |FROM dd ORDER BY d""".stripMargin)),

    // Distribution-rank window family (ntile / percent_rank /
    // cume_dist — the remaining rank functions q7/q23/q27/q35/q39
    // don't cover): per-priority price deciles with the tie broken
    // by o_orderkey so every rank function is total-order
    // deterministic in both engines, then aggregated per decile so
    // the output is the decile profile (count, cents range, mean
    // percent_rank) a pricing-distribution report reads. Scale
    // shape: one hash exchange on the partition key; the decile
    // aggregation reuses the same partitioning map-side.
    Q("q42_ntile_deciles",
      (s, d) => {
        val w = Window.partitionBy(col("o_orderpriority"))
          .orderBy(col("price_c"), col("o_orderkey"))
        Tables.orders(s, d)
          .select(col("o_orderpriority"), col("o_orderkey"),
            floor(col("o_totalprice") * 100 + 0.5).cast("long")
              .as("price_c"))
          .withColumn("decile", ntile(10).over(w))
          .withColumn("pr", percent_rank().over(w))
          .withColumn("cd", cume_dist().over(w))
          .groupBy(col("o_orderpriority").as("priority"),
            col("decile").cast("long").as("decile"))
          .agg(count(lit(1)).as("n"),
            min("price_c").as("min_price_c"),
            max("price_c").as("max_price_c"),
            floor(avg(col("pr")) * 1000000 + 0.5).cast("long")
              .as("avg_pr_e6"),
            floor(max(col("cd")) * 1000000 + 0.5).cast("long")
              .as("max_cd_e6"))
          .orderBy("priority", "decile")
      },
      Some("""WITH r AS (
             |  SELECT o_orderpriority AS priority,
             |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
             |      AS price_c,
             |    ntile(10) OVER w AS decile,
             |    percent_rank() OVER w AS pr,
             |    cume_dist() OVER w AS cd
             |  FROM orders
             |  WINDOW w AS (PARTITION BY o_orderpriority
             |               ORDER BY CAST(floor(o_totalprice * 100
             |                 + 0.5) AS BIGINT), o_orderkey)
             |)
             |SELECT priority, CAST(decile AS BIGINT) AS decile,
             |  count(*) AS n,
             |  min(price_c) AS min_price_c,
             |  max(price_c) AS max_price_c,
             |  CAST(floor(avg(pr) * 1000000 + 0.5) AS BIGINT)
             |    AS avg_pr_e6,
             |  CAST(floor(max(cd) * 1000000 + 0.5) AS BIGINT)
             |    AS max_cd_e6
             |FROM r GROUP BY priority, decile
             |ORDER BY priority, decile""".stripMargin)),

    // Bloom-prune + exact-verify semi join (operators.BloomPrune):
    // revenue of lineitems belonging to one month's urgent orders.
    // The build side (45 keys here; a digest list / one day of
    // orders at scale) aggregates to a single bloom cell that
    // reaches the fact scan as a runtime scalar subquery; the
    // codegen'd might_contain filter drops ~all non-matching rows
    // BEFORE the semi join's exchange. Result is independent of the
    // bloom parameters (the semi join removes false positives), so
    // the oracle is the plain IN-subquery.
    Q("q43_bloom_semi",
      (s, d) => {
        val probe = Tables.orders(s, d)
          .filter(col("o_orderpriority") === "1-URGENT" &&
            col("o_orderdate") >= lit("1995-06-01") &&
            col("o_orderdate") < lit("1995-07-01"))
          .select(col("o_orderkey").as("l_orderkey"))
        BloomPrune.semiJoin(Tables.lineitem(s, d), probe, "l_orderkey",
            expectedItems = 100000L, fpp = 0.01)
          .groupBy(col("l_returnflag").as("returnflag"))
          .agg(count(lit(1)).as("n_items"),
            round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
              .as("revenue"))
          .orderBy("returnflag")
      },
      Some("""SELECT l_returnflag AS returnflag, count(*) AS n_items,
             |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
             |FROM lineitem
             |WHERE l_orderkey IN (
             |  SELECT o_orderkey FROM orders
             |  WHERE o_orderpriority = '1-URGENT'
             |    AND o_orderdate >= TIMESTAMP '1995-06-01'
             |    AND o_orderdate < TIMESTAMP '1995-07-01')
             |GROUP BY returnflag
             |ORDER BY returnflag""".stripMargin)),

    // Skew-safe aggregation (operators.SkewTools.saltedSumCount):
    // l_returnflag has THREE values across all of lineitem — the
    // pathological low-cardinality hot-key shape where partial
    // aggregation still lands each key's full partial set on one
    // reducer, and AQE can't help (its skew handling covers joins).
    // The two-stage salted plan splits every key across 16 reducers
    // (deterministic content salt — see the SPARK-23207 note on why
    // never rand/row-position), then combines the 3×16 partials.
    // Result is identical to the plain GROUP BY, which is the oracle.
    Q("q44_skew_agg",
      (s, d) => SkewTools.saltedSumCount(
          Tables.lineitem(s, d).select("l_returnflag", "l_quantity",
            "l_orderkey", "l_linenumber"),
          "l_returnflag", "l_quantity", salts = 16,
          saltByCols = Seq("l_orderkey", "l_linenumber"))
        .select(col("l_returnflag"), col("n"),
          round(col("sum"), 2).as("sum_qty"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag, count(*) AS n,
             |  round(sum(l_quantity), 2) AS sum_qty
             |FROM lineitem GROUP BY l_returnflag
             |ORDER BY l_returnflag""".stripMargin)),

    // EWMA revenue smoothing — the recurrence the window family
    // can't express (ewma_t = 0.3·x_t + 0.7·ewma_{t-1} depends on
    // its own previous OUTPUT, not a frame of inputs): computed as a
    // sequential HOF fold over the collected month series — bounded
    // BY CONSTRUCTION at ~80 rows (the q27/q35 month-table
    // contract), one aggregation exchange, never a per-row window.
    // The base is exact integer cents summed per month (order-
    // independent), so the 80-step double chain is bit-identical in
    // both engines; the oracle is the same recurrence as a recursive
    // CTE.
    Q("q46_ewma",
      (s, d) => {
        val monthly = Tables.orders(s, d)
          .groupBy(date_trunc("month", col("o_orderdate")).cast("date")
            .as("mon"))
          .agg(sum(floor(col("o_totalprice") * 100 + 0.5).cast("long"))
            .as("rev_c"))
        monthly
          .agg(array_sort(collect_list(struct(col("mon"), col("rev_c"))))
            .as("s"))
          .select(
            expr("transform(s, x -> x.mon)").as("mons"),
            expr("transform(s, x -> x.rev_c)").as("revs"),
            expr("""aggregate(transform(s, x -> cast(x.rev_c as double)),
                 |  cast(array() as array<double>),
                 |  (acc, x) -> case when size(acc) = 0 then array(x)
                 |    else array_append(acc,
                 |      0.3d * x + 0.7d * element_at(acc, -1)) end)
                 |""".stripMargin.replaceAll("\n", " ")).as("es"))
          .select(posexplode(arrays_zip(col("mons"), col("revs"),
            col("es"))).as(Seq("i", "z")))
          .select(col("z.mons").as("mon"), col("z.revs").as("rev_c"),
            floor(col("z.es") + 0.5).cast("long").as("ewma_c"))
          .orderBy("mon")
      },
      Some("""WITH RECURSIVE monthly AS (
             |  SELECT CAST(date_trunc('month', o_orderdate) AS DATE)
             |    AS mon,
             |    sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
             |      AS rev_c
             |  FROM orders GROUP BY 1
             |),
             |m AS (
             |  SELECT row_number() OVER (ORDER BY mon) AS rn, mon, rev_c
             |  FROM monthly
             |),
             |r AS (
             |  SELECT rn, mon, rev_c, CAST(rev_c AS DOUBLE) AS e
             |  FROM m WHERE rn = 1
             |  UNION ALL
             |  SELECT m.rn, m.mon, m.rev_c,
             |    CAST(0.3 AS DOUBLE) * m.rev_c + CAST(0.7 AS DOUBLE) * r.e
             |  FROM m JOIN r ON m.rn = r.rn + 1
             |)
             |SELECT CAST(mon AS DATE) AS mon,
             |  CAST(rev_c AS BIGINT) AS rev_c,
             |  CAST(floor(e + 0.5) AS BIGINT) AS ewma_c
             |FROM r ORDER BY mon""".stripMargin)),

    // Robust per-brand outlier detection: median / MAD (median
    // absolute deviation) instead of mean / stddev, so the gate
    // itself is not dragged by the outliers it hunts. BOTH medians
    // run through ExactPercentile's bounded-domain plan (state =
    // distinct cents values, never O(rows) buffers — the q15/d24
    // fix applied twice), the per-brand scalars broadcast back, and
    // the outlier rule is pure integer arithmetic in quarter-cent
    // fixed point (dev2 = 2·|x−med| and mad_c4 = 4·MAD are exact
    // integers because a median of integers is an integer or a
    // half): |x−med| > 3·MAD ⇔ 2·dev2 > 3·mad_c4.
    // Top-k per group WITHOUT a window: q7 ranks inside partitions
    // with row_number (fine when every group's rows are wanted);
    // when only the top k survive, the window shape shuffles and
    // sorts EVERY row into its group partition first — the bounded-
    // heap aggregate ships ≤ partitions·k candidates per group and
    // merges k-sized heaps (the e1 ANN shape on relational data).
    // Same (score DESC, id ASC) order as the oracle's row_number.
    Q("q50_topk_pergroup",
      (s, d) => {
        import graft.functions.TopKByScore.top_k_by_score
        Tables.orders(s, d)
          .groupBy("o_orderpriority")
          .agg(top_k_by_score(col("o_totalprice"), col("o_orderkey"),
            lit(0L), 3).as("tk"))
          .select(col("o_orderpriority"),
            posexplode(col("tk")).as(Seq("pos", "s")))
          .select(col("o_orderpriority"),
            (col("pos") + 1).cast("long").as("rank"),
            col("s.cand_id").as("o_orderkey"),
            floor(col("s.sim") * 100 + 0.5).cast("long").as("price_c"))
          .orderBy("o_orderpriority", "rank")
      },
      Some("""WITH r AS (
             |  SELECT o_orderpriority, o_orderkey, o_totalprice,
             |    row_number() OVER (PARTITION BY o_orderpriority
             |      ORDER BY o_totalprice DESC, o_orderkey) AS rank
             |  FROM orders
             |)
             |SELECT o_orderpriority, CAST(rank AS BIGINT) AS rank,
             |  o_orderkey,
             |  CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price_c
             |FROM r WHERE rank <= 3
             |ORDER BY o_orderpriority, rank""".stripMargin)),

    Q("q49_mad_outliers",
      (s, d) => {
        val c = Tables.part(s, d).select(col("p_brand"),
          floor(col("p_retailprice") * 100 + 0.5).cast("long").as("cents"))
        val med = ExactPercentile.grouped(c, Seq("p_brand"), "cents",
            Seq(("med", 0.5)))
          .select(col("p_brand"), col("med"))
        val dev = c.join(broadcast(med), "p_brand")
          .withColumn("dev2",
            abs(col("cents") * 2 - round(col("med") * 2).cast("long")))
        val mad = ExactPercentile.grouped(dev, Seq("p_brand"), "dev2",
            Seq(("mad2", 0.5)))
          .select(col("p_brand"), col("mad2"))
        dev.join(broadcast(mad), "p_brand")
          .groupBy("p_brand")
          .agg(
            max(round(col("med") * 4).cast("long")).as("med_c4"),
            max(round(col("mad2") * 2).cast("long")).as("mad_c4"),
            count(lit(1)).as("n_parts"),
            sum(when(col("dev2") * 2 >
                round(col("mad2") * 2).cast("long") * 3, 1L)
              .otherwise(0L)).as("n_outliers"))
          .orderBy("p_brand")
      },
      Some("""WITH c AS (
             |  SELECT p_brand,
             |    CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS cents
             |  FROM part
             |),
             |med AS (
             |  SELECT p_brand, quantile_cont(cents, 0.5) AS med
             |  FROM c GROUP BY p_brand
             |),
             |dev AS (
             |  SELECT c.p_brand, c.cents, med.med,
             |    abs(2 * c.cents
             |        - CAST(round(2 * med.med) AS BIGINT)) AS dev2
             |  FROM c JOIN med USING (p_brand)
             |),
             |mad AS (
             |  SELECT p_brand, quantile_cont(dev2, 0.5) AS mad2
             |  FROM dev GROUP BY p_brand
             |)
             |SELECT dev.p_brand,
             |  CAST(round(max(dev.med) * 4) AS BIGINT) AS med_c4,
             |  CAST(round(max(mad.mad2) * 2) AS BIGINT) AS mad_c4,
             |  count(*) AS n_parts,
             |  CAST(sum(CASE WHEN 2 * dev.dev2 >
             |      3 * CAST(round(2 * mad.mad2) AS BIGINT)
             |    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
             |FROM dev JOIN mad USING (p_brand)
             |GROUP BY dev.p_brand ORDER BY dev.p_brand""".stripMargin)),

    // Z-ORDER data layout audit — the file-skipping lever a 100 TB
    // table lives or dies by when queries filter on TWO columns
    // (here o_custkey × o_orderdate): bucket each dimension to a
    // 16-rank grid, interleave the bits into an 8-bit Morton code,
    // and cut the table into 32 files along fixed Morton ranges
    // (morton >> 3 — what OPTIMIZE ZORDER BY clustering produces).
    // The per-file min/max of BOTH dimensions is the footer stat a
    // scan consults; `touched` replays a 3..5 × 3..5 predicate box
    // against those stats — 4 of 32 files scanned at every SF,
    // where a single-column sort layout would touch ~all files for
    // the second dimension. Everything is map-side integer math
    // (the one-row min/max aggregate broadcasts); no window, no
    // global sort — layout assignment is embarrassingly parallel,
    // exactly what a repartition-by-Morton-range write needs.
    Q("q53_zorder",
      (s, d) => {
        val o = Tables.orders(s, d).select(
          col("o_custkey").cast("long").as("x"),
          datediff(col("o_orderdate"), lit("1992-01-01").cast("date"))
            .cast("long").as("y"))
        val st = o.agg(min("x").as("minx"), max("x").as("maxx"),
          min("y").as("miny"), max("y").as("maxy"))
        def bit(c: org.apache.spark.sql.Column, i: Int, pos: Int) =
          shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), pos)
        val morton = (0 until 4).map(i =>
            bit(col("bx"), i, 2 * i + 1)
              .bitwiseOR(bit(col("by"), i, 2 * i)))
          .reduce(_.bitwiseOR(_))
        o.crossJoin(broadcast(st))
          .select(
            expr("(x - minx) * 16 div (maxx - minx + 1)").as("bx"),
            expr("(y - miny) * 16 div (maxy - miny + 1)").as("by"))
          .withColumn("file_id", shiftright(morton, 3).cast("long"))
          .groupBy("file_id")
          .agg(count(lit(1)).as("n"),
            min("bx").as("min_bx"), max("bx").as("max_bx"),
            min("by").as("min_by"), max("by").as("max_by"))
          .withColumn("touched",
            when(col("max_bx") >= 3 && col("min_bx") <= 5 &&
              col("max_by") >= 3 && col("min_by") <= 5, 1L)
              .otherwise(0L))
          .orderBy("file_id")
      },
      Some("""WITH o AS (
             |  SELECT o_custkey AS x,
             |    datediff('day', DATE '1992-01-01', o_orderdate) AS y
             |  FROM orders
             |),
             |st AS (
             |  SELECT min(x) AS minx, max(x) AS maxx,
             |    min(y) AS miny, max(y) AS maxy
             |  FROM o
             |),
             |b AS (
             |  SELECT (x - minx) * 16 // (maxx - minx + 1) AS bx,
             |    (y - miny) * 16 // (maxy - miny + 1) AS by
             |  FROM o, st
             |),
             |m AS (
             |  SELECT bx, by,
             |    (((bx >> 0) & 1) << 1) | (((by >> 0) & 1) << 0)
             |    | (((bx >> 1) & 1) << 3) | (((by >> 1) & 1) << 2)
             |    | (((bx >> 2) & 1) << 5) | (((by >> 2) & 1) << 4)
             |    | (((bx >> 3) & 1) << 7) | (((by >> 3) & 1) << 6)
             |      AS morton
             |  FROM b
             |),
             |g AS (
             |  SELECT morton // 8 AS file_id, count(*) AS n,
             |    min(bx) AS min_bx, max(bx) AS max_bx,
             |    min(by) AS min_by, max(by) AS max_by
             |  FROM m GROUP BY 1
             |)
             |SELECT CAST(file_id AS BIGINT) AS file_id, n,
             |  CAST(min_bx AS BIGINT) AS min_bx,
             |  CAST(max_bx AS BIGINT) AS max_bx,
             |  CAST(min_by AS BIGINT) AS min_by,
             |  CAST(max_by AS BIGINT) AS max_by,
             |  CAST(CASE WHEN max_bx >= 3 AND min_bx <= 5
             |        AND max_by >= 3 AND min_by <= 5
             |       THEN 1 ELSE 0 END AS BIGINT) AS touched
             |FROM g ORDER BY file_id""".stripMargin)),

    // Interval-overlap sweep line: each order is "open" from its
    // order date to its last lineitem ship date; per priority class,
    // the peak number of simultaneously-open orders and the first
    // day that peak is reached. The scale trick: deltas are
    // pre-aggregated to one net (+opens − closes) row per
    // (priority, day) by a distributed hash agg BEFORE any window —
    // the running-sum window then scans only O(priorities × days)
    // rows, so the per-priority partition skew is bounded by the
    // calendar, not the data.
    Q("q54_order_concurrency",
      (s, d) => {
        val closes = Tables.lineitem(s, d)
          .groupBy(col("l_orderkey"))
          .agg(max(col("l_shipdate")).as("close_ts"))
        val o = Tables.orders(s, d)
          .join(closes, col("o_orderkey") === col("l_orderkey"))
        val deltas = o.select(col("o_orderpriority"),
            to_date(col("o_orderdate")).as("day"), lit(1L).as("delta"))
          .union(o.select(col("o_orderpriority"),
            date_add(to_date(col("close_ts")), 1).as("day"),
            lit(-1L).as("delta")))
        val net = deltas.groupBy(col("o_orderpriority"), col("day"))
          .agg(sum("delta").as("net"))
        val wRun = Window.partitionBy("o_orderpriority").orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val open = net.withColumn("open", sum("net").over(wRun))
        val wPick = Window.partitionBy("o_orderpriority")
          .orderBy(col("open").desc, col("day").asc)
        open.withColumn("rn", row_number().over(wPick))
          .filter(col("rn") === 1)
          .select(col("o_orderpriority"), col("open").as("peak_open"),
            col("day").as("peak_day"))
          .orderBy("o_orderpriority")
      },
      Some("""WITH closes AS (
             |  SELECT l_orderkey, max(l_shipdate) AS close_ts
             |  FROM lineitem GROUP BY 1
             |),
             |deltas AS (
             |  SELECT o_orderpriority, CAST(o_orderdate AS DATE) AS day,
             |    CAST(1 AS BIGINT) AS delta
             |  FROM orders JOIN closes ON o_orderkey = l_orderkey
             |  UNION ALL
             |  SELECT o_orderpriority,
             |    CAST(close_ts AS DATE) + 1,
             |    CAST(-1 AS BIGINT)
             |  FROM orders JOIN closes ON o_orderkey = l_orderkey
             |),
             |net AS (
             |  SELECT o_orderpriority, day, sum(delta) AS net
             |  FROM deltas GROUP BY 1, 2
             |),
             |run AS (
             |  SELECT o_orderpriority, day,
             |    sum(net) OVER (PARTITION BY o_orderpriority ORDER BY day
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      AS open
             |  FROM net
             |)
             |SELECT o_orderpriority, CAST(open AS BIGINT) AS peak_open,
             |  day AS peak_day
             |FROM (
             |  SELECT *, row_number() OVER (PARTITION BY o_orderpriority
             |    ORDER BY open DESC, day ASC) AS rn
             |  FROM run
             |) WHERE rn = 1
             |ORDER BY o_orderpriority""".stripMargin)),

    // Islands-and-gaps: per customer, runs of CONSECUTIVE order
    // months (month_idx − row_number is constant within a run).
    // Output is the per-customer streak card: number of streaks,
    // longest streak, and the start month of the longest (earliest
    // wins ties) — all exact integers. Windows partition by
    // customer (high-cardinality key → no skew) over the tiny
    // per-customer distinct-month list.
    Q("q55_order_streaks",
      (s, d) => {
        val months = Tables.orders(s, d)
          .select(col("o_custkey"),
            (year(col("o_orderdate")) * 12 + month(col("o_orderdate")) - 1)
              .cast("long").as("m"))
          .distinct()
        val wSeq = Window.partitionBy("o_custkey").orderBy("m")
        val isl = months
          .withColumn("grp", col("m") - row_number().over(wSeq))
        val runs = isl.groupBy("o_custkey", "grp")
          .agg(count(lit(1)).as("len"), min("m").as("start_m"))
        val wBest = Window.partitionBy("o_custkey")
          .orderBy(col("len").desc, col("start_m").asc)
        runs
          .withColumn("n_streaks",
            count(lit(1)).over(Window.partitionBy("o_custkey")))
          .withColumn("rn", row_number().over(wBest))
          .filter(col("rn") === 1)
          .select(col("o_custkey"), col("n_streaks"),
            col("len").as("longest"), col("start_m").as("longest_start"))
          .orderBy("o_custkey")
      },
      Some("""WITH months AS (
             |  SELECT DISTINCT o_custkey,
             |    year(o_orderdate) * 12 + month(o_orderdate) - 1 AS m
             |  FROM orders
             |),
             |isl AS (
             |  SELECT o_custkey, m,
             |    m - row_number() OVER (PARTITION BY o_custkey ORDER BY m)
             |      AS grp
             |  FROM months
             |),
             |runs AS (
             |  SELECT o_custkey, grp, count(*) AS len, min(m) AS start_m
             |  FROM isl GROUP BY 1, 2
             |)
             |SELECT o_custkey, n_streaks, len AS longest,
             |  start_m AS longest_start
             |FROM (
             |  SELECT *, row_number() OVER (PARTITION BY o_custkey
             |    ORDER BY len DESC, start_m ASC) AS rn,
             |    count(*) OVER (PARTITION BY o_custkey) AS n_streaks
             |  FROM runs
             |) WHERE rn = 1
             |ORDER BY o_custkey""".stripMargin)),

    // Running-max drawdown: per customer, track the running PEAK of
    // order value over time and the largest peak-to-current drop —
    // the only window frame family not yet exercised (running max;
    // q23 = running sum, q46 = recursive EWMA, q35 = sliding avg).
    // The detector for "this account's orders collapsed from their
    // high" — churn-risk shape. Windows partition on the
    // high-cardinality customer key; money stays at 2 decimals on
    // both sides.
    Q("q56_drawdown",
      (s, d) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val dd = Tables.orders(s, d)
          .withColumn("peak", max(col("o_totalprice")).over(w))
          .withColumn("drawdown",
            round(col("peak") - col("o_totalprice"), 2))
        val wPick = Window.partitionBy("o_custkey")
          .orderBy(col("drawdown").desc, col("o_orderdate"),
            col("o_orderkey"))
        dd.withColumn("rn", row_number().over(wPick))
          .filter(col("rn") === 1)
          .select(col("o_custkey"), col("drawdown").as("max_drawdown"),
            col("o_orderdate").as("at_date"))
          .orderBy("o_custkey")
      },
      Some("""WITH dd AS (
             |  SELECT o_custkey, o_orderkey, o_orderdate,
             |    round(max(o_totalprice) OVER (PARTITION BY o_custkey
             |      ORDER BY o_orderdate, o_orderkey
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      - o_totalprice, 2) AS drawdown
             |  FROM orders
             |)
             |SELECT o_custkey, drawdown AS max_drawdown,
             |  o_orderdate AS at_date
             |FROM (
             |  SELECT *, row_number() OVER (PARTITION BY o_custkey
             |    ORDER BY drawdown DESC, o_orderdate, o_orderkey) AS rn
             |  FROM dd
             |) WHERE rn = 1
             |ORDER BY o_custkey""".stripMargin)),

    // Cohort LTV matrix: customers grouped by FIRST-order month
    // (the acquisition cohort), revenue and activity tracked by
    // months-since-acquisition — the (cohort × age) triangle every
    // subscription/commerce warehouse reports, and the revenue
    // sibling of q45's event retention. Scale shape: the first-month
    // derivation is one min() aggregate on the high-cardinality
    // customer key (partial-aggregated), joined back to orders on
    // the same key, then one partial-agg exchange on the BOUNDED
    // (cohort, age) grid; month arithmetic is exact integers
    // (year·12+month), money stays at 2 decimals.
    Q("q58_cohort_ltv",
      (s, d) => {
        val o = Tables.orders(s, d).select(col("o_custkey"),
          (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
            .cast("long").as("m_idx"),
          col("o_totalprice"))
        val first = o.groupBy("o_custkey")
          .agg(min("m_idx").as("cohort_m"))
        o.join(first, "o_custkey")
          .groupBy(col("cohort_m"),
            (col("m_idx") - col("cohort_m")).as("months_since"))
          .agg(countDistinct("o_custkey").as("n_customers"),
            count(lit(1)).as("n_orders"),
            round(sum("o_totalprice"), 2).as("revenue"))
          .orderBy("cohort_m", "months_since")
      },
      Some("""WITH o AS (
             |  SELECT o_custkey,
             |    CAST(year(o_orderdate) * 12 + month(o_orderdate)
             |      AS BIGINT) AS m_idx,
             |    o_totalprice
             |  FROM orders
             |),
             |f AS (
             |  SELECT o_custkey, min(m_idx) AS cohort_m
             |  FROM o GROUP BY o_custkey
             |)
             |SELECT cohort_m, m_idx - cohort_m AS months_since,
             |  CAST(count(DISTINCT o.o_custkey) AS BIGINT) AS n_customers,
             |  count(*) AS n_orders,
             |  round(sum(o_totalprice), 2) AS revenue
             |FROM o JOIN f USING (o_custkey)
             |GROUP BY 1, 2
             |ORDER BY cohort_m, months_since""".stripMargin)),

    // TPC-H Q9 shape (product-line profit): per (supplier nation,
    // order year), sum of line profit = discounted revenue minus a
    // retail-derived cost proxy, over one product family (the
    // dataset has no partsupp table, so p_retailprice·qty·0.6 stands
    // in for ps_supplycost·qty — the JOIN SHAPE is the point). The
    // heaviest relational plan in the suite: a 5-way join where
    // lineitem joins orders on the fact key while part/supplier/
    // nation broadcast (dimension sides — no shuffle of the fact
    // table for them), then one partial-agg exchange on the bounded
    // (nation, year) grid. The part filter prunes BEFORE the join
    // (pushed to the scan). Literal discipline: CAST(0.6 AS DOUBLE)
    // on the DuckDB side — a bare 0.6 is DECIMAL and would round
    // differently.
    Q("q59_profit",
      (s, d) => {
        val p = Tables.part(s, d)
          .filter(col("p_name").like("%widget%"))
        val l = Tables.lineitem(s, d)
        val o = Tables.orders(s, d)
        val sup = Tables.supplier(s, d)
        val n = Tables.nation(s, d)
        l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
          .join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name").as("nation"),
            year(col("o_orderdate")).cast("long").as("o_year"))
          .agg(round(sum(
            col("l_extendedprice") * (lit(1.0) - col("l_discount"))
              - col("p_retailprice") * col("l_quantity") * lit(0.6)), 2)
            .as("profit"))
          .orderBy(col("nation"), col("o_year").desc)
      },
      Some("""SELECT n_name AS nation,
             |  CAST(year(o_orderdate) AS BIGINT) AS o_year,
             |  round(sum(l_extendedprice * (1.0 - l_discount)
             |    - p_retailprice * l_quantity * CAST(0.6 AS DOUBLE)), 2)
             |    AS profit
             |FROM lineitem
             |JOIN part ON l_partkey = p_partkey
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN supplier ON l_suppkey = s_suppkey
             |JOIN nation ON s_nationkey = n_nationkey
             |WHERE p_name LIKE '%widget%'
             |GROUP BY 1, 2
             |ORDER BY nation, o_year DESC""".stripMargin)),

    // 2-D skyline (Pareto frontier) per market segment: orders no
    // other same-segment order beats on BOTH (earlier-or-equal date,
    // higher-or-equal price, strictly better in one) — the classic
    // multi-criteria shortlist ("cheapest-and-earliest" frontier).
    // Plan: a coarse month-grid pre-prune — per (segment, month) max
    // price, running max over EARLIER months (a tiny broadcast) —
    // discards every order provably dominated across a month
    // boundary BEFORE the exact pass, so the per-segment range
    // windows sort only the surviving sliver (skyline pruning:
    // dominance is transitive, so filtering by any subset of
    // dominators never changes the frontier). The exact pass is two
    // RANGE-frame windows on the day number: m1 = best price at any
    // STRICTLY earlier date, m2 = best price up to the same date;
    // skyline ⇔ m1 < price AND m2 ≤ price. The oracle states the
    // same frontier with DuckDB's interval range frames over the FULL
    // input — no pre-prune — so it independently checks that the
    // prune never drops a frontier member.
    Q("q62_skyline",
      (s, d) => {
        val rows = Tables.orders(s, d)
          .join(Tables.customer(s, d),
            col("o_custkey") === col("c_custkey"))
          .select(col("c_mktsegment").as("segment"), col("o_orderkey"),
            col("o_orderdate"), col("o_totalprice"),
            datediff(col("o_orderdate"), lit("1992-01-01")).as("dd"),
            trunc(col("o_orderdate"), "month").as("mon"))
        Skyline.frontier2d(rows, groupCol = "segment", xCol = "dd",
            yCol = "o_totalprice", bucketCol = "mon")
          .select(col("segment"), col("o_orderkey"), col("o_orderdate"),
            col("o_totalprice"))
          .orderBy("segment", "o_orderkey")
      },
      Some("""WITH r AS (
             |  SELECT c_mktsegment AS segment, o_orderkey,
             |    o_orderdate, o_totalprice
             |  FROM orders JOIN customer ON o_custkey = c_custkey
             |),
             |m AS (
             |  SELECT segment, o_orderkey, o_orderdate, o_totalprice,
             |    max(o_totalprice) OVER (PARTITION BY segment
             |      ORDER BY o_orderdate RANGE BETWEEN UNBOUNDED PRECEDING
             |      AND INTERVAL 1 DAY PRECEDING) AS m1,
             |    max(o_totalprice) OVER (PARTITION BY segment
             |      ORDER BY o_orderdate RANGE BETWEEN UNBOUNDED PRECEDING
             |      AND CURRENT ROW) AS m2
             |  FROM r
             |)
             |SELECT segment, o_orderkey, o_orderdate, o_totalprice
             |FROM m
             |WHERE (m1 IS NULL OR m1 < o_totalprice)
             |  AND m2 <= o_totalprice
             |ORDER BY segment, o_orderkey""".stripMargin))
  )

  private val GroupingSetsSql =
    """SELECT coalesce(o_orderpriority, 'ALL') AS priority,
      |  coalesce(o_orderstatus, 'ALL') AS status,
      |  count(*) AS n_orders,
      |  round(sum(o_totalprice), 2) AS total_price
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
      |                        (o_orderstatus), ())
      |ORDER BY priority, status""".stripMargin

  private val CorrSubquerySql =
    """SELECT c_custkey, c_nationkey
      |FROM customer c
      |WHERE c_acctbal > CAST(2.0 AS DOUBLE) * (
      |  SELECT avg(c2.c_acctbal) FROM customer c2
      |  WHERE c2.c_nationkey = c.c_nationkey)
      |ORDER BY c_custkey""".stripMargin
}
