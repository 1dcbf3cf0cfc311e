package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** TPC-H-pattern coverage beyond the q1/q3/q5/q6/q18 set: with this pack
  * all 22 canonical TPC-H operator shapes are represented — EXISTS /
  * NOT-EXISTS decorrelation, disjunctive predicate pushdown, two-sided
  * nation self-join, scalar subquery thresholds, correlated-aggregate
  * thresholds (min/avg/fraction-of-total), join histograms, conditional
  * aggregation — adapted to the fixture schema (no `partsupp`, no
  * ship/commit/receipt triple, so queries needing those express the same
  * plan shape over the lineitem-derived relations instead).
  *
  * Oracle-determinism discipline: any float that feeds a COMPARISON
  * (join-back equality, threshold filter) is either an order-insensitive
  * aggregate (MIN) or a sum/avg of integer-valued columns (exact in
  * double for any summation order); order-sensitive float sums appear
  * only in rounded OUTPUT columns.
  *
  * Scale notes (100 TB discipline), per query:
  *  - every dimension join (`part`, `supplier`, `nation`, `region`) is
  *    broadcast — the lineitem/orders fact side never shuffles for them;
  *  - EXISTS/NOT EXISTS become left-semi / left-anti joins keyed on the
  *    fact key — decorrelated, no per-row subquery;
  *  - scalar thresholds (q22) are a 1-row aggregate crossJoin-broadcast,
  *    not a driver-side collect;
  *  - top-k surfaces plan as TakeOrderedAndProject.
  *
  * Reference context: the reference's SQL surface is flat scans with
  * WHERE fragments (cnics_to_fhir.py:106-156); these queries are part of
  * the general-analytics extension (SURVEY §7.5).
  */
object TpchMoreQueries {
  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables(s, d, n)

  val defs: Seq[QueryDef] = Seq(

    // ── Q4 shape: EXISTS decorrelated to a conditioned left-semi join ──
    QueryDef(
      "q4_priority_exists",
      "orders with a late-shipping line (EXISTS → conditioned semi join)",
      (s, d) => {
        val ord = t(s, d, "orders")
          .filter(col("o_orderdate") >= lit("1996-01-01") && col("o_orderdate") < lit("1996-07-01"))
          .select("o_orderkey", "o_orderdate", "o_orderpriority")
        val li = t(s, d, "lineitem").select("l_orderkey", "l_shipdate")
        ord.join(li,
            col("o_orderkey") === col("l_orderkey") &&
              col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS"),
            "left_semi")
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("order_count"))
      },
      Some("""SELECT o_orderpriority, count(*) AS order_count FROM orders
             |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
             |AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
             |AND EXISTS (SELECT 1 FROM lineitem
             |  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
             |GROUP BY o_orderpriority""".stripMargin)),

    // ── Q7 shape: two-sided nation dimension (joined twice under
    //    different roles) with a symmetric pair predicate ──
    QueryDef(
      "q7_volume_shipping",
      "bilateral supplier↔customer nation volume by ship year",
      (s, d) => {
        val n1 = broadcast(t(s, d, "nation")
          .select(col("n_nationkey").as("s_nkey"), col("n_name").as("supp_nation")))
        val n2 = broadcast(t(s, d, "nation")
          .select(col("n_nationkey").as("c_nkey"), col("n_name").as("cust_nation")))
        val sup = broadcast(t(s, d, "supplier").select("s_suppkey", "s_nationkey"))
        t(s, d, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
          .join(t(s, d, "orders").select("o_orderkey", "o_custkey"),
            col("l_orderkey") === col("o_orderkey"))
          .join(t(s, d, "customer").select("c_custkey", "c_nationkey"),
            col("o_custkey") === col("c_custkey"))
          .join(sup, col("l_suppkey") === col("s_suppkey"))
          .join(n1, col("s_nationkey") === col("s_nkey"))
          .join(n2, col("c_nationkey") === col("c_nkey"))
          .filter((col("supp_nation") === "NATION_3" && col("cust_nation") === "NATION_7") ||
            (col("supp_nation") === "NATION_7" && col("cust_nation") === "NATION_3"))
          .groupBy(col("supp_nation"), col("cust_nation"), year(col("l_shipdate")).as("l_year"))
          .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
      },
      Some("""SELECT supp_nation, cust_nation, l_year, round(sum(volume), 2) AS revenue
             |FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             |  EXTRACT(year FROM l_shipdate) AS l_year,
             |  l_extendedprice * (1.0 - l_discount) AS volume
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |  JOIN customer ON o_custkey = c_custkey
             |  JOIN supplier ON l_suppkey = s_suppkey
             |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
             |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
             |  WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
             |     OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
             |GROUP BY supp_nation, cust_nation, l_year""".stripMargin)),

    // ── Q8 shape: market share — conditional volume over total volume ──
    QueryDef(
      "q8_market_share",
      "one nation's share of regional ECONOMY-part volume by order year",
      (s, d) => {
        val custAm = t(s, d, "customer").select("c_custkey", "c_nationkey")
          .join(broadcast(t(s, d, "nation")
            .join(broadcast(t(s, d, "region").filter(col("r_name") === "AMERICA")),
              col("n_regionkey") === col("r_regionkey"))
            .select(col("n_nationkey").as("am_nkey"))),
            col("c_nationkey") === col("am_nkey"))
          .select("c_custkey")
        val pEco = broadcast(t(s, d, "part").filter(col("p_type") === "ECONOMY").select("p_partkey"))
        val supN = broadcast(t(s, d, "supplier").select("s_suppkey", "s_nationkey")
          .join(broadcast(t(s, d, "nation")
            .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))),
            col("s_nationkey") === col("sn_key"))
          .select("s_suppkey", "supp_nation"))
        t(s, d, "lineitem").select("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
          .join(pEco, col("l_partkey") === col("p_partkey"))
          .join(t(s, d, "orders").select("o_orderkey", "o_custkey", "o_orderdate"),
            col("l_orderkey") === col("o_orderkey"))
          .join(custAm, col("o_custkey") === col("c_custkey"), "left_semi")
          .join(supN, col("l_suppkey") === col("s_suppkey"))
          .withColumn("volume", col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .groupBy(year(col("o_orderdate")).as("o_year"))
          .agg(round(
            sum(when(col("supp_nation") === "NATION_5", col("volume")).otherwise(lit(0.0))) /
              sum(col("volume")), 4).as("mkt_share"))
      },
      Some("""SELECT o_year, round(sum(CASE WHEN supp_nation = 'NATION_5' THEN volume ELSE 0.0 END)
             |  / sum(volume), 4) AS mkt_share
             |FROM (SELECT EXTRACT(year FROM o_orderdate) AS o_year,
             |  l_extendedprice * (1.0 - l_discount) AS volume, n2.n_name AS supp_nation
             |  FROM lineitem JOIN part ON l_partkey = p_partkey
             |  JOIN orders ON l_orderkey = o_orderkey
             |  JOIN customer ON o_custkey = c_custkey
             |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
             |  JOIN region ON n1.n_regionkey = r_regionkey
             |  JOIN supplier ON l_suppkey = s_suppkey
             |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
             |  WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY')
             |GROUP BY o_year""".stripMargin)),

    // ── Q9 shape: profit by supplier nation × order year for a part-name
    //    pattern (big multi-join partial aggregation; bench) ──
    QueryDef(
      "q9_profit_by_nation",
      "revenue by supplier nation and order year for '%red%' parts",
      (s, d) => {
        val pRed = broadcast(t(s, d, "part")
          .filter(col("p_name").like("%red%")).select("p_partkey"))
        val supN = broadcast(t(s, d, "supplier").select("s_suppkey", "s_nationkey")
          .join(broadcast(t(s, d, "nation")
            .select(col("n_nationkey"), col("n_name").as("nation"))),
            col("s_nationkey") === col("n_nationkey"))
          .select("s_suppkey", "nation"))
        t(s, d, "lineitem").select("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
          .join(pRed, col("l_partkey") === col("p_partkey"), "left_semi")
          .join(t(s, d, "orders").select("o_orderkey", "o_orderdate"),
            col("l_orderkey") === col("o_orderkey"))
          .join(supN, col("l_suppkey") === col("s_suppkey"))
          .groupBy(col("nation"), year(col("o_orderdate")).as("o_year"))
          .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("profit"))
      },
      Some("""SELECT nation, o_year, round(sum(volume), 2) AS profit
             |FROM (SELECT n_name AS nation, EXTRACT(year FROM o_orderdate) AS o_year,
             |  l_extendedprice * (1.0 - l_discount) AS volume
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |  JOIN supplier ON l_suppkey = s_suppkey
             |  JOIN nation ON s_nationkey = n_nationkey
             |  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%red%'))
             |GROUP BY nation, o_year""".stripMargin),
      bench = true),

    // ── Q10 shape: returned-item ranking, top-20 customers ──
    QueryDef(
      "q10_returned_items",
      "revenue lost to returns per customer, one quarter, top 20",
      (s, d) => {
        val ord = t(s, d, "orders")
          .filter(col("o_orderdate") >= lit("1997-01-01") && col("o_orderdate") < lit("1997-04-01"))
          .select("o_orderkey", "o_custkey")
        t(s, d, "lineitem").filter(col("l_returnflag") === "R")
          .select("l_orderkey", "l_extendedprice", "l_discount")
          .join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(t(s, d, "customer").select("c_custkey", "c_name", "c_acctbal", "c_nationkey"),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(t(s, d, "nation").select("n_nationkey", "n_name")),
            col("c_nationkey") === col("n_nationkey"))
          .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
          .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
          .orderBy(col("revenue").desc, col("c_custkey"))
          .limit(20)
      },
      Some("""SELECT c_custkey, c_name, c_acctbal, n_name,
             |round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation ON c_nationkey = n_nationkey
             |WHERE l_returnflag = 'R'
             |AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
             |AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
             |GROUP BY c_custkey, c_name, c_acctbal, n_name
             |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin)),

    // ── Q12 shape: two conditional counts per group (priority classes) ──
    QueryDef(
      "q12_priority_lines",
      "high/low order-priority line counts per line status, one ship year",
      (s, d) => {
        val hi = col("o_orderpriority") === "1-URGENT" || col("o_orderpriority") === "2-HIGH"
        t(s, d, "lineitem")
          .filter(col("l_shipdate") >= lit("1997-01-01") && col("l_shipdate") < lit("1998-01-01"))
          .select("l_orderkey", "l_linestatus")
          .join(t(s, d, "orders").select("o_orderkey", "o_orderpriority"),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy("l_linestatus")
          .agg(count(when(hi, lit(1))).as("high_line_count"),
            count(when(!hi, lit(1))).as("low_line_count"))
      },
      Some("""SELECT l_linestatus,
             |count(*) FILTER (WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')) AS high_line_count,
             |count(*) FILTER (WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH')) AS low_line_count
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
             |AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
             |GROUP BY l_linestatus""".stripMargin)),

    // ── Q14 shape: promotion share of one month's revenue (scalar %) ──
    QueryDef(
      "q14_promo_revenue",
      "PROMO parts' percentage of one month's revenue",
      (s, d) =>
        t(s, d, "lineitem")
          .filter(col("l_shipdate") >= lit("1997-03-01") && col("l_shipdate") < lit("1997-04-01"))
          .select("l_partkey", "l_extendedprice", "l_discount")
          .join(broadcast(t(s, d, "part").select("p_partkey", "p_type")),
            col("l_partkey") === col("p_partkey"))
          .withColumn("volume", col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .agg(round(
            lit(100.0) * sum(when(col("p_type") === "PROMO", col("volume")).otherwise(lit(0.0))) /
              sum(col("volume")), 4).as("promo_revenue")),
      Some("""SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
             |  THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END)
             |  / sum(l_extendedprice * (1.0 - l_discount)), 4) AS promo_revenue
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |WHERE l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
             |AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'""".stripMargin)),

    // ── Q16 shape: supplier variety per part class (count distinct over
    //    the lineitem-derived part↔supplier relation; no partsupp table) ──
    QueryDef(
      "q16_supplier_variety",
      "distinct suppliers per (brand, type, size) class, one brand excluded",
      (s, d) =>
        t(s, d, "lineitem").select("l_partkey", "l_suppkey")
          .join(broadcast(t(s, d, "part")
            .filter(col("p_brand") =!= "Brand#1" &&
              col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35, 40, 45, 50))
            .select("p_partkey", "p_brand", "p_type", "p_size")),
            col("l_partkey") === col("p_partkey"))
          .groupBy("p_brand", "p_type", "p_size")
          .agg(countDistinct("l_suppkey").as("supplier_cnt")),
      Some("""SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |WHERE p_brand <> 'Brand#1'
             |AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35, 40, 45, 50)
             |GROUP BY p_brand, p_type, p_size""".stripMargin)),

    // ── Q19 shape: disjunction of conjunctive brand/size/quantity
    //    ranges — the disjunctive-pushdown stress (bench) ──
    QueryDef(
      "q19_disjunctive_revenue",
      "revenue under three OR-ed brand/size/quantity windows",
      (s, d) =>
        t(s, d, "lineitem").select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
          .join(broadcast(t(s, d, "part").select("p_partkey", "p_brand", "p_size")),
            col("l_partkey") === col("p_partkey"))
          .filter(
            (col("p_brand") === "Brand#1" && col("p_size").between(1, 5) && col("l_quantity").between(1, 11)) ||
            (col("p_brand") === "Brand#2" && col("p_size").between(1, 10) && col("l_quantity").between(10, 20)) ||
            (col("p_brand") === "Brand#3" && col("p_size").between(1, 15) && col("l_quantity").between(20, 30)))
          .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue")),
      Some("""SELECT round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5 AND l_quantity BETWEEN 1 AND 11)
             |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
             |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)""".stripMargin),
      bench = true),

    // ── Q21 shape: EXISTS + NOT EXISTS pair over the same derived
    //    relation (the only-late-supplier-on-a-shared-order pattern) ──
    QueryDef(
      "q21_waiting_supplier",
      "suppliers solely late on multi-supplier orders (semi + anti join)",
      (s, d) => {
        val pairs = t(s, d, "lineitem").select("l_orderkey", "l_suppkey").distinct()
        val late = t(s, d, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
          .join(t(s, d, "orders").select("o_orderkey", "o_orderdate"),
            col("l_orderkey") === col("o_orderkey"))
          .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS"))
          .select("l_orderkey", "l_suppkey").distinct()
        late
          .join(pairs.select(col("l_orderkey").as("a_okey"), col("l_suppkey").as("a_skey")),
            col("l_orderkey") === col("a_okey") && col("l_suppkey") =!= col("a_skey"),
            "left_semi")
          .join(late.select(col("l_orderkey").as("b_okey"), col("l_suppkey").as("b_skey")),
            col("l_orderkey") === col("b_okey") && col("l_suppkey") =!= col("b_skey"),
            "left_anti")
          .join(broadcast(t(s, d, "supplier").select("s_suppkey", "s_name")),
            col("l_suppkey") === col("s_suppkey"))
          .groupBy("s_name")
          .agg(count(lit(1)).as("numwait"))
          .orderBy(col("numwait").desc, col("s_name"))
          .limit(10)
      },
      Some("""WITH late AS (SELECT DISTINCT l_orderkey, l_suppkey
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |  WHERE l_shipdate > o_orderdate + INTERVAL 30 DAY),
             |pairs AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem)
             |SELECT s_name, count(*) AS numwait
             |FROM late l1 JOIN supplier ON l1.l_suppkey = s_suppkey
             |WHERE EXISTS (SELECT 1 FROM pairs p
             |  WHERE p.l_orderkey = l1.l_orderkey AND p.l_suppkey <> l1.l_suppkey)
             |AND NOT EXISTS (SELECT 1 FROM late l2
             |  WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
             |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 10""".stripMargin)),

    // ── Q2 shape: correlated-min subquery decorrelated to agg + join-back
    //    (cheapest offer per part; partsupp stands in as the lineitem-
    //    derived offer relation, MIN is order-insensitive so the join-back
    //    equality is exact across engines) ──
    QueryDef(
      "q2_min_cost_supplier",
      "cheapest supplier per size-10 part (correlated min → agg join-back)",
      (s, d) => {
        val p10 = broadcast(t(s, d, "part")
          .filter(col("p_size") === 10).select("p_partkey", "p_name"))
        val offers = t(s, d, "lineitem").select("l_partkey", "l_suppkey", "l_extendedprice")
          .join(p10.select("p_partkey"), col("l_partkey") === col("p_partkey"), "left_semi")
          .groupBy("l_partkey", "l_suppkey")
          .agg(min("l_extendedprice").as("offer_price"))
        val best = offers.groupBy(col("l_partkey").as("b_pkey"))
          .agg(min("offer_price").as("best_price"))
        offers
          .join(best, col("l_partkey") === col("b_pkey") &&
            col("offer_price") === col("best_price"))
          .groupBy("l_partkey", "best_price")
          .agg(min("l_suppkey").as("best_supp"))
          .join(p10, col("l_partkey") === col("p_partkey"))
          .join(broadcast(t(s, d, "supplier").select("s_suppkey", "s_name", "s_nationkey")),
            col("best_supp") === col("s_suppkey"))
          .join(broadcast(t(s, d, "nation").select("n_nationkey", "n_name")),
            col("s_nationkey") === col("n_nationkey"))
          .select("p_name", "s_name", "n_name", "best_price")
          .orderBy(col("best_price").desc, col("p_name"), col("s_name"))
          .limit(20)
      },
      Some("""WITH offers AS (
             |  SELECT l_partkey, l_suppkey, min(l_extendedprice) AS offer_price
             |  FROM lineitem JOIN part ON l_partkey = p_partkey
             |  WHERE p_size = 10 GROUP BY 1, 2),
             |best AS (SELECT l_partkey, min(offer_price) AS best_price
             |  FROM offers GROUP BY 1),
             |pick AS (SELECT o.l_partkey, b.best_price, min(o.l_suppkey) AS best_supp
             |  FROM offers o JOIN best b
             |    ON o.l_partkey = b.l_partkey AND o.offer_price = b.best_price
             |  GROUP BY 1, 2)
             |SELECT p_name, s_name, n_name, best_price
             |FROM pick JOIN part ON l_partkey = p_partkey
             |JOIN supplier ON best_supp = s_suppkey
             |JOIN nation ON s_nationkey = n_nationkey
             |ORDER BY best_price DESC, p_name, s_name LIMIT 20""".stripMargin)),

    // ── Q11 shape: groups above a fraction-of-global-total threshold.
    //    The measure is sum(l_quantity) — integer-valued, so both the
    //    group values and the 0.1% threshold are exact in any sum order ──
    QueryDef(
      "q11_important_parts",
      "parts with >0.1% of one nation's shipped quantity (global-threshold HAVING)",
      (s, d) => {
        val natSupp = broadcast(t(s, d, "supplier").select("s_suppkey", "s_nationkey")
          .join(broadcast(t(s, d, "nation")
            .filter(col("n_name") === "NATION_1").select("n_nationkey")),
            col("s_nationkey") === col("n_nationkey"))
          .select("s_suppkey"))
        val value = t(s, d, "lineitem").select("l_partkey", "l_suppkey", "l_quantity")
          .join(natSupp, col("l_suppkey") === col("s_suppkey"), "left_semi")
          .groupBy("l_partkey")
          .agg(sum("l_quantity").as("part_qty"))
        val thr = value.agg((sum("part_qty") * lit(0.001)).as("__thr"))
        value.crossJoin(broadcast(thr))
          .filter(col("part_qty") > col("__thr"))
          .select("l_partkey", "part_qty")
      },
      Some("""WITH value AS (
             |  SELECT l_partkey, sum(l_quantity) AS part_qty
             |  FROM lineitem
             |  WHERE l_suppkey IN (SELECT s_suppkey FROM supplier
             |    JOIN nation ON s_nationkey = n_nationkey WHERE n_name = 'NATION_1')
             |  GROUP BY 1)
             |SELECT l_partkey, part_qty FROM value
             |WHERE part_qty > (SELECT sum(part_qty) * 0.001 FROM value)""".stripMargin)),

    // ── Q13 shape: distribution of customers by order count — left outer
    //    join, per-customer count, then a count-of-counts histogram ──
    QueryDef(
      "q13_order_distribution",
      "customer distribution by non-LOW order count (join histogram)",
      (s, d) => {
        val ord = t(s, d, "orders")
          .filter(!col("o_orderpriority").like("%LOW%"))
          .select("o_orderkey", "o_custkey")
        t(s, d, "customer").select("c_custkey")
          .join(ord, col("c_custkey") === col("o_custkey"), "left_outer")
          .groupBy("c_custkey")
          .agg(count("o_orderkey").as("c_count"))
          .groupBy("c_count")
          .agg(count(lit(1)).as("custdist"))
          .orderBy(col("custdist").desc, col("c_count").desc)
      },
      Some("""SELECT c_count, count(*) AS custdist
             |FROM (SELECT c_custkey, count(o_orderkey) AS c_count
             |  FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
             |    AND o_orderpriority NOT LIKE '%LOW%'
             |  GROUP BY c_custkey)
             |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin)),

    // ── Q15 shape: max-over-aggregated-view (top revenue supplier). The
    //    winner is picked by ordered LIMIT 1 over the UNROUNDED sum with
    //    a s_suppkey tiebreak — never by float equality against a
    //    separately-evaluated max, which Spark would compute from a
    //    second partial-aggregation pass with a potentially different
    //    summation order. orderBy+limit plans as TakeOrderedAndProject
    //    (per-partition top-1, tiny driver merge) — no single-partition
    //    window even if the supplier dimension grows 100×. ──
    QueryDef(
      "q15_top_supplier",
      "supplier with the maximum quarterly revenue (view + ordered-limit pick)",
      (s, d) => {
        val rev = t(s, d, "lineitem")
          .filter(col("l_shipdate") >= lit("1997-01-01") && col("l_shipdate") < lit("1997-04-01"))
          .select("l_suppkey", "l_extendedprice", "l_discount")
          .groupBy("l_suppkey")
          .agg(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("__rev_raw"))
        rev.orderBy(col("__rev_raw").desc, col("l_suppkey").asc).limit(1)
          .join(broadcast(t(s, d, "supplier").select("s_suppkey", "s_name")),
            col("l_suppkey") === col("s_suppkey"))
          .select(col("s_suppkey"), col("s_name"),
            round(col("__rev_raw"), 2).as("total_revenue"))
          .orderBy("s_suppkey")
      },
      Some("""WITH revenue AS (
             |  SELECT l_suppkey, sum(l_extendedprice * (1.0 - l_discount)) AS rev_raw
             |  FROM lineitem
             |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
             |  AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
             |  GROUP BY l_suppkey),
             |top1 AS (
             |  SELECT l_suppkey, rev_raw FROM revenue
             |  ORDER BY rev_raw DESC, l_suppkey ASC LIMIT 1)
             |SELECT s_suppkey, s_name, round(rev_raw, 2) AS total_revenue
             |FROM top1 JOIN supplier ON l_suppkey = s_suppkey
             |ORDER BY s_suppkey""".stripMargin)),

    // ── Q17 shape: per-part correlated AVG threshold (small-quantity
    //    revenue; avg of integer-valued quantities is exact, so the
    //    threshold comparison cannot diverge between engines) ──
    QueryDef(
      "q17_small_qty_revenue",
      "avg weekly revenue from below-half-average-quantity lines of one brand",
      (s, d) => {
        val br = broadcast(t(s, d, "part")
          .filter(col("p_brand") === "Brand#2").select("p_partkey"))
        val li = t(s, d, "lineitem").select("l_partkey", "l_quantity", "l_extendedprice")
          .join(br, col("l_partkey") === col("p_partkey"), "left_semi")
        val avgQ = li.groupBy(col("l_partkey").as("a_pkey"))
          .agg(avg("l_quantity").as("avg_qty"))
        li.join(avgQ, col("l_partkey") === col("a_pkey"))
          .filter(col("l_quantity") < lit(0.5) * col("avg_qty"))
          .agg(round(sum("l_extendedprice") / lit(7.0), 2).as("avg_weekly"))
      },
      Some("""SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_weekly
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |WHERE p_brand = 'Brand#2'
             |AND l_quantity < (SELECT 0.5 * avg(l2.l_quantity) FROM lineitem l2
             |  WHERE l2.l_partkey = lineitem.l_partkey)""".stripMargin)),

    // ── Q20 shape: nested IN with per-key aggregate threshold — suppliers
    //    carrying >30% of a part's 1997 volume (integer sums, exact) ──
    QueryDef(
      "q20_excess_shippers",
      "one nation's suppliers carrying >30% of some small part's 1997 volume",
      (s, d) => {
        val li97 = t(s, d, "lineitem")
          .filter(col("l_shipdate") >= lit("1997-01-01") && col("l_shipdate") < lit("1998-01-01"))
          .join(broadcast(t(s, d, "part")
            .filter(col("p_size") <= 5).select("p_partkey")),
            col("l_partkey") === col("p_partkey"), "left_semi")
          .select("l_partkey", "l_suppkey", "l_quantity")
        val perSupp = li97.groupBy("l_partkey", "l_suppkey")
          .agg(sum("l_quantity").as("supp_qty"))
        val perPart = li97.groupBy(col("l_partkey").as("t_pkey"))
          .agg(sum("l_quantity").as("part_qty"))
        val heavy = perSupp
          .join(perPart, col("l_partkey") === col("t_pkey"))
          .filter(col("supp_qty") > lit(0.3) * col("part_qty"))
          .select("l_suppkey").distinct()
        t(s, d, "supplier").select("s_suppkey", "s_name", "s_nationkey")
          .join(heavy, col("s_suppkey") === col("l_suppkey"), "left_semi")
          .join(broadcast(t(s, d, "nation")
            .filter(col("n_name") === "NATION_2").select("n_nationkey")),
            col("s_nationkey") === col("n_nationkey"), "left_semi")
          .select("s_suppkey", "s_name")
          .orderBy("s_suppkey")
      },
      Some("""WITH li97 AS (
             |  SELECT l_partkey, l_suppkey, l_quantity FROM lineitem
             |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
             |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
             |  AND l_partkey IN (SELECT p_partkey FROM part WHERE p_size <= 5)),
             |per_supp AS (SELECT l_partkey, l_suppkey, sum(l_quantity) AS supp_qty
             |  FROM li97 GROUP BY 1, 2),
             |per_part AS (SELECT l_partkey, sum(l_quantity) AS part_qty
             |  FROM li97 GROUP BY 1)
             |SELECT s_suppkey, s_name FROM supplier
             |WHERE s_suppkey IN (
             |  SELECT ps.l_suppkey FROM per_supp ps
             |  JOIN per_part pp ON ps.l_partkey = pp.l_partkey
             |  WHERE ps.supp_qty > 0.3 * pp.part_qty)
             |AND s_nationkey IN (SELECT n_nationkey FROM nation WHERE n_name = 'NATION_2')
             |ORDER BY s_suppkey""".stripMargin)),

    // ── Q22 shape: scalar-subquery threshold + NOT EXISTS ──
    QueryDef(
      "q22_idle_customers",
      "rich recently-idle customers per nation (scalar avg threshold + anti join)",
      (s, d) => {
        val cust = t(s, d, "customer")
        // 1-row aggregate, broadcast via crossJoin — the decorrelated
        // scalar subquery (no driver-side collect in the data plane);
        // rounded so the boundary is bit-identical across engines
        val thr = cust.filter(col("c_acctbal") > 0.0)
          .agg(round(avg("c_acctbal"), 2).as("__thr"))
        cust.select("c_custkey", "c_acctbal", "c_nationkey")
          .crossJoin(broadcast(thr))
          .filter(col("c_acctbal") > col("__thr"))
          .join(t(s, d, "orders").filter(col("o_orderdate") >= lit("2000-01-01"))
            .select("o_custkey"),
            col("c_custkey") === col("o_custkey"), "left_anti")
          .join(broadcast(t(s, d, "nation").select("n_nationkey", "n_name")),
            col("c_nationkey") === col("n_nationkey"))
          .groupBy("n_name")
          .agg(count(lit(1)).as("numcust"), round(sum("c_acctbal"), 2).as("totacctbal"))
      },
      Some("""SELECT n_name, count(*) AS numcust, round(sum(c_acctbal), 2) AS totacctbal
             |FROM customer JOIN nation ON c_nationkey = n_nationkey
             |WHERE c_acctbal > (SELECT round(avg(c_acctbal), 2) FROM customer WHERE c_acctbal > 0.0)
             |AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
             |  AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
             |GROUP BY n_name""".stripMargin))
  )
}
