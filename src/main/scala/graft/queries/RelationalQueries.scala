package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables

/** Relational operator coverage (SURVEY.md §2 A/C/D/E/G rows) expressed
  * over the TPC-H-ish fixture corpus, each with a DuckDB oracle.
  *
  * Scale notes (100 TB discipline):
  *  - dimension joins (`nation`, `region`, `supplier`) are explicitly
  *    broadcast — no shuffle of the fact side;
  *  - aggregations rely on partial (map-side) aggregation, which Spark
  *    plans automatically for all algebraic aggregates used here;
  *  - top-k queries use `orderBy+limit`, planned as TakeOrderedAndProject
  *    (per-partition heaps + driver merge of k rows, no full sort);
  *  - float-producing aggregates are rounded identically on both sides
  *    because summation order differs between engines.
  */
object RelationalQueries {
  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables(s, d, n)

  val defs: Seq[QueryDef] = Seq(

    // ── Flagship: TPC-H Q1-style pricing summary (A1+E aggregates) ──
    QueryDef(
      "q1_pricing_summary",
      "scan+filter+groupBy with 8 algebraic aggregates (TPC-H Q1 shape)",
      (s, d) =>
        t(s, d, "lineitem")
          .filter(col("l_shipdate") <= lit("1998-09-02"))
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            round(sum("l_quantity"), 2).as("sum_qty"),
            round(sum("l_extendedprice"), 2).as("sum_base_price"),
            round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
            round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))), 2).as("sum_charge"),
            round(avg("l_quantity"), 4).as("avg_qty"),
            round(avg("l_extendedprice"), 4).as("avg_price"),
            round(avg("l_discount"), 4).as("avg_disc"),
            count(lit(1)).as("count_order")),
      Some("""SELECT l_returnflag, l_linestatus,
             |round(sum(l_quantity), 2) AS sum_qty,
             |round(sum(l_extendedprice), 2) AS sum_base_price,
             |round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
             |round(sum(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)), 2) AS sum_charge,
             |round(avg(l_quantity), 4) AS avg_qty,
             |round(avg(l_extendedprice), 4) AS avg_price,
             |round(avg(l_discount), 4) AS avg_disc,
             |count(*) AS count_order
             |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
             |GROUP BY l_returnflag, l_linestatus""".stripMargin),
      bench = true),

    // ── TPC-H Q3 shape: selective 3-way join + top-k (bench) ──
    QueryDef(
      "q3_shipping_priority",
      "selective fact-fact join, grouped revenue, TakeOrdered top-10",
      (s, d) => {
        val cust = t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
        val ord = t(s, d, "orders").filter(col("o_orderdate") < lit("1998-01-01"))
          .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
        val li = t(s, d, "lineitem").filter(col("l_shipdate") > lit("1998-01-01"))
          .select("l_orderkey", "l_extendedprice", "l_discount")
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
          .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
          .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
          .select(col("l_orderkey"), date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
            col("o_orderpriority"), col("revenue"))
          .orderBy(col("revenue").desc, col("l_orderkey"))
          .limit(10)
      },
      Some("""SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate, o_orderpriority,
             |round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
             |AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
             |GROUP BY l_orderkey, o_orderdate, o_orderpriority
             |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin),
      bench = true),

    // ── TPC-H Q5 shape: snowflake join with broadcast dims (bench) ──
    QueryDef(
      "q5_local_supplier",
      "5-way snowflake join, dims broadcast, revenue by nation",
      (s, d) => {
        val nr = broadcast(
          t(s, d, "nation").join(broadcast(t(s, d, "region")).filter(col("r_name") === "ASIA"),
            col("n_regionkey") === col("r_regionkey")).select("n_nationkey", "n_name"))
        val sup = broadcast(t(s, d, "supplier").select(col("s_suppkey"), col("s_nationkey")))
        val cust = t(s, d, "customer").select("c_custkey", "c_nationkey")
        val ord = t(s, d, "orders")
          .filter(col("o_orderdate") >= lit("1996-01-01") && col("o_orderdate") < lit("1997-01-01"))
          .select("o_orderkey", "o_custkey")
        val li = t(s, d, "lineitem").select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(cust, col("o_custkey") === col("c_custkey"))
          .join(sup, col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
          .join(nr, col("s_nationkey") === col("n_nationkey"))
          .groupBy("n_name")
          .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
      },
      Some("""SELECT n_name, round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
             |JOIN nation ON s_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
             |AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
             |GROUP BY n_name""".stripMargin),
      bench = true),

    // ── TPC-H Q6 shape: one-pass filter-and-sum, the scan-throughput
    //    microbenchmark — every predicate pushes to the parquet scan
    //    and the whole query is a single codegen'd stage. ──
    QueryDef(
      "q6_forecast_revenue",
      "single-pass filtered revenue sum (pure scan throughput)",
      (s, d) =>
        t(s, d, "lineitem")
          .filter(col("l_shipdate") >= lit("1996-01-01") && col("l_shipdate") < lit("1997-01-01") &&
            col("l_discount") >= 0.03 && col("l_discount") <= 0.05 && col("l_quantity") < 24)
          .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue")),
      Some("""SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
             |FROM lineitem
             |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
             |AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
             |AND l_discount >= 0.03 AND l_discount <= 0.05 AND l_quantity < 24""".stripMargin),
      bench = true),

    // ── A1: scan with pushed predicates + pruned projection ──
    QueryDef(
      "a1_scan_pushdown",
      "filter+projection pushed to the parquet scan (cnics_to_fhir.py:106-156)",
      (s, d) =>
        t(s, d, "lineitem")
          .filter(col("l_returnflag") === "R" && col("l_quantity") >= 45)
          .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
             |FROM lineitem WHERE l_returnflag = 'R' AND l_quantity >= 45""".stripMargin)),

    // ── A2/G2/G3: cohort selection with deterministic top-k limit ──
    QueryDef(
      "a2_cohort_topk",
      "join+filter+limit cohort scan (cnics_to_fhir.py:259-266), deterministic order",
      (s, d) =>
        t(s, d, "customer")
          .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
          .select(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
          .orderBy(col("c_acctbal").desc, col("c_custkey"))
          .limit(20),
      Some("""SELECT c_custkey, c_name, c_acctbal, n_name
             |FROM customer JOIN nation ON c_nationkey = n_nationkey
             |ORDER BY c_acctbal DESC, c_custkey LIMIT 20""".stripMargin)),

    // ── A4/D8: distinct projection ──
    QueryDef(
      "a4_distinct_projection",
      "select distinct projection (cnics_to_fhir.py:141-147)",
      (s, d) => t(s, d, "lineitem").select("l_returnflag", "l_linestatus").distinct(),
      Some("SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem")),

    // ── C1: null-tolerant inequality filter ──
    QueryDef(
      "c1_null_tolerant_filter",
      "(col <> x OR col IS NULL) filter (cnics_to_fhir.py:121,138,154)",
      (s, d) =>
        t(s, d, "events")
          .filter(col("event_type") =!= "click" || col("event_type").isNull)
          .groupBy("event_type").agg(count(lit(1)).as("n")),
      Some("""SELECT event_type, count(*) AS n FROM events
             |WHERE event_type <> 'click' OR event_type IS NULL GROUP BY event_type""".stripMargin)),

    // ── C3: config-driven IN/LIKE predicate fragment via expr() ──
    QueryDef(
      "c3_config_predicate",
      "INI-sourced SQL fragment parsed by expr() (settings.ini:34-114)",
      (s, d) =>
        t(s, d, "part")
          .filter(expr("p_type like '%STEEL%' and p_size in (5, 15, 25, 35, 45)"))
          .select("p_partkey", "p_brand", "p_type", "p_size"),
      Some("""SELECT p_partkey, p_brand, p_type, p_size FROM part
             |WHERE p_type LIKE '%STEEL%' AND p_size IN (5, 15, 25, 35, 45)""".stripMargin)),

    // ── C6: bug-compatible and-guard row filter ──
    QueryDef(
      "c6_row_guard",
      "keep row unless (foreign-key test AND non-blank test) — the reference's odd 'and' guard (cnics_to_fhir.py:574)",
      (s, d) =>
        t(s, d, "lineitem")
          .filter(!(col("l_suppkey") % 7 === 0 && col("l_returnflag") =!= "N"))
          .groupBy("l_returnflag").agg(count(lit(1)).as("n")),
      Some("""SELECT l_returnflag, count(*) AS n FROM lineitem
             |WHERE NOT (l_suppkey % 7 = 0 AND l_returnflag <> 'N') GROUP BY l_returnflag""".stripMargin)),

    // ── D1: 3-way dim join with grouped stats ──
    QueryDef(
      "d1_join_3way",
      "inner equi-joins across star dims (cnics_to_fhir.py:259-263)",
      (s, d) =>
        t(s, d, "customer")
          .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(t(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
          .groupBy("r_name", "n_name")
          .agg(count(lit(1)).as("n_cust"), round(avg("c_acctbal"), 4).as("avg_bal")),
      Some("""SELECT r_name, n_name, count(*) AS n_cust, round(avg(c_acctbal), 4) AS avg_bal
             |FROM customer JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey GROUP BY r_name, n_name""".stripMargin)),

    // ── D3: fan-out join replacing the reference's N+1 loop ──
    QueryDef(
      "d3_fanout_join",
      "cohort ⋈ detail fan-out (replaces per-patient loop, cnics_to_fhir.py:339-351)",
      (s, d) =>
        t(s, d, "orders").select("o_orderkey", "o_orderpriority")
          .join(t(s, d, "lineitem").select("l_orderkey", "l_extendedprice", "l_discount"),
            col("o_orderkey") === col("l_orderkey"))
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n_lines"),
            round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue")),
      Some("""SELECT o_orderpriority, count(*) AS n_lines,
             |round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
             |FROM orders JOIN lineitem ON o_orderkey = l_orderkey GROUP BY o_orderpriority""".stripMargin),
      bench = true),

    // ── D5: left-anti join (orphan delete set) ──
    QueryDef(
      "d5_anti_orphans",
      "left-anti join — store rows absent from source (cnics_to_fhir.py:328-337)",
      (s, d) =>
        t(s, d, "customer")
          .join(t(s, d, "orders").select("o_custkey"), col("c_custkey") === col("o_custkey"), "left_anti")
          .select("c_custkey", "c_name"),
      Some("""SELECT c_custkey, c_name FROM customer c
             |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)""".stripMargin)),

    // ── D6: broadcast dictionary lookup join ──
    QueryDef(
      "d6_broadcast_lookup",
      "broadcast small-dim lookup (MRN crosswalk, cnics_to_fhir.py:290-304)",
      (s, d) =>
        t(s, d, "supplier")
          .join(broadcast(t(s, d, "nation")), col("s_nationkey") === col("n_nationkey"), "left")
          .select("s_suppkey", "s_name", "n_name"),
      Some("""SELECT s_suppkey, s_name, n_name
             |FROM supplier LEFT JOIN nation ON s_nationkey = n_nationkey""".stripMargin)),

    // ── D7: semi-join membership (code lists) ──
    QueryDef(
      "d7_semi_membership",
      "isin + left-semi membership (code lists, cnics_to_fhir.py:190-193)",
      (s, d) =>
        t(s, d, "part")
          .filter(col("p_brand").isin("Brand#11", "Brand#22", "Brand#33"))
          .join(t(s, d, "lineitem").select("l_partkey"), col("p_partkey") === col("l_partkey"), "left_semi")
          .select("p_partkey", "p_brand", "p_type"),
      Some("""SELECT p_partkey, p_brand, p_type FROM part
             |WHERE p_brand IN ('Brand#11', 'Brand#22', 'Brand#33')
             |AND EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)""".stripMargin)),

    // ── D9/E4: first-seen dedup per group ──
    QueryDef(
      "d9_first_seen_dedup",
      "first-seen-order dedup per key (cnics_to_fhir.py:410-420)",
      (s, d) =>
        t(s, d, "orders")
          .groupBy("o_custkey", "o_orderpriority")
          .agg(date_format(min("o_orderdate"), "yyyy-MM-dd").as("first_seen")),
      Some("""SELECT o_custkey, o_orderpriority, strftime(min(o_orderdate), '%Y-%m-%d') AS first_seen
             |FROM orders GROUP BY o_custkey, o_orderpriority""".stripMargin)),

    // ── E2/G1: first-row-per-group via window ──
    QueryDef(
      "e2_first_row_per_group",
      "row_number()=1 per group (demographics first-row, cnics_to_fhir.py:440-525)",
      (s, d) =>
        t(s, d, "orders")
          .withColumn("rn", row_number().over(
            Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))))
          .filter(col("rn") === 1)
          .select("o_custkey", "o_orderkey", "o_totalprice"),
      Some("""SELECT o_custkey, o_orderkey, o_totalprice FROM orders
             |QUALIFY row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) = 1""".stripMargin)),

    // ── E3: collect_list per group (stringified for stable compare) ──
    QueryDef(
      "e3_collect_list_str",
      "collect_list per group (session ids, cnics_to_fhir.py:391-395)",
      (s, d) =>
        t(s, d, "orders")
          .groupBy("o_custkey")
          .agg(concat_ws(",", sort_array(collect_list("o_orderpriority"))).as("priorities")),
      Some("""SELECT o_custkey, string_agg(o_orderpriority, ',' ORDER BY o_orderpriority) AS priorities
             |FROM orders GROUP BY o_custkey""".stripMargin)),

    // ── E5: duplicate-key assertion ──
    QueryDef(
      "e5_dup_assertion",
      "count>1 duplicate detection (cnics_to_fhir.py:359,906-908)",
      (s, d) =>
        t(s, d, "lineitem")
          .groupBy("l_orderkey").agg(count(lit(1)).as("n"))
          .filter(col("n") > 1),
      Some("SELECT l_orderkey, count(*) AS n FROM lineitem GROUP BY l_orderkey HAVING count(*) > 1")),

    // ── G4: global deterministic top-k sort ──
    QueryDef(
      "g4_topk_price",
      "orderBy+limit top-k (TakeOrderedAndProject, no full sort)",
      (s, d) =>
        t(s, d, "lineitem")
          .select("l_orderkey", "l_linenumber", "l_extendedprice")
          .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
          .limit(25),
      Some("""SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
             |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 25""".stripMargin)),

    // ── G3: sampling. The scale-safe reproducible form is a
    //    multiplicative-hash mod filter — deterministic at any scale,
    //    independent of partitioning, exactly reproducible in any
    //    engine (unlike the reference's commented `order by rand()`,
    //    cnics_to_fhir.py:264). A ~5% sample of orders. ──
    QueryDef(
      "g3_sample_hashmod",
      "deterministic reproducible sample via multiplicative hash mod (G3)",
      (s, d) =>
        t(s, d, "orders")
          .filter(expr("pmod(o_orderkey * 2654435761, 1000003) < 50000"))
          .select("o_orderkey", "o_custkey", "o_totalprice"),
      Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
             |WHERE (o_orderkey * 2654435761) % 1000003 < 50000""".stripMargin)),

    // ── WEIGHTED (probability-proportional-to-size) sampling via
    //    deterministic priority keys: each row gets priority h(key)/w
    //    and the sample is the global bottom-k — big spenders are
    //    sampled preferentially, yet the sample is exactly reproducible
    //    (and so exactly oracle-able, unlike rand()-based weighted
    //    sampling). h and w are integers; the single IEEE division is
    //    bit-identical in any engine, so ordering on it is safe — the
    //    one float that ever feeds a comparison here is a one-op
    //    quotient of integers. Plan: TakeOrderedAndProject — bottom-k
    //    never globally sorts. ──
    QueryDef(
      "g3_sample_weighted",
      "deterministic weighted (PPS) sample: bottom-100 by hash/weight priority",
      (s, d) =>
        t(s, d, "orders")
          .select(col("o_orderkey"),
            expr("CAST(floor(o_totalprice * 100 + 0.5D) AS BIGINT)").as("w"),
            expr("pmod(o_orderkey, 1000003) * 2654435761L % 1000003 + 1").as("h"))
          .withColumn("pri", col("h").cast("double") / col("w").cast("double"))
          .orderBy(col("pri"), col("o_orderkey"))
          .limit(100)
          .select(col("o_orderkey"), col("w"), round(col("pri"), 8).as("pri")),
      Some("""SELECT o_orderkey, w, round(pri, 8) AS pri FROM (
             |  SELECT o_orderkey, CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS w,
             |    (((o_orderkey % 1000003 + 1000003) % 1000003) * 2654435761 % 1000003 + 1)::DOUBLE
             |      / CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)::DOUBLE AS pri
             |  FROM orders)
             |ORDER BY pri, o_orderkey LIMIT 100""".stripMargin)),

    // ── Stratified weighted sampling: the same priority key, bottom-3
    //    PER GROUP — the "balanced training mix with importance
    //    weights" shape (every stratum represented, heavy rows
    //    preferred within each). Non-positive weights clamp to 1. ──
    QueryDef(
      "g3_sample_stratified",
      "per-nation weighted sample: bottom-3 customers by hash/weight priority",
      (s, d) =>
        t(s, d, "customer")
          .select(col("c_nationkey"), col("c_custkey"),
            expr("greatest(CAST(floor(c_acctbal * 100 + 0.5D) AS BIGINT), 1L)").as("w"),
            expr("pmod(c_custkey, 1000003) * 2654435761L % 1000003 + 1").as("h"))
          .withColumn("rnk", row_number().over(
            Window.partitionBy("c_nationkey")
              .orderBy(col("h").cast("double") / col("w").cast("double"), col("c_custkey"))))
          .filter(col("rnk") <= 3)
          .select("c_nationkey", "c_custkey", "w", "rnk"),
      Some("""SELECT c_nationkey, c_custkey, w, rnk FROM (
             |  SELECT c_nationkey, c_custkey, w,
             |    row_number() OVER (PARTITION BY c_nationkey
             |      ORDER BY h::DOUBLE / w::DOUBLE, c_custkey) AS rnk
             |  FROM (SELECT c_nationkey, c_custkey,
             |      greatest(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT), 1) AS w,
             |      ((c_custkey % 1000003 + 1000003) % 1000003) * 2654435761 % 1000003 + 1 AS h
             |    FROM customer))
             |WHERE rnk <= 3""".stripMargin)),

    // ── Sampled quantiles: exact percentiles over the deterministic
    //    hash-mod sample — the scale pattern for quantiles on 100 TB
    //    (never sort the full corpus; sample ~5% reproducibly, exact
    //    quantile on the sample). Deterministic sample ⇒ exactly
    //    oracle-able, unlike approx_percentile's engine-internal
    //    sketch. ──
    QueryDef(
      "quantiles_sampled",
      "exact per-group percentiles over the deterministic hash-mod sample",
      (s, d) =>
        t(s, d, "lineitem")
          .filter(expr("pmod(l_orderkey * 2654435761 + l_linenumber * 7919, 1000003) < 50000"))
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n_sample"),
            round(expr("percentile(l_extendedprice, 0.5)"), 4).as("p50"),
            round(expr("percentile(l_extendedprice, 0.99)"), 4).as("p99")),
      Some("""SELECT l_returnflag, count(*) AS n_sample,
             |round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
             |round(quantile_cont(l_extendedprice, 0.99), 4) AS p99
             |FROM lineitem
             |WHERE (l_orderkey * 2654435761 + l_linenumber * 7919) % 1000003 < 50000
             |GROUP BY l_returnflag""".stripMargin)),

    // Seeded reproducible sampling. Spark's `.sample(seed)` draws from
    // an engine-internal RNG — deterministic within Spark but not
    // replayable by any other engine (or even across Spark partition
    // layouts), so it can never be oracled. The portable form of "a 5%
    // sample under seed 42" is a seed-salted hash draw: mix the seed
    // into the per-row hash, keep rows whose draw lands under the rate
    // cutoff. Same statistical contract (fixed-rate Bernoulli keyed on
    // the row id, different seed ⇒ disjoint-ish sample), but the row
    // set is a pure function of (key, seed) — reproducible on every
    // engine, every partition count, every scale. Key is reduced mod p
    // BEFORE the multiply so the arithmetic never overflows Long even
    // at 100 TB key ranges (DuckDB would silently promote to HUGEINT
    // on overflow, which would fork the row sets).
    QueryDef(
      "g3_sample_seeded",
      "seeded reproducible 5% sample via a seed-salted hash draw",
      (s, d) =>
        t(s, d, "orders")
          .filter(expr(
            "pmod(pmod(o_orderkey, 1000003) * 2654435761 + 42 * 7919, 1000003) < 50000"))
          .select("o_orderkey", "o_custkey"),
      Some("""SELECT o_orderkey, o_custkey FROM orders
             |WHERE ((o_orderkey % 1000003) * 2654435761 + 42 * 7919) % 1000003 < 50000""".stripMargin)),

    // ── Set ops (free from Spark; exercised for inventory completeness) ──
    QueryDef(
      "set_intersect_nations",
      "INTERSECT distinct semantics",
      (s, d) => {
        val cn = t(s, d, "customer").join(broadcast(t(s, d, "nation")),
          col("c_nationkey") === col("n_nationkey")).select("n_name")
        val sn = t(s, d, "supplier").join(broadcast(t(s, d, "nation")),
          col("s_nationkey") === col("n_nationkey")).select("n_name")
        cn.intersect(sn)
      },
      Some("""SELECT n_name FROM customer JOIN nation ON c_nationkey = n_nationkey
             |INTERSECT
             |SELECT n_name FROM supplier JOIN nation ON s_nationkey = n_nationkey""".stripMargin)),

    QueryDef(
      "set_except_nations",
      "EXCEPT distinct semantics",
      (s, d) => {
        val cn = t(s, d, "customer").join(broadcast(t(s, d, "nation")),
          col("c_nationkey") === col("n_nationkey")).select("n_name")
        val sn = t(s, d, "supplier").join(broadcast(t(s, d, "nation")),
          col("s_nationkey") === col("n_nationkey")).select("n_name")
        cn.except(sn)
      },
      Some("""SELECT n_name FROM customer JOIN nation ON c_nationkey = n_nationkey
             |EXCEPT
             |SELECT n_name FROM supplier JOIN nation ON s_nationkey = n_nationkey""".stripMargin)),

    // ── Bag-semantics set ops: INTERSECT ALL / EXCEPT ALL keep
    //    multiplicities (count-min per key) — a different operator from
    //    the distinct variants above, planned as an aggregate of signed
    //    counts rather than a dedup ──
    QueryDef(
      "set_intersect_all_segments",
      "INTERSECT ALL multiplicity semantics on market segments",
      (s, d) => {
        val a = t(s, d, "customer").filter(col("c_custkey") % 2 === 0)
          .select("c_mktsegment")
        val b = t(s, d, "customer").filter(col("c_custkey") % 3 === 0)
          .select("c_mktsegment")
        a.intersectAll(b).groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      },
      Some("""SELECT c_mktsegment, count(*) AS n FROM (
             |  SELECT c_mktsegment FROM customer WHERE c_custkey % 2 = 0
             |  INTERSECT ALL
             |  SELECT c_mktsegment FROM customer WHERE c_custkey % 3 = 0)
             |GROUP BY c_mktsegment""".stripMargin)),

    QueryDef(
      "set_except_all_segments",
      "EXCEPT ALL multiplicity semantics on market segments",
      (s, d) => {
        val a = t(s, d, "customer").filter(col("c_custkey") % 2 === 0)
          .select("c_mktsegment")
        val b = t(s, d, "customer").filter(col("c_custkey") % 3 === 0)
          .select("c_mktsegment")
        a.exceptAll(b).groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      },
      Some("""SELECT c_mktsegment, count(*) AS n FROM (
             |  SELECT c_mktsegment FROM customer WHERE c_custkey % 2 = 0
             |  EXCEPT ALL
             |  SELECT c_mktsegment FROM customer WHERE c_custkey % 3 = 0)
             |GROUP BY c_mktsegment""".stripMargin)),

    // ── Null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL keys
    //    match each other — different join semantics from standard
    //    equality, where NULL matches nothing. Nulls synthesized via
    //    nullif so the fixture corpus exercises both branches. ──
    QueryDef(
      "join_null_safe",
      "null-safe equality join: NULL segment keys match each other",
      (s, d) => {
        val a = t(s, d, "customer")
          .select(col("c_custkey"), nullif(col("c_mktsegment"), lit("BUILDING")).as("seg"))
          .filter(col("c_custkey") <= 200)
        val b = t(s, d, "customer")
          .select(col("c_custkey").as("b_custkey"),
            nullif(col("c_mktsegment"), lit("BUILDING")).as("b_seg"))
          .filter(col("b_custkey") <= 200)
        a.join(b, col("seg") <=> col("b_seg"))
          .groupBy("seg")
          .agg(count(lit(1)).as("n_pairs"), min("b_custkey").as("min_match"))
      },
      Some("""SELECT seg, count(*) AS n_pairs, min(b_custkey) AS min_match
             |FROM (SELECT c_custkey, nullif(c_mktsegment, 'BUILDING') AS seg
             |      FROM customer WHERE c_custkey <= 200) a
             |JOIN (SELECT c_custkey AS b_custkey, nullif(c_mktsegment, 'BUILDING') AS b_seg
             |      FROM customer WHERE c_custkey <= 200) b
             |  ON a.seg IS NOT DISTINCT FROM b.b_seg
             |GROUP BY seg""".stripMargin)),

    // ── Z-order clustering key: bit-interleave of two dimensions — the
    //    space-filling-curve layout key that makes ONE sorted/clustered
    //    order serve range predicates on EITHER dimension (the
    //    multi-dimensional file-skipping technique; pair with the
    //    partition-pruning evidence in StorageLayoutSpec). Pure integer
    //    bit math, bit-identical across engines. ──
    QueryDef(
      "zorder_layout_key",
      "z-order (Morton) key over (p_size, price bucket), first 50 in curve order",
      (s, d) => {
        val withDims = t(s, d, "part")
          .withColumn("xb", col("p_size").cast("long"))
          .withColumn("yb", floor(col("p_retailprice") / 100.0).cast("long"))
        val z = (0 until 8).map { i =>
          expr(s"(shiftright(xb, $i) & 1) * ${1L << (2 * i)} + " +
            s"(shiftright(yb, $i) & 1) * ${1L << (2 * i + 1)}")
        }.reduce(_ + _)
        withDims.withColumn("z", z)
          .select("p_partkey", "xb", "yb", "z")
          .orderBy(col("z"), col("p_partkey"))
          .limit(50)
      },
      Some {
        val terms = (0 until 8).map { i =>
          s"((xb >> $i) & 1) * ${1L << (2 * i)} + ((yb >> $i) & 1) * ${1L << (2 * i + 1)}"
        }.mkString(" + ")
        s"""SELECT p_partkey, xb, yb, $terms AS z
           |FROM (SELECT p_partkey, p_size::BIGINT AS xb,
           |        floor(p_retailprice / 100.0)::BIGINT AS yb FROM part)
           |ORDER BY z, p_partkey LIMIT 50""".stripMargin
      }),

    // ── Blocked entity linkage (record-matching shape): candidate
    //    pairs come from an EQUALITY blocking key — (nation, 6-digit
    //    name prefix) — so the expensive edit-distance only runs
    //    within blocks, never all-pairs; the classic entity-resolution
    //    scale pattern (same candidate-generation discipline as the
    //    LSH band join, with Levenshtein as the rescore). Both engines
    //    implement classic edit distance, so dist is integer-exact. ──
    QueryDef(
      "link_blocked_levenshtein",
      "blocked entity linkage: (nation, name-prefix) candidate blocks, edit-distance <= 2",
      (s, d) => {
        val c = t(s, d, "customer")
          .select(col("c_custkey"), col("c_nationkey"), col("c_name"))
          .withColumn("blk",
            concat_ws("|", col("c_nationkey"), substring(col("c_name"), 10, 6)))
        c.as("x").join(c.as("y"), Seq("blk"))
          .filter(col("x.c_custkey") < col("y.c_custkey"))
          .withColumn("dist",
            levenshtein(col("x.c_name"), col("y.c_name")).cast("long"))
          .filter(col("dist") <= 2)
          .select(col("x.c_custkey").as("id_a"), col("y.c_custkey").as("id_b"),
            col("dist"))
          .orderBy(col("id_a"), col("id_b"))
          .limit(100)
      },
      Some("""SELECT x.c_custkey AS id_a, y.c_custkey AS id_b,
             |  levenshtein(x.c_name, y.c_name)::BIGINT AS dist
             |FROM (SELECT c_custkey, c_name,
             |        c_nationkey::VARCHAR || '|' || substr(c_name, 10, 6) AS blk
             |      FROM customer) x
             |JOIN (SELECT c_custkey, c_name,
             |        c_nationkey::VARCHAR || '|' || substr(c_name, 10, 6) AS blk
             |      FROM customer) y
             |  ON x.blk = y.blk AND x.c_custkey < y.c_custkey
             |WHERE levenshtein(x.c_name, y.c_name) <= 2
             |ORDER BY id_a, id_b LIMIT 100""".stripMargin)),

    // ── Null-aware anti join: NOT IN over a nullable subquery — if the
    //    subquery produces ANY null, SQL three-valued logic makes every
    //    NOT IN row UNKNOWN (zero rows); otherwise it is a plain anti
    //    join. Spark plans the null-aware variant as
    //    BroadcastNestedLoopJoin/NAAJ — both branches exercised here. ──
    QueryDef(
      "join_null_aware_anti",
      "NOT IN with and without a NULL in the subquery (null-aware anti join)",
      (s, d) => {
        t(s, d, "customer").createOrReplaceTempView("graft_naaj_customer")
        t(s, d, "orders").createOrReplaceTempView("graft_naaj_orders")
        s.sql("""SELECT 'no_null' AS variant, count(*) AS n FROM graft_naaj_customer
                |WHERE c_custkey NOT IN (SELECT o_custkey FROM graft_naaj_orders
                |  WHERE o_orderdate >= '1998-01-01')
                |UNION ALL
                |SELECT 'with_null' AS variant, count(*) AS n FROM graft_naaj_customer
                |WHERE c_custkey NOT IN (SELECT nullif(o_custkey, o_custkey) FROM graft_naaj_orders
                |  WHERE o_orderdate >= '1998-01-01')""".stripMargin)
      },
      Some("""SELECT 'no_null' AS variant, count(*) AS n FROM customer
             |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
             |  WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00')
             |UNION ALL
             |SELECT 'with_null' AS variant, count(*) AS n FROM customer
             |WHERE c_custkey NOT IN (SELECT nullif(o_custkey, o_custkey) FROM orders
             |  WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00')""".stripMargin)),

    // ── Time-series gap fill: densify a sparse (user, week) series over
    //    the full week grid (sequence + explode — no driver loop) and
    //    forward-fill missing weeks with the last observed value
    //    (IGNORE NULLS running window). Leading gaps stay null. ──
    QueryDef(
      "gapfill_weekly",
      "dense weekly revenue per user with forward fill over missing weeks",
      (s, d) => {
        val wk = t(s, d, "events").filter(col("user_id") < 5)
          .groupBy(col("user_id"), expr("ts_ns div 604800000000000").as("week"))
          .agg(round(sum("value"), 2).as("rev"))
        val bounds = wk.agg(min("week").as("w0"), max("week").as("w1"))
        val grid = wk.select("user_id").distinct()
          .crossJoin(broadcast(bounds))
          .select(col("user_id"), explode(sequence(col("w0"), col("w1"))).as("week"))
        val w = Window.partitionBy("user_id").orderBy("week")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        grid.join(wk, Seq("user_id", "week"), "left_outer")
          .select(col("user_id"), col("week"),
            col("rev"),
            coalesce(col("rev"), last(col("rev"), ignoreNulls = true).over(w))
              .as("rev_filled"))
      },
      Some("""WITH wk AS (SELECT user_id, epoch_ns(ts) // 604800000000000 AS week,
             |    round(sum(value), 2) AS rev
             |  FROM events WHERE user_id < 5 GROUP BY 1, 2),
             |bounds AS (SELECT min(week) AS w0, max(week) AS w1 FROM wk),
             |grid AS (SELECT u.user_id, g.week
             |  FROM (SELECT DISTINCT user_id FROM wk) u
             |  CROSS JOIN (SELECT unnest(generate_series(w0, w1)) AS week FROM bounds) g)
             |SELECT g.user_id, g.week, wk.rev,
             |  coalesce(wk.rev, last_value(wk.rev IGNORE NULLS) OVER
             |    (PARTITION BY g.user_id ORDER BY g.week
             |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS rev_filled
             |FROM grid g LEFT JOIN wk ON wk.user_id = g.user_id AND wk.week = g.week""".stripMargin)),

    // ── Cohort retention: week-over-week active-user overlap — distinct
    //    actives per week, then a keyed self-join on week+1 (temporal
    //    self-join of aggregated sets; both sides already reduced before
    //    the join, so the shuffle carries distinct (week, user) pairs,
    //    not raw events) ──
    QueryDef(
      "retention_weekly",
      "weekly active users and week-over-week retained count",
      (s, d) => {
        // integer `div`, not `/`: double division of ns-scale longs
        // loses exactness past 2^53 and could misplace a week boundary
        val wk = t(s, d, "events")
          .select(expr("ts_ns div 604800000000000").as("week"),
            col("user_id")).distinct()
        wk.groupBy("week").agg(countDistinct("user_id").as("n_active"))
          .join(
            wk.join(wk.select((col("week") - 1).as("week"), col("user_id")),
                Seq("week", "user_id"), "left_semi")
              .groupBy("week").agg(countDistinct("user_id").as("n_retained")),
            Seq("week"), "left_outer")
          .select(col("week"), col("n_active"),
            coalesce(col("n_retained"), lit(0L)).as("n_retained"))
      },
      Some("""WITH wk AS (SELECT DISTINCT epoch_ns(ts) // 604800000000000 AS week, user_id
             |  FROM events),
             |act AS (SELECT week, count(DISTINCT user_id) AS n_active FROM wk GROUP BY 1),
             |ret AS (SELECT a.week, count(DISTINCT a.user_id) AS n_retained
             |  FROM wk a JOIN wk b ON b.week = a.week + 1 AND b.user_id = a.user_id
             |  GROUP BY 1)
             |SELECT act.week, act.n_active, coalesce(ret.n_retained, 0) AS n_retained
             |FROM act LEFT JOIN ret USING (week)""".stripMargin)),

    // ── Rollup (grouping sets surface) ──
    QueryDef(
      "rollup_region_nation",
      "GROUP BY ROLLUP hierarchy totals",
      (s, d) => {
        t(s, d, "customer").createOrReplaceTempView("graft_rollup_customer")
        t(s, d, "nation").createOrReplaceTempView("graft_rollup_nation")
        t(s, d, "region").createOrReplaceTempView("graft_rollup_region")
        s.sql("""SELECT r_name, n_name, count(*) AS n_cust
                |FROM graft_rollup_customer
                |JOIN graft_rollup_nation ON c_nationkey = n_nationkey
                |JOIN graft_rollup_region ON n_regionkey = r_regionkey
                |GROUP BY ROLLUP (r_name, n_name)""".stripMargin)
      },
      Some("""SELECT r_name, n_name, count(*) AS n_cust
             |FROM customer JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |GROUP BY ROLLUP (r_name, n_name)""".stripMargin)),

    // ── TPC-H Q18 shape: aggregate → HAVING → semi-join enrichment.
    //    The HAVING prunes the aggregate BEFORE the joins, so only
    //    qualifying orders flow into the customer lookup — the shape
    //    Catalyst should never turn into join-then-filter. ──
    QueryDef(
      "q18_large_orders",
      "orders above a total-quantity threshold with customer context",
      (s, d) => {
        val big = t(s, d, "lineitem")
          .groupBy("l_orderkey")
          .agg(sum("l_quantity").as("sum_qty"))
          .filter(col("sum_qty") > 300)
        t(s, d, "orders")
          .join(big, col("o_orderkey") === col("l_orderkey"))
          .join(broadcast(t(s, d, "customer")), col("o_custkey") === col("c_custkey"))
          .select(col("c_name"), col("o_orderkey"), col("o_orderdate"),
            round(col("o_totalprice"), 2).as("o_price"),
            round(col("sum_qty"), 2).as("sum_qty"))
      },
      Some("""SELECT c_name, o_orderkey, o_orderdate,
             |  round(o_totalprice, 2) AS o_price, round(sum_qty, 2) AS sum_qty
             |FROM orders
             |JOIN (SELECT l_orderkey, sum(l_quantity) AS sum_qty FROM lineitem
             |      GROUP BY l_orderkey HAVING sum(l_quantity) > 300) big
             |  ON o_orderkey = big.l_orderkey
             |JOIN customer ON o_custkey = c_custkey""".stripMargin)),

    // ── CUBE with grouping_id: all four aggregation granularities in
    //    one pass; gid disambiguates "aggregated" from genuine NULLs
    //    (both engines use the same bit convention, cast to BIGINT). ──
    QueryDef(
      "cube_segment_year",
      "GROUP BY CUBE over market segment × order year with grouping id",
      (s, d) => {
        t(s, d, "customer").createOrReplaceTempView("graft_cube_customer")
        t(s, d, "orders").createOrReplaceTempView("graft_cube_orders")
        s.sql("""SELECT c_mktsegment, year(o_orderdate) AS yr,
                |  CAST(grouping_id(c_mktsegment, year(o_orderdate)) AS BIGINT) AS gid,
                |  count(*) AS n, round(sum(o_totalprice), 2) AS total
                |FROM graft_cube_orders JOIN graft_cube_customer ON o_custkey = c_custkey
                |GROUP BY CUBE (c_mktsegment, year(o_orderdate))""".stripMargin)
      },
      Some("""SELECT c_mktsegment, year(o_orderdate) AS yr,
             |  CAST(GROUPING(c_mktsegment, year(o_orderdate)) AS BIGINT) AS gid,
             |  count(*) AS n, round(sum(o_totalprice), 2) AS total
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |GROUP BY CUBE (c_mktsegment, year(o_orderdate))""".stripMargin)),

    // ── Window RANGE frame: trailing-90-day revenue per customer —
    //    value-based frame bounds (peers included), vs the ROWS frames
    //    used elsewhere. day_no anchors the range arithmetic to an
    //    integer on both engines. ──
    QueryDef(
      "window_range_trailing",
      "per-customer trailing-90-day order revenue via a RANGE window frame",
      (s, d) =>
        t(s, d, "orders")
          .withColumn("day_no", datediff(col("o_orderdate"), lit("1992-01-01")))
          .select(col("o_custkey"), col("o_orderkey"), col("day_no"),
            round(sum("o_totalprice").over(
              Window.partitionBy("o_custkey").orderBy("day_no")
                .rangeBetween(-90, Window.currentRow)), 2).as("trail_90d")),
      Some("""SELECT o_custkey, o_orderkey,
             |  datediff('day', DATE '1992-01-01', o_orderdate) AS day_no,
             |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey
             |    ORDER BY datediff('day', DATE '1992-01-01', o_orderdate)
             |    RANGE BETWEEN 90 PRECEDING AND CURRENT ROW), 2) AS trail_90d
             |FROM orders""".stripMargin)),

    // ── Window: running sum (deterministic order ⇒ bit-identical floats) ──
    QueryDef(
      "window_running_sum",
      "cumulative sum per partition in deterministic order",
      (s, d) =>
        t(s, d, "orders")
          .select(col("o_custkey"), col("o_orderkey"),
            round(sum("o_totalprice").over(
              Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2).as("running")),
      Some("""SELECT o_custkey, o_orderkey,
             |round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             |ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running
             |FROM orders""".stripMargin),
      bench = true),

    // ── Window: rank ──
    QueryDef(
      "window_rank_acctbal",
      "rank() per partition",
      (s, d) =>
        t(s, d, "customer")
          .select(col("c_nationkey"), col("c_custkey"),
            rank().over(Window.partitionBy("c_nationkey").orderBy(col("c_acctbal").desc)).as("rnk"))
          .filter(col("rnk") <= 3),
      Some("""SELECT c_nationkey, c_custkey, rnk FROM (
             |SELECT c_nationkey, c_custkey,
             |rank() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS rnk
             |FROM customer) WHERE rnk <= 3""".stripMargin)),

    // ── Bucketed range join: point-in-interval without the cartesian
    //    product — intervals exploded to covered buckets, equi-join on
    //    the bucket id, exact BETWEEN only on colocated candidates
    //    (operators/RangeJoin; the non-equi-join scale path) ──
    QueryDef(
      "range_bucket_join",
      "customers within ±50 of each supplier's balance, via bucketed range join",
      (s, d) => {
        val ivals = t(s, d, "supplier")
          .select(col("s_suppkey"),
            (col("s_acctbal") - 50.0).as("lo"), (col("s_acctbal") + 50.0).as("hi"))
        graft.operators.RangeJoin.pointInInterval(
            t(s, d, "customer").select("c_custkey", "c_acctbal"),
            "c_acctbal", ivals, "lo", "hi", width = 100.0)
          .groupBy("s_suppkey")
          .agg(count(lit(1)).as("n_cust"), min("c_custkey").as("min_cust"))
      },
      Some("""SELECT s_suppkey, count(*) AS n_cust, min(c_custkey) AS min_cust
             |FROM supplier JOIN customer
             |  ON c_acctbal >= s_acctbal - 50.0 AND c_acctbal <= s_acctbal + 50.0
             |GROUP BY s_suppkey""".stripMargin)),

    // ── Interval-overlap join: two interval sets joined on overlap via
    //    shared buckets, each pair claimed by its first shared bucket
    //    (exactly-once emission without a distinct pass) ──
    QueryDef(
      "range_overlap_join",
      "supplier ±50 balance bands overlapping customer ±20 bands, counts per supplier",
      (s, d) => {
        val sup = t(s, d, "supplier")
          .select(col("s_suppkey"),
            (col("s_acctbal") - 50.0).as("s_lo"), (col("s_acctbal") + 50.0).as("s_hi"))
        val cust = t(s, d, "customer")
          .select(col("c_custkey"),
            (col("c_acctbal") - 20.0).as("c_lo"), (col("c_acctbal") + 20.0).as("c_hi"))
        graft.operators.RangeJoin.intervalOverlap(
            sup, "s_lo", "s_hi", cust, "c_lo", "c_hi", width = 100.0)
          .groupBy("s_suppkey")
          .agg(count(lit(1)).as("n_overlap"), min("c_custkey").as("min_cust"))
      },
      Some("""SELECT s_suppkey, count(*) AS n_overlap, min(c_custkey) AS min_cust
             |FROM supplier JOIN customer
             |  ON s_acctbal - 50.0 <= c_acctbal + 20.0
             | AND c_acctbal - 20.0 <= s_acctbal + 50.0
             |GROUP BY s_suppkey""".stripMargin),
      bench = true),

    // ── Global total-order sort: ORDER BY with no limit — plans as a
    //    sampled RangePartitioning exchange + per-partition sort, the
    //    scale path for totally-ordered output (no single-partition
    //    sort; a global POSITION column would need the Packing
    //    prefix-sum pattern — a global row_number() window is exactly
    //    the Exchange-SinglePartition anti-pattern this avoids). The
    //    oracle verifies content; sortedness is pinned by the plan
    //    (PlansSpec-style RangePartitioning evidence in PLANS.md). ──
    QueryDef(
      "global_sort_orders",
      "all orders globally sorted by (totalprice desc, orderkey)",
      (s, d) =>
        t(s, d, "orders")
          .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("price"))
          .orderBy(col("price").desc, col("o_orderkey")),
      Some("""SELECT o_orderkey, round(o_totalprice, 2) AS price
             |FROM orders ORDER BY price DESC, o_orderkey""".stripMargin)),

    // ── Window: distribution battery — ntile quartiles, percent_rank,
    //    cume_dist over a unique total order (acctbal desc, custkey), so
    //    every rank function is deterministic and exactly oracle-able ──
    QueryDef(
      "window_ntile_battery",
      "ntile/percent_rank/cume_dist per nation over a unique order",
      (s, d) => {
        val w = Window.partitionBy("c_nationkey")
          .orderBy(col("c_acctbal").desc, col("c_custkey"))
        // pct/cume are k/n rationals that can land EXACTLY on a .5 at
        // the rounding digit (caught at sf0.1: 333/640 = 0.5203125 —
        // Spark's decimal HALF_UP said …13, DuckDB's float round said
        // …12). Quantizing through DECIMAL(18,12) first makes both
        // engines round the same decimal value half-up.
        t(s, d, "customer")
          .select(col("c_nationkey"), col("c_custkey"),
            ntile(4).over(w).as("quartile"),
            round(percent_rank().over(w).cast("decimal(18,12)"), 6)
              .cast("double").as("pct_rank"),
            round(cume_dist().over(w).cast("decimal(18,12)"), 6)
              .cast("double").as("cume"))
      },
      Some("""SELECT c_nationkey, c_custkey,
             |ntile(4) OVER w AS quartile,
             |round((percent_rank() OVER w)::DECIMAL(18,12), 6)::DOUBLE AS pct_rank,
             |round((cume_dist() OVER w)::DECIMAL(18,12), 6)::DOUBLE AS cume
             |FROM customer
             |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)""".stripMargin)),

    // ── GROUPING SETS beyond rollup/cube: mixed, non-hierarchical sets
    //    — per-segment totals, per-year totals, and the grand total in
    //    one aggregation pass (no (segment, year) cross detail) ──
    QueryDef(
      "groupingsets_segment_year",
      "mixed GROUPING SETS: by segment, by year, grand total",
      (s, d) => {
        t(s, d, "customer").createOrReplaceTempView("graft_gs_customer")
        t(s, d, "orders").createOrReplaceTempView("graft_gs_orders")
        s.sql("""SELECT c_mktsegment, year(o_orderdate) AS yr,
                |  count(*) AS n, round(sum(o_totalprice), 2) AS total
                |FROM graft_gs_orders JOIN graft_gs_customer ON o_custkey = c_custkey
                |GROUP BY GROUPING SETS ((c_mktsegment), (year(o_orderdate)), ())""".stripMargin)
      },
      Some("""SELECT c_mktsegment, year(o_orderdate) AS yr,
             |  count(*) AS n, round(sum(o_totalprice), 2) AS total
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |GROUP BY GROUPING SETS ((c_mktsegment), (year(o_orderdate)), ())""".stripMargin)),

    // ── Unpivot (wide → long): the inverse of the pivot query — per-year
    //    priority counts melted back to (yr, priority, n) rows, zero
    //    combos preserved. Plans as an Expand projection, no shuffle. ──
    QueryDef(
      "unpivot_priority_long",
      "unpivot per-year priority counts back to long form",
      (s, d) => {
        val wide = t(s, d, "orders")
          .groupBy(year(col("o_orderdate")).as("yr"))
          .pivot("o_orderpriority",
            Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
          .count()
          .select(col("yr"),
            coalesce(col("`1-URGENT`"), lit(0L)).as("p_urgent"),
            coalesce(col("`2-HIGH`"), lit(0L)).as("p_high"),
            coalesce(col("`3-MEDIUM`"), lit(0L)).as("p_medium"),
            coalesce(col("`4-NOT SPECIFIED`"), lit(0L)).as("p_notspec"),
            coalesce(col("`5-LOW`"), lit(0L)).as("p_low"))
        wide.unpivot(Array(col("yr")),
          Array(col("p_urgent"), col("p_high"), col("p_medium"),
            col("p_notspec"), col("p_low")),
          "priority", "n")
      },
      Some("""WITH yrs AS (SELECT DISTINCT year(o_orderdate)::INT AS yr FROM orders),
             |prio AS (SELECT unnest(['p_urgent','p_high','p_medium','p_notspec','p_low']) AS priority,
             |  unnest(['1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW']) AS raw),
             |cnt AS (SELECT year(o_orderdate)::INT AS yr, o_orderpriority AS raw, count(*) AS n
             |  FROM orders GROUP BY 1, 2)
             |SELECT y.yr, p.priority, coalesce(c.n, 0) AS n
             |FROM yrs y CROSS JOIN prio p
             |LEFT JOIN cnt c ON c.yr = y.yr AND c.raw = p.raw""".stripMargin)),

    // ── Window: value-extraction battery — first_value / last_value /
    //    nth_value over a deterministic order, plus an IGNORE NULLS
    //    first (nulls injected via nullif so the skip path executes).
    //    last_value uses the running frame (unbounded→current), the
    //    only deterministic choice for it. ──
    QueryDef(
      "window_value_battery",
      "first/last/nth_value per customer order history, with ignore-nulls",
      (s, d) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, d, "orders")
          .select(col("o_custkey"), col("o_orderkey"),
            round(first_value(col("o_totalprice")).over(w), 2).as("first_price"),
            round(last(col("o_totalprice")).over(w), 2).as("running_last"),
            round(nth_value(col("o_totalprice"), 2).over(w), 2).as("second_price"),
            round(first_value(
              when(col("o_orderpriority") =!= "1-URGENT", lit(1)).otherwise(lit(0))
                * col("o_totalprice")).over(w), 2).as("first_flagged"),
            round(first(
              when(col("o_orderpriority") =!= "1-URGENT", col("o_totalprice")),
              ignoreNulls = true).over(w), 2).as("first_nonurgent"))
      },
      Some("""SELECT o_custkey, o_orderkey,
             |round(first_value(o_totalprice) OVER w, 2) AS first_price,
             |round(last_value(o_totalprice) OVER w, 2) AS running_last,
             |round(nth_value(o_totalprice, 2) OVER w, 2) AS second_price,
             |round(first_value(CASE WHEN o_orderpriority <> '1-URGENT' THEN 1 ELSE 0 END
             |  * o_totalprice) OVER w, 2) AS first_flagged,
             |round(first_value(CASE WHEN o_orderpriority <> '1-URGENT' THEN o_totalprice END
             |  IGNORE NULLS) OVER w, 2) AS first_nonurgent
             |FROM orders
             |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin)),

    // ── Numeric aggregate battery ──
    QueryDef(
      "agg_stats_battery",
      "min/max/avg/stddev/count-distinct per group",
      (s, d) =>
        t(s, d, "orders")
          .groupBy("o_orderpriority")
          .agg(
            round(min("o_totalprice"), 2).as("min_price"),
            round(max("o_totalprice"), 2).as("max_price"),
            round(avg("o_totalprice"), 4).as("avg_price"),
            round(stddev_samp(col("o_totalprice")), 4).as("sd_price"),
            countDistinct(col("o_custkey")).as("n_cust")),
      Some("""SELECT o_orderpriority, round(min(o_totalprice), 2) AS min_price,
             |round(max(o_totalprice), 2) AS max_price, round(avg(o_totalprice), 4) AS avg_price,
             |round(stddev_samp(o_totalprice), 4) AS sd_price,
             |count(DISTINCT o_custkey) AS n_cust
             |FROM orders GROUP BY o_orderpriority""".stripMargin)),

    // ── Pivot: wide conditional aggregation (Spark .pivot with a known
    //    value list → no extra distinct pass; parquet-safe aliases) ──
    QueryDef(
      "pivot_priority_by_year",
      "order counts pivoted to one column per priority",
      (s, d) =>
        t(s, d, "orders")
          .groupBy(year(col("o_orderdate")).as("yr"))
          .pivot("o_orderpriority",
            Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
          .count()
          .select(col("yr"), // pivot yields NULL for absent combos; oracle's FILTER count yields 0
            coalesce(col("`1-URGENT`"), lit(0L)).as("p_urgent"),
            coalesce(col("`2-HIGH`"), lit(0L)).as("p_high"),
            coalesce(col("`3-MEDIUM`"), lit(0L)).as("p_medium"),
            coalesce(col("`4-NOT SPECIFIED`"), lit(0L)).as("p_notspec"),
            coalesce(col("`5-LOW`"), lit(0L)).as("p_low")),
      Some("""SELECT year(o_orderdate)::INT AS yr,
             |count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS p_urgent,
             |count(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS p_high,
             |count(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS p_medium,
             |count(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS p_notspec,
             |count(*) FILTER (WHERE o_orderpriority = '5-LOW') AS p_low
             |FROM orders GROUP BY 1""".stripMargin)),

    // ── Correlated scalar subquery: Catalyst decorrelates
    //    (RewriteCorrelatedScalarSubquery) into an aggregate + join —
    //    the rewrite the reference never needed but a SQL user gets
    //    free. Max-order-per-customer selection. ──
    QueryDef(
      "sub_correlated_max",
      "correlated scalar subquery (decorrelated to aggregate+join)",
      (s, d) => {
        t(s, d, "orders").createOrReplaceTempView("graft_sub_orders")
        s.sql("""SELECT o_orderkey, o_custkey, o_totalprice FROM graft_sub_orders o
                |WHERE o_totalprice = (SELECT max(o2.o_totalprice)
                |  FROM graft_sub_orders o2 WHERE o2.o_custkey = o.o_custkey)""".stripMargin)
      },
      Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders o
             |WHERE o_totalprice = (SELECT max(o2.o_totalprice)
             |  FROM orders o2 WHERE o2.o_custkey = o.o_custkey)""".stripMargin)),

    // ── EXISTS predicate subquery (RewritePredicateSubquery → semi join) ──
    QueryDef(
      "sub_exists_bigorder",
      "EXISTS subquery rewritten to a left-semi join",
      (s, d) => {
        t(s, d, "customer").createOrReplaceTempView("graft_sub_customer")
        t(s, d, "orders").createOrReplaceTempView("graft_sub_orders2")
        s.sql("""SELECT c_custkey, c_name FROM graft_sub_customer c
                |WHERE EXISTS (SELECT 1 FROM graft_sub_orders2 o
                |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)""".stripMargin)
      },
      Some("""SELECT c_custkey, c_name FROM customer c
             |WHERE EXISTS (SELECT 1 FROM orders o
             |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)""".stripMargin)),

    // ── lead/lag windows: inter-order gap per customer ──
    QueryDef(
      "window_lead_lag",
      "days since the customer's previous order (lag over ordered window)",
      (s, d) =>
        t(s, d, "orders")
          .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
          .withColumn("prev_date", lag("o_orderdate", 1).over(
            Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))))
          .withColumn("gap_days", datediff(col("o_orderdate"), col("prev_date")))
          .select("o_custkey", "o_orderkey", "gap_days"),
      Some("""SELECT o_custkey, o_orderkey,
             |date_diff('day', lag(o_orderdate) OVER
             |  (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
             |  o_orderdate)::INT AS gap_days
             |FROM orders""".stripMargin)),

    // ── Exact percentiles (linear interpolation — Spark `percentile`
    //    and DuckDB `quantile_cont` share the definition) ──
    QueryDef(
      "agg_percentiles",
      "exact interpolated median/p95 per group",
      (s, d) =>
        t(s, d, "orders")
          .groupBy("o_orderpriority")
          .agg(
            round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50_price"),
            round(expr("percentile(o_totalprice, 0.95)"), 4).as("p95_price")),
      Some("""SELECT o_orderpriority,
             |round(quantile_cont(o_totalprice, 0.5), 4) AS p50_price,
             |round(quantile_cont(o_totalprice, 0.95), 4) AS p95_price
             |FROM orders GROUP BY o_orderpriority""".stripMargin)),

    // ── Approximate percentile with a HARD rank-error contract (the
    //    approx_distinct_users pattern for the second big estimator):
    //    approx_percentile's GK summary DETERMINISTICALLY guarantees
    //    rank error ≤ ε·n at accuracy 1/ε, so the returned value's
    //    true rank interval [#<v, #≤v] must intersect
    //    [(p−ε)·n, (p+ε)·n]. The query checks that in-row against the
    //    exact counts; the oracle expects `true`, so a sketch
    //    regression turns the row red — no engine-specific sketch
    //    state is ever compared. ε = 10⁻⁴ (accuracy 10000); the
    //    acceptance window uses the floor/ceil rank bounds of the GK
    //    contract, in pure integer arithmetic (a strict ±ε·n double
    //    bound rejects legitimate boundary ranks — observed 2 vs
    //    1.9926 on the N flag). ──
    QueryDef(
      "approx_percentile_contract",
      "approx_percentile(0.5) checked against its rank-error guarantee per group",
      (s, d) => {
        val ap = t(s, d, "lineitem")
          .groupBy("l_returnflag")
          .agg(expr("approx_percentile(l_extendedprice, 0.5, 10000)").as("apx"))
        t(s, d, "lineitem")
          .join(broadcast(ap), "l_returnflag")
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n"),
            sum(when(col("l_extendedprice") < col("apx"), 1L).otherwise(0L)).as("__lt"),
            sum(when(col("l_extendedprice") <= col("apx"), 1L).otherwise(0L)).as("__le"))
          .select(col("l_returnflag"), col("n"),
            (col("__lt") <= expr("(n * 5001 + 9999) div 10000") &&
              col("__le") >= expr("(n * 4999) div 10000")).as("within_bound"))
      },
      Some("""SELECT l_returnflag, count(*) AS n, true AS within_bound
             |FROM lineitem GROUP BY 1""".stripMargin)),

    // ── Fixed-width histogram: the profiling primitive — one groupBy
    //    on the integer bin id (floor division), map-side combinable;
    //    no sort, no per-bin pass ──
    QueryDef(
      "histogram_order_value",
      "order-value histogram in 1000-unit bins with per-bin extrema",
      (s, d) =>
        t(s, d, "orders")
          .groupBy(floor(col("o_totalprice") / 1000.0).cast("long").as("bin"))
          .agg(count(lit(1)).as("n"),
            round(min("o_totalprice"), 2).as("lo"),
            round(max("o_totalprice"), 2).as("hi")),
      Some("""SELECT floor(o_totalprice / 1000.0)::BIGINT AS bin, count(*) AS n,
             |round(min(o_totalprice), 2) AS lo, round(max(o_totalprice), 2) AS hi
             |FROM orders GROUP BY 1""".stripMargin)),

    // ── Deterministic per-group mode: most frequent value chosen by
    //    (count desc, value) — NOT the built-in mode(), whose tie
    //    behavior is engine-defined; the two-level count + rank makes
    //    ties reproducible on both engines ──
    QueryDef(
      "mode_priority_per_nation",
      "most common order priority per customer nation (deterministic ties)",
      (s, d) =>
        t(s, d, "orders")
          .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
          .groupBy("c_nationkey", "o_orderpriority")
          .agg(count(lit(1)).as("n"))
          .withColumn("rn", row_number().over(
            Window.partitionBy("c_nationkey")
              .orderBy(col("n").desc, col("o_orderpriority"))))
          .filter(col("rn") === 1)
          .select("c_nationkey", "o_orderpriority", "n"),
      Some("""SELECT c_nationkey, o_orderpriority, n FROM (
             |  SELECT c_nationkey, o_orderpriority, count(*) AS n,
             |    row_number() OVER (PARTITION BY c_nationkey
             |      ORDER BY count(*) DESC, o_orderpriority) AS rn
             |  FROM orders JOIN customer ON o_custkey = c_custkey
             |  GROUP BY c_nationkey, o_orderpriority)
             |WHERE rn = 1""".stripMargin)),

    // ── Share-of-total window: each group's fraction of the global
    //    aggregate via an unpartitioned SUM-over-SUM window on the
    //    ALREADY-AGGREGATED frame (25 nation rows — the empty-frame
    //    window is over group totals, never raw rows, so the
    //    single-partition exchange moves a dimension-sized frame) ──
    QueryDef(
      "window_share_of_total",
      "per-nation revenue and share of the global total",
      (s, d) => {
        val byNation = t(s, d, "customer")
          .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"))
          .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
          .groupBy("n_name")
          .agg(sum("o_totalprice").as("rev"))
        byNation
          .withColumn("share", round(
            (col("rev") / sum("rev").over(Window.partitionBy())).cast("decimal(18,12)"), 6)
            .cast("double"))
          .select(col("n_name"), round(col("rev"), 2).as("revenue"), col("share"))
      },
      Some("""WITH by_nation AS (SELECT n_name, sum(o_totalprice) AS rev
             |  FROM customer JOIN orders ON c_custkey = o_custkey
             |  JOIN nation ON c_nationkey = n_nationkey
             |  GROUP BY n_name)
             |SELECT n_name, round(rev, 2) AS revenue,
             |  round((rev / sum(rev) OVER ())::DECIMAL(18,12), 6)::DOUBLE AS share
             |FROM by_nation""".stripMargin)),

    // ── MapType round-trip: per-user map of event_type → count built
    //    with map_from_entries over a deterministically sorted entry
    //    list, then exploded back to rows — the MapType construction /
    //    explosion surface (SURVEY §1.2) with an order-independent
    //    oracle ──
    QueryDef(
      "map_type_roundtrip",
      "event counts built into a per-user map and exploded back",
      (s, d) =>
        t(s, d, "events").filter(col("user_id") < 20)
          .groupBy("user_id", "event_type").agg(count(lit(1)).as("n"))
          .groupBy("user_id")
          .agg(map_from_entries(sort_array(collect_list(struct(col("event_type"), col("n")))))
            .as("m"))
          .select(col("user_id"), explode(col("m")).as(Seq("event_type", "n"))),
      Some("""SELECT user_id, event_type, count(*) AS n FROM events
             |WHERE user_id < 20 GROUP BY 1, 2""".stripMargin)),

    // ── ANSI-mode safety battery: try_divide / try_cast / try_add turn
    //    the errors ANSI mode raises (division by zero, bad casts,
    //    overflow) into NULLs — the row-level error-tolerance surface a
    //    dirty 100 TB corpus needs (fail the row, not the job) ──
    QueryDef(
      "ansi_try_battery",
      "try_divide/try_cast/try_add null out row-level errors under ANSI mode",
      (s, d) =>
        t(s, d, "orders").filter(col("o_orderkey") <= 100)
          .select(col("o_orderkey"),
            round(expr("try_divide(o_totalprice, o_orderkey % 3)"), 4).as("div_or_null"),
            expr("try_cast(o_orderpriority AS INT)").as("bad_cast"),
            expr("try_cast(substring(o_orderpriority, 1, 1) AS INT)").as("prio_digit"),
            expr("try_add(9223372036854775807L, o_orderkey + 1)").as("overflow_null")),
      Some("""SELECT o_orderkey,
             |CASE WHEN o_orderkey % 3 = 0 THEN NULL
             |  ELSE round(o_totalprice / (o_orderkey % 3), 4) END AS div_or_null,
             |try_cast(o_orderpriority AS INT) AS bad_cast,
             |try_cast(substring(o_orderpriority, 1, 1) AS INT) AS prio_digit,
             |CAST(NULL AS BIGINT) AS overflow_null
             |FROM orders WHERE o_orderkey <= 100""".stripMargin)),

    // ── Bitmap-index aggregation: exact distinct via fixed-size bitmap
    //    buckets (bitmap_construct_agg per bucket, bitmap_or_agg to
    //    merge) — the roaring-bitmap-style exact-distinct scale path:
    //    mergeable like a sketch, exact like count(distinct), state
    //    bounded per (group, bucket). ──
    QueryDef(
      "bitmap_distinct_users",
      "exact distinct users per event type via bitmap aggregation",
      (s, d) =>
        t(s, d, "events")
          .select(col("event_type"),
            expr("bitmap_bucket_number(user_id)").as("bucket"),
            expr("bitmap_bit_position(user_id)").as("pos"))
          .groupBy("event_type", "bucket")
          .agg(expr("bitmap_construct_agg(pos)").as("bm"))
          .groupBy("event_type")
          .agg(sum(expr("bitmap_count(bm)")).as("n_users")),
      Some("""SELECT event_type, count(DISTINCT user_id) AS n_users
             |FROM events GROUP BY event_type""".stripMargin)),

    // ── Robust statistics: median + MAD (median absolute deviation) —
    //    two-pass aggregate: per-group median, broadcast back, median
    //    of absolute deviations. The outlier-resistant spread measure
    //    (agg_percentiles proved percentile/quantile_cont parity). ──
    QueryDef(
      "robust_stats_mad",
      "per-priority median and median-absolute-deviation of order value",
      (s, d) => {
        val med = t(s, d, "orders")
          .groupBy("o_orderpriority")
          .agg(expr("percentile(o_totalprice, 0.5)").as("med"))
        t(s, d, "orders")
          .join(broadcast(med), Seq("o_orderpriority"))
          .groupBy("o_orderpriority", "med")
          .agg(round(expr("percentile(abs(o_totalprice - med), 0.5)"), 4).as("mad"))
          .select(col("o_orderpriority"), round(col("med"), 4).as("median"), col("mad"))
      },
      Some("""WITH med AS (SELECT o_orderpriority, quantile_cont(o_totalprice, 0.5) AS med
             |  FROM orders GROUP BY 1)
             |SELECT o.o_orderpriority, round(m.med, 4) AS median,
             |  round(quantile_cont(abs(o.o_totalprice - m.med), 0.5), 4) AS mad
             |FROM orders o JOIN med m USING (o_orderpriority)
             |GROUP BY o.o_orderpriority, m.med""".stripMargin)),

    // ── Robust OUTLIER LISTING: orders whose value deviates from their
    //    priority-group median by more than 2× the group MAD. Unlike
    //    robust_stats_mad (which only EMITS statistics), this query
    //    COMPARES against them, so everything is integer: values in
    //    cents, medians as the exact lower-median (the ⌈n/2⌉-th
    //    smallest via row_number — a data value, not an interpolation),
    //    and the threshold test is pure BIGINT arithmetic. ──
    QueryDef(
      "outliers_mad",
      "per-priority robust outliers: |x − median| > 2·MAD in exact integer cents",
      (s, d) => {
        val w = Window.partitionBy("o_orderpriority")
        val cents = t(s, d, "orders")
          .select(col("o_orderkey"), col("o_orderpriority"),
            expr("CAST(floor(o_totalprice * 100 + 0.5D) AS BIGINT)").as("c"))
        def lowerMedian(df: DataFrame, valCol: String, outCol: String): DataFrame =
          df.withColumn("__rn", row_number().over(w.orderBy(col(valCol), col("o_orderkey"))))
            .withColumn("__n", count(lit(1)).over(w))
            .filter(col("__rn") === expr("(__n + 1) div 2"))
            .select(col("o_orderpriority"), col(valCol).as(outCol))
        val med = lowerMedian(cents, "c", "med")
        val dev = cents.join(broadcast(med), "o_orderpriority")
          .withColumn("ad", expr("abs(c - med)"))
        val mad = lowerMedian(dev.select(col("o_orderkey"), col("o_orderpriority"),
          col("ad").as("c")), "c", "mad")
        dev.join(broadcast(mad), "o_orderpriority")
          .filter(expr("ad > 2 * mad"))
          .select(col("o_orderpriority"), col("o_orderkey"), col("c"),
            col("med"), col("mad"), col("ad"))
          .orderBy(col("ad").desc, col("o_orderkey"))
          .limit(50)
      },
      Some("""WITH cents AS (SELECT o_orderkey, o_orderpriority,
             |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c FROM orders),
             |med AS (SELECT o_orderpriority, c AS med FROM (
             |  SELECT o_orderpriority, c,
             |    row_number() OVER (PARTITION BY o_orderpriority ORDER BY c, o_orderkey) AS rn,
             |    count(*) OVER (PARTITION BY o_orderpriority) AS n
             |  FROM cents) WHERE rn = (n + 1) // 2),
             |dev AS (SELECT cents.*, med.med, abs(c - med.med) AS ad
             |  FROM cents JOIN med USING (o_orderpriority)),
             |mad AS (SELECT o_orderpriority, ad AS mad FROM (
             |  SELECT o_orderpriority, ad,
             |    row_number() OVER (PARTITION BY o_orderpriority ORDER BY ad, o_orderkey) AS rn,
             |    count(*) OVER (PARTITION BY o_orderpriority) AS n
             |  FROM dev) WHERE rn = (n + 1) // 2)
             |SELECT dev.o_orderpriority, o_orderkey, c, dev.med, mad.mad, ad
             |FROM dev JOIN mad USING (o_orderpriority)
             |WHERE ad > 2 * mad.mad
             |ORDER BY ad DESC, o_orderkey LIMIT 50""".stripMargin)),

    // ── Quantile SKETCH with a hash-exact replay: per-priority
    //    p50/90/99 order values read off the QSketch log-linear
    //    histogram (16 integer sub-buckets per octave). Unlike HLL the
    //    estimator itself is deterministic integer arithmetic, so the
    //    oracle matches the ESTIMATE bit-for-bit; the one-sided ≤1/16
    //    relative error bound is additionally checked in-row against
    //    the exact rank value (oracle expects literal TRUE — the bound
    //    is a theorem, not an observation). The exact column is the
    //    expensive full-rank path the sketch replaces; it exists here
    //    only to enforce the contract. ──
    QueryDef(
      "qsketch_quantiles",
      "log-histogram quantile sketch: hash-exact p50/90/99 estimates + in-row error-bound proof",
      (s, d) => {
        import s.implicits._
        val cents = t(s, d, "orders").select(col("o_orderpriority").as("grp"),
          expr("greatest(CAST(floor(o_totalprice * 100 + 0.5D) AS BIGINT), 1)").as("c"))
        val est = graft.operators.QSketch.quantiles(
          graft.operators.QSketch.histogram(cents, "grp", "c"), Seq(50, 90, 99))
        val exact = cents
          .withColumn("rn", row_number().over(Window.partitionBy("grp").orderBy("c")))
          .withColumn("nn", count(lit(1)).over(Window.partitionBy("grp")))
          .join(broadcast(Seq(50, 90, 99).toDF("q")), expr("rn = (q * nn + 99) div 100"))
          .select(col("grp"), col("q"), col("c").as("exact"))
        est.join(exact, Seq("grp", "q"))
          .withColumn("within_bound", expr("est <= exact AND 16 * (exact - est) <= est + 16"))
          .select(col("grp"), col("q"), col("n"), col("est"), col("exact"), col("within_bound"))
          .orderBy("grp", "q")
      },
      Some("""WITH cents AS (SELECT o_orderpriority AS grp,
             |    greatest(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT), 1) AS c FROM orders),
             |b AS (SELECT grp, c, length(bin(c)) - 1 AS e FROM cents),
             |h AS (SELECT grp, e * 16 + ((c - (1::BIGINT << e)) * 16) // (1::BIGINT << e) AS bucket,
             |    count(*) AS cnt FROM b GROUP BY 1, 2),
             |n AS (SELECT grp, CAST(sum(cnt) AS BIGINT) AS n FROM h GROUP BY 1),
             |qs AS (SELECT grp, n, q FROM n, (VALUES (50), (90), (99)) t(q)),
             |ranked AS (SELECT grp, bucket, sum(cnt) OVER (PARTITION BY grp ORDER BY bucket) AS cum FROM h),
             |pick AS (SELECT qs.grp, qs.q, qs.n, min(bucket) AS bucket
             |  FROM qs JOIN ranked ON ranked.grp = qs.grp AND ranked.cum >= (qs.q * qs.n + 99) // 100
             |  GROUP BY 1, 2, 3),
             |est AS (SELECT grp, q, n, (1::BIGINT << (bucket // 16))
             |    + ((bucket % 16) * (1::BIGINT << (bucket // 16))) // 16 AS est FROM pick),
             |exact AS (SELECT grp, q, c AS exact FROM (
             |    SELECT grp, c, row_number() OVER (PARTITION BY grp ORDER BY c) AS rn,
             |        count(*) OVER (PARTITION BY grp) AS nn FROM cents) x
             |  JOIN (VALUES (50), (90), (99)) t(q) ON rn = (q * nn + 99) // 100)
             |SELECT est.grp, est.q, est.n, est.est, exact.exact, TRUE AS within_bound
             |FROM est JOIN exact ON est.grp = exact.grp AND est.q = exact.q
             |ORDER BY 1, 2""".stripMargin),
      bench = true),

    // ── Sketch MERGEABILITY proof: month-level QSketch histograms
    //    re-aggregated into quarters by bucket-wise count sum, then
    //    quantiles read off the MERGED sketch — hash-matched against an
    //    oracle that computes the quarter sketch from raw rows. The two
    //    are equal exactly because histogram(union) = Σ histograms:
    //    the sketch frame is a storage primitive (persist daily, roll
    //    up arbitrarily later), the same role KmvMergeAgg proves for
    //    distinct counts. ──
    QueryDef(
      "qsketch_rollup",
      "quantile sketch re-aggregation: month histograms merged to quarters == from-scratch",
      (s, d) => {
        val base = t(s, d, "orders").filter(expr("year(o_orderdate) = 1995"))
          .select(expr("month(o_orderdate)").as("m"),
            expr("greatest(CAST(floor(o_totalprice * 100 + 0.5D) AS BIGINT), 1)").as("c"))
        val monthly = graft.operators.QSketch.histogram(base, "m", "c")
        val quarterly = monthly
          .withColumn("grp", expr("(CAST(grp AS INT) + 2) div 3"))
          .groupBy("grp", "bucket").agg(sum("cnt").as("cnt"))
        graft.operators.QSketch.quantiles(quarterly, Seq(50, 95)).orderBy("grp", "q")
      },
      Some("""WITH cents AS (SELECT (month(o_orderdate) + 2) // 3 AS grp,
             |    greatest(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT), 1) AS c
             |  FROM orders WHERE year(o_orderdate) = 1995),
             |b AS (SELECT grp, c, length(bin(c)) - 1 AS e FROM cents),
             |h AS (SELECT grp, e * 16 + ((c - (1::BIGINT << e)) * 16) // (1::BIGINT << e) AS bucket,
             |    count(*) AS cnt FROM b GROUP BY 1, 2),
             |n AS (SELECT grp, CAST(sum(cnt) AS BIGINT) AS n FROM h GROUP BY 1),
             |qs AS (SELECT grp, n, q FROM n, (VALUES (50), (95)) t(q)),
             |ranked AS (SELECT grp, bucket, sum(cnt) OVER (PARTITION BY grp ORDER BY bucket) AS cum FROM h),
             |pick AS (SELECT qs.grp, qs.q, qs.n, min(bucket) AS bucket
             |  FROM qs JOIN ranked ON ranked.grp = qs.grp AND ranked.cum >= (qs.q * qs.n + 99) // 100
             |  GROUP BY 1, 2, 3)
             |SELECT grp, q, n, (1::BIGINT << (bucket // 16))
             |    + ((bucket % 16) * (1::BIGINT << (bucket // 16))) // 16 AS est
             |FROM pick ORDER BY 1, 2""".stripMargin)),

    // ── Histogram-driven RANGE SELECTIVITY estimation — the
    //    optimizer-statistics primitive: for a value predicate
    //    [lo, hi), the QSketch histogram yields a hard bracket —
    //    est_lo = rows in buckets fully inside the range,
    //    est_hi = rows in buckets touching it — and the true count
    //    provably sits between them (buckets partition the value
    //    line). Estimates hash-match the SQL replay; the bracket is a
    //    theorem, so the oracle expects literal TRUE. The exact column
    //    is the full scan the estimate replaces. ──
    QueryDef(
      "qsketch_selectivity",
      "range-predicate selectivity bracket from the quantile sketch: est_lo <= exact <= est_hi",
      (s, d) => {
        import s.implicits._
        val cents = t(s, d, "orders").select(lit("all").as("grp"),
          expr("greatest(CAST(floor(o_totalprice * 100 + 0.5D) AS BIGINT), 1)").as("c"))
        val ranges = Seq((10000000L, 20000000L), (20000000L, 40000000L),
          (40000000L, 60000000L)).toDF("lo", "hi")
        val est = graft.operators.QSketch.histogram(cents, "grp", "c")
          .withColumn("b_lo", graft.operators.QSketch.lowerBound("bucket"))
          .withColumn("b_hi", graft.operators.QSketch.lowerBound("(bucket + 1)"))
          .crossJoin(broadcast(ranges))
          .groupBy("lo", "hi")
          .agg(
            sum(when(col("b_lo") >= col("lo") && col("b_hi") <= col("hi"),
              col("cnt")).otherwise(0L)).as("est_lo"),
            sum(when(col("b_hi") > col("lo") && col("b_lo") < col("hi"),
              col("cnt")).otherwise(0L)).as("est_hi"))
        val exact = cents.crossJoin(broadcast(ranges))
          .filter(col("c") >= col("lo") && col("c") < col("hi"))
          .groupBy("lo", "hi").agg(count(lit(1)).as("exact"))
        est.join(exact, Seq("lo", "hi"))
          .withColumn("bounds_ok", expr("est_lo <= exact AND exact <= est_hi"))
          .orderBy("lo")
      },
      Some("""WITH cents AS (SELECT greatest(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT), 1) AS c
             |  FROM orders),
             |b AS (SELECT c, length(bin(c)) - 1 AS e FROM cents),
             |h AS (SELECT e * 16 + ((c - (1::BIGINT << e)) * 16) // (1::BIGINT << e) AS bucket,
             |    count(*) AS cnt FROM b GROUP BY 1),
             |bounds AS (SELECT bucket, cnt,
             |    (1::BIGINT << (bucket // 16)) + ((bucket % 16) * (1::BIGINT << (bucket // 16))) // 16 AS b_lo,
             |    (1::BIGINT << ((bucket + 1) // 16)) + (((bucket + 1) % 16) * (1::BIGINT << ((bucket + 1) // 16))) // 16 AS b_hi
             |  FROM h),
             |ranges(lo, hi) AS (VALUES (10000000, 20000000), (20000000, 40000000), (40000000, 60000000)),
             |est AS (SELECT lo, hi,
             |    CAST(sum(CASE WHEN b_lo >= lo AND b_hi <= hi THEN cnt ELSE 0 END) AS BIGINT) AS est_lo,
             |    CAST(sum(CASE WHEN b_hi > lo AND b_lo < hi THEN cnt ELSE 0 END) AS BIGINT) AS est_hi
             |  FROM bounds, ranges GROUP BY 1, 2),
             |exact AS (SELECT lo, hi, count(*) AS exact FROM cents, ranges
             |  WHERE c >= lo AND c < hi GROUP BY 1, 2)
             |SELECT lo, hi, est_lo, est_hi, exact.exact, TRUE AS bounds_ok
             |FROM est JOIN exact USING (lo, hi) ORDER BY lo""".stripMargin)),

    // ── Sketch-driven QUANTILE BINNING — the sort-free form of ntile:
    //    decile boundaries come off the broadcast QSketch histogram, so
    //    assigning every row its bin is a narrow broadcast join + count
    //    of boundaries ≤ value, NOT a per-group full sort (ntile's
    //    WindowExec sorts the whole group per task; this shape scales
    //    to any group size). Bin populations are deterministic given
    //    the deterministic boundaries, so the result hash-matches. ──
    QueryDef(
      "qsketch_binning",
      "decile binning via broadcast sketch boundaries: per-bin populations, no window sort",
      (s, d) => {
        val cents = t(s, d, "orders").select(col("o_orderkey"),
          col("o_orderpriority").as("grp"),
          expr("greatest(CAST(floor(o_totalprice * 100 + 0.5D) AS BIGINT), 1)").as("c"))
        val bnd = graft.operators.QSketch.quantiles(
            graft.operators.QSketch.histogram(cents, "grp", "c"),
            (10 to 90 by 10).toSeq)
          .select(col("grp"), col("est"))
        cents.join(broadcast(bnd), "grp")
          .groupBy("grp", "o_orderkey", "c")
          .agg(sum(when(col("est") <= col("c"), 1L).otherwise(0L)).as("bin"))
          .groupBy("grp", "bin")
          .agg(count(lit(1)).as("n_rows"), min("c").as("lo"), max("c").as("hi"))
          .orderBy("grp", "bin")
      },
      Some("""WITH cents AS (SELECT o_orderkey, o_orderpriority AS grp,
             |    greatest(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT), 1) AS c FROM orders),
             |b AS (SELECT grp, c, length(bin(c)) - 1 AS e FROM cents),
             |h AS (SELECT grp, e * 16 + ((c - (1::BIGINT << e)) * 16) // (1::BIGINT << e) AS bucket,
             |    count(*) AS cnt FROM b GROUP BY 1, 2),
             |n AS (SELECT grp, CAST(sum(cnt) AS BIGINT) AS n FROM h GROUP BY 1),
             |qs AS (SELECT grp, n, q FROM n,
             |  (VALUES (10), (20), (30), (40), (50), (60), (70), (80), (90)) t(q)),
             |ranked AS (SELECT grp, bucket, sum(cnt) OVER (PARTITION BY grp ORDER BY bucket) AS cum FROM h),
             |pick AS (SELECT qs.grp, qs.q, min(bucket) AS bucket
             |  FROM qs JOIN ranked ON ranked.grp = qs.grp AND ranked.cum >= (qs.q * qs.n + 99) // 100
             |  GROUP BY 1, 2),
             |bnd AS (SELECT grp, (1::BIGINT << (bucket // 16))
             |    + ((bucket % 16) * (1::BIGINT << (bucket // 16))) // 16 AS est FROM pick),
             |binned AS (SELECT cents.grp, o_orderkey, c,
             |    CAST(sum(CASE WHEN est <= c THEN 1 ELSE 0 END) AS BIGINT) AS bin
             |  FROM cents JOIN bnd ON bnd.grp = cents.grp GROUP BY 1, 2, 3)
             |SELECT grp, bin, count(*) AS n_rows, min(c) AS lo, max(c) AS hi
             |FROM binned GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // ── WEIGHTED quantiles off the sketch: bucket mass is summed
    //    revenue instead of a row count, so p50 answers "below which
    //    order value does HALF THE REVENUE sit" (the Pareto question a
    //    count median cannot answer). Same hash-exact estimator and
    //    the same in-row ≤1/16 bound theorem, now against the exact
    //    weighted quantile (first value whose cumulative revenue
    //    crosses the rank). Rank arithmetic q·n stays in BIGINT up to
    //    n ≈ 1.2e17 total weight at q ≤ 75 (≈ $1.2 quadrillion of
    //    revenue-cents) — headroom documented, not assumed. ──
    QueryDef(
      "qsketch_weighted_median",
      "revenue-weighted p25/50/75 order values off the weighted sketch + bound proof",
      (s, d) => {
        import s.implicits._
        val cents = t(s, d, "orders").select(col("o_orderkey"),
          col("o_orderpriority").as("grp"),
          expr("greatest(CAST(floor(o_totalprice * 100 + 0.5D) AS BIGINT), 1)").as("c"))
        val est = graft.operators.QSketch.quantiles(
          graft.operators.QSketch.histogramWeighted(cents, "grp", "c", "c"),
          Seq(25, 50, 75))
        val qdf = Seq(25, 50, 75).toDF("q")
        val exact = cents
          .withColumn("cum", sum("c").over(
            Window.partitionBy("grp").orderBy("c", "o_orderkey")))
          .withColumn("nn", sum("c").over(Window.partitionBy("grp")))
          .join(broadcast(qdf), expr("cum >= (q * nn + 99) div 100"))
          .groupBy("grp", "q").agg(min("c").as("exact"))
        est.join(exact, Seq("grp", "q"))
          .withColumn("within_bound", expr("est <= exact AND 16 * (exact - est) <= est + 16"))
          .select(col("grp"), col("q"), col("n"), col("est"), col("exact"), col("within_bound"))
          .orderBy("grp", "q")
      },
      Some("""WITH cents AS (SELECT o_orderkey, o_orderpriority AS grp,
             |    greatest(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT), 1) AS c FROM orders),
             |b AS (SELECT grp, c, length(bin(c)) - 1 AS e FROM cents),
             |h AS (SELECT grp, e * 16 + ((c - (1::BIGINT << e)) * 16) // (1::BIGINT << e) AS bucket,
             |    CAST(sum(c) AS BIGINT) AS cnt FROM b GROUP BY 1, 2),
             |n AS (SELECT grp, CAST(sum(cnt) AS BIGINT) AS n FROM h GROUP BY 1),
             |qs AS (SELECT grp, n, q FROM n, (VALUES (25), (50), (75)) t(q)),
             |ranked AS (SELECT grp, bucket, sum(cnt) OVER (PARTITION BY grp ORDER BY bucket) AS cum FROM h),
             |pick AS (SELECT qs.grp, qs.q, qs.n, min(bucket) AS bucket
             |  FROM qs JOIN ranked ON ranked.grp = qs.grp AND ranked.cum >= (qs.q * qs.n + 99) // 100
             |  GROUP BY 1, 2, 3),
             |est AS (SELECT grp, q, n, (1::BIGINT << (bucket // 16))
             |    + ((bucket % 16) * (1::BIGINT << (bucket // 16))) // 16 AS est FROM pick),
             |exact AS (SELECT x.grp, t.q, min(c) AS exact FROM (
             |    SELECT grp, c, sum(c) OVER (PARTITION BY grp ORDER BY c, o_orderkey) AS cum,
             |        sum(c) OVER (PARTITION BY grp) AS nn FROM cents) x
             |  JOIN (VALUES (25), (50), (75)) t(q) ON x.cum >= (t.q * x.nn + 99) // 100
             |  GROUP BY 1, 2)
             |SELECT est.grp, est.q, est.n, est.est, exact.exact, TRUE AS within_bound
             |FROM est JOIN exact ON est.grp = exact.grp AND est.q = exact.q
             |ORDER BY 1, 2""".stripMargin)),

    // ── Shuffle-skew PROFILER: the operational pre-flight for any big
    //    join/agg — exact per-key load, each key's share of the total,
    //    and the salting factor that would level it across 32 shuffle
    //    partitions (⌈cnt·32/total⌉ — 1 means "no salting needed").
    //    All integer; the totals frame is metadata-sized and
    //    broadcast. ──
    QueryDef(
      "skew_profile_custkey",
      "shuffle-skew profiler: per-key load share and 32-partition salt factor for orders.o_custkey",
      (s, d) => {
        val cnts = t(s, d, "orders").groupBy(col("o_custkey").as("custkey"))
          .agg(count(lit(1)).as("cnt"))
        val tot = cnts.agg(sum("cnt").as("total"), count(lit(1)).as("n_keys"))
        cnts.crossJoin(broadcast(tot))
          .select(col("custkey"), col("cnt"),
            expr("cnt * 1000000 div total").as("share_e6"),
            expr("(cnt * 32 + total - 1) div total").as("salt_factor"),
            col("n_keys"), col("total"))
          .orderBy(col("cnt").desc, col("custkey"))
          .limit(20)
      },
      Some("""WITH cnts AS (SELECT o_custkey AS custkey, count(*) AS cnt FROM orders GROUP BY 1),
             |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total, count(*) AS n_keys FROM cnts)
             |SELECT custkey, cnt, cnt * 1000000 // total AS share_e6,
             |  (cnt * 32 + total - 1) // total AS salt_factor, n_keys, total
             |FROM cnts, tot ORDER BY cnt DESC, custkey LIMIT 20""".stripMargin)),

    // ── Approximate distinct with a HARD error-bound contract. HLL++
    //    register layouts are engine-specific, so the estimate itself
    //    can never hash-match a DuckDB replay — but the ESTIMATOR'S
    //    CONTRACT can: |HLL − exact| ≤ ε·exact. The query emits the
    //    exact distinct (oracled the normal way) plus a Spark-computed
    //    `within_bound` verdict at ε = 0.15 (3× the configured
    //    rsd = 0.05); the oracle expects `true`, so an estimator
    //    drifting out of its guarantee turns the row red in the
    //    driver gate instead of hiding behind a rows-only check. ──
    QueryDef(
      "approx_distinct_users",
      "approx_count_distinct (HLL++) checked against exact: |HLL − exact| ≤ 0.15·exact",
      (s, d) =>
        t(s, d, "events")
          .groupBy("event_type")
          .agg(countDistinct(col("user_id")).as("exact_users"),
            approx_count_distinct(col("user_id"), 0.05).as("__approx"))
          .select(col("event_type"), col("exact_users"),
            (abs(col("__approx") - col("exact_users"))
              <= col("exact_users") * 0.15).as("within_bound")),
      Some("""SELECT event_type, count(DISTINCT user_id) AS exact_users,
             |  true AS within_bound
             |FROM events GROUP BY 1""".stripMargin)),

    // ── Distinct sketch with EXACT oracle parity: KMV (k minimum
    //    values). Same single-pass mergeable-state shape as HLL, but
    //    elementary integer arithmetic end-to-end, so DuckDB replays
    //    the sketch exactly (distinct hashes → k-th order statistic →
    //    integer-division estimate). Typed Aggregator surface (§2-I). ──
    QueryDef(
      "distinct_kmv_users",
      "KMV distinct-count sketch per event type, bit-exact vs oracle",
      (s, d) => {
        val kmv = udaf(graft.functions.KmvAgg)
        t(s, d, "events")
          .groupBy("event_type")
          .agg(kmv(col("user_id").cast("long")).as("est_users"))
      },
      Some(s"""WITH h AS (SELECT DISTINCT event_type,
              |  (${graft.functions.Kmv.A} * ((user_id % ${graft.functions.Kmv.P}
              |    + ${graft.functions.Kmv.P}) % ${graft.functions.Kmv.P})
              |    + ${graft.functions.Kmv.B})
              |    % ${graft.functions.Kmv.P} AS hv FROM events),
              |r AS (SELECT event_type, hv,
              |  row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn,
              |  count(*) OVER (PARTITION BY event_type) AS nd FROM h)
              |SELECT event_type,
              |  CASE WHEN max(nd) >= ${graft.functions.Kmv.K}
              |    THEN (${graft.functions.Kmv.K - 1}::BIGINT * ${graft.functions.Kmv.P})
              |      // greatest(max(CASE WHEN rn = ${graft.functions.Kmv.K} THEN hv END), 1)
              |    ELSE max(nd) END AS est_users
              |FROM r WHERE rn <= ${graft.functions.Kmv.K} GROUP BY event_type""".stripMargin),
      bench = true),

    // ── Deterministic fixed-point PageRank (3 rounds, integer e6
    //    arithmetic end-to-end) over the customer→supplier purchase
    //    graph — the second iterative graph operator beside connected
    //    components. The oracle unrolls the same three rounds as CTEs;
    //    every intermediate is a BIGINT, so the replay is bit-exact. ──
    QueryDef(
      "pagerank_purchase_graph",
      "fixed-point PageRank over the customer→supplier purchase graph (3 rounds)",
      (s, d) => {
        val edges = t(s, d, "orders")
          .join(t(s, d, "lineitem"), col("o_orderkey") === col("l_orderkey"))
          .groupBy(col("o_custkey").as("src"), col("l_suppkey").as("dst"))
          .agg(count(lit(1)).as("w"))
        graft.operators.PageRank.pagerank(edges, "src", "dst", "w", iters = 3)
      },
      Some {
        val round = (prev: String, cur: String) =>
          s"""$cur AS (SELECT n.id,
             |  (150000 + (coalesce(c.s, 0) * 85) // 100)::BIGINT AS rank_e6
             |  FROM n LEFT JOIN (
             |    SELECT et.dst AS id, sum((r.rank_e6 * et.w) // et.tot) AS s
             |    FROM et JOIN $prev r ON r.id = et.src GROUP BY 1) c ON c.id = n.id)"""
            .stripMargin
        s"""WITH e AS (SELECT o_custkey AS src, l_suppkey AS dst, count(*) AS w
           |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey GROUP BY 1, 2),
           |et AS (SELECT src, dst, w, sum(w) OVER (PARTITION BY src) AS tot FROM e),
           |n AS (SELECT DISTINCT id FROM (SELECT src AS id FROM e UNION ALL SELECT dst FROM e)),
           |r0 AS (SELECT id, 1000000::BIGINT AS rank_e6 FROM n),
           |${round("r0", "r1")},
           |${round("r1", "r2")},
           |${round("r2", "r3")}
           |SELECT id, rank_e6 FROM r3""".stripMargin
      },
      bench = true),

    // ── PageRank with uniform dangling-mass redistribution (2 rounds):
    //    suppliers have no out-edges in the purchase graph, so the
    //    default formulation lets them hoard mass — here each round
    //    spreads Σ rank(dangling) div N uniformly before damping.
    //    Still pure integer arithmetic (BIGINT sums are order-
    //    insensitive), so the oracle replays the redistribution as one
    //    extra scalar-subquery term per round, bit-exact. ──
    QueryDef(
      "pagerank_dangling_mass",
      "PageRank with uniform dangling-mass redistribution (integer-exact, 2 rounds)",
      (s, d) => {
        val edges = t(s, d, "orders")
          .join(t(s, d, "lineitem"), col("o_orderkey") === col("l_orderkey"))
          .groupBy(col("o_custkey").as("src"), col("l_suppkey").as("dst"))
          .agg(count(lit(1)).as("w"))
        graft.operators.PageRank.pagerank(edges, "src", "dst", "w",
          iters = 2, redistributeDangling = true)
      },
      Some {
        val round = (prev: String, cur: String) =>
          s"""$cur AS (SELECT nd.id,
             |  (150000 + ((coalesce(c.s, 0)
             |    + (SELECT coalesce(sum(r.rank_e6), 0) FROM $prev r
             |         JOIN dang dg ON dg.id = r.id) // (SELECT n FROM nn))
             |    * 85) // 100)::BIGINT AS rank_e6
             |  FROM n nd LEFT JOIN (
             |    SELECT et.dst AS id, sum((r.rank_e6 * et.w) // et.tot) AS s
             |    FROM et JOIN $prev r ON r.id = et.src GROUP BY 1) c ON c.id = nd.id)"""
            .stripMargin
        s"""WITH e AS (SELECT o_custkey AS src, l_suppkey AS dst, count(*) AS w
           |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey GROUP BY 1, 2),
           |et AS (SELECT e.src, e.dst, e.w, t.tot FROM e
           |  JOIN (SELECT src, sum(w) AS tot FROM e GROUP BY 1) t ON t.src = e.src),
           |n AS (SELECT DISTINCT id FROM (SELECT src AS id FROM e UNION ALL SELECT dst FROM e)),
           |dang AS (SELECT id FROM n WHERE id NOT IN (SELECT DISTINCT src FROM e)),
           |nn AS (SELECT count(*) AS n FROM n),
           |r0 AS (SELECT id, 1000000::BIGINT AS rank_e6 FROM n),
           |${round("r0", "r1")},
           |${round("r1", "r2")}
           |SELECT id, rank_e6 FROM r2""".stripMargin
      }),

    // ── PERSONALIZED PageRank (2 rounds): the teleport distribution
    //    is restricted to BUILDING-segment customers, so rank measures
    //    proximity to that cohort instead of global importance — the
    //    standard random-walk-with-restart recommendation primitive.
    //    The seed set rides ONE left join onto the O(V) node frame
    //    (never a driver collect: a 10⁸-customer cohort costs one
    //    co-partitioned join), and the per-round formula only gains a
    //    `seed ·` factor on the restart term — still pure BIGINT, so
    //    the unrolled-CTE oracle replays it bit-exact. ──
    QueryDef(
      "pagerank_personalized",
      "personalized PageRank: restarts land only on BUILDING-segment customers",
      (s, d) => {
        val edges = t(s, d, "orders")
          .join(t(s, d, "lineitem"), col("o_orderkey") === col("l_orderkey"))
          .groupBy(col("o_custkey").as("src"), col("l_suppkey").as("dst"))
          .agg(count(lit(1)).as("w"))
        val seeds = t(s, d, "customer")
          .filter(col("c_mktsegment") === "BUILDING")
          .select(col("c_custkey").as("id"))
        graft.operators.PageRank.personalized(edges, "src", "dst", "w", seeds, iters = 2)
      },
      Some {
        val round = (prev: String, cur: String) =>
          s"""$cur AS (SELECT ns.id,
             |  (ns.seed * 150000 + (coalesce(c.s, 0) * 85) // 100)::BIGINT AS rank_e6
             |  FROM ns LEFT JOIN (
             |    SELECT et.dst AS id, sum((r.rank_e6 * et.w) // et.tot) AS s
             |    FROM et JOIN $prev r ON r.id = et.src GROUP BY 1) c ON c.id = ns.id)"""
            .stripMargin
        s"""WITH e AS (SELECT o_custkey AS src, l_suppkey AS dst, count(*) AS w
           |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey GROUP BY 1, 2),
           |et AS (SELECT src, dst, w, sum(w) OVER (PARTITION BY src) AS tot FROM e),
           |n AS (SELECT DISTINCT id FROM (SELECT src AS id FROM e UNION ALL SELECT dst FROM e)),
           |sd AS (SELECT DISTINCT c_custkey AS id FROM customer WHERE c_mktsegment = 'BUILDING'),
           |ns AS (SELECT n.id, CASE WHEN sd.id IS NULL THEN 0 ELSE 1 END AS seed
           |  FROM n LEFT JOIN sd ON sd.id = n.id),
           |r0 AS (SELECT id, (seed * 1000000)::BIGINT AS rank_e6 FROM ns),
           |${round("r0", "r1")},
           |${round("r1", "r2")}
           |SELECT id, rank_e6 FROM r2""".stripMargin
      }),

    // ── Triangle counting with DEGREE ORIENTATION — the third graph
    //    operator beside components and PageRank. Each undirected edge
    //    is directed from its lower-(degree, id) endpoint, so every
    //    triangle is counted exactly once from its minimum vertex and,
    //    critically, per-vertex out-degree is bounded by O(√m) on any
    //    graph — the wedge self-join (the quadratic step in naive
    //    triangle listing) becomes Σ outdeg² ≤ m·√m instead of Σ deg²,
    //    which is what makes the same plan viable on a 10⁹-edge graph.
    //    Orientation keys pack (degree, id) into one BIGINT
    //    (deg·10⁸ + id; part ids ≪ 10⁸ at every SF). Graph: parts
    //    co-ordered in 1995. Pure integer; exact oracle. ──
    QueryDef(
      "graph_triangle_count",
      "degree-oriented triangle count over the 1995 co-ordered-parts graph",
      (s, d) => {
        val li = t(s, d, "lineitem")
          .join(t(s, d, "orders").filter(expr("year(o_orderdate) = 1995")),
            col("l_orderkey") === col("o_orderkey"))
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("p"))
        val pairs = li.as("x").join(li.as("y"),
            col("x.ok") === col("y.ok") && col("x.p") < col("y.p"))
          .select(col("x.p").as("a"), col("y.p").as("b")).distinct()
        val deg = pairs.select(col("a").as("v"))
          .unionAll(pairs.select(col("b").as("v")))
          .groupBy("v").agg(count(lit(1)).as("dg"))
        val keyed = pairs
          .join(deg.select(col("v").as("a"), col("dg").as("da")), "a")
          .join(deg.select(col("v").as("b"), col("dg").as("db")), "b")
          .select(
            least(col("da") * 100000000L + col("a"), col("db") * 100000000L + col("b")).as("ks"),
            greatest(col("da") * 100000000L + col("a"), col("db") * 100000000L + col("b")).as("kd"))
        val wedges = keyed.as("e1").join(keyed.as("e2"),
            col("e1.ks") === col("e2.ks") && col("e1.kd") < col("e2.kd"))
          .select(col("e1.ks").as("u"), col("e1.kd").as("v"), col("e2.kd").as("w"))
        val nTri = wedges
          .join(keyed.select(col("ks").as("v"), col("kd").as("w")), Seq("v", "w"), "left_semi")
          .agg(count(lit(1)).as("n_triangles"))
        pairs.agg(count(lit(1)).as("n_edges")).crossJoin(broadcast(nTri))
      },
      Some("""WITH li AS (SELECT l_orderkey AS ok, l_partkey AS p FROM lineitem
             |  JOIN orders ON l_orderkey = o_orderkey WHERE year(o_orderdate) = 1995),
             |pairs AS (SELECT DISTINCT x.p AS a, y.p AS b
             |  FROM li x JOIN li y ON x.ok = y.ok AND x.p < y.p),
             |deg AS (SELECT v, count(*) AS dg FROM (
             |  SELECT a AS v FROM pairs UNION ALL SELECT b FROM pairs) GROUP BY 1),
             |keyed AS (SELECT
             |    least(da.dg * 100000000 + a, db.dg * 100000000 + b) AS ks,
             |    greatest(da.dg * 100000000 + a, db.dg * 100000000 + b) AS kd
             |  FROM pairs JOIN deg da ON da.v = a JOIN deg db ON db.v = b),
             |wedges AS (SELECT e1.ks AS u, e1.kd AS v, e2.kd AS w
             |  FROM keyed e1 JOIN keyed e2 ON e1.ks = e2.ks AND e1.kd < e2.kd)
             |SELECT (SELECT count(*) FROM pairs)::BIGINT AS n_edges,
             |  count(*)::BIGINT AS n_triangles
             |FROM wedges
             |WHERE EXISTS (SELECT 1 FROM keyed k WHERE k.ks = wedges.v AND k.kd = wedges.w)"""
        .stripMargin)),

    // ── Label-propagation COMMUNITY detection (fourth graph operator):
    //    synchronous, fixed 3 rounds, most-frequent-neighbor-label with
    //    min-label tie-break — fully deterministic, so each round
    //    replays bit-exact as a CTE. Unlike components, a single bridge
    //    edge between two dense clusters does NOT merge them. The Spark
    //    side is two map-side-combinable aggs per round (max_by argmax,
    //    no per-vertex window) — the hub-safe plan at 10⁹ edges. ──
    QueryDef(
      "lpa_communities",
      "synchronous label-propagation communities over the 1995 co-ordered-parts graph",
      (s, d) => {
        val li = t(s, d, "lineitem")
          .join(t(s, d, "orders").filter(expr("year(o_orderdate) = 1995")),
            col("l_orderkey") === col("o_orderkey"))
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("p"))
        val pairs = li.as("x").join(li.as("y"),
            col("x.ok") === col("y.ok") && col("x.p") < col("y.p"))
          .select(col("x.p").as("a"), col("y.p").as("b")).distinct()
        graft.operators.Components.labelPropagation(pairs, "a", "b", iters = 3,
          edgesDistinct = true) // pairs ends in .distinct(): skip the re-dedup shuffle
      },
      Some {
        val round = (prev: String, cur: String) =>
          s"""$cur AS (SELECT id, lbl FROM (
             |  SELECT e.src AS id, l.lbl,
             |    row_number() OVER (PARTITION BY e.src ORDER BY count(*) DESC, l.lbl) AS rn
             |  FROM ed e JOIN $prev l ON l.id = e.dst GROUP BY e.src, l.lbl) WHERE rn = 1)"""
            .stripMargin
        s"""WITH li AS (SELECT l_orderkey AS ok, l_partkey AS p FROM lineitem
           |  JOIN orders ON l_orderkey = o_orderkey WHERE year(o_orderdate) = 1995),
           |pairs AS (SELECT DISTINCT x.p AS a, y.p AS b
           |  FROM li x JOIN li y ON x.ok = y.ok AND x.p < y.p),
           |ed AS (SELECT a AS src, b AS dst FROM pairs UNION ALL SELECT b, a FROM pairs),
           |l0 AS (SELECT DISTINCT src AS id, src AS lbl FROM ed),
           |${round("l0", "l1")},
           |${round("l1", "l2")},
           |${round("l2", "l3")}
           |SELECT id, lbl AS community FROM l3""".stripMargin
      },
      bench = true),

    // ── Structural node similarity: top pairs by common-neighbor
    //    JACCARD — the link-prediction / entity-similarity primitive.
    //    Wedge enumeration through each shared neighbor is the
    //    quadratic step (Σ deg² pairs), so wedge CENTERS above an
    //    ABSOLUTE degree cap are excluded (the Dedup.MaxBucket
    //    discipline: a 10⁸-degree hub contributes 10¹⁶ wedges and
    //    near-zero similarity signal). Jaccard is emitted as integer
    //    rationals (inter, uni, jac_e6 = inter·10⁶ div uni) — exact in
    //    any engine, no float comparison anywhere. ──
    QueryDef(
      "graph_jaccard_neighbors",
      "top-30 node pairs by common-neighbor Jaccard (capped wedge join, integer-exact)",
      (s, d) => {
        val li = t(s, d, "lineitem")
          .join(t(s, d, "orders").filter(expr("year(o_orderdate) = 1995")),
            col("l_orderkey") === col("o_orderkey"))
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("p"))
        val pairs = li.as("x").join(li.as("y"),
            col("x.ok") === col("y.ok") && col("x.p") < col("y.p"))
          .select(col("x.p").as("a"), col("y.p").as("b")).distinct()
        graft.operators.Components.jaccardNeighbors(pairs, "a", "b", maxDegree = 1000L)
          .orderBy(col("jac_e6").desc, col("a"), col("b"))
          .limit(30)
      },
      Some("""WITH li AS (SELECT l_orderkey AS ok, l_partkey AS p FROM lineitem
             |  JOIN orders ON l_orderkey = o_orderkey WHERE year(o_orderdate) = 1995),
             |pairs AS (SELECT DISTINCT x.p AS a, y.p AS b
             |  FROM li x JOIN li y ON x.ok = y.ok AND x.p < y.p),
             |ed AS (SELECT a AS src, b AS dst FROM pairs UNION ALL SELECT b, a FROM pairs),
             |deg AS (SELECT src AS v, count(*) AS dg FROM ed GROUP BY 1),
             |ok AS (SELECT v FROM deg WHERE dg <= 1000),
             |w AS (SELECT e1.dst AS a, e2.dst AS b, count(*) AS inter
             |  FROM ed e1 JOIN ed e2 ON e1.src = e2.src AND e1.dst < e2.dst
             |  JOIN ok ON ok.v = e1.src GROUP BY 1, 2)
             |SELECT a, b, inter::BIGINT AS inter,
             |  (da.dg + db.dg - inter)::BIGINT AS uni,
             |  ((inter * 1000000) // (da.dg + db.dg - inter))::BIGINT AS jac_e6
             |FROM w JOIN deg da ON da.v = a JOIN deg db ON db.v = b
             |ORDER BY jac_e6 DESC, a, b LIMIT 30""".stripMargin)),

    // ── Multi-source BFS hop distance (fifth graph operator): the
    //    "blast radius" labelling — every node within 3 hops of the
    //    source set (part ids < 100), tagged with its minimum hop
    //    count. Monotone min-propagation: one adjacency join + one
    //    map-side-combinable min per round, replayed exactly as
    //    unrolled CTEs. ──
    QueryDef(
      "graph_bfs_hops",
      "multi-source BFS: min hop distance within 3 hops over the co-ordered-parts graph",
      (s, d) => {
        val li = t(s, d, "lineitem")
          .join(t(s, d, "orders").filter(expr("year(o_orderdate) = 1995")),
            col("l_orderkey") === col("o_orderkey"))
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("p"))
        val pairs = li.as("x").join(li.as("y"),
            col("x.ok") === col("y.ok") && col("x.p") < col("y.p"))
          .select(col("x.p").as("a"), col("y.p").as("b")).distinct()
          .localCheckpoint(true) // feeds edges AND the seed: one li self-join, not two
        val sources = pairs.select(col("a").as("id"))
          .unionAll(pairs.select(col("b").as("id")))
          .filter(col("id") < 100).distinct()
        graft.operators.Components.bfsHops(pairs, "a", "b", sources, "id", maxHops = 3,
          edgesDistinct = true)
      },
      Some {
        val round = (prev: String, cur: String) =>
          s"""$cur AS (SELECT id, min(hops) AS hops FROM (
             |  SELECT e.dst AS id, h.hops + 1 AS hops FROM ed e JOIN $prev h ON h.id = e.src
             |  UNION ALL SELECT id, hops FROM $prev) GROUP BY 1)""".stripMargin
        s"""WITH li AS (SELECT l_orderkey AS ok, l_partkey AS p FROM lineitem
           |  JOIN orders ON l_orderkey = o_orderkey WHERE year(o_orderdate) = 1995),
           |pairs AS (SELECT DISTINCT x.p AS a, y.p AS b
           |  FROM li x JOIN li y ON x.ok = y.ok AND x.p < y.p),
           |ed AS (SELECT a AS src, b AS dst FROM pairs UNION ALL SELECT b, a FROM pairs),
           |h0 AS (SELECT DISTINCT src AS id, 0::BIGINT AS hops FROM ed WHERE src < 100),
           |${round("h0", "h1")},
           |${round("h1", "h2")},
           |${round("h2", "h3")}
           |SELECT id, hops FROM h3""".stripMargin
      },
      bench = true),

    // ── Bounded Bellman-Ford (sixth graph operator): cheapest ≤3-edge
    //    path cost from the hub parts over the RARITY-weighted co-order
    //    graph (w = 1 + 10⁶ div co-occurrence count — rarely co-ordered
    //    parts are "far"). Min-plus relaxation shares the BFS shape:
    //    one adjacency join + one map-side-combinable min per round,
    //    all-BIGINT, so the unrolled-CTE replay is bit-exact. ──
    QueryDef(
      "graph_sssp_weighted",
      "bounded Bellman-Ford: min ≤3-edge path weight from hub parts, rarity-weighted edges",
      (s, d) => {
        val li = t(s, d, "lineitem")
          .join(t(s, d, "orders").filter(expr("year(o_orderdate) = 1995")),
            col("l_orderkey") === col("o_orderkey"))
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("p"))
        val we = li.as("x").join(li.as("y"),
            col("x.ok") === col("y.ok") && col("x.p") < col("y.p"))
          .groupBy(col("x.p").as("a"), col("y.p").as("b"))
          .agg(count(lit(1)).as("cnt"))
          .withColumn("w", expr("1 + 1000000 div cnt"))
          .localCheckpoint(true) // feeds edges AND the seed: one li self-join, not two
        val sources = we.select(col("a").as("id"))
          .unionAll(we.select(col("b").as("id")))
          .filter(col("id") < 100).distinct()
        graft.operators.Components.ssspRounds(we, "a", "b", "w", sources, "id", rounds = 3,
          edgesPreAggregated = true) // the groupBy above is the parallel-edge collapse
      },
      Some {
        val round = (prev: String, cur: String) =>
          s"""$cur AS (SELECT id, min(dist) AS dist FROM (
             |  SELECT e.dst AS id, h.dist + e.w AS dist FROM ed e JOIN $prev h ON h.id = e.src
             |  UNION ALL SELECT id, dist FROM $prev) GROUP BY 1)""".stripMargin
        s"""WITH li AS (SELECT l_orderkey AS ok, l_partkey AS p FROM lineitem
           |  JOIN orders ON l_orderkey = o_orderkey WHERE year(o_orderdate) = 1995),
           |we AS (SELECT x.p AS a, y.p AS b, 1 + 1000000 // count(*) AS w
           |  FROM li x JOIN li y ON x.ok = y.ok AND x.p < y.p GROUP BY x.p, y.p),
           |ed AS (SELECT a AS src, b AS dst, w FROM we UNION ALL SELECT b, a, w FROM we),
           |d0 AS (SELECT DISTINCT src AS id, 0::BIGINT AS dist FROM ed WHERE src < 100),
           |${round("d0", "d1")},
           |${round("d1", "d2")},
           |${round("d2", "d3")}
           |SELECT id, dist FROM d3""".stripMargin
      }),

    // ── Time-respecting reachability (seventh graph operator): how
    //    early can influence from the seed customers (custkey < 50)
    //    reach each node of the bipartite customer–part graph, when a
    //    path may only traverse orders in non-decreasing date order?
    //    Static reachability over-counts paths that go backwards in
    //    time; the temporal round adds a t ≥ arrival residual filter
    //    to the same hub-safe join+min shape. Node ids: customers
    //    even (2c), parts odd (2p+1). ──
    QueryDef(
      "graph_temporal_reach",
      "time-respecting earliest arrival within 3 edges over the customer-part order graph",
      (s, d) => {
        val e = t(s, d, "orders").join(t(s, d, "lineitem"),
            col("o_orderkey") === col("l_orderkey"))
          .select((col("o_custkey") * 2).as("a"), (col("l_partkey") * 2 + 1).as("b"),
            expr("CAST(datediff(o_orderdate, DATE '1992-01-01') AS BIGINT)").as("t"))
        val sources = e.select(col("a").as("id")).filter(col("id") < 100).distinct()
        graft.operators.Components.temporalReach(e, "a", "b", "t", sources, "id",
          rounds = 3)
      },
      Some {
        val round = (prev: String, cur: String) =>
          s"""$cur AS (SELECT id, min(arr) AS arr FROM (
             |  SELECT e.dst AS id, e.t AS arr FROM ed e JOIN $prev h ON h.id = e.src AND e.t >= h.arr
             |  UNION ALL SELECT id, arr FROM $prev) GROUP BY 1)""".stripMargin
        s"""WITH e AS (SELECT DISTINCT o_custkey * 2 AS a, l_partkey * 2 + 1 AS b,
           |    date_diff('day', DATE '1992-01-01', o_orderdate) AS t
           |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
           |ed AS (SELECT a AS src, b AS dst, t FROM e UNION ALL SELECT b, a, t FROM e),
           |r0 AS (SELECT DISTINCT src AS id, 0::BIGINT AS arr FROM ed
           |  WHERE src < 100 AND src % 2 = 0),
           |${round("r0", "r1")},
           |${round("r1", "r2")},
           |${round("r2", "r3")}
           |SELECT id, arr FROM r3""".stripMargin
      }),

    // ── Landmark-based HARMONIC CENTRALITY estimate (consumer of
    //    Components.landmarkHops): exact all-sources harmonic
    //    centrality is O(V·E); the standard scalable stand-in runs BFS
    //    from a landmark SAMPLE and sums 1/d(lm, v). One composite-
    //    keyed (lm, id) frame carries every landmark's frontier
    //    simultaneously — L landmarks cost the same round count as one
    //    traversal, and a hub's label rows spread over L keys instead
    //    of concentrating on one. Contribution 10⁶ div hops keeps the
    //    score an exact integer, so the unrolled-CTE replay is
    //    bit-exact. ──
    QueryDef(
      "graph_landmark_harmonic",
      "landmark-sample harmonic centrality over the co-order graph (composite-keyed multi-BFS)",
      (s, d) => {
        val li = t(s, d, "lineitem")
          .join(t(s, d, "orders").filter(expr("year(o_orderdate) = 1995")),
            col("l_orderkey") === col("o_orderkey"))
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("p"))
        val pairs = li.as("x").join(li.as("y"),
            col("x.ok") === col("y.ok") && col("x.p") < col("y.p"))
          .select(col("x.p").as("a"), col("y.p").as("b")).distinct()
          .localCheckpoint(true) // feeds edges AND the landmark seed: one li self-join
        val landmarks = pairs.select(col("a").as("id"))
          .unionAll(pairs.select(col("b").as("id")))
          .filter(col("id") < 40).distinct()
        graft.operators.Components.landmarkHops(pairs, "a", "b", landmarks, "id",
          maxHops = 3, edgesDistinct = true)
          .filter(col("hops") > 0)
          .groupBy("id")
          .agg(count(lit(1)).as("n_lm"),
            sum(expr("1000000 div hops")).as("harm_e6"))
      },
      Some {
        val round = (prev: String, cur: String) =>
          s"""$cur AS (SELECT lm, id, min(hops) AS hops FROM (
             |  SELECT h.lm, e.dst AS id, h.hops + 1 AS hops
             |  FROM ed e JOIN $prev h ON h.id = e.src
             |  UNION ALL SELECT lm, id, hops FROM $prev) GROUP BY 1, 2)""".stripMargin
        s"""WITH li AS (SELECT l_orderkey AS ok, l_partkey AS p FROM lineitem
           |  JOIN orders ON l_orderkey = o_orderkey WHERE year(o_orderdate) = 1995),
           |pairs AS (SELECT DISTINCT x.p AS a, y.p AS b
           |  FROM li x JOIN li y ON x.ok = y.ok AND x.p < y.p),
           |ed AS (SELECT a AS src, b AS dst FROM pairs UNION ALL SELECT b, a FROM pairs),
           |h0 AS (SELECT DISTINCT src AS lm, src AS id, 0::BIGINT AS hops FROM ed WHERE src < 40),
           |${round("h0", "h1")},
           |${round("h1", "h2")},
           |${round("h2", "h3")}
           |SELECT id, count(*)::BIGINT AS n_lm, sum(1000000 // hops)::BIGINT AS harm_e6
           |FROM h3 WHERE hops > 0 GROUP BY id""".stripMargin
      }),

    // ── Grouped top-k WITHOUT a window sort: bounded-heap typed
    //    Aggregator keeps only the k best per group, so the reduction
    //    is map-side partial (ObjectHashAggregate) and the shuffle
    //    carries O(k) entries per group per mapper — the plan a
    //    trillion-row fact table needs, vs. the window form that sorts
    //    every row of every group after a full shuffle. Scores are
    //    STORED doubles (no arithmetic), so comparisons are exact. ──
    QueryDef(
      "topk_heap_acctbal",
      "per-nation top-3 customers via bounded-heap Aggregator (map-side partial top-k)",
      (s, d) => {
        val topk = udaf(graft.functions.TopKAgg(3))
        t(s, d, "customer")
          .groupBy("c_nationkey")
          .agg(topk(col("c_acctbal"), col("c_custkey").cast("long")).as("tk"))
          .select(col("c_nationkey"), posexplode(col("tk")).as(Seq("pos", "e")))
          .select(col("c_nationkey"), (col("pos") + 1).cast("long").as("rnk"),
            col("e._2").as("c_custkey"), col("e._1").as("acctbal"))
      },
      Some("""SELECT c_nationkey, rnk, c_custkey::BIGINT AS c_custkey, acctbal FROM (
             |  SELECT c_nationkey, c_custkey, c_acctbal AS acctbal,
             |    CAST(row_number() OVER (PARTITION BY c_nationkey
             |      ORDER BY c_acctbal DESC, c_custkey) AS BIGINT) AS rnk
             |  FROM customer)
             |WHERE rnk <= 3""".stripMargin),
      bench = true),

    // ── Second consumer of the bounded-heap Aggregator, STRING
    //    payload (TopKAgg is generic in the payload since round 6):
    //    per-returnflag top-5 lineitems keyed by "orderkey-linenumber".
    //    Tie-breaks ride the payload's binary UTF-8 order — the same
    //    collation both engines give VARCHAR, so the (score desc, key
    //    asc) total order is engine-agnostic. Same scale shape as
    //    topk_heap_acctbal: map-side partial ObjectHashAggregate,
    //    O(k)/group/mapper over the shuffle, no window sort. ──
    QueryDef(
      "topk_heap_returnflag",
      "per-returnflag top-5 lineitems via string-payload bounded-heap Aggregator",
      (s, d) => {
        val topk = udaf(graft.functions.TopKAgg.strings(5))
        t(s, d, "lineitem")
          .withColumn("line_key",
            concat_ws("-", col("l_orderkey"), col("l_linenumber")))
          .groupBy("l_returnflag")
          .agg(topk(col("l_extendedprice"), col("line_key")).as("tk"))
          .select(col("l_returnflag"), posexplode(col("tk")).as(Seq("pos", "e")))
          .select(col("l_returnflag"), (col("pos") + 1).cast("long").as("rnk"),
            col("e._2").as("line_key"), col("e._1").as("price"))
      },
      Some("""SELECT l_returnflag, rnk, line_key, price FROM (
             |  SELECT l_returnflag,
             |    l_orderkey::VARCHAR || '-' || l_linenumber::VARCHAR AS line_key,
             |    l_extendedprice AS price,
             |    CAST(row_number() OVER (PARTITION BY l_returnflag
             |      ORDER BY l_extendedprice DESC,
             |        l_orderkey::VARCHAR || '-' || l_linenumber::VARCHAR) AS BIGINT) AS rnk
             |  FROM lineitem)
             |WHERE rnk <= 5""".stripMargin)),

    // ── KMV set operations (theta-sketch form): audience overlap
    //    between event-type segments FROM THE SKETCHES ALONE — never a
    //    raw-row re-scan. θ = min of the two K-th minima (P when a
    //    sketch is not full); entries strictly below θ are a uniform
    //    hash-sample of each set, so sample-intersection/union sizes
    //    scale by P/θ to the set estimates. Pure integer arithmetic
    //    end-to-end ⇒ the oracle replays the sketches and the set math
    //    bit-for-bit. The pair join is over one sketch row per segment
    //    (metadata-sized); at 100 TB the sketches come off a stored
    //    sketch table and the raw scan happens once, at build time. ──
    QueryDef(
      "kmv_overlap_events",
      "pairwise segment-overlap estimates from KMV theta-sketches (integer-exact)",
      (s, d) => {
        val K = graft.functions.Kmv.K
        val P = graft.functions.Kmv.P
        val sk = udaf(graft.functions.KmvSketchAgg)
        val sks = t(s, d, "events")
          .groupBy("event_type")
          .agg(sk(col("user_id").cast("long")).as("sk"))
        val a = sks.select(col("event_type").as("et_a"), col("sk").as("sk_a"))
        val b = sks.select(col("event_type").as("et_b"), col("sk").as("sk_b"))
        a.join(broadcast(b), col("et_a") < col("et_b"))
          // greatest(…, 1): a zero hash landing exactly at the K-th
          // minimum would otherwise make the scale-up division throw
          // under ANSI (same guard as distinct_kmv_users)
          .withColumn("theta", expr(
            s"greatest(least(IF(size(sk_a) < $K, ${P}L, element_at(sk_a, $K)), " +
              s"IF(size(sk_b) < $K, ${P}L, element_at(sk_b, $K))), 1L)"))
          .withColumn("sa", expr("filter(sk_a, h -> h < theta)"))
          .withColumn("sb", expr("filter(sk_b, h -> h < theta)"))
          .withColumn("n_inter", expr("CAST(size(array_intersect(sa, sb)) AS BIGINT)"))
          .withColumn("n_union", expr("CAST(size(array_union(sa, sb)) AS BIGINT)"))
          .select(col("et_a"), col("et_b"), col("n_inter"), col("n_union"),
            expr(s"n_inter * ${P}L div theta").as("est_inter"),
            expr(s"n_union * ${P}L div theta").as("est_union"))
      },
      Some(s"""WITH h AS (SELECT DISTINCT event_type,
              |  (${graft.functions.Kmv.A} * ((user_id % ${graft.functions.Kmv.P}
              |    + ${graft.functions.Kmv.P}) % ${graft.functions.Kmv.P})
              |    + ${graft.functions.Kmv.B}) % ${graft.functions.Kmv.P} AS hv FROM events),
              |r AS (SELECT event_type, hv,
              |  row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn,
              |  count(*) OVER (PARTITION BY event_type) AS nd FROM h),
              |sk AS (SELECT event_type, hv, rn FROM r WHERE rn <= ${graft.functions.Kmv.K}),
              |th AS (SELECT event_type,
              |  CASE WHEN max(rn) >= ${graft.functions.Kmv.K}
              |    THEN max(CASE WHEN rn = ${graft.functions.Kmv.K} THEN hv END)
              |    ELSE ${graft.functions.Kmv.P} END AS theta
              |  FROM sk GROUP BY event_type),
              |pr AS (SELECT a.event_type AS et_a, b.event_type AS et_b,
              |  greatest(least(a.theta, b.theta), 1) AS theta
              |  FROM th a JOIN th b ON a.event_type < b.event_type),
              |iv AS (SELECT pr.et_a, pr.et_b, count(*) AS n_inter
              |  FROM pr JOIN sk x ON x.event_type = pr.et_a AND x.hv < pr.theta
              |  JOIN sk y ON y.event_type = pr.et_b AND y.hv = x.hv
              |  GROUP BY 1, 2),
              |uv AS (SELECT et_a, et_b, count(DISTINCT hv) AS n_union FROM (
              |  SELECT pr.et_a, pr.et_b, x.hv FROM pr
              |    JOIN sk x ON x.event_type = pr.et_a AND x.hv < pr.theta
              |  UNION ALL
              |  SELECT pr.et_a, pr.et_b, y.hv FROM pr
              |    JOIN sk y ON y.event_type = pr.et_b AND y.hv < pr.theta)
              |  GROUP BY 1, 2)
              |SELECT pr.et_a, pr.et_b,
              |  coalesce(iv.n_inter, 0)::BIGINT AS n_inter,
              |  uv.n_union::BIGINT AS n_union,
              |  (coalesce(iv.n_inter, 0) * ${graft.functions.Kmv.P}) // pr.theta AS est_inter,
              |  (uv.n_union * ${graft.functions.Kmv.P}) // pr.theta AS est_union
              |FROM pr LEFT JOIN iv ON iv.et_a = pr.et_a AND iv.et_b = pr.et_b
              |JOIN uv ON uv.et_a = pr.et_a AND uv.et_b = pr.et_b""".stripMargin)),

    // ── Sketch re-aggregation: per-(type, day) KMV sketches MERGED up
    //    to per-type estimates — no raw-row rescan at the coarse grain.
    //    KMV union is exact over sketch states (the global K minima are
    //    always contained in the union of per-day K minima), so the
    //    rolled-up estimate is BIT-IDENTICAL to a direct coarse-grain
    //    sketch — which is exactly what the oracle computes. This is
    //    the property that makes sketches a storage primitive: daily
    //    sketch tables roll up any calendar without touching raw data. ──
    QueryDef(
      "kmv_rollup_daily",
      "per-day KMV sketches merged to per-type distinct estimates (re-aggregation)",
      (s, d) => {
        val sk = udaf(graft.functions.KmvSketchAgg)
        val mg = udaf(graft.functions.KmvMergeAgg)
        t(s, d, "events")
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(sk(col("user_id").cast("long")).as("sk"))
          .groupBy("event_type")
          .agg(mg(col("sk")).as("est_users"))
      },
      Some(s"""WITH h AS (SELECT DISTINCT event_type,
              |  (${graft.functions.Kmv.A} * ((user_id % ${graft.functions.Kmv.P}
              |    + ${graft.functions.Kmv.P}) % ${graft.functions.Kmv.P})
              |    + ${graft.functions.Kmv.B})
              |    % ${graft.functions.Kmv.P} AS hv FROM events),
              |r AS (SELECT event_type, hv,
              |  row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn,
              |  count(*) OVER (PARTITION BY event_type) AS nd FROM h)
              |SELECT event_type,
              |  CASE WHEN max(nd) >= ${graft.functions.Kmv.K}
              |    THEN (${graft.functions.Kmv.K - 1}::BIGINT * ${graft.functions.Kmv.P})
              |      // greatest(max(CASE WHEN rn = ${graft.functions.Kmv.K} THEN hv END), 1)
              |    ELSE max(nd) END AS est_users
              |FROM r WHERE rn <= ${graft.functions.Kmv.K} GROUP BY event_type""".stripMargin)),

    // ── F9: date formatting ──
    QueryDef(
      "f9_date_format",
      "strftime-style date formatting (cnics_to_fhir.py:614,794)",
      (s, d) =>
        t(s, d, "orders")
          .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
          .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total")),
      Some("""SELECT strftime(o_orderdate, '%Y-%m') AS month, count(*) AS n,
             |round(sum(o_totalprice), 2) AS total FROM orders GROUP BY 1""".stripMargin)),

    // ── F10: string utility battery ──
    QueryDef(
      "f10_string_ops",
      "lower/replace/trim/split utilities (cnics_to_fhir.py:354,702,et al.)",
      (s, d) =>
        t(s, d, "customer")
          .select(
            col("c_custkey"),
            lower(col("c_name")).as("lname"),
            regexp_replace(col("c_name"), "#", "-").as("repl"),
            trim(col("c_mktsegment")).as("seg"),
            substring_index(col("c_name"), "#", -1).as("suffix")),
      Some("""SELECT c_custkey, lower(c_name) AS lname, replace(c_name, '#', '-') AS repl,
             |trim(c_mktsegment) AS seg, split_part(c_name, '#', 2) AS suffix FROM customer""".stripMargin)),

    // ── Bloom runtime filter: semi-join reduction of the fact side by a
    //    broadcast 128 KiB bitmap of the selective side's keys, BEFORE
    //    the join shuffle. No false negatives → result is exactly the
    //    plain join; the oracle needs no bloom knowledge at all. ──
    QueryDef(
      "bloom_filtered_join",
      "big⋈big join with Bloom pre-filter of the probe side (runtime filter)",
      (s, d) => {
        val ord = t(s, d, "orders")
          .filter(col("o_orderdate") >= lit("1997-06-01") && col("o_orderdate") < lit("1997-08-01"))
          .select("o_orderkey", "o_orderpriority")
        val bloom = graft.operators.BloomJoin.buildFrame(ord, "o_orderkey")
        val li = graft.operators.BloomJoin.filterByBloom(
          t(s, d, "lineitem").select("l_orderkey", "l_extendedprice", "l_discount"),
          "l_orderkey", bloom)
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n_lines"),
            round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
      },
      Some("""SELECT o_orderpriority, count(*) AS n_lines,
             |round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |WHERE o_orderdate >= TIMESTAMP '1997-06-01 00:00:00'
             |AND o_orderdate < TIMESTAMP '1997-08-01 00:00:00'
             |GROUP BY o_orderpriority""".stripMargin)),

    // ── Salted skew join: the hot-key shuffle splitter. Salt only
    //    re-shapes the shuffle; output equals the plain join, so the
    //    oracle is the unsalted SQL. ──
    QueryDef(
      "skew_salted_join",
      "8-way salted equi-join (hot-key shuffle splitting), exact semantics",
      (s, d) => {
        val li = t(s, d, "lineitem")
          .select(col("l_suppkey").as("s_suppkey"), col("l_extendedprice"), col("l_discount"))
        val sup = t(s, d, "supplier").select("s_suppkey", "s_name")
        graft.operators.Skew.saltedJoin(li, sup, "s_suppkey", 8)
          .groupBy("s_name")
          .agg(count(lit(1)).as("n_lines"),
            round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
      },
      Some("""SELECT s_name, count(*) AS n_lines,
             |round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
             |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
             |GROUP BY s_name""".stripMargin)),

    // ── Cumulative distinct count: per user, how many distinct event
    //    types were seen up to each event. Single-shuffle two-window
    //    form: both windows partition on user_id (different sort
    //    orders share one exchange — EnsureRequirements adds two sorts,
    //    zero extra shuffles). In type-major order the first row of
    //    each contiguous type block gets a flag; the time-major running
    //    sum of flags is the distinct-so-far count. Which row carries
    //    the flag depends only on block membership (equality), not on
    //    cross-type string collation, so UTF-16 vs UTF-8 sort parity
    //    is a non-issue. Pure BIGINT output — hash-exact. ──
    QueryDef(
      "window_cume_distinct",
      "running count of distinct event types per user (single-shuffle two-window form)",
      (s, d) => {
        val byType = Window.partitionBy("user_id").orderBy("event_type", "ts", "event_id")
        val byTime = Window.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, d, "events")
          .withColumn("first_flag",
            when(!(lag("event_type", 1).over(byType) <=> col("event_type")), 1L).otherwise(0L))
          .select(col("user_id"), col("event_id"),
            sum("first_flag").over(byTime).as("types_so_far"))
      },
      Some("""SELECT user_id, event_id,
             |  CAST(sum(first_flag) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS types_so_far
             |FROM (
             |  SELECT user_id, event_id, ts,
             |    CASE WHEN lag(event_type) OVER (
             |        PARTITION BY user_id ORDER BY event_type, ts, event_id)
             |      IS DISTINCT FROM event_type THEN 1 ELSE 0 END AS first_flag
             |  FROM events) flagged""".stripMargin)),

    // ── Linear-interpolation gap-fill: per user, one knot per active
    //    day (first event by event_id), then every missing day between
    //    consecutive knots gets the exact rational
    //    num/den = (v0·(d1−d0) + (v1−v0)·(d−d0)) / (d1−d0)
    //    in integer cents — no float division on either side, so the
    //    result is hash-exact with zero rounding policy. The last knot
    //    self-emits through the coalesce'd 1-day virtual gap (den=1,
    //    num=cents). Scale: explode fan-out is bounded by the knot gap
    //    (≤ series span in days), and every stage stays partitioned on
    //    user_id — knot dedup, lead, and explode share the key. ──
    QueryDef(
      "ts_interpolate",
      "per-user daily linear interpolation between event-value knots, exact rational output",
      (s, d) => {
        // Both windows partition on user_id alone — the per-day knot is
        // the first row of each contiguous day_no block under
        // (day_no, event_id) order (== min event_id that day), so knot
        // dedup and the lead share ONE exchange instead of shuffling
        // first on (user_id, day_no) and again on user_id.
        val byDay = Window.partitionBy("user_id").orderBy("day_no", "event_id")
        val series = Window.partitionBy("user_id").orderBy("day_no")
        t(s, d, "events")
          .withColumn("day_no", datediff(col("ts").cast("date"), lit("1970-01-01")).cast("long"))
          .withColumn("cents", floor(col("value") * 100))
          .withColumn("first_of_day",
            !(lag("day_no", 1).over(byDay) <=> col("day_no")))
          .filter(col("first_of_day"))
          .select("user_id", "day_no", "cents")
          .withColumn("d1", coalesce(lead("day_no", 1).over(series), col("day_no") + 1L))
          .withColumn("c1", coalesce(lead("cents", 1).over(series), col("cents")))
          .select(col("user_id"), col("day_no"), col("cents"), col("d1"), col("c1"),
            explode(sequence(col("day_no"), col("d1") - 1L)).as("day"))
          .select(col("user_id"), col("day"),
            (col("cents") * (col("d1") - col("day_no")) +
              (col("c1") - col("cents")) * (col("day") - col("day_no"))).as("interp_num"),
            (col("d1") - col("day_no")).as("interp_den"))
      },
      Some("""WITH knots AS (
             |  SELECT user_id, day_no, cents FROM (
             |    SELECT user_id,
             |      CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS day_no,
             |      CAST(floor(value * 100) AS BIGINT) AS cents,
             |      row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE) ORDER BY event_id) AS rn
             |    FROM events) base WHERE rn = 1
             |), seg AS (
             |  SELECT user_id, day_no, cents,
             |    coalesce(lead(day_no) OVER (PARTITION BY user_id ORDER BY day_no), day_no + 1) AS d1,
             |    coalesce(lead(cents)  OVER (PARTITION BY user_id ORDER BY day_no), cents)      AS c1
             |  FROM knots
             |), grid AS (
             |  SELECT user_id, day_no, cents, d1, c1, unnest(range(day_no, d1)) AS day FROM seg)
             |SELECT user_id, day,
             |  cents * (d1 - day_no) + (c1 - cents) * (day - day_no) AS interp_num,
             |  d1 - day_no AS interp_den
             |FROM grid""".stripMargin)),

    // ── Market-basket pair support: distinct parts per order, pairwise
    //    co-occurrence counts, plus integer-e6 confidence and lift.
    //    Fan-out is bounded per basket (k items → k·(k−1)/2 pairs;
    //    TPC-H baskets are ≤13 items), so the self-join is linear in
    //    orders and the pair shuffle carries bounded multiplicity —
    //    no quadratic blowup, no hot key. The basket count N reaches
    //    the pair frame as a broadcast 1-row frame (no collect()).
    //    All scoring is BIGINT floor-division on positives (identical
    //    in Spark `div` and DuckDB `//`); lift's numerator
    //    support·N·10⁶ stays in BIGINT while support·N ≤ 9.2e12 —
    //    comfortable even at 10⁹ orders with per-pair support ≤ 10³. ──
    QueryDef(
      "basket_pair_support",
      "top co-purchased part pairs with support, confidence and lift (integer e6)",
      (s, d) => {
        val items = t(s, d, "lineitem")
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
        val tot = items.agg(countDistinct("ok").as("n_orders"))
        val pairs = items.toDF("ok", "p1")
          .join(items.toDF("ok2", "p2"), col("ok") === col("ok2") && col("p1") < col("p2"))
          .groupBy("p1", "p2").agg(count(lit(1)).as("support"))
        val per = items.groupBy("pk").agg(count(lit(1)).as("n_ok"))
        pairs
          .join(per.toDF("pk1", "n1"), col("p1") === col("pk1"))
          .join(per.toDF("pk2", "n2"), col("p2") === col("pk2"))
          .crossJoin(broadcast(tot))
          .selectExpr("p1", "p2", "support",
            "support * 1000000L div n1 AS conf_e6",
            "support * n_orders * 1000000L div (n1 * n2) AS lift_e6")
          .orderBy(col("support").desc, col("p1"), col("p2"))
          .limit(200)
      },
      Some("""WITH items AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
             |pairs AS (
             |  SELECT a.pk AS p1, b.pk AS p2, count(*) AS support
             |  FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk GROUP BY 1, 2),
             |per AS (SELECT pk, count(*) AS n_ok FROM items GROUP BY 1),
             |tot AS (SELECT count(DISTINCT ok) AS n_orders FROM items)
             |SELECT p1, p2, CAST(support AS BIGINT) AS support,
             |  CAST(support * 1000000 // x.n_ok AS BIGINT) AS conf_e6,
             |  CAST(support * n_orders * 1000000 // (x.n_ok * y.n_ok) AS BIGINT) AS lift_e6
             |FROM pairs JOIN per x ON p1 = x.pk JOIN per y ON p2 = y.pk CROSS JOIN tot
             |ORDER BY support DESC, p1, p2 LIMIT 200""".stripMargin)),

    // ── k-CORE decomposition (eighth graph operator): iterative peel
    //    until every surviving vertex keeps degree ≥ k INSIDE the
    //    survivors — the cascade a single HAVING pass gets wrong.
    //    Spark runs to the fixpoint (scalar edge-count per round,
    //    throws if > 20 rounds); the oracle unrolls 8 peel rounds,
    //    which is ≥ the observed depth at every test SF (sf0.001: 2,
    //    sf0.01: 3, sf0.1: 5) — peeling is monotone, so post-fixpoint
    //    rounds are no-ops and the replay is bit-exact. ──
    QueryDef(
      "graph_kcore",
      "8-core of the 1995 co-ordered-parts graph via iterative peeling",
      (s, d) => {
        val li = t(s, d, "lineitem")
          .join(t(s, d, "orders").filter(expr("year(o_orderdate) = 1995")),
            col("l_orderkey") === col("o_orderkey"))
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("p"))
        val pairs = li.as("x").join(li.as("y"),
            col("x.ok") === col("y.ok") && col("x.p") < col("y.p"))
          .select(col("x.p").as("a"), col("y.p").as("b")).distinct()
        graft.operators.Components.kCore(pairs, "a", "b", k = 8,
          edgesDistinct = true) // pairs ends in .distinct(): skip the re-dedup shuffle
      },
      Some {
        // every round references its predecessor 3× — MATERIALIZED stops
        // DuckDB inlining the chain into 3⁸ copies of the base scan
        val round = (prev: String, cur: String) =>
          s"""$cur AS MATERIALIZED (SELECT e.src, e.dst FROM $prev e
             |  JOIN (SELECT src AS v FROM $prev GROUP BY 1 HAVING count(*) >= 8) ka ON e.src = ka.v
             |  JOIN (SELECT src AS v FROM $prev GROUP BY 1 HAVING count(*) >= 8) kb ON e.dst = kb.v)"""
            .stripMargin
        s"""WITH li AS (SELECT l_orderkey AS ok, l_partkey AS p FROM lineitem
           |  JOIN orders ON l_orderkey = o_orderkey WHERE year(o_orderdate) = 1995),
           |pairs AS (SELECT DISTINCT x.p AS a, y.p AS b
           |  FROM li x JOIN li y ON x.ok = y.ok AND x.p < y.p),
           |g0 AS MATERIALIZED (SELECT a AS src, b AS dst FROM pairs UNION ALL SELECT b, a FROM pairs),
           |${(0 until 8).map(i => round(s"g$i", s"g${i + 1}")).mkString(",\n")}
           |SELECT src AS v, count(*)::BIGINT AS core_deg FROM g8 GROUP BY 1""".stripMargin
      },
      bench = true),

    // ── SCD type-2 interval derivation: collapse each user's event
    //    stream into validity ranges of its event_type — the
    //    dimension-history shape every lakehouse pipeline materializes.
    //    A change row opens an interval at its timestamp; the next
    //    change closes it (NULL = still current). Both windows
    //    partition on user_id only → ONE exchange. Timestamps are
    //    emitted at MICROsecond precision: DuckDB loads the ns parquet
    //    column µs-truncated, so `ts_ns div 1000` (Spark) and
    //    `epoch_us(ts)` (DuckDB) are the same exact integer while raw
    //    nanos would differ in the sub-µs digits. Both engines also
    //    ORDER by the µs value (+ event_id tie-break), so the change
    //    detection itself sees identical sequences. Hash-exact BIGINTs. ──
    QueryDef(
      "scd2_intervals",
      "SCD2 validity intervals of each user's event_type (change rows + close-on-next)",
      (s, d) => graft.operators.Scd2.intervals(
        t(s, d, "events")
          .select(col("user_id"), col("event_type"),
            expr("ts_ns div 1000").as("tus"), col("event_id"))),
      Some("""WITH chg AS (
             |  SELECT user_id, event_type, epoch_us(ts) AS tus, event_id,
             |    CASE WHEN lag(event_type) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
             |      IS DISTINCT FROM event_type THEN 1 ELSE 0 END AS c
             |  FROM events)
             |SELECT user_id, event_type, tus AS valid_from_us,
             |  lead(tus) OVER (PARTITION BY user_id ORDER BY tus, event_id) AS valid_to_us
             |FROM chg WHERE c = 1""".stripMargin)),

    // ── Incremental SCD2 MERGE: fold a new event batch into a stored
    //    dimension-history table touching only the OPEN TAIL of users
    //    present in the batch — closed intervals pass through verbatim,
    //    untouched users are never read past a semi join. Because
    //    events are append-only in time (every batch timestamp ≥ every
    //    stored one), the tail rebuild provably equals a full
    //    recompute, which is exactly what the oracle replays. The seed
    //    row trick: each touched user's open interval re-enters the
    //    change detection as a synthetic event_id −1 row carrying its
    //    type and original start, so a batch that continues the same
    //    type extends silently while a type flip closes the open
    //    interval at the first new change. Same one-exchange window
    //    shapes as scd2_intervals; the stored frame is checkpointed to
    //    stand in for a materialized table. ──
    QueryDef(
      "scd2_merge_incremental",
      "fold a new event batch into stored SCD2 intervals, rebuilding only open tails",
      (s, d) => {
        val ev = t(s, d, "events")
          .select(col("user_id"), col("event_type"),
            expr("ts_ns div 1000").as("tus"), col("event_id"))
        // 2024-01-20T00:00:00Z — ~⅓ of events form the new batch
        graft.operators.Scd2.mergeIncremental(ev, 1705708800000000L)
      },
      // full recompute over all events — the incremental result must be
      // indistinguishable from never having split the data at all
      Some("""WITH chg AS (
             |  SELECT user_id, event_type, epoch_us(ts) AS tus, event_id,
             |    CASE WHEN lag(event_type) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
             |      IS DISTINCT FROM event_type THEN 1 ELSE 0 END AS c
             |  FROM events)
             |SELECT user_id, event_type, tus AS valid_from_us,
             |  lead(tus) OVER (PARTITION BY user_id ORDER BY tus, event_id) AS valid_to_us
             |FROM chg WHERE c = 1""".stripMargin)),

    // ── Autocorrelation terms at row-lags 1..3 over each user's daily
    //    knot series (first event per active day, integer cents — the
    //    ts_interpolate knots). Emits every sufficient statistic of
    //    lagged Pearson correlation (n, Σx, Σy, Σxy, Σx², Σy²) plus the
    //    covariance numerator n·Σxy − Σx·Σy as exact BIGINTs: cents ≤
    //    5.7e4 and n ≤ series length keep every term ≤ ~1e15 at any
    //    per-user history a real pipeline would window. One user_id
    //    exchange end-to-end: knot flag, three leads, and the final
    //    keyed agg all share the partitioning. ──
    QueryDef(
      "ts_autocorr_terms",
      "exact integer autocorrelation sufficient statistics at lags 1-3 per user",
      (s, d) => {
        val byDay = Window.partitionBy("user_id").orderBy("day_no", "event_id")
        val series = Window.partitionBy("user_id").orderBy("day_no")
        t(s, d, "events")
          .withColumn("day_no", datediff(col("ts").cast("date"), lit("1970-01-01")).cast("long"))
          .withColumn("cents", floor(col("value") * 100))
          .withColumn("first_of_day",
            !(lag("day_no", 1).over(byDay) <=> col("day_no")))
          .filter(col("first_of_day"))
          .select(col("user_id"), col("day_no"), col("cents").as("x"))
          .withColumn("lagged", array(
            struct(lit(1L).as("lg"), lead("x", 1).over(series).as("y")),
            struct(lit(2L).as("lg"), lead("x", 2).over(series).as("y")),
            struct(lit(3L).as("lg"), lead("x", 3).over(series).as("y"))))
          .select(col("user_id"), col("x"), explode(col("lagged")).as("p"))
          .filter(col("p.y").isNotNull)
          .groupBy(col("user_id"), col("p.lg").as("lag"))
          .agg(count(lit(1)).as("n"),
            sum(col("x")).as("sx"), sum(col("p.y")).as("sy"),
            sum(col("x") * col("p.y")).as("sxy"),
            sum(col("x") * col("x")).as("sxx"),
            sum(col("p.y") * col("p.y")).as("syy"))
          .withColumn("cov_num", col("n") * col("sxy") - col("sx") * col("sy"))
      },
      Some("""WITH knots AS (
             |  SELECT user_id, day_no, cents AS x FROM (
             |    SELECT user_id,
             |      CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS day_no,
             |      CAST(floor(value * 100) AS BIGINT) AS cents,
             |      row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE) ORDER BY event_id) AS rn
             |    FROM events) base WHERE rn = 1
             |), led AS (
             |  SELECT user_id, x,
             |    lead(x, 1) OVER (PARTITION BY user_id ORDER BY day_no) AS y1,
             |    lead(x, 2) OVER (PARTITION BY user_id ORDER BY day_no) AS y2,
             |    lead(x, 3) OVER (PARTITION BY user_id ORDER BY day_no) AS y3
             |  FROM knots
             |), stacked AS (
             |  SELECT user_id, 1::BIGINT AS lag, x, y1 AS y FROM led WHERE y1 IS NOT NULL
             |  UNION ALL
             |  SELECT user_id, 2::BIGINT, x, y2 FROM led WHERE y2 IS NOT NULL
             |  UNION ALL
             |  SELECT user_id, 3::BIGINT, x, y3 FROM led WHERE y3 IS NOT NULL)
             |SELECT user_id, lag, count(*)::BIGINT AS n,
             |  CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             |  CAST(sum(x * y) AS BIGINT) AS sxy,
             |  CAST(sum(x * x) AS BIGINT) AS sxx,
             |  CAST(sum(y * y) AS BIGINT) AS syy,
             |  CAST(count(*) * sum(x * y) - sum(x) * sum(y) AS BIGINT) AS cov_num
             |FROM stacked GROUP BY 1, 2""".stripMargin)),

    // ── Dyadic EWMA over each user's event stream: α = ½ truncated at
    //    8 taps, so every weight is a power of two (128, 64, …, 1) and
    //    the smoothed value is the exact rational ewma_num / wsum —
    //    BIGINT arithmetic end to end, no float drift on either
    //    engine. At stream heads where fewer than 8 lags exist, the
    //    missing taps drop out of BOTH the numerator and the weight
    //    sum, so the partial-window semantics are the renormalized
    //    EWMA (not a zero-padded one). One user_id exchange: all eight
    //    lag() calls share a single WindowExec frame sorted by
    //    (tus, event_id) — the shape that holds when each user's
    //    history is millions of rows, because the window never buffers
    //    more than the 8-row tail it needs. ──
    QueryDef(
      "ts_ewma_dyadic",
      "exact integer alpha=1/2 EWMA (8 taps) per user as num/wsum rationals",
      (s, d) => {
        val uw = Window.partitionBy("user_id").orderBy("tus", "event_id")
        val lags = (1 to 7).map(i => lag("x", i).over(uw).as(s"x$i"))
        val base = t(s, d, "events")
          .select(col("user_id"), col("event_id"),
            floor(col("value") * 100).as("x"), expr("ts_ns div 1000").as("tus"))
          .select(Seq(col("user_id"), col("event_id"), col("x")) ++ lags: _*)
        val num = (0 to 7).map { i =>
          val c = if (i == 0) col("x") else col(s"x$i")
          coalesce(c, lit(0L)) * lit(1L << (7 - i))
        }.reduce(_ + _)
        val wsum = (0 to 7).map { i =>
          if (i == 0) lit(128L)
          else when(col(s"x$i").isNull, lit(0L)).otherwise(lit(1L << (7 - i)))
        }.reduce(_ + _)
        base.select(col("user_id"), col("event_id"), col("x"),
          num.as("ewma_num"), wsum.as("wsum"))
      },
      Some("""WITH b AS (
             |  SELECT user_id, event_id, CAST(floor(value*100) AS BIGINT) AS x,
             |    epoch_us(ts) AS tus FROM events),
             |l AS (
             |  SELECT user_id, event_id, x,
             |    lag(x,1) OVER uw AS x1, lag(x,2) OVER uw AS x2,
             |    lag(x,3) OVER uw AS x3, lag(x,4) OVER uw AS x4,
             |    lag(x,5) OVER uw AS x5, lag(x,6) OVER uw AS x6,
             |    lag(x,7) OVER uw AS x7
             |  FROM b WINDOW uw AS (PARTITION BY user_id ORDER BY tus, event_id))
             |SELECT user_id, event_id, x,
             |  (x*128 + COALESCE(x1,0)*64 + COALESCE(x2,0)*32 + COALESCE(x3,0)*16
             |   + COALESCE(x4,0)*8 + COALESCE(x5,0)*4 + COALESCE(x6,0)*2
             |   + COALESCE(x7,0)) AS ewma_num,
             |  (128 + CASE WHEN x1 IS NULL THEN 0 ELSE 64 END
             |   + CASE WHEN x2 IS NULL THEN 0 ELSE 32 END
             |   + CASE WHEN x3 IS NULL THEN 0 ELSE 16 END
             |   + CASE WHEN x4 IS NULL THEN 0 ELSE 8 END
             |   + CASE WHEN x5 IS NULL THEN 0 ELSE 4 END
             |   + CASE WHEN x6 IS NULL THEN 0 ELSE 2 END
             |   + CASE WHEN x7 IS NULL THEN 0 ELSE 1 END) AS wsum
             |FROM l""".stripMargin)),

    // ── Trailing-window anomaly flags WITHOUT square roots: an event
    //    is anomalous when it sits more than 3 trailing standard
    //    deviations from the trailing mean of the user's previous ≤20
    //    events. |x − s/n| > 3·σ with σ² = (n·q − s²)/n² multiplies
    //    through by n² into (n·x − s)² > 9·(n·q − s²) — every term an
    //    exact BIGINT (cents ≤ 4.9e4, n ≤ 20 keeps the largest product
    //    ≤ ~2e13), so Spark and DuckDB agree bit for bit where a
    //    float sqrt formulation would diverge in the last ulp exactly
    //    at the decision boundary. The trailing frame EXCLUDES the
    //    current row (20 PRECEDING .. 1 PRECEDING): the point under
    //    test must not contaminate its own baseline. n ≥ 12 gates
    //    stream heads. One user_id exchange; the window state is the
    //    O(1) running (n, Σx, Σx²) triple. ──
    QueryDef(
      "anomaly_trailing_z",
      "3-sigma trailing-window anomalies via squared integer z-score (no sqrt)",
      (s, d) => {
        val tw = Window.partitionBy("user_id").orderBy("tus", "event_id")
          .rowsBetween(-20, -1)
        t(s, d, "events")
          .select(col("user_id"), col("event_id"),
            floor(col("value") * 100).as("x"), expr("ts_ns div 1000").as("tus"))
          .withColumn("n", count("x").over(tw))
          .withColumn("s", sum("x").over(tw))
          .withColumn("q", sum(col("x") * col("x")).over(tw))
          .filter(col("n") >= 12 &&
            (col("n") * col("x") - col("s")) * (col("n") * col("x") - col("s")) >
              lit(9L) * (col("n") * col("q") - col("s") * col("s")))
          .select(col("user_id"), col("event_id"), col("x"), col("n"),
            ((col("n") * col("x") - col("s")) * (col("n") * col("x") - col("s"))).as("dev2"),
            (lit(9L) * (col("n") * col("q") - col("s") * col("s"))).as("thr"))
      },
      Some("""WITH b AS (
             |  SELECT user_id, event_id, CAST(floor(value*100) AS BIGINT) AS x,
             |    epoch_us(ts) AS tus FROM events),
             |w AS (
             |  SELECT user_id, event_id, x,
             |    count(x) OVER tw AS n, sum(x) OVER tw AS s, sum(x*x) OVER tw AS q
             |  FROM b
             |  WINDOW tw AS (PARTITION BY user_id ORDER BY tus, event_id
             |    ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING))
             |SELECT user_id, event_id, x, CAST(n AS BIGINT) AS n,
             |  CAST((n*x - s)*(n*x - s) AS BIGINT) AS dev2,
             |  CAST(9*(n*q - s*s) AS BIGINT) AS thr
             |FROM w WHERE n >= 12 AND (n*x - s)*(n*x - s) > 9*(n*q - s*s)""".stripMargin)),

    // ── Weighted sampling without randomness or a global sort:
    //    sequential-Poisson / priority sampling (Ohlsson; Duffield–
    //    Lund–Thorup). Each order draws a deterministic pseudo-uniform
    //    u from a Knuth multiplicative hash of its key, takes priority
    //    u/weight (integer µ-units, weight = price cents), and the
    //    bottom-20 priorities per order-priority class form the
    //    sample — heavier orders get proportionally smaller priorities
    //    and hence proportionally higher inclusion odds (the sampled
    //    mean price runs ~36% above the population mean on this
    //    corpus). The bottom-k itself rides the generic bounded-heap
    //    TopKAgg (score = −priority, exactly representable: priorities
    //    < 2^53), so the reduction is map-side partial and the shuffle
    //    carries O(k) per group per mapper — no window sort of the
    //    fact table, the same discipline as topk_heap_acctbal. This is
    //    the GROUPED companion to g3_sample_weighted, whose global
    //    bottom-100 plans as TakeOrderedAndProject: per-stratum
    //    samples can't ride a single global limit, so the heap
    //    aggregator is what keeps them one-pass. Hash reduces mod
    //    2^31−1 BEFORE multiplying (the split_train_val overflow
    //    lesson): 2.1e9 · 2654435761 < 2^63. ──
    QueryDef(
      "wsample_priority",
      "deterministic priority sampling: bottom-20 hash/weight per order class via heap",
      (s, d) => {
        val topk = udaf(graft.functions.TopKAgg(20))
        t(s, d, "orders")
          .withColumn("priority_e6",
            expr("((o_orderkey % 2147483647 + 2147483647) % 2147483647)" +
              " * 2654435761 % 2147483647 * 1000000" +
              " div cast(floor(o_totalprice * 100) as bigint)"))
          .groupBy("o_orderpriority")
          .agg(topk((-col("priority_e6")).cast("double"), col("o_orderkey")).as("tk"))
          .select(col("o_orderpriority"), posexplode(col("tk")).as(Seq("pos", "e")))
          .select(col("o_orderpriority"), (col("pos") + 1).cast("long").as("rnk"),
            col("e._2").as("o_orderkey"), (-col("e._1")).cast("long").as("priority_e6"))
      },
      Some("""SELECT o_orderpriority, rnk, o_orderkey, priority_e6 FROM (
             |  SELECT o_orderpriority, o_orderkey, priority_e6,
             |    CAST(row_number() OVER (PARTITION BY o_orderpriority
             |      ORDER BY priority_e6, o_orderkey) AS BIGINT) AS rnk
             |  FROM (SELECT o_orderpriority, o_orderkey,
             |     (((o_orderkey % 2147483647 + 2147483647) % 2147483647)
             |       * 2654435761 % 2147483647) * 1000000
             |       // CAST(floor(o_totalprice * 100) AS BIGINT) AS priority_e6
             |     FROM orders) t) tt
             |WHERE rnk <= 20""".stripMargin)),

    // ── EXACT trailing-15 rolling median — the robust companion to
    //    the EWMA smoother (a median shrugs off the spikes that drag a
    //    mean). No interpolation hazard: the emitted statistic is
    //    med2 = 2·median, i.e. the SUM of the two middle order
    //    statistics (twice the middle one when the window is odd) — an
    //    exact BIGINT on both engines, where the conventional
    //    (a+b)/2 would be a float. Spark sorts the ≤15-element window
    //    buffer per row (collect_list + sort_array — bounded, cheap,
    //    and the only exact formulation that stays in one WindowExec);
    //    DuckDB replays it as 2·quantile_cont(½), exactly the two-
    //    middle average, integer-valued in double well under 2^53.
    //    One user_id exchange. ──
    QueryDef(
      "ts_rolling_median",
      "exact trailing-15 rolling median per user as 2*median BIGINTs",
      (s, d) => {
        val tw = Window.partitionBy("user_id").orderBy("tus", "event_id")
          .rowsBetween(-14, 0)
        t(s, d, "events")
          .select(col("user_id"), col("event_id"),
            floor(col("value") * 100).as("x"), expr("ts_ns div 1000").as("tus"))
          .withColumn("arr", sort_array(collect_list("x").over(tw)))
          .select(col("user_id"), col("event_id"), col("x"),
            size(col("arr")).cast("long").as("n"),
            (expr("arr[(size(arr) - 1) div 2]") + expr("arr[size(arr) div 2]")).as("med2"))
      },
      Some("""WITH b AS (
             |  SELECT user_id, event_id, CAST(floor(value*100) AS BIGINT) AS x,
             |    epoch_us(ts) AS tus FROM events),
             |w AS (
             |  SELECT user_id, event_id, x,
             |    count(x) OVER tw AS n,
             |    CAST(2 * median(x) OVER tw AS BIGINT) AS med2
             |  FROM b
             |  WINDOW tw AS (PARTITION BY user_id ORDER BY tus, event_id
             |    ROWS BETWEEN 14 PRECEDING AND CURRENT ROW))
             |SELECT user_id, event_id, x, CAST(n AS BIGINT) AS n, med2
             |FROM w""".stripMargin)),

    // ── Per-user maximum DRAWDOWN: the largest peak-to-trough drop of
    //    the value series — running max over the ordered stream, then
    //    drawdown = runmax − x, then one max per user. Window and
    //    aggregate share the user_id hash partitioning, so the whole
    //    query is ONE exchange (plan-gated); everything is cents
    //    BIGINTs, hash-exact. The running max is O(1) window state —
    //    no buffering hazard at million-event users. ──
    QueryDef(
      "ts_drawdown",
      "per-user max peak-to-trough drawdown of the value stream (cents)",
      (s, d) => {
        val uw = Window.partitionBy("user_id").orderBy("tus", "event_id")
          .rowsBetween(Window.unboundedPreceding, 0)
        t(s, d, "events")
          .select(col("user_id"), col("event_id"),
            floor(col("value") * 100).as("x"), expr("ts_ns div 1000").as("tus"))
          .withColumn("runmax", max("x").over(uw))
          .groupBy("user_id")
          .agg(max(col("runmax") - col("x")).as("max_drawdown"),
            max(col("x")).as("peak"), count(lit(1)).as("n_events"))
      },
      Some("""WITH b AS (
             |  SELECT user_id, event_id, CAST(floor(value*100) AS BIGINT) AS x,
             |    epoch_us(ts) AS tus FROM events),
             |w AS (
             |  SELECT user_id, x,
             |    max(x) OVER (PARTITION BY user_id ORDER BY tus, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS runmax
             |  FROM b)
             |SELECT user_id, max(runmax - x) AS max_drawdown, max(x) AS peak,
             |  count(*) AS n_events
             |FROM w GROUP BY 1""".stripMargin)),

    // ── TIME TRAVEL over the SCD2 dimension history: the state of
    //    every user as of 2024-01-15T00:00Z — the canonical "what did
    //    the dimension look like at T" read that SCD2 tables exist to
    //    answer. One interval per user survives the as-of predicate
    //    (valid_from ≤ T < valid_to, open tail = NULL), so the filter
    //    composes directly onto the one-exchange interval derivation;
    //    at scale the predicate prunes partitions of a valid_from-
    //    partitioned history table instead. ──
    QueryDef(
      "scd2_snapshot_asof",
      "as-of 2024-01-15 snapshot read over the SCD2 interval history",
      (s, d) => {
        val T = 1705276800000000L // 2024-01-15T00:00:00Z in epoch µs
        graft.operators.Scd2.intervals(
          t(s, d, "events")
            .select(col("user_id"), col("event_type"),
              expr("ts_ns div 1000").as("tus"), col("event_id")))
          .filter(col("valid_from_us") <= T &&
            (col("valid_to_us").isNull || col("valid_to_us") > T))
      },
      Some("""WITH chg AS (
             |  SELECT user_id, event_type, epoch_us(ts) AS tus, event_id,
             |    CASE WHEN lag(event_type) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
             |      IS DISTINCT FROM event_type THEN 1 ELSE 0 END AS c
             |  FROM events),
             |iv AS (
             |  SELECT user_id, event_type, tus AS valid_from_us,
             |    lead(tus) OVER (PARTITION BY user_id ORDER BY tus, event_id) AS valid_to_us
             |  FROM chg WHERE c = 1)
             |SELECT * FROM iv
             |WHERE valid_from_us <= 1705276800000000
             |  AND (valid_to_us IS NULL OR valid_to_us > 1705276800000000)""".stripMargin))
  )
}
