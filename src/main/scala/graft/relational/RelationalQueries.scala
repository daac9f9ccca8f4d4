package graft.relational

import graft.QueryDef
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Generic relational layer (SURVEY.md §2.2–§2.6 mapped onto the TESTDATA
  * star schema): scans with pushdown, equi/semi/anti joins (broadcast where
  * the build side is a dim), hash aggregation, windows, rollup, set ops,
  * top-k. Every query has a DuckDB oracle.
  *
  * Scale notes (100 TB design stance):
  *  - fact-fact joins (lineitem⋈orders) shuffle on the join key — at scale
  *    these tables would be co-bucketed by orderkey so the shuffle is free;
  *  - dim joins (part, nation, region, filtered customer) are broadcast;
  *  - aggregations are partial+final hash aggs (map-side combine built in);
  *  - windows partition by a high-cardinality key (custkey/user) — never a
  *    global unpartitioned window except where semantics demand it.
  */
object RelationalQueries {
  import Sql._
  import Tables._

  private def q(name: String, oracle: String, doc: String = "")(
      fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, Some(oracle), doc)

  val q01_pricing_summary: QueryDef = q(
    "q01_pricing_summary",
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '2000-12-31 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "TPC-H Q1-style pricing summary: scan → filter → hash agg (A2 analog)") {
    (s, d) =>
      lineitem(s, d)
        .filter(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("2000-12-31 00:00:00")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sumDec2(col("l_quantity")).as("sum_qty"),
          sumDec2(col("l_extendedprice")).as("sum_base_price"),
          sum(dec2(col("l_extendedprice")) * (one - dec2(col("l_discount"))))
            .cast(DoubleType).as("sum_disc_price"),
          (sum(dec2(col("l_quantity"))).cast(DoubleType) / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
  }

  val q02_filter_pushdown: QueryDef = q(
    "q02_filter_pushdown",
    """SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate
      |FROM lineitem
      |WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1996-12-31 00:00:00'
      |  AND l_quantity > 45
      |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "Range filter + projection; both reach the parquet scan (F5/P6 analog)") {
    (s, d) =>
      lineitem(s, d)
        .filter(
          col("l_shipdate").between(
            lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")),
            lit(java.sql.Timestamp.valueOf("1996-12-31 00:00:00"))) &&
            col("l_quantity") > 45)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_shipdate")
        .orderBy("l_orderkey", "l_linenumber")
  }

  val q03_join_agg: QueryDef = q(
    "q03_join_agg",
    """SELECT c_mktsegment, o_orderpriority,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |GROUP BY c_mktsegment, o_orderpriority
      |ORDER BY c_mktsegment, o_orderpriority""".stripMargin,
    "3-way join + agg; customer dim broadcast, fact join shuffles on orderkey") {
    (s, d) =>
      lineitem(s, d)
        .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(customer(s, d)), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment", "o_orderpriority")
        .agg(
          sum(dec2(col("l_extendedprice")) * (one - dec2(col("l_discount"))))
            .cast(DoubleType).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("c_mktsegment", "o_orderpriority")
  }

  val q04_exists_semi: QueryDef = q(
    "q04_exists_semi",
    """SELECT o_orderpriority, COUNT(*) AS n_orders
      |FROM orders
      |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity >= 48)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin,
    "EXISTS → left_semi join (F10/J4 analog)") { (s, d) =>
    orders(s, d)
      .join(
        lineitem(s, d).filter(col("l_quantity") >= 48).select("l_orderkey"),
        col("o_orderkey") === col("l_orderkey"),
        "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"))
      .orderBy("o_orderpriority")
  }

  val q05_region_revenue: QueryDef = q(
    "q05_region_revenue",
    """SELECT n_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey AND r_name IN ('ASIA', 'EUROPE')
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin,
    "TPC-H Q5-style 6-way join: dims broadcast, facts shuffle once on orderkey") {
    (s, d) =>
      val nr = nation(s, d)
        .join(broadcast(region(s, d).filter(col("r_name").isin("ASIA", "EUROPE"))),
          col("n_regionkey") === col("r_regionkey"))
      lineitem(s, d)
        .join(
          orders(s, d).filter(
            col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
              col("o_orderdate") < lit(java.sql.Timestamp.valueOf("1998-01-01 00:00:00"))),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(customer(s, d)), col("o_custkey") === col("c_custkey"))
        .join(broadcast(supplier(s, d)),
          col("l_suppkey") === col("s_suppkey") && col("s_nationkey") === col("c_nationkey"))
        .join(broadcast(nr), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(sum(dec2(col("l_extendedprice")) * (one - dec2(col("l_discount"))))
          .cast(DoubleType).as("revenue"))
        .orderBy("n_name")
  }

  val q06_filter_agg: QueryDef = q(
    "q06_filter_agg",
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_lines
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      |  AND l_discount BETWEEN 0.02 AND 0.06
      |  AND l_quantity < 24""".stripMargin,
    "TPC-H Q6: pure scan-filter-agg, fully pushed down, single codegen stage") {
    (s, d) =>
      lineitem(s, d)
        .filter(
          col("l_shipdate") >= lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")) &&
            col("l_shipdate") < lit(java.sql.Timestamp.valueOf("1998-01-01 00:00:00")) &&
            col("l_discount").between(0.02, 0.06) && col("l_quantity") < 24)
        .agg(
          sum(dec2(col("l_extendedprice")) * dec2(col("l_discount")))
            .cast(DoubleType).as("revenue"),
          count(lit(1)).as("n_lines"))
  }

  val q07_anti_join: QueryDef = q(
    "q07_anti_join",
    """SELECT c_mktsegment, COUNT(*) AS n_no_order
      |FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin,
    "NOT EXISTS → left_anti (F8/S10 analog: delete/duplicate-check rewrite)") {
    (s, d) =>
      customer(s, d)
        .join(orders(s, d).filter(col("o_orderstatus") === "P").select("o_custkey"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_no_order"))
        .orderBy("c_mktsegment")
  }

  val q08_topk_orders: QueryDef = q(
    "q08_topk_orders",
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 10""".stripMargin,
    "Global top-k (L4 analog) → TakeOrderedAndProject, no full sort") { (s, d) =>
    orders(s, d)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)
  }

  val q09_window_rank: QueryDef = q(
    "q09_window_rank",
    """SELECT o_custkey, o_orderkey, rn FROM (
      |  SELECT o_custkey, o_orderkey,
      |    CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
      |  FROM orders) t
      |WHERE rn <= 3
      |ORDER BY o_custkey, rn""".stripMargin,
    "Per-key top-N via row_number window (L1 analog)") { (s, d) =>
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    orders(s, d)
      .withColumn("rn", row_number().over(w).cast(LongType))
      .filter(col("rn") <= 3)
      .select("o_custkey", "o_orderkey", "rn")
      .orderBy("o_custkey", "rn")
  }

  val q14_setops: QueryDef = q(
    "q14_setops",
    """SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
      |EXCEPT
      |SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
      |ORDER BY custkey""".stripMargin,
    "Set difference (EXCEPT DISTINCT)") { (s, d) =>
    val o = orders(s, d)
    o.filter(col("o_orderstatus") === "F").select(col("o_custkey").as("custkey"))
      .except(o.filter(col("o_orderstatus") === "O").select(col("o_custkey").as("custkey")))
      .orderBy("custkey")
  }

  val q16_having: QueryDef = q(
    "q16_having",
    """SELECT p_brand, COUNT(*) AS n_parts
      |FROM part
      |GROUP BY p_brand
      |HAVING COUNT(*) > 80
      |ORDER BY p_brand""".stripMargin,
    "Group-agg + HAVING post-filter") { (s, d) =>
    part(s, d)
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n_parts"))
      .filter(col("n_parts") > 80)
      .orderBy("p_brand")
  }

  val q17_scalar_subquery: QueryDef = q(
    "q17_scalar_subquery",
    """SELECT p_brand, COUNT(*) AS n_premium
      |FROM part
      |WHERE p_retailprice > (
      |  SELECT CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) FROM part)
      |GROUP BY p_brand
      |ORDER BY p_brand""".stripMargin,
    "Scalar-subquery threshold (broadcast single-row cross join in Spark)") {
    (s, d) =>
      val p = part(s, d)
      val avgPrice = p.agg(
        (sum(dec2(col("p_retailprice"))).cast(DoubleType) / count(lit(1))).as("avg_price"))
      p.crossJoin(broadcast(avgPrice))
        .filter(col("p_retailprice") > col("avg_price"))
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n_premium"))
        .orderBy("p_brand")
  }

  val q18_rollup: QueryDef = q(
    "q18_rollup",
    """SELECT r_name, n_name, COUNT(*) AS n_cust
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY ROLLUP(r_name, n_name)
      |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin,
    "Hierarchical rollup (grouping sets)") { (s, d) =>
    // Dataset-API rollup + orderBy on a grouping column trips Spark's
    // ambiguous-attribute check (Expand aliases the grouping attrs); the
    // SQL path resolves cleanly, so register the join as a view.
    customer(s, d)
      .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .select("r_name", "n_name")
      .createOrReplaceTempView("rollup_src")
    s.sql(
      """SELECT r_name, n_name, COUNT(*) AS n_cust
        |FROM rollup_src
        |GROUP BY ROLLUP(r_name, n_name)
        |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin)
  }

  val q21_broadcast_join: QueryDef = q(
    "q21_broadcast_join",
    """SELECT p_brand,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  COUNT(*) AS n_lines
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |WHERE p_size <= 10
      |GROUP BY p_brand
      |ORDER BY p_brand""".stripMargin,
    "Fact ⋈ filtered dim: explicit broadcast keeps the fact side shuffle-free") {
    (s, d) =>
      lineitem(s, d)
        .join(broadcast(part(s, d).filter(col("p_size") <= 10)),
          col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(sumDec2(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n_lines"))
        .orderBy("p_brand")
  }

  val q35_point_lookup: QueryDef = q(
    "q35_point_lookup",
    """SELECT c_custkey, c_name, c_acctbal
      |FROM customer
      |WHERE c_custkey = 777""".stripMargin,
    "Point lookup by key (S8 analog) — pushed-down equality scan") { (s, d) =>
    customer(s, d)
      .filter(col("c_custkey") === 777)
      .select("c_custkey", "c_name", "c_acctbal")
  }

  val q40_intersect_unionall: QueryDef = q(
    "q40_intersect_unionall",
    """WITH f AS (SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'),
      |p AS (SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'P')
      |SELECT (SELECT COUNT(*) FROM (SELECT custkey FROM f INTERSECT SELECT custkey FROM p) i) AS n_intersect,
      |       (SELECT COUNT(*) FROM (SELECT custkey FROM f UNION ALL SELECT custkey FROM p) u) AS n_union_all""".stripMargin,
    "Set ops: INTERSECT (distinct) + UNION ALL cardinalities") { (s, d) =>
    val o = orders(s, d)
    val f = o.filter(col("o_orderstatus") === "F").select(col("o_custkey").as("custkey"))
    val p = o.filter(col("o_orderstatus") === "P").select(col("o_custkey").as("custkey"))
    f.intersect(p).agg(count(lit(1)).as("n_intersect"))
      .crossJoin(f.unionAll(p).agg(count(lit(1)).as("n_union_all")))
  }

  /** HLL sketch distinct (SURVEY §2.7 scale path for A1). The raw estimate
    * is implementation-specific, so the oracled columns are the exact
    * count plus a PROPERTY of the estimate — |approx−exact| ≤ 15%·exact
    * emitted as 1/0, which DuckDB asserts as literal 1. The default rsd
    * 0.05 is a standard DEVIATION, not a bound: a tail estimate can
    * legitimately exceed 1 rsd with no product bug (sparse-mode HLL is
    * exact at small cardinalities, which would mask it at sf0.1 and bite
    * at larger SF), so the gate sits at 3×rsd — ~99.7% coverage under the
    * estimator's normal error model. If Spark's HLL++ ever drifts past
    * that, parity fails — a real differential check without demanding
    * sketch equality.
    */
  val q41_approx_distinct: QueryDef = QueryDef(
    "q41_approx_distinct",
    (s, d) => Tables.t(s, d, "events")
      .groupBy("event_type")
      .agg(
        approx_count_distinct("user_id").as("approx"),
        countDistinct("user_id").as("exact_users"))
      .select(col("event_type"), col("exact_users"),
        when(abs(col("approx") - col("exact_users")) <= col("exact_users") * 0.15,
          1L).otherwise(0L).as("hll_within_tol"))
      .orderBy("event_type"),
    Some("""SELECT event_type, COUNT(DISTINCT user_id) AS exact_users,
      |  CAST(1 AS BIGINT) AS hll_within_tol
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin),
    "approx_count_distinct (HyperLogLog++) vs exact, per event type; " +
      "estimate checked against its accuracy bound")

  /** The salted join ([[graft.ops.Skew.saltedJoin]]) against the PLAIN
    * join as oracle: salting only redistributes rows (scatter the big
    * side over (key, salt), replicate the small side once per salt), so
    * any hash mismatch here means the skew path changed semantics. The
    * random salt never reaches the output — the aggregate is
    * salt-invariant by construction, which is what makes an exact oracle
    * possible for a randomized physical rewrite.
    */
  val q76_salted_join: QueryDef = q(
    "q76_salted_join",
    """SELECT o.o_orderpriority AS priority,
      |  CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  COUNT(*) AS n
      |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      |GROUP BY 1
      |ORDER BY 1""".stripMargin,
    "Salted skew join vs plain-join oracle (semantics-preservation gate)") {
    (s, d) =>
      val big = lineitem(s, d).select(col("l_orderkey"), col("l_quantity"))
      val small = orders(s, d)
        .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
      graft.ops.Skew.saltedJoin(big, small, "l_orderkey", salts = 8)
        .groupBy(col("o_orderpriority").as("priority"))
        .agg(sum(dec2(col("l_quantity"))).cast(DoubleType).as("sum_qty"),
          count(lit(1)).as("n"))
        .orderBy("priority")
  }

  /** Equi-width histogram over a data-derived range — two passes (min/max
    * then a broadcast scalar join + hash agg), never a sort. The bucket
    * expression is spelled IDENTICALLY in both engines —
    * ((v−lo)·20)/(hi−lo), left-associated — so IEEE doubles make the
    * assignment bit-equal; width_bucket() is deliberately avoided because
    * the two engines' internal rounding differs at bucket boundaries.
    */
  val q82_histogram: QueryDef = q(
    "q82_histogram",
    """WITH s AS (SELECT CAST(l_extendedprice AS DOUBLE) AS v FROM lineitem),
      |lim AS (SELECT min(v) AS lo, max(v) AS hi FROM s)
      |SELECT CAST(least(19, CAST(floor((v - lo) * 20 / (hi - lo)) AS BIGINT)) AS BIGINT) AS bucket,
      |  COUNT(*) AS n
      |FROM s, lim
      |GROUP BY 1
      |ORDER BY 1""".stripMargin,
    "Equi-width histogram (20 buckets), bit-equal bucket arithmetic") {
    (s, d) =>
      val v = lineitem(s, d).select(col("l_extendedprice").cast(DoubleType).as("v"))
      val lim = v.agg(min("v").as("lo"), max("v").as("hi"))
      v.crossJoin(lim)
        .select(least(lit(19L),
          floor((col("v") - col("lo")) * 20 / (col("hi") - col("lo")))
            .cast(LongType)).as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as("n"))
        .orderBy("bucket")
  }

  /** [[graft.ops.Merge.mergeFrames]] as an oracle-checked row: a CDC batch
    * carrying all three ops — per-key UPDATE (acctbal credit), DELETE, and
    * INSERT of brand-new customers (negative keys, structurally
    * collision-free against the positive key space) — merged into the
    * customer table in ONE outer join + projection. The oracle rebuilds
    * the post-merge table from scratch (filter + CASE + UNION ALL), so a
    * wrong clause order, a pass-through leak of a deleted row, or a
    * mis-cast inserted value all hash-fail. The store-level commit path
    * (`ChatStore.mergeInto`) wraps this same algebra — OpsSpec covers its
    * versioned re-apply.
    */
  val q163_merge_into: QueryDef = q(
    "q163_merge_into",
    """WITH upd AS (
      |  SELECT c_custkey, c_name, c_nationkey,
      |    CASE WHEN c_custkey % 10 = 0 THEN c_acctbal + 100.0
      |         ELSE c_acctbal END AS c_acctbal,
      |    c_mktsegment
      |  FROM customer WHERE c_custkey % 10 <> 5),
      |ins AS (
      |  SELECT -c_custkey AS c_custkey,
      |    'new-' || CAST(c_custkey AS STRING) AS c_name,
      |    CAST(0 AS INTEGER) AS c_nationkey,
      |    CAST(0.0 AS DOUBLE) AS c_acctbal,
      |    'MERGED' AS c_mktsegment
      |  FROM customer WHERE c_custkey % 10 = 7)
      |SELECT * FROM (SELECT * FROM upd UNION ALL SELECT * FROM ins)
      |ORDER BY c_custkey""".stripMargin,
    "Generic MERGE INTO: conditional UPDATE/DELETE/INSERT CDC batch in " +
      "one outer join, post-merge table value-checked against an " +
      "oracle-side rebuild") { (s, d) =>
    import graft.ops.Merge
    val cust = customer(s, d)
    val src = cust.filter(col("c_custkey") % 10 === 0)
      .select(col("c_custkey"), lit("U").as("op"),
        lit(null).cast(StringType).as("new_name"))
      .unionAll(cust.filter(col("c_custkey") % 10 === 5)
        .select(col("c_custkey"), lit("D").as("op"),
          lit(null).cast(StringType).as("new_name")))
      .unionAll(cust.filter(col("c_custkey") % 10 === 7)
        .select((-col("c_custkey")).as("c_custkey"), lit("I").as("op"),
          concat(lit("new-"), col("c_custkey").cast(StringType)).as("new_name")))
    Merge.mergeFrames(cust, src, Seq("c_custkey"),
        matched = Seq(
          Merge.WhenMatched(Some(col("s.op") === "D"), delete = true),
          Merge.WhenMatched(Some(col("s.op") === "U"),
            set = Map("c_acctbal" -> (col("t.c_acctbal") + lit(100.0))))),
        notMatched = Some(Merge.WhenNotMatched(Some(col("s.op") === "I"),
          values = Map(
            "c_name" -> col("s.new_name"),
            "c_nationkey" -> lit(0),
            "c_acctbal" -> lit(0.0),
            "c_mktsegment" -> lit("MERGED")))))
      .orderBy("c_custkey")
  }

  /** [[graft.ops.Association.pairRules]] over order baskets: parts
    * co-purchased in the same order, support ≥ 3, confidence and lift in
    * exact floor-ppm. The oracle replays basket dedup, the per-basket
    * pair join, marginals, and the HUGEINT lift product — any drift in
    * the cap, the dedup, or the ratio arithmetic hash-fails.
    */
  val q173_association_rules: QueryDef = q(
    "q173_association_rules",
    """WITH b AS (SELECT DISTINCT l_orderkey AS basket, l_partkey AS item
      |           FROM lineitem),
      |n AS (SELECT item, COUNT(*) AS n_item FROM b GROUP BY item),
      |tot AS (SELECT COUNT(DISTINCT basket) AS n_baskets FROM b),
      |p AS (
      |  SELECT a.item AS item_a, c.item AS item_b, COUNT(*) AS support
      |  FROM b a JOIN b c ON a.basket = c.basket AND a.item < c.item
      |  GROUP BY 1, 2 HAVING COUNT(*) >= 3)
      |SELECT item_a, item_b, CAST(support AS BIGINT) AS support,
      |  CAST(CAST(floor((CAST(1000000 AS DECIMAL(38,0)) * support) / na.n_item) AS BIGINT) AS BIGINT) AS conf_a_b_ppm,
      |  CAST(CAST(floor((CAST(1000000 AS DECIMAL(38,0)) * support) / nb.n_item) AS BIGINT) AS BIGINT) AS conf_b_a_ppm,
      |  CAST(CAST(floor((CAST(1000000 AS DECIMAL(38,0)) * (SELECT n_baskets FROM tot) * support)
      |    / (na.n_item * nb.n_item)) AS BIGINT) AS BIGINT) AS lift_ppm
      |FROM p JOIN n na ON na.item = item_a JOIN n nb ON nb.item = item_b
      |ORDER BY item_a, item_b""".stripMargin,
    "Market-basket association rules over order baskets: support >= 3 " +
      "pairs with floor-ppm confidence/lift, HUGEINT-exact") { (s, d) =>
    graft.ops.Association.pairRules(
        lineitem(s, d), "l_orderkey", "l_partkey", minSupport = 3)
      .orderBy("item_a", "item_b")
  }

  /** Right-to-be-forgotten CASCADE (GDPR erasure, the privacy family's
    * operational op): forget customers ≡1 mod 37, cascade to their
    * orders and those orders' lineitems, and AUDIT the post-delete
    * state — zero kept orders referencing a forgotten customer, zero
    * kept lineitems referencing a deleted order. Every step is a
    * delta-probed semi/anti-join (the forget set and the deleted-order
    * keys are the only frames that cross tables, both key-sized); the
    * output is nine (table, metric, n) rows, and the orphan rows are
    * COMPUTED (real anti-joins), not asserted — a cascade that missed
    * a level reports a non-zero orphan count and hash-fails.
    */
  val q285_forget_cascade: QueryDef = q(
    "q285_forget_cascade",
    """WITH f AS (SELECT c_custkey FROM customer WHERE c_custkey % 37 = 1),
      |do_ AS (SELECT o_orderkey, o_custkey FROM orders
      |        WHERE o_custkey IN (SELECT c_custkey FROM f)),
      |ko AS (SELECT o_orderkey, o_custkey FROM orders
      |       WHERE o_custkey NOT IN (SELECT c_custkey FROM f)),
      |dl AS (SELECT l_orderkey FROM lineitem
      |       WHERE l_orderkey IN (SELECT o_orderkey FROM do_)),
      |kl AS (SELECT l_orderkey FROM lineitem
      |       WHERE l_orderkey NOT IN (SELECT o_orderkey FROM do_))
      |SELECT * FROM (
      |  SELECT 'customer' AS tbl, 'deleted' AS metric,
      |    CAST(count(*) AS BIGINT) AS n FROM f
      |  UNION ALL SELECT 'customer', 'kept', CAST(count(*) AS BIGINT)
      |    FROM customer WHERE c_custkey NOT IN (SELECT c_custkey FROM f)
      |  UNION ALL SELECT 'customer', 'orphans', CAST(0 AS BIGINT)
      |  UNION ALL SELECT 'orders', 'deleted', CAST(count(*) AS BIGINT)
      |    FROM do_
      |  UNION ALL SELECT 'orders', 'kept', CAST(count(*) AS BIGINT) FROM ko
      |  UNION ALL SELECT 'orders', 'orphans', CAST(count(*) AS BIGINT)
      |    FROM ko WHERE o_custkey IN (SELECT c_custkey FROM f)
      |  UNION ALL SELECT 'lineitem', 'deleted', CAST(count(*) AS BIGINT)
      |    FROM dl
      |  UNION ALL SELECT 'lineitem', 'kept', CAST(count(*) AS BIGINT)
      |    FROM kl
      |  UNION ALL SELECT 'lineitem', 'orphans', CAST(count(*) AS BIGINT)
      |    FROM kl WHERE l_orderkey IN (SELECT o_orderkey FROM do_)) t
      |ORDER BY tbl, metric""".stripMargin,
    "GDPR forget-user cascade: key-sized semi/anti-join deltas across " +
      "customer→orders→lineitem, with computed (not asserted) orphan " +
      "audits of the kept state") { (s, d) =>
    forgetCascade(
      Tables.customer(s, d).filter(col("c_custkey") % 37 === 1)
        .select("c_custkey"),
      Tables.customer(s, d), Tables.orders(s, d), Tables.lineitem(s, d))
  }

  /** q285's cascade kernel, callable on any (forget set, customer,
    * orders, lineitem) frames — shared by the query and its
    * SkewScaleSpec hot-customer twin so the twin exercises the exact
    * engine plan. Every step is a delta-probed semi/anti-join; nothing
    * corpus-sized crosses tables except the key frames.
    */
  def forgetCascade(forget: DataFrame, customer: DataFrame,
      orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val keptCust = customer.join(forget, Seq("c_custkey"), "left_anti")
    val fo = forget.select(col("c_custkey").as("o_custkey"))
    val delOrders = orders.join(fo, Seq("o_custkey"), "left_semi")
    val keptOrders = orders.join(fo, Seq("o_custkey"), "left_anti")
    val dok = delOrders.select(col("o_orderkey").as("l_orderkey"))
    val delLi = lineitem.join(dok, Seq("l_orderkey"), "left_semi")
    val keptLi = lineitem.join(dok, Seq("l_orderkey"), "left_anti")
    def cnt(tbl: String, metric: String, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).cast(LongType).as("n"))
        .select(lit(tbl).as("tbl"), lit(metric).as("metric"), col("n"))
    cnt("customer", "deleted", forget)
      .unionByName(cnt("customer", "kept", keptCust))
      .unionByName(cnt("customer", "orphans",
        keptCust.join(forget, Seq("c_custkey"), "left_semi")))
      .unionByName(cnt("orders", "deleted", delOrders))
      .unionByName(cnt("orders", "kept", keptOrders))
      .unionByName(cnt("orders", "orphans",
        keptOrders.join(fo, Seq("o_custkey"), "left_semi")))
      .unionByName(cnt("lineitem", "deleted", delLi))
      .unionByName(cnt("lineitem", "kept", keptLi))
      .unionByName(cnt("lineitem", "orphans",
        keptLi.join(dok, Seq("l_orderkey"), "left_semi")))
      .orderBy("tbl", "metric")
  }

  /** GDPR forget THROUGH THE VERSIONED STORE — the physical-erasure
    * capstone composing q285's logical cascade with the [[ChatStore]]
    * lifecycle: commit the customer table under the version-pointer
    * protocol, MERGE-delete the forgotten keys, vacuum the history, then
    * PROVE erasure by scanning every surviving data directory on disk
    * (the residual audit reads each version's parquet, not the pointer).
    * The emitted row carries the survivor count and key-sum (value-
    * oracled against DuckDB on the unmodified table), the residue row
    * count across ALL surviving dirs (must be 0 — a delete that left the
    * grace copy or any older version in place fails here), and the
    * number of dirs scanned (must be 1 — history vacuumed to current).
    */
  val q299_forget_store: QueryDef = q(
    "q299_forget_store",
    """SELECT CAST(count(*) AS BIGINT) AS survivors,
      |  CAST(sum(c_custkey) AS BIGINT) AS survivor_key_sum,
      |  CAST(0 AS BIGINT) AS residue_rows,
      |  CAST(1 AS BIGINT) AS n_dirs_scanned
      |FROM customer WHERE c_custkey % 37 <> 1""".stripMargin,
    "Physical right-to-be-forgotten through the versioned store: " +
      "MERGE-delete + vacuum, then a residual audit over every " +
      "surviving version dir proves zero forgotten rows remain") { (s, d) =>
    import graft.chat.ChatStore
    val root = java.nio.file.Files.createTempDirectory("graft_q299_")
    val tbl = root.resolve("customer_store").toString
    val base = Tables.customer(s, d).select("c_custkey", "c_name")
    ChatStore.writeVersioned(base, tbl)
    val forget = base.filter(col("c_custkey") % 37 === 1)
      .select("c_custkey")
    ChatStore.forgetKeys(s, tbl, "c_custkey", forget)
    val (nDirs, residue) = ChatStore.residualAudit(s, tbl, "c_custkey",
      forget)
    val out = ChatStore.readCurrent(s, tbl)
      .agg(count(lit(1)).cast(LongType).as("survivors"),
        sum("c_custkey").cast(LongType).as("survivor_key_sum"))
      .withColumn("residue_rows", lit(residue))
      .withColumn("n_dirs_scanned", lit(nDirs))
      .localCheckpoint(true)
    ChatStore.dropTable(s, tbl)
    java.nio.file.Files.deleteIfExists(root)
    out
  }

  /** CHANGE DATA FEED through the versioned store — the CDC-out
    * companion to q299's erasure and q163's MERGE: commit the customer
    * table (v1), apply ONE mixed-clause MERGE (conditional DELETE for
    * keys ≡1 mod 37, conditional UPDATE renaming keys ≡2 mod 41,
    * conditional INSERT of brand-new keys for ≡3 mod 53 → v2), then
    * read the insert/delete/update feed between the two committed
    * versions with [[graft.chat.ChatStore.changeFeed]] (one null-safe
    * full-outer join of the snapshots, delta-sized output). The oracle
    * derives the same three (op, n, key_sum) rows from the raw table,
    * so a feed that misclassifies an op, misses a key, or leaks an
    * unchanged row is a value mismatch.
    */
  val q305_change_feed: QueryDef = q(
    "q305_change_feed",
    """WITH mx AS (SELECT max(c_custkey) AS mk FROM customer),
      |d AS (SELECT c_custkey FROM customer WHERE c_custkey % 37 = 1),
      |u AS (SELECT c_custkey FROM customer
      |      WHERE c_custkey % 41 = 2 AND c_custkey % 37 <> 1),
      |i AS (SELECT c_custkey + (SELECT mk FROM mx) AS k FROM customer
      |      WHERE c_custkey % 53 = 3)
      |SELECT * FROM (
      |  SELECT 'delete' AS op, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(c_custkey) AS BIGINT) AS key_sum FROM d
      |  UNION ALL SELECT 'insert', CAST(count(*) AS BIGINT),
      |    CAST(sum(k) AS BIGINT) FROM i
      |  UNION ALL SELECT 'update', CAST(count(*) AS BIGINT),
      |    CAST(sum(c_custkey) AS BIGINT) FROM u) t
      |ORDER BY op""".stripMargin,
    "Change data feed between two committed store versions: mixed-clause " +
      "MERGE then a null-safe full-outer snapshot diff classifying " +
      "insert/delete/update — counts and key-sums value-oracled") { (s, d) =>
    import graft.chat.ChatStore
    import graft.ops.Merge
    val root = java.nio.file.Files.createTempDirectory("graft_q305_")
    val tbl = root.resolve("customer_store").toString
    val base = Tables.customer(s, d)
      .select("c_custkey", "c_name", "c_mktsegment")
    ChatStore.writeVersioned(base, tbl) // v1
    val src = base.filter(col("c_custkey") % 37 === 1)
      .select(col("c_custkey"), lit(null).cast(StringType).as("c_name"),
        lit(null).cast(StringType).as("c_mktsegment"), lit("d").as("op"))
      .unionByName(base
        .filter(col("c_custkey") % 41 === 2 && col("c_custkey") % 37 =!= 1)
        .select(col("c_custkey"), lit(null).cast(StringType).as("c_name"),
          lit(null).cast(StringType).as("c_mktsegment"), lit("u").as("op")))
      .unionByName(base.filter(col("c_custkey") % 53 === 3)
        // insert keys offset past max(c_custkey) so they can never
        // collide with a real key at any scale factor (a fixed +1e6
        // offset collides once the table exceeds 1e6 keys, silently
        // no-op'ing the inserts the oracle still counts); 1-row
        // sentinel collect, the allowlisted class
        .select((col("c_custkey") +
            base.agg(max("c_custkey")).head().getLong(0)).as("c_custkey"),
          lit("NEW CUSTOMER").as("c_name"), lit("SEG0").as("c_mktsegment"),
          lit("i").as("op")))
    ChatStore.mergeInto(s, tbl, src, Seq("c_custkey"),
      matched = Seq(
        Merge.WhenMatched(Some(col("s.op") === "d"), delete = true),
        Merge.WhenMatched(Some(col("s.op") === "u"),
          set = Map("c_name" -> concat(lit("U:"), col("t.c_name"))))),
      notMatched = Some(Merge.WhenNotMatched(
        Some(col("s.op") === "i")))) // -> v2
    val out = ChatStore.changeFeed(s, tbl, 1L, 2L, Seq("c_custkey"))
      .groupBy("op")
      .agg(count(lit(1)).cast(LongType).as("n"),
        sum("c_custkey").cast(LongType).as("key_sum"))
      .orderBy("op")
      .localCheckpoint(true)
    ChatStore.dropTable(s, tbl)
    java.nio.file.Files.deleteIfExists(root)
    out
  }

  def defs: Seq[QueryDef] = Seq(q285_forget_cascade, q299_forget_store,
    q305_change_feed,
    q01_pricing_summary, q02_filter_pushdown, q03_join_agg, q04_exists_semi,
    q05_region_revenue, q06_filter_agg, q07_anti_join, q08_topk_orders,
    q09_window_rank, q14_setops, q16_having, q17_scalar_subquery, q18_rollup,
    q21_broadcast_join, q35_point_lookup, q40_intersect_unionall,
    q41_approx_distinct, q76_salted_join, q82_histogram, q163_merge_into,
    q173_association_rules)
}
