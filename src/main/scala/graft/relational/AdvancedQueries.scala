package graft.relational

import graft.QueryDef
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Second wave of generic relational coverage: discrete percentiles,
  * scalar string/date batteries, null semantics, correlated scalar
  * subqueries (decorrelation exercise), explicit window frames. Same
  * parity rules as everywhere: decimal-bridged double aggregation,
  * BIGINT-normalized ints, deterministic ordering.
  */
object AdvancedQueries {
  import Sql._
  import Tables._

  private def q(name: String, oracle: String, doc: String = "")(
      fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, Some(oracle), doc)

  /** Discrete (lower) median — portable definition via row_number, no
    * interpolation ulp-drift between engines.
    */
  val q45_median_disc: QueryDef = q(
    "q45_median_disc",
    """SELECT l_returnflag, l_quantity AS median_qty FROM (
      |  SELECT l_returnflag, l_quantity,
      |    row_number() OVER (PARTITION BY l_returnflag ORDER BY l_quantity, l_orderkey, l_linenumber) AS rn,
      |    COUNT(*) OVER (PARTITION BY l_returnflag) AS cnt
      |  FROM lineitem) t
      |WHERE rn = CAST(floor((cnt + 1) / 2) AS BIGINT)
      |ORDER BY l_returnflag""".stripMargin,
    "Discrete median per group (portable percentile without interpolation)") {
    (s, d) =>
      val w = Window.partitionBy("l_returnflag")
        .orderBy("l_quantity", "l_orderkey", "l_linenumber")
      lineitem(s, d)
        .withColumn("rn", row_number().over(w).cast(LongType))
        .withColumn("cnt", count(lit(1)).over(Window.partitionBy("l_returnflag")))
        // floor() explicitly on both sides: DuckDB's BIGINT cast rounds
        // ties-to-even on the double 3.5 while Spark's cast truncates —
        // groups with count ≡ 2 (mod 4) would pick different rows
        .filter(col("rn") === floor((col("cnt") + 1) / 2).cast(LongType))
        .select(col("l_returnflag"), col("l_quantity").as("median_qty"))
        .orderBy("l_returnflag")
  }

  val q46_string_funcs: QueryDef = q(
    "q46_string_funcs",
    """SELECT doc_id,
      |  upper(substring(text, 1, 12)) AS head_up,
      |  CAST(length(replace(text, ' ', '')) AS BIGINT) AS n_nospace,
      |  CAST(levenshtein(substring(text, 1, 8), 'the quic') AS BIGINT) AS lev,
      |  reverse(substring(text, 1, 10)) AS rev10,
      |  lpad(CAST(doc_id AS STRING), 6, '0') AS id_pad
      |FROM documents
      |ORDER BY doc_id""".stripMargin,
    "Scalar string battery: case, substring, replace, levenshtein, pad") {
    (s, d) =>
      documents(s, d)
        .select(
          col("doc_id"),
          upper(substring(col("text"), 1, 12)).as("head_up"),
          length(regexp_replace(col("text"), " ", "")).cast(LongType).as("n_nospace"),
          levenshtein(substring(col("text"), 1, 8), lit("the quic")).cast(LongType).as("lev"),
          reverse(substring(col("text"), 1, 10)).as("rev10"),
          lpad(col("doc_id").cast(StringType), 6, "0").as("id_pad"))
        .orderBy("doc_id")
  }

  val q47_datetime_funcs: QueryDef = q(
    "q47_datetime_funcs",
    """SELECT o_orderkey,
      |  CAST(year(o_orderdate) AS BIGINT) AS y,
      |  CAST(month(o_orderdate) AS BIGINT) AS m,
      |  CAST(day(o_orderdate) AS BIGINT) AS d,
      |  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start
      |FROM orders
      |ORDER BY o_orderkey""".stripMargin,
    "Datetime battery: part extraction + truncation (ISO-string output)") {
    (s, d) =>
      orders(s, d)
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).cast(LongType).as("y"),
          month(col("o_orderdate")).cast(LongType).as("m"),
          dayofmonth(col("o_orderdate")).cast(LongType).as("d"),
          date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("month_start"))
        .orderBy("o_orderkey")
  }

  val q48_null_semantics: QueryDef = q(
    "q48_null_semantics",
    """SELECT event_id,
      |  coalesce(nullif(event_type, 'error'), 'ERR') AS et,
      |  CASE WHEN value > 100 THEN value END AS big_val,
      |  coalesce(CASE WHEN value > 100 THEN value END, -1.0) AS big_or_neg
      |FROM events
      |ORDER BY event_id""".stripMargin,
    "Null semantics: nullif/coalesce/partial CASE — 3-valued logic parity") {
    (s, d) =>
      t(s, d, "events")
        .select(
          col("event_id"),
          coalesce(nullif(col("event_type"), lit("error")), lit("ERR")).as("et"),
          when(col("value") > 100, col("value")).as("big_val"),
          coalesce(when(col("value") > 100, col("value")), lit(-1.0)).as("big_or_neg"))
        .orderBy("event_id")
  }

  /** TPC-H Q17 pattern: correlated scalar aggregate subquery — exercises
    * Catalyst's decorrelation (rewritten to an aggregate + join, no
    * per-row subquery execution). Spark side runs the same SQL text.
    */
  val q49_correlated_agg: QueryDef = {
    val sql =
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
        |  COUNT(*) AS n_small
        |FROM lineitem l1
        |WHERE l_quantity < (
        |  SELECT 0.5 * (CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*))
        |  FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey)""".stripMargin
    q("q49_correlated_agg", sql,
      "Correlated scalar subquery (decorrelated by Catalyst)") { (s, d) =>
      lineitem(s, d).createOrReplaceTempView("lineitem")
      s.sql(sql)
    }
  }

  val q50_running_sum: QueryDef = q(
    "q50_running_sum",
    """SELECT o_custkey, o_orderkey,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
      |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
      |FROM orders
      |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "Explicit window frame: per-customer running total (decimal-exact)") {
    (s, d) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          sum(dec2(col("o_totalprice"))).over(w).cast(DoubleType).as("running_spend"))
        .orderBy("o_custkey", "o_orderkey")
  }

  /** PIVOT: long→wide reshaping, the `groupBy().pivot()` relational
    * operator. The value list is pinned explicitly — an unpinned pivot
    * runs a distinct-collect job over the corpus just to discover column
    * names, which at 100 TB is a full extra scan (and nondeterministic
    * schema); pipelines should always pin. Counts are exact BIGINTs, so
    * no decimal bridging is needed; absent combinations coalesce to 0 to
    * match the oracle's FILTER counts.
    */
  val q65_pivot_events: QueryDef = q(
    "q65_pivot_events",
    """SELECT user_id,
      |  count(*) FILTER (WHERE event_type = 'click') AS click,
      |  count(*) FILTER (WHERE event_type = 'error') AS error,
      |  count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
      |  count(*) FILTER (WHERE event_type = 'signup') AS signup,
      |  count(*) FILTER (WHERE event_type = 'view') AS view
      |FROM events
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin,
    "Pivot (long->wide): per-user event-type count matrix, pinned value list") {
    (s, d) =>
      val types = Seq("click", "error", "purchase", "signup", "view")
      val wide = events(s, d)
        .groupBy("user_id")
        .pivot("event_type", types)
        .agg(count(lit(1)))
      wide.select(col("user_id") +:
        types.map(t => coalesce(col(t), lit(0L)).cast(LongType).as(t)): _*)
        .orderBy("user_id")
  }

  /** CUBE: all 2^n grouping sets (rollup covers only the hierarchy
    * prefixes — q18). Same Expand-based single-pass plan in Spark; the
    * decimal bridge keeps the double sums bit-identical to DuckDB's.
    */
  val q66_cube_qty: QueryDef = q(
    "q66_cube_qty",
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  COUNT(*) AS n_lines
      |FROM lineitem
      |GROUP BY CUBE(l_returnflag, l_linestatus)
      |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "Cube over (returnflag, linestatus): all four grouping sets in one pass") {
    (s, d) =>
      // SQL path for the same reason as q18: Dataset-API cube + orderBy on
      // a grouping column trips the ambiguous-attribute check post-Expand
      lineitem(s, d).select("l_returnflag", "l_linestatus", "l_quantity")
        .createOrReplaceTempView("cube_src")
      s.sql(
        """SELECT l_returnflag, l_linestatus,
          |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
          |  COUNT(*) AS n_lines
          |FROM cube_src
          |GROUP BY CUBE(l_returnflag, l_linestatus)
          |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)
  }

  /** The rank-distribution window trio (ntile / percent_rank / cume_dist)
    * over one shared window — one exchange serves all three. The two
    * ratio functions emit floor-ppm BIGINTs: each is a single IEEE
    * division of small exact integers, so flooring after scaling is
    * engine-exact (the BASELINE parity rule for fractional outputs).
    */
  val q69_rank_family: QueryDef = q(
    "q69_rank_family",
    """SELECT event_type, event_id,
      |  CAST(ntile(4) OVER w AS BIGINT) AS tile,
      |  CAST(floor(1000000 * percent_rank() OVER w) AS BIGINT) AS pct_ppm,
      |  CAST(floor(1000000 * cume_dist() OVER w) AS BIGINT) AS cume_ppm
      |FROM events
      |WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
      |ORDER BY event_type, event_id""".stripMargin,
    "ntile/percent_rank/cume_dist sharing one window exchange") { (s, d) =>
    val w = Window.partitionBy("event_type").orderBy("value", "event_id")
    events(s, d)
      .select(col("event_type"), col("event_id"),
        ntile(4).over(w).cast(LongType).as("tile"),
        floor(lit(1000000) * percent_rank().over(w)).cast(LongType).as("pct_ppm"),
        floor(lit(1000000) * cume_dist().over(w)).cast(LongType).as("cume_ppm"))
      .orderBy("event_type", "event_id")
  }

  /** The quantile SKETCH path (q45 is the exact one), property-oracled
    * like q41's HLL: a single-pass mergeable approx_percentile at
    * accuracy 1000 carries a ≤ 1/1000 relative-rank guarantee, so Spark
    * computes the estimate's TRUE rank against the same frame and emits
    * whether it landed within twice the documented bound; the oracle pins
    * the row-count anchor and asserts the flag as a literal 1. This is
    * the quantile a 100 TB pipeline actually runs — one pass, partial
    * aggregation, no global sort — with its accuracy contract now a
    * CORRECTNESS row instead of a doc claim.
    */
  val q75_approx_quantile: QueryDef = q(
    "q75_approx_quantile",
    """SELECT CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(1 AS BIGINT) AS rank_ok
      |FROM lineitem""".stripMargin,
    "approx_percentile median sketch, rank-error-bound oracled") { (s, d) =>
    val li = lineitem(s, d).select(col("l_extendedprice").as("v"))
    val est = li.agg(
      percentile_approx(col("v"), lit(0.5), lit(1000)).as("est"),
      count(lit(1)).as("n"))
    li.crossJoin(est)
      .agg(first(col("n")).as("n"),
        sum(when(col("v") <= col("est"), 1L).otherwise(0L)).as("rank"))
      .select(col("n").cast(LongType).as("n"),
        when(abs(col("rank").cast(DoubleType) / col("n") - 0.5) <= 0.002, 1L)
          .otherwise(0L).as("rank_ok"))
  }

  /** Count-min-sketch heavy hitters — the third mergeable-sketch gate
    * (q41 HLL cardinality, q75 approx-quantile, this one frequency). The
    * sketch is built by Spark's one-pass mergeable `count_min_sketch`
    * aggregate (fixed seed → deterministic); each candidate key's estimate
    * is then checked against the CMS guarantee: exact ≤ estimate ≤
    * exact + ⌈ε·N⌉. The oracle pins exact counts and the bound flag as a
    * literal 1, so any estimate outside its proven envelope hash-fails.
    *
    * Scale shape: the sketch is O(1/ε·ln(1/δ)) bytes regardless of input
    * size and merges associatively (one map-side pass, no shuffle of
    * rows). The single-row collect is the AGGREGATE (the sketch itself),
    * never data; probing happens over the candidate-key frame — already a
    * grouped aggregate, #distinct-keys rows — via a broadcast of the
    * sketch. The probe UDF runs once per CANDIDATE (8 event types), not
    * per row, so nothing here is a hot path.
    */
  val q84_cms_heavy_hitters: QueryDef = q(
    "q84_cms_heavy_hitters",
    """SELECT event_type, COUNT(*) AS exact_n,
      |  CAST(1 AS BIGINT) AS cms_within_bound
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "Count-min-sketch frequency estimates vs exact counts, checked " +
      "against the epsilon-N overestimate-only guarantee") { (s, d) =>
    val ev = events(s, d).select("event_type")
    val eps = 0.001
    // δ = 10⁻⁵ per probe; the gate asserts the ε·N envelope for EVERY
    // candidate key (8 event types), so the failure probability of the
    // whole row set union-bounds to 8·δ = 8×10⁻⁵ — a testdata reshuffle
    // cannot realistically flip the gate without a code bug (round-5
    // ADVICE: the old 0.99 confidence left ~8% whole-query flake odds).
    // Cost: depth = ⌈ln(1/δ)⌉ ≈ 12 rows instead of 5 — still O(1) bytes.
    val sketchBytes = ev.agg(
        expr("count_min_sketch(event_type, 0.001d, 0.99999d, 42)").as("sk"))
      .head.getAs[Array[Byte]](0)
    val bc = s.sparkContext.broadcast(sketchBytes)
    val probe = udf { (key: String) =>
      org.apache.spark.util.sketch.CountMinSketch
        .readFrom(new java.io.ByteArrayInputStream(bc.value))
        .estimateCount(key)
    }
    val n = ev.count()
    val slack = math.ceil(eps * n).toLong
    ev.groupBy("event_type")
      .agg(count(lit(1)).as("exact_n"))
      .withColumn("_est", probe(col("event_type")))
      .select(col("event_type"), col("exact_n"),
        when(col("_est") >= col("exact_n") &&
            col("_est") <= col("exact_n") + slack, 1L)
          .otherwise(0L).as("cms_within_bound"))
      .orderBy("event_type")
  }

  /** Mergeable-sketch cardinality the way an incremental 100 TB pipeline
    * maintains it: one Apache DataSketches HLL per shard (here: per event
    * type), kept small and UNIONED — never recounting raw rows — with the
    * union's estimate gated against the exact global distinct. lgK=14 →
    * rsd ≈ 0.8%; the 5% envelope leaves ~6σ, and the estimate is
    * deterministic (fixed lgK, same library both runs), so the flag is
    * parity-stable. Complements q41 (HLL++ single-pass) by exercising
    * sketch MERGE, the property that makes per-partition maintenance
    * possible.
    */
  val q87_hll_union: QueryDef = q(
    "q87_hll_union",
    """SELECT event_type, COUNT(DISTINCT user_id) AS exact_users,
      |  CAST(1 AS BIGINT) AS union_within_tol
      |FROM events GROUP BY event_type
      |UNION ALL
      |SELECT '_all', COUNT(DISTINCT user_id), CAST(1 AS BIGINT) FROM events
      |ORDER BY event_type""".stripMargin,
    "Per-shard HLL sketches unioned to a global cardinality estimate, " +
      "gated against exact distinct (mergeable-sketch maintenance path)") {
    (s, d) =>
      val ev = events(s, d).select("event_type", "user_id")
      def within(est: Column, exact: Column): Column =
        when(abs(est - exact) <= exact * 0.05, 1L).otherwise(0L)
      val per = ev.groupBy("event_type")
        .agg(hll_sketch_agg(col("user_id"), lit(14)).as("sk"),
          countDistinct("user_id").as("exact_users"))
      val typed = per.select(col("event_type"), col("exact_users"),
        within(hll_sketch_estimate(col("sk")), col("exact_users"))
          .as("union_within_tol"))
      val allRow = per.agg(hll_union_agg(col("sk")).as("sku"))
        .crossJoin(ev.agg(countDistinct("user_id").as("exact_users")))
        .select(lit("_all").as("event_type"), col("exact_users"),
          within(hll_sketch_estimate(col("sku")), col("exact_users"))
            .as("union_within_tol"))
      typed.unionAll(allRow).orderBy("event_type")
  }

  /** Grouped sketch ROLLUP — the tier above q87's global union: per-DAY
    * HLL sketches (the granularity a warehouse materializes once) merged
    * into per-WEEK cardinalities by `hll_union_agg` WITHOUT rescanning
    * rows — the whole point of mergeable sketches: the weekly pass
    * touches one kilobyte-sized sketch per day, not the corpus. Gated
    * per week against exact distinct at the same 5% tolerance as q87
    * (estimate quality is a sketch property; the gate catches a broken
    * grouped merge).
    */
  val q171_sketch_rollup: QueryDef = q(
    "q171_sketch_rollup",
    """SELECT CAST(floor(epoch(ts) / 604800) AS BIGINT) AS week,
      |  COUNT(DISTINCT user_id) AS exact_users,
      |  CAST(1 AS BIGINT) AS union_within_tol
      |FROM events
      |GROUP BY 1 ORDER BY week""".stripMargin,
    "Per-day HLL sketches merged to weekly cardinalities (grouped " +
      "hll_union_agg over sketch-sized state), 5%-gated vs exact") { (s, d) =>
    val ev = events(s, d)
      .select(expr("ts_sec div 86400").as("day"), col("user_id"))
    val daily = ev.groupBy("day")
      .agg(hll_sketch_agg(col("user_id"), lit(14)).as("sk"))
    val weekly = daily.groupBy(expr("day div 7").as("week"))
      .agg(hll_union_agg(col("sk")).as("sku"))
    val exact = ev.groupBy(expr("day div 7").as("week"))
      .agg(countDistinct("user_id").as("exact_users"))
    weekly.join(exact, Seq("week"))
      .select(col("week"), col("exact_users"),
        when(abs(hll_sketch_estimate(col("sku")) - col("exact_users")) <=
          col("exact_users") * 0.05, 1L).otherwise(0L).as("union_within_tol"))
      .orderBy("week")
  }

  /** Recursive hierarchy closure (BOM-explosion / org-chart ancestor
    * table) via ITERATIVE JOIN fixpoint — the same distributed pattern as
    * [[graft.ops.Dedup.connectedComponents]] but path-preserving: each
    * round joins the frontier's ancestor against the parent-edge table,
    * so depth-k ancestors cost k co-partitioned joins (k = tree height,
    * ~log n for this synthetic binary hierarchy — never data-sized) with
    * a localCheckpoint barrier per round to keep lineage flat. The
    * hierarchy is synthesized over the customer table
    * (parent(k) = k div 2), and the oracle replays it as a WITH RECURSIVE
    * closure; the digest pins one row per (depth): node count + both id
    * sums, so a dropped path, an off-by-one depth, or a duplicated
    * frontier row all hash-fail.
    */
  val q172_hierarchy_closure: QueryDef = q(
    "q172_hierarchy_closure",
    """WITH RECURSIVE edges AS (
      |  SELECT c_custkey AS node, CAST(floor(c_custkey / 2) AS BIGINT) AS parent
      |  FROM customer WHERE c_custkey >= 2),
      |anc AS (
      |  SELECT node, parent AS ancestor, 1 AS depth FROM edges
      |  UNION ALL
      |  SELECT a.node, e.parent AS ancestor, a.depth + 1
      |  FROM anc a JOIN edges e ON a.ancestor = e.node)
      |SELECT CAST(depth AS BIGINT) AS depth, CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(node) AS BIGINT) AS sum_nodes,
      |  CAST(SUM(ancestor) AS BIGINT) AS sum_anc
      |FROM anc GROUP BY depth ORDER BY depth""".stripMargin,
    "Recursive ancestor closure by iterative co-partitioned joins " +
      "(tree-height rounds, checkpointed), WITH RECURSIVE oracle") { (s, d) =>
    val edges = customer(s, d).filter(col("c_custkey") >= 2)
      .select(col("c_custkey").as("node"),
        expr("c_custkey div 2").as("parent"))
      .localCheckpoint(true)
    val parentOf = edges
      .select(col("node").as("ancestor"), col("parent").as("_next"))
    var cur = edges.select(col("node"), col("parent").as("ancestor"),
      lit(1L).as("depth"))
    val acc = scala.collection.mutable.ListBuffer[DataFrame](cur)
    var n = cur.count()
    while (n > 0) {
      cur = cur.join(parentOf, Seq("ancestor"))
        .select(col("node"), col("_next").as("ancestor"),
          (col("depth") + 1L).as("depth"))
        .localCheckpoint(true)
      n = cur.count()
      if (n > 0) acc += cur
    }
    acc.reduce(_ unionAll _)
      .groupBy("depth")
      .agg(count(lit(1)).as("n"),
        sum("node").cast(LongType).as("sum_nodes"),
        sum("ancestor").cast(LongType).as("sum_anc"))
      .select(col("depth").cast(LongType).as("depth"), col("n"),
        col("sum_nodes"), col("sum_anc"))
      .orderBy("depth")
  }

  /** Ratio-to-report — the share-of-partition window idiom (each
    * customer's fraction of their month's revenue). Exactness: spends are
    * DECIMAL(18,2) sums; the share is computed on exact integer CENTS
    * (spend·100) with a floor-ppm integer division, so no double division
    * can drift between engines. The window partitions by MONTH over the
    * (month, customer) AGGREGATE frame — bounded by customers per month,
    * never the fact table.
    */
  val q177_ratio_to_report: QueryDef = q(
    "q177_ratio_to_report",
    """WITH m AS (
      |  SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
      |    o_custkey,
      |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS spend
      |  FROM orders GROUP BY 1, 2)
      |SELECT month, o_custkey, CAST(spend AS DOUBLE) AS spend,
      |  CAST(CAST(floor((CAST(1000000 AS DECIMAL(38,0)) * CAST(spend * 100 AS DECIMAL(38,0)))
      |    / CAST(SUM(spend * 100) OVER (PARTITION BY month) AS DECIMAL(38,0))) AS BIGINT)
      |    AS BIGINT) AS share_ppm
      |FROM m
      |ORDER BY month, o_custkey""".stripMargin,
    "Ratio-to-report: per-customer share of monthly revenue in exact " +
      "floor-ppm over integer cents (no double-division drift)") { (s, d) =>
    val m = orders(s, d)
      .groupBy(date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM")
        .as("month"), col("o_custkey"))
      .agg(sum(dec2(col("o_totalprice"))).as("spend"))
    val w = Window.partitionBy("month")
    m.withColumn("tc", (col("spend") * 100).cast(DecimalType(38, 0)))
      .withColumn("mt", sum(col("tc")).over(w))
      .select(col("month"), col("o_custkey"),
        col("spend").cast(DoubleType).as("spend"),
        expr("CAST((CAST(1000000 AS DECIMAL(38,0)) * tc) div mt AS BIGINT)")
          .as("share_ppm"))
      .orderBy("month", "o_custkey")
  }

  /** ANALYZE-style table statistics — the stats-collection pass every
    * engine's optimizer feeds on (row count, null count, min/max, NDV per
    * column), computed in ONE aggregation over the table: per-column
    * stats are parallel aggregate expressions in a single scan (Spark
    * plans the multi-distinct via one Expand — still one pass over
    * parquet), then stack-unpivoted to the (column, stats) catalog shape.
    * NDV is exact here for oracle parity; the production variant swaps
    * `count_distinct` for `approx_count_distinct` per column and keeps
    * the identical plan shape.
    */
  val q174_table_stats: QueryDef = q(
    "q174_table_stats",
    """SELECT 'l_discount' AS col_name, COUNT(*) AS n,
      |  CAST(COUNT(*) - COUNT(l_discount) AS BIGINT) AS n_null,
      |  CAST(MIN(l_discount) AS DOUBLE) AS min_v,
      |  CAST(MAX(l_discount) AS DOUBLE) AS max_v,
      |  CAST(COUNT(DISTINCT l_discount) AS BIGINT) AS ndv
      |FROM lineitem
      |UNION ALL
      |SELECT 'l_extendedprice', COUNT(*),
      |  CAST(COUNT(*) - COUNT(l_extendedprice) AS BIGINT),
      |  CAST(MIN(l_extendedprice) AS DOUBLE),
      |  CAST(MAX(l_extendedprice) AS DOUBLE),
      |  CAST(COUNT(DISTINCT l_extendedprice) AS BIGINT)
      |FROM lineitem
      |UNION ALL
      |SELECT 'l_quantity', COUNT(*),
      |  CAST(COUNT(*) - COUNT(l_quantity) AS BIGINT),
      |  CAST(MIN(l_quantity) AS DOUBLE),
      |  CAST(MAX(l_quantity) AS DOUBLE),
      |  CAST(COUNT(DISTINCT l_quantity) AS BIGINT)
      |FROM lineitem
      |ORDER BY col_name""".stripMargin,
    "ANALYZE-style per-column statistics (count/nulls/min/max/NDV) in a " +
      "single scan, stack-unpivoted to catalog rows") { (s, d) =>
    val cols = Seq("l_discount", "l_extendedprice", "l_quantity")
    val aggs = cols.flatMap { c =>
      Seq(count(lit(1)).as(s"n_$c"),
        (count(lit(1)) - count(col(c))).as(s"nn_$c"),
        min(col(c)).cast(DoubleType).as(s"mn_$c"),
        max(col(c)).cast(DoubleType).as(s"mx_$c"),
        countDistinct(col(c)).as(s"nd_$c"))
    }
    val stacked = cols.map(c =>
      s"'$c', n_$c, CAST(nn_$c AS BIGINT), mn_$c, mx_$c, CAST(nd_$c AS BIGINT)")
      .mkString(s"stack(${cols.size}, ", ", ",
        ") AS (col_name, n, n_null, min_v, max_v, ndv)")
    lineitem(s, d)
      .agg(aggs.head, aggs.tail: _*)
      .select(expr(stacked))
      .orderBy("col_name")
  }

  /** GROUPING SETS with explicit grouping() flags — the generalized form
    * of q18 rollup / q66 cube. The SQL text is shared verbatim with the
    * oracle (temp view named like the DuckDB table), so the two engines
    * parse the identical query.
    */
  val q89_grouping_sets: QueryDef = q(
    "q89_grouping_sets",
    AdvancedSqlTexts.groupingSets,
    "GROUPING SETS aggregation with grouping flags (shared SQL text)") {
    (s, d) =>
      lineitem(s, d).createOrReplaceTempView("lineitem")
      s.sql(AdvancedSqlTexts.groupingSets)
  }

  /** Time-range windowed aggregate: per-user moving sum/count over a
    * 1-hour RANGE frame. Value-based frames are the streaming-adjacent
    * window shape (peers at the same key are one frame, however the rows
    * are partitioned), and the frame is anchored on integer seconds
    * (`ts_sec` here, `floor(epoch(ts))` in the oracle) because the two
    * engines do not preserve identical sub-microsecond timestamp
    * precision (the parquet nanos survive in Spark's raw int64 but are
    * truncated by the oracle's TIMESTAMP — same rule as q20).
    */
  val q90_range_window: QueryDef = q(
    "q90_range_window",
    """SELECT event_id,
      |  CAST(SUM(CAST(value AS DECIMAL(28,12))) OVER w AS DOUBLE) AS mov_sum,
      |  CAST(COUNT(*) OVER w AS BIGINT) AS n_win
      |FROM (SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec, value
      |      FROM events) t
      |WINDOW w AS (PARTITION BY user_id ORDER BY sec
      |             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
      |ORDER BY event_id""".stripMargin,
    "1-hour RANGE-frame moving sum per user (value-based window frame)") {
    (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("ts_sec")
        .rangeBetween(-3600L, 0L)
      events(s, d).select(col("event_id"),
          sum(col("value").cast(DecimalType(28, 12))).over(w)
            .cast(DoubleType).as("mov_sum"),
          count(lit(1)).over(w).cast(LongType).as("n_win"))
        .orderBy("event_id")
  }

  /** KLL quantile-sketch MERGE ([[graft.functions.KllSketch]]) — the
    * quantile twin of q87's HLL union: one sketch per partition (linear
    * pass, no row shuffle), kilobyte states merged associatively, then
    * each merged-quantile estimate's TRUE rank is checked in one scan
    * (q75's gate, loosened to ±5% — KLL compaction is randomized with
    * ~0.5% typical rank error at k=800, so the gate fails only on a
    * broken merge, never on sketch luck). The oracle pins n and the
    * bound flags.
    */
  val q150_kll_quantile_merge: QueryDef = q(
    "q150_kll_quantile_merge",
    """SELECT CAST(q AS BIGINT) AS q_ppm,
      |  CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT) AS n,
      |  CAST(1 AS BIGINT) AS rank_ok
      |FROM (SELECT unnest(list_value(250000, 500000, 750000)) AS q) t
      |ORDER BY q_ppm""".stripMargin,
    "Per-partition KLL quantile sketches merged to global estimates, " +
      "true-rank gated (mergeable-sketch maintenance for quantiles)") {
    (s, d) =>
      import s.implicits._
      import graft.functions.KllSketch
      val k = 800
      val vals = lineitem(s, d)
        .select(col("l_extendedprice").cast(DoubleType).as("v"))
      val merged = KllSketch.merge(
        KllSketch.partitionSketches(vals.as[Double], k).collect().toSeq, k)
      val qs = Seq(0.25, 0.50, 0.75)
      val ests = qs.map(q => merged.getQuantile(q))
      val ranks = vals.agg(
        count(lit(1)).as("n"),
        qs.zip(ests).zipWithIndex.map { case ((_, e), i) =>
          sum(when(col("v") <= e, 1L).otherwise(0L)).as(s"r$i")
        }: _*)
      qs.zipWithIndex.foldLeft(ranks) { case (df, (q, i)) =>
        df.withColumn(s"ok$i",
          when(abs(col(s"r$i").cast(DoubleType) / col("n") - q) <= 0.05, 1L)
            .otherwise(0L))
      }.select(
        explode(array(qs.zipWithIndex.map { case (q, i) =>
          struct(lit((q * 1000000).toLong).as("q_ppm"),
            col("n").cast(LongType).as("n"), col(s"ok$i").as("rank_ok"))
        }: _*)).as("row"))
        .select("row.*")
        .orderBy("q_ppm")
  }

  /** Skyline / Pareto frontier ([[graft.ops.Skyline.skyline2d]]): the
    * lineitems no other lineitem beats on BOTH price (cheaper-or-equal)
    * and quantity (more-or-equal, one strict) — the multi-criteria
    * optimum set. Engine runs the two-phase distributed sweep (local
    * skyline per partition, global sweep on the tiny candidate union —
    * no window node, no pair join); the oracle the equivalent RANGE-frame
    * formulation: survive iff max(qty | price' < price) < qty and
    * max(qty | price' ≤ price) ≤ qty, which keeps equal-point duplicates
    * on both sides. Criteria in exact integer cents / units.
    */
  val q181_skyline: QueryDef = q(
    "q181_skyline",
    """WITH li AS (
      |  SELECT l_orderkey, l_linenumber,
      |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS price_cents,
      |    CAST(l_quantity AS BIGINT) AS qty
      |  FROM lineitem
      |  WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL),
      |sw AS (
      |  SELECT *,
      |    max(qty) OVER (ORDER BY price_cents
      |      RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS amax,
      |    max(qty) OVER (ORDER BY price_cents
      |      RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS bmax
      |  FROM li)
      |SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
      |  price_cents, qty
      |FROM sw WHERE (amax IS NULL OR amax < qty) AND bmax <= qty
      |ORDER BY price_cents, qty, l_orderkey, l_linenumber""".stripMargin,
    "Skyline (Pareto frontier): min price, max quantity over lineitem — " +
      "two-phase partition-local sweep, window-free engine plan") { (s, d) =>
    val li = lineitem(s, d)
      .filter(col("l_extendedprice").isNotNull && col("l_quantity").isNotNull)
      .select(col("l_orderkey"), col("l_linenumber").cast(LongType).as("l_linenumber"),
        (dec2(col("l_extendedprice")) * 100).cast(LongType).as("price_cents"),
        col("l_quantity").cast(LongType).as("qty"))
    graft.ops.Skyline.skyline2d(li, "price_cents", "qty")
      .orderBy("price_cents", "qty", "l_orderkey", "l_linenumber")
  }

  /** Golden-record survivorship merge (the MERGE stage of master-data
    * management; the MATCH stage is q88/q86's fuzzy/semantic pairing):
    * duplicate customer records — synthetic match groups of ≤3, the
    * q126/q193 synthesis rule — collapse to one survivor row under
    * deterministic field rules: representative name from the member
    * with the HIGHEST balance (tie → lowest key, the struct-max trick —
    * no per-group window), segment by most-frequent-with-min-tie
    * (struct-min over (−cnt, seg)), balance = group max in exact cents,
    * survivor key = min. The oracle replays the rules with rank
    * windows, re-pinning struct-extremum ≡ window-rank on a third
    * operator family.
    */
  val q199_golden_record: QueryDef = q(
    "q199_golden_record",
    """WITH base AS (
      |  SELECT CAST(floor(c_custkey / 3) AS BIGINT) AS gid, c_custkey, c_name, c_mktsegment,
      |    CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |  FROM customer),
      |rep AS (
      |  SELECT gid, c_name FROM (
      |    SELECT gid, c_name,
      |      row_number() OVER (PARTITION BY gid
      |        ORDER BY cents DESC, c_custkey) AS rn
      |    FROM base) WHERE rn = 1),
      |segm AS (
      |  SELECT gid, c_mktsegment FROM (
      |    SELECT gid, c_mktsegment,
      |      row_number() OVER (PARTITION BY gid
      |        ORDER BY count(*) DESC, c_mktsegment) AS rn
      |    FROM base GROUP BY gid, c_mktsegment) WHERE rn = 1),
      |agg AS (
      |  SELECT gid, CAST(count(*) AS BIGINT) AS n_members,
      |    min(c_custkey) AS survivor_key, max(cents) AS max_cents
      |  FROM base GROUP BY gid)
      |SELECT agg.gid, agg.n_members, agg.survivor_key,
      |  rep.c_name AS rep_name, segm.c_mktsegment AS segment, agg.max_cents
      |FROM agg
      |JOIN rep ON rep.gid = agg.gid
      |JOIN segm ON segm.gid = agg.gid
      |ORDER BY agg.gid""".stripMargin,
    "Golden-record survivorship merge: per match group, best-balance " +
      "name, modal segment, max cents, min key — window-free engine") {
    (s, d) =>
      val base = customer(s, d).select(
        expr("c_custkey div 3").as("gid"), col("c_custkey"), col("c_name"),
        col("c_mktsegment"),
        (dec2(col("c_acctbal")) * 100).cast(LongType).as("cents"))
      val agg = base.groupBy("gid").agg(
        count(lit(1)).as("n_members"),
        min("c_custkey").as("survivor_key"),
        max("cents").as("max_cents"),
        max(struct(col("cents").as("a"), (-col("c_custkey")).as("b"),
          col("c_name").as("nm"))).getField("nm").as("rep_name"))
      val segm = base.groupBy("gid", "c_mktsegment")
        .agg(count(lit(1)).as("cnt"))
        .groupBy("gid")
        .agg(min(struct((-col("cnt")).as("a"), col("c_mktsegment").as("s")))
          .getField("s").as("segment"))
      agg.join(segm, Seq("gid"))
        .select(col("gid"), col("n_members"), col("survivor_key"),
          col("rep_name"), col("segment"), col("max_cents"))
        .orderBy("gid")
  }

  /** Quantile normalization across sources (the batch-effect corrector
    * of bioinformatics, applied to per-source document-length
    * distributions): every (source, length) value maps to the GLOBAL
    * length at the same percentile, so all sources share one output
    * distribution. Runs entirely on the VALUE DOMAIN — per-(source,
    * value) counts, cumulative ppm percentiles as windows over the
    * aggregate frame (distinct lengths × sources, never corpus rows) —
    * and the percentile lookup is the NATIVE as-of operator
    * (plans.AsOfJoinExec) on a constant key: latest global percentile ≤
    * the source percentile. The oracle mirrors with DuckDB's own ASOF
    * JOIN — real cross-engine agreement of two independent as-of
    * implementations.
    */
  val q200_quantile_normalize: QueryDef = q(
    "q200_quantile_normalize",
    """WITH v AS (SELECT source, n_chars AS val FROM documents),
      |sv AS (SELECT source, val, CAST(count(*) AS BIGINT) AS c
      |  FROM v GROUP BY 1, 2),
      |st AS (SELECT source, sum(c) AS n FROM sv GROUP BY source),
      |sp AS (
      |  SELECT sv.source, sv.val, sv.c,
      |    CAST(CAST(floor((CAST(1000000 AS DECIMAL(38,0)) *
      |        sum(sv.c) OVER (PARTITION BY sv.source ORDER BY sv.val))
      |      / st.n) AS BIGINT) AS BIGINT) AS pct_ppm
      |  FROM sv JOIN st ON st.source = sv.source),
      |gv AS (SELECT val, CAST(count(*) AS BIGINT) AS c FROM v GROUP BY val),
      |gp AS (
      |  SELECT val AS gval,
      |    CAST(CAST(floor((CAST(1000000 AS DECIMAL(38,0)) * sum(c) OVER (ORDER BY val))
      |      / (SELECT sum(c) FROM gv)) AS BIGINT) AS BIGINT) AS gpct
      |  FROM gv)
      |SELECT sp.source, sp.val, sp.c AS n_docs, sp.pct_ppm,
      |  gp.gval AS normalized
      |FROM sp ASOF JOIN gp ON sp.pct_ppm >= gp.gpct
      |ORDER BY sp.source, sp.val""".stripMargin,
    "Quantile normalization of per-source length distributions onto the " +
      "global distribution — value-domain frames + native as-of lookup") {
    (s, d) =>
      val v = Tables.documents(s, d).select(col("source"), col("n_chars").as("val"))
      val sv = v.groupBy("source", "val").agg(count(lit(1)).as("c"))
      val st = sv.groupBy("source").agg(sum("c").as("n"))
      val ws = Window.partitionBy("source").orderBy("val")
      val sp = sv.join(st, Seq("source"))
        .withColumn("cum", sum("c").over(ws))
        .select(col("source"), col("val"), col("c"),
          expr("CAST((CAST(1000000 AS DECIMAL(38,0)) * cum) div n AS BIGINT)")
            .as("pct_ppm"), lit(0L).as("k"))
      val gv = v.groupBy("val").agg(count(lit(1)).as("c"))
      val gt = gv.agg(sum("c").as("gn"))
      val wg = Window.orderBy("val")
      val gp = gv.crossJoin(broadcast(gt))
        .withColumn("gcum", sum("c").over(wg))
        .select(col("val").as("gval"),
          expr("CAST((CAST(1000000 AS DECIMAL(38,0)) * gcum) div gn AS BIGINT)")
            .as("gpct"), lit(0L).as("k"))
      graft.ops.AsOf.joinAsOfNative(sp, gp, "k", "pct_ppm", "gpct", Seq("gval"))
        .select(col("source"), col("val"), col("c").as("n_docs"),
          col("pct_ppm"), col("asof_gval").as("normalized"))
        .orderBy("source", "val")
  }

  /** Co-bucketed fact-fact join promoted to a CORRECTNESS row
    * ([[graft.ops.Bucketing]], plan pinned exchange-free by
    * BucketingSpec): both sides written bucketed+sorted on the join key,
    * joined without any shuffle, digested per order priority. The oracle
    * digests the plain join — so the bucketed write→read→join chain must
    * lose/duplicate nothing. Tables are dropped after the digest
    * materializes (q148's teardown discipline).
    */
  val q203_bucketed_join: QueryDef = q(
    "q203_bucketed_join",
    """SELECT o.o_orderpriority,
      |  CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
      |  CAST(sum(CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
      |    AS BIGINT) AS sum_cents
      |FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      |GROUP BY 1 ORDER BY 1""".stripMargin,
    "Co-bucketed join (shuffle-free fact-fact): bucketed write -> read " +
      "-> join digest vs the plain-join oracle") { (s, d) =>
    val tag = java.util.UUID.randomUUID().toString.replace("-", "").take(12)
    val tOrders = s"graft_q203_o_$tag"
    val tLines = s"graft_q203_l_$tag"
    graft.ops.Bucketing.writeBucketed(
      orders(s, d).select(col("o_orderkey"), col("o_orderpriority"),
        col("o_totalprice")), tOrders, "o_orderkey", 8)
    graft.ops.Bucketing.writeBucketed(
      lineitem(s, d).select(col("l_orderkey").as("o_orderkey"),
        col("l_quantity")), tLines, "o_orderkey", 8)
    val res = graft.ops.Bucketing.coBucketedJoin(s, tOrders, tLines, "o_orderkey")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast(LongType)).cast(LongType).as("sum_qty"),
        sum(expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"))
          .cast(LongType).as("sum_cents"))
      .orderBy("o_orderpriority")
      .localCheckpoint(true)
    s.sql(s"DROP TABLE IF EXISTS $tOrders")
    s.sql(s"DROP TABLE IF EXISTS $tLines")
    res
  }

  /** Exact equi-DEPTH histogram boundaries (q82 is equi-width): for each
    * decile k, the smallest value whose cumulative ppm reaches k·10⁵ —
    * the optimizer-statistics quantile sketch, computed EXACTLY on the
    * value domain (distinct n_chars values, never corpus rows; q200's
    * trick). One hash agg + one cumulative window over the bounded
    * value-domain frame + one tiny threshold join.
    */
  val q204_equi_depth_histogram: QueryDef = q(
    "q204_equi_depth_histogram",
    """WITH gv AS (
      |  SELECT n_chars AS val, CAST(count(*) AS BIGINT) AS c
      |  FROM documents GROUP BY 1),
      |gp AS (
      |  SELECT val,
      |    CAST(CAST(floor((CAST(1000000 AS DECIMAL(38,0)) * sum(c) OVER (ORDER BY val))
      |      / (SELECT sum(c) FROM gv)) AS BIGINT) AS BIGINT) AS gpct
      |  FROM gv),
      |ks AS (SELECT k FROM range(1, 11) AS t(k))
      |SELECT CAST(ks.k AS BIGINT) AS k, min(gp.val) AS upper_val
      |FROM ks JOIN gp ON gp.gpct >= ks.k * 100000
      |GROUP BY ks.k ORDER BY k""".stripMargin,
    "Equi-depth decile boundaries, exact on the value domain — the " +
      "statistics quantile pass without sampling") { (s, d) =>
    val gv = Tables.documents(s, d)
      .groupBy(col("n_chars").as("val")).agg(count(lit(1)).as("c"))
    val gt = gv.agg(sum("c").as("gn"))
    val wg = Window.orderBy("val")
    val gp = gv.crossJoin(broadcast(gt))
      .withColumn("gcum", sum("c").over(wg))
      .select(col("val"),
        expr("CAST((CAST(1000000 AS DECIMAL(38,0)) * gcum) div gn AS BIGINT)")
          .as("gpct"))
    val ks = s.range(1, 11).select(col("id").as("k"))
    broadcast(ks).join(gp, col("gpct") >= col("k") * 100000)
      .groupBy("k").agg(min("val").as("upper_val"))
      .orderBy("k")
  }

  /** k-anonymity audit — the privacy gate a dataset release runs: group
    * rows by their quasi-identifier tuple (nation, segment, $1000
    * balance band) and surface every equivalence class smaller than
    * k=5, whose members a linker could re-identify. The balance band is
    * SHIFTED before the floor division (+10⁵ cents) so negative
    * balances never hit the div/`//` truncate-vs-floor divergence. One
    * map-side-combined hash agg; output bounded by the violating-class
    * count.
    */
  val q208_kanonymity: QueryDef = q(
    "q208_kanonymity",
    """WITH qi AS (
      |  SELECT c_custkey, c_nationkey, c_mktsegment,
      |    CAST(floor((CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      + 100000) / 100000) AS BIGINT) AS bal_band
      |  FROM customer),
      |cls AS (
      |  SELECT c_nationkey, c_mktsegment, bal_band,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM qi GROUP BY 1, 2, 3)
      |SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey, c_mktsegment,
      |  bal_band, n
      |FROM cls WHERE n < 5
      |ORDER BY 1, 2, 3""".stripMargin,
    "k-anonymity audit (k=5): quasi-identifier equivalence classes too " +
      "small to release, shifted integer balance bands") { (s, d) =>
    customer(s, d)
      .groupBy(col("c_nationkey").cast(LongType).as("c_nationkey"),
        col("c_mktsegment"),
        expr("""(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
               | + 100000) div 100000""".stripMargin).as("bal_band"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") < 5)
      .orderBy("c_nationkey", "c_mktsegment", "bal_band")
  }

  /** Referentially-consistent pseudonymization — the GDPR-style masking
    * pass: customer keys are replaced by seeded-md5 surrogate keys, and
    * the SAME function applied on the fact side must keep every join
    * intact (surrogate joins reproduce key joins exactly) while no two
    * keys collide. The one-row report value-checks consistency (orders
    * joining on surrogate AND key), collision count (surrogate shared
    * by ≠ keys — must be 0), and cardinalities; any drift in the
    * surrogate derivation hash-fails against the oracle's own md5.
    */
  val q209_pseudonymize: QueryDef = q(
    "q209_pseudonymize",
    """WITH cmap AS (
      |  SELECT c_custkey,
      |    substr(md5('pk1:' || CAST(c_custkey AS STRING)), 1, 16) AS sk
      |  FROM customer),
      |omap AS (
      |  SELECT o_custkey,
      |    substr(md5('pk1:' || CAST(o_custkey AS STRING)), 1, 16) AS sk
      |  FROM orders)
      |SELECT
      |  CAST((SELECT count(*) FROM cmap) AS BIGINT) AS n_customers,
      |  CAST((SELECT count(DISTINCT sk) FROM cmap) AS BIGINT) AS n_surrogates,
      |  CAST((SELECT count(*) FROM omap) AS BIGINT) AS n_orders,
      |  CAST((SELECT count(*) FROM omap o JOIN cmap c
      |        ON c.sk = o.sk AND c.c_custkey = o.o_custkey) AS BIGINT)
      |    AS n_join_consistent,
      |  CAST((SELECT count(*) FROM omap o JOIN cmap c
      |        ON c.sk = o.sk AND c.c_custkey <> o.o_custkey) AS BIGINT)
      |    AS n_cross_collisions""".stripMargin,
    "Deterministic pseudonymization audit: surrogate keys preserve every " +
      "join, zero collisions — one-row report") { (s, d) =>
    def sk(c: Column) =
      substring(md5(concat(lit("pk1:"), c.cast(StringType))), 1, 16)
    val cmap = customer(s, d).select(col("c_custkey"), sk(col("c_custkey")).as("sk"))
    val omap = orders(s, d).select(col("o_custkey"), sk(col("o_custkey")).as("sk"))
    val joined = omap.join(cmap, Seq("sk"))
    val a = cmap.agg(count(lit(1)).as("n_customers"),
      countDistinct("sk").as("n_surrogates"))
    val b = omap.agg(count(lit(1)).as("n_orders"))
    val c = joined.agg(
      sum(when(col("c_custkey") === col("o_custkey"), 1L).otherwise(0L))
        .as("n_join_consistent"),
      sum(when(col("c_custkey") =!= col("o_custkey"), 1L).otherwise(0L))
        .as("n_cross_collisions"))
    a.crossJoin(broadcast(b)).crossJoin(broadcast(c))
      .select(col("n_customers"), col("n_surrogates"), col("n_orders"),
        col("n_join_consistent").cast(LongType).as("n_join_consistent"),
        coalesce(col("n_cross_collisions").cast(LongType), lit(0L))
          .as("n_cross_collisions"))
  }

  /** Differentially-private histogram release
    * ([[graft.ops.Privacy.withTwoSidedGeometricNoise]]) — the
    * noisy-aggregate tier the privacy suite (q208/q209/q214) lacked:
    * the per-(event_type, day) activity histogram is published with
    * seeded two-sided-geometric noise (α = 1/2, sensitivity-1 counts →
    * ε = ln 2), plus an ε-accounting row (the buckets partition the
    * events, so parallel composition keeps the release at one ε). The
    * noise draw is exact integer arithmetic from md5 — the oracle
    * replays every noisy count bit-for-bit, so a wrong threshold, a
    * float log2 ulp, or a seed drift all hash-fail. Scale shape: one
    * map-side-combined hash agg + per-row codegen noise; the release is
    * histogram-sized.
    */
  val q236_dp_release: QueryDef = q(
    "q236_dp_release",
    """WITH c AS (
      |  SELECT event_type,
      |    CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1, 2),
      |nz AS (
      |  SELECT event_type, day, n,
      |    CAST(('0x' || substr(md5('dp1:' || event_type || ':'
      |      || CAST(day AS STRING)), 1, 15)) AS BIGINT)
      |      % 6597069766656 AS u
      |  FROM c)
      |SELECT event_type, day,
      |  CAST(n + CASE
      |    WHEN u = 0 THEN -41
      |    WHEN u < 4398046511104 THEN length(bin(u)) - 42
      |    WHEN 6597069766655 - u = 0 THEN 41
      |    ELSE 42 - length(bin(6597069766655 - u))
      |  END AS BIGINT) AS n_released
      |FROM nz
      |UNION ALL
      |SELECT 'epsilon_ppm', CAST(-1 AS BIGINT), CAST(693147 AS BIGINT)
      |ORDER BY event_type, day""".stripMargin,
    "DP histogram release: two-sided geometric noise (alpha=1/2, " +
      "eps=ln 2) in exact integer arithmetic, oracle-replayed " +
      "bit-for-bit, with an epsilon-accounting row") { (s, d) =>
    val counts = Tables.events(s, d)
      .withColumn("day", expr("ts_sec div 86400"))
      .groupBy("event_type", "day")
      .agg(count(lit(1)).as("n"))
    graft.ops.Privacy.withTwoSidedGeometricNoise(
        counts, seed = "dp1",
        keySql = "concat(event_type, ':', CAST(day AS STRING))", out = "z")
      .select(col("event_type"), col("day"),
        (col("n") + col("z")).cast(LongType).as("n_released"))
      .unionByName(s.range(1).select(
        lit("epsilon_ppm").as("event_type"), lit(-1L).as("day"),
        lit(graft.ops.Privacy.EpsilonLn2Ppm).as("n_released")))
      .orderBy("event_type", "day")
  }

  /** Differentially-private MEAN release — the q236 mechanism extended
    * from counts to a numeric aggregate the safe way: the value domain
    * is banded ($10 bands of the cents domain), the per-(type, band)
    * histogram gets the same seeded two-sided-geometric noise (each
    * event falls in exactly ONE bucket, so parallel composition keeps
    * the whole release at ε = ln 2), and the published mean is derived
    * from the NOISY histogram via band midpoints — pure post-processing,
    * which costs zero additional ε. Negative noisy counts clamp to 0
    * (standard, still post-processing). Exact integer arithmetic
    * throughout; the oracle replays every noise draw bit-for-bit.
    * The cents domain is SHIFTED (+10⁸) before the band division AND the
    * Spark-side division is an explicit portable floor (q179's CASE), so
    * the Spark-`div`-truncates vs DuckDB-`//`-floors divergence cannot
    * appear for ANY BIGINT cents value — the shift alone only guarded
    * values ≥ -10⁸ cents; the midpoint subtracts the shift back, and the
    * final mean uses the same portable floor.
    */
  val q257_dp_mean: QueryDef = q(
    "q257_dp_mean",
    """WITH c AS (
      |  SELECT event_type,
      |    CAST(floor((CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) + 100000000)
      |      / 1000) AS BIGINT) AS band,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1, 2),
      |nz AS (
      |  SELECT event_type, band, n,
      |    CAST(('0x' || substr(md5('dpm1:' || event_type || ':'
      |      || CAST(band AS STRING)), 1, 15)) AS BIGINT)
      |      % 6597069766656 AS u
      |  FROM c),
      |rel AS (
      |  SELECT event_type, band,
      |    greatest(n + CASE
      |      WHEN u = 0 THEN -41
      |      WHEN u < 4398046511104 THEN length(bin(u)) - 42
      |      WHEN 6597069766655 - u = 0 THEN 41
      |      ELSE 42 - length(bin(6597069766655 - u)) END, 0) AS n_rel
      |  FROM nz),
      |agg AS (
      |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_bands,
      |    CAST(SUM(n_rel) AS BIGINT) AS n_total,
      |    SUM(CAST(band * 1000 + 500 - 100000000 AS DECIMAL(38,0)) * n_rel)
      |      AS num
      |  FROM rel GROUP BY 1)
      |SELECT event_type, n_bands, n_total,
      |  CAST(CASE WHEN n_total = 0 THEN 0
      |    ELSE CAST(floor((CAST(1000000 AS DECIMAL(38,0)) * num) / n_total) AS BIGINT) END AS BIGINT)
      |    AS dp_mean_micro_cents
      |FROM agg
      |UNION ALL
      |SELECT 'epsilon_ppm', CAST(-1 AS BIGINT), CAST(-1 AS BIGINT),
      |  CAST(693147 AS BIGINT)
      |ORDER BY event_type""".stripMargin,
    "DP mean release: noisy banded value histogram (eps = ln 2 by " +
      "parallel composition) post-processed to a band-midpoint mean — " +
      "exact integer noise, oracle-replayed bit-for-bit") { (s, d) =>
    // portable floor, q179's idiom: the +10^8 shift keeps every realistic
    // cents value positive, but for cents below -10^8 the shifted value
    // would still be negative and Spark `div` (truncates) would diverge
    // from DuckDB `//` (floors) — the CASE floors for ALL inputs, so the
    // per-band noise key stays synchronized over the whole BIGINT domain
    val counts = Tables.events(s, d)
      .select(col("event_type"),
        expr("""CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
               | + 100000000""".stripMargin).as("shifted"))
      .select(col("event_type"),
        expr("""CASE WHEN shifted >= 0 THEN shifted div 1000
               | ELSE -((-shifted + 999) div 1000) END""".stripMargin)
          .as("band"))
      .groupBy("event_type", "band").agg(count(lit(1)).as("n"))
    graft.ops.Privacy.withTwoSidedGeometricNoise(counts, seed = "dpm1",
        keySql = "concat(event_type, ':', CAST(band AS STRING))", out = "z")
      .withColumn("n_rel", greatest(col("n") + col("z"), lit(0L)))
      .groupBy("event_type")
      .agg(count(lit(1)).cast(LongType).as("n_bands"),
        sum("n_rel").cast(LongType).as("n_total"),
        sum(expr("CAST(band * 1000 + 500 - 100000000 AS DECIMAL(38,0))" +
          " * n_rel")).as("num"))
      .select(col("event_type"), col("n_bands"), col("n_total"),
        expr("CAST(CASE WHEN n_total = 0 THEN 0 " +
          "WHEN num >= 0 THEN " +
          "(CAST(1000000 AS DECIMAL(38,0)) * num) div n_total " +
          "ELSE -(((CAST(-1000000 AS DECIMAL(38,0)) * num) " +
          "+ n_total - 1) div n_total) END " +
          "AS BIGINT)").as("dp_mean_micro_cents"))
      .unionByName(s.range(1).select(lit("epsilon_ppm").as("event_type"),
        lit(-1L).as("n_bands"), lit(-1L).as("n_total"),
        lit(693147L).as("dp_mean_micro_cents")))
      .orderBy("event_type")
  }

  /** Differentially-private QUANTILE release — the standard third
    * release after q236's counts and q257's mean, via NOISY-HISTOGRAM
    * POST-PROCESSING: the same seeded two-sided-geometric noise is
    * applied ONCE to the per-(type, band) histogram (each event in
    * exactly one band → parallel composition keeps the whole release at
    * ε = ln 2), and p25/p50/p75 are then read off the noisy cumulative —
    * pure post-processing, zero additional ε, so the ε-accounting row is
    * unchanged from q257. Quantile position uses the portable ceil
    * ⌈N·p/100⌉ = (N·p + 99) div 100 (q294's idiom); the released value is
    * the band midpoint in cents. Same +10⁸ shift + portable-floor band
    * division as q257 so band keys stay synchronized over the whole
    * BIGINT cents domain. The cumulative window partitions by type and
    * is bounded by distinct bands per type, never rows. Every noise draw
    * is replayed bit-for-bit by the oracle.
    */
  val q300_dp_quantiles: QueryDef = q(
    "q300_dp_quantiles",
    """WITH c AS (
      |  SELECT event_type,
      |    CAST(floor((CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) + 100000000)
      |      / 1000) AS BIGINT) AS band,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1, 2),
      |nz AS (
      |  SELECT event_type, band, n,
      |    CAST(('0x' || substr(md5('dpq1:' || event_type || ':'
      |      || CAST(band AS STRING)), 1, 15)) AS BIGINT)
      |      % 6597069766656 AS u
      |  FROM c),
      |rel AS (
      |  SELECT event_type, band,
      |    greatest(n + CASE
      |      WHEN u = 0 THEN -41
      |      WHEN u < 4398046511104 THEN length(bin(u)) - 42
      |      WHEN 6597069766655 - u = 0 THEN 41
      |      ELSE 42 - length(bin(6597069766655 - u)) END, 0) AS n_rel
      |  FROM nz),
      |cum AS (
      |  SELECT event_type, band,
      |    CAST(SUM(n_rel) OVER (PARTITION BY event_type ORDER BY band)
      |      AS BIGINT) AS cum,
      |    CAST(SUM(n_rel) OVER (PARTITION BY event_type) AS BIGINT)
      |      AS total
      |  FROM rel),
      |ps(p) AS (VALUES (25), (50), (75)),
      |pos AS (
      |  SELECT t.event_type, ps.p, t.total,
      |    CAST(floor((t.total * ps.p + 99) / 100) AS BIGINT) AS pos
      |  FROM (SELECT DISTINCT event_type, total FROM cum) t, ps),
      |hit AS (
      |  SELECT pos.event_type, pos.p, pos.total, min(cum.band) AS qband
      |  FROM pos JOIN cum ON cum.event_type = pos.event_type
      |    AND cum.cum >= pos.pos
      |  GROUP BY 1, 2, 3)
      |SELECT event_type, CAST(p AS BIGINT) AS p,
      |  CAST(total AS BIGINT) AS n_total,
      |  CAST(qband * 1000 + 500 - 100000000 AS BIGINT) AS dp_q_cents
      |FROM hit
      |UNION ALL
      |SELECT 'epsilon_ppm', CAST(-1 AS BIGINT), CAST(-1 AS BIGINT),
      |  CAST(693147 AS BIGINT)
      |ORDER BY event_type, p""".stripMargin,
    "DP quantile release: noisy banded histogram (eps = ln 2 by " +
      "parallel composition) post-processed to p25/p50/p75 band " +
      "midpoints — zero extra epsilon, exact integer noise, " +
      "oracle-replayed bit-for-bit") { (s, d) =>
    val counts = Tables.events(s, d)
      .select(col("event_type"),
        expr("""CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
               | + 100000000""".stripMargin).as("shifted"))
      .select(col("event_type"),
        expr("""CASE WHEN shifted >= 0 THEN shifted div 1000
               | ELSE -((-shifted + 999) div 1000) END""".stripMargin)
          .as("band"))
      .groupBy("event_type", "band").agg(count(lit(1)).as("n"))
    val rel = graft.ops.Privacy.withTwoSidedGeometricNoise(counts,
        seed = "dpq1",
        keySql = "concat(event_type, ':', CAST(band AS STRING))", out = "z")
      .withColumn("n_rel", greatest(col("n") + col("z"), lit(0L)))
    val wCum = Window.partitionBy("event_type").orderBy("band")
    val wTot = Window.partitionBy("event_type")
    val cum = rel
      .withColumn("cum", sum("n_rel").over(wCum).cast(LongType))
      .withColumn("total", sum("n_rel").over(wTot).cast(LongType))
      .withColumn("p", explode(array(lit(25L), lit(50L), lit(75L))))
      .withColumn("pos", expr("(total * p + 99) div 100"))
    cum.filter(col("cum") >= col("pos"))
      .groupBy("event_type", "p", "total")
      .agg(min("band").as("qband"))
      .select(col("event_type"), col("p"),
        col("total").as("n_total"),
        expr("CAST(qband * 1000 + 500 - 100000000 AS BIGINT)")
          .as("dp_q_cents"))
      .unionByName(s.range(1).select(lit("epsilon_ppm").as("event_type"),
        lit(-1L).as("p"), lit(-1L).as("n_total"),
        lit(693147L).as("dp_q_cents")))
      .orderBy("event_type", "p")
  }

  /** Differentially-private HEAVY-HITTERS release (stability-based
    * thresholding, the fourth standard release after counts/mean/
    * quantiles): per-user event counts get the q236 seeded two-sided
    * geometric noise, and ONLY users whose NOISY count clears the
    * threshold (80) are published — membership in the release is itself
    * decided on the noisy value, never the true one, which is what
    * makes thresholded releases private. Exact integer noise, replayed
    * bit-for-bit by the oracle; ε = ln 2 (one noised query per user,
    * disjoint rows → parallel composition), stamped as the accounting
    * row. One hash agg + a codegen noise expression — no joins, no
    * windows, nothing driver-side.
    */
  val q303_dp_topk: QueryDef = q(
    "q303_dp_topk",
    """WITH c AS (
      |  SELECT user_id, CAST(count(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1),
      |nz AS (
      |  SELECT user_id, n,
      |    CAST(('0x' || substr(md5('dpt1:' || CAST(user_id AS STRING)),
      |      1, 15)) AS BIGINT) % 6597069766656 AS u
      |  FROM c),
      |rel AS (
      |  SELECT user_id,
      |    n + CASE
      |      WHEN u = 0 THEN -41
      |      WHEN u < 4398046511104 THEN length(bin(u)) - 42
      |      WHEN 6597069766655 - u = 0 THEN 41
      |      ELSE 42 - length(bin(6597069766655 - u)) END AS n_rel
      |  FROM nz)
      |SELECT CAST(user_id AS BIGINT) AS user_id,
      |  CAST(n_rel AS BIGINT) AS n_released
      |FROM rel WHERE n_rel >= 80
      |UNION ALL
      |SELECT CAST(-1 AS BIGINT), CAST(693147 AS BIGINT)
      |ORDER BY user_id, n_released""".stripMargin,
    "DP heavy hitters: stability-based threshold release — membership " +
      "decided on the noisy count (threshold 80), exact integer noise " +
      "oracle-replayed bit-for-bit, epsilon-accounting row") { (s, d) =>
    val counts = Tables.events(s, d)
      .groupBy("user_id").agg(count(lit(1)).as("n"))
    graft.ops.Privacy.withTwoSidedGeometricNoise(counts, seed = "dpt1",
        keySql = "CAST(user_id AS STRING)", out = "z")
      .select(col("user_id").cast(LongType).as("user_id"),
        (col("n") + col("z")).cast(LongType).as("n_released"))
      .filter(col("n_released") >= 80)
      .unionByName(s.range(1).select(lit(-1L).as("user_id"),
        lit(693147L).as("n_released")))
      .orderBy("user_id", "n_released")
  }

  /** PRIVACY BUDGET LEDGER — the ε-composition report over every DP
    * release this engine publishes from the events table (q236
    * histogram, q257 mean, q300 quantiles, q303 heavy hitters). Each
    * release is one ε = ln 2 two-sided-geometric mechanism whose cells
    * PARTITION the event rows (parallel composition WITHIN a release:
    * one noised query per row, whatever the cell count — flagged
    * `parallel_within`), and the four releases read overlapping rows of
    * the same table, so ACROSS releases sequential composition applies:
    * ε_total = 4·ln 2 = ln 16, exactly — the ledger keeps ε as an exact
    * integer multiple of ln 2 (`eps_ln2_units`) and renders ppm as
    * units × 693147 (the same floor(10⁶·ln 2) constant every release
    * stamps; for unit counts this small the per-unit floor equals the
    * floored product). Cell counts are computed live with each
    * release's exact cell definition (q257/q300 share the banded-value
    * axis but draw INDEPENDENT noise, so both consume budget) — a
    * drifted band width or day bucket is a value mismatch here, not
    * just in the release. One distinct-agg per axis; the ledger is
    * 5 rows.
    */
  val q308_privacy_ledger: QueryDef = q(
    "q308_privacy_ledger",
    """WITH n1 AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n FROM (
      |    SELECT DISTINCT event_type,
      |      CAST(floor(epoch(ts) / 86400) AS BIGINT) FROM events)),
      |n2 AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n FROM (
      |    SELECT DISTINCT event_type,
      |      CAST(floor((CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
      |        + 100000000) / 1000) AS BIGINT) FROM events)),
      |n3 AS (
      |  SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n FROM events)
      |SELECT * FROM (
      |  SELECT 'q236_dp_release' AS release,
      |    'event_type x day' AS axis, n1.n AS n_cells,
      |    CAST(1 AS BIGINT) AS eps_ln2_units,
      |    CAST(693147 AS BIGINT) AS eps_ppm,
      |    'parallel_within' AS composition FROM n1
      |  UNION ALL
      |  SELECT 'q257_dp_mean', 'event_type x value_band', n2.n,
      |    CAST(1 AS BIGINT), CAST(693147 AS BIGINT), 'parallel_within'
      |  FROM n2
      |  UNION ALL
      |  SELECT 'q300_dp_quantiles', 'event_type x value_band', n2.n,
      |    CAST(1 AS BIGINT), CAST(693147 AS BIGINT), 'parallel_within'
      |  FROM n2
      |  UNION ALL
      |  SELECT 'q303_dp_topk', 'user_id', n3.n,
      |    CAST(1 AS BIGINT), CAST(693147 AS BIGINT), 'parallel_within'
      |  FROM n3
      |  UNION ALL
      |  SELECT 'total_sequential', 'events',
      |    n1.n + 2 * n2.n + n3.n,
      |    CAST(4 AS BIGINT), CAST(2772588 AS BIGINT), 'sequential_across'
      |  FROM n1, n2, n3)
      |ORDER BY release""".stripMargin,
    "Privacy budget ledger: per-release cell counts under each DP " +
      "release's exact cell definition, parallel-within flags, and the " +
      "sequential-composition total 4*ln2 in exact ln2 units") { (s, d) =>
    val ev = Tables.events(s, d)
    // q257/q300's banded-value cell key, the portable-floor idiom
    val bandExpr = expr(
      """CASE WHEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
        | + 100000000 >= 0
        | THEN (CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
        |   + 100000000) div 1000
        | ELSE -((-(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
        |   + 100000000) + 999) div 1000) END""".stripMargin)
    val n1 = ev.select(col("event_type"), expr("ts_sec div 86400"))
      .distinct().agg(count(lit(1)).cast(LongType).as("n1"))
    val n2 = ev.select(col("event_type"), bandExpr.as("band"))
      .distinct().agg(count(lit(1)).cast(LongType).as("n2"))
    val n3 = ev.select("user_id").distinct()
      .agg(count(lit(1)).cast(LongType).as("n3"))
    // three 1-row axis-cardinality aggregates, joined into one base row
    val base = n1.crossJoin(broadcast(n2)).crossJoin(broadcast(n3))
      .localCheckpoint(true)
    def row(rel: String, axis: String, cells: Column, units: Int,
        comp: String) =
      base.select(lit(rel).as("release"), lit(axis).as("axis"),
        cells.cast(LongType).as("n_cells"),
        lit(units.toLong).as("eps_ln2_units"),
        lit(units * 693147L).as("eps_ppm"), lit(comp).as("composition"))
    row("q236_dp_release", "event_type x day", col("n1"), 1,
      "parallel_within")
      .unionByName(row("q257_dp_mean", "event_type x value_band",
        col("n2"), 1, "parallel_within"))
      .unionByName(row("q300_dp_quantiles", "event_type x value_band",
        col("n2"), 1, "parallel_within"))
      .unionByName(row("q303_dp_topk", "user_id", col("n3"), 1,
        "parallel_within"))
      .unionByName(row("total_sequential", "events",
        col("n1") + lit(2L) * col("n2") + col("n3"), 4,
        "sequential_across"))
      .orderBy("release")
  }

  /** Record-linkage scoring (Fellegi–Sunter shape): candidate pairs
    * from the SymSpell deletion-neighborhood blocking (q88's kernel —
    * never all-pairs), scored by integer field-agreement weights
    * (nation 400k, segment 300k, shifted balance band 200k, plus the
    * 100k name-similarity base every candidate carries) and classified
    * link / possible / non-link at pinned thresholds — the MATCH-
    * SCORING stage between q88's blocking and q199's survivorship
    * merge. Pure codegen CASE arithmetic on two broadcast-joined
    * customer payloads.
    */
  val q212_record_linkage: QueryDef = q(
    "q212_record_linkage",
    """WITH words AS (SELECT DISTINCT c_name AS w FROM customer),
      |vars AS (
      |  SELECT DISTINCT w, v FROM (
      |    SELECT w, w AS v FROM words
      |    UNION ALL
      |    SELECT w, substr(w, 1, i - 1) || substr(w, i + 1, length(w)) AS v
      |    FROM (SELECT w, unnest(generate_series(1, length(w))) AS i
      |          FROM words) g) u),
      |cand AS (
      |  SELECT DISTINCT a.w AS w1, b.w AS w2
      |  FROM vars a JOIN vars b ON a.v = b.v AND a.w < b.w),
      |pairs AS (
      |  SELECT w1, w2 FROM cand WHERE levenshtein(w1, w2) <= 1),
      |cust AS (
      |  SELECT c_name, c_custkey, c_nationkey, c_mktsegment,
      |    CAST(floor((CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      + 100000) / 100000) AS BIGINT) AS band
      |  FROM customer),
      |sc AS (
      |  SELECT c1.c_custkey AS key1, c2.c_custkey AS key2,
      |    100000
      |      + CASE WHEN c1.c_nationkey = c2.c_nationkey THEN 400000 ELSE 0 END
      |      + CASE WHEN c1.c_mktsegment = c2.c_mktsegment THEN 300000 ELSE 0 END
      |      + CASE WHEN c1.band = c2.band THEN 200000 ELSE 0 END AS score
      |  FROM pairs
      |  JOIN cust c1 ON c1.c_name = pairs.w1
      |  JOIN cust c2 ON c2.c_name = pairs.w2)
      |SELECT key1, key2, CAST(score AS BIGINT) AS score,
      |  CASE WHEN score >= 700000 THEN 'link'
      |       WHEN score >= 400000 THEN 'possible'
      |       ELSE 'non-link' END AS klass
      |FROM sc ORDER BY key1, key2""".stripMargin,
    "Record-linkage scoring: blocked candidate pairs, integer field-" +
      "agreement weights, link/possible/non-link classification") { (s, d) =>
    val pairs = graft.ops.Dedup.editDistance1Pairs(
      customer(s, d).select("c_name"), "c_name")
    val cust = customer(s, d).select(col("c_name"), col("c_custkey"),
      col("c_nationkey"), col("c_mktsegment"),
      expr("""(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
             | + 100000) div 100000""".stripMargin).as("band"))
    pairs
      .join(cust.select(col("c_name").as("w1"), col("c_custkey").as("key1"),
        col("c_nationkey").as("n1"), col("c_mktsegment").as("s1"),
        col("band").as("b1")), Seq("w1"))
      .join(cust.select(col("c_name").as("w2"), col("c_custkey").as("key2"),
        col("c_nationkey").as("n2"), col("c_mktsegment").as("s2"),
        col("band").as("b2")), Seq("w2"))
      .select(col("key1"), col("key2"),
        (lit(100000L)
          + when(col("n1") === col("n2"), 400000L).otherwise(0L)
          + when(col("s1") === col("s2"), 300000L).otherwise(0L)
          + when(col("b1") === col("b2"), 200000L).otherwise(0L)).as("score"))
      .withColumn("klass",
        when(col("score") >= 700000L, "link")
          .when(col("score") >= 400000L, "possible")
          .otherwise("non-link"))
      .orderBy("key1", "key2")
  }

  /** l-diversity audit — k-anonymity's necessary refinement (q208): a
    * class can be large yet still leak if everyone in it shares the
    * SENSITIVE value. QI = (nation, shifted balance band); sensitive =
    * market segment; flag classes whose distinct sensitive count < l=3
    * (65 of 272 classes at sf0.01 — a live gate). Two map-side-combined
    * hash aggs (distinct-per-class via the two-level (class, value) →
    * class rollup, no count-distinct shuffle explosion); output bounded
    * by violating classes.
    */
  val q214_l_diversity: QueryDef = q(
    "q214_l_diversity",
    """WITH qi AS (
      |  SELECT c_nationkey, c_mktsegment,
      |    CAST(floor((CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      + 100000) / 100000) AS BIGINT) AS band
      |  FROM customer),
      |cv AS (
      |  SELECT c_nationkey, band, c_mktsegment, CAST(count(*) AS BIGINT) AS n
      |  FROM qi GROUP BY 1, 2, 3),
      |cls AS (
      |  SELECT c_nationkey, band,
      |    CAST(sum(n) AS BIGINT) AS n_rows,
      |    CAST(count(*) AS BIGINT) AS n_sensitive
      |  FROM cv GROUP BY 1, 2)
      |SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey, band,
      |  n_rows, n_sensitive
      |FROM cls WHERE n_sensitive < 3
      |ORDER BY 1, 2""".stripMargin,
    "l-diversity audit (l=3): QI classes whose sensitive-value diversity " +
      "is too low to release — two-level rollup, no distinct shuffle") {
    (s, d) =>
      customer(s, d)
        .groupBy(col("c_nationkey").cast(LongType).as("c_nationkey"),
          expr("""(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
                 | + 100000) div 100000""".stripMargin).as("band"),
          col("c_mktsegment"))
        .agg(count(lit(1)).as("n"))
        .groupBy("c_nationkey", "band")
        .agg(sum("n").cast(LongType).as("n_rows"),
          count(lit(1)).as("n_sensitive"))
        .filter(col("n_sensitive") < 3)
        .orderBy("c_nationkey", "band")
  }

  /** Two-sample Kolmogorov–Smirnov distance between the two largest
    * sources' document-length distributions — the numeric drift test
    * (q136 is the token-frequency one): D = max over the merged value
    * axis of |F₁(v) − F₂(v)|, EXACT via cross-multiplied integer
    * cumulatives: d(v) = |c₁(v)·n₂ − c₂(v)·n₁| · 10⁶ / (n₁·n₂), floored
    * once at the end. Runs on the value domain: two per-source
    * histograms full-outer-merged (zeros filled), cumulative sums as
    * ONE window over the bounded merged axis. One row: both n's, the
    * max D in ppm, and the smallest value attaining it.
    */
  val q215_ks_test: QueryDef = q(
    "q215_ks_test",
    """WITH top2 AS (
      |  SELECT source, row_number() OVER (ORDER BY count(*) DESC, source)
      |    AS rk
      |  FROM documents GROUP BY source),
      |s1 AS (SELECT source FROM top2 WHERE rk = 1),
      |s2 AS (SELECT source FROM top2 WHERE rk = 2),
      |h AS (
      |  SELECT n_chars AS val,
      |    CAST(sum(CASE WHEN source = (SELECT source FROM s1) THEN 1 ELSE 0 END)
      |      AS BIGINT) AS c1,
      |    CAST(sum(CASE WHEN source = (SELECT source FROM s2) THEN 1 ELSE 0 END)
      |      AS BIGINT) AS c2
      |  FROM documents
      |  WHERE source IN ((SELECT source FROM s1), (SELECT source FROM s2))
      |  GROUP BY 1),
      |cum AS (
      |  SELECT val,
      |    sum(c1) OVER (ORDER BY val) AS f1,
      |    sum(c2) OVER (ORDER BY val) AS f2
      |  FROM h),
      |tot AS (SELECT sum(c1) AS n1, sum(c2) AS n2 FROM h),
      |dd AS (
      |  SELECT val,
      |    abs(CAST(f1 AS DECIMAL(38,0)) * (SELECT n2 FROM tot)
      |      - CAST(f2 AS DECIMAL(38,0)) * (SELECT n1 FROM tot)) AS num
      |  FROM cum)
      |SELECT CAST((SELECT n1 FROM tot) AS BIGINT) AS n1,
      |  CAST((SELECT n2 FROM tot) AS BIGINT) AS n2,
      |  CAST(CAST(floor((CAST(1000000 AS DECIMAL(38,0)) * max(num))
      |    / (CAST((SELECT n1 FROM tot) AS DECIMAL(38,0)) * (SELECT n2 FROM tot))) AS BIGINT)
      |    AS BIGINT) AS d_ppm,
      |  CAST(min(CASE WHEN num = (SELECT max(num) FROM dd) THEN val END)
      |    AS BIGINT) AS at_val
      |FROM dd""".stripMargin,
    "Two-sample KS distance between the two largest sources (doc-length " +
      "distributions): exact cross-multiplied integer cumulatives") {
    (s, d) =>
      val docs = Tables.documents(s, d)
      val top2 = docs.groupBy("source").agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("source")).limit(2)
        .select(col("source"), row_number().over(
          Window.orderBy(col("c").desc, col("source"))).as("rk"))
      val s1 = top2.filter(col("rk") === 1).select(col("source"))
      val s2 = top2.filter(col("rk") === 2).select(col("source").as("source2"))
      val h = docs
        .join(broadcast(s1.withColumnRenamed("source", "src1")), lit(true))
        .join(broadcast(s2), lit(true))
        .filter(col("source") === col("src1") || col("source") === col("source2"))
        .groupBy(col("n_chars").as("val"))
        .agg(sum(when(col("source") === col("src1"), 1L).otherwise(0L)).as("c1"),
          sum(when(col("source") === col("source2"), 1L).otherwise(0L)).as("c2"))
      val wv = Window.orderBy("val")
      val tot = h.agg(sum("c1").as("n1"), sum("c2").as("n2"))
      val dd = h
        .withColumn("f1", sum("c1").over(wv))
        .withColumn("f2", sum("c2").over(wv))
        .crossJoin(broadcast(tot))
        .select(col("val"), col("n1"), col("n2"),
          abs(col("f1").cast(DecimalType(38, 0)) * col("n2")
            - col("f2").cast(DecimalType(38, 0)) * col("n1")).as("num"))
      val mx = dd.agg(max("num").as("mnum"))
      dd.crossJoin(broadcast(mx))
        .groupBy("n1", "n2")
        .agg(
          expr("""CAST((CAST(1000000 AS DECIMAL(38,0)) * max(num))
                 | div (CAST(n1 AS DECIMAL(38,0)) * n2) AS BIGINT)"""
            .stripMargin).as("d_ppm"),
          min(when(col("num") === col("mnum"), col("val"))).cast(LongType)
            .as("at_val"))
        .select(col("n1").cast(LongType).as("n1"),
          col("n2").cast(LongType).as("n2"), col("d_ppm"), col("at_val"))
  }

  /** Top-k with OTHERS rollup — the BI report idiom: each nation's 3
    * highest-balance customers as named rows plus one aggregated
    * 'OTHER' row carrying the remainder, so the report is complete AND
    * bounded (4 rows per nation). Rank window partitions by nation;
    * exact integer cents.
    */
  val q216_topk_others: QueryDef = q(
    "q216_topk_others",
    """WITH r AS (
      |  SELECT c_nationkey, c_name,
      |    CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
      |    row_number() OVER (PARTITION BY c_nationkey
      |      ORDER BY CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
      |        DESC, c_custkey) AS rk
      |  FROM customer)
      |SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey, member,
      |  CAST(n AS BIGINT) AS n, CAST(cents AS BIGINT) AS cents
      |FROM (
      |  SELECT c_nationkey, c_name AS member, 1 AS n, cents
      |  FROM r WHERE rk <= 3
      |  UNION ALL
      |  SELECT c_nationkey, 'OTHER', count(*), sum(cents)
      |  FROM r WHERE rk > 3 GROUP BY c_nationkey)
      |ORDER BY c_nationkey, n, member""".stripMargin,
    "Top-3 per nation + OTHER rollup: the complete-but-bounded BI " +
      "report shape, exact integer cents") { (s, d) =>
    val r = customer(s, d)
      .select(col("c_nationkey").cast(LongType).as("c_nationkey"),
        col("c_name"), col("c_custkey"),
        (dec2(col("c_acctbal")) * 100).cast(LongType).as("cents"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("c_nationkey")
          .orderBy(col("cents").desc, col("c_custkey"))))
    r.filter(col("rk") <= 3)
      .select(col("c_nationkey"), col("c_name").as("member"),
        lit(1L).as("n"), col("cents"))
      .unionAll(
        r.filter(col("rk") > 3)
          .groupBy("c_nationkey")
          .agg(count(lit(1)).as("n"), sum("cents").cast(LongType).as("cents"))
          .select(col("c_nationkey"), lit("OTHER").as("member"),
            col("n"), col("cents")))
      .orderBy("c_nationkey", "n", "member")
  }

  /** Theta-sketch SET operations ([[graft.functions.ThetaAggregator]]) —
    * the audience-overlap report HLL cannot express: theta sketches
    * retain a k-th-minimum-value hash sample, so two segment sketches
    * answer |A∩B| and |A∖B|, not just the union. Segments: orderkeys
    * with a returned line (A) vs orderkeys with a completed line (B) —
    * ~11k/13k distinct with ~10k overlap at sf0.01, real estimation
    * territory for nominal k=4096. One corpus pass builds both sketches
    * (membership-tag explode → 2-group hash agg; only kilobyte compact
    * images cross the shuffle); the set algebra then runs between the
    * two collected kilobyte states (the documented sketch-sized collect,
    * q84/q150's contract). The gate is the sketch's own standard-error
    * interval at 3σ — exact COUNT(DISTINCT) must fall inside
    * [lb(3), ub(3)] for every one of the five estimates; the oracle
    * pins the exact counts and the always-on gate flags.
    */
  val q270_theta_set_ops: QueryDef = q(
    "q270_theta_set_ops",
    """WITH f AS (
      |  SELECT l_orderkey,
      |    max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS a,
      |    max(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END) AS b
      |  FROM lineitem GROUP BY 1)
      |SELECT set_op, exact_n, CAST(1 AS BIGINT) AS within_bounds
      |FROM (
      |  SELECT 'a' AS set_op, CAST(SUM(a) AS BIGINT) AS exact_n FROM f
      |  UNION ALL SELECT 'b', CAST(SUM(b) AS BIGINT) FROM f
      |  UNION ALL SELECT 'union', CAST(COUNT(*) AS BIGINT) FROM f
      |    WHERE a = 1 OR b = 1
      |  UNION ALL SELECT 'intersect', CAST(COUNT(*) AS BIGINT) FROM f
      |    WHERE a = 1 AND b = 1
      |  UNION ALL SELECT 'a_not_b', CAST(COUNT(*) AS BIGINT) FROM f
      |    WHERE a = 1 AND b = 0) t
      |ORDER BY set_op""".stripMargin,
    "Theta-sketch set operations: segment sketches built in one pass, " +
      "A∪B / A∩B / A∖B estimated between kilobyte states, every " +
      "estimate 3σ-bound-gated vs exact COUNT(DISTINCT)") { (s, d) =>
    import graft.functions.ThetaSketch
    val nom = 4096
    val li = lineitem(s, d).select(
      col("l_orderkey").cast(LongType).as("k"),
      (col("l_returnflag") === "R").as("ina"),
      (col("l_linestatus") === "F").as("inb"))
    val theta = udaf(graft.functions.ThetaAggregator(nom),
      org.apache.spark.sql.Encoders.scalaLong)
    val sks = li
      .select(col("k"), explode(array(
        when(col("ina"), "a"), when(col("inb"), "b"))).as("seg"))
      .filter(col("seg").isNotNull)
      .groupBy("seg").agg(theta(col("k")).as("sk"))
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    val (skA, skB) = (sks("a"), sks("b"))
    val ests: Seq[(String, (Double, Double))] = Seq(
      "a" -> ThetaSketch.fromBytes(skA),
      "b" -> ThetaSketch.fromBytes(skB),
      "union" -> ThetaSketch.union(Seq(skA, skB), nom),
      "intersect" -> ThetaSketch.intersect(skA, skB),
      "a_not_b" -> ThetaSketch.aNotB(skA, skB)
    ).map { case (n, sk) =>
      val (_, lb, ub) = ThetaSketch.bounds(sk, 3); n -> (lb, ub)
    }
    val flags = li.groupBy("k").agg(
      max(when(col("ina"), 1L).otherwise(0L)).as("a"),
      max(when(col("inb"), 1L).otherwise(0L)).as("b"))
    val exact = flags.agg(
      sum("a").as("ea"), sum("b").as("eb"),
      sum(when(col("a") === 1 || col("b") === 1, 1L).otherwise(0L)).as("eu"),
      sum(when(col("a") === 1 && col("b") === 1, 1L).otherwise(0L)).as("ei"),
      sum(when(col("a") === 1 && col("b") === 0, 1L).otherwise(0L)).as("ed"))
    val exCol = Map("a" -> "ea", "b" -> "eb", "union" -> "eu",
      "intersect" -> "ei", "a_not_b" -> "ed")
    exact.select(explode(array(ests.map { case (n, (lb, ub)) =>
        struct(lit(n).as("set_op"),
          col(exCol(n)).cast(LongType).as("exact_n"),
          when(col(exCol(n)).between(lit(lb), lit(ub)), 1L).otherwise(0L)
            .as("within_bounds"))
      }: _*)).as("r"))
      .select("r.*")
      .orderBy("set_op")
  }

  /** 3-D skyline ([[graft.ops.Skyline.skyline3d]]): the lineitems no
    * other lineitem beats on ALL of price band (cheaper-or-equal),
    * quantity (more-or-equal) and discount (more-or-equal), at least
    * one strict — q181's frontier lifted to three criteria, where the
    * sweep needs a real Pareto frontier structure (TreeMap of (y, z)
    * maxima, one ceiling lookup per row) instead of a running max.
    * Price is banded to $500 so the oracle's quadratic NOT EXISTS runs
    * over DISTINCT triples (≤ bands × qty × disc values, thousands) —
    * the ENGINE still sweeps every row and returns per-triple
    * survivor counts. No window, no pair join in the engine plan.
    */
  val q276_skyline_3d: QueryDef = q(
    "q276_skyline_3d",
    """WITH li AS (
      |  SELECT CAST(floor(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
      |      AS BIGINT) / 50000) AS BIGINT) AS price_band,
      |    CAST(l_quantity AS BIGINT) AS qty,
      |    CAST(CAST(l_discount AS DECIMAL(18,4)) * 10000 AS BIGINT)
      |      AS disc_bp
      |  FROM lineitem
      |  WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
      |    AND l_discount IS NOT NULL),
      |d AS (SELECT price_band, qty, disc_bp, CAST(count(*) AS BIGINT) AS n
      |  FROM li GROUP BY 1, 2, 3),
      |sky AS (
      |  SELECT * FROM d s WHERE NOT EXISTS (
      |    SELECT 1 FROM d r
      |    WHERE r.price_band <= s.price_band AND r.qty >= s.qty
      |      AND r.disc_bp >= s.disc_bp
      |      AND (r.price_band < s.price_band OR r.qty > s.qty
      |           OR r.disc_bp > s.disc_bp)))
      |SELECT price_band, qty, disc_bp, n FROM sky
      |ORDER BY price_band, qty, disc_bp""".stripMargin,
    "3-D skyline (min price band, max quantity, max discount): " +
      "two-phase frontier sweep, window-free and pair-join-free; " +
      "quadratic NOT EXISTS oracle over distinct triples") { (s, d) =>
    val li = lineitem(s, d)
      .filter(col("l_extendedprice").isNotNull &&
        col("l_quantity").isNotNull && col("l_discount").isNotNull)
      .select(
        expr("""CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
               | AS BIGINT) div 50000""".stripMargin).as("price_band"),
        col("l_quantity").cast(LongType).as("qty"),
        expr("CAST(CAST(l_discount AS DECIMAL(18,4)) * 10000 AS BIGINT)")
          .as("disc_bp"))
    graft.ops.Skyline.skyline3d(li, "price_band", "qty", "disc_bp")
      .groupBy("price_band", "qty", "disc_bp")
      .agg(count(lit(1)).as("n"))
      .orderBy("price_band", "qty", "disc_bp")
  }

  /** Merkle-style replica diff ([[graft.ops.Audit.merkleBucketDiff]]):
    * replica B of orders diverges deterministically — keys ≡5 mod 103
    * deleted (`only_a`), prices of keys ≡7 mod 101 bumped one cent
    * (`modified`), clones of keys ≡3 mod 107 inserted above max key
    * (`only_b`, q193's offset rule). The engine exchanges only 256
    * bucket digests (count + bit_xor + sum of md5-derived row digests)
    * and re-scans row-level ONLY the mismatched buckets; the oracle
    * derives the diverging key set directly from the divergence rules,
    * so a digest scheme that misses a bucket (xor compensation) or a
    * rescan that drops/duplicates keys hash-fails the per-type
    * (n_keys, Σkeys) digest and the mismatched-bucket count.
    */
  val q277_merkle_diff: QueryDef = q(
    "q277_merkle_diff",
    """WITH mk AS (SELECT max(o_orderkey) AS mk FROM orders),
      |divg AS (
      |  SELECT o_orderkey AS k FROM orders WHERE o_orderkey % 103 = 5
      |  UNION ALL
      |  SELECT o_orderkey FROM orders
      |  WHERE o_orderkey % 101 = 7 AND o_orderkey % 103 <> 5
      |  UNION ALL
      |  SELECT o_orderkey + (SELECT mk FROM mk) + 1 FROM orders
      |  WHERE o_orderkey % 107 = 3),
      |typed AS (
      |  SELECT 'only_a' AS diff_type, o_orderkey AS k FROM orders
      |  WHERE o_orderkey % 103 = 5
      |  UNION ALL
      |  SELECT 'modified', o_orderkey FROM orders
      |  WHERE o_orderkey % 101 = 7 AND o_orderkey % 103 <> 5
      |  UNION ALL
      |  SELECT 'only_b', o_orderkey + (SELECT mk FROM mk) + 1 FROM orders
      |  WHERE o_orderkey % 107 = 3)
      |SELECT diff_type, CAST(count(*) AS BIGINT) AS n_keys,
      |  CAST(sum(k) AS BIGINT) AS sum_keys
      |FROM typed GROUP BY 1
      |UNION ALL
      |SELECT '_buckets_mismatched',
      |  CAST(count(DISTINCT k % 256) AS BIGINT),
      |  CAST(256 AS BIGINT)
      |FROM divg
      |ORDER BY diff_type""".stripMargin,
    "Merkle bucket diff between two replicas: O(buckets) digest " +
      "exchange + mismatched-bucket rescan only; per-type key digests " +
      "vs the divergence rules") { (s, d) =>
    val o = Tables.orders(s, d).select(col("o_orderkey"),
      expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
        .as("cents"))
    val mk = o.agg(max("o_orderkey").as("mk"))
    val b = o.filter(col("o_orderkey") % 103 =!= 5)
      .withColumn("cents",
        when(col("o_orderkey") % 101 === 7, col("cents") + 1)
          .otherwise(col("cents")))
      .unionByName(o.filter(col("o_orderkey") % 107 === 3)
        .crossJoin(broadcast(mk))
        .select((col("o_orderkey") + col("mk") + 1).as("o_orderkey"),
          col("cents")))
    val digest = expr("""CAST(conv(substring(md5(concat(
      |CAST(o_orderkey AS STRING), ':', CAST(cents AS STRING))), 1, 15),
      |16, 10) AS BIGINT)""".stripMargin)
    // Ckpt.stage, not persist: diff feeds two aggregates below and the
    // result is returned lazily (no unpersist point) — see [[Ckpt]]
    val diff = graft.ops.Ckpt.stage(graft.ops.Audit.merkleBucketDiff(
      o, b, "o_orderkey", digest, 256))
    diff.groupBy("diff_type")
      .agg(count(lit(1)).as("n_keys"), sum("k").cast(LongType).as("sum_keys"))
      .unionByName(diff.agg(
        countDistinct("bucket").cast(LongType).as("n_keys"))
        .select(lit("_buckets_mismatched").as("diff_type"), col("n_keys"),
          lit(256L).as("sum_keys")))
      .orderBy("diff_type")
  }

  /** BITMAP-index filtering — the warehouse technique for multi-predicate
    * selection over a dense row-id space: each predicate compiles to a
    * bitmap (one 64-bit word per 64 row ids, built with a
    * map-side-combinable `bit_or` of shifted bits), and every boolean
    * combination is then word-wise bit algebra + popcount over the
    * BITMAP table (rows/64 words), never a corpus re-scan per
    * combination. Seven combinations (including AND-NOT) are answered
    * from ONE three-way full-outer word join; the oracle computes every
    * count DIRECTLY from the predicates, so any bit lost or aliased by
    * the bitmap build/algebra hash-fails. At 100 TB the bitmap table is
    * the reusable index artifact: predicates are built once, arbitrary
    * combinations cost popcounts over words.
    */
  val q287_bitmap_index: QueryDef = q(
    "q287_bitmap_index",
    """WITH ev AS (
      |  SELECT event_type,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
      |    CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day
      |  FROM events)
      |SELECT * FROM (
      |  SELECT 'p1' AS expr, CAST(count(*) AS BIGINT) AS n FROM ev
      |    WHERE event_type = 'click'
      |  UNION ALL SELECT 'p2', CAST(count(*) AS BIGINT) FROM ev
      |    WHERE cents >= 10000
      |  UNION ALL SELECT 'p3', CAST(count(*) AS BIGINT) FROM ev
      |    WHERE day % 7 = 2
      |  UNION ALL SELECT 'p1_and_p2', CAST(count(*) AS BIGINT) FROM ev
      |    WHERE event_type = 'click' AND cents >= 10000
      |  UNION ALL SELECT 'p1_or_p3', CAST(count(*) AS BIGINT) FROM ev
      |    WHERE event_type = 'click' OR day % 7 = 2
      |  UNION ALL SELECT 'p1_and_p2_and_p3', CAST(count(*) AS BIGINT)
      |    FROM ev WHERE event_type = 'click' AND cents >= 10000
      |      AND day % 7 = 2
      |  UNION ALL SELECT 'p1_and_not_p3', CAST(count(*) AS BIGINT)
      |    FROM ev WHERE event_type = 'click' AND NOT day % 7 = 2) t
      |ORDER BY expr""".stripMargin,
    "Bitmap-index multi-predicate filtering: per-predicate word bitmaps " +
      "(bit_or of shifted bits), boolean combinations as word algebra + " +
      "popcount — counts proven against direct predicate evaluation") {
    (s, d) =>
    val ev = Tables.events(s, d).select(
      expr("event_id div 64").as("word"),
      expr("CAST(event_id % 64 AS INT)").as("bit"),
      (col("event_type") === "click").as("c1"),
      (expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)") >= 10000L)
        .as("c2"),
      (expr("ts_sec div 86400") % 7 === 2).as("c3"))
    def bm(flag: String, out: String) = ev.filter(col(flag))
      .groupBy("word")
      .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), bit))").as(out))
    val j = bm("c1", "w1")
      .join(bm("c2", "w2"), Seq("word"), "full_outer")
      .join(bm("c3", "w3"), Seq("word"), "full_outer")
      .select(coalesce(col("w1"), lit(0L)).as("w1"),
        coalesce(col("w2"), lit(0L)).as("w2"),
        coalesce(col("w3"), lit(0L)).as("w3"))
    val agg = j.agg(
      sum(expr("bit_count(w1)")).as("p1"),
      sum(expr("bit_count(w2)")).as("p2"),
      sum(expr("bit_count(w3)")).as("p3"),
      sum(expr("bit_count(w1 & w2)")).as("p1_and_p2"),
      sum(expr("bit_count(w1 | w3)")).as("p1_or_p3"),
      sum(expr("bit_count(w1 & w2 & w3)")).as("p1_and_p2_and_p3"),
      sum(expr("bit_count(w1 & ~w3)")).as("p1_and_not_p3"))
    val names = Seq("p1", "p2", "p3", "p1_and_p2", "p1_or_p3",
      "p1_and_p2_and_p3", "p1_and_not_p3")
    agg.select(explode(array(names.map(n =>
        struct(lit(n).as("expr"), col(n).cast(LongType).as("n"))): _*))
        .as("r"))
      .select("r.*")
      .orderBy("expr")
  }

  /** Exact WEIGHTED median — the price level that splits shipped
    * QUANTITY (not row count) in half, per returnflag: the weighted
    * generalization of q45's discrete median, on the value-domain
    * histogram with WEIGHT sums (Σ qty per distinct price) instead of
    * counts. Threshold = ⌈W/2⌉ = (W+1) div 2 over the cumulative weight
    * — one hash agg + one bounded window over distinct prices + one
    * conditional min; no row sort anywhere.
    */
  val q291_weighted_median: QueryDef = q(
    "q291_weighted_median",
    """WITH li AS (
      |  SELECT l_returnflag AS rf,
      |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      AS price_cents,
      |    CAST(l_quantity AS BIGINT) AS w
      |  FROM lineitem
      |  WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL),
      |gv AS (SELECT rf, price_cents, CAST(sum(w) AS BIGINT) AS m
      |       FROM li GROUP BY 1, 2),
      |tot AS (SELECT rf, CAST(sum(m) AS BIGINT) AS tw FROM gv GROUP BY 1),
      |cum AS (
      |  SELECT g.rf, g.price_cents, t.tw,
      |    sum(g.m) OVER (PARTITION BY g.rf ORDER BY g.price_cents) AS cw
      |  FROM gv g JOIN tot t ON t.rf = g.rf)
      |SELECT rf, CAST(max(tw) AS BIGINT) AS total_weight,
      |  CAST(min(CASE WHEN cw >= CAST(floor((tw + 1) / 2) AS BIGINT) THEN price_cents END)
      |    AS BIGINT) AS weighted_median_cents
      |FROM cum GROUP BY 1 ORDER BY rf""".stripMargin,
    "Exact weighted median (price splitting shipped quantity in half) " +
      "per returnflag: weight-histogram + cumulative over distinct " +
      "prices — no row sort") { (s, d) =>
    val li = lineitem(s, d)
      .filter(col("l_extendedprice").isNotNull &&
        col("l_quantity").isNotNull)
      .select(col("l_returnflag").as("rf"),
        expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
          .as("price_cents"),
        col("l_quantity").cast(LongType).as("w"))
    val gv = li.groupBy("rf", "price_cents").agg(sum("w").as("m"))
    val tot = gv.groupBy("rf").agg(sum("m").as("tw"))
    val wv = Window.partitionBy("rf").orderBy("price_cents")
    gv.withColumn("cw", sum("m").over(wv))
      .join(tot, Seq("rf"))
      .groupBy("rf")
      .agg(max("tw").cast(LongType).as("total_weight"),
        min(when(col("cw") >= expr("(tw + 1) div 2"), col("price_cents")))
          .cast(LongType).as("weighted_median_cents"))
      .orderBy("rf")
  }

  def defs: Seq[QueryDef] = Seq(
    q287_bitmap_index, q291_weighted_median,
    q276_skyline_3d, q277_merkle_diff,
    q270_theta_set_ops,
    q181_skyline, q199_golden_record, q200_quantile_normalize,
    q203_bucketed_join, q204_equi_depth_histogram, q208_kanonymity,
    q209_pseudonymize, q212_record_linkage, q214_l_diversity, q236_dp_release,
    q257_dp_mean, q300_dp_quantiles, q303_dp_topk, q308_privacy_ledger,
    q215_ks_test, q216_topk_others,
    q45_median_disc, q46_string_funcs, q47_datetime_funcs, q48_null_semantics,
    q49_correlated_agg, q50_running_sum, q65_pivot_events, q66_cube_qty,
    q69_rank_family, q75_approx_quantile, q84_cms_heavy_hitters,
    q87_hll_union, q89_grouping_sets, q90_range_window,
    q171_sketch_rollup, q172_hierarchy_closure, q174_table_stats, q177_ratio_to_report,
    q150_kll_quantile_merge)
}

/** SQL texts shared verbatim between the Spark side (over temp views named
  * like the oracle tables) and the DuckDB oracle — both engines parse the
  * same string, so the queries cannot drift apart.
  */
object AdvancedSqlTexts {
  val groupingSets: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(grouping(l_returnflag) AS BIGINT) AS g_rf,
      |  CAST(grouping(l_linestatus) AS BIGINT) AS g_ls,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  COUNT(*) AS n
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),
      |                        (l_returnflag, l_linestatus))
      |ORDER BY g_rf, g_ls,
      |  l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin
}
