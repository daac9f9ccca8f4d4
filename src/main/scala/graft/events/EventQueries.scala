package graft.events

import graft.QueryDef
import graft.relational.{Sql, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sequence / event-stream operators over the `events` table. These carry
  * the reference's order-sensitive chat semantics (SURVEY.md §2.4 J1–J3,
  * §2.5 A1/A2, §2.6 L1) onto oracle-checkable data: lag, consecutive-pair
  * interaction graphs, first-per-key, sessionization.
  *
  * Ordering contract: `ts_ns` (raw nanos, see Tables.events) + `event_id`
  * tiebreak — bit-identical to DuckDB's `ORDER BY ts, event_id`. Outputs
  * only expose floor-to-second values so precision never diverges.
  *
  * Scale notes: all windows partition by `user_id` (high cardinality)
  * except the global interaction sequence, whose 100 TB variant partitions
  * by conversation/file key exactly like the chat engine (graft.chat).
  */
object EventQueries {
  import Sql._

  private def q(name: String, oracle: String, doc: String = "")(
      fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, Some(oracle), doc)

  private val wUser = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")

  /** Canonical undirected weighted interaction edges, built ONCE per
    * (session, dir) and checkpointed — [[graft.ops.Graph.fromEvents]]
    * owns the kernel (and the `ts_ns` + `event_id` ordering contract)
    * since round 7, so q11/q73/q74/q98/q99 share a single GlobalLag
    * corpus scan instead of each paying their own.
    */
  private def weightedEdges(s: SparkSession, d: String): DataFrame =
    graft.ops.Graph.fromEvents(s, d)

  /** DuckDB mirror of [[weightedEdges]] as a CTE prefix: the interaction
    * graph (canonical undirected pairs + interaction-count weight) from
    * the lag-over-global-order sequence.
    */
  private val edgesSql =
    """WITH seq AS (
      |  SELECT user_id, lag(user_id) OVER (ORDER BY ts, event_id) AS prev
      |  FROM events),
      |we AS (
      |  SELECT LEAST(prev, user_id) AS a, GREATEST(prev, user_id) AS b,
      |    count(*) AS weight
      |  FROM seq WHERE prev IS NOT NULL AND prev <> user_id
      |  GROUP BY 1, 2)""".stripMargin

  /** Unrolled power-iteration CTE chain `i1..i{iters}` for the PageRank
    * oracles (the q77 floor-ppm pattern extended to an iterative
    * algorithm): each generation is the EXACT SQL transliteration of one
    * Spark iteration — same expression tree (`base + d · Σ contrib`),
    * same IEEE double ops — so per-node ranks agree to far below the ppm
    * floor. `g` must provide (s, t, outdeg) [unweighted: contrib =
    * pr/outdeg] or (s, t, w, strength) [weighted: contrib =
    * pr·w/strength]; `prm` provides the double constants. All arithmetic
    * is forced to DOUBLE — DuckDB would otherwise read `0.85` as
    * DECIMAL(3,2) and compute exact-decimal intermediates that drift
    * from Spark's binary doubles.
    */
  private def prIterSql(iters: Int, contrib: String,
      restart: String = "(SELECT base FROM prm)"): String =
    (1 to iters).map { k =>
      s"""i$k AS (
         |  SELECT g.t AS v,
         |    $restart + (SELECT dmp FROM prm) * sum($contrib) AS pr
         |  FROM g JOIN i${k - 1} r ON r.v = g.s GROUP BY g.t)""".stripMargin
    }.mkString(",\n")

  /** Unrolled peel rounds `e1/deg1/alive1 .. aliveR` for the q121 k-core
    * oracle: round t keeps nodes whose degree restricted to round t-1's
    * survivors reaches the threshold. Pure integer arithmetic — rounds
    * beyond the fixpoint are identities, which is what makes the engine's
    * early exit oracle-safe.
    */
  private def kcoreRoundSql(rounds: Int): String =
    // AS MATERIALIZED on every multiply-referenced generation: each e$t
    // reads alive{t-1} twice and each deg$t reads e$t twice, so an
    // inlining planner re-evaluates the base window-over-events 4^t times
    // — at sf0.1 the un-hinted form spilled >70 GB of DuckDB temp before
    // dying. Materialization makes the oracle linear in rounds (the
    // engine side always was: each round's frames are checkpointed).
    (1 to rounds).map { t =>
      s"""e$t AS MATERIALIZED (
         |  SELECT e.a, e.b FROM e
         |  JOIN alive${t - 1} x ON x.v = e.a
         |  JOIN alive${t - 1} y ON y.v = e.b),
         |deg$t AS MATERIALIZED (
         |  SELECT v, count(*) AS cnt
         |  FROM (SELECT a AS v FROM e$t UNION ALL SELECT b AS v FROM e$t)
         |  GROUP BY v),
         |alive$t AS MATERIALIZED (SELECT v FROM deg$t WHERE cnt >= (SELECT k FROM kp))""".stripMargin
    }.mkString(",\n")

  /** Unrolled LPA generations `v1/l1 .. v{R}/l{R}` for the q137 oracle:
    * round t's votes aggregate edge weight per (node, neighbor label
    * from round t-1), and the new label is the argmax with ties toward
    * the SMALLEST label — replayed here as max-weight filter + MIN(lbl),
    * the exact relational form of the engine's `max(struct(wsum, −lbl))`.
    * AS MATERIALIZED throughout (each v$t is read twice; see the q121
    * spill note).
    */
  private def lpaRoundSql(rounds: Int): String =
    (1 to rounds).map { t =>
      s"""v$t AS MATERIALIZED (
         |  SELECT g.t AS v, l.lbl, SUM(g.w) AS wsum
         |  FROM g JOIN l${t - 1} l ON l.v = g.s
         |  GROUP BY g.t, l.lbl),
         |l$t AS MATERIALIZED (
         |  SELECT a.v, MIN(a.lbl) AS lbl
         |  FROM v$t a JOIN (SELECT v, MAX(wsum) AS mw FROM v$t GROUP BY v) m
         |    ON m.v = a.v AND a.wsum = m.mw
         |  GROUP BY a.v)""".stripMargin
    }.mkString(",\n")

  val q10_window_lag: QueryDef = q(
    "q10_window_lag",
    """SELECT event_id, user_id, prev_type, gap_s FROM (
      |  SELECT event_id, user_id,
      |    lag(event_type) OVER w AS prev_type,
      |    CAST(floor(epoch(ts)) AS BIGINT) - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) AS gap_s
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)) t
      |WHERE prev_type IS NOT NULL
      |ORDER BY event_id""".stripMargin,
    "lag() per user (J1 analog): previous event type + gap seconds") { (s, d) =>
    Tables.events(s, d)
      .withColumn("prev_type", lag("event_type", 1).over(wUser))
      .withColumn("gap_s", col("ts_sec") - lag("ts_sec", 1).over(wUser))
      .filter(col("prev_type").isNotNull)
      .select("event_id", "user_id", "prev_type", "gap_s")
      .orderBy("event_id")
  }

  val q11_interaction_graph: QueryDef = q(
    "q11_interaction_graph",
    """WITH seq AS (
      |  SELECT user_id, lag(user_id) OVER (ORDER BY ts, event_id) AS prev
      |  FROM events)
      |SELECT LEAST(prev, user_id) AS source, GREATEST(prev, user_id) AS target,
      |  COUNT(*) AS weight
      |FROM seq
      |WHERE prev IS NOT NULL AND prev <> user_id
      |GROUP BY 1, 2
      |ORDER BY source, target""".stripMargin,
    "Reference flagship (J1+J2+A2): consecutive distinct actors → canonical " +
      "undirected weighted edges. Global sequence via the range-partitioned " +
      "lag (ops.GlobalLag) — no single-task window at any scale.") {
    (s, d) => weightedEdges(s, d).orderBy("source", "target")
  }

  val q12_distinct_users: QueryDef = q(
    "q12_distinct_users",
    """SELECT DISTINCT user_id FROM events ORDER BY user_id""",
    "Distinct node set (A1 analog)") { (s, d) =>
    Tables.events(s, d).select("user_id").distinct().orderBy("user_id")
  }

  val q15_case_agg: QueryDef = q(
    "q15_case_agg",
    """SELECT user_id,
      |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS purchase_value,
      |  COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS n_errors,
      |  COUNT(*) AS n_events
      |FROM events
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin,
    "Conditional aggregation (pivot-style CASE inside agg)") { (s, d) =>
    Tables.events(s, d)
      .groupBy("user_id")
      .agg(
        sum(when(col("event_type") === "purchase", dec2(col("value")))
          .otherwise(lit(0).cast(dec2t))).cast(DoubleType).as("purchase_value"),
        count(when(col("event_type") === "error", lit(1))).as("n_errors"),
        count(lit(1)).as("n_events"))
      .orderBy("user_id")
  }

  val q19_first_event: QueryDef = q(
    "q19_first_event",
    """SELECT user_id, event_type AS first_type FROM (
      |  SELECT user_id, event_type,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      |  FROM events) t
      |WHERE rn = 1
      |ORDER BY user_id""".stripMargin,
    "First-per-key by event order (J3 analog: first matched sender)") { (s, d) =>
    Tables.events(s, d)
      .withColumn("rn", row_number().over(wUser))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type").as("first_type"))
      .orderBy("user_id")
  }

  val q20_sessionize: QueryDef = q(
    "q20_sessionize",
    """WITH g AS (
      |  SELECT user_id,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR CAST(floor(epoch(ts)) AS BIGINT) - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) > 1800
      |         THEN 1 ELSE 0 END AS is_new
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      |SELECT user_id, CAST(SUM(is_new) AS BIGINT) AS n_sessions, COUNT(*) AS n_events
      |FROM g
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin,
    "Gaps-and-islands sessionization: 30-min inactivity starts a session") {
    (s, d) =>
      val prevSec = lag("ts_sec", 1).over(wUser)
      Tables.events(s, d)
        .withColumn("is_new",
          when(prevSec.isNull || col("ts_sec") - prevSec > 1800, lit(1)).otherwise(lit(0)))
        .groupBy("user_id")
        .agg(sum("is_new").cast(LongType).as("n_sessions"), count(lit(1)).as("n_events"))
        .orderBy("user_id")
  }

  val q22_daily_type_counts: QueryDef = q(
    "q22_daily_type_counts",
    """SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day, event_type, COUNT(*) AS n
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY day, event_type""".stripMargin,
    "Time-bucketed counts (tumbling daily window, batch form); day emitted " +
      "as ISO string so both engines hash identically") { (s, d) =>
    Tables.events(s, d)
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy("day", "event_type")
  }

  val q23_regex_extract: QueryDef = q(
    "q23_regex_extract",
    """SELECT event_id, CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) AS k
      |FROM events
      |WHERE regexp_matches(props, '"k": (\d+)')
      |ORDER BY event_id""".stripMargin,
    "Regex group extraction from semi-structured payload (F3/P5 analog)") {
    (s, d) =>
      Tables.events(s, d)
        .filter(col("props").rlike("\"k\": (\\d+)"))
        .select(
          col("event_id"),
          regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast(LongType).as("k"))
        .orderBy("event_id")
  }

  /** The reference's exact sender-normalization chain (P1–P4,
    * backend/main.py:294-310 in /root/reference) applied to synthesized
    * chat-shaped lines, so the parse dialect itself is oracle-checked:
    * split-on-"] ", text-before-first-colon, strip ~ both ends, remove
    * every U+0020, trim.
    */
  val q24_chat_parse: QueryDef = q(
    "q24_chat_parse",
    """WITH lines AS (
      |  SELECT event_id,
      |    '[7.10.2023, 19:43:25] ~ user ' || CAST(user_id AS STRING) || ' ~: did ' || event_type AS line
      |  FROM events)
      |SELECT event_id,
      |  trim(regexp_replace(regexp_replace(string_split(string_split(line, '] ')[2], ':')[1], '^~+|~+$', '', 'g'), ' ', '', 'g')) AS sender,
      |  strftime(CAST(strptime(regexp_extract(line, '^\[([^,\]]+)', 1), '%d.%m.%Y') AS DATE), '%Y-%m-%d') AS msg_date
      |FROM lines
      |ORDER BY event_id""".stripMargin,
    "P1–P4 parse chain parity: sender normalization + d.M.yyyy date parse") {
    (s, d) =>
      Tables.events(s, d)
        .withColumn("line",
          concat(lit("[7.10.2023, 19:43:25] ~ user "), col("user_id").cast(StringType),
            lit(" ~: did "), col("event_type")))
        .select(
          col("event_id"),
          trim(regexp_replace(
            regexp_replace(
              element_at(split(element_at(split(col("line"), "\\] ", 2), 2), ":"), 1),
              "^~+|~+$", ""),
            " ", "")).as("sender"),
          date_format(to_date(regexp_extract(col("line"), "^\\[([^,\\]]+)", 1), "d.M.yyyy"),
            "yyyy-MM-dd").as("msg_date"))
        .orderBy("event_id")
  }

  /** F9/F10/P10/P11 over the interaction graph: substring-filter nodes,
    * keep links whose BOTH endpoints survive (left_semi ×2), √weight width.
    */
  val q39_graph_filter: QueryDef = q(
    "q39_graph_filter",
    """WITH seq AS (
      |  SELECT user_id, lag(user_id) OVER (ORDER BY ts, event_id) AS prev
      |  FROM events),
      |links AS (
      |  SELECT LEAST(prev, user_id) AS source, GREATEST(prev, user_id) AS target,
      |    COUNT(*) AS weight
      |  FROM seq WHERE prev IS NOT NULL AND prev <> user_id GROUP BY 1, 2),
      |keep AS (
      |  SELECT DISTINCT user_id AS id FROM events
      |  WHERE contains(lower(CAST(user_id AS STRING)), '1'))
      |SELECT source, target, weight, sqrt(weight) AS width
      |FROM links
      |WHERE EXISTS (SELECT 1 FROM keep WHERE id = source)
      |  AND EXISTS (SELECT 1 FROM keep WHERE id = target)
      |ORDER BY source, target""".stripMargin,
    "Graph node/link filter (F9/F10) + render scalars (P10/P11)") { (s, d) =>
    val links = weightedEdges(s, d)
    val keep = Tables.events(s, d).select(col("user_id").as("id")).distinct()
      .filter(lower(col("id").cast(StringType)).contains("1"))
    links
      .join(keep.select(col("id").as("source")), Seq("source"), "left_semi")
      .join(keep.select(col("id").as("target")), Seq("target"), "left_semi")
      .withColumn("width", sqrt(col("weight")))
      .orderBy("source", "target")
  }

  /** As-of join (ops.AsOf): each purchase matched to the user's latest
    * prior-or-equal click. Oracle uses DuckDB's native ASOF JOIN — a
    * strong differential check of the composite implementation.
    */
  val q42_asof_join: QueryDef = q(
    "q42_asof_join",
    """SELECT p.event_id, p.user_id, c.event_id AS click_id,
      |  CAST(floor(epoch(p.ts)) AS BIGINT) - CAST(floor(epoch(c.ts)) AS BIGINT) AS gap_s
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c
      |  ON p.user_id = c.user_id AND p.ts >= c.ts
      |ORDER BY p.event_id""".stripMargin,
    "As-of join (operator Spark lacks): union + running-last window, 1 shuffle") {
    (s, d) =>
      val ev = Tables.events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts_ns", "ts_sec")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("c_event_id"), col("user_id"),
          col("ts_ns"), col("ts_sec").as("c_sec"))
      graft.ops.AsOf.joinAsOf(purchases, clicks, "user_id", "ts_ns", "ts_ns",
          Seq("c_event_id", "c_sec"))
        .select(col("event_id"), col("user_id"),
          col("asof_c_event_id").as("click_id"),
          (col("ts_sec") - col("asof_c_sec")).as("gap_s"))
        .orderBy("event_id")
  }

  /** Interval join (ops.RangeJoin): same-user event pairs within 60 s.
    * Oracle is the plain inequality join (DuckDB IEJoin); Spark side uses
    * the bucketized equi-join rewrite.
    */
  val q43_interval_join: QueryDef = q(
    "q43_interval_join",
    """SELECT a.event_id AS id_a, b.event_id AS id_b,
      |  CAST(floor(epoch(b.ts)) AS BIGINT) - CAST(floor(epoch(a.ts)) AS BIGINT) AS gap_s
      |FROM events a JOIN events b ON a.user_id = b.user_id
      |  AND CAST(floor(epoch(b.ts)) AS BIGINT) > CAST(floor(epoch(a.ts)) AS BIGINT)
      |  AND CAST(floor(epoch(b.ts)) AS BIGINT) <= CAST(floor(epoch(a.ts)) AS BIGINT) + 60
      |ORDER BY id_a, id_b""".stripMargin,
    "Interval join via bucketized equi-join (no nested-loop)") { (s, d) =>
    graft.ops.RangeJoin.timeWindowPairs(
        Tables.events(s, d).select("user_id", "ts_sec", "event_id"),
        "user_id", "ts_sec", "event_id", windowSec = 60)
      .select("id_a", "id_b", "gap_s")
      .orderBy("id_a", "id_b")
  }

  /** The SAME as-of semantics through the custom physical operator
    * (plans.AsOfJoinExec, merge pass over co-partitioned sorted runs) —
    * shares q42's oracle, so the native operator is DuckDB-checked too.
    */
  val q44_asof_native: QueryDef = q(
    "q44_asof_native",
    q42_asof_join.oracle.get,
    "Native as-of join operator (LogicalPlan+Strategy+Exec) vs DuckDB ASOF") {
    (s, d) =>
      val ev = Tables.events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts_ns", "ts_sec")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("c_event_id"), col("user_id"),
          col("ts_ns"), col("ts_sec").as("c_sec"))
      graft.ops.AsOf.joinAsOfNative(purchases, clicks, "user_id", "ts_ns", "ts_ns",
          Seq("c_event_id", "c_sec"))
        .select(col("event_id"), col("user_id"),
          col("asof_c_event_id").as("click_id"),
          (col("ts_sec") - col("asof_c_sec")).as("gap_s"))
        .orderBy("event_id")
  }

  /** Triangle census of the interaction graph ([[graft.ops.Graph]]
    * degree-oriented count). The oracle counts with the plain a<b
    * orientation — the count is orientation-invariant, so the two plans
    * must agree exactly; hash parity here certifies the whole
    * canonicalize→degree→orient→wedge→close pipeline.
    */
  val q73_triangles: QueryDef = q(
    "q73_triangles",
    """WITH seq AS (
      |  SELECT user_id, lag(user_id) OVER (ORDER BY ts, event_id) AS prev
      |  FROM events),
      |e AS (
      |  SELECT DISTINCT LEAST(prev, user_id) AS a, GREATEST(prev, user_id) AS b
      |  FROM seq WHERE prev IS NOT NULL AND prev <> user_id),
      |n AS (SELECT count(DISTINCT v) AS n_nodes
      |      FROM (SELECT a AS v FROM e UNION ALL SELECT b AS v FROM e)),
      |m AS (SELECT count(*) AS n_edges FROM e),
      |t AS (SELECT count(*) AS n_triangles
      |      FROM e e1
      |      JOIN e e2 ON e2.a = e1.b
      |      JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b)
      |SELECT CAST(n_nodes AS BIGINT) AS n_nodes,
      |  CAST(n_edges AS BIGINT) AS n_edges,
      |  CAST(n_triangles AS BIGINT) AS n_triangles
      |FROM n, m, t""".stripMargin,
    "Exact triangle count over the interaction graph, degree-oriented") {
    (s, d) =>
      graft.ops.Graph.triangleStats(weightedEdges(s, d), "source", "target")
  }

  /** PageRank over the interaction graph, VALUE-LEVEL oracled (upgraded
    * from the pre-round-7 mass-conservation property oracle): DuckDB
    * replays all 10 damped power iterations as unrolled CTE generations
    * ([[prIterSql]]) and the gate hash-compares per-node
    * `floor(10⁶·rank)` — the q77 floor-ppm pattern. Double parity: both
    * engines run the identical expression tree per generation; the only
    * divergence source is summation ORDER inside one generation's
    * hash agg, a ~1-ulp effect (~10⁻¹¹ on the ppm scale), far below the
    * floor. GraphSpec's closed-form pins (K3/path) remain the unit-level
    * anchor.
    */
  val q74_pagerank: QueryDef = q(
    "q74_pagerank",
    edgesSql +
      s""",
        |deg AS (
        |  SELECT s, count(*) AS outdeg
        |  FROM (SELECT a AS s FROM we UNION ALL SELECT b AS s FROM we)
        |  GROUP BY s),
        |g AS (
        |  SELECT dir.s, dir.t, deg.outdeg
        |  FROM (SELECT a AS s, b AS t FROM we
        |        UNION ALL SELECT b AS s, a AS t FROM we) dir
        |  JOIN deg ON deg.s = dir.s),
        |prm AS (
        |  SELECT CAST(0.85 AS DOUBLE) AS dmp,
        |    (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / CAST(count(*) AS DOUBLE) AS base,
        |    CAST(1 AS DOUBLE) / CAST(count(*) AS DOUBLE) AS r0
        |  FROM deg),
        |i0 AS (SELECT s AS v, (SELECT r0 FROM prm) AS pr FROM deg),
        |${prIterSql(10, "r.pr / g.outdeg")}
        |SELECT v AS user_id, CAST(floor(1000000 * pr) AS BIGINT) AS rank_ppm
        |FROM i10 ORDER BY user_id""".stripMargin,
    "PageRank (10 damped power iterations), per-node floor-ppm oracled " +
      "against a DuckDB unrolled power-iteration CTE chain") {
    (s, d) =>
      // shared directed build + single final loop barrier (ckptEvery =
      // iters: the depth-10 chain is the measured optimum at this scale)
      graft.ops.Graph.pageRankOnGraph(
          graft.ops.Graph.fromEventsDirected(s, d), iters = 10, ckptEvery = 10)
        .select(col("v").as("user_id"),
          floor(lit(1000000) * col("rank")).cast(LongType).as("rank_ppm"))
        .orderBy("user_id")
  }

  /** [[graft.ops.Graph.kCore]] over the interaction graph — the onion
    * decomposition at k = floor(mean degree) + 1, computed in exact
    * integer arithmetic on both engines (sum-of-degrees over node count —
    * Spark Long division and DuckDB `//` agree on non-negative operands,
    * see the q108 note). Each node reports the peel round that removed it
    * (0 = survived), so the gate checks the cascade's DYNAMICS, not just
    * final membership: at the bench SFs the mean+1 threshold splits the
    * near-regular graph into two populated layers. The oracle unrolls 5
    * peel generations; the engine early-exits at the fixpoint, which is
    * oracle-safe because post-fixpoint rounds are identities (unlike
    * PageRank's tol exit, which changes values).
    */
  val q121_kcore: QueryDef = q(
    "q121_kcore",
    edgesSql +
      s""",
        |e AS MATERIALIZED (SELECT a, b FROM we),
        |deg0 AS MATERIALIZED (
        |  SELECT v, count(*) AS cnt
        |  FROM (SELECT a AS v FROM e UNION ALL SELECT b AS v FROM e)
        |  GROUP BY v),
        |kp AS MATERIALIZED (SELECT CAST((CAST(floor(SUM(cnt) / COUNT(*)) AS BIGINT)) + 1 AS BIGINT) AS k FROM deg0),
        |alive0 AS MATERIALIZED (SELECT v FROM deg0),
        |${kcoreRoundSql(5)}
        |SELECT d.v AS user_id,
        |  CAST(CASE
        |    WHEN a1.v IS NULL THEN 1
        |    WHEN a2.v IS NULL THEN 2
        |    WHEN a3.v IS NULL THEN 3
        |    WHEN a4.v IS NULL THEN 4
        |    WHEN a5.v IS NULL THEN 5
        |    ELSE 0 END AS BIGINT) AS peel_round
        |FROM deg0 d
        |LEFT JOIN alive1 a1 ON a1.v = d.v
        |LEFT JOIN alive2 a2 ON a2.v = d.v
        |LEFT JOIN alive3 a3 ON a3.v = d.v
        |LEFT JOIN alive4 a4 ON a4.v = d.v
        |LEFT JOIN alive5 a5 ON a5.v = d.v
        |ORDER BY user_id""".stripMargin,
    "k-core onion peeling (k = mean degree + 1): per-node peel round, " +
      "5 unrolled rounds in the oracle, fixpoint early-exit in the engine") {
    (s, d) =>
      val e = weightedEdges(s, d).select(col("source").as("a"), col("target").as("b"))
      val deg = graft.ops.Graph.degrees(e)
      // 1-row scalar probe (the DSIR-totals pattern): k from exact integer
      // arithmetic, identical to the oracle's SUM // COUNT
      val r = deg.agg(sum(col("deg")).as("s"), count(lit(1)).as("n")).head()
      val k = r.getLong(0) / r.getLong(1) + 1
      graft.ops.Graph.kCore(e, k, maxRounds = 5)
        .select(col("v").as("user_id"), col("peel_round"))
        .orderBy("user_id")
  }

  /** [[graft.ops.Graph.labelPropagation]] over the interaction graph —
    * deterministic weighted community detection, 4 synchronous rounds on
    * BOTH engines (no convergence exit: LPA label ties can oscillate, so
    * round-count parity — not a fixpoint argument — is what makes the
    * result replayable). Every (user_id, community) row value-checked
    * against the 4-generation unrolled oracle.
    */
  val q137_lpa_communities: QueryDef = q(
    "q137_lpa_communities",
    edgesSql +
      s""",
        |g AS MATERIALIZED (
        |  SELECT a AS s, b AS t, weight AS w FROM we
        |  UNION ALL SELECT b AS s, a AS t, weight AS w FROM we),
        |l0 AS MATERIALIZED (SELECT DISTINCT s AS v, s AS lbl FROM g),
        |${lpaRoundSql(4)}
        |SELECT v AS user_id, CAST(lbl AS BIGINT) AS community
        |FROM l4 ORDER BY user_id""".stripMargin,
    "Weighted label-propagation communities (deterministic min-tie LPA), " +
      "4 fixed synchronous rounds, per-node community value-oracled " +
      "against the unrolled generation chain") { (s, d) =>
    val e = weightedEdges(s, d)
      .select(col("source").as("a"), col("target").as("b"),
        col("weight").as("w"))
    graft.ops.Graph.labelPropagation(e, rounds = 4)
      .select(col("v").as("user_id"), col("lbl").cast(LongType).as("community"))
      .orderBy("user_id")
  }

  /** [[graft.ops.Graph.personalizedPageRank]] over the interaction graph,
    * seeds = the 5 lowest user ids present. VALUE-LEVEL oracled like q74
    * (upgraded from the pre-round-7 mass/floor/concentration property
    * oracle): the restart term `(1-d)·p(v)` is nonzero only on seed rows,
    * so each unrolled DuckDB generation adds the seed CASE where the
    * uniform chain adds the constant base. GraphSpec keeps the
    * invariant-level pins (mass conservation, seed floor, concentration)
    * as unit tests.
    */
  val q98_personalized_pagerank: QueryDef = q(
    "q98_personalized_pagerank",
    edgesSql +
      s""",
        |deg AS (
        |  SELECT s, count(*) AS outdeg
        |  FROM (SELECT a AS s FROM we UNION ALL SELECT b AS s FROM we)
        |  GROUP BY s),
        |g AS (
        |  SELECT dir.s, dir.t, deg.outdeg
        |  FROM (SELECT a AS s, b AS t FROM we
        |        UNION ALL SELECT b AS s, a AS t FROM we) dir
        |  JOIN deg ON deg.s = dir.s),
        |seeds AS (SELECT s AS v FROM deg ORDER BY s LIMIT 5),
        |prm AS (
        |  SELECT CAST(0.85 AS DOUBLE) AS dmp,
        |    CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE) AS restart,
        |    CAST(1 AS DOUBLE) / CAST(count(*) AS DOUBLE) AS sp
        |  FROM seeds),
        |i0 AS (
        |  SELECT deg.s AS v,
        |    CASE WHEN deg.s IN (SELECT v FROM seeds)
        |      THEN (SELECT sp FROM prm) ELSE CAST(0 AS DOUBLE) END AS pr
        |  FROM deg),
        |${prIterSql(10, "r.pr / g.outdeg",
          restart = "(SELECT restart FROM prm) * " +
            "(CASE WHEN g.t IN (SELECT v FROM seeds) " +
            "THEN (SELECT sp FROM prm) ELSE CAST(0 AS DOUBLE) END)")}
        |SELECT v AS user_id, CAST(floor(1000000 * pr) AS BIGINT) AS rank_ppm
        |FROM i10 ORDER BY user_id""".stripMargin,
    "Personalized PageRank (seeded restarts), per-node floor-ppm oracled " +
      "against a DuckDB unrolled power-iteration CTE chain") {
    (s, d) =>
      val g = graft.ops.Graph.fromEventsDirected(s, d)
      // deg IS the node table — no distinct over the edge list needed
      val seeds = g.deg.orderBy("s").limit(5).select(col("s").as("seed"))
      graft.ops.Graph.personalizedPageRankOnGraph(
          g, seeds, iters = 10, ckptEvery = 10)
        .select(col("v").as("user_id"),
          floor(lit(1000000) * col("rank")).cast(LongType).as("rank_ppm"))
        .orderBy("user_id")
  }

  /** [[graft.ops.Graph.pageRankWeighted]] over the WEIGHTED interaction
    * graph — the faithful centrality for the reference's flagship output
    * (its links carry interaction counts). VALUE-LEVEL oracled like q74
    * (upgraded from the pre-round-7 property oracle): contributions split
    * `r·w/strength`; strength sums integer-valued doubles, so it is EXACT
    * and order-independent, leaving the same sub-ppm divergence budget as
    * the uniform chain.
    */
  val q99_weighted_pagerank: QueryDef = q(
    "q99_weighted_pagerank",
    edgesSql +
      s""",
        |wd AS (SELECT a, b, CAST(weight AS DOUBLE) AS w FROM we),
        |st AS (
        |  SELECT s, sum(w) AS strength
        |  FROM (SELECT a AS s, w FROM wd UNION ALL SELECT b AS s, w FROM wd)
        |  GROUP BY s),
        |g AS (
        |  SELECT dir.s, dir.t, dir.w, st.strength
        |  FROM (SELECT a AS s, b AS t, w FROM wd
        |        UNION ALL SELECT b AS s, a AS t, w FROM wd) dir
        |  JOIN st ON st.s = dir.s),
        |prm AS (
        |  SELECT CAST(0.85 AS DOUBLE) AS dmp,
        |    (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / CAST(count(*) AS DOUBLE) AS base,
        |    CAST(1 AS DOUBLE) / CAST(count(*) AS DOUBLE) AS r0
        |  FROM st),
        |i0 AS (SELECT s AS v, (SELECT r0 FROM prm) AS pr FROM st),
        |${prIterSql(10, "r.pr * g.w / g.strength")}
        |SELECT v AS user_id, CAST(floor(1000000 * pr) AS BIGINT) AS rank_ppm
        |FROM i10 ORDER BY user_id""".stripMargin,
    "Weighted PageRank over the interaction graph (contributions split " +
      "by interaction count), per-node floor-ppm oracled") { (s, d) =>
    graft.ops.Graph.pageRankWeightedOnGraph(
        graft.ops.Graph.fromEventsWeightedDirected(s, d),
        iters = 10, ckptEvery = 10)
      .select(col("v").as("user_id"),
        floor(lit(1000000) * col("rank")).cast(LongType).as("rank_ppm"))
      .orderBy("user_id")
  }

  /** Temporal graph evolution — the dimension the static flagship graph
    * lacks: the interaction graph PER DAY (edges keyed by the receiving
    * event's day), with per-day distinct-edge, interaction, node, and
    * NEW-edge counts (an edge is new on its first-ever active day). The
    * growth-curve/churn analytic a 100 TB social pipeline tracks daily.
    * Scale shape: one GlobalLag pass (the day column rides along), then
    * three hash aggs — per (day, edge), per edge (first day), per day —
    * all map-side combinable; no windows over the full corpus.
    */
  val q108_graph_evolution: QueryDef = q(
    "q108_graph_evolution",
    """WITH seq AS (
      |  SELECT user_id, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
      |    lag(user_id) OVER (ORDER BY ts, event_id) AS prev
      |  FROM events),
      |p AS (
      |  SELECT day, LEAST(prev, user_id) AS a, GREATEST(prev, user_id) AS b
      |  FROM seq WHERE prev IS NOT NULL AND prev <> user_id),
      |ed AS (SELECT day, a, b, COUNT(*) AS n_inter FROM p GROUP BY 1, 2, 3),
      |fd AS (SELECT a, b, MIN(day) AS first_day FROM ed GROUP BY a, b),
      |agg AS (
      |  SELECT ed.day, COUNT(*) AS n_edges, SUM(ed.n_inter) AS n_interactions,
      |    SUM(CASE WHEN fd.first_day = ed.day THEN 1 ELSE 0 END) AS n_new_edges
      |  FROM ed JOIN fd ON fd.a = ed.a AND fd.b = ed.b GROUP BY ed.day),
      |nd AS (
      |  SELECT day, COUNT(DISTINCT v) AS n_nodes
      |  FROM (SELECT day, a AS v FROM p UNION ALL SELECT day, b AS v FROM p) u
      |  GROUP BY day)
      |SELECT agg.day, CAST(n_edges AS BIGINT) AS n_edges,
      |  CAST(n_interactions AS BIGINT) AS n_interactions,
      |  CAST(n_new_edges AS BIGINT) AS n_new_edges,
      |  CAST(n_nodes AS BIGINT) AS n_nodes
      |FROM agg JOIN nd ON nd.day = agg.day
      |ORDER BY agg.day""".stripMargin,
    "Temporal interaction-graph evolution: per-day edges, interactions, " +
      "nodes, and first-seen (new) edges") { (s, d) =>
    val pairs = graft.ops.GlobalLag.withLag(
        Tables.events(s, d).select("user_id", "ts_ns", "event_id", "ts_sec"),
        Seq("ts_ns", "event_id"), "user_id", "prev")
      .filter(col("prev").isNotNull && col("prev") =!= col("user_id"))
      // `div` truncates toward zero; DuckDB's `//` floors. They agree only
      // for non-negative operands — holds here (epoch seconds, counts) and
      // at every other div/`//` pairing in the registry (q101/q103). A
      // dataset with pre-1970 timestamps would need floor-normalizing first.
      .select(expr("ts_sec div 86400").as("day"),
        least(col("prev"), col("user_id")).as("a"),
        greatest(col("prev"), col("user_id")).as("b"))
    // core shared with ScaleProbe's celebrity-day probe; the persist
    // protocol (day-edge aggregate materialized once) lives there
    graft.ops.Graph.temporalEvolution(pairs)
  }

  /** Daily-grid resampling with forward fill — the gap-filling shape of
    * time-series analytics, run through the NATIVE as-of operator
    * (plans.AsOfJoinExec) rather than the composite: each (user, day)
    * grid point picks the user's last event value at or before end of
    * day. Right side is pre-aggregated to one row per (user, second) so
    * the as-of match is unique in both engines; the filled value is
    * emitted floor-ppm. Inner as-of semantics: days before a user's
    * first event produce no row — identical in DuckDB's ASOF JOIN.
    */
  val q77_resample: QueryDef = q(
    "q77_resample",
    """WITH b AS (
      |  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec, value
      |  FROM events),
      |r AS (SELECT user_id, ts_sec, max(value) AS v FROM b GROUP BY 1, 2),
      |lim AS (SELECT CAST(floor(min(ts_sec) / 86400) AS BIGINT) AS d0, CAST(floor(max(ts_sec) / 86400) AS BIGINT) AS d1 FROM b),
      |grid AS (
      |  SELECT u.user_id, CAST(g.d AS BIGINT) AS day,
      |    CAST(g.d * 86400 + 86399 AS BIGINT) AS gts
      |  FROM (SELECT DISTINCT user_id FROM b) u, lim,
      |    unnest(range(d0, d1 + 1)) AS g(d))
      |SELECT grid.user_id, grid.day,
      |  CAST(floor(1000000 * r.v) AS BIGINT) AS value_ppm
      |FROM grid ASOF JOIN r
      |  ON grid.user_id = r.user_id AND grid.gts >= r.ts_sec
      |ORDER BY grid.user_id, grid.day""".stripMargin,
    "Daily resample + forward fill via the native as-of operator") { (s, d) =>
    val ev = Tables.events(s, d).select(col("user_id"), col("ts_sec"), col("value"))
    val r = ev.groupBy(col("user_id"), col("ts_sec")).agg(max("value").as("v"))
    val lim = ev.agg(
      expr("min(ts_sec) div 86400").as("d0"),
      expr("max(ts_sec) div 86400").as("d1"))
    val grid = ev.select("user_id").distinct()
      .crossJoin(lim)
      .select(col("user_id"), explode(sequence(col("d0"), col("d1"))).as("day"))
      .select(col("user_id"), col("day"), (col("day") * 86400 + 86399).as("gts"))
    graft.ops.AsOf.joinAsOfNative(grid, r, "user_id", "gts", "ts_sec", Seq("v"))
      .select(col("user_id"), col("day"),
        floor(lit(1000000) * col("asof_v")).cast(LongType).as("value_ppm"))
      .orderBy("user_id", "day")
  }

  /** Hopping (sliding) time windows through Spark's native `window()`
    * generator — every event lands in 4 overlapping 1-hour windows that
    * hop by 15 min. The oracle replays the identical assignment
    * arithmetically (k ∈ 0..3, start = (ts div 900 − k)·900, keep
    * windows that still contain the event), so window boundaries, the
    * per-window membership, and the counts must all agree exactly.
    * Epoch-second window starts keep the comparison integer-only.
    */
  val q78_hopping_window: QueryDef = q(
    "q78_hopping_window",
    """WITH b AS (
      |  SELECT CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec, event_type
      |  FROM events),
      |w AS (
      |  SELECT ((CAST(floor(ts_sec / 900) AS BIGINT)) - k.k) * 900 AS win_start, event_type
      |  FROM b, (SELECT k FROM range(0, 4) AS t(k)) k
      |  WHERE ts_sec < ((CAST(floor(ts_sec / 900) AS BIGINT)) - k.k) * 900 + 3600)
      |SELECT CAST(win_start AS BIGINT) AS win_start, event_type,
      |  COUNT(*) AS n
      |FROM w
      |GROUP BY 1, 2
      |ORDER BY win_start, event_type""".stripMargin,
    "Hopping windows (1 h / 15 min) via the native window() generator") {
    (s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(unix_timestamp(col("window.start")).as("win_start"),
          col("event_type"), col("n"))
        .orderBy("win_start", "event_type")
  }

  /** Spark's NATIVE session_window generator (q20 is the manual
    * gaps-and-islands form). Boundary semantics, VERIFIED at a real
    * exactly-1800 s gap (sf0.1 user 511): session_window MERGES touching
    * sessions — a new event extends the session when its start is <= the
    * current session end (lastEvent + gap), so an event exactly 1800 s
    * later stays in the SAME session and a new one needs `gap > 1800`.
    * That makes the native rule identical to q20's manual `> 1800` at
    * floor-second precision. (The pre-round-7 oracle asserted `>= 1800`
    * from the "[start, end) is half-open" doc reading; no test corpus had
    * an exact-boundary gap until sf0.1 falsified it.) Spark sessionizes
    * the floor-second timestamp so both engines see identical instants.
    */
  val q79_session_window: QueryDef = q(
    "q79_session_window",
    """WITH g AS (
      |  SELECT user_id,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR CAST(floor(epoch(ts)) AS BIGINT) - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) > 1800
      |         THEN 1 ELSE 0 END AS is_new
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      |SELECT user_id, CAST(SUM(is_new) AS BIGINT) AS n_sessions, COUNT(*) AS n_events
      |FROM g
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin,
    "Native session_window vs a boundary-aligned gaps-and-islands oracle") {
    (s, d) =>
      Tables.events(s, d)
        .groupBy(col("user_id"),
          session_window(col("ts_sec").cast(TimestampType), "30 minutes"))
        .agg(count(lit(1)).as("n_in_session"))
        .groupBy("user_id")
        .agg(count(lit(1)).cast(LongType).as("n_sessions"),
          sum("n_in_session").as("n_events"))
        .orderBy("user_id")
  }

  /** Per-group top-k through the typed-Aggregator UDAF
    * ([[graft.functions.TopKAggregator]]) instead of a window: the
    * aggregator's partials carry at most k pairs, so the shuffle moves
    * k rows per (partition, group) rather than every row. The oracle is
    * the full row_number window — the two must agree exactly, which
    * pins the aggregator's reduce/merge/tie-break semantics.
    */
  val q80_topk_agg: QueryDef = q(
    "q80_topk_agg",
    """SELECT event_type, CAST(rn AS BIGINT) AS rank, event_id,
      |  CAST(floor(1000000 * value) AS BIGINT) AS value_ppm
      |FROM (
      |  SELECT event_type, event_id, value,
      |    row_number() OVER (PARTITION BY event_type ORDER BY value DESC, event_id) AS rn
      |  FROM events) t
      |WHERE rn <= 5
      |ORDER BY event_type, rank""".stripMargin,
    "Per-group top-k via a typed Aggregator UDAF (bounded partials)") {
    (s, d) =>
      import s.implicits._
      val ds = Tables.events(s, d)
        .select(col("event_type"), col("value"), col("event_id"))
        .as[(String, Double, Long)]
      ds.groupByKey(_._1).mapValues(t => (t._2, t._3))
        .agg(graft.functions.TopKAggregator(5).toColumn.name("topk"))
        .toDF("event_type", "topk")
        .select(col("event_type"),
          posexplode(col("topk.items")).as(Seq("i", "p")))
        .select(col("event_type"), (col("i") + 1).cast(LongType).as("rank"),
          col("p._2").as("event_id"),
          floor(lit(1000000) * col("p._1")).cast(LongType).as("value_ppm"))
        .orderBy("event_type", "rank")
  }


  /** Schema-driven JSON extraction over the semi-structured `props`
    * column — `from_json` with an explicit schema (codegen'd Jackson
    * parse, the scale path for semi-structured columns; q23 is the
    * regex-extraction fallback for non-JSON text). Malformed/absent keys
    * become NULL and are filtered, matching the oracle's json_extract.
    */
  val q93_json_extract: QueryDef = q(
    "q93_json_extract",
    """SELECT event_type, COUNT(*) AS n,
      |  CAST(SUM(k) AS BIGINT) AS sum_k, MIN(k) AS min_k, MAX(k) AS max_k
      |FROM (SELECT event_type,
      |        CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      |      FROM events) t
      |WHERE k IS NOT NULL AND k % 2 = 0
      |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "Schema-based JSON field extraction (from_json) + grouped aggregation") {
    (s, d) =>
      Tables.events(s, d)
        .select(col("event_type"),
          from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("k", LongType))))
            .getField("k").as("k"))
        .filter(col("k").isNotNull && col("k") % 2 === 0)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("k").cast(LongType).as("sum_k"),
          min("k").as("min_k"), max("k").as("max_k"))
        .orderBy("event_type")
  }

  /** [[graft.ops.Incremental.mergeCountSum]] over events — incremental
    * maintenance of a per-(user, type) (count, Σvalue) view: the standing
    * view covers days before Jan 25; the CDC batch inserts day 25 and
    * RETRACTS the pre-25 rows with event_id ≡ 0 (mod 7) (late-arriving
    * deletes). The engine computes `base ⊕ ins ⊖ del`; the oracle
    * recomputes the final state from scratch — the hash match proves the
    * incremental merge is exactly equivalent to recomputation, which is
    * the correctness contract of materialized-view upkeep.
    */
  val q147_incremental_view: QueryDef = QueryDef(
    "q147_incremental_view",
    (s, d) => {
      val ev = Tables.events(s, d)
      val day25 = lit(1706140800L)
      val day26 = lit(1706227200L)
      val base = ev.filter(col("ts_sec") < day25)
      val ins = ev.filter(col("ts_sec") >= day25 && col("ts_sec") < day26)
      val del = base.filter(col("event_id") % 7 === 0)
      graft.ops.Incremental.mergeCountSum(base, ins, del,
          Seq("user_id", "event_type"), "value")
        .select(col("user_id"), col("event_type"),
          col("n").cast(LongType).as("n"), col("sum_value"))
        .orderBy("user_id", "event_type")
    },
    Some("""WITH fin AS (
      |  SELECT user_id, event_type, value
      |  FROM events
      |  WHERE (CAST(floor(epoch(ts)) AS BIGINT) < 1706140800
      |         AND event_id % 7 <> 0)
      |     OR (CAST(floor(epoch(ts)) AS BIGINT) >= 1706140800
      |         AND CAST(floor(epoch(ts)) AS BIGINT) < 1706227200))
      |SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM fin GROUP BY user_id, event_type
      |ORDER BY user_id, event_type""".stripMargin),
    "Incremental view maintenance: base + insert-agg - retract-agg " +
      "merged in exact decimal, proven equal to full recompute")

  /** [[graft.ops.Incremental.mergeMinMaxAvg]] on the q147 CDC scenario —
    * the non-self-maintainable tier: MIN/MAX survive retractions via a
    * re-scan of AFFECTED groups only (delete batch touches the stored
    * extreme), AVG derives from the exact-decimal (count, sum) pair. The
    * oracle recomputes the final state from scratch, so any group whose
    * extreme was repaired from the wrong row set (or whose affected-set
    * predicate under-selected) hash-fails. The retraction predicate
    * (event_id % 7) deletes arbitrary rows, so most groups' minima ARE
    * affected — OpsSpec pins the complementary claim (unaffected groups
    * never re-scan) on a controlled frame.
    */
  val q162_incremental_minmax: QueryDef = QueryDef(
    "q162_incremental_minmax",
    (s, d) => {
      val ev = Tables.events(s, d)
      val day25 = lit(1706140800L)
      val day26 = lit(1706227200L)
      val base = ev.filter(col("ts_sec") < day25)
      val ins = ev.filter(col("ts_sec") >= day25 && col("ts_sec") < day26)
      val del = base.filter(col("event_id") % 7 === 0)
      graft.ops.Incremental.mergeMinMaxAvg(base, ins, del,
          Seq("user_id", "event_type"), "value", "event_id")
        .select(col("user_id"), col("event_type"),
          col("n").cast(LongType).as("n"),
          col("min_value").cast("double").as("min_value"),
          col("max_value").cast("double").as("max_value"),
          col("avg_value"))
        .orderBy("user_id", "event_type")
    },
    Some("""WITH fin AS (
      |  SELECT user_id, event_type, value
      |  FROM events
      |  WHERE (CAST(floor(epoch(ts)) AS BIGINT) < 1706140800
      |         AND event_id % 7 <> 0)
      |     OR (CAST(floor(epoch(ts)) AS BIGINT) >= 1706140800
      |         AND CAST(floor(epoch(ts)) AS BIGINT) < 1706227200))
      |SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(MIN(value) AS DOUBLE) AS min_value,
      |  CAST(MAX(value) AS DOUBLE) AS max_value,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_value
      |FROM fin GROUP BY user_id, event_type
      |ORDER BY user_id, event_type""".stripMargin),
    "Incremental view maintenance tier 2: MIN/MAX repaired by re-scanning " +
      "only delete-affected groups, AVG from the exact-decimal sum, " +
      "proven equal to full recompute")

  /** [[graft.ops.Incremental.mergeDistinctSupport]] — IVM tier 4:
    * COUNT(DISTINCT user) per (event_type, day) under a DELETE-HEAVY CDC
    * batch. The q147 scenario with the retraction predicate widened to
    * `event_id % 2 = 0` — HALF the standing corpus retracted — because
    * distinct counts fail in a way COUNT/SUM cannot: a user with several
    * events on a day must KEEP counting while any one of them survives
    * and STOP the moment the last is retracted, which only the
    * per-(group, value) support table gets right (a signed distinct-set
    * delta would double-drop). The oracle recomputes
    * COUNT(DISTINCT user_id) from scratch on the post-CDC row set, so
    * both failure modes hash-fail.
    */
  val q234_incremental_distinct: QueryDef = QueryDef(
    "q234_incremental_distinct",
    (s, d) => {
      val ev = Tables.events(s, d).withColumn("day", expr("ts_sec div 86400"))
      val day25 = lit(1706140800L)
      val day26 = lit(1706227200L)
      val base = ev.filter(col("ts_sec") < day25)
      val ins = ev.filter(col("ts_sec") >= day25 && col("ts_sec") < day26)
      val del = base.filter(col("event_id") % 2 === 0)
      val support = graft.ops.Incremental.mergeDistinctSupport(
        base, ins, del, Seq("event_type", "day"), "user_id")
      graft.ops.Incremental.distinctCounts(support, Seq("event_type", "day"))
        .select(col("event_type"), col("day"),
          col("n_distinct").cast(LongType).as("n_users"))
        .orderBy("event_type", "day")
    },
    Some("""WITH fin AS (
      |  SELECT event_type,
      |    CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day, user_id
      |  FROM events
      |  WHERE (CAST(floor(epoch(ts)) AS BIGINT) < 1706140800
      |         AND event_id % 2 <> 0)
      |     OR (CAST(floor(epoch(ts)) AS BIGINT) >= 1706140800
      |         AND CAST(floor(epoch(ts)) AS BIGINT) < 1706227200))
      |SELECT event_type, day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
      |FROM fin GROUP BY event_type, day
      |ORDER BY event_type, day""".stripMargin),
    "Incremental view maintenance tier 4: COUNT(DISTINCT) under a " +
      "delete-heavy retraction batch via the per-(group, value) support " +
      "table, proven equal to full recompute")

  /** [[graft.ops.Incremental.mergeTopK]] — IVM tier 5: per-(user, type)
    * TOP-2 values (exact cents, event_id tiebreak) under the q147 CDC
    * batch. Ranked views break under retraction precisely when a delete
    * hits a stored top row — the 3rd-best was never stored — and the
    * `event_id % 7` predicate guarantees plenty of such hits while
    * leaving most groups untouched, so BOTH maintenance paths (CDC-sized
    * re-rank for unaffected groups, affected-group rescan for the rest)
    * carry weight. The oracle recomputes the final top-2 from scratch
    * with a ROW_NUMBER over the post-CDC rows; any group repaired from
    * the wrong row set hash-fails.
    */
  val q242_incremental_topk: QueryDef = QueryDef(
    "q242_incremental_topk",
    (s, d) => {
      val ev = Tables.events(s, d).select(col("user_id"), col("event_type"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("v_cents"),
        col("event_id"), col("ts_sec"))
      val day25 = lit(1706140800L)
      val day26 = lit(1706227200L)
      val base = ev.filter(col("ts_sec") < day25).drop("ts_sec")
      val ins = ev.filter(col("ts_sec") >= day25 && col("ts_sec") < day26)
        .drop("ts_sec")
      val del = base.filter(col("event_id") % 7 === 0)
      graft.ops.Incremental.mergeTopK(base, ins, del,
          Seq("user_id", "event_type"), "v_cents", "event_id", k = 2)
        .select(col("user_id"), col("event_type"),
          col("rank").cast(LongType).as("rank"), col("v_cents"),
          col("event_id"))
        .orderBy("user_id", "event_type", "rank")
    },
    Some("""WITH fin AS (
      |  SELECT user_id, event_type,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v_cents,
      |    event_id
      |  FROM events
      |  WHERE (CAST(floor(epoch(ts)) AS BIGINT) < 1706140800
      |         AND event_id % 7 <> 0)
      |     OR (CAST(floor(epoch(ts)) AS BIGINT) >= 1706140800
      |         AND CAST(floor(epoch(ts)) AS BIGINT) < 1706227200))
      |SELECT user_id, event_type, CAST(rk AS BIGINT) AS rank, v_cents,
      |  event_id
      |FROM (
      |  SELECT user_id, event_type, v_cents, event_id,
      |    row_number() OVER (PARTITION BY user_id, event_type
      |                       ORDER BY v_cents DESC, event_id) AS rk
      |  FROM fin) t
      |WHERE rk <= 2
      |ORDER BY user_id, event_type, rank""".stripMargin),
    "Incremental view maintenance tier 5: per-group top-2 under " +
      "retraction — CDC-sized re-rank for untouched groups, " +
      "affected-group rescan where a delete hit a stored top row, " +
      "proven equal to full recompute")

  /** Rolling z-score anomaly detection over the per-type daily series —
    * the ops-monitoring classic (is today's volume > 2σ from the trailing
    * week?), made engine-portable by never taking the square root: the
    * flag test (n − μ)² > 4σ² is evaluated as the INTEGER inequality
    * (w·n − S)² > 4·(w·Q − S²) over the trailing window's count w,
    * sum S, and sum-of-squares Q (multiply both sides by w²) — exact in
    * DECIMAL(38,0), where the float z-score would be sqrt-rounding luck
    * across engines. Window frame = ROWS BETWEEN 7 PRECEDING AND 1
    * PRECEDING per event_type (the PARTITIONED window — one task holds
    * one type's ~days rows, never the corpus); days with fewer than 3
    * trailing points report 0 (insufficient baseline, same on both
    * engines).
    */
  val q167_rolling_anomaly: QueryDef = QueryDef(
    "q167_rolling_anomaly",
    (s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), expr("ts_sec div 86400").as("day"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy("event_type").orderBy("day")
        .rowsBetween(-7, -1)
      daily
        .withColumn("w", count(lit(1)).over(w))
        .withColumn("s", sum("n").over(w))
        .withColumn("q", sum(col("n") * col("n")).over(w))
        .withColumn("is_anomaly",
          when(col("w") >= 3 &&
            expr("CAST(w * n - s AS DECIMAL(38,0)) * CAST(w * n - s AS DECIMAL(38,0))") >
              expr("CAST(4 AS DECIMAL(38,0)) * (CAST(w AS DECIMAL(38,0)) * q - CAST(s AS DECIMAL(38,0)) * s)"),
            1L).otherwise(0L))
        .select(col("event_type"), col("day"), col("n").cast(LongType).as("n"),
          col("is_anomaly"))
        .orderBy("event_type", "day")
    },
    Some("""WITH daily AS (
      |  SELECT event_type,
      |    CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
      |    COUNT(*) AS n
      |  FROM events GROUP BY 1, 2),
      |roll AS (
      |  SELECT event_type, day, n,
      |    COUNT(*) OVER tw AS w,
      |    SUM(n) OVER tw AS s,
      |    SUM(n * n) OVER tw AS q
      |  FROM daily
      |  WINDOW tw AS (PARTITION BY event_type ORDER BY day
      |                ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
      |SELECT event_type, day, CAST(n AS BIGINT) AS n,
      |  CAST(CASE WHEN w >= 3 AND
      |      CAST(w * n - s AS DECIMAL(38,0)) * CAST(w * n - s AS DECIMAL(38,0)) >
      |      CAST(4 AS DECIMAL(38,0)) * (CAST(w AS DECIMAL(38,0)) * q - CAST(s AS DECIMAL(38,0)) * s)
      |    THEN 1 ELSE 0 END AS BIGINT) AS is_anomaly
      |FROM roll
      |ORDER BY event_type, day""".stripMargin),
    "Rolling z-score anomaly flag over per-type daily counts: trailing " +
      "7-day window, sqrt-free exact integer variance test")

  /** Linear INTERPOLATION over a daily grid — q77's other half: forward
    * fill answers "last known value"; sensor/metric pipelines need the
    * value BETWEEN two known points. Per user, missing grid days get
    * `pv + (nv − pv)·(day − pd) / (nd − pd)` from the bracketing known
    * days — four ignore-nulls window functions over ONE user partition
    * exchange (backward last/first, forward first), then exact integer
    * arithmetic in ppm. Floor division must be portable for NEGATIVE
    * numerators (falling series): both engines run the identical
    * `CASE WHEN N ≥ 0 THEN N div D ELSE -((-N + D - 1) div D) END`
    * (Spark `div` truncates, so the CASE emulates floor; DuckDB's `//`
    * already floors and the CASE is floor-equivalent there too). Only
    * interior days (both brackets exist) are emitted.
    */
  val q179_linear_interpolate: QueryDef = QueryDef(
    "q179_linear_interpolate",
    (s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), expr("ts_sec div 86400").as("day"), col("value"))
      val known = ev.groupBy("user_id", "day")
        .agg(expr("CAST(floor(1000000 * max(value)) AS BIGINT)").as("v"))
      val lim = ev.agg(expr("min(day)").as("d0"), expr("max(day)").as("d1"))
      val grid = ev.select("user_id").distinct()
        .crossJoin(broadcast(lim))
        .select(col("user_id"), explode(sequence(col("d0"), col("d1"))).as("day"))
      val g = grid.join(known, Seq("user_id", "day"), "left")
      val back = Window.partitionBy("user_id").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val fwd = Window.partitionBy("user_id").orderBy("day")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      g.withColumn("pv", last(col("v"), ignoreNulls = true).over(back))
        .withColumn("pd", last(when(col("v").isNotNull, col("day")), ignoreNulls = true).over(back))
        .withColumn("nv", first(col("v"), ignoreNulls = true).over(fwd))
        .withColumn("nd", first(when(col("v").isNotNull, col("day")), ignoreNulls = true).over(fwd))
        .filter(col("pd").isNotNull && col("nd").isNotNull)
        .withColumn("interp_ppm",
          when(col("v").isNotNull, col("v")).otherwise(
            col("pv") + expr("""CASE
              WHEN (nv - pv) * (day - pd) >= 0
              THEN ((nv - pv) * (day - pd)) div (nd - pd)
              ELSE -((-((nv - pv) * (day - pd)) + (nd - pd) - 1) div (nd - pd))
            END""")))
        .select(col("user_id"), col("day"),
          when(col("v").isNotNull, 1L).otherwise(0L).as("is_known"),
          col("interp_ppm").cast(LongType).as("interp_ppm"))
        .orderBy("user_id", "day")
    },
    Some("""WITH b AS (
      |  SELECT user_id, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
      |    value
      |  FROM events),
      |known AS (
      |  SELECT user_id, day,
      |    CAST(floor(1000000 * max(value)) AS BIGINT) AS v
      |  FROM b GROUP BY 1, 2),
      |lim AS (SELECT min(day) AS d0, max(day) AS d1 FROM b),
      |grid AS (
      |  SELECT u.user_id, CAST(g.d AS BIGINT) AS day
      |  FROM (SELECT DISTINCT user_id FROM b) u, lim,
      |    unnest(range(d0, d1 + 1)) AS g(d)),
      |j AS (
      |  SELECT grid.user_id, grid.day, known.v,
      |    last_value(known.v IGNORE NULLS) OVER bw AS pv,
      |    last_value(CASE WHEN known.v IS NOT NULL THEN grid.day END IGNORE NULLS) OVER bw AS pd,
      |    first_value(known.v IGNORE NULLS) OVER fw AS nv,
      |    first_value(CASE WHEN known.v IS NOT NULL THEN grid.day END IGNORE NULLS) OVER fw AS nd
      |  FROM grid LEFT JOIN known
      |    ON grid.user_id = known.user_id AND grid.day = known.day
      |  WINDOW bw AS (PARTITION BY grid.user_id ORDER BY grid.day
      |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      |         fw AS (PARTITION BY grid.user_id ORDER BY grid.day
      |                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
      |SELECT user_id, day,
      |  CAST(CASE WHEN v IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS is_known,
      |  CAST(CASE WHEN v IS NOT NULL THEN v
      |       ELSE pv + CASE
      |         WHEN (nv - pv) * (day - pd) >= 0
      |         THEN CAST(floor(((nv - pv) * (day - pd)) / (nd - pd)) AS BIGINT)
      |         ELSE -(CAST(floor((-((nv - pv) * (day - pd)) + (nd - pd) - 1) / (nd - pd)) AS BIGINT))
      |       END END AS BIGINT) AS interp_ppm
      |FROM j
      |WHERE pd IS NOT NULL AND nd IS NOT NULL
      |ORDER BY user_id, day""".stripMargin),
    "Linear interpolation over the daily grid: bracketing known points " +
      "via ignore-nulls windows, exact integer ppm with portable floor " +
      "division for falling series")

  /** First-order Markov TRANSITION MATRIX over per-user event journeys —
    * the user-flow analytics next to the funnel (q154) and sessionization
    * (q20): for each ordered pair of event types, how often does one
    * follow the other within a user's stream, and with what probability?
    * One per-user lag window over the unique (ts_ns, event_id) order
    * (user-bounded partitions), one hash agg for transition counts, one
    * for row marginals, probabilities in exact floor-ppm (DECIMAL(38)
    * product — a 100 TB event stream overflows the BIGINT numerator).
    */
  val q178_event_transitions: QueryDef = QueryDef(
    "q178_event_transitions",
    (s, d) => {
      // order by ts_ns (+ unique event_id tiebreak) — the repo's ordering
      // contract (Tables.normalizeEventTs): the oracle's ORDER BY ts is
      // nanosecond-resolution in the nanos generation, so ordering by the
      // micros-truncated ts here could place two same-user events inside
      // one microsecond differently from DuckDB
      val w = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
      val trans = Tables.events(s, d)
        .select(col("user_id"), col("ts_ns"), col("event_id"), col("event_type"))
        .withColumn("prev", lag("event_type", 1).over(w))
        .filter(col("prev").isNotNull)
      val counts = trans.groupBy(col("prev").as("from_type"),
          col("event_type").as("to_type"))
        .agg(count(lit(1)).as("n"))
      val marg = counts.groupBy("from_type").agg(sum("n").as("n_from"))
      counts.join(marg, Seq("from_type"))
        .select(col("from_type"), col("to_type"),
          col("n").cast(LongType).as("n"),
          expr("CAST((CAST(1000000 AS DECIMAL(38,0)) * n) div n_from AS BIGINT)")
            .as("p_ppm"))
        .orderBy("from_type", "to_type")
    },
    Some("""WITH tr AS (
      |  SELECT lag(event_type) OVER (PARTITION BY user_id
      |           ORDER BY ts, event_id) AS from_type,
      |    event_type AS to_type
      |  FROM events),
      |c AS (
      |  SELECT from_type, to_type, COUNT(*) AS n
      |  FROM tr WHERE from_type IS NOT NULL
      |  GROUP BY 1, 2),
      |m AS (SELECT from_type, SUM(n) AS n_from FROM c GROUP BY from_type)
      |SELECT c.from_type AS from_type, to_type, CAST(n AS BIGINT) AS n,
      |  CAST(CAST(floor((CAST(1000000 AS DECIMAL(38,0)) * n) / n_from) AS BIGINT) AS BIGINT) AS p_ppm
      |FROM c JOIN m ON c.from_type = m.from_type
      |ORDER BY from_type, to_type""".stripMargin),
    "First-order Markov transition matrix over per-user event streams: " +
      "counts + floor-ppm probabilities, unique-order lag window")

  /** SCD Type-2 point-in-time join — the warehouse pattern as-of joins
    * approximate and BETWEEN-bounds dimensions do exactly: each user
    * carries a slowly-changing `tier` attribute versioned into
    * [from_sec, to_sec) validity windows (three 10-day periods covering
    * the events range, tier = (user_id + period) mod 3), and every fact
    * row joins the version that was current AT ITS TIMESTAMP — an
    * equi-join on the user plus range predicates, which Catalyst plans
    * as the user-keyed shuffle join with the range as join filters (dim
    * broadcasts when small; co-partitions on user_id at scale — never a
    * cross product). Exactly-one-match is structural (periods tile the
    * range), so the per-tier rollup is a full-coverage audit of the
    * join: any dropped or double-matched fact changes a count.
    */
  val q152_scd2_join: QueryDef = QueryDef(
    "q152_scd2_join",
    (s, d) => {
      val ev = Tables.events(s, d)
      val dim = ev.select("user_id").distinct()
        .select(col("user_id"),
          explode(sequence(lit(0L), lit(2L))).as("p"))
        .select(col("user_id"),
          (lit(1704067200L) + col("p") * 864000L).as("from_sec"),
          (lit(1704067200L) + (col("p") + 1L) * 864000L).as("to_sec"),
          ((col("user_id") + col("p")) % 3).as("tier"))
      ev.select(col("user_id"), col("ts_sec"), col("value"))
        .join(dim, Seq("user_id"))
        .filter(col("ts_sec") >= col("from_sec") &&
          col("ts_sec") < col("to_sec"))
        .groupBy("tier")
        .agg(count(lit(1)).as("n"),
          countDistinct("user_id").as("n_users"),
          Sql.sumDec2(col("value")).as("sum_value"))
        .select(col("tier"), col("n").cast(LongType).as("n"),
          col("n_users").cast(LongType).as("n_users"), col("sum_value"))
        .orderBy("tier")
    },
    Some("""WITH dim AS (
      |  SELECT u.user_id, p,
      |    1704067200 + p * 864000 AS from_sec,
      |    1704067200 + (p + 1) * 864000 AS to_sec,
      |    (u.user_id + p) % 3 AS tier
      |  FROM (SELECT DISTINCT user_id FROM events) u,
      |       (SELECT p FROM range(0, 3) AS t(p)) ps),
      |f AS (
      |  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec, value
      |  FROM events)
      |SELECT d.tier, CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(COUNT(DISTINCT f.user_id) AS BIGINT) AS n_users,
      |  CAST(SUM(CAST(f.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM f JOIN dim d
      |  ON f.user_id = d.user_id
      | AND f.ts_sec >= d.from_sec AND f.ts_sec < d.to_sec
      |GROUP BY d.tier
      |ORDER BY d.tier""".stripMargin),
    "SCD Type-2 point-in-time dimension join: versioned validity windows, " +
      "equi-join on the key with range join filters, per-tier audit rollup")

  /** Ordered event-sequence FUNNEL (the product-analytics
    * view→click→purchase query, the reduced MATCH_RECOGNIZE shape):
    * per user, t1 = first view, t2 = first click strictly AFTER t1,
    * t3 = first purchase strictly after t2 — each step's anchor depends
    * on the previous step's result, which is what separates a funnel
    * from three independent mins. Computed as three chained
    * conditional-min windows over ONE user partitioning (consecutive
    * Window ops with the same spec share the single shuffle), then a
    * per-user collapse and one global rollup: users reaching each step
    * and the total step latency in exact integer seconds.
    */
  val q154_event_funnel: QueryDef = QueryDef(
    "q154_event_funnel",
    (s, d) => {
      val w = Window.partitionBy("user_id")
      val perUser = Tables.events(s, d)
        .select("user_id", "event_type", "ts_sec")
        .withColumn("t1", min(when(col("event_type") === "view",
          col("ts_sec"))).over(w))
        .withColumn("t2", min(when(col("event_type") === "click" &&
          col("ts_sec") > col("t1"), col("ts_sec"))).over(w))
        .withColumn("t3", min(when(col("event_type") === "purchase" &&
          col("ts_sec") > col("t2"), col("ts_sec"))).over(w))
        .groupBy("user_id")
        .agg(first("t1").as("t1"), first("t2").as("t2"), first("t3").as("t3"))
      perUser.agg(
          count(col("t1")).as("n1"), count(col("t2")).as("n2"),
          count(col("t3")).as("n3"),
          coalesce(sum(col("t2") - col("t1")), lit(0L)).as("l2"),
          coalesce(sum(col("t3") - col("t2")), lit(0L)).as("l3"))
        .select(explode(array(
          struct(lit("p1_view").as("step"), col("n1").as("n_users"),
            lit(0L).as("sum_latency_sec")),
          struct(lit("p2_click").as("step"), col("n2").as("n_users"),
            col("l2").cast(LongType).as("sum_latency_sec")),
          struct(lit("p3_purchase").as("step"), col("n3").as("n_users"),
            col("l3").cast(LongType).as("sum_latency_sec")))).as("r"))
        .select("r.*")
        .orderBy("step")
    },
    Some("""WITH f AS (
      |  SELECT user_id, event_type,
      |    CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec
      |  FROM events),
      |u1 AS (
      |  SELECT user_id,
      |    MIN(CASE WHEN event_type = 'view' THEN ts_sec END) AS t1
      |  FROM f GROUP BY user_id),
      |u2 AS (
      |  SELECT f.user_id, u1.t1,
      |    MIN(CASE WHEN f.event_type = 'click' AND f.ts_sec > u1.t1
      |        THEN f.ts_sec END) AS t2
      |  FROM f JOIN u1 ON f.user_id = u1.user_id
      |  GROUP BY f.user_id, u1.t1),
      |u3 AS (
      |  SELECT f.user_id, u2.t1, u2.t2,
      |    MIN(CASE WHEN f.event_type = 'purchase' AND f.ts_sec > u2.t2
      |        THEN f.ts_sec END) AS t3
      |  FROM f JOIN u2 ON f.user_id = u2.user_id
      |  GROUP BY f.user_id, u2.t1, u2.t2)
      |SELECT * FROM (
      |  SELECT 'p1_view' AS step, CAST(COUNT(t1) AS BIGINT) AS n_users,
      |    CAST(0 AS BIGINT) AS sum_latency_sec FROM u3
      |  UNION ALL
      |  SELECT 'p2_click', CAST(COUNT(t2) AS BIGINT),
      |    CAST(COALESCE(SUM(t2 - t1), 0) AS BIGINT) FROM u3
      |  UNION ALL
      |  SELECT 'p3_purchase', CAST(COUNT(t3) AS BIGINT),
      |    CAST(COALESCE(SUM(t3 - t2), 0) AS BIGINT) FROM u3
      |) t ORDER BY step""".stripMargin),
    "Ordered event funnel: chained conditional-min windows over one " +
      "user partitioning; per-step reach + exact integer latency")

  /** Cohort retention matrix — the third event-analytics classic next to
    * the funnel (q154) and sessionization (q20): users are cohorted by
    * their FIRST activity day, and each (cohort_day, day_offset) cell
    * counts distinct users from that cohort active that many days later.
    * Two hash aggregations (per-user first day; distinct user-day
    * activity) joined on the user — both shuffles on user_id, the second
    * reusing the first's partitioning — then one bounded-cardinality
    * rollup (days² cells regardless of corpus size). All integer day
    * arithmetic (epoch div 86400), zero-tolerance oracle.
    */
  val q155_cohort_retention: QueryDef = QueryDef(
    "q155_cohort_retention",
    (s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), expr("ts_sec div 86400").as("day"))
      val cohort = ev.groupBy("user_id").agg(min("day").as("cohort_day"))
      ev.distinct()
        .join(cohort, Seq("user_id"))
        .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
        .agg(countDistinct("user_id").as("n_users"))
        .select(col("cohort_day"), col("day_offset"),
          col("n_users").cast(LongType).as("n_users"))
        .orderBy("cohort_day", "day_offset")
    },
    Some("""WITH a AS (
      |  SELECT DISTINCT user_id,
      |    CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day
      |  FROM events),
      |c AS (SELECT user_id, MIN(day) AS cohort_day FROM a GROUP BY user_id)
      |SELECT c.cohort_day, a.day - c.cohort_day AS day_offset,
      |  CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_users
      |FROM a JOIN c ON a.user_id = c.user_id
      |GROUP BY c.cohort_day, a.day - c.cohort_day
      |ORDER BY cohort_day, day_offset""".stripMargin),
    "Cohort retention matrix: first-activity-day cohorts x day offset, " +
      "distinct active users per cell; bounded days-squared output")

  /** Time-WINDOWED funnel — q154 with the constraint real funnels have:
    * each step must convert within `W` seconds of the previous step
    * (t2 = first click in (t1, t1+W], t3 = first purchase in
    * (t2, t2+W], W = 3 days), so users genuinely drop off instead of
    * everyone eventually converting. Same single-shuffle chained-window
    * plan as q154; the timeout adds one bound per conditional min.
    */
  val q159_windowed_funnel: QueryDef = QueryDef(
    "q159_windowed_funnel",
    (s, d) => {
      val W = 259200L
      val w = Window.partitionBy("user_id")
      val perUser = Tables.events(s, d)
        .select("user_id", "event_type", "ts_sec")
        .withColumn("t1", min(when(col("event_type") === "view",
          col("ts_sec"))).over(w))
        .withColumn("t2", min(when(col("event_type") === "click" &&
          col("ts_sec") > col("t1") && col("ts_sec") <= col("t1") + W,
          col("ts_sec"))).over(w))
        .withColumn("t3", min(when(col("event_type") === "purchase" &&
          col("ts_sec") > col("t2") && col("ts_sec") <= col("t2") + W,
          col("ts_sec"))).over(w))
        .groupBy("user_id")
        .agg(first("t1").as("t1"), first("t2").as("t2"), first("t3").as("t3"))
      perUser.agg(
          count(col("t1")).as("n1"), count(col("t2")).as("n2"),
          count(col("t3")).as("n3"),
          coalesce(sum(col("t2") - col("t1")), lit(0L)).as("l2"),
          coalesce(sum(col("t3") - col("t2")), lit(0L)).as("l3"))
        .select(explode(array(
          struct(lit("p1_view").as("step"), col("n1").as("n_users"),
            lit(0L).as("sum_latency_sec")),
          struct(lit("p2_click").as("step"), col("n2").as("n_users"),
            col("l2").cast(LongType).as("sum_latency_sec")),
          struct(lit("p3_purchase").as("step"), col("n3").as("n_users"),
            col("l3").cast(LongType).as("sum_latency_sec")))).as("r"))
        .select("r.*")
        .orderBy("step")
    },
    Some("""WITH f AS (
      |  SELECT user_id, event_type,
      |    CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec
      |  FROM events),
      |u1 AS (
      |  SELECT user_id,
      |    MIN(CASE WHEN event_type = 'view' THEN ts_sec END) AS t1
      |  FROM f GROUP BY user_id),
      |u2 AS (
      |  SELECT f.user_id, u1.t1,
      |    MIN(CASE WHEN f.event_type = 'click' AND f.ts_sec > u1.t1
      |             AND f.ts_sec <= u1.t1 + 259200
      |        THEN f.ts_sec END) AS t2
      |  FROM f JOIN u1 ON f.user_id = u1.user_id
      |  GROUP BY f.user_id, u1.t1),
      |u3 AS (
      |  SELECT f.user_id, u2.t1, u2.t2,
      |    MIN(CASE WHEN f.event_type = 'purchase' AND f.ts_sec > u2.t2
      |             AND f.ts_sec <= u2.t2 + 259200
      |        THEN f.ts_sec END) AS t3
      |  FROM f JOIN u2 ON f.user_id = u2.user_id
      |  GROUP BY f.user_id, u2.t1, u2.t2)
      |SELECT * FROM (
      |  SELECT 'p1_view' AS step, CAST(COUNT(t1) AS BIGINT) AS n_users,
      |    CAST(0 AS BIGINT) AS sum_latency_sec FROM u3
      |  UNION ALL
      |  SELECT 'p2_click', CAST(COUNT(t2) AS BIGINT),
      |    CAST(COALESCE(SUM(t2 - t1), 0) AS BIGINT) FROM u3
      |  UNION ALL
      |  SELECT 'p3_purchase', CAST(COUNT(t3) AS BIGINT),
      |    CAST(COALESCE(SUM(t3 - t2), 0) AS BIGINT) FROM u3
      |) t ORDER BY step""".stripMargin),
    "Time-windowed funnel: per-step 3-day conversion timeout over the " +
      "q154 chained-window plan; real drop-off per step")

  /** Unrolled HITS generations `ra$k/a$k/rh$k/h$k` for the q180 oracle:
    * round k's raw authority sums hub scores over in-edges, rescales to
    * ppm by the round max (scalar subquery ≡ the engine's 1-row max
    * broadcast), then raw hub sums the new authority over out-edges and
    * rescales the same way. AS MATERIALIZED on every generation — each is
    * read twice (the join and its own max) — see the q121 spill note.
    */
  private def hitsRoundSql(rounds: Int): String =
    (1 to rounds).map { k =>
      s"""ra$k AS MATERIALIZED (
         |  SELECT de.t AS v, sum(h.score) AS raw
         |  FROM de JOIN h${k - 1} h ON h.v = de.s GROUP BY de.t),
         |a$k AS MATERIALIZED (
         |  SELECT v, CAST(floor((CAST(1000000 AS DECIMAL(38,0)) * raw) / (SELECT max(raw) FROM ra$k)) AS BIGINT) AS score
         |  FROM ra$k),
         |rh$k AS MATERIALIZED (
         |  SELECT de.s AS v, sum(a.score) AS raw
         |  FROM de JOIN a$k a ON a.v = de.t GROUP BY de.s),
         |h$k AS MATERIALIZED (
         |  SELECT v, CAST(floor((CAST(1000000 AS DECIMAL(38,0)) * raw) / (SELECT max(raw) FROM rh$k)) AS BIGINT) AS score
         |  FROM rh$k)""".stripMargin
    }.mkString(",\n")

  /** Rolling 7-day DISTINCT users per day — the distinct-over-sliding-
    * window aggregate that plain window functions cannot express
    * scalably (COUNT(DISTINCT) OVER a range frame re-scans every frame).
    * The scalable shape is the COVER EXPLODE: each (user, active day)
    * pair covers days d..d+6, so a bounded 7× explode + distinct + one
    * hash agg answers every day at once — no range self-join of the fact
    * table, no per-day rescans. Restricted to days that had any
    * activity (semi-join on the distinct-day frame).
    */
  val q185_rolling_distinct: QueryDef = q(
    "q185_rolling_distinct",
    """WITH ad AS (
      |  SELECT DISTINCT user_id,
      |    CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day
      |  FROM events),
      |days AS (SELECT DISTINCT day FROM ad)
      |SELECT d.day, CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_users
      |FROM days d
      |JOIN ad a ON a.day BETWEEN d.day - 6 AND d.day
      |GROUP BY d.day
      |ORDER BY d.day""".stripMargin,
    "Rolling 7-day distinct users per active day — bounded cover-explode " +
      "engine plan vs the oracle's range join") { (s, d) =>
    val ad = Tables.events(s, d)
      .select(col("user_id"), expr("ts_sec div 86400").as("day"))
      .distinct()
    val days = ad.select("day").distinct()
    ad.select(col("user_id"), explode(expr("sequence(day, day + 6)")).as("day"))
      .distinct()
      .join(days, Seq("day"), "left_semi")
      .groupBy("day").agg(count(lit(1)).as("n_users"))
      .orderBy("day")
  }

  /** A/B conversion-rate lift with an EXACT rational two-proportion
    * z² statistic: variants split by seeded md5 (first hex digit < '8'
    * → A), conversion = the user ever purchased. Algebra cleared of
    * every division:
    *
    *   z² = (c_a·n_b − c_b·n_a)² · N / (n_a·n_b·C·(N−C))
    *
    * (C = c_a+c_b, N = n_a+n_b), emitted floor-ppm; lift = p_a/p_b
    * floor-ppm. Exact for variant populations up to ~10⁹ users (the
    * squared cross-term is the DECIMAL(38) binding constraint —
    * pre-scale counts beyond that). Degenerate inputs (no conversions,
    * or a conversion rate of 1) emit 0 via the same CASE on both
    * engines. One corpus pass → user-sized agg → one row.
    */
  val q186_ab_lift: QueryDef = q(
    "q186_ab_lift",
    """WITH u AS (
      |  SELECT user_id,
      |    CASE WHEN substr(md5('ab:' || CAST(user_id AS STRING)), 1, 1) < '8'
      |      THEN 'A' ELSE 'B' END AS variant,
      |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
      |  FROM events GROUP BY user_id),
      |agg AS (
      |  SELECT
      |    sum(CASE WHEN variant = 'A' THEN 1 ELSE 0 END) AS n_a,
      |    sum(CASE WHEN variant = 'B' THEN 1 ELSE 0 END) AS n_b,
      |    sum(CASE WHEN variant = 'A' THEN conv ELSE 0 END) AS c_a,
      |    sum(CASE WHEN variant = 'B' THEN conv ELSE 0 END) AS c_b
      |  FROM u)
      |, nd AS (
      |  SELECT n_a, n_b, c_a, c_b,
      |    CAST(1000000 AS DECIMAL(38,0)) * c_a * n_b AS lnum,
      |    CAST(n_a AS DECIMAL(38,0)) * c_b AS lden,
      |    CAST(1000000 AS DECIMAL(38,0))
      |      * (CAST(c_a AS DECIMAL(38,0)) * n_b - CAST(c_b AS DECIMAL(38,0)) * n_a)
      |      * (CAST(c_a AS DECIMAL(38,0)) * n_b - CAST(c_b AS DECIMAL(38,0)) * n_a)
      |      * (n_a + n_b) AS znum,
      |    CAST(n_a AS DECIMAL(38,0)) * n_b * (c_a + c_b)
      |      * (n_a + n_b - c_a - c_b) AS zden
      |  FROM agg)
      |SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
      |  CAST(c_a AS BIGINT) AS conv_a, CAST(c_b AS BIGINT) AS conv_b,
      |  CAST(CASE WHEN c_b = 0 OR n_a = 0 THEN 0
      |    ELSE CAST(round(CAST(lnum - (lnum % lden) AS DOUBLE)
      |      / CAST(lden AS DOUBLE)) AS BIGINT) END
      |    AS BIGINT) AS lift_ppm,
      |  CAST(CASE WHEN n_a = 0 OR n_b = 0 OR c_a + c_b = 0
      |         OR c_a + c_b = n_a + n_b THEN 0
      |    ELSE CAST(round(CAST(znum - (znum % zden) AS DOUBLE)
      |      / CAST(zden AS DOUBLE)) AS BIGINT) END
      |    AS BIGINT) AS z2_ppm
      |FROM nd""".stripMargin,
    "A/B conversion lift + exact rational two-proportion z^2 (floor-ppm, " +
      "division-free algebra) — md5 variant split shared with the oracle") {
    (s, d) =>
      val u = Tables.events(s, d)
        .groupBy("user_id")
        .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("conv"))
        .withColumn("variant",
          when(substring(md5(concat(lit("ab:"), col("user_id").cast(StringType))),
            1, 1) < "8", "A").otherwise("B"))
      u.agg(
          sum(when(col("variant") === "A", 1L).otherwise(0L)).as("n_a"),
          sum(when(col("variant") === "B", 1L).otherwise(0L)).as("n_b"),
          sum(when(col("variant") === "A", col("conv")).otherwise(0L)).as("c_a"),
          sum(when(col("variant") === "B", col("conv")).otherwise(0L)).as("c_b"))
        .selectExpr(
          "CAST(n_a AS BIGINT) AS n_a", "CAST(n_b AS BIGINT) AS n_b",
          "CAST(c_a AS BIGINT) AS conv_a", "CAST(c_b AS BIGINT) AS conv_b",
          """CAST(CASE WHEN c_b = 0 OR n_a = 0 THEN 0
             ELSE (CAST(1000000 AS DECIMAL(38,0)) * c_a * n_b) div (n_a * c_b) END
             AS BIGINT) AS lift_ppm""",
          """CAST(CASE WHEN n_a = 0 OR n_b = 0 OR c_a + c_b = 0
                  OR c_a + c_b = n_a + n_b THEN 0
             ELSE (CAST(1000000 AS DECIMAL(38,0))
                 * (CAST(c_a AS DECIMAL(38,0)) * n_b - CAST(c_b AS DECIMAL(38,0)) * n_a)
                 * (CAST(c_a AS DECIMAL(38,0)) * n_b - CAST(c_b AS DECIMAL(38,0)) * n_a)
                 * (n_a + n_b))
               div (CAST(n_a AS DECIMAL(38,0)) * n_b * (c_a + c_b)
                 * (n_a + n_b - c_a - c_b)) END
             AS BIGINT) AS z2_ppm""")
  }

  /** Linear multi-touch attribution — every purchase's credit is split
    * equally (floor-ppm) across the user's click/view touches in the
    * strict 3-day window before it, then rolled up per touch channel.
    * The marketing-analytics join shape: conversions ⋈ touches on
    * user_id equality + a time-range predicate (user-co-partitioned, one
    * hash shuffle), per-purchase touch count as a window over the
    * purchase-id partition (bounded by touches per purchase, never
    * corpus-sized). Credit arithmetic is pure integer: 10⁶ div k per
    * touch, so a purchase's emitted credit is exactly k·(10⁶ div k).
    */
  val q187_linear_attribution: QueryDef = q(
    "q187_linear_attribution",
    """WITH t AS (
      |  SELECT user_id, ts, event_type FROM events
      |  WHERE event_type IN ('click', 'view')),
      |p AS (
      |  SELECT user_id, ts, event_id FROM events
      |  WHERE event_type = 'purchase'),
      |m AS (
      |  SELECT p.event_id AS pid, t.event_type AS touch_type
      |  FROM p JOIN t ON t.user_id = p.user_id
      |    AND t.ts < p.ts AND t.ts >= p.ts - INTERVAL 3 DAY),
      |km AS (SELECT *, count(*) OVER (PARTITION BY pid) AS k FROM m)
      |SELECT touch_type, CAST(count(*) AS BIGINT) AS n_touches,
      |  CAST(sum(CAST(floor(1000000 / k) AS BIGINT)) AS BIGINT) AS credit_ppm
      |FROM km GROUP BY touch_type ORDER BY touch_type""".stripMargin,
    "Linear multi-touch attribution: equal floor-ppm credit across the " +
      "3-day pre-purchase touches, rolled up per channel") { (s, d) =>
    // Bucketized interval join (RangeJoin's rewrite): a plain user-equi
    // join would generate touches×purchases candidate pairs PER USER
    // (quadratic under a celebrity user); quantizing time into 3-day
    // buckets and exploding each touch into (bk, bk+1) bounds the
    // candidates per purchase to the touches of a 6-day span.
    val ev = Tables.events(s, d)
    val win = 259200L // 3 days, seconds
    val touches = ev.filter(col("event_type").isin("click", "view"))
      .select(col("user_id"), col("ts_ns").as("t_ts"),
        col("event_type").as("touch_type"),
        explode(array(expr(s"ts_sec div $win"), expr(s"ts_sec div $win") + 1))
          .as("bk"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_ns").as("p_ts"), col("event_id").as("pid"),
        expr(s"ts_sec div $win").as("bk"))
    val m = purchases.join(touches, Seq("user_id", "bk"))
      .filter(col("t_ts") < col("p_ts") &&
        col("t_ts") >= col("p_ts") - lit(259200000000000L))
    val w = Window.partitionBy("pid")
    m.withColumn("k", count(lit(1)).over(w))
      .groupBy("touch_type")
      .agg(count(lit(1)).as("n_touches"),
        sum(expr("1000000 div k")).as("credit_ppm"))
      .orderBy("touch_type")
  }

  /** CUSUM change-point detection over per-type daily counts — the
    * sequential drift detector a rolling z-score (q167) cannot express:
    * S_d = max(0, S_{d−1} + (x_d − target)) accumulates small sustained
    * shifts; alarm when S_d > 2·target. The recurrence is inherently
    * sequential, but only over the AGGREGATE frame (days per type —
    * calendar-bounded, never corpus-sized): the corpus pass is one hash
    * agg; the per-type day series is then folded in-row with the
    * `aggregate` higher-order function over the sorted array (a
    * sentinel-0 accumulator head keeps element_at(-1) total). The
    * oracle replays the same recurrence as a recursive CTE over the
    * row-numbered day series. target = floor(mean daily count), exact
    * integer div.
    */
  val q188_cusum_changepoint: QueryDef = q(
    "q188_cusum_changepoint",
    """WITH RECURSIVE daily AS (
      |  SELECT event_type,
      |    CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
      |    CAST(count(*) AS BIGINT) AS x
      |  FROM events GROUP BY 1, 2),
      |tgt AS (
      |  SELECT event_type, CAST(CAST(floor(sum(x) / count(*)) AS BIGINT) AS BIGINT) AS target
      |  FROM daily GROUP BY event_type),
      |rd AS (
      |  SELECT d.event_type, d.day, d.x, t.target,
      |    row_number() OVER (PARTITION BY d.event_type ORDER BY d.day) AS rn
      |  FROM daily d JOIN tgt t USING (event_type)),
      |cus AS (
      |  SELECT event_type, day, x, target, rn,
      |    GREATEST(CAST(0 AS BIGINT), x - target) AS s
      |  FROM rd WHERE rn = 1
      |  UNION ALL
      |  SELECT rd.event_type, rd.day, rd.x, rd.target, rd.rn,
      |    GREATEST(CAST(0 AS BIGINT), cus.s + rd.x - rd.target)
      |  FROM rd JOIN cus ON cus.event_type = rd.event_type
      |    AND rd.rn = cus.rn + 1)
      |SELECT event_type, day, x, s,
      |  CAST(CASE WHEN s > 2 * target THEN 1 ELSE 0 END AS BIGINT) AS alarm
      |FROM cus ORDER BY event_type, day""".stripMargin,
    "CUSUM change-point detection per event type: sequential max(0, ...) " +
      "recurrence folded in-row over the day-series array; recursive-CTE oracle") {
    (s, d) =>
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), expr("ts_sec div 86400").as("day"))
        .agg(count(lit(1)).as("x"))
      daily.groupBy("event_type")
        .agg(sort_array(collect_list(struct(col("day"), col("x")))).as("seq"),
          expr("sum(x) div count(1)").as("target"))
        .withColumn("ss", expr(
          """slice(aggregate(seq, array(CAST(0 AS BIGINT)),
            |  (acc, e) -> concat(acc, array(greatest(CAST(0 AS BIGINT),
            |    element_at(acc, -1) + e.x - target)))), 2, size(seq))"""
            .stripMargin))
        .select(col("event_type"), col("target"),
          explode(arrays_zip(col("seq"), col("ss"))).as("z"))
        .select(col("event_type"),
          col("z.seq.day").as("day"), col("z.seq.x").as("x"),
          col("z.ss").as("s"),
          when(col("z.ss") > lit(2) * col("target"), 1L).otherwise(0L).as("alarm"))
        .orderBy("event_type", "day")
  }

  /** Additive Holt-Winters forecast (α=β=γ=1/2) over the per-type daily
    * count series — the FORECASTER the time-series family (q196
    * decompose, q253 OLS, q190 Theil-Sen, q244 EWMA) lacked. The three
    * coupled recurrences
    *
    *   l_t = ⌊(y_t − s_{t−7} + l_{t−1} + b_{t−1}) / 2⌋
    *   b_t = ⌊(l_t − l_{t−1} + b_{t−1}) / 2⌋
    *   s_t = ⌊(y_t − l_t + s_{t−7}) / 2⌋     (seasonal slot = day mod 7)
    *
    * run in EXACT integers: every halving is the portable floor
    * `(v − (v & 1)) div 2` (two's-complement parity bit makes the
    * numerator even, so truncation ≡ floor for negatives too — q244's
    * exact-binary-fraction discipline without a denominator blow-up).
    * Anchor: l₁ = y₁, b₁ = 0, seasonals all 0. The recurrence is
    * inherently sequential but only over the AGGREGATE day series (the
    * corpus pass is one hash agg); per type it folds in-row via the
    * `aggregate` HOF carrying a (l, b, s[7]) struct (q188's shape with
    * seasonal state). Forecast ŷ_{T+h} = l_T + h·b_T + s[(d_T+h) mod 7]
    * for h = 1..7. The oracle replays the identical recurrence as a
    * recursive CTE carrying the seven seasonal slots as columns — both
    * SQL texts are macro-expanded from the SAME Scala formula strings,
    * so the two engines cannot drift apart.
    */
  val q272_holt_winters: QueryDef = {
    // shared formula macros (Spark references acc./e., DuckDB c./rd.)
    def mk(f2div: String, sslot: String, acc: (String, String),
        x: String): (String, String, String) = {
      def f2(e: String) = s"((($e) - (($e) & 1)) $f2div 2)"
      val (l0, b0) = acc
      val v1 = s"($x - $sslot + $l0 + $b0)"
      val newl = f2(v1)
      val newb = f2(s"($newl - $l0 + $b0)")
      val news = f2(s"($x - $newl + $sslot)")
      (newl, newb, news)
    }
    val (sl, sb, ss) = mk("div",
      "element_at(acc.s, CAST(e.day % 7 AS INT) + 1)",
      ("acc.l", "acc.b"), "e.x")
    val foldExpr =
      s"""aggregate(
         |  slice(seq, 2, greatest(size(seq) - 1, 0)),
         |  named_struct(
         |    'l', CAST(element_at(seq, 1).x AS BIGINT),
         |    'b', CAST(0 AS BIGINT),
         |    's', array_repeat(CAST(0 AS BIGINT), 7),
         |    'd', CAST(element_at(seq, 1).day AS BIGINT)),
         |  (acc, e) -> named_struct(
         |    'l', $sl,
         |    'b', $sb,
         |    's', transform(acc.s,
         |      (sv, i) -> IF(i = CAST(e.day % 7 AS INT), $ss, sv)),
         |    'd', CAST(e.day AS BIGINT)))""".stripMargin
    val dowCase = (pfx: String) => (0 to 6)
      .map(i => s"WHEN $i THEN $pfx.s$i").mkString(" ", " ", " END")
    val (ol, ob, os) = mk("//",
      "(CASE rd.dow" + dowCase("c") + ")", ("c.l", "c.b"), "rd.x")
    val sCols = (0 to 6).map(i =>
      s"CASE WHEN rd.dow = $i THEN $os ELSE c.s$i END AS s$i")
      .mkString(",\n    ")
    val oracleSql =
      s"""WITH RECURSIVE daily AS (
         |  SELECT event_type,
         |    CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         |    CAST(count(*) AS BIGINT) AS x
         |  FROM events GROUP BY 1, 2),
         |rd AS (
         |  SELECT event_type, day, CAST(day % 7 AS BIGINT) AS dow, x,
         |    row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn
         |  FROM daily),
         |hw AS (
         |  SELECT event_type, day, dow, x, rn,
         |    x AS l, CAST(0 AS BIGINT) AS b,
         |    CAST(0 AS BIGINT) AS s0, CAST(0 AS BIGINT) AS s1,
         |    CAST(0 AS BIGINT) AS s2, CAST(0 AS BIGINT) AS s3,
         |    CAST(0 AS BIGINT) AS s4, CAST(0 AS BIGINT) AS s5,
         |    CAST(0 AS BIGINT) AS s6
         |  FROM rd WHERE rn = 1
         |  UNION ALL
         |  SELECT rd.event_type, rd.day, rd.dow, rd.x, rd.rn,
         |    $ol AS l,
         |    $ob AS b,
         |    $sCols
         |  FROM rd JOIN hw c ON c.event_type = rd.event_type
         |    AND rd.rn = c.rn + 1),
         |lastrow AS (
         |  SELECT h.* FROM hw h
         |  JOIN (SELECT event_type, max(rn) AS mr FROM hw GROUP BY 1) m
         |    ON m.event_type = h.event_type AND h.rn = m.mr),
         |hs AS (SELECT h FROM range(1, 8) AS t(h))
         |SELECT l.event_type, CAST(hs.h AS BIGINT) AS h,
         |  CAST(l.l + hs.h * l.b + (CASE CAST((l.day + hs.h) % 7 AS BIGINT)
         |   ${dowCase("l")}) AS BIGINT) AS forecast
         |FROM lastrow l, hs ORDER BY event_type, h""".stripMargin
    QueryDef(
      "q272_holt_winters",
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(col("event_type"), expr("ts_sec div 86400").as("day"))
          .agg(count(lit(1)).as("x"))
        daily.groupBy("event_type")
          .agg(sort_array(collect_list(struct(col("day"), col("x"))))
            .as("seq"))
          .withColumn("st", expr(foldExpr))
          .select(col("event_type"),
            explode(expr("sequence(1, 7)")).as("h"),
            expr("st.l").as("l"), expr("st.b").as("b"),
            expr("st.s").as("sarr"), expr("st.d").as("lastd"))
          .select(col("event_type"), col("h").cast(LongType).as("h"),
            (col("l") + col("h") * col("b") +
              expr("element_at(sarr, CAST((lastd + h) % 7 AS INT) + 1)"))
              .cast(LongType).as("forecast"))
          .orderBy("event_type", "h")
      },
      Some(oracleSql),
      "Additive Holt-Winters (α=β=γ=1/2) daily forecast, h=1..7: exact " +
        "portable-floor integer recurrences folded in-row per type; " +
        "macro-shared recursive-CTE oracle")
  }

  /** POSITION-BASED (U-shaped) multi-touch attribution — the 40/20/40
    * model beside q187's equal split: first and last touch in the 3-day
    * pre-purchase window get 400,000 ppm each, the middles share
    * 200,000 (floor each; 1 touch → 10⁶, 2 touches → 500,000/500,000).
    * Same bucketized interval-join shape as q187 (quantized time
    * buckets bound candidates per purchase — celebrity-user safe); the
    * ordering that defines first/last is the total order
    * (touch ts, touch event_id), replayed identically by the oracle.
    */
  val q296_position_attribution: QueryDef = q(
    "q296_position_attribution",
    """WITH t AS (
      |  SELECT user_id, ts, event_id, event_type FROM events
      |  WHERE event_type IN ('click', 'view')),
      |p AS (
      |  SELECT user_id, ts, event_id FROM events
      |  WHERE event_type = 'purchase'),
      |m AS (
      |  SELECT p.event_id AS pid, t.event_type AS touch_type,
      |    t.ts AS tts, t.event_id AS teid
      |  FROM p JOIN t ON t.user_id = p.user_id
      |    AND t.ts < p.ts AND t.ts >= p.ts - INTERVAL 3 DAY),
      |km AS (
      |  SELECT *, count(*) OVER (PARTITION BY pid) AS k,
      |    row_number() OVER (PARTITION BY pid ORDER BY tts, teid) AS rn
      |  FROM m),
      |cr AS (
      |  SELECT touch_type,
      |    CASE WHEN k = 1 THEN 1000000
      |         WHEN k = 2 THEN 500000
      |         WHEN rn = 1 OR rn = k THEN 400000
      |         ELSE CAST(floor(200000 / (k - 2)) AS BIGINT) END AS credit
      |  FROM km)
      |SELECT touch_type, CAST(count(*) AS BIGINT) AS n_touches,
      |  CAST(sum(credit) AS BIGINT) AS credit_ppm
      |FROM cr GROUP BY 1 ORDER BY touch_type""".stripMargin,
    "U-shaped (40/20/40) multi-touch attribution over the 3-day " +
      "pre-purchase window — bucketized interval join, exact floor-ppm " +
      "credit, total-order first/last") { (s, d) =>
    val ev = Tables.events(s, d)
    val win = 259200L
    val touches = ev.filter(col("event_type").isin("click", "view"))
      .select(col("user_id"), col("ts_ns").as("t_ts"),
        col("event_id").as("teid"), col("event_type").as("touch_type"),
        explode(array(expr(s"ts_sec div $win"),
          expr(s"ts_sec div $win") + 1)).as("bk"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_ns").as("p_ts"),
        col("event_id").as("pid"), expr(s"ts_sec div $win").as("bk"))
    val m = purchases.join(touches, Seq("user_id", "bk"))
      .filter(col("t_ts") < col("p_ts") &&
        col("t_ts") >= col("p_ts") - lit(259200000000000L))
    val wp = Window.partitionBy("pid")
    val wo = Window.partitionBy("pid").orderBy("t_ts", "teid")
    m.withColumn("k", count(lit(1)).over(wp))
      .withColumn("rn", row_number().over(wo))
      .withColumn("credit",
        when(col("k") === 1, 1000000L)
          .when(col("k") === 2, 500000L)
          .when(col("rn") === 1 || col("rn") === col("k"), 400000L)
          .otherwise(expr("200000 div (k - 2)")))
      .groupBy("touch_type")
      .agg(count(lit(1)).as("n_touches"),
        sum("credit").cast(LongType).as("credit_ppm"))
      .orderBy("touch_type")
  }

  /** KENDALL tau-a between each type's daily COUNT ranking and daily
    * REVENUE ranking — do busy days earn proportionally? Exact integer
    * concordant/discordant pair counts over the AGGREGATE day frame
    * (days² pairs per type, calendar-bounded — the self-join is
    * type-equi, never cartesian), tau in sign-normalized floor-ppm.
    * No ranks materialized: sign agreement of the raw (count, revenue)
    * deltas is rank agreement.
    */
  val q297_kendall_tau: QueryDef = q(
    "q297_kendall_tau",
    """WITH daily AS (
      |  SELECT event_type,
      |    CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
      |    CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
      |      AS BIGINT) AS rev
      |  FROM events GROUP BY 1, 2),
      |pairs AS (
      |  SELECT a.event_type,
      |    CASE WHEN (a.n > b.n AND a.rev > b.rev)
      |           OR (a.n < b.n AND a.rev < b.rev) THEN 1 ELSE 0 END
      |      AS conc,
      |    CASE WHEN (a.n > b.n AND a.rev < b.rev)
      |           OR (a.n < b.n AND a.rev > b.rev) THEN 1 ELSE 0 END
      |      AS disc
      |  FROM daily a JOIN daily b
      |    ON b.event_type = a.event_type AND a.day < b.day),
      |agg AS (
      |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_pairs,
      |    CAST(sum(conc) AS BIGINT) AS c, CAST(sum(disc) AS BIGINT) AS d
      |  FROM pairs GROUP BY 1)
      |SELECT event_type, n_pairs, c AS concordant, d AS discordant,
      |  CAST(CASE WHEN c >= d
      |    THEN CAST(floor((1000000 * (c - d)) / n_pairs) AS BIGINT)
      |    ELSE -CAST(floor((1000000 * (d - c) + n_pairs - 1) / n_pairs) AS BIGINT) END
      |    AS BIGINT) AS tau_ppm
      |FROM agg ORDER BY event_type""".stripMargin,
    "Kendall tau-a between daily count and revenue rankings per type — " +
      "exact concordant/discordant pairs over the aggregate day frame, " +
      "sign-normalized floor-ppm") { (s, d) =>
    val daily = Tables.events(s, d)
      .groupBy(col("event_type"), expr("ts_sec div 86400").as("day"))
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)"))
          .cast(LongType).as("rev"))
    val a = daily.select(col("event_type"), col("day").as("d1"),
      col("n").as("n1"), col("rev").as("r1"))
    val b = daily.select(col("event_type"), col("day").as("d2"),
      col("n").as("n2"), col("rev").as("r2"))
    a.join(b, Seq("event_type")).filter(col("d1") < col("d2"))
      .select(col("event_type"),
        // sign agreement by direct comparison, never the delta product:
        // (n1-n2)*(r1-r2) can wrap int64 at large SF (revenue-cents
        // deltas ~1e12 × count deltas ~1e6+), silently flipping the
        // sign in non-ANSI Spark where DuckDB would raise
        when((col("n1") > col("n2") && col("r1") > col("r2")) ||
            (col("n1") < col("n2") && col("r1") < col("r2")), 1L)
          .otherwise(0L).as("conc"),
        when((col("n1") > col("n2") && col("r1") < col("r2")) ||
            (col("n1") < col("n2") && col("r1") > col("r2")), 1L)
          .otherwise(0L).as("disc"))
      .groupBy("event_type")
      .agg(count(lit(1)).cast(LongType).as("n_pairs"),
        sum("conc").cast(LongType).as("concordant"),
        sum("disc").cast(LongType).as("discordant"))
      .select(col("event_type"), col("n_pairs"), col("concordant"),
        col("discordant"),
        expr("""CAST(CASE WHEN concordant >= discordant
               | THEN (1000000 * (concordant - discordant)) div n_pairs
               | ELSE -((1000000 * (discordant - concordant) + n_pairs - 1)
               |   div n_pairs) END AS BIGINT)""".stripMargin)
          .as("tau_ppm"))
      .orderBy("event_type")
  }

  /** LOUVAIN-QUALITY REFINEMENT of the LPA communities — q252 scores
    * the LPA partition; this runs ONE greedy modularity-refinement
    * round on top ([[graft.ops.Graph.modularityMerges]]: merge adjacent
    * communities when ΔQ > 0, mutual-best deterministic matching) and
    * proves the refinement helped: q_refined ≥ q_lpa gated as a
    * computed property the oracle pins to literal 1, with BOTH
    * modularities value-oracled. Because mutual-best merges are
    * disjoint, the refined Q is q252's shifted rational plus
    * Σ(4m·e12 − 2·deg1·deg2) over the merge frame — aggregate-frame
    * arithmetic only, no re-tagging of edges, no per-node sequential
    * scan. Same DECIMAL(38)/HUGEINT guards as q252.
    */
  val q301_louvain_refine: QueryDef = {
    def qppm(x: String): String =
      "CAST((CAST(1000000 AS DECIMAL(38,0)) * " +
        s"(CAST(4 AS DECIMAL(38,0)) * m_total * m_total + $x)) div " +
        "(CAST(4 AS DECIMAL(38,0)) * m_total * m_total) - 1000000 " +
        "AS BIGINT)"
    QueryDef(
      "q301_louvain_refine",
      (s, d) => {
        val e = weightedEdges(s, d).select(col("source").as("a"),
          col("target").as("b"), col("weight").as("w"))
        val lbl = graft.ops.Graph.labelPropagation(e, rounds = 4)
        val tagged = e
          .join(lbl.select(col("v").as("a"), col("lbl").as("la")), Seq("a"))
          .join(lbl.select(col("v").as("b"), col("lbl").as("lb")), Seq("b"))
        val intra = tagged.filter(col("la") === col("lb"))
          .groupBy(col("la").as("community")).agg(sum("w").as("ec"))
        val degc = e.select(col("a").as("v"), col("w"))
          .unionAll(e.select(col("b").as("v"), col("w")))
          .groupBy("v").agg(sum("w").as("dg"))
          .join(lbl, Seq("v"))
          .groupBy(col("lbl").as("community")).agg(sum("dg").as("degc"))
        val m = e.agg(sum("w").cast(LongType).as("m"))
        val lpaAgg = degc.join(intra, Seq("community"), "left")
          .withColumn("ec", coalesce(col("ec"), lit(0L)))
          .crossJoin(broadcast(m))
          .agg(count(lit(1)).cast(LongType).as("n_comm"),
            sum(expr("CAST(4 AS DECIMAL(38,0)) * m * ec - " +
              "CAST(degc AS DECIMAL(38,0)) * degc")).as("num"),
            max("m").as("m_total"))
        val mergeAgg = graft.ops.Graph.modularityMerges(e, lbl)
          .crossJoin(broadcast(m))
          .agg(count(lit(1)).cast(LongType).as("n_merges"),
            expr("coalesce(sum(CAST(4 AS DECIMAL(38,0)) * m * e12 - " +
              "CAST(2 AS DECIMAL(38,0)) * deg1 * deg2), " +
              "CAST(0 AS DECIMAL(38,0)))").as("dnum"))
        lpaAgg.crossJoin(broadcast(mergeAgg))
          .select(col("n_comm").as("n_comm_lpa"),
            (col("n_comm") - col("n_merges")).cast(LongType)
              .as("n_comm_refined"),
            expr(qppm("num")).as("q_lpa_ppm"),
            expr(qppm("(num + dnum)")).as("q_refined_ppm"))
          .withColumn("improved",
            when(col("q_refined_ppm") >= col("q_lpa_ppm"), 1L)
              .otherwise(0L))
      },
      Some(edgesSql +
        s""",
          |g AS MATERIALIZED (
          |  SELECT a AS s, b AS t, weight AS w FROM we
          |  UNION ALL SELECT b AS s, a AS t, weight AS w FROM we),
          |l0 AS MATERIALIZED (SELECT DISTINCT s AS v, s AS lbl FROM g),
          |${lpaRoundSql(4)},
          |e AS (SELECT a, b, weight AS w FROM we),
          |m AS (SELECT CAST(SUM(w) AS BIGINT) AS m FROM e),
          |intra AS (
          |  SELECT la.lbl AS community, SUM(e.w) AS ec
          |  FROM e JOIN l4 la ON la.v = e.a JOIN l4 lb2 ON lb2.v = e.b
          |  WHERE la.lbl = lb2.lbl GROUP BY 1),
          |degc AS (
          |  SELECT l.lbl AS c, SUM(d.dg) AS degc
          |  FROM (SELECT v, SUM(w) AS dg FROM (
          |          SELECT a AS v, w FROM e
          |          UNION ALL SELECT b AS v, w FROM e) GROUP BY v) d
          |  JOIN l4 l ON l.v = d.v GROUP BY 1),
          |lpaagg AS (
          |  SELECT CAST(COUNT(*) AS BIGINT) AS n_comm,
          |    SUM(CAST(4 AS DECIMAL(38,0)) * m.m * COALESCE(i.ec, 0)
          |      - CAST(dc.degc AS DECIMAL(38,0)) * dc.degc) AS num
          |  FROM degc dc LEFT JOIN intra i ON i.community = dc.c, m),
          |cpairs AS (
          |  SELECT LEAST(la.lbl, lb2.lbl) AS c1,
          |    GREATEST(la.lbl, lb2.lbl) AS c2, SUM(e.w) AS e12
          |  FROM e JOIN l4 la ON la.v = e.a JOIN l4 lb2 ON lb2.v = e.b
          |  WHERE la.lbl <> lb2.lbl GROUP BY 1, 2),
          |sym AS (
          |  SELECT c1 AS c, c2 AS nb, e12 FROM cpairs
          |  UNION ALL SELECT c2 AS c, c1 AS nb, e12 FROM cpairs),
          |dq AS (
          |  SELECT s.c, s.nb, s.e12, d1.degc AS deg_c, d2.degc AS deg_nb,
          |    2 * CAST(m.m AS DECIMAL(38,0)) * s.e12
          |      - CAST(d1.degc AS DECIMAL(38,0)) * d2.degc AS dqn
          |  FROM sym s
          |  JOIN degc d1 ON d1.c = s.c
          |  JOIN degc d2 ON d2.c = s.nb, m
          |  WHERE 2 * CAST(m.m AS DECIMAL(38,0)) * s.e12
          |      - CAST(d1.degc AS DECIMAL(38,0)) * d2.degc > 0),
          |best AS (
          |  SELECT c, nb, e12, deg_c, deg_nb FROM (
          |    SELECT c, nb, e12, deg_c, deg_nb,
          |      row_number() OVER (PARTITION BY c ORDER BY dqn DESC, nb)
          |        AS rn
          |    FROM dq) t WHERE rn = 1),
          |mg AS (
          |  SELECT x.c AS c1, x.nb AS c2, x.e12,
          |    x.deg_c AS deg1, x.deg_nb AS deg2
          |  FROM best x JOIN best y ON y.c = x.nb AND y.nb = x.c
          |  WHERE x.c < x.nb),
          |mgagg AS (
          |  SELECT CAST(COUNT(*) AS BIGINT) AS n_merges,
          |    COALESCE(SUM(CAST(4 AS DECIMAL(38,0)) * m.m * e12
          |      - CAST(2 AS DECIMAL(38,0)) * deg1 * deg2), 0) AS dnum
          |  FROM mg, m)
          |, nd AS (
          |  SELECT la.n_comm, ma.n_merges,
          |    CAST(1000000 AS DECIMAL(38,0)) *
          |      (CAST(4 AS DECIMAL(38,0)) * m.m * m.m + la.num) AS num1,
          |    CAST(1000000 AS DECIMAL(38,0)) *
          |      (CAST(4 AS DECIMAL(38,0)) * m.m * m.m + la.num + ma.dnum)
          |      AS num2,
          |    CAST(4 AS DECIMAL(38,0)) * m.m * m.m AS den
          |  FROM lpaagg la, mgagg ma, m)
          |SELECT n_comm AS n_comm_lpa,
          |  CAST(n_comm - n_merges AS BIGINT) AS n_comm_refined,
          |  CAST(CAST(round(CAST(num1 - (num1 % den) AS DOUBLE)
          |    / CAST(den AS DOUBLE)) AS BIGINT) - 1000000 AS BIGINT)
          |    AS q_lpa_ppm,
          |  CAST(CAST(round(CAST(num2 - (num2 % den) AS DOUBLE)
          |    / CAST(den AS DOUBLE)) AS BIGINT) - 1000000 AS BIGINT)
          |    AS q_refined_ppm,
          |  CAST(1 AS BIGINT) AS improved
          |FROM nd""".stripMargin),
      "Louvain-quality refinement of the LPA partition: mutual-best " +
        "positive-ΔQ community merges, refined Q from the merge frame " +
        "alone, refined ≥ LPA gated (oracle literal 1)")
  }

  /** MULTI-LEVEL LOUVAIN — q301's one refinement round looped to a
    * fixpoint with community-graph CONTRACTION between levels
    * ([[graft.ops.Graph.louvain]]): level 0 is the LPA partition; each
    * level merges mutual-best positive-ΔQ community pairs and contracts,
    * so every level after entry runs on a community-sized graph that
    * shrinks monotonically. Exactly 3 levels are applied (a level past
    * the fixpoint is a no-op — zero merges, identical contraction — so
    * the output shape is deterministic at any SF). One row per level:
    * community count, modularity (q252's shifted exact-rational ppm,
    * value-oracled), and the monotone gate q_ppm(level) ≥
    * q_ppm(level−1) — Louvain's defining invariant, which holds exactly
    * because each round's merges have strictly positive DISJOINT ΔQ.
    * The final window orders 4 rows — bounded by the level count, never
    * data.
    */
  val q307_louvain_multilevel: QueryDef = {
    val nLevels = 3
    def levelSql(i: Int): String =
      s"""deg$i AS MATERIALIZED (
         |  SELECT c, SUM(w) AS degc FROM (
         |    SELECT a AS c, w FROM gc$i UNION ALL SELECT b AS c, w FROM gc$i)
         |  GROUP BY c),
         |st$i AS (
         |  SELECT CAST($i AS BIGINT) AS level,
         |    CAST(COUNT(*) AS BIGINT) AS n_comm,
         |    SUM(CAST(4 AS DECIMAL(38,0)) * m.m * COALESCE(sl.ecc, 0)
         |      - CAST(d.degc AS DECIMAL(38,0)) * d.degc) AS num
         |  FROM deg$i d LEFT JOIN
         |    (SELECT a AS c, w AS ecc FROM gc$i WHERE a = b) sl
         |    ON sl.c = d.c, m),
         |sym$i AS (
         |  SELECT a AS c, b AS nb, w AS e12 FROM gc$i WHERE a <> b
         |  UNION ALL
         |  SELECT b AS c, a AS nb, w AS e12 FROM gc$i WHERE a <> b),
         |dq$i AS (
         |  SELECT s.c, s.nb,
         |    2 * CAST(m.m AS DECIMAL(38,0)) * s.e12
         |      - CAST(d1.degc AS DECIMAL(38,0)) * d2.degc AS dqn
         |  FROM sym$i s
         |  JOIN deg$i d1 ON d1.c = s.c
         |  JOIN deg$i d2 ON d2.c = s.nb, m
         |  WHERE 2 * CAST(m.m AS DECIMAL(38,0)) * s.e12
         |      - CAST(d1.degc AS DECIMAL(38,0)) * d2.degc > 0),
         |best$i AS (
         |  SELECT c, nb FROM (
         |    SELECT c, nb,
         |      row_number() OVER (PARTITION BY c ORDER BY dqn DESC, nb) AS rn
         |    FROM dq$i) t WHERE rn = 1),
         |mg$i AS MATERIALIZED (
         |  SELECT x.c AS c1, x.nb AS c2
         |  FROM best$i x JOIN best$i y ON y.c = x.nb AND y.nb = x.c
         |  WHERE x.c < x.nb),
         |gc${i + 1} AS MATERIALIZED (
         |  SELECT LEAST(na, nb) AS a, GREATEST(na, nb) AS b, SUM(w) AS w
         |  FROM (
         |    SELECT COALESCE(ma.c1, g.a) AS na, COALESCE(mb.c1, g.b) AS nb,
         |      g.w
         |    FROM gc$i g
         |    LEFT JOIN mg$i ma ON ma.c2 = g.a
         |    LEFT JOIN mg$i mb ON mb.c2 = g.b)
         |  GROUP BY 1, 2)""".stripMargin
    val qppmSql = "CAST((CAST(1000000 AS DECIMAL(38,0)) * " +
      "(CAST(4 AS DECIMAL(38,0)) * m.m * m.m + num)) // " +
      "(CAST(4 AS DECIMAL(38,0)) * m.m * m.m) - 1000000 AS BIGINT)"
    QueryDef(
      "q307_louvain_multilevel",
      (s, d) => {
        val e = weightedEdges(s, d).select(col("source").as("a"),
          col("target").as("b"), col("weight").as("w"))
        val lbl = graft.ops.Graph.labelPropagation(e, rounds = 4)
        val (_, perLevel) = graft.ops.Graph.louvain(e, lbl, nLevels)
        def qppm(x: String): String =
          "CAST((CAST(1000000 AS DECIMAL(38,0)) * " +
            s"(CAST(4 AS DECIMAL(38,0)) * m_total * m_total + $x)) div " +
            "(CAST(4 AS DECIMAL(38,0)) * m_total * m_total) - 1000000 " +
            "AS BIGINT)"
        def levelStats(gc: DataFrame, lvl: Int): DataFrame = {
          val degc = gc.select(col("a").as("c"), col("w"))
            .unionByName(gc.select(col("b").as("c"), col("w")))
            .groupBy("c").agg(sum("w").as("degc"))
          val ecc = gc.filter(col("a") === col("b"))
            .select(col("a").as("c"), col("w").as("ecc"))
          val m = gc.agg(sum("w").cast(LongType).as("m_total"))
          degc.join(ecc, Seq("c"), "left")
            .withColumn("ecc", coalesce(col("ecc"), lit(0L)))
            .crossJoin(broadcast(m)) // 1-row modularity denominator
            .agg(count(lit(1)).cast(LongType).as("n_comm"),
              sum(expr("CAST(4 AS DECIMAL(38,0)) * m_total * ecc - " +
                "CAST(degc AS DECIMAL(38,0)) * degc")).as("num"),
              max("m_total").as("m_total"))
            .select(lit(lvl.toLong).as("level"), col("n_comm"),
              expr(qppm("num")).as("q_ppm"))
        }
        val wLvl = Window.orderBy("level") // 4 rows: the level count
        perLevel.zipWithIndex
          .map { case (gc, lvl) => levelStats(gc, lvl) }
          .reduce(_.unionByName(_))
          .withColumn("monotone",
            when(lag(col("q_ppm"), 1).over(wLvl).isNull ||
              col("q_ppm") >= lag(col("q_ppm"), 1).over(wLvl), 1L)
              .otherwise(0L))
          .orderBy("level")
      },
      Some(edgesSql +
        s""",
          |g AS MATERIALIZED (
          |  SELECT a AS s, b AS t, weight AS w FROM we
          |  UNION ALL SELECT b AS s, a AS t, weight AS w FROM we),
          |l0 AS MATERIALIZED (SELECT DISTINCT s AS v, s AS lbl FROM g),
          |${lpaRoundSql(4)},
          |e AS (SELECT a, b, weight AS w FROM we),
          |gc0 AS MATERIALIZED (
          |  SELECT LEAST(la.lbl, lb2.lbl) AS a,
          |    GREATEST(la.lbl, lb2.lbl) AS b, SUM(e.w) AS w
          |  FROM e JOIN l4 la ON la.v = e.a JOIN l4 lb2 ON lb2.v = e.b
          |  GROUP BY 1, 2),
          |m AS (SELECT CAST(SUM(w) AS BIGINT) AS m FROM gc0),
          |${(0 until nLevels).map(levelSql).mkString(",\n")},
          |deg$nLevels AS MATERIALIZED (
          |  SELECT c, SUM(w) AS degc FROM (
          |    SELECT a AS c, w FROM gc$nLevels
          |    UNION ALL SELECT b AS c, w FROM gc$nLevels)
          |  GROUP BY c),
          |st$nLevels AS (
          |  SELECT CAST($nLevels AS BIGINT) AS level,
          |    CAST(COUNT(*) AS BIGINT) AS n_comm,
          |    SUM(CAST(4 AS DECIMAL(38,0)) * m.m * COALESCE(sl.ecc, 0)
          |      - CAST(d.degc AS DECIMAL(38,0)) * d.degc) AS num
          |  FROM deg$nLevels d LEFT JOIN
          |    (SELECT a AS c, w AS ecc FROM gc$nLevels WHERE a = b) sl
          |    ON sl.c = d.c, m),
          |lv AS (
          |  SELECT level, n_comm, $qppmSql AS q_ppm
          |  FROM (${(0 to nLevels).map(i => s"SELECT * FROM st$i")
            .mkString(" UNION ALL ")}) u, m)
          |SELECT level, n_comm, q_ppm,
          |  CAST(CASE WHEN lag(q_ppm) OVER (ORDER BY level) IS NULL
          |    OR q_ppm >= lag(q_ppm) OVER (ORDER BY level)
          |    THEN 1 ELSE 0 END AS BIGINT) AS monotone
          |FROM lv ORDER BY level""".stripMargin),
      "Multi-level Louvain: mutual-best merges + community-graph " +
        "contraction per level, modularity monotone non-decreasing, " +
        "per-level Q value-oracled")
  }

  /** DAILY PERCENTILE BANDS — the p10/p50/p90 ribbon a metrics
    * dashboard draws per type over time, in exact discrete order
    * statistics: per (type, day) value histogram + cumulative over
    * distinct cents, band position = ⌈n·p/100⌉ (portable ceil
    * `(n·p + 99) div 100`), band value = min cents with cum ≥ position.
    * Windows partition by (type, day) — bounded by distinct values per
    * cell, never corpus-wide; one corpus hash agg feeds everything.
    */
  val q294_daily_percentile_bands: QueryDef = q(
    "q294_daily_percentile_bands",
    """WITH ev AS (
      |  SELECT event_type,
      |    CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
      |  FROM events),
      |gv AS (SELECT event_type, day, c, count(*) AS m
      |       FROM ev GROUP BY 1, 2, 3),
      |tot AS (SELECT event_type, day, CAST(sum(m) AS BIGINT) AS n
      |        FROM gv GROUP BY 1, 2),
      |cum AS (
      |  SELECT g.event_type, g.day, g.c, t.n,
      |    sum(g.m) OVER (PARTITION BY g.event_type, g.day
      |      ORDER BY g.c) AS cm
      |  FROM gv g JOIN tot t
      |    ON t.event_type = g.event_type AND t.day = g.day)
      |SELECT event_type, day, CAST(max(n) AS BIGINT) AS n,
      |  CAST(min(CASE WHEN cm >= CAST(floor((n * 10 + 99) / 100) AS BIGINT) THEN c END)
      |    AS BIGINT) AS p10_cents,
      |  CAST(min(CASE WHEN cm >= CAST(floor((n * 50 + 99) / 100) AS BIGINT) THEN c END)
      |    AS BIGINT) AS p50_cents,
      |  CAST(min(CASE WHEN cm >= CAST(floor((n * 90 + 99) / 100) AS BIGINT) THEN c END)
      |    AS BIGINT) AS p90_cents
      |FROM cum GROUP BY 1, 2 ORDER BY event_type, day""".stripMargin,
    "Daily p10/p50/p90 bands per type in exact discrete cents — " +
      "per-cell value histogram + cumulative, portable ceil positions") {
    (s, d) =>
      val ev = Tables.events(s, d).select(col("event_type"),
        expr("ts_sec div 86400").as("day"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("c"))
      val gv = ev.groupBy("event_type", "day", "c")
        .agg(count(lit(1)).as("m"))
      val tot = gv.groupBy("event_type", "day").agg(sum("m").as("n"))
      val w = Window.partitionBy("event_type", "day").orderBy("c")
      def band(p: Int, out: String) =
        min(when(col("cm") >= expr(s"(n * $p + 99) div 100"), col("c")))
          .cast(LongType).as(out)
      gv.withColumn("cm", sum("m").over(w))
        .join(tot, Seq("event_type", "day"))
        .groupBy("event_type", "day")
        .agg(max("n").cast(LongType).as("n"),
          band(10, "p10_cents"), band(50, "p50_cents"),
          band(90, "p90_cents"))
        .orderBy("event_type", "day")
  }

  /** LOG₂-BUCKETED value histogram (the HDR-histogram shape latency
    * systems keep): bucket = ⌊log₂ cents⌋ computed WITHOUT floats as
    * `length(bin(c)) − 1` — the binary-string length trick both engines
    * evaluate identically on positive BIGINTs. Per (type, bucket):
    * count and exact bucket bounds observed. Constant buckets per
    * decade of range, one hash agg — the fixed-memory histogram that
    * replaces raw latency retention at 100 TB.
    */
  val q295_log2_histogram: QueryDef = q(
    "q295_log2_histogram",
    """WITH ev AS (
      |  SELECT event_type,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
      |  FROM events)
      |SELECT event_type,
      |  CAST(length(bin(c)) - 1 AS BIGINT) AS bucket,
      |  CAST(count(*) AS BIGINT) AS n,
      |  CAST(min(c) AS BIGINT) AS lo_cents,
      |  CAST(max(c) AS BIGINT) AS hi_cents
      |FROM ev WHERE c > 0
      |GROUP BY 1, 2 ORDER BY event_type, bucket""".stripMargin,
    "Power-of-two value histogram per type (HDR shape): floor-log2 via " +
      "the bin-string length, no floats, one hash agg") { (s, d) =>
    Tables.events(s, d)
      .select(col("event_type"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("c"))
      .filter(col("c") > 0)
      .groupBy(col("event_type"),
        (length(bin(col("c"))) - 1).cast(LongType).as("bucket"))
      .agg(count(lit(1)).as("n"),
        min("c").cast(LongType).as("lo_cents"),
        max("c").cast(LongType).as("hi_cents"))
      .orderBy("event_type", "bucket")
  }

  /** Graph ROBUSTNESS under targeted hub removal (percolation audit):
    * delete the top-5 degree hubs (deterministic tie-break) and compare
    * the largest connected component before/after — the standard attack
    * -tolerance report for an interaction network. Engine: degree agg →
    * 5-row hub frame → two anti-joins → the checkpointed
    * pointer-jumping components both times; the oracle runs TWO
    * recursive transitive closures (full and hub-filtered edge sets)
    * and labels by minimum reachable id, so a component merge missed
    * by either pass hash-fails the size digest.
    */
  val q292_robustness: QueryDef = q(
    "q292_robustness",
    """WITH RECURSIVE seq AS (
      |  SELECT user_id, lag(user_id) OVER (ORDER BY ts, event_id) AS prev
      |  FROM events),
      |e AS (
      |  SELECT DISTINCT LEAST(prev, user_id) AS a,
      |    GREATEST(prev, user_id) AS b
      |  FROM seq WHERE prev IS NOT NULL AND prev <> user_id),
      |deg AS (
      |  SELECT v, count(*) AS d FROM (
      |    SELECT a AS v FROM e UNION ALL SELECT b AS v FROM e) t
      |  GROUP BY v),
      |hubs AS (SELECT v FROM deg ORDER BY d DESC, v LIMIT 5),
      |e2 AS (
      |  SELECT a, b FROM e
      |  WHERE a NOT IN (SELECT v FROM hubs)
      |    AND b NOT IN (SELECT v FROM hubs)),
      |u1 AS (SELECT a, b FROM e UNION SELECT b, a FROM e),
      |r1(a, b) AS (
      |  SELECT a, b FROM u1
      |  UNION SELECT r1.a, u1.b FROM r1 JOIN u1 ON r1.b = u1.a),
      |c1 AS (SELECT a AS node, LEAST(a, min(b)) AS lab FROM r1 GROUP BY a),
      |u2 AS (SELECT a, b FROM e2 UNION SELECT b, a FROM e2),
      |r2(a, b) AS (
      |  SELECT a, b FROM u2
      |  UNION SELECT r2.a, u2.b FROM r2 JOIN u2 ON r2.b = u2.a),
      |c2 AS (SELECT a AS node, LEAST(a, min(b)) AS lab FROM r2 GROUP BY a)
      |SELECT * FROM (
      |  SELECT 'nodes_orig' AS metric, CAST(count(*) AS BIGINT) AS value
      |    FROM c1
      |  UNION ALL SELECT 'largest_orig', CAST(max(n) AS BIGINT)
      |    FROM (SELECT count(*) AS n FROM c1 GROUP BY lab) t
      |  UNION ALL SELECT 'nodes_after', CAST(count(*) AS BIGINT) FROM c2
      |  UNION ALL SELECT 'largest_after', CAST(coalesce(max(n), 0)
      |      AS BIGINT)
      |    FROM (SELECT count(*) AS n FROM c2 GROUP BY lab) t
      |  UNION ALL SELECT 'removed_hubs', CAST(count(*) AS BIGINT)
      |    FROM hubs) t
      |ORDER BY metric""".stripMargin,
    "Attack tolerance: largest component before/after removing the " +
      "top-5 degree hubs — components via pointer jumping, double " +
      "recursive-closure oracle") { (s, d) =>
    val e = weightedEdges(s, d).select(col("source").as("a"),
      col("target").as("b"))
    val deg = graft.ops.Graph.degrees(e)
    val hubs = deg.orderBy(col("deg").desc, col("v")).limit(5)
      .select("v")
    val e2 = e.join(hubs.select(col("v").as("a")), Seq("a"), "left_anti")
      .join(hubs.select(col("v").as("b")), Seq("b"), "left_anti")
    def stats(edges: DataFrame, tag: String): DataFrame = {
      val sizes = graft.ops.Dedup.connectedComponents(edges, "a", "b")
        .groupBy("label").agg(count(lit(1)).as("n"))
      sizes.agg(coalesce(sum("n"), lit(0L)).cast(LongType).as("nodes"),
          coalesce(max("n"), lit(0L)).cast(LongType).as("largest"))
        .select(explode(array(
          struct(lit(s"nodes_$tag").as("metric"), col("nodes").as("value")),
          struct(lit(s"largest_$tag").as("metric"),
            col("largest").as("value")))).as("r"))
        .select("r.*")
    }
    stats(e, "orig").unionByName(stats(e2, "after"))
      .unionByName(hubs.agg(count(lit(1)).cast(LongType).as("value"))
        .select(lit("removed_hubs").as("metric"), col("value")))
      .orderBy("metric")
  }

  /** RICH-CLUB coefficient — do the best-connected nodes preferentially
    * link to EACH OTHER? φ = 2·E_rich / (n_rich·(n_rich−1)) over the
    * top-20 degree nodes (deterministic tie-break), exact floor-ppm.
    * Engine: degree agg → 20-row club frame → two semi-joins count the
    * intra-club edges; nothing corpus-sized moves after the degree agg.
    */
  val q293_rich_club: QueryDef = q(
    "q293_rich_club",
    """WITH seq AS (
      |  SELECT user_id, lag(user_id) OVER (ORDER BY ts, event_id) AS prev
      |  FROM events),
      |e AS (
      |  SELECT DISTINCT LEAST(prev, user_id) AS a,
      |    GREATEST(prev, user_id) AS b
      |  FROM seq WHERE prev IS NOT NULL AND prev <> user_id),
      |deg AS (
      |  SELECT v, count(*) AS d FROM (
      |    SELECT a AS v FROM e UNION ALL SELECT b AS v FROM e) t
      |  GROUP BY v),
      |club AS (SELECT v FROM deg ORDER BY d DESC, v LIMIT 20),
      |er AS (
      |  SELECT count(*) AS m FROM e
      |  WHERE a IN (SELECT v FROM club) AND b IN (SELECT v FROM club))
      |SELECT CAST(20 AS BIGINT) AS n_rich,
      |  CAST(m AS BIGINT) AS e_rich,
      |  CAST(floor((CAST(2000000 AS BIGINT) * m) / (20 * 19)) AS BIGINT)
      |    AS phi_ppm
      |FROM er""".stripMargin,
    "Rich-club coefficient of the top-20 degree nodes, exact floor-ppm") {
    (s, d) =>
      val e = weightedEdges(s, d).select(col("source").as("a"),
        col("target").as("b"))
      val club = graft.ops.Graph.degrees(e)
        .orderBy(col("deg").desc, col("v")).limit(20).select("v")
      e.join(club.select(col("v").as("a")), Seq("a"), "left_semi")
        .join(club.select(col("v").as("b")), Seq("b"), "left_semi")
        .agg(count(lit(1)).as("m"))
        .select(lit(20L).as("n_rich"), col("m").cast(LongType).as("e_rich"),
          expr("(CAST(2000000 AS BIGINT) * m) div (20 * 19)")
            .cast(LongType).as("phi_ppm"))
  }

  /** TOP MOVERS — the trending report: each type's rank among types by
    * daily count, and its day-over-day RANK DELTA (positive = climbed).
    * Two windows, both over the AGGREGATE (day × type) frame —
    * rank-by-count partitioned by day, lag-of-rank partitioned by type
    * — so the corpus pass is one hash agg and the ranking never touches
    * row-level data. Deterministic tie-break (count desc, type asc).
    */
  val q290_top_movers: QueryDef = q(
    "q290_top_movers",
    """WITH daily AS (
      |  SELECT event_type,
      |    CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1, 2),
      |rk AS (
      |  SELECT event_type, day, n,
      |    CAST(rank() OVER (PARTITION BY day
      |      ORDER BY n DESC, event_type) AS BIGINT) AS rnk
      |  FROM daily),
      |mv AS (
      |  SELECT event_type, day, n, rnk,
      |    lag(rnk) OVER (PARTITION BY event_type ORDER BY day) AS prev
      |  FROM rk)
      |SELECT event_type, day, n, rnk,
      |  CAST(prev - rnk AS BIGINT) AS rank_delta
      |FROM mv WHERE prev IS NOT NULL
      |ORDER BY day, event_type""".stripMargin,
    "Day-over-day rank movers per type: rank-by-count + lag-of-rank, " +
      "both windows over the aggregate day×type frame") { (s, d) =>
    val daily = Tables.events(s, d)
      .groupBy(col("event_type"), expr("ts_sec div 86400").as("day"))
      .agg(count(lit(1)).as("n"))
    val wDay = Window.partitionBy("day")
      .orderBy(col("n").desc, col("event_type"))
    val wType = Window.partitionBy("event_type").orderBy("day")
    daily.withColumn("rnk", rank().over(wDay).cast(LongType))
      .withColumn("prev", lag("rnk", 1).over(wType))
      .filter(col("prev").isNotNull)
      .select(col("event_type"), col("day"), col("n"), col("rnk"),
        (col("prev") - col("rnk")).cast(LongType).as("rank_delta"))
      .orderBy("day", "event_type")
  }

  /** TOTAL-VARIATION drift between the first and second half of each
    * type's day range — the distribution-drift metric that needs NO
    * logarithms (PSI and KL do, and floats drift across engines): over
    * $10 value bands, TV = ½ Σ_b |p_b − q_b| computed as the exact
    * cross-multiplied integer Σ|n1·N2 − n2·N1| / (2·N1·N2), published
    * floor-ppm with the DECIMAL(38) product guard. The corpus pass is
    * one hash agg per (type, half, band); the TV fold runs over the
    * band histogram (value-domain-bounded). The midpoint is one 1-row
    * min/max broadcast (the q193 one-row shape).
    */
  val q288_tv_drift: QueryDef = QueryDef(
    "q288_tv_drift",
    (s, d) => {
      val ev = Tables.events(s, d).select(col("event_type"),
        expr("ts_sec div 86400").as("day"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) div 1000")
          .as("band"))
      val mid = ev.agg(
        expr("(min(day) + max(day) + 1) div 2").as("mid"))
      val halves = ev.crossJoin(broadcast(mid))
        .withColumn("half", when(col("day") < col("mid"), 1L).otherwise(2L))
        .groupBy("event_type", "band", "half")
        .agg(count(lit(1)).as("m"))
      val piv = halves.groupBy("event_type", "band").agg(
        sum(when(col("half") === 1L, col("m")).otherwise(0L)).as("n1"),
        sum(when(col("half") === 2L, col("m")).otherwise(0L)).as("n2"))
      val tot = piv.groupBy("event_type")
        .agg(sum("n1").as("t1"), sum("n2").as("t2"))
      piv.join(tot, Seq("event_type"))
        .groupBy("event_type")
        .agg(max("t1").as("n_first"), max("t2").as("n_second"),
          sum(abs(col("n1") * col("t2") - col("n2") * col("t1")))
            .as("num"))
        .select(col("event_type"),
          col("n_first").cast(LongType).as("n_first"),
          col("n_second").cast(LongType).as("n_second"),
          expr("CAST((CAST(1000000 AS DECIMAL(38,0)) * num) div " +
            "(2 * n_first * n_second) AS BIGINT)").as("tv_ppm"))
        .orderBy("event_type")
    },
    Some("""WITH ev AS (
      |  SELECT event_type,
      |    CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
      |    CAST(floor(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) / 1000) AS BIGINT)
      |      AS band
      |  FROM events),
      |mid AS (SELECT CAST(floor((min(day) + max(day) + 1) / 2) AS BIGINT) AS mid FROM ev),
      |h AS (
      |  SELECT event_type, band,
      |    CASE WHEN day < (SELECT mid FROM mid) THEN 1 ELSE 2 END AS half,
      |    count(*) AS m
      |  FROM ev GROUP BY 1, 2, 3),
      |piv AS (
      |  SELECT event_type, band,
      |    sum(CASE WHEN half = 1 THEN m ELSE 0 END) AS n1,
      |    sum(CASE WHEN half = 2 THEN m ELSE 0 END) AS n2
      |  FROM h GROUP BY 1, 2),
      |tot AS (
      |  SELECT event_type, sum(n1) AS t1, sum(n2) AS t2
      |  FROM piv GROUP BY 1)
      |, nd AS (
      |  SELECT p.event_type,
      |    max(t.t1) AS t1, max(t.t2) AS t2,
      |    CAST(1000000 AS DECIMAL(38,0))
      |      * sum(abs(p.n1 * t.t2 - p.n2 * t.t1)) AS num,
      |    2 * max(t.t1) * max(t.t2) AS den
      |  FROM piv p JOIN tot t ON t.event_type = p.event_type
      |  GROUP BY 1)
      |SELECT event_type,
      |  CAST(t1 AS BIGINT) AS n_first,
      |  CAST(t2 AS BIGINT) AS n_second,
      |  CAST(CAST(round(CAST(num - (num % den) AS DOUBLE)
      |    / CAST(den AS DOUBLE)) AS BIGINT) AS BIGINT) AS tv_ppm
      |FROM nd ORDER BY event_type""".stripMargin),
    "Total-variation drift (first vs second half of the day range) per " +
      "type over $10 value bands — log-free exact cross-multiplied " +
      "integers, floor-ppm")

  /** Maximum DRAWDOWN of each type's cumulative daily net (the classic
    * risk analytic): cum_d = running Σ of daily cents, runmax_d = its
    * running max, drawdown = max(runmax − cum). Both windows partition
    * by type over the AGGREGATE day frame (calendar-bounded, never
    * corpus-sized); exact integer cents throughout.
    */
  val q289_max_drawdown: QueryDef = q(
    "q289_max_drawdown",
    """WITH daily AS (
      |  SELECT event_type,
      |    CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
      |    CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
      |      AS BIGINT) AS net
      |  FROM events GROUP BY 1, 2),
      |c AS (
      |  SELECT event_type, day, net,
      |    sum(net) OVER (PARTITION BY event_type ORDER BY day) AS cum
      |  FROM daily),
      |r AS (
      |  SELECT event_type, day, cum,
      |    max(cum) OVER (PARTITION BY event_type ORDER BY day) AS runmax
      |  FROM c)
      |SELECT event_type,
      |  CAST(count(*) AS BIGINT) AS n_days,
      |  CAST(max(runmax - cum) AS BIGINT) AS max_drawdown_cents,
      |  CAST(max(runmax) AS BIGINT) AS peak_cents
      |FROM r GROUP BY 1 ORDER BY event_type""".stripMargin,
    "Maximum drawdown of the cumulative daily net per type: two " +
      "key-partitioned windows over the aggregate day frame, exact cents") {
    (s, d) =>
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), expr("ts_sec div 86400").as("day"))
        .agg(sum(expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)"))
          .cast(LongType).as("net"))
      val w = Window.partitionBy("event_type").orderBy("day")
      daily.withColumn("cum", sum("net").over(w))
        .withColumn("runmax", max("cum").over(w))
        .groupBy("event_type")
        .agg(count(lit(1)).cast(LongType).as("n_days"),
          max(col("runmax") - col("cum")).cast(LongType)
            .as("max_drawdown_cents"),
          max("runmax").cast(LongType).as("peak_cents"))
        .orderBy("event_type")
  }

  /** WINSORIZED mean per type — the robust-stats sibling of q245's
    * trimmed mean: tail rows are CLAMPED to the p05/p95 order-statistic
    * values instead of dropped, so n stays the full count. Same
    * value-domain machinery (per-(type, value) histogram + cumulative
    * over distinct values — never a row sort): the thresholds are
    * conditional mins over the cumulative frame (v_lo = value at rank
    * lo+1, v_hi = value at rank hi), joined back per type, and each
    * histogram row splits its multiplicity into below/mid/above
    * portions arithmetically. Exact integer cents; floor-ppm mean with
    * the DECIMAL(38) product guard.
    */
  val q284_winsorized_mean: QueryDef = QueryDef(
    "q284_winsorized_mean",
    (s, d) => {
      val ev = Tables.events(s, d).select(col("event_type"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("c"))
      val gv = ev.groupBy("event_type", "c").agg(count(lit(1)).as("m"))
      val wv = Window.partitionBy("event_type").orderBy("c")
      val tot = gv.groupBy("event_type").agg(sum("m").as("n"))
      val cum = gv.withColumn("cum", sum("m").over(wv))
        .join(tot, Seq("event_type"))
        .withColumn("lo", expr("n * 5 div 100"))
        .withColumn("hi", col("n") - col("lo"))
      val thr = cum.groupBy("event_type").agg(
        min(when(col("cum") >= col("lo") + 1, col("c"))).as("v_lo"),
        min(when(col("cum") >= col("hi"), col("c"))).as("v_hi"))
      cum.join(thr, Seq("event_type"))
        .withColumn("n_below", greatest(lit(0L),
          least(col("cum"), col("lo")) - (col("cum") - col("m"))))
        .withColumn("n_above", greatest(lit(0L),
          col("cum") - greatest(col("cum") - col("m"), col("hi"))))
        .withColumn("n_mid", col("m") - col("n_below") - col("n_above"))
        .groupBy("event_type")
        .agg(max("n").as("n_rows"), max("v_lo").as("v_lo"),
          max("v_hi").as("v_hi"),
          sum(expr("c * n_mid + v_lo * n_below + v_hi * n_above"))
            .as("wsum"))
        .select(col("event_type"),
          col("n_rows").cast(LongType).as("n_rows"),
          col("v_lo").cast(LongType).as("v_lo"),
          col("v_hi").cast(LongType).as("v_hi"),
          expr("CASE WHEN wsum >= 0 THEN " +
            "(CAST(1000000 AS DECIMAL(38,0)) * wsum) div n_rows " +
            "ELSE -((CAST(-1000000 AS DECIMAL(38,0)) * wsum + n_rows - 1) " +
            "div n_rows) END")
            .cast(LongType).as("winsorized_mean_micro_cents"))
        .orderBy("event_type")
    },
    Some("""WITH ev AS (
      |  SELECT event_type,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
      |  FROM events),
      |gv AS (SELECT event_type, c, COUNT(*) AS m FROM ev GROUP BY 1, 2),
      |tot AS (SELECT event_type, CAST(sum(m) AS BIGINT) AS n
      |        FROM gv GROUP BY 1),
      |cum AS (
      |  SELECT g.event_type, g.c, g.m, t.n,
      |    CAST(CAST(floor(n * 5 / 100) AS BIGINT) AS BIGINT) AS lo,
      |    CAST(n - (CAST(floor(n * 5 / 100) AS BIGINT)) AS BIGINT) AS hi,
      |    sum(g.m) OVER (PARTITION BY g.event_type ORDER BY g.c) AS cm
      |  FROM gv g JOIN tot t ON t.event_type = g.event_type),
      |thr AS (
      |  SELECT event_type,
      |    min(CASE WHEN cm >= lo + 1 THEN c END) AS v_lo,
      |    min(CASE WHEN cm >= hi THEN c END) AS v_hi
      |  FROM cum GROUP BY 1),
      |parts AS (
      |  SELECT cum.event_type, cum.n,
      |    greatest(0, least(cm, lo) - (cm - m)) AS n_below,
      |    greatest(0, cm - greatest(cm - m, hi)) AS n_above,
      |    m - greatest(0, least(cm, lo) - (cm - m))
      |      - greatest(0, cm - greatest(cm - m, hi)) AS n_mid,
      |    c, t.v_lo, t.v_hi
      |  FROM cum JOIN thr t ON t.event_type = cum.event_type)
      |, nd AS (
      |  SELECT event_type, max(n) AS n_rows,
      |    max(v_lo) AS v_lo, max(v_hi) AS v_hi,
      |    CAST(1000000 AS DECIMAL(38,0))
      |      * sum(c * n_mid + v_lo * n_below + v_hi * n_above) AS num,
      |    CAST(-1000000 AS DECIMAL(38,0))
      |      * sum(c * n_mid + v_lo * n_below + v_hi * n_above)
      |      + max(n) - 1 AS cnum,
      |    CAST(max(n) AS DECIMAL(38,0)) AS den
      |  FROM parts GROUP BY 1)
      |SELECT event_type, CAST(n_rows AS BIGINT) AS n_rows,
      |  CAST(v_lo AS BIGINT) AS v_lo,
      |  CAST(v_hi AS BIGINT) AS v_hi,
      |  CAST(CASE WHEN num >= 0
      |    THEN CAST(round(CAST(num - (num % den) AS DOUBLE)
      |      / CAST(den AS DOUBLE)) AS BIGINT)
      |    ELSE -(CAST(round(CAST(cnum - (cnum % den) AS DOUBLE)
      |      / CAST(den AS DOUBLE)) AS BIGINT)) END AS BIGINT)
      |    AS winsorized_mean_micro_cents
      |FROM nd ORDER BY event_type""".stripMargin),
    "Winsorized mean per type (p05/p95 clamp): value-domain histogram + " +
      "cumulative, arithmetic tail split, exact floor-ppm — no row sort")

  /** Incremental CONNECTED COMPONENTS (IVM tier 8,
    * [[graft.ops.Incremental.mergeComponents]]): the component-label
    * view of the interaction graph maintained under an edge-INSERT
    * batch — base = edges with (source+target) ≢ 0 mod 5, delta = the
    * rest. The merge touches only the delta: label lookups for delta
    * endpoints, pointer jumping over the LABEL-pair graph (bounded by
    * merging components), one remap join — the standing edge set is
    * never re-read. The oracle computes components of the FULL edge
    * set from scratch via a recursive transitive closure and labels
    * every node with its minimum reachable id, so a missed merge, a
    * lost delta-only node, or a remap that breaks the min-label
    * convention hash-fails per node.
    */
  val q281_incremental_components: QueryDef = QueryDef(
    "q281_incremental_components",
    (s, d) => {
      val e = weightedEdges(s, d).select("source", "target")
      val base = e.filter((col("source") + col("target")) % 5 =!= 0)
      val delta = e.filter((col("source") + col("target")) % 5 === 0)
      val labels = graft.ops.Dedup.connectedComponents(
        base, "source", "target")
      graft.ops.Incremental.mergeComponents(labels, delta,
          "source", "target")
        .select(col("node").cast(LongType).as("node"),
          col("label").cast(LongType).as("label"))
        .orderBy("node")
    },
    Some("""WITH RECURSIVE seq AS (
      |  SELECT user_id, lag(user_id) OVER (ORDER BY ts, event_id) AS prev
      |  FROM events),
      |e AS (
      |  SELECT DISTINCT LEAST(prev, user_id) AS a,
      |    GREATEST(prev, user_id) AS b
      |  FROM seq WHERE prev IS NOT NULL AND prev <> user_id),
      |u AS (SELECT a, b FROM e UNION SELECT b, a FROM e),
      |r(a, b) AS (
      |  SELECT a, b FROM u
      |  UNION
      |  SELECT r.a, u.b FROM r JOIN u ON r.b = u.a)
      |SELECT CAST(a AS BIGINT) AS node,
      |  CAST(LEAST(a, min(b)) AS BIGINT) AS label
      |FROM r GROUP BY a ORDER BY node""".stripMargin),
    "IVM tier 8: connected-component labels maintained under edge " +
      "inserts — delta-sized label merges only, proven ≡ from-scratch " +
      "components via the closure oracle")

  /** Grouped MULTIVARIATE OLS — per-type regression of event cents on
    * TWO features (day index, synthetic weekend flag) plus intercept,
    * solved EXACTLY via the 3×3 normal equations and Cramer's rule in
    * wide-integer arithmetic (DECIMAL(38,0) / HUGEINT): the
    * multi-feature lift of q253's single-feature trend line. The corpus
    * pass is ONE hash agg of nine integer moment sums (n, Σx₁, Σx₂,
    * Σx₁², Σx₁x₂, Σx₂², Σy, Σx₁y, Σx₂y) — the model solve is pure
    * aggregate-side arithmetic, so 100 TB costs one map-side-combined
    * aggregation regardless of feature count. Coefficients published as
    * floor-ppm rationals: βᵢ = det(Aᵢ)/det(A) with the numerator and
    * denominator SIGN-NORMALIZED first, then q179's portable-floor
    * CASE, so Spark `div` and DuckDB `//` agree for either sign. The
    * determinant expressions are macro-expanded from the SAME Scala
    * strings into both engines' SQL.
    */
  val q279_multivar_ols: QueryDef = {
    def det3(a: String*): String = {
      require(a.length == 9)
      val Seq(a11, a12, a13, a21, a22, a23, a31, a32, a33) = a
      s"(($a11)*(($a22)*($a33)-($a23)*($a32)) - " +
        s"($a12)*(($a21)*($a33)-($a23)*($a31)) + " +
        s"($a13)*(($a21)*($a32)-($a22)*($a31)))"
    }
    val detA = det3("n", "s1", "s2", "s1", "s11", "s12", "s2", "s12", "s22")
    val dets = Seq(
      det3("sy", "s1", "s2", "s1y", "s11", "s12", "s2y", "s12", "s22"),
      det3("n", "sy", "s2", "s1", "s1y", "s12", "s2", "s2y", "s22"),
      det3("n", "s1", "sy", "s1", "s11", "s1y", "s2", "s12", "s2y"))
    // floor-ppm of num/detA for either sign: normalize by sign(detA),
    // then exact portable floor division over the now-positive
    // denominator: floor(a/b) = round((a - a%b)/b) — the subtraction
    // and modulo stay exact DECIMAL(38,0) in BOTH engines, the division
    // operates on an exactly-divisible numerator, and round() absorbs
    // the double conversion's ulp noise (exact while the QUOTIENT is
    // below ~2^51, independent of how wide the determinants grow — the
    // quotient is a ppm-scaled coefficient, never determinant-sized)
    def pfdiv(a: String, b: String): String =
      s"CAST(round(CAST(($a) - (($a) % ($b)) AS DOUBLE) " +
        s"/ CAST(($b) AS DOUBLE)) AS BIGINT)"
    def ppm(num: String, w: String): String = {
      val sgn = s"(CASE WHEN ($detA) < 0 THEN -1 ELSE 1 END)"
      val dab = s"(($detA) * $sgn)"
      val nn = s"(CAST(1000000 AS $w) * ($num) * $sgn)"
      s"(CASE WHEN ($detA) = 0 THEN CAST(0 AS BIGINT) " +
        s"WHEN $nn >= 0 THEN ${pfdiv(nn, dab)} " +
        s"ELSE -(${pfdiv(s"(-($nn) + $dab - 1)", dab)}) END)"
    }
    def betas(w: String): Seq[String] =
      dets.zipWithIndex.map { case (d, i) =>
        s"CAST(${ppm(d, w)} AS BIGINT) AS beta${i}_ppm" }
    val oracleSql =
      s"""WITH base AS (
         |  SELECT event_type,
         |    CAST(floor(epoch(ts) / 86400) AS BIGINT)
         |      - (SELECT min(CAST(floor(epoch(ts) / 86400) AS BIGINT))
         |         FROM events) AS x1,
         |    CASE WHEN (CAST(floor(epoch(ts) / 86400) AS BIGINT)) % 7
         |      IN (2, 3) THEN 1 ELSE 0 END AS x2,
         |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS y
         |  FROM events),
         |s AS (
         |  SELECT event_type, CAST(count(*) AS DECIMAL(38,0)) AS n,
         |    CAST(sum(x1) AS DECIMAL(38,0)) AS s1,
         |    CAST(sum(x2) AS DECIMAL(38,0)) AS s2,
         |    CAST(sum(x1*x1) AS DECIMAL(38,0)) AS s11,
         |    CAST(sum(x1*x2) AS DECIMAL(38,0)) AS s12,
         |    CAST(sum(x2*x2) AS DECIMAL(38,0)) AS s22,
         |    CAST(sum(y) AS DECIMAL(38,0)) AS sy,
         |    CAST(sum(x1*y) AS DECIMAL(38,0)) AS s1y,
         |    CAST(sum(x2*y) AS DECIMAL(38,0)) AS s2y
         |  FROM base GROUP BY 1)
         |SELECT event_type, CAST(n AS BIGINT) AS n,
         |  ${betas("DECIMAL(38,0)").mkString(",\n  ")}
         |FROM s ORDER BY event_type""".stripMargin
    QueryDef(
      "q279_multivar_ols",
      (s, d) => {
        val w = "DECIMAL(38,0)"
        val ev = Tables.events(s, d)
          .select(col("event_type"), expr("ts_sec div 86400").as("day"),
            expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)")
              .as("y"))
        val minDay = ev.agg(min("day").as("mind"))
        val base = ev.crossJoin(broadcast(minDay))
          .select(col("event_type"), (col("day") - col("mind")).as("x1"),
            when(col("day") % 7 === 2 || col("day") % 7 === 3, 1L)
              .otherwise(0L).as("x2"), col("y"))
        val sums = base.groupBy("event_type").agg(
          count(lit(1)).cast(w).as("n"),
          sum("x1").cast(w).as("s1"), sum("x2").cast(w).as("s2"),
          sum(expr("x1*x1")).cast(w).as("s11"),
          sum(expr("x1*x2")).cast(w).as("s12"),
          sum(expr("x2*x2")).cast(w).as("s22"),
          sum("y").cast(w).as("sy"),
          sum(expr("x1*y")).cast(w).as("s1y"),
          sum(expr("x2*y")).cast(w).as("s2y"))
        sums.selectExpr(Seq("event_type", "CAST(n AS BIGINT) AS n") ++
            betas(w): _*)
          .orderBy("event_type")
      },
      Some(oracleSql),
      "Grouped multivariate OLS (2 features + intercept) via exact " +
        "Cramer normal equations — one hash agg of integer moments, " +
        "floor-ppm coefficients, macro-shared determinant SQL")
  }

  /** Event-sequence REGEX matching — the MATCH_RECOGNIZE shape beyond
    * q154's fixed funnel and q189's gap-subsequences: each user's
    * journey (event-type initials in (ts, event_id) total order — the
    * five types have distinct initials) becomes one bounded string, and
    * arbitrary regular patterns with quantifiers run against it:
    * `s[cv]*p` (signup, any browsing, purchase — ADJACENT, which q189's
    * gap semantics cannot express), `c{3,}` (click bursts), `ep`
    * (purchase immediately after an error), `sv?p`. Per-user journeys
    * are user-bounded, the pattern set is a 4× explode of the
    * user-sized frame, and both engines count NON-OVERLAPPING
    * left-to-right matches (java.util.regex find() ≡ RE2 extract_all
    * for these patterns). The corpus pass is one hash agg.
    */
  val q278_sequence_regex: QueryDef = q(
    "q278_sequence_regex",
    """WITH j AS (
      |  SELECT user_id,
      |    string_agg(substr(event_type, 1, 1), ''
      |      ORDER BY ts, event_id) AS jr
      |  FROM events GROUP BY user_id),
      |p(pat) AS (VALUES ('s[cv]*p'), ('c{3,}'), ('ep'), ('sv?p')),
      |m AS (SELECT p.pat, len(regexp_extract_all(j.jr, '(' || p.pat || ')', 1)) AS n
      |      FROM j, p)
      |SELECT pat,
      |  CAST(sum(CASE WHEN n > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_users,
      |  CAST(sum(n) AS BIGINT) AS n_occ
      |FROM m GROUP BY 1 ORDER BY pat""".stripMargin,
    "Event-sequence regex (MATCH_RECOGNIZE emulation): per-user " +
      "journey strings × 4 quantified patterns, non-overlapping match " +
      "counts — one hash agg corpus pass") { (s, d) =>
    val pats = Seq("s[cv]*p", "c{3,}", "ep", "sv?p")
    val j = Tables.events(s, d).groupBy("user_id")
      .agg(concat_ws("", transform(
        sort_array(collect_list(struct(col("ts_ns"), col("event_id"),
          expr("substring(event_type, 1, 1)").as("ch")))),
        e => e("ch"))).as("jr"))
    j.select(explode(array(pats.map(p =>
        struct(lit(p).as("pat"),
          size(regexp_extract_all(col("jr"), lit(p), lit(0)))
            .cast(LongType).as("n"))): _*)).as("r"))
      .select("r.*")
      .groupBy("pat")
      .agg(sum(when(col("n") > 0, 1L).otherwise(0L)).as("n_users"),
        sum("n").as("n_occ"))
      .orderBy("pat")
  }

  /** Sequential-pattern support (PrefixSpan's counting core): for every
    * ordered event-type triple (gap-allowed subsequence, NOT q178's
    * adjacent transitions), how many users' journeys contain it. The
    * subsequence-exists test is the GREEDY first-match fold — provably
    * equivalent to ∃ i<j<k — run in-row by the `aggregate` HOF over each
    * user's journey array (journeys are user-bounded; the 5³ pattern set
    * is a 125× bounded explode of the user-sized journey frame, never of
    * the corpus). The oracle replays the same greedy via
    * list_position + list-slicing over identically-ordered journeys;
    * both sides order by (ts, event_id), a total order.
    */
  val q189_sequence_support: QueryDef = q(
    "q189_sequence_support",
    """WITH j AS (
      |  SELECT user_id, list(event_type ORDER BY ts, event_id) AS seq
      |  FROM events GROUP BY user_id),
      |types AS (
      |  SELECT unnest(list_value('click','error','purchase','signup','view')) AS t),
      |pats AS (SELECT a.t AS p1, b.t AS p2, c.t AS p3
      |  FROM types a, types b, types c),
      |pos AS (
      |  SELECT p1, p2, p3, user_id,
      |    COALESCE(list_position(seq, p1), 0) AS i1,
      |    seq FROM j, pats),
      |pos2 AS (
      |  SELECT *, CASE WHEN i1 > 0
      |      THEN COALESCE(list_position(seq[i1 + 1 :], p2), 0)
      |      ELSE 0 END AS i2
      |  FROM pos),
      |pos3 AS (
      |  SELECT *, CASE WHEN i2 > 0
      |      THEN COALESCE(list_position(seq[i1 + i2 + 1 :], p3), 0)
      |      ELSE 0 END AS i3
      |  FROM pos2)
      |SELECT p1 || '>' || p2 || '>' || p3 AS pattern,
      |  CAST(count(*) AS BIGINT) AS support
      |FROM pos3 WHERE i3 > 0
      |GROUP BY 1 ORDER BY support DESC, pattern LIMIT 25""".stripMargin,
    "Sequential-pattern support: per ordered type triple, users whose " +
      "journey contains it as a subsequence (greedy in-row fold)") { (s, d) =>
    val types = Seq("click", "error", "purchase", "signup", "view")
    val pats = for { a <- types; b <- types; c <- types } yield Seq(a, b, c)
    val patCol = array(pats.map(p => array(p.map(lit): _*)): _*)
    Tables.events(s, d)
      .groupBy("user_id")
      .agg(transform(
        sort_array(collect_list(struct(col("ts_ns"), col("event_id"),
          col("event_type")))), e => e("event_type")).as("seq"))
      .select(col("user_id"), col("seq"), explode(patCol).as("p"))
      .filter(expr(
        """aggregate(seq, 0, (acc, e) ->
          |  CASE WHEN acc < 3 AND e = element_at(p, acc + 1)
          |    THEN acc + 1 ELSE acc END) = 3""".stripMargin))
      .groupBy(concat_ws(">", col("p")).as("pattern"))
      .agg(count(lit(1)).as("support"))
      .orderBy(col("support").desc, col("pattern"))
      .limit(25)
  }

  /** Theil–Sen robust trend per event type: the MEDIAN of all pairwise
    * slopes of the daily-count series — the estimator that shrugs off
    * outlier days where least squares folds. Day pairs live on the
    * AGGREGATE frame (days²/2 per type, calendar-bounded), so the
    * pairwise "join" is a per-type self-join of a tiny series, and the
    * median is a partitioned window over those pairs. Slopes are exact
    * floor-ppm rationals with q179's portable-floor CASE (numerators go
    * negative on falling series; Spark `div` truncates, DuckDB `//`
    * floors — the CASE makes both floor). Lower median, fully
    * tie-broken by (slope_ppm, d1, d2).
    */
  val q190_theilsen_trend: QueryDef = q(
    "q190_theilsen_trend",
    """WITH daily AS (
      |  SELECT event_type,
      |    CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
      |    CAST(count(*) AS BIGINT) AS x
      |  FROM events GROUP BY 1, 2),
      |pr AS (
      |  SELECT a.event_type, a.day AS d1, b.day AS d2,
      |    1000000 * (b.x - a.x) AS n, b.day - a.day AS dd
      |  FROM daily a JOIN daily b
      |    ON b.event_type = a.event_type AND b.day > a.day),
      |sl AS (
      |  SELECT event_type, d1, d2,
      |    CASE WHEN n >= 0 THEN CAST(floor(n / dd) AS BIGINT)
      |         ELSE -CAST(floor((-n + dd - 1) / dd) AS BIGINT) END AS slope_ppm
      |  FROM pr),
      |rk AS (
      |  SELECT *,
      |    row_number() OVER (PARTITION BY event_type
      |      ORDER BY slope_ppm, d1, d2) AS rn,
      |    count(*) OVER (PARTITION BY event_type) AS cnt
      |  FROM sl)
      |SELECT event_type, CAST(cnt AS BIGINT) AS n_pairs, slope_ppm
      |FROM rk WHERE rn = CAST(floor((cnt + 1) / 2) AS BIGINT)
      |ORDER BY event_type""".stripMargin,
    "Theil-Sen robust trend: median pairwise slope of the daily series " +
      "per type, exact floor-ppm with portable floor division") { (s, d) =>
    val daily = Tables.events(s, d)
      .groupBy(col("event_type"), expr("ts_sec div 86400").as("day"))
      .agg(count(lit(1)).as("x"))
    val a = daily.select(col("event_type"), col("day").as("d1"), col("x").as("x1"))
    val b = daily.select(col("event_type"), col("day").as("d2"), col("x").as("x2"))
    val pr = a.join(b, Seq("event_type")).filter(col("d2") > col("d1"))
      .select(col("event_type"), col("d1"), col("d2"),
        (lit(1000000L) * (col("x2") - col("x1"))).as("n"),
        (col("d2") - col("d1")).as("dd"))
    val sl = pr.select(col("event_type"), col("d1"), col("d2"),
      expr("""CASE WHEN n >= 0 THEN n div dd
             |     ELSE -((-n + dd - 1) div dd) END""".stripMargin).as("slope_ppm"))
    val w = Window.partitionBy("event_type")
    sl.withColumn("rn", row_number().over(w.orderBy("slope_ppm", "d1", "d2")))
      .withColumn("cnt", count(lit(1)).over(w))
      .filter(col("rn") === expr("(cnt + 1) div 2"))
      .select(col("event_type"), col("cnt").as("n_pairs"), col("slope_ppm"))
      .orderBy("event_type")
  }

  /** Behavioral concentration (Herfindahl–Hirschman index) per user:
    * Σ (type share)² in exact ppm — the division-free quadratic
    * concentration measure (entropy needs a log; HHI is rational).
    * hhi_ppm = (10⁶ · Σ cntᵢ²) div (Σ cntᵢ)², 10⁶ = single-type users.
    * Two map-side-combined hash aggs, no window, no join.
    */
  val q191_hhi_concentration: QueryDef = q(
    "q191_hhi_concentration",
    """WITH tc AS (
      |  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS c
      |  FROM events GROUP BY 1, 2),
      |u AS (
      |  SELECT user_id, sum(c) AS total, sum(c * c) AS sq
      |  FROM tc GROUP BY user_id)
      |, nd AS (
      |  SELECT user_id, total,
      |    CAST(1000000 AS DECIMAL(38,0)) * sq AS num,
      |    CAST(total AS DECIMAL(38,0)) * total AS den
      |  FROM u)
      |SELECT user_id, CAST(total AS BIGINT) AS n_events,
      |  CAST(CAST(round(CAST(num - (num % den) AS DOUBLE)
      |    / CAST(den AS DOUBLE)) AS BIGINT) AS BIGINT)
      |    AS hhi_ppm
      |FROM nd ORDER BY user_id""".stripMargin,
    "Behavioral concentration: per-user HHI over event-type shares, " +
      "exact quadratic ppm (no logs, no doubles)") { (s, d) =>
    Tables.events(s, d)
      .groupBy("user_id", "event_type").agg(count(lit(1)).as("c"))
      .groupBy("user_id")
      .agg(sum("c").as("total"), sum(col("c") * col("c")).as("sq"))
      .select(col("user_id"), col("total").as("n_events"),
        expr("CAST((CAST(1000000 AS DECIMAL(38,0)) * sq) div (total * total) AS BIGINT)")
          .as("hhi_ppm"))
      .orderBy("user_id")
  }

  /** Jaccard link prediction: for non-adjacent user pairs, the Jaccard
    * similarity of their neighborhoods — |N(a)∩N(b)| / |N(a)∪N(b)| in
    * exact ppm — ranked top-20 (the classic common-neighbors link
    * predictor). Wedge generation is HUB-CAPPED: common neighbors are
    * counted only through centers of degree ≤ ⌊√(2|E|)⌋ (a
    * celebrity-mediated co-neighbor carries no tie signal, and an
    * uncapped wedge join is deg² per center — the LSH-bucket-cap rule
    * applied to graphs). The √(2|E|) cap bounds total wedge mass at
    * Σ_{deg(w)≤cap} deg(w)² ≤ cap·Σdeg = (2|E|)^1.5 INDEPENDENT of the
    * degree distribution — the round-12 celebrity probe (2·10⁴-leaf
    * hub) killed the earlier 2×-mean-degree cap, whose threshold the
    * hub itself dragged down until recall hit 0, while √(2|E|) kept
    * recall intact at flat cost (BASELINE.md round-12). The cap is part
    * of the pinned semantics: the oracle applies the same degree
    * filter. Degrees in the denominator stay FULL; existing edges are
    * removed by one anti-join on the canonical pair.
    */
  val q192_link_prediction: QueryDef = q(
    "q192_link_prediction",
    edgesSql +
      """,
        |adj AS (SELECT a AS v, b AS n FROM we UNION ALL SELECT b AS v, a AS n FROM we),
        |deg AS (SELECT v, CAST(count(*) AS BIGINT) AS deg FROM adj GROUP BY v),
        |low AS (SELECT v FROM deg
        |  WHERE deg <= (SELECT CAST(floor(sqrt(sum(deg))) AS BIGINT) FROM deg)),
        |cn AS (
        |  SELECT a1.v AS p, a2.v AS q, CAST(count(*) AS BIGINT) AS inter
        |  FROM adj a1
        |  JOIN low l ON l.v = a1.n
        |  JOIN adj a2 ON a2.n = a1.n AND a2.v > a1.v
        |  GROUP BY 1, 2),
        |cand AS (
        |  SELECT cn.* FROM cn
        |  LEFT JOIN we ON we.a = cn.p AND we.b = cn.q
        |  WHERE we.a IS NULL)
        |SELECT c.p AS a, c.q AS b, c.inter,
        |  CAST(CAST(floor((CAST(1000000 AS DECIMAL(38,0)) * c.inter)
        |    / (dp.deg + dq.deg - c.inter)) AS BIGINT) AS BIGINT) AS jaccard_ppm
        |FROM cand c
        |JOIN deg dp ON dp.v = c.p
        |JOIN deg dq ON dq.v = c.q
        |ORDER BY jaccard_ppm DESC, a, b LIMIT 20""".stripMargin,
    "Jaccard link prediction over the interaction graph: hub-capped " +
      "common-neighbor wedges, full-degree union, exact ppm, top-20") {
    (s, d) =>
      graft.ops.Graph.linkPrediction(
        graft.ops.Graph.fromEvents(s, d).select(col("source").as("a"),
          col("target").as("b")),
        k = 20)
  }

  /** [[graft.ops.Incremental.mergeJoinView]] — maintenance tier 3: an
    * orders⋈customer JOIN view kept current under a CDC batch of order
    * inserts (id-offset clones, offset = max(o_orderkey)+1 broadcast, the
    * q126 rule), order deletes (o_orderkey ≡ 3 mod 17), and customer
    * payload UPDATES (name suffixed `#v2` for c_custkey ≡ 2 mod 11). The
    * oracle re-joins the post-churn tables from scratch; the per-nation
    * digest (row count, exact cents, Σ order keys, refreshed-payload
    * count) hash-fails on any dropped/double-counted row or stale dim
    * payload the delta rules mishandle.
    */
  val q193_incremental_join_view: QueryDef = QueryDef(
    "q193_incremental_join_view",
    (s, d) => {
      val o = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      val c = Tables.customer(s, d)
        .select(col("c_custkey").as("o_custkey"), col("c_name"),
          col("c_nationkey"))
      val view = o.join(c, Seq("o_custkey"))
      val del = o.filter(col("o_orderkey") % 17 === 3).select("o_orderkey")
      val mk = o.agg(max("o_orderkey").as("mk"))
      val ins = o.filter(col("o_orderkey") % 13 === 5)
        .crossJoin(broadcast(mk))
        .select((col("o_orderkey") + col("mk") + 1).as("o_orderkey"),
          col("o_custkey"), col("o_totalprice"))
      val upd = c.filter(col("o_custkey") % 11 === 2)
        .select(col("o_custkey"), concat(col("c_name"), lit("#v2")).as("c_name"),
          col("c_nationkey"))
      graft.ops.Incremental
        .mergeJoinView(view, o, c, ins, del, upd, "o_custkey", "o_orderkey")
        .groupBy(col("c_nationkey").cast(LongType).as("c_nationkey"))
        .agg(count(lit(1)).as("n_rows"),
          sum(expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"))
            .cast(LongType).as("sum_cents"),
          sum("o_orderkey").cast(LongType).as("sum_okey"),
          sum(when(col("c_name").endsWith("#v2"), 1L).otherwise(0L))
            .as("n_updated"))
        .orderBy("c_nationkey")
    },
    Some("""WITH mk AS (SELECT max(o_orderkey) AS mk FROM orders),
      |o2 AS (
      |  SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |  WHERE o_orderkey % 17 <> 3
      |  UNION ALL
      |  SELECT o_orderkey + (SELECT mk FROM mk) + 1, o_custkey, o_totalprice
      |  FROM orders WHERE o_orderkey % 13 = 5),
      |c2 AS (
      |  SELECT c_custkey,
      |    CASE WHEN c_custkey % 11 = 2 THEN c_name || '#v2' ELSE c_name END
      |      AS c_name,
      |    c_nationkey
      |  FROM customer)
      |SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
      |  CAST(count(*) AS BIGINT) AS n_rows,
      |  CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
      |    AS BIGINT) AS sum_cents,
      |  CAST(sum(o_orderkey) AS BIGINT) AS sum_okey,
      |  CAST(sum(CASE WHEN c_name LIKE '%#v2' THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_updated
      |FROM o2 JOIN c2 ON c2.c_custkey = o2.o_custkey
      |GROUP BY 1 ORDER BY 1""".stripMargin),
    "Incremental JOIN-view maintenance (delta rules, affected-key rescan " +
      "only): post-CDC view proven equal to a from-scratch re-join")

  /** [[graft.ops.Incremental.mergeJoinAggView]] — maintenance tier 7:
    * the composed view γ_{priority}(COUNT, Σprice) over orders⋈lineitem
    * under a CDC batch touching BOTH sides: order deletes (≡3 mod 17)
    * and id-offset order clones (≡5 mod 13, the q126/q193 offset rule),
    * lineitem deletes (line 1 of orderkeys ≡11 mod 23) and lineitem
    * inserts both at the CLONED keys (pairing with the new orders — the
    * ΔA⋈ΔB(+·+) cross term) and at existing keys ≡7 mod 19 (pairing
    * with standing and deleted orders — the A⋈ΔB and ΔA(−)⋈ΔB(+)
    * terms). All four signed cross-term combinations are live or
    * provably empty; the oracle re-joins and re-aggregates the
    * post-churn tables from scratch, so any mis-signed delta or missed
    * cross term hash-fails the per-priority (n, exact cents) digest.
    */
  val q271_incremental_join_agg: QueryDef = QueryDef(
    "q271_incremental_join_agg",
    (s, d) => {
      val a = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderpriority"))
      val b = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("o_orderkey"), col("l_linenumber"),
          col("l_extendedprice"))
      val view = a.join(b, Seq("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          sum(Sql.dec2(col("l_extendedprice"))).as("s"))
      val mk = a.agg(max("o_orderkey").as("mk"))
      val aDel = a.filter(col("o_orderkey") % 17 === 3)
      val aIns = a.filter(col("o_orderkey") % 13 === 5)
        .crossJoin(broadcast(mk))
        .select((col("o_orderkey") + col("mk") + 1).as("o_orderkey"),
          col("o_orderpriority"))
      val bDel = b.filter(col("o_orderkey") % 23 === 11 &&
        col("l_linenumber") === 1)
      val bIns = b.filter(col("o_orderkey") % 13 === 5)
        .crossJoin(broadcast(mk))
        .select((col("o_orderkey") + col("mk") + 1).as("o_orderkey"),
          col("l_linenumber"), col("l_extendedprice"))
        .unionByName(b.filter(col("o_orderkey") % 19 === 7)
          .select(col("o_orderkey"),
            (col("l_linenumber") + 100).as("l_linenumber"),
            col("l_extendedprice")))
      graft.ops.Incremental.mergeJoinAggView(view, a, b, aIns, aDel,
          bIns, bDel, "o_orderkey", Seq("o_orderpriority"),
          "l_extendedprice")
        .select(col("o_orderpriority"), col("n"),
          (col("s") * 100).cast(LongType).as("sum_cents"))
        .orderBy("o_orderpriority")
    },
    Some("""WITH mk AS (SELECT max(o_orderkey) AS mk FROM orders),
      |a2 AS (
      |  SELECT o_orderkey, o_orderpriority FROM orders
      |  WHERE o_orderkey % 17 <> 3
      |  UNION ALL
      |  SELECT o_orderkey + (SELECT mk FROM mk) + 1, o_orderpriority
      |  FROM orders WHERE o_orderkey % 13 = 5),
      |b2 AS (
      |  SELECT l_orderkey AS o_orderkey, l_linenumber, l_extendedprice
      |  FROM lineitem
      |  WHERE NOT (l_orderkey % 23 = 11 AND l_linenumber = 1)
      |  UNION ALL
      |  SELECT l_orderkey + (SELECT mk FROM mk) + 1, l_linenumber,
      |    l_extendedprice
      |  FROM lineitem WHERE l_orderkey % 13 = 5
      |  UNION ALL
      |  SELECT l_orderkey, l_linenumber + 100, l_extendedprice
      |  FROM lineitem WHERE l_orderkey % 19 = 7)
      |SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
      |    AS BIGINT)) AS BIGINT) AS sum_cents
      |FROM a2 JOIN b2 USING (o_orderkey)
      |GROUP BY 1 ORDER BY 1""".stripMargin),
    "IVM tier 7 (join+agg composed view): signed-delta maintenance " +
      "under CDC on both join inputs, proven ≡ from-scratch re-join + " +
      "re-aggregate")

  /** Classical seasonal decomposition (STL's additive skeleton) of the
    * per-type daily count series, kept in EXACT integers by scaling the
    * centered moving average by its window size: trend_sum7 = Σ x over
    * the centered ±3-day RANGE window, detrended×7 = 7·x − trend_sum7,
    * seasonal×7 per day-of-week = ⌊mean of detrended×7⌋ (portable floor
    * — detrended goes negative), residual×7 = the difference. Interior
    * days only (the 7-day window must be full). The window partitions by
    * type over the AGGREGATE day frame; the DOW means are one hash agg
    * joined back.
    */
  val q196_seasonal_decompose: QueryDef = q(
    "q196_seasonal_decompose",
    """WITH daily AS (
      |  SELECT event_type,
      |    CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
      |    CAST(count(*) AS BIGINT) AS x
      |  FROM events GROUP BY 1, 2),
      |tr AS (
      |  SELECT *,
      |    sum(x) OVER (PARTITION BY event_type ORDER BY day
      |      RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS tsum,
      |    count(*) OVER (PARTITION BY event_type ORDER BY day
      |      RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS tn
      |  FROM daily),
      |det AS (
      |  SELECT event_type, day, x, CAST(tsum AS BIGINT) AS tsum,
      |    CAST(7 * x - tsum AS BIGINT) AS d7, day % 7 AS dow
      |  FROM tr WHERE tn = 7),
      |seas AS (
      |  SELECT event_type, dow,
      |    CASE WHEN sum(d7) >= 0 THEN CAST(floor(sum(d7) / count(*)) AS BIGINT)
      |         ELSE -CAST(floor((-sum(d7) + count(*) - 1) / count(*)) AS BIGINT) END AS s7
      |  FROM det GROUP BY 1, 2)
      |SELECT det.event_type, det.day, det.x,
      |  det.tsum AS trend_sum7, det.d7 AS detrended7,
      |  CAST(seas.s7 AS BIGINT) AS seasonal7,
      |  CAST(det.d7 - seas.s7 AS BIGINT) AS residual7
      |FROM det JOIN seas
      |  ON seas.event_type = det.event_type AND seas.dow = det.dow
      |ORDER BY det.event_type, det.day""".stripMargin,
    "Additive seasonal decomposition of daily counts: 7x-scaled centered " +
      "trend, day-of-week seasonal, residual — all exact integers") {
    (s, d) =>
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), expr("ts_sec div 86400").as("day"))
        .agg(count(lit(1)).as("x"))
      val w = Window.partitionBy("event_type").orderBy("day")
        .rangeBetween(-3, 3)
      val det = daily
        .withColumn("tsum", sum("x").over(w))
        .withColumn("tn", count(lit(1)).over(w))
        .filter(col("tn") === 7)
        .withColumn("d7", lit(7) * col("x") - col("tsum"))
        .withColumn("dow", col("day") % 7)
      val seas = det.groupBy("event_type", "dow")
        .agg(expr("""CASE WHEN sum(d7) >= 0 THEN sum(d7) div count(1)
                    |     ELSE -((-sum(d7) + count(1) - 1) div count(1)) END"""
          .stripMargin).as("s7"))
      det.join(seas, Seq("event_type", "dow"))
        .select(col("event_type"), col("day"), col("x"),
          col("tsum").as("trend_sum7"), col("d7").as("detrended7"),
          col("s7").cast(LongType).as("seasonal7"),
          (col("d7") - col("s7")).cast(LongType).as("residual7"))
        .orderBy("event_type", "day")
  }

  /** Pearson chi-square independence audit of the (event_type ×
    * day-of-week) contingency table — does behavior depend on weekday?
    * Division-free per-cell statistic: with d = N·o − r·c,
    * cell_ppm = ⌊10⁶·d² / (N·r·c)⌋ (the χ² contribution, N-scaled), all
    * DECIMAL(38,0). Exact while N·o < ~10¹⁹ — beyond that (extreme
    * single-table scale) pre-scale counts; q186's documented bound. The
    * corpus pass is one hash agg; margins are tiny frames joined back
    * (the 7-row column margin broadcast).
    */
  val q197_chisq_independence: QueryDef = q(
    "q197_chisq_independence",
    """WITH o AS (
      |  SELECT event_type, CAST(floor(epoch(ts) / 86400) AS BIGINT) % 7 AS dow,
      |    CAST(count(*) AS BIGINT) AS o
      |  FROM events GROUP BY 1, 2),
      |r AS (SELECT event_type, sum(o) AS r FROM o GROUP BY 1),
      |c AS (SELECT dow, sum(o) AS c FROM o GROUP BY 1),
      |n AS (SELECT sum(o) AS n FROM o)
      |, j AS (
      |  SELECT o.event_type, o.dow, o.o,
      |    CAST(1000000 AS DECIMAL(38,0))
      |      * ((SELECT n FROM n) * o.o - r.r * c.c)
      |      * ((SELECT n FROM n) * o.o - r.r * c.c) AS num,
      |    CAST((SELECT n FROM n) AS DECIMAL(38,0)) * r.r * c.c AS den
      |  FROM o JOIN r ON r.event_type = o.event_type JOIN c ON c.dow = o.dow)
      |SELECT event_type, dow, o,
      |  CAST(CAST(round(CAST(num - (num % den) AS DOUBLE)
      |    / CAST(den AS DOUBLE)) AS BIGINT) AS BIGINT) AS chi2_ppm
      |FROM j
      |ORDER BY event_type, dow""".stripMargin,
    "Chi-square independence audit of type x weekday counts: exact " +
      "division-free per-cell statistic in ppm") { (s, d) =>
    val o = Tables.events(s, d)
      .groupBy(col("event_type"), expr("ts_sec div 86400 % 7").as("dow"))
      .agg(count(lit(1)).as("o"))
    val r = o.groupBy("event_type").agg(sum("o").as("r"))
    val c = o.groupBy("dow").agg(sum("o").as("c"))
    val n = o.agg(sum("o").as("n"))
    o.join(r, Seq("event_type")).join(broadcast(c), Seq("dow"))
      .crossJoin(broadcast(n))
      .select(col("event_type"), col("dow"), col("o"),
        expr("""CAST((CAST(1000000 AS DECIMAL(38,0))
               |    * (n * o - r * c) * (n * o - r * c))
               |  div (CAST(n AS DECIMAL(38,0)) * r * c) AS BIGINT)"""
          .stripMargin).as("chi2_ppm"))
      .orderBy("event_type", "dow")
  }

  /** Time-weighted average value per user (TWAP) — the mean that
    * respects HOLDING TIME, not event count: each event's value holds
    * until the user's next event; twap = Σ value·duration / Σ duration
    * in exact integer cents (final events have no holding interval and
    * are excluded — pinned). One lead window over user-bounded
    * partitions + one hash agg.
    */
  val q198_twap: QueryDef = q(
    "q198_twap",
    """WITH seq AS (
      |  SELECT user_id,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
      |    CAST(floor(epoch(ts)) AS BIGINT) AS t,
      |    lead(CAST(floor(epoch(ts)) AS BIGINT))
      |      OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nt
      |  FROM events),
      |h AS (SELECT user_id, cents, nt - t AS dur FROM seq WHERE nt IS NOT NULL)
      |SELECT user_id,
      |  CAST(count(*) AS BIGINT) AS n_intervals,
      |  CAST(sum(dur) AS BIGINT) AS held_s,
      |  CAST(CASE WHEN sum(dur) = 0 THEN 0
      |    ELSE CAST(floor(sum(CAST(cents AS DECIMAL(38,0)) * dur) / sum(dur)) AS BIGINT) END AS BIGINT)
      |    AS twap_cents
      |FROM h GROUP BY user_id ORDER BY user_id""".stripMargin,
    "Time-weighted average value per user: holding-duration-weighted " +
      "mean in exact integer cents") { (s, d) =>
    val w = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
    val seq = Tables.events(s, d)
      .select(col("user_id"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("cents"),
        col("ts_sec").as("t"), col("ts_ns"), col("event_id"))
      .withColumn("nt", lead("t", 1).over(w))
      .filter(col("nt").isNotNull)
      .withColumn("dur", col("nt") - col("t"))
    seq.groupBy("user_id")
      .agg(count(lit(1)).as("n_intervals"),
        sum("dur").cast(LongType).as("held_s"),
        expr("""CAST(CASE WHEN sum(dur) = 0 THEN 0
               |  ELSE sum(CAST(cents AS DECIMAL(38,0)) * dur) div sum(dur) END
               |  AS BIGINT)""".stripMargin).as("twap_cents"))
      .orderBy("user_id")
  }

  /** Degree assortativity of the interaction graph (Newman 2002): does
    * the network wire hubs to hubs? The Pearson correlation of endpoint
    * degrees over the directed edge expansion, made EXACT by emitting
    * the SIGN and the SQUARED correlation separately (r² is a pure
    * rational of the five integer sums; the sqrt that makes r float
    * never happens): r2_ppm = ⌊10⁶·cov² / (var·var)⌋ with
    * cov = E·Σxy − Σx·Σy (x/y symmetric on the undirected expansion, so
    * one variance serves both). One degree agg + one edge join + one
    * 1-row reduction. DECIMAL(38)-guarded; exact to ~10⁹-degree sums
    * (q186's documented bound pattern).
    */
  val q205_assortativity: QueryDef = q(
    "q205_assortativity",
    edgesSql +
      """,
        |adj AS (SELECT a AS v, b AS n FROM we UNION ALL SELECT b AS v, a AS n FROM we),
        |deg AS (SELECT v, CAST(count(*) AS BIGINT) AS deg FROM adj GROUP BY v),
        |pairs AS (
        |  SELECT da.deg AS x, db.deg AS y
        |  FROM adj JOIN deg da ON da.v = adj.v JOIN deg db ON db.v = adj.n),
        |sums AS (
        |  SELECT CAST(count(*) AS DECIMAL(38,0)) AS m,
        |    CAST(sum(x) AS DECIMAL(38,0)) AS sx,
        |    CAST(sum(CAST(x AS DECIMAL(38,0)) * x) AS DECIMAL(38,0)) AS sxx,
        |    CAST(sum(CAST(x AS DECIMAL(38,0)) * y) AS DECIMAL(38,0)) AS sxy
        |  FROM pairs)
        |, nd AS (
        |  SELECT m, sx, sxy,
        |    CAST(1000000 AS DECIMAL(38,0))
        |      * (m * sxy - sx * sx) * (m * sxy - sx * sx) AS num,
        |    (m * sxx - sx * sx) * (m * sxx - sx * sx) AS den
        |  FROM sums)
        |SELECT CAST(m AS BIGINT) AS n_endpoints,
        |  CAST(CASE WHEN m * sxy - sx * sx >= 0 THEN 1 ELSE -1 END AS BIGINT)
        |    AS sign,
        |  CAST(CASE WHEN den = 0 THEN 0
        |    ELSE CAST(round(CAST(num - (num % den) AS DOUBLE)
        |      / CAST(den AS DOUBLE)) AS BIGINT) END AS BIGINT)
        |    AS r2_ppm
        |FROM nd""".stripMargin,
    "Degree assortativity: sign + exact rational r^2 in ppm over the " +
      "directed edge expansion — sqrt-free Pearson") { (s, d) =>
    val we = graft.ops.Graph.fromEvents(s, d)
      .select(col("source").as("a"), col("target").as("b"))
    val adj = we.select(col("a").as("v"), col("b").as("n"))
      .unionAll(we.select(col("b").as("v"), col("a").as("n")))
    val deg = adj.groupBy("v").agg(count(lit(1)).as("deg"))
    val pairs = adj
      .join(deg.select(col("v"), col("deg").as("x")), Seq("v"))
      .join(deg.select(col("v").as("n"), col("deg").as("y")), Seq("n"))
    pairs.agg(
        count(lit(1)).cast(DecimalType(38, 0)).as("m"),
        sum("x").cast(DecimalType(38, 0)).as("sx"),
        sum(col("x").cast(DecimalType(38, 0)) * col("x")).as("sxx"),
        sum(col("x").cast(DecimalType(38, 0)) * col("y")).as("sxy"))
      .selectExpr(
        "CAST(m AS BIGINT) AS n_endpoints",
        "CAST(CASE WHEN m * sxy - sx * sx >= 0 THEN 1 ELSE -1 END AS BIGINT) AS sign",
        """CAST(CASE WHEN m * sxx - sx * sx = 0 THEN 0
           ELSE (CAST(1000000 AS DECIMAL(38,0))
               * (m * sxy - sx * sx) * (m * sxy - sx * sx))
             div ((m * sxx - sx * sx) * (m * sxx - sx * sx)) END AS BIGINT)
           AS r2_ppm""")
  }

  /** User-journey PATH analysis: sessionize (q20's 30-min gap rule),
    * render each session's first 8 event types as a `a>b>c` path string,
    * and rank the top-20 paths by session count (+ distinct users) —
    * the product-analytics "what do sessions look like" report. Paths
    * are built from user-bounded windows and per-session collect_lists;
    * the 8-event cap bounds the path string (pinned by slicing in both
    * engines).
    */
  val q207_path_analysis: QueryDef = q(
    "q207_path_analysis",
    """WITH g AS (
      |  SELECT user_id, ts, event_id, event_type,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR CAST(floor(epoch(ts)) AS BIGINT)
      |              - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) > 1800
      |         THEN 1 ELSE 0 END AS is_new
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |s AS (
      |  SELECT *, SUM(is_new) OVER (PARTITION BY user_id
      |    ORDER BY ts, event_id) AS sid
      |  FROM g),
      |p AS (
      |  SELECT user_id, sid,
      |    array_to_string((list(event_type ORDER BY ts, event_id))[1:8], '>')
      |      AS path
      |  FROM s GROUP BY user_id, sid)
      |SELECT path, CAST(count(*) AS BIGINT) AS n_sessions,
      |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
      |FROM p GROUP BY path
      |ORDER BY n_sessions DESC, path LIMIT 20""".stripMargin,
    "User-journey path analysis: per-session first-8-event path strings, " +
      "top-20 by frequency") { (s, d) =>
    val prevSec = lag("ts_sec", 1).over(wUser)
    Tables.events(s, d)
      .withColumn("is_new",
        when(prevSec.isNull || col("ts_sec") - prevSec > 1800, lit(1L))
          .otherwise(lit(0L)))
      .withColumn("sid", sum("is_new").over(wUser))
      .groupBy("user_id", "sid")
      .agg(concat_ws(">", slice(transform(
        sort_array(collect_list(struct(col("ts_ns"), col("event_id"),
          col("event_type")))), e => e("event_type")), 1, 8)).as("path"))
      .groupBy("path")
      .agg(count(lit(1)).as("n_sessions"),
        countDistinct("user_id").as("n_users"))
      .orderBy(col("n_sessions").desc, col("path"))
      .limit(20)
  }

  /** Peak concurrency (maximum simultaneous active sessions) per day —
    * the interval-overlap analytic (meeting-room / connection-pool
    * shape): sessions become ±1 endpoint events, the concurrency curve
    * is their RUNNING SUM over the global time order, and each day
    * reports its max. The global prefix sum is the scalable two-pass
    * [[graft.ops.GlobalPrefixSum]] primitive (range partitions +
    * per-partition cumsum + broadcast boundary offsets — GlobalLag's
    * sibling), never a single-partition window. Tie order is pinned
    * (+1 before −1 at the same second → inclusive overlap) and the
    * per-day MAX is invariant to permutations of equal (ts, delta)
    * rows, which is exactly the relaxation GlobalPrefixSum documents.
    */
  val q210_peak_concurrency: QueryDef = q(
    "q210_peak_concurrency",
    """WITH g AS (
      |  SELECT user_id, ts, event_id,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR CAST(floor(epoch(ts)) AS BIGINT)
      |              - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) > 1800
      |         THEN 1 ELSE 0 END AS is_new
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |s AS (
      |  SELECT *, SUM(is_new) OVER (PARTITION BY user_id
      |    ORDER BY ts, event_id) AS sid,
      |    CAST(floor(epoch(ts)) AS BIGINT) AS tsec
      |  FROM g),
      |se AS (
      |  SELECT user_id, sid, min(tsec) AS st, max(tsec) AS en
      |  FROM s GROUP BY user_id, sid),
      |en AS (
      |  SELECT st AS ts, CAST(1 AS BIGINT) AS delta, -1 AS nd FROM se
      |  UNION ALL
      |  SELECT en AS ts, CAST(-1 AS BIGINT) AS delta, 1 AS nd FROM se),
      |r AS (
      |  SELECT ts, sum(delta) OVER (ORDER BY ts, nd
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS conc
      |  FROM en)
      |SELECT CAST(floor(ts / 86400) AS BIGINT) AS day, CAST(max(conc) AS BIGINT) AS peak
      |FROM r GROUP BY 1 ORDER BY day""".stripMargin,
    "Peak concurrent sessions per day: +/-1 endpoints, distributed " +
      "global prefix sum (GlobalPrefixSum), per-day max") { (s, d) =>
    val prevSec = lag("ts_sec", 1).over(wUser)
    val sess = Tables.events(s, d)
      .withColumn("is_new",
        when(prevSec.isNull || col("ts_sec") - prevSec > 1800, lit(1L))
          .otherwise(lit(0L)))
      .withColumn("sid", sum("is_new").over(wUser))
      .groupBy("user_id", "sid")
      .agg(min("ts_sec").as("st"), max("ts_sec").as("en"))
    val ends = sess.select(col("st").as("ts"), lit(1L).as("delta"),
        lit(-1).as("nd"))
      .unionAll(sess.select(col("en").as("ts"), lit(-1L).as("delta"),
        lit(1).as("nd")))
    graft.ops.GlobalPrefixSum.withRunningSum(ends, Seq("ts", "nd"), "delta", "conc")
      .groupBy(expr("ts div 86400").as("day"))
      .agg(max("conc").cast(LongType).as("peak"))
      .orderBy("day")
  }

  /** Autocorrelation function (ACF) of the per-type daily count series
    * at lags 1..7 — the periodicity detector behind every seasonality
    * model, made EXACT the q205 way: sign and squared correlation are
    * pure rationals of the five integer sums (no sqrt, no mean
    * subtraction — the cross-multiplied Pearson form). Lag pairs live
    * on the aggregate day frame: a 7× bounded explode + one equi-join
    * on (type, day+lag), then one hash agg per (type, lag).
    */
  val q211_autocorrelation: QueryDef = q(
    "q211_autocorrelation",
    """WITH daily AS (
      |  SELECT event_type,
      |    CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
      |    CAST(count(*) AS BIGINT) AS x
      |  FROM events GROUP BY 1, 2),
      |pr AS (
      |  SELECT a.event_type, l.lag, a.x AS x, b.x AS y
      |  FROM daily a
      |  CROSS JOIN (SELECT lag FROM range(1, 8) AS t(lag)) l
      |  JOIN daily b ON b.event_type = a.event_type
      |    AND b.day = a.day + l.lag),
      |sums AS (
      |  SELECT event_type, lag, CAST(count(*) AS DECIMAL(38,0)) AS m,
      |    CAST(sum(x) AS DECIMAL(38,0)) AS sx, CAST(sum(y) AS DECIMAL(38,0)) AS sy,
      |    CAST(sum(CAST(x AS DECIMAL(38,0)) * x) AS DECIMAL(38,0)) AS sxx,
      |    CAST(sum(CAST(y AS DECIMAL(38,0)) * y) AS DECIMAL(38,0)) AS syy,
      |    CAST(sum(CAST(x AS DECIMAL(38,0)) * y) AS DECIMAL(38,0)) AS sxy
      |  FROM pr GROUP BY 1, 2)
      |, nd AS (
      |  SELECT event_type, lag, m, sx, sy, sxy,
      |    CAST(1000000 AS DECIMAL(38,0))
      |      * (m * sxy - sx * sy) * (m * sxy - sx * sy) AS num,
      |    (m * sxx - sx * sx) * (m * syy - sy * sy) AS den
      |  FROM sums)
      |SELECT event_type, CAST(lag AS BIGINT) AS lag,
      |  CAST(m AS BIGINT) AS n_pairs,
      |  CAST(CASE WHEN m * sxy - sx * sy >= 0 THEN 1 ELSE -1 END AS BIGINT)
      |    AS sign,
      |  CAST(CASE WHEN den = 0 THEN 0
      |    ELSE CAST(round(CAST(num - (num % den) AS DOUBLE)
      |      / CAST(den AS DOUBLE)) AS BIGINT) END AS BIGINT)
      |    AS r2_ppm
      |FROM nd ORDER BY event_type, lag""".stripMargin,
    "Autocorrelation of daily counts at lags 1..7: sign + exact rational " +
      "r^2 ppm per (type, lag) — sqrt-free Pearson on the day frame") {
    (s, d) =>
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), expr("ts_sec div 86400").as("day"))
        .agg(count(lit(1)).as("x"))
      val a = daily.withColumn("lag", explode(expr("sequence(1, 7)")))
      val b = daily.select(col("event_type"), col("day").as("bday"),
        col("x").as("y"))
      val dec = DecimalType(38, 0)
      a.join(b, a("event_type") === b("event_type") &&
          col("bday") === col("day") + col("lag"))
        .select(a("event_type"), col("lag"), col("x"), col("y"))
        .groupBy("event_type", "lag")
        .agg(count(lit(1)).cast(dec).as("m"),
          sum("x").cast(dec).as("sx"), sum("y").cast(dec).as("sy"),
          sum(col("x").cast(dec) * col("x")).as("sxx"),
          sum(col("y").cast(dec) * col("y")).as("syy"),
          sum(col("x").cast(dec) * col("y")).as("sxy"))
        .selectExpr("event_type", "CAST(lag AS BIGINT) AS lag",
          "CAST(m AS BIGINT) AS n_pairs",
          "CAST(CASE WHEN m * sxy - sx * sy >= 0 THEN 1 ELSE -1 END AS BIGINT) AS sign",
          """CAST(CASE WHEN (m * sxx - sx * sx) * (m * syy - sy * sy) = 0 THEN 0
             ELSE (CAST(1000000 AS DECIMAL(38,0))
                 * (m * sxy - sx * sy) * (m * sxy - sx * sy))
               div ((m * sxx - sx * sx) * (m * syy - sy * sy)) END AS BIGINT)
             AS r2_ppm""")
        .orderBy("event_type", "lag")
  }

  /** Interval-preserving DATE SHIFT — the third privacy operator
    * (k-anonymity/pseudonymization's temporal sibling, the HIPAA-style
    * de-identification trick): every user's event dates move by a
    * deterministic per-user offset in [−15, +15] days (seeded md5), so
    * absolute dates are masked while every INTRA-user interval —
    * session gaps, funnels, retention math — survives exactly. The
    * audit row per user reports the offset, shifted bounds, and a
    * span-preservation flag the oracle recomputes from the raw table.
    */
  val q221_date_shift: QueryDef = q(
    "q221_date_shift",
    """WITH off AS (
      |  SELECT user_id,
      |    CAST(('0x' || substr(md5('ds1:' || CAST(user_id AS STRING)), 1, 8))
      |      AS BIGINT) % 31 - 15 AS offset_days
      |  FROM (SELECT DISTINCT user_id FROM events)),
      |ev AS (
      |  SELECT e.user_id,
      |    CAST(floor(CAST(floor(epoch(e.ts)) AS BIGINT) / 86400) AS BIGINT) + o.offset_days AS sday,
      |    CAST(floor(CAST(floor(epoch(e.ts)) AS BIGINT) / 86400) AS BIGINT) AS day
      |  FROM events e JOIN off o ON o.user_id = e.user_id)
      |SELECT ev.user_id, CAST(o.offset_days AS BIGINT) AS offset_days,
      |  CAST(count(*) AS BIGINT) AS n_events,
      |  CAST(min(sday) AS BIGINT) AS min_day_shifted,
      |  CAST(max(sday) AS BIGINT) AS max_day_shifted,
      |  CAST(CASE WHEN max(sday) - min(sday) = max(day) - min(day)
      |    THEN 1 ELSE 0 END AS BIGINT) AS span_ok
      |FROM ev JOIN off o ON o.user_id = ev.user_id
      |GROUP BY ev.user_id, o.offset_days
      |ORDER BY ev.user_id""".stripMargin,
    "Interval-preserving date shift (privacy): per-user seeded offset in " +
      "[-15, +15] days; spans provably unchanged, audit value-oracled") {
    (s, d) =>
      val off = (c: Column) =>
        (conv(substring(md5(concat(lit("ds1:"), c.cast(StringType))), 1, 8),
          16, 10).cast(LongType) % 31 - 15).as("offset_days")
      Tables.events(s, d)
        .select(col("user_id"), expr("ts_sec div 86400").as("day"))
        .withColumn("offset_days", off(col("user_id")))
        .withColumn("sday", col("day") + col("offset_days"))
        .groupBy("user_id", "offset_days")
        .agg(count(lit(1)).as("n_events"),
          min("sday").as("min_day_shifted"),
          max("sday").as("max_day_shifted"),
          when(max("sday") - min("sday") === max("day") - min("day"), 1L)
            .otherwise(0L).as("span_ok"))
        .select(col("user_id"), col("offset_days"), col("n_events"),
          col("min_day_shifted"), col("max_day_shifted"), col("span_ok"))
        .orderBy("user_id")
  }

  /** Inter-arrival gap deciles — the latency-distribution readout
    * (watermark sizing, SLA monitoring): per-user consecutive-event
    * gaps in seconds, exact equi-depth decile bounds on the VALUE
    * DOMAIN (q204's trick on a derived metric — distinct gap values,
    * never row-wise sorting). One user-bounded lag window → one
    * value-domain histogram → cumulative ppm → 10 threshold picks.
    */
  val q222_gap_deciles: QueryDef = q(
    "q222_gap_deciles",
    """WITH g AS (
      |  SELECT CAST(floor(epoch(ts)) AS BIGINT)
      |    - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) AS gap
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |gv AS (
      |  SELECT gap AS val, CAST(count(*) AS BIGINT) AS c
      |  FROM g WHERE gap IS NOT NULL GROUP BY 1),
      |gp AS (
      |  SELECT val,
      |    CAST(CAST(floor((CAST(1000000 AS DECIMAL(38,0)) * sum(c) OVER (ORDER BY val))
      |      / (SELECT sum(c) FROM gv)) AS BIGINT) AS BIGINT) AS gpct
      |  FROM gv),
      |ks AS (SELECT k FROM range(1, 11) AS t(k))
      |SELECT CAST(ks.k AS BIGINT) AS k, min(gp.val) AS upper_gap_s
      |FROM ks JOIN gp ON gp.gpct >= ks.k * 100000
      |GROUP BY ks.k ORDER BY k""".stripMargin,
    "Inter-arrival gap deciles: exact equi-depth bounds of the per-user " +
      "consecutive-gap distribution, value-domain computation") { (s, d) =>
    val gaps = Tables.events(s, d)
      .select((col("ts_sec") - lag("ts_sec", 1).over(wUser)).as("gap"))
      .filter(col("gap").isNotNull)
    val gv = gaps.groupBy(col("gap").as("val")).agg(count(lit(1)).as("c"))
    val gt = gv.agg(sum("c").as("gn"))
    val wg = Window.orderBy("val")
    val gp = gv.crossJoin(broadcast(gt))
      .withColumn("gcum", sum("c").over(wg))
      .select(col("val"),
        expr("CAST((CAST(1000000 AS DECIMAL(38,0)) * gcum) div gn AS BIGINT)")
          .as("gpct"))
    val ks = s.range(1, 11).select(col("id").as("k"))
    broadcast(ks).join(gp, col("gpct") >= col("k") * 100000)
      .groupBy("k").agg(min("val").as("upper_gap_s"))
      .orderBy("k")
  }

  /** Cohort LTV matrix — q155's revenue twin: cohorts by first-activity
    * day, and for each cohort age (day offset) the CUMULATIVE value per
    * cohort in exact integer cents — the lifetime-value curve growth
    * teams read next to retention. Two user-keyed hash aggs + one join
    * reusing the partitioning + one cumulative window over the bounded
    * (cohort, age) frame (days² cells regardless of corpus size).
    */
  val q224_cohort_ltv: QueryDef = q(
    "q224_cohort_ltv",
    """WITH fe AS (
      |  SELECT user_id, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |  FROM events),
      |c AS (SELECT user_id, min(day) AS cohort FROM fe GROUP BY user_id),
      |cell AS (
      |  SELECT c.cohort, fe.day - c.cohort AS age,
      |    CAST(sum(fe.cents) AS BIGINT) AS rev
      |  FROM fe JOIN c ON c.user_id = fe.user_id
      |  GROUP BY 1, 2)
      |SELECT cohort, age, rev,
      |  CAST(sum(rev) OVER (PARTITION BY cohort ORDER BY age
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS cum_rev
      |FROM cell ORDER BY cohort, age""".stripMargin,
    "Cohort lifetime-value matrix: cumulative cents per (cohort, age), " +
      "bounded days^2 output — retention's revenue twin") { (s, d) =>
    val fe = Tables.events(s, d)
      .select(col("user_id"), expr("ts_sec div 86400").as("day"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("cents"))
    val c = fe.groupBy("user_id").agg(min("day").as("cohort"))
    val cell = fe.join(c, Seq("user_id"))
      .groupBy(col("cohort"), (col("day") - col("cohort")).as("age"))
      .agg(sum("cents").cast(LongType).as("rev"))
    cell.withColumn("cum_rev",
        sum("rev").over(Window.partitionBy("cohort").orderBy("age")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast(LongType))
      .orderBy("cohort", "age")
  }

  /** User growth curve — per day: first-time (new) users and the
    * cumulative distinct-user total, computed WITHOUT any rolling
    * distinct state: first-activity attribution is one user-keyed min
    * agg, and the cumulative curve is a window over the bounded day
    * frame. The activation analytics readout next to q108's edge
    * growth.
    */
  val q225_user_growth: QueryDef = q(
    "q225_user_growth",
    """WITH fa AS (
      |  SELECT user_id,
      |    min(CAST(floor(epoch(ts) / 86400) AS BIGINT)) AS day
      |  FROM events GROUP BY user_id),
      |nd AS (SELECT day, CAST(count(*) AS BIGINT) AS n_new FROM fa GROUP BY day)
      |SELECT day, n_new,
      |  CAST(sum(n_new) OVER (ORDER BY day
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS n_cumulative
      |FROM nd ORDER BY day""".stripMargin,
    "User growth curve: per-day new users + cumulative distinct total " +
      "via first-activity attribution (no rolling distinct state)") {
    (s, d) =>
      val nd = Tables.events(s, d)
        .groupBy("user_id").agg(expr("min(ts_sec div 86400)").as("day"))
        .groupBy("day").agg(count(lit(1)).as("n_new"))
      nd.withColumn("n_cumulative",
          sum("n_new").over(Window.orderBy("day")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast(LongType))
        .orderBy("day")
  }

  /** Rolling 7-day active users (WAU) — the windowed-DISTINCT companion
    * to q225's cumulative growth curve and the one id left unfilled in
    * the registry. A rolling distinct CANNOT ride a window frame (count
    * distinct over a sliding frame re-scans per row) — the scale-correct
    * shape is contribution explosion: dedup to distinct (user, day)
    * pairs, explode each onto the ≤7 window END days it serves, and
    * hash-agg `count(distinct user)` per end day, restricted to days
    * that actually occur. Two shuffles and a constant ×7 fan-out at any
    * corpus size — the DISTINCT pre-shrink runs first, so the fan-out is
    * over user-days, never raw events.
    */
  val q176_rolling_actives: QueryDef = q(
    "q176_rolling_actives",
    """WITH ud AS (
      |  SELECT DISTINCT user_id,
      |    CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day
      |  FROM events),
      |days AS (SELECT DISTINCT day FROM ud)
      |SELECT d.day, CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS wau
      |FROM days d JOIN ud u ON u.day BETWEEN d.day - 6 AND d.day
      |GROUP BY d.day ORDER BY d.day""".stripMargin,
    "Rolling 7-day distinct actives via contribution explosion over " +
      "deduped user-days (no sliding-frame distinct, no range join)") {
    (s, d) =>
      val ud = Tables.events(s, d)
        .select(col("user_id"), expr("ts_sec div 86400").as("day"))
        .distinct()
      val days = ud.select(col("day")).distinct()
      ud.withColumn("day", explode(sequence(col("day"), col("day") + 6)))
        .join(days, Seq("day"), "left_semi")
        .groupBy("day")
        .agg(countDistinct("user_id").as("wau"))
        .orderBy("day")
  }

  /** The q154 conversion funnel SPLIT BY EXPERIMENT ARM (q186's md5
    * variant assignment) — the A/B experiment readout: per (variant,
    * step) reach, sharing one user-partition shuffle for the three
    * chained conditional mins. Composition of two oracled kernels whose
    * interaction (variant-conditional funnel counts) is value-checked.
    */
  val q226_variant_funnel: QueryDef = q(
    "q226_variant_funnel",
    """WITH f AS (
      |  SELECT user_id, event_type,
      |    CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec,
      |    CASE WHEN substr(md5('ab:' || CAST(user_id AS STRING)), 1, 1) < '8'
      |      THEN 'A' ELSE 'B' END AS variant
      |  FROM events),
      |u1 AS (
      |  SELECT user_id, variant,
      |    MIN(CASE WHEN event_type = 'view' THEN ts_sec END) AS t1
      |  FROM f GROUP BY user_id, variant),
      |u2 AS (
      |  SELECT f.user_id, u1.variant, u1.t1,
      |    MIN(CASE WHEN f.event_type = 'click' AND f.ts_sec > u1.t1
      |        THEN f.ts_sec END) AS t2
      |  FROM f JOIN u1 ON f.user_id = u1.user_id
      |  GROUP BY f.user_id, u1.variant, u1.t1),
      |u3 AS (
      |  SELECT f.user_id, u2.variant, u2.t1, u2.t2,
      |    MIN(CASE WHEN f.event_type = 'purchase' AND f.ts_sec > u2.t2
      |        THEN f.ts_sec END) AS t3
      |  FROM f JOIN u2 ON f.user_id = u2.user_id
      |  GROUP BY f.user_id, u2.variant, u2.t1, u2.t2)
      |SELECT variant, step, CAST(n_users AS BIGINT) AS n_users FROM (
      |  SELECT variant, 'p1_view' AS step, COUNT(t1) AS n_users
      |  FROM u3 GROUP BY variant
      |  UNION ALL
      |  SELECT variant, 'p2_click', COUNT(t2) FROM u3 GROUP BY variant
      |  UNION ALL
      |  SELECT variant, 'p3_purchase', COUNT(t3) FROM u3 GROUP BY variant)
      |ORDER BY variant, step""".stripMargin,
    "Conversion funnel per A/B arm: q154's chained conditional mins + " +
      "q186's variant split — per-(variant, step) reach") { (s, d) =>
    val w = Window.partitionBy("user_id")
    val perUser = Tables.events(s, d)
      .select("user_id", "event_type", "ts_sec")
      .withColumn("variant",
        when(substring(md5(concat(lit("ab:"), col("user_id").cast(StringType))),
          1, 1) < "8", "A").otherwise("B"))
      .withColumn("t1", min(when(col("event_type") === "view",
        col("ts_sec"))).over(w))
      .withColumn("t2", min(when(col("event_type") === "click" &&
        col("ts_sec") > col("t1"), col("ts_sec"))).over(w))
      .withColumn("t3", min(when(col("event_type") === "purchase" &&
        col("ts_sec") > col("t2"), col("ts_sec"))).over(w))
      .groupBy("user_id", "variant")
      .agg(first("t1").as("t1"), first("t2").as("t2"), first("t3").as("t3"))
    perUser.groupBy("variant")
      .agg(count(col("t1")).as("n1"), count(col("t2")).as("n2"),
        count(col("t3")).as("n3"))
      .select(col("variant"), explode(array(
        struct(lit("p1_view").as("step"), col("n1").as("n_users")),
        struct(lit("p2_click").as("step"), col("n2").as("n_users")),
        struct(lit("p3_purchase").as("step"), col("n3").as("n_users"))))
        .as("r"))
      .select(col("variant"), col("r.step").as("step"),
        col("r.n_users").as("n_users"))
      .orderBy("variant", "step")
  }

  /** Week-over-week growth per event type — the KPI-report delta: weekly
    * counts, previous week via one lag over the bounded (type, week)
    * frame, growth in exact floor-ppm with the portable-floor CASE
    * (shrinking weeks go negative, where Spark's truncating `div` and
    * DuckDB's flooring `//` would silently diverge — q179's rule).
    */
  val q227_wow_growth: QueryDef = q(
    "q227_wow_growth",
    """WITH wk AS (
      |  SELECT event_type,
      |    CAST(floor(epoch(ts) / 604800) AS BIGINT) AS week,
      |    CAST(count(*) AS BIGINT) AS x
      |  FROM events GROUP BY 1, 2),
      |l AS (
      |  SELECT *, lag(x) OVER (PARTITION BY event_type ORDER BY week)
      |    AS prev
      |  FROM wk)
      |SELECT event_type, week, x, prev,
      |  CAST(CASE WHEN prev IS NULL OR prev = 0 THEN NULL
      |    WHEN 1000000 * (x - prev) >= 0 THEN CAST(floor((1000000 * (x - prev)) / prev) AS BIGINT)
      |    ELSE -CAST(floor((-(1000000 * (x - prev)) + prev - 1) / prev) AS BIGINT) END
      |    AS BIGINT) AS growth_ppm
      |FROM l ORDER BY event_type, week""".stripMargin,
    "Week-over-week growth per type: exact floor-ppm deltas with the " +
      "portable-floor CASE for shrinking weeks") { (s, d) =>
    Tables.events(s, d)
      .groupBy(col("event_type"), expr("ts_sec div 604800").as("week"))
      .agg(count(lit(1)).as("x"))
      .withColumn("prev", lag("x", 1).over(
        Window.partitionBy("event_type").orderBy("week")))
      .withColumn("growth_ppm", expr(
        """CAST(CASE WHEN prev IS NULL OR prev = 0 THEN NULL
          |  WHEN 1000000 * (x - prev) >= 0 THEN (1000000 * (x - prev)) div prev
          |  ELSE -((-(1000000 * (x - prev)) + prev - 1) div prev) END
          |  AS BIGINT)""".stripMargin))
      .orderBy("event_type", "week")
  }

  /** Time-to-convert deciles — how long the view→purchase journey takes:
    * per converting user the exact (first purchase after first view) −
    * (first view) latency, then equi-depth decile bounds on the VALUE
    * DOMAIN (q222's machinery on the funnel latency metric). One
    * user-partition shuffle for the two conditional mins, then
    * aggregate-sized frames only.
    */
  val q228_conversion_latency: QueryDef = q(
    "q228_conversion_latency",
    """WITH f AS (
      |  SELECT user_id, event_type,
      |    CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec
      |  FROM events),
      |u1 AS (
      |  SELECT user_id,
      |    MIN(CASE WHEN event_type = 'view' THEN ts_sec END) AS t1
      |  FROM f GROUP BY user_id),
      |u2 AS (
      |  SELECT f.user_id,
      |    MIN(CASE WHEN f.event_type = 'purchase' AND f.ts_sec > u1.t1
      |        THEN f.ts_sec END) - u1.t1 AS lat
      |  FROM f JOIN u1 ON f.user_id = u1.user_id
      |  GROUP BY f.user_id, u1.t1),
      |gv AS (
      |  SELECT lat AS val, CAST(count(*) AS BIGINT) AS c
      |  FROM u2 WHERE lat IS NOT NULL GROUP BY 1),
      |gp AS (
      |  SELECT val,
      |    CAST(CAST(floor((CAST(1000000 AS DECIMAL(38,0)) * sum(c) OVER (ORDER BY val))
      |      / (SELECT sum(c) FROM gv)) AS BIGINT) AS BIGINT) AS gpct
      |  FROM gv),
      |ks AS (SELECT k FROM range(1, 11) AS t(k))
      |SELECT CAST(ks.k AS BIGINT) AS k, min(gp.val) AS upper_latency_s
      |FROM ks JOIN gp ON gp.gpct >= ks.k * 100000
      |GROUP BY ks.k ORDER BY k""".stripMargin,
    "Time-to-convert deciles: first-view -> first-subsequent-purchase " +
      "latency, exact equi-depth bounds on the value domain") { (s, d) =>
    val w = Window.partitionBy("user_id")
    val lat = Tables.events(s, d)
      .select("user_id", "event_type", "ts_sec")
      .withColumn("t1", min(when(col("event_type") === "view",
        col("ts_sec"))).over(w))
      .withColumn("tp", min(when(col("event_type") === "purchase" &&
        col("ts_sec") > col("t1"), col("ts_sec"))).over(w))
      .groupBy("user_id")
      .agg((first("tp") - first("t1")).as("lat"))
      .filter(col("lat").isNotNull)
    val gv = lat.groupBy(col("lat").as("val")).agg(count(lit(1)).as("c"))
    val gt = gv.agg(sum("c").as("gn"))
    val gp = gv.crossJoin(broadcast(gt))
      .withColumn("gcum", sum("c").over(Window.orderBy("val")))
      .select(col("val"),
        expr("CAST((CAST(1000000 AS DECIMAL(38,0)) * gcum) div gn AS BIGINT)")
          .as("gpct"))
    val ks = s.range(1, 11).select(col("id").as("k"))
    broadcast(ks).join(gp, col("gpct") >= col("k") * 100000)
      .groupBy("k").agg(min("val").as("upper_latency_s"))
      .orderBy("k")
  }

  /** [[graft.ops.Graph.localClustering]] over the interaction graph —
    * the node-resolved "how cliquish is my neighborhood" metric q73's
    * global census cannot answer: cc(v) = 2·tri(v)/(deg·(deg−1)) in
    * exact floor-ppm. The oracle enumerates each triangle ONCE in
    * a<b<c order and explodes its three corners — orientation-invariant
    * per-node counts, so the engine's degree-oriented wedge path must
    * agree exactly.
    */
  val q230_local_clustering: QueryDef = q(
    "q230_local_clustering",
    edgesSql +
      """,
        |tri AS (
        |  SELECT e1.a AS x, e1.b AS y, e2.b AS z
        |  FROM we e1
        |  JOIN we e2 ON e2.a = e1.a AND e2.b > e1.b
        |  JOIN we e3 ON e3.a = e1.b AND e3.b = e2.b),
        |tn AS (
        |  SELECT v, CAST(count(*) AS BIGINT) AS n_tri FROM (
        |    SELECT x AS v FROM tri
        |    UNION ALL SELECT y AS v FROM tri
        |    UNION ALL SELECT z AS v FROM tri)
        |  GROUP BY v),
        |deg AS (
        |  SELECT v, CAST(count(*) AS BIGINT) AS deg FROM (
        |    SELECT a AS v FROM we UNION ALL SELECT b AS v FROM we)
        |  GROUP BY v)
        |SELECT deg.v AS user_id, deg.deg,
        |  COALESCE(tn.n_tri, 0) AS n_tri,
        |  CAST(CASE WHEN deg.deg >= 2
        |    THEN CAST(floor((CAST(2000000 AS DECIMAL(38,0)) * COALESCE(tn.n_tri, 0))
        |      / (CAST(deg.deg AS DECIMAL(38,0)) * (deg.deg - 1))) AS BIGINT)
        |    ELSE 0 END AS BIGINT) AS cc_ppm
        |FROM deg LEFT JOIN tn ON tn.v = deg.v
        |ORDER BY user_id""".stripMargin,
    "Local clustering coefficient per user: degree-oriented per-node " +
      "triangle counts, exact floor-ppm — a<b<c-enumerated oracle") {
    (s, d) =>
      val we = graft.ops.Graph.fromEvents(s, d)
      graft.ops.Graph.localClustering(we, "source", "target")
        .select(col("v").as("user_id"), col("deg"), col("n_tri"),
          col("cc_ppm"))
        .orderBy("user_id")
  }

  /** MAD-based robust outlier detection per event type — the robust twin
    * of q167's z-score (mean/σ break under the very outliers they hunt;
    * median/MAD have a 50% breakdown point). Everything runs on the
    * VALUE DOMAIN in exact cents: per-type value histogram → cumulative
    * → discrete lower median → absolute-deviation histogram → MAD →
    * outliers = rows with |v − med| > 3·MAD. The windows order DISTINCT
    * cent values per type (domain-sized partitions, never row-sized —
    * the q200/q204 machinery), and every statistic is an exact BIGINT
    * both engines replay.
    */
  val q240_mad_outliers: QueryDef = QueryDef(
    "q240_mad_outliers",
    (s, d) => {
      val ev = Tables.events(s, d).select(col("event_type"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("c"))
      val gv = ev.groupBy("event_type", "c").agg(count(lit(1)).as("n"))
      val wv = Window.partitionBy("event_type").orderBy("c")
      val tot = gv.groupBy("event_type").agg(sum("n").as("tot"))
      val med = gv
        .withColumn("cum", sum("n").over(wv))
        .join(tot, Seq("event_type"))
        .filter(col("cum") >= expr("(tot + 1) div 2"))
        .groupBy("event_type").agg(min("c").as("med"))
      val gd = gv.join(med, Seq("event_type"))
        .groupBy(col("event_type"), abs(col("c") - col("med")).as("dev"))
        .agg(sum("n").as("n"))
      val wd = Window.partitionBy("event_type").orderBy("dev")
      val mad = gd
        .withColumn("cum", sum("n").over(wd))
        .join(tot, Seq("event_type"))
        .filter(col("cum") >= expr("(tot + 1) div 2"))
        .groupBy("event_type").agg(min("dev").as("mad"))
      gd.join(mad, Seq("event_type"))
        .groupBy("event_type")
        .agg(sum(when(col("dev") > col("mad") * 3, col("n"))
          .otherwise(lit(0L))).as("n_outliers"))
        .join(med, Seq("event_type")).join(mad, Seq("event_type"))
        .join(tot, Seq("event_type"))
        .select(col("event_type"), col("med").as("median_cents"),
          col("mad").as("mad_cents"),
          col("n_outliers").cast(LongType).as("n_outliers"),
          col("tot").cast(LongType).as("n_rows"))
        .orderBy("event_type")
    },
    Some("""WITH ev AS (
      |  SELECT event_type,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
      |  FROM events),
      |gv AS (SELECT event_type, c, count(*) AS n FROM ev GROUP BY 1, 2),
      |tot AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS tot
      |        FROM gv GROUP BY 1),
      |med AS (
      |  SELECT g.event_type AS event_type, min(c) AS med FROM (
      |    SELECT event_type, c,
      |      sum(n) OVER (PARTITION BY event_type ORDER BY c) AS cum
      |    FROM gv) g
      |  JOIN tot t ON t.event_type = g.event_type
      |  WHERE g.cum >= CAST(floor((t.tot + 1) / 2) AS BIGINT)
      |  GROUP BY g.event_type),
      |gd AS (
      |  SELECT gv.event_type, abs(gv.c - med.med) AS dev,
      |    CAST(sum(gv.n) AS BIGINT) AS n
      |  FROM gv JOIN med ON med.event_type = gv.event_type
      |  GROUP BY 1, 2),
      |mad AS (
      |  SELECT g.event_type AS event_type, min(dev) AS mad FROM (
      |    SELECT event_type, dev,
      |      sum(n) OVER (PARTITION BY event_type ORDER BY dev) AS cum
      |    FROM gd) g
      |  JOIN tot t ON t.event_type = g.event_type
      |  WHERE g.cum >= CAST(floor((t.tot + 1) / 2) AS BIGINT)
      |  GROUP BY g.event_type)
      |SELECT gd.event_type AS event_type, med.med AS median_cents,
      |  mad.mad AS mad_cents,
      |  CAST(sum(CASE WHEN gd.dev > mad.mad * 3 THEN gd.n ELSE 0 END)
      |    AS BIGINT) AS n_outliers,
      |  CAST(max(tot.tot) AS BIGINT) AS n_rows
      |FROM gd
      |JOIN med ON med.event_type = gd.event_type
      |JOIN mad ON mad.event_type = gd.event_type
      |JOIN tot ON tot.event_type = gd.event_type
      |GROUP BY 1, 2, 3
      |ORDER BY 1""".stripMargin),
    "Robust MAD outlier detection per type: discrete medians over the " +
      "exact-cents value domain, 3-MAD outlier counts, all BIGINT")

  /** Exponentially-weighted moving average of the per-type daily volume
    * in EXACT BINARY FRACTIONS — the float-free EWMA: α = 1/2 makes every
    * weight a power of two (gap g ← weight 2^(7−g), truncated at an
    * 8-day tail, ≤0.4% truncation error), so numerator and denominator
    * are exact BIGINTs both engines replay, where the textbook float
    * recursion would accumulate engine-specific rounding. Scale shape:
    * the corpus collapses to per-(type, day) counts FIRST (one map-side
    * combinable agg), then the bounded cover-explode (≤8 rows per
    * aggregate row, q185's pattern) lands each day's count on its ≤8
    * downstream window ends — no self-join, no per-row window over the
    * corpus. Only occurring (type, day) cells are reported.
    */
  val q244_ewma: QueryDef = QueryDef(
    "q244_ewma",
    (s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), expr("ts_sec div 86400").as("day"))
        .agg(count(lit(1)).as("n"))
      val contrib = daily
        .select(col("event_type"), col("day"), col("n"),
          explode(expr("sequence(0, 7)")).as("g"))
        .select(col("event_type"), (col("day") + col("g")).as("day"),
          expr("n * shiftleft(1L, 7 - g)").as("num_c"),
          expr("shiftleft(1L, 7 - g)").as("den_c"))
      val sums = contrib.groupBy("event_type", "day")
        .agg(sum("num_c").as("ewma_num"), sum("den_c").as("ewma_den"))
      daily.join(sums, Seq("event_type", "day"))
        .select(col("event_type"), col("day"),
          col("n").cast(LongType).as("n"),
          col("ewma_num").cast(LongType).as("ewma_num"),
          col("ewma_den").cast(LongType).as("ewma_den"),
          expr("(1000 * ewma_num) div ewma_den").cast(LongType)
            .as("ewma_milli"))
        .orderBy("event_type", "day")
    },
    Some("""WITH daily AS (
      |  SELECT event_type,
      |    CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
      |    COUNT(*) AS n
      |  FROM events GROUP BY 1, 2),
      |sums AS (
      |  SELECT a.event_type, a.day,
      |    CAST(sum(b.n * (1 << CAST(7 - (a.day - b.day) AS INTEGER)))
      |      AS BIGINT) AS ewma_num,
      |    CAST(sum(1 << CAST(7 - (a.day - b.day) AS INTEGER)) AS BIGINT)
      |      AS ewma_den
      |  FROM daily a JOIN daily b
      |    ON b.event_type = a.event_type
      |   AND a.day - b.day BETWEEN 0 AND 7
      |  GROUP BY 1, 2)
      |SELECT d.event_type AS event_type, d.day AS day,
      |  CAST(d.n AS BIGINT) AS n, s.ewma_num AS ewma_num,
      |  s.ewma_den AS ewma_den,
      |  CAST(floor((1000 * s.ewma_num) / s.ewma_den) AS BIGINT) AS ewma_milli
      |FROM daily d JOIN sums s
      |  ON s.event_type = d.event_type AND s.day = d.day
      |ORDER BY event_type, day""".stripMargin),
    "EWMA daily-volume smoothing in exact binary fractions (α=1/2, " +
      "8-day truncated tail): bounded cover-explode, no float recursion")

  /** Two-sided 5% TRIMMED MEAN of the value column per event type — the
    * robust location estimate between q240's median and the plain mean,
    * computed entirely on the VALUE DOMAIN in exact cents: per-type
    * distinct-cent histogram → cumulative → each distinct value keeps
    * `max(0, min(cum, hi) − max(cum − m, lo))` of its m occurrences
    * (lo = ⌊n·5%⌋ rows cut from each tail, hi = n − lo), so the trim cuts
    * ROWS, not distinct values, exactly like an order-statistics scan —
    * without ever sorting rows (the window orders DISTINCT cents per
    * type). The mean is reported in exact floor micro-cents via the
    * portable-floor CASE (value cents can be negative, where Spark `div`
    * truncates but DuckDB `//` floors — q179's rule).
    */
  val q245_trimmed_mean: QueryDef = QueryDef(
    "q245_trimmed_mean",
    (s, d) => {
      val ev = Tables.events(s, d).select(col("event_type"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("c"))
      val gv = ev.groupBy("event_type", "c").agg(count(lit(1)).as("m"))
      val wv = Window.partitionBy("event_type").orderBy("c")
      val tot = gv.groupBy("event_type").agg(sum("m").as("n"))
      gv.withColumn("cum", sum("m").over(wv))
        .join(tot, Seq("event_type"))
        .withColumn("lo", expr("n * 5 div 100"))
        .withColumn("hi", col("n") - col("lo"))
        .withColumn("kept", greatest(lit(0L),
          least(col("cum"), col("hi")) - greatest(col("cum") - col("m"), col("lo"))))
        .groupBy("event_type")
        .agg(max("n").as("n_rows"), max(col("hi") - col("lo")).as("n_kept"),
          sum(expr("c * kept")).as("tsum"))
        .select(col("event_type"), col("n_rows").cast(LongType).as("n_rows"),
          col("n_kept").cast(LongType).as("n_kept"),
          // DECIMAL(38) product guard (the Association.lift_ppm rule):
          // 10⁶ · Σ(c·kept) wraps BIGINT at 100 TB row counts
          expr("CASE WHEN tsum >= 0 THEN " +
            "(CAST(1000000 AS DECIMAL(38,0)) * tsum) div n_kept " +
            "ELSE -((CAST(-1000000 AS DECIMAL(38,0)) * tsum + n_kept - 1) " +
            "div n_kept) END")
            .cast(LongType).as("trimmed_mean_micro_cents"))
        .orderBy("event_type")
    },
    Some("""WITH ev AS (
      |  SELECT event_type,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
      |  FROM events),
      |gv AS (SELECT event_type, c, COUNT(*) AS m FROM ev GROUP BY 1, 2),
      |tot AS (SELECT event_type, CAST(sum(m) AS BIGINT) AS n
      |        FROM gv GROUP BY 1),
      |cum AS (
      |  SELECT g.event_type, g.c, g.m, t.n,
      |    CAST(CAST(floor(n * 5 / 100) AS BIGINT) AS BIGINT) AS lo,
      |    CAST(n - (CAST(floor(n * 5 / 100) AS BIGINT)) AS BIGINT) AS hi,
      |    sum(g.m) OVER (PARTITION BY g.event_type ORDER BY g.c) AS cm
      |  FROM gv g JOIN tot t ON t.event_type = g.event_type),
      |kept AS (
      |  SELECT event_type, n, hi - lo AS nk,
      |    c * greatest(0, least(cm, hi) - greatest(cm - m, lo)) AS ks
      |  FROM cum)
      |SELECT event_type, CAST(max(n) AS BIGINT) AS n_rows,
      |  CAST(max(nk) AS BIGINT) AS n_kept,
      |  CAST(CASE WHEN sum(ks) >= 0
      |    THEN CAST(floor((CAST(1000000 AS DECIMAL(38,0)) * sum(ks)) / max(nk)) AS BIGINT)
      |    ELSE -(CAST(floor((CAST(-1000000 AS DECIMAL(38,0)) * sum(ks) + max(nk) - 1)
      |           / max(nk)) AS BIGINT)) END AS BIGINT) AS trimmed_mean_micro_cents
      |FROM kept GROUP BY 1
      |ORDER BY event_type""".stripMargin),
    "Two-sided 5% trimmed mean per type on the exact-cents value domain: " +
      "row-exact tail cuts without sorting rows, portable-floor micro mean")

  /** HyperBall-style k-hop NEIGHBORHOOD FUNCTION (Boldi/Rosa/Vigna) over
    * the interaction graph — per-node "how many nodes are within ≤2
    * hops" (incl. self), the primitive behind effective-diameter and
    * centrality estimates. The 100 TB shape is the SKETCHED iteration:
    * ball(0) = one HLL per node, ball(k+1) = hll_union of neighbors'
    * ball(k) ∪ own — per round one adjacency join + one sketch-merge
    * agg, per-node state a CONSTANT-size sketch, so hub neighborhoods
    * cost their edge count, never their ball size. Exact 2-hop reach
    * (the Σdeg² path explosion the sketch exists to avoid) is computed
    * HERE only as the oracle gate at test scale; the released number is
    * gated ≤5% off exact per node, q171's sketch-gate discipline.
    */
  val q239_khop_reach: QueryDef = QueryDef(
    "q239_khop_reach",
    (s, d) => {
      val we = graft.ops.Graph.fromEvents(s, d)
      val adj = we.select(col("source").as("v"), col("target").as("n"))
        .unionAll(we.select(col("target").as("v"), col("source").as("n")))
      val nodes = adj.select("v").distinct()
      def ckpt(df: DataFrame): DataFrame =
        if (s.sparkContext.getCheckpointDir.isDefined) df.checkpoint(true)
        else df.localCheckpoint(true)
      var ball = ckpt(nodes.groupBy("v")
        .agg(hll_sketch_agg(col("v"), lit(14)).as("sk")))
      for (_ <- 1 to 2) {
        val fromNeighbors = adj
          .join(ball.select(col("v").as("n"), col("sk")), Seq("n"))
          .select(col("v"), col("sk"))
        ball = ckpt(fromNeighbors.unionByName(ball.select(col("v"), col("sk")))
          .groupBy("v").agg(hll_union_agg(col("sk")).as("sk")))
      }
      // exact 2-hop ball — test-scale oracle gate only (Σdeg² paths)
      val hop1 = adj.select(col("v"), col("n").as("u"))
      val exact = hop1
        .unionByName(adj.as("e1").join(adj.select(col("v").as("m"), col("n").as("u")),
          col("n") === col("m")).select(col("v"), col("u")))
        .unionByName(nodes.select(col("v"), col("v").as("u")))
        .distinct()
        .groupBy("v").agg(count(lit(1)).as("exact_reach"))
      ball.join(exact, Seq("v"))
        .select(col("v").as("user_id"),
          col("exact_reach").cast(LongType).as("exact_reach"),
          when(abs(hll_sketch_estimate(col("sk")) - col("exact_reach")) <=
            col("exact_reach") * 0.05, 1L).otherwise(0L).as("within_tol"))
        .orderBy("user_id")
    },
    Some(edgesSql +
      """,
        |adj AS (SELECT a AS v, b AS n FROM we UNION ALL SELECT b, a FROM we),
        |ball AS (
        |  SELECT v, u FROM (
        |    SELECT v, n AS u FROM adj
        |    UNION
        |    SELECT a1.v, a2.n AS u FROM adj a1 JOIN adj a2 ON a2.v = a1.n
        |    UNION
        |    SELECT v, v AS u FROM adj) t)
        |SELECT v AS user_id, CAST(count(*) AS BIGINT) AS exact_reach,
        |  CAST(1 AS BIGINT) AS within_tol
        |FROM ball GROUP BY v ORDER BY user_id""".stripMargin),
    "HyperBall 2-hop neighborhood function: HLL ball iteration " +
      "(constant per-node state, join + sketch-merge per round), " +
      "5%-gated per node vs the exact 2-hop reach")

  /** Unrolled per-round CTEs for the q231 oracle: each generation
    * distributes the current ppm mass along the transition counts with
    * the PINNED per-term floor `(π_i · c_ij) div r_i`, then rescales the
    * 5-row vector back to Σ = 10⁶.
    */
  private def markovRoundSql(rounds: Int): String =
    (1 to rounds).map { k =>
      s"""raw$k AS MATERIALIZED (
         |  SELECT tm.dst AS st, sum(CAST(floor((p.p * tm.c) / tm.r) AS BIGINT)) AS raw
         |  FROM tm JOIN pi${k - 1} p ON p.st = tm.src
         |  GROUP BY tm.dst),
         |pi$k AS MATERIALIZED (
         |  SELECT st, CAST(floor((CAST(1000000 AS DECIMAL(38,0)) * raw)
         |    / (SELECT sum(raw) FROM raw$k)) AS BIGINT) AS p
         |  FROM raw$k)""".stripMargin
    }.mkString(",\n")

  /** Stationary distribution of q178's event-transition Markov chain —
    * 4 power-iteration rounds in EXACT integers: mass moves along the
    * transition counts with a pinned per-term floor, and each round
    * rescales the 5-row vector to Σ = 10⁶ (q180's integer-normalization
    * trick on a stochastic matrix). Every frame after the one corpus
    * pass is state-count-sized (5 rows).
    */
  val q231_markov_stationary: QueryDef = q(
    "q231_markov_stationary",
    """WITH seq AS (
      |  SELECT user_id, event_type,
      |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      AS prev
      |  FROM events),
      |tm AS MATERIALIZED (
      |  SELECT prev AS src, event_type AS dst,
      |    CAST(count(*) AS BIGINT) AS c,
      |    CAST(sum(count(*)) OVER (PARTITION BY prev) AS BIGINT) AS r
      |  FROM seq WHERE prev IS NOT NULL
      |  GROUP BY prev, event_type),
      |states AS (SELECT DISTINCT src AS st FROM tm),
      |pi0 AS (
      |  SELECT st, CAST(floor(CAST(1000000 AS DECIMAL(38,0))
      |    / (SELECT count(*) FROM states)) AS BIGINT) AS p
      |  FROM states),
      |""".stripMargin + markovRoundSql(4) +
      """
        |SELECT st AS event_type, CAST(p AS BIGINT) AS pi_ppm
        |FROM pi4 ORDER BY st""".stripMargin,
    "Stationary distribution of the event-transition chain: 4 exact " +
      "integer power-iteration rounds with ppm rescale") { (s, d) =>
    val seq = Tables.events(s, d)
      .withColumn("prev", lag("event_type", 1).over(wUser))
      .filter(col("prev").isNotNull)
    val tm = seq.groupBy(col("prev").as("src"), col("event_type").as("dst"))
      .agg(count(lit(1)).as("c"))
      .withColumn("r", sum("c").over(Window.partitionBy("src")))
      .localCheckpoint(true)
    val states = tm.select(col("src").as("st")).distinct()
    val nStates = states.count()
    var pi = states.select(col("st"),
      expr(s"CAST(CAST(1000000 AS DECIMAL(38,0)) div $nStates AS BIGINT)")
        .as("p"))
    for (_ <- 1 to 4) {
      val raw = tm.join(pi.withColumnRenamed("st", "src"), Seq("src"))
        .groupBy(col("dst").as("st"))
        .agg(sum(expr("(p * c) div r")).as("raw"))
      val tot = raw.agg(sum("raw").as("t"))
      pi = raw.crossJoin(broadcast(tot))
        .select(col("st"),
          expr("CAST((CAST(1000000 AS DECIMAL(38,0)) * raw) div t AS BIGINT)")
            .as("p"))
        .localCheckpoint(true)
    }
    pi.select(col("st").as("event_type"), col("p").as("pi_ppm"))
      .orderBy("event_type")
  }

  /** Degree distribution in log₂ buckets — the scale-free-ness readout
    * every graph report leads with, with the log kept EXACT: bucket =
    * ⌊log₂ deg⌋ computed as `length(bin(deg)) − 1` (bit length, pure
    * integer — no float log at any scale) on both engines. One degree
    * agg + one bounded bucket agg.
    */
  val q232_degree_histogram: QueryDef = q(
    "q232_degree_histogram",
    edgesSql +
      """,
        |deg AS (
        |  SELECT v, CAST(count(*) AS BIGINT) AS deg FROM (
        |    SELECT a AS v FROM we UNION ALL SELECT b AS v FROM we)
        |  GROUP BY v)
        |SELECT CAST(length(bin(deg)) - 1 AS BIGINT) AS bucket,
        |  CAST(count(*) AS BIGINT) AS n_nodes,
        |  min(deg) AS min_deg, max(deg) AS max_deg
        |FROM deg GROUP BY 1 ORDER BY bucket""".stripMargin,
    "Degree distribution in exact log2 buckets (bit length, no float " +
      "log): nodes + degree range per bucket") { (s, d) =>
    val we = graft.ops.Graph.fromEvents(s, d)
    we.select(col("source").as("v")).unionAll(we.select(col("target").as("v")))
      .groupBy("v").agg(count(lit(1)).as("deg"))
      .groupBy((length(bin(col("deg"))) - 1).cast(LongType).as("bucket"))
      .agg(count(lit(1)).as("n_nodes"),
        min("deg").as("min_deg"), max("deg").as("max_deg"))
      .orderBy("bucket")
  }

  /** Unrolled Bellman-Ford generations `d$k` for the q182 oracle: round
    * k's frame is the min over (keep previous dist) ∪ (relax every edge
    * out of a previously-reached node) — the exact SQL transliteration of
    * one engine round. AS MATERIALIZED (each d$k is read twice).
    */
  private def ssspRoundSql(rounds: Int): String =
    (1 to rounds).map { k =>
      s"""d$k AS MATERIALIZED (
         |  SELECT v, min(c) AS cost FROM (
         |    SELECT v, cost AS c FROM d${k - 1}
         |    UNION ALL
         |    SELECT g.t AS v, d.cost + g.cost AS c
         |    FROM g JOIN d${k - 1} d ON d.v = g.s)
         |  GROUP BY v)""".stripMargin
    }.mkString(",\n")

  /** [[graft.ops.Graph.shortestPaths]] over the interaction graph with
    * AFFINITY costs — edge cost = ⌈10⁶ / weight⌉, so strongly-interacting
    * pairs are "close" — from the smallest user id, 6 Bellman-Ford
    * rounds: the cheapest ≤6-edge path cost per reachable user, exact
    * integers end to end (zero-tolerance oracle). The semantics are
    * well-defined at any round count, which is what lets the engine
    * early-exit at the fixpoint against a fixed unrolled CTE chain.
    */
  val q182_weighted_sssp: QueryDef = q(
    "q182_weighted_sssp",
    edgesSql +
      s""",
        |g AS MATERIALIZED (
        |  SELECT s, t, CAST(floor((1000000 + w - 1) / w) AS BIGINT) AS cost FROM (
        |    SELECT a AS s, b AS t, weight AS w FROM we
        |    UNION ALL SELECT b AS s, a AS t, weight AS w FROM we)),
        |d0 AS (SELECT (SELECT min(s) FROM g) AS v, CAST(0 AS BIGINT) AS cost),
        |${ssspRoundSql(6)}
        |SELECT v AS user_id, CAST(cost AS BIGINT) AS cost
        |FROM d6 ORDER BY v""".stripMargin,
    "Single-source shortest paths (Bellman-Ford, 6 rounds) with exact " +
      "integer affinity costs ceil(1e6/weight) — zero-tolerance oracle") {
    (s, d) =>
      val we = graft.ops.Graph.fromEvents(s, d)
      val dirE = we.select(col("source").as("s"), col("target").as("t"), col("weight"))
        .unionAll(we.select(col("target").as("s"), col("source").as("t"), col("weight")))
        .select(col("s"), col("t"),
          expr("(1000000 + weight - 1) div weight").as("cost"))
      val seeds = dirE.agg(min("s").as("v"))
      graft.ops.Graph.shortestPaths(dirE, seeds, rounds = 6)
        .select(col("v").as("user_id"), col("cost"))
        .orderBy("user_id")
  }

  /** [[graft.ops.Graph.hits]] over the DIRECTED response graph (prev
    * speaker → next speaker, distinct pairs — the direction the
    * canonical interaction graph erases): 3 mutual-reinforcement rounds,
    * hub/authority per node in exact integer ppm. VALUE-LEVEL oracled
    * with zero tolerance — the integer rescale normalization makes the
    * unrolled DuckDB chain bit-exact, unlike the double-valued PageRank
    * gates. Distinguishes "starts conversations with well-responded
    * users" (hub) from "gets responses from active starters" (authority)
    * — a different matrix recurrence (AᵀA / AAᵀ) than the random-walk
    * family.
    */
  val q180_hits_scores: QueryDef = q(
    "q180_hits_scores",
    s"""WITH seq AS (
       |  SELECT user_id, lag(user_id) OVER (ORDER BY ts, event_id) AS prev
       |  FROM events),
       |de AS MATERIALIZED (
       |  SELECT DISTINCT prev AS s, user_id AS t
       |  FROM seq WHERE prev IS NOT NULL AND prev <> user_id),
       |nodes AS MATERIALIZED (
       |  SELECT DISTINCT v
       |  FROM (SELECT s AS v FROM de UNION ALL SELECT t AS v FROM de)),
       |h0 AS (SELECT v, CAST(1000000 AS DECIMAL(38,0)) AS score FROM nodes),
       |${hitsRoundSql(3)}
       |SELECT n.v AS user_id,
       |  CAST(COALESCE(h3.score, 0) AS BIGINT) AS hub_ppm,
       |  CAST(COALESCE(a3.score, 0) AS BIGINT) AS auth_ppm
       |FROM nodes n
       |LEFT JOIN h3 ON h3.v = n.v
       |LEFT JOIN a3 ON a3.v = n.v
       |ORDER BY n.v""".stripMargin,
    "HITS hub/authority over the directed response graph: 3 unrolled " +
      "rounds, exact integer ppm rescale — zero-tolerance value oracle") {
    (s, d) =>
      val ev = Tables.events(s, d).select("user_id", "ts_ns", "event_id")
      val de = graft.ops.GlobalLag.withLag(
          ev, Seq("ts_ns", "event_id"), "user_id", "prev")
        .filter(col("prev").isNotNull && col("prev") =!= col("user_id"))
        .select(col("prev").as("s"), col("user_id").as("t"))
        .distinct()
      graft.ops.Graph.hits(de, iters = 3)
        .select(col("v").as("user_id"), col("hub_ppm"), col("auth_ppm"))
        .orderBy("user_id")
  }

  /** Benford first-digit audit — the fraud/data-quality screen over the
    * value column: the observed first-digit distribution of positive cent
    * amounts vs the Benford expectation, per digit in exact floor-ppm.
    * The nine Benford constants ⌊10⁶·log₁₀(1+1/d)⌋ are public math
    * literals pinned identically on both engines (no runtime float log);
    * the corpus collapses to a 9-row digit histogram in one map-side-
    * combinable agg, so the only broadcast is the 1-row total. The 10⁶
    * product carries the DECIMAL(38)/HUGEINT guard (n ≈ corpus rows at
    * 100 TB; 10⁶·n brushes the BIGINT edge).
    */
  val q250_benford: QueryDef = QueryDef(
    "q250_benford",
    (s, d) => {
      val digits = Tables.events(s, d)
        .select(expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)")
          .as("c"))
        .filter(col("c") > 0)
        .select(expr("CAST(substring(CAST(c AS STRING), 1, 1) AS BIGINT)")
          .as("digit"))
      val counts = digits.groupBy("digit").agg(count(lit(1)).as("n"))
      val tot = counts.agg(sum("n").cast(LongType).as("total"))
      val benford = s.range(1).select(expr(
        "stack(9, 1L, 301029L, 2L, 176091L, 3L, 124938L, 4L, 96910L, " +
          "5L, 79181L, 6L, 66946L, 7L, 57991L, 8L, 51152L, 9L, 45757L) " +
          "AS (digit, benford_ppm)"))
      benford.join(counts, Seq("digit"), "left")
        .withColumn("n", coalesce(col("n"), lit(0L)))
        .crossJoin(broadcast(tot))
        .select(col("digit"), col("n").cast(LongType).as("n"),
          expr("CAST((CAST(1000000 AS DECIMAL(38,0)) * n) div total AS BIGINT)")
            .as("share_ppm"),
          col("benford_ppm").cast(LongType).as("benford_ppm"))
        .withColumn("dev_ppm", abs(col("share_ppm") - col("benford_ppm")))
        .orderBy("digit")
    },
    Some("""WITH c AS (
      |  SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
      |  FROM events),
      |dg AS (
      |  SELECT CAST(substring(CAST(c AS STRING), 1, 1) AS BIGINT) AS digit
      |  FROM c WHERE c > 0),
      |cnt AS (SELECT digit, COUNT(*) AS n FROM dg GROUP BY 1),
      |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM cnt),
      |b AS (SELECT * FROM (VALUES (1, 301029), (2, 176091), (3, 124938),
      |  (4, 96910), (5, 79181), (6, 66946), (7, 57991), (8, 51152),
      |  (9, 45757)) v(digit, benford_ppm))
      |SELECT CAST(b.digit AS BIGINT) AS digit,
      |  CAST(COALESCE(cnt.n, 0) AS BIGINT) AS n,
      |  CAST(CAST(floor((CAST(1000000 AS DECIMAL(38,0)) * COALESCE(cnt.n, 0)) / total) AS BIGINT)
      |    AS BIGINT) AS share_ppm,
      |  CAST(b.benford_ppm AS BIGINT) AS benford_ppm,
      |  CAST(abs(CAST(floor((CAST(1000000 AS DECIMAL(38,0)) * COALESCE(cnt.n, 0)) / total) AS BIGINT)
      |    - b.benford_ppm) AS BIGINT) AS dev_ppm
      |FROM b LEFT JOIN cnt ON cnt.digit = b.digit, tot
      |ORDER BY digit""".stripMargin),
    "Benford first-digit audit of positive cent amounts: 9-row digit " +
      "histogram vs the literal Benford ppm table, exact floor-ppm shares")

  /** Gini coefficient of per-user total spend — the inequality measure
    * next to HHI (q191): G = (2·Σᵢ i·xᵢ − (n+1)·Σx) / (n·Σx) over the
    * ASCENDING-sorted user totals, reported in exact floor-ppm. The 100 TB
    * shape never sorts users: totals collapse to the spend-VALUE-DOMAIN
    * histogram (distinct cent totals), the global cumulative count runs
    * through [[graft.ops.GlobalPrefixSum]] (range-partitioned prefix sum —
    * no single-partition data window), and a run of cnt equal values with
    * cum-before c contributes exactly t·cnt·(2c+cnt+1) to 2·Σ i·xᵢ — ties
    * resolved in closed form, no per-row rank. All products DECIMAL(38)/
    * HUGEINT (rank-weighted sums reach n²·x ≈ 10²⁵ at scale); the Gini
    * numerator is ≥ 0 by rearrangement, so plain floor div is portable.
    */
  val q251_gini: QueryDef = QueryDef(
    "q251_gini",
    (s, d) => {
      val ut = Tables.events(s, d)
        .select(col("user_id"),
          expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("c"))
        .groupBy("user_id").agg(sum("c").cast(LongType).as("t"))
      val gv = ut.groupBy("t").agg(count(lit(1)).as("cnt"))
      graft.ops.GlobalPrefixSum.withRunningSum(gv, Seq("t"), "cnt", "cum")
        .withColumn("cb", col("cum") - col("cnt"))
        .agg(sum("cnt").cast(LongType).as("n"),
          sum(expr("CAST(t AS DECIMAL(38,0)) * cnt")).as("sw"),
          sum(expr("CAST(t AS DECIMAL(38,0)) * cnt * (2 * cb + cnt + 1)"))
            .as("rw2"))
        .select(col("n").as("n_users"),
          col("sw").cast(LongType).as("total_cents"),
          expr("CAST((CAST(1000000 AS DECIMAL(38,0)) * (rw2 - (n + 1) * sw)) " +
            "div (CAST(n AS DECIMAL(38,0)) * sw) AS BIGINT)").as("gini_ppm"))
    },
    Some("""WITH ut AS (
      |  SELECT user_id,
      |    CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
      |      AS BIGINT) AS t
      |  FROM events GROUP BY 1),
      |gv AS (SELECT t, COUNT(*) AS cnt FROM ut GROUP BY 1),
      |cum AS (
      |  SELECT t, cnt, SUM(cnt) OVER (ORDER BY t) - cnt AS cb FROM gv),
      |agg AS (
      |  SELECT CAST(SUM(cnt) AS BIGINT) AS n,
      |    SUM(CAST(t AS DECIMAL(38,0)) * cnt) AS sw,
      |    SUM(CAST(t AS DECIMAL(38,0)) * cnt * (2 * cb + cnt + 1)) AS rw2
      |  FROM cum)
      |SELECT n AS n_users, CAST(sw AS BIGINT) AS total_cents,
      |  CAST(CAST(floor((CAST(1000000 AS DECIMAL(38,0)) * (rw2 - (n + 1) * sw))
      |    / (CAST(n AS DECIMAL(38,0)) * sw)) AS BIGINT) AS BIGINT) AS gini_ppm
      |FROM agg""".stripMargin),
    "Gini coefficient of per-user spend: value-domain histogram + " +
      "GlobalPrefixSum cumulative (no user sort), closed-form tie runs, " +
      "exact floor-ppm")

  /** Newman MODULARITY of the q137 LPA communities — the partition-quality
    * score that tells you whether the communities are real structure:
    * Q = Σ_c [e_c/m − (deg_c/2m)²] over intra-community edge weight e_c,
    * community weighted degree deg_c, and total edge weight m, reported in
    * exact floor-ppm via the shifted non-negative form
    * ⌊10⁶·(4m² + Σ_c(4m·e_c − deg_c²)) / (4m²)⌋ − 10⁶ (Q ≥ −½ keeps the
    * numerator ≥ 0, so truncating div IS floor on both engines). Scale
    * shape: two hash joins tag edge endpoints with labels, e_c/deg_c are
    * map-side-combinable aggs, and the only broadcast is the 1-row m;
    * products are DECIMAL(38)/HUGEINT (m² ≈ 10²⁶ at 100 TB edge mass).
    */
  val q252_modularity: QueryDef = QueryDef(
    "q252_modularity",
    (s, d) => {
      val e = weightedEdges(s, d).select(col("source").as("a"),
        col("target").as("b"), col("weight").as("w"))
      val lbl = graft.ops.Graph.labelPropagation(e, rounds = 4)
      val tagged = e
        .join(lbl.select(col("v").as("a"), col("lbl").as("la")), Seq("a"))
        .join(lbl.select(col("v").as("b"), col("lbl").as("lb")), Seq("b"))
      val intra = tagged.filter(col("la") === col("lb"))
        .groupBy(col("la").as("community")).agg(sum("w").as("ec"))
      val degc = e.select(col("a").as("v"), col("w"))
        .unionAll(e.select(col("b").as("v"), col("w")))
        .groupBy("v").agg(sum("w").as("dg"))
        .join(lbl, Seq("v"))
        .groupBy(col("lbl").as("community")).agg(sum("dg").as("degc"))
      val m = e.agg(sum("w").cast(LongType).as("m"))
      degc.join(intra, Seq("community"), "left")
        .withColumn("ec", coalesce(col("ec"), lit(0L)))
        .crossJoin(broadcast(m))
        .agg(count(lit(1)).cast(LongType).as("n_comm"),
          sum(expr("CAST(4 AS DECIMAL(38,0)) * m * ec - " +
            "CAST(degc AS DECIMAL(38,0)) * degc")).as("num"),
          max("m").as("m_total"))
        .select(col("n_comm"), col("m_total"),
          expr("CAST((CAST(1000000 AS DECIMAL(38,0)) * " +
            "(CAST(4 AS DECIMAL(38,0)) * m_total * m_total + num)) div " +
            "(CAST(4 AS DECIMAL(38,0)) * m_total * m_total) - 1000000 " +
            "AS BIGINT)").as("q_ppm"))
    },
    Some(edgesSql +
      s""",
        |g AS MATERIALIZED (
        |  SELECT a AS s, b AS t, weight AS w FROM we
        |  UNION ALL SELECT b AS s, a AS t, weight AS w FROM we),
        |l0 AS MATERIALIZED (SELECT DISTINCT s AS v, s AS lbl FROM g),
        |${lpaRoundSql(4)},
        |e AS (SELECT a, b, weight AS w FROM we),
        |m AS (SELECT CAST(SUM(w) AS BIGINT) AS m FROM e),
        |intra AS (
        |  SELECT la.lbl AS community, SUM(e.w) AS ec
        |  FROM e JOIN l4 la ON la.v = e.a JOIN l4 lb2 ON lb2.v = e.b
        |  WHERE la.lbl = lb2.lbl GROUP BY 1),
        |degc AS (
        |  SELECT l.lbl AS community, SUM(d.dg) AS degc
        |  FROM (SELECT v, SUM(w) AS dg FROM (
        |          SELECT a AS v, w FROM e
        |          UNION ALL SELECT b AS v, w FROM e) GROUP BY v) d
        |  JOIN l4 l ON l.v = d.v GROUP BY 1),
        |agg AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_comm,
        |    SUM(CAST(4 AS DECIMAL(38,0)) * m.m * COALESCE(i.ec, 0)
        |      - CAST(dc.degc AS DECIMAL(38,0)) * dc.degc) AS num
        |  FROM degc dc LEFT JOIN intra i ON i.community = dc.community, m)
        |SELECT agg.n_comm, m.m AS m_total,
        |  CAST(CAST(floor((CAST(1000000 AS DECIMAL(38,0)) *
        |    (CAST(4 AS DECIMAL(38,0)) * m.m * m.m + agg.num))
        |    / (CAST(4 AS DECIMAL(38,0)) * m.m * m.m)) AS BIGINT) - 1000000 AS BIGINT) AS q_ppm
        |FROM agg, m""".stripMargin),
    "Newman modularity of the LPA communities: shifted non-negative " +
      "floor-ppm rational, label-tagging hash joins, 1-row m broadcast")

  /** Per-type OLS TREND line over the daily volume series — the
    * least-squares twin of q190's Theil–Sen (which resists the outliers
    * OLS folds to; shipping both is the standard analyst pairing):
    * slope = (n·Σxy − Σx·Σy)/(n·Σx² − (Σx)²) and the matching intercept,
    * both in exact floor-ppm with q179's portable-floor CASE (falling
    * series make the numerators negative, where Spark `div` truncates
    * but DuckDB `//` floors). Aggregate-first: the corpus collapses to
    * per-(type, day) counts, then one hash agg of five integer sums per
    * type — no window, no broadcast, nothing driver-side; products are
    * DECIMAL(38)/HUGEINT (n·Σxy ≈ 10²³ at 100 TB daily volumes).
    */
  val q253_ols_trend: QueryDef = q(
    "q253_ols_trend",
    """WITH dc AS (
      |  SELECT event_type, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
      |    COUNT(*) AS y
      |  FROM events GROUP BY 1, 2),
      |s AS (
      |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(day) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
      |    SUM(CAST(day AS DECIMAL(38,0)) * y) AS sxy,
      |    SUM(CAST(day AS DECIMAL(38,0)) * day) AS sxx
      |  FROM dc GROUP BY 1),
      |r AS (
      |  SELECT event_type, n,
      |    CAST(1000000 AS DECIMAL(38,0)) * (CAST(n AS DECIMAL(38,0)) * sxy
      |      - CAST(sx AS DECIMAL(38,0)) * sy) AS snum,
      |    CAST(1000000 AS DECIMAL(38,0)) * (CAST(sy AS DECIMAL(38,0)) * sxx
      |      - CAST(sx AS DECIMAL(38,0)) * sxy) AS inum,
      |    CAST(n AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sx AS den
      |  FROM s WHERE n >= 2)
      |SELECT event_type, n AS n_days,
      |  CAST(CASE WHEN snum >= 0 THEN CAST(floor(snum / den) AS BIGINT)
      |       ELSE -(CAST(floor((-snum + den - 1) / den) AS BIGINT)) END AS BIGINT) AS slope_ppm,
      |  CAST(CASE WHEN inum >= 0 THEN CAST(floor(inum / den) AS BIGINT)
      |       ELSE -(CAST(floor((-inum + den - 1) / den) AS BIGINT)) END AS BIGINT) AS intercept_ppm
      |FROM r ORDER BY event_type""".stripMargin,
    "Per-type OLS trend (slope + intercept) over daily volumes: exact " +
      "floor-ppm rationals, portable floor for falling series, " +
      "aggregate-first with no window") { (s, d) =>
    val dc = Tables.events(s, d)
      .select(col("event_type"), expr("ts_sec div 86400").as("day"))
      .groupBy("event_type", "day").agg(count(lit(1)).as("y"))
    dc.groupBy("event_type")
      .agg(count(lit(1)).cast(LongType).as("n"),
        sum("day").cast(LongType).as("sx"),
        sum("y").cast(LongType).as("sy"),
        sum(expr("CAST(day AS DECIMAL(38,0)) * y")).as("sxy"),
        sum(expr("CAST(day AS DECIMAL(38,0)) * day")).as("sxx"))
      .filter(col("n") >= 2)
      .withColumn("snum", expr("CAST(1000000 AS DECIMAL(38,0)) * " +
        "(CAST(n AS DECIMAL(38,0)) * sxy - CAST(sx AS DECIMAL(38,0)) * sy)"))
      .withColumn("inum", expr("CAST(1000000 AS DECIMAL(38,0)) * " +
        "(CAST(sy AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sxy)"))
      .withColumn("den", expr("CAST(n AS DECIMAL(38,0)) * sxx - " +
        "CAST(sx AS DECIMAL(38,0)) * sx"))
      .select(col("event_type"), col("n").as("n_days"),
        expr("CAST(CASE WHEN snum >= 0 THEN snum div den " +
          "ELSE -((-snum + den - 1) div den) END AS BIGINT)").as("slope_ppm"),
        expr("CAST(CASE WHEN inum >= 0 THEN inum div den " +
          "ELSE -((-inum + den - 1) div den) END AS BIGINT)")
          .as("intercept_ppm"))
      .orderBy("event_type")
  }

  /** IVM tier 6 — per-group discrete MEDIAN under retraction
    * ([[graft.ops.Incremental.mergeMedian]]): the holistic-aggregate
    * tier. No scalar ⊕⊖ rule exists for a median, but the per-group
    * VALUE-HISTOGRAM support table is an abelian group under count
    * deltas and the median is a pure function of it — so untouched
    * groups pass their stored median through (anti-join, zero work) and
    * only CDC-touched groups re-derive from the merged histogram (a
    * per-group cumulative over DISTINCT values, value-domain-sized).
    * Same CDC shape as q242: day-25 inserts, event_id % 7 deletes,
    * proven ≡ a from-scratch median over the post-churn state.
    */
  val q254_incremental_median: QueryDef = QueryDef(
    "q254_incremental_median",
    (s, d) => {
      val ev = Tables.events(s, d).select(col("user_id"), col("event_type"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)")
          .as("v_cents"),
        col("event_id"), col("ts_sec"))
      val day25 = lit(1706140800L)
      val day26 = lit(1706227200L)
      val base = ev.filter(col("ts_sec") < day25).drop("ts_sec")
      val ins = ev.filter(col("ts_sec") >= day25 && col("ts_sec") < day26)
        .drop("ts_sec")
      val del = base.filter(col("event_id") % 7 === 0)
      graft.ops.Incremental.mergeMedian(
          base.drop("event_id"), ins.drop("event_id"), del.drop("event_id"),
          Seq("user_id", "event_type"), "v_cents")
        .select(col("user_id"), col("event_type"),
          col("n").cast(LongType).as("n"),
          col("median").cast(LongType).as("median_cents"))
        .orderBy("user_id", "event_type")
    },
    Some("""WITH fin AS (
      |  SELECT user_id, event_type,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v_cents
      |  FROM events
      |  WHERE (CAST(floor(epoch(ts)) AS BIGINT) < 1706140800
      |         AND event_id % 7 <> 0)
      |     OR (CAST(floor(epoch(ts)) AS BIGINT) >= 1706140800
      |         AND CAST(floor(epoch(ts)) AS BIGINT) < 1706227200)),
      |agg AS (
      |  SELECT user_id, event_type, v_cents, COUNT(*) AS c
      |  FROM fin GROUP BY 1, 2, 3),
      |tot AS (
      |  SELECT user_id, event_type, CAST(SUM(c) AS BIGINT) AS n
      |  FROM agg GROUP BY 1, 2),
      |cum AS (
      |  SELECT a.user_id, a.event_type, a.v_cents, t.n,
      |    SUM(a.c) OVER (PARTITION BY a.user_id, a.event_type
      |                   ORDER BY a.v_cents) AS cm
      |  FROM agg a JOIN tot t
      |    ON t.user_id = a.user_id AND t.event_type = a.event_type)
      |SELECT user_id, event_type, n,
      |  CAST(MIN(v_cents) AS BIGINT) AS median_cents
      |FROM cum WHERE cm >= CAST(floor((n + 1) / 2) AS BIGINT)
      |GROUP BY 1, 2, 3
      |ORDER BY user_id, event_type""".stripMargin),
    "Incremental view maintenance tier 6: per-group discrete median " +
      "under retraction — histogram support-table deltas, untouched " +
      "groups pass through, touched groups re-derive from the merged " +
      "value-domain histogram; proven equal to full recompute")

  /** SCD Type-2 dimension BUILD from the raw change log — the warehouse
    * op that PRODUCES what q152 consumes: per user, the event_type
    * attribute stream collapses into versioned validity intervals
    * (consecutive equal values compressed — gaps-and-islands via
    * lag + running island sum over the per-user order), each emitting
    * (version, attr, valid_from, valid_to, is_current). All windows
    * partition by user_id (bounded partitions, never the corpus);
    * valid_to = next version's valid_from (half-open intervals, the
    * join convention q152's point-in-time lookups expect), NULL on the
    * open current version.
    */
  val q255_scd2_build: QueryDef = q(
    "q255_scd2_build",
    """WITH seq AS (
      |  SELECT user_id, event_type,
      |    CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec, ts, event_id,
      |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      AS prev
      |  FROM events),
      |isl AS (
      |  SELECT user_id, event_type, ts_sec,
      |    SUM(CASE WHEN prev IS NULL OR prev <> event_type THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY user_id ORDER BY ts, event_id) AS island
      |  FROM seq),
      |dim AS (
      |  SELECT user_id, island, MIN(event_type) AS attr,
      |    CAST(MIN(ts_sec) AS BIGINT) AS valid_from_sec,
      |    CAST(COUNT(*) AS BIGINT) AS n_events
      |  FROM isl GROUP BY 1, 2)
      |SELECT user_id, CAST(island AS BIGINT) AS version, attr,
      |  valid_from_sec,
      |  lead(valid_from_sec) OVER (PARTITION BY user_id ORDER BY island)
      |    AS valid_to_sec,
      |  CAST(CASE WHEN lead(valid_from_sec)
      |      OVER (PARTITION BY user_id ORDER BY island) IS NULL
      |    THEN 1 ELSE 0 END AS BIGINT) AS is_current,
      |  n_events
      |FROM dim ORDER BY user_id, version""".stripMargin,
    "SCD Type-2 dimension build from the change log: gaps-and-islands " +
      "change compression per user, half-open validity intervals, " +
      "is_current flag — all windows user-partitioned") { (s, d) =>
    val wRun = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val isl = Tables.events(s, d)
      .withColumn("prev", lag("event_type", 1).over(wUser))
      .withColumn("island",
        sum(when(col("prev").isNull || col("prev") =!= col("event_type"), 1L)
          .otherwise(0L)).over(wRun))
    val dim = isl.groupBy("user_id", "island")
      .agg(min("event_type").as("attr"),
        min("ts_sec").cast(LongType).as("valid_from_sec"),
        count(lit(1)).cast(LongType).as("n_events"))
    val wv = Window.partitionBy("user_id").orderBy("island")
    dim.withColumn("valid_to_sec", lead("valid_from_sec", 1).over(wv))
      .select(col("user_id"), col("island").cast(LongType).as("version"),
        col("attr"), col("valid_from_sec"), col("valid_to_sec"),
        when(col("valid_to_sec").isNull, 1L).otherwise(0L).as("is_current"),
        col("n_events"))
      .orderBy("user_id", "version")
  }

  /** CROSS-correlation between event types' daily volume series at lags
    * 0..3 — q211's sqrt-free exact-rational Pearson machinery lifted from
    * one series against itself to ordered TYPE PAIRS (does signup volume
    * lead purchase volume?): per (type_a < type_b, lag), sign +
    * r² in exact floor-ppm over the days where both series have volume.
    * Aggregate-first (the corpus collapses to the per-(type, day) frame
    * before any pairing); the pair join is day-aligned on the tiny daily
    * aggregate; products are DECIMAL(38)/HUGEINT like q211.
    */
  val q256_cross_correlation: QueryDef = q(
    "q256_cross_correlation",
    """WITH daily AS (
      |  SELECT event_type,
      |    CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
      |    CAST(count(*) AS BIGINT) AS x
      |  FROM events GROUP BY 1, 2),
      |pr AS (
      |  SELECT a.event_type AS type_a, b.event_type AS type_b, l.lag,
      |    a.x AS x, b.x AS y
      |  FROM daily a
      |  CROSS JOIN (SELECT lag FROM range(0, 4) AS t(lag)) l
      |  JOIN daily b ON b.event_type > a.event_type
      |    AND b.day = a.day + l.lag),
      |sums AS (
      |  SELECT type_a, type_b, lag, CAST(count(*) AS DECIMAL(38,0)) AS m,
      |    CAST(sum(x) AS DECIMAL(38,0)) AS sx, CAST(sum(y) AS DECIMAL(38,0)) AS sy,
      |    CAST(sum(CAST(x AS DECIMAL(38,0)) * x) AS DECIMAL(38,0)) AS sxx,
      |    CAST(sum(CAST(y AS DECIMAL(38,0)) * y) AS DECIMAL(38,0)) AS syy,
      |    CAST(sum(CAST(x AS DECIMAL(38,0)) * y) AS DECIMAL(38,0)) AS sxy
      |  FROM pr GROUP BY 1, 2, 3)
      |, nd AS (
      |  SELECT type_a, type_b, lag, m, sx, sy, sxy,
      |    CAST(1000000 AS DECIMAL(38,0))
      |      * (m * sxy - sx * sy) * (m * sxy - sx * sy) AS num,
      |    (m * sxx - sx * sx) * (m * syy - sy * sy) AS den
      |  FROM sums)
      |SELECT type_a, type_b, CAST(lag AS BIGINT) AS lag,
      |  CAST(m AS BIGINT) AS n_pairs,
      |  CAST(CASE WHEN m * sxy - sx * sy >= 0 THEN 1 ELSE -1 END AS BIGINT)
      |    AS sign,
      |  CAST(CASE WHEN den = 0 THEN 0
      |    ELSE CAST(round(CAST(num - (num % den) AS DOUBLE)
      |      / CAST(den AS DOUBLE)) AS BIGINT) END AS BIGINT)
      |    AS r2_ppm
      |FROM nd ORDER BY type_a, type_b, lag""".stripMargin,
    "Cross-correlation of daily volumes between type pairs at lags 0..3: " +
      "sign + exact rational r^2 ppm — q211's sqrt-free Pearson across " +
      "series") { (s, d) =>
    val daily = Tables.events(s, d)
      .groupBy(col("event_type"), expr("ts_sec div 86400").as("day"))
      .agg(count(lit(1)).as("x"))
    val a = daily.withColumn("lag", explode(expr("sequence(0, 3)")))
      .select(col("event_type").as("type_a"), col("day"), col("lag"),
        col("x"))
    val b = daily.select(col("event_type").as("type_b"),
      col("day").as("bday"), col("x").as("y"))
    val dec = DecimalType(38, 0)
    a.join(b, col("type_b") > col("type_a") &&
        col("bday") === col("day") + col("lag"))
      .groupBy("type_a", "type_b", "lag")
      .agg(count(lit(1)).cast(dec).as("m"),
        sum("x").cast(dec).as("sx"), sum("y").cast(dec).as("sy"),
        sum(col("x").cast(dec) * col("x")).as("sxx"),
        sum(col("y").cast(dec) * col("y")).as("syy"),
        sum(col("x").cast(dec) * col("y")).as("sxy"))
      .selectExpr("type_a", "type_b", "CAST(lag AS BIGINT) AS lag",
        "CAST(m AS BIGINT) AS n_pairs",
        "CAST(CASE WHEN m * sxy - sx * sy >= 0 THEN 1 ELSE -1 END AS BIGINT) AS sign",
        """CAST(CASE WHEN (m * sxx - sx * sx) * (m * syy - sy * sy) = 0 THEN 0
           ELSE (CAST(1000000 AS DECIMAL(38,0))
               * (m * sxy - sx * sy) * (m * sxy - sx * sy))
             div ((m * sxx - sx * sx) * (m * syy - sy * sy)) END AS BIGINT)
           AS r2_ppm""")
      .orderBy("type_a", "type_b", "lag")
  }

  /** Purged K-fold temporal split — the time-series cross-validation
    * shape (Lopez de Prado's purged CV): 5 contiguous day-range folds,
    * each fold's validation days EMBARGOED by ±2 days from its own
    * training set so leakage through temporal autocorrelation cannot
    * cross the boundary. Aggregate-first: the corpus collapses to the
    * per-day count frame before any fold arithmetic, so the fold
    * classification is O(days × folds) no matter the row count; the two
    * crossJoins broadcast a 1-row day-range and a 5-row fold-bounds
    * frame. All integer day arithmetic (days ≥ 0 so div = floor on both
    * engines).
    */
  val q259_purged_folds: QueryDef = q(
    "q259_purged_folds",
    """WITH daily AS (
      |  SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day, COUNT(*) AS n
      |  FROM events GROUP BY 1),
      |b AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM daily),
      |days AS (
      |  SELECT day, n,
      |    LEAST(4, CAST(floor(((day - d0) * 5) / (d1 - d0 + 1)) AS BIGINT)) AS fold
      |  FROM daily CROSS JOIN b),
      |fb AS (SELECT fold AS f, MIN(day) AS f0, MAX(day) AS f1
      |       FROM days GROUP BY 1),
      |m AS (
      |  SELECT d.day, d.n, fb.f,
      |    CASE WHEN d.fold = fb.f THEN 'val'
      |         WHEN d.day >= fb.f0 - 2 AND d.day <= fb.f1 + 2 THEN 'purged'
      |         ELSE 'train' END AS cls
      |  FROM days d CROSS JOIN fb)
      |SELECT CAST(f AS BIGINT) AS fold,
      |  CAST(SUM(CASE WHEN cls = 'val' THEN n ELSE 0 END) AS BIGINT) AS n_val,
      |  CAST(SUM(CASE WHEN cls = 'train' THEN n ELSE 0 END) AS BIGINT) AS n_train,
      |  CAST(SUM(CASE WHEN cls = 'purged' THEN n ELSE 0 END) AS BIGINT) AS n_purged
      |FROM m GROUP BY 1 ORDER BY fold""".stripMargin,
    "Purged 5-fold temporal split with a ±2-day embargo: per fold, " +
      "validation / training / purged event counts — leakage-safe " +
      "time-series CV, aggregate-first") { (s, d) =>
    val daily = Tables.events(s, d)
      .groupBy(expr("ts_sec div 86400").as("day"))
      .agg(count(lit(1)).as("n"))
    val bounds = daily.agg(min("day").as("d0"), max("day").as("d1"))
    val days = daily.crossJoin(broadcast(bounds))
      .withColumn("fold",
        least(lit(4L), expr("((day - d0) * 5) div (d1 - d0 + 1)")))
      .select("day", "n", "fold")
    val fb = days.groupBy(col("fold").as("f"))
      .agg(min("day").as("f0"), max("day").as("f1"))
    days.crossJoin(broadcast(fb))
      .withColumn("cls",
        when(col("fold") === col("f"), lit("val"))
          .when(col("day") >= col("f0") - 2 && col("day") <= col("f1") + 2,
            lit("purged"))
          .otherwise(lit("train")))
      .groupBy(col("f").cast(LongType).as("fold"))
      .agg(
        sum(when(col("cls") === "val", col("n")).otherwise(lit(0L)))
          .cast(LongType).as("n_val"),
        sum(when(col("cls") === "train", col("n")).otherwise(lit(0L)))
          .cast(LongType).as("n_train"),
        sum(when(col("cls") === "purged", col("n")).otherwise(lit(0L)))
          .cast(LongType).as("n_purged"))
      .orderBy("fold")
  }

  /** Session bounce rate per day — the engagement-quality metric on top
    * of the q20 sessionization kernel: share of sessions that contain
    * exactly one event, attributed to the day the session STARTED.
    * Both windows are user-partitioned (no global window); the session
    * rollup is a hash aggregate on (user, sid); the day rollup is tiny.
    * Exact floor-ppm rate (non-negative operands, div = floor).
    */
  val q260_bounce_rate: QueryDef = q(
    "q260_bounce_rate",
    """WITH g AS (
      |  SELECT user_id, ts, event_id,
      |    CAST(floor(epoch(ts)) AS BIGINT) AS sec,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR CAST(floor(epoch(ts)) AS BIGINT)
      |              - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) > 1800
      |         THEN 1 ELSE 0 END AS is_new
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |s AS (
      |  SELECT user_id, sec,
      |    CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      AS BIGINT) AS sid
      |  FROM g),
      |sess AS (
      |  SELECT user_id, sid, CAST(floor(MIN(sec) / 86400) AS BIGINT) AS day, COUNT(*) AS n_ev
      |  FROM s GROUP BY 1, 2),
      |r AS (
      |  SELECT day, COUNT(*) AS n_sessions,
      |    CAST(SUM(CASE WHEN n_ev = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounce
      |  FROM sess GROUP BY 1)
      |SELECT CAST(day AS BIGINT) AS day, n_sessions, n_bounce,
      |  CAST(floor((1000000 * n_bounce) / n_sessions) AS BIGINT) AS bounce_ppm
      |FROM r ORDER BY day""".stripMargin,
    "Per-day session bounce rate (1-event sessions / sessions started " +
      "that day) in exact floor-ppm, over the 30-min-gap sessionization") {
    (s, d) =>
      val prevSec = lag("ts_sec", 1).over(wUser)
      Tables.events(s, d)
        .withColumn("is_new",
          when(prevSec.isNull || col("ts_sec") - prevSec > 1800, lit(1L))
            .otherwise(lit(0L)))
        .withColumn("sid", sum("is_new").over(wUser))
        .groupBy("user_id", "sid")
        .agg(min("ts_sec").as("start_sec"), count(lit(1)).as("n_ev"))
        .groupBy(expr("start_sec div 86400").as("day"))
        .agg(count(lit(1)).as("n_sessions"),
          sum(when(col("n_ev") === 1, lit(1L)).otherwise(lit(0L)))
            .cast(LongType).as("n_bounce"))
        .withColumn("bounce_ppm", expr("(1000000 * n_bounce) div n_sessions"))
        .orderBy("day")
  }

  /** Interpolated quartiles (PERCENTILE_CONT) per event type, EXACT: the
    * linear interpolation at position (n-1)·k/4 is carried in quarter-
    * cents — value·4 = v_lo·(4-rem) + v_hi·rem with rem = (n-1)·k mod 4 —
    * so no float division ever happens and both engines agree bit-for-
    * bit. Order statistics come from the value-domain histogram (q204's
    * machinery): per-type cumulative counts over DISTINCT cent values,
    * then the 6 needed ranks (3 quartiles × lo/hi) join in by range —
    * a broadcast of a 6-rows-per-type frame against the bounded
    * histogram, never a sort of the raw rows.
    */
  val q261_quartiles_cont: QueryDef = q(
    "q261_quartiles_cont",
    """WITH vals AS (
      |  SELECT event_type, CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
      |  FROM events),
      |hist AS (SELECT event_type, v, COUNT(*) AS cnt FROM vals GROUP BY 1, 2),
      |cum AS (
      |  SELECT event_type, v, cnt,
      |    CAST(SUM(cnt) OVER (PARTITION BY event_type ORDER BY v) AS BIGINT) AS cum
      |  FROM hist),
      |c2 AS (SELECT event_type, v, cum - cnt AS lo_rank, cum FROM cum),
      |n AS (SELECT event_type, COUNT(*) AS n FROM vals GROUP BY 1),
      |ranks AS (
      |  SELECT event_type, k, CAST(floor(((n - 1) * k) / 4) AS BIGINT) AS lo,
      |    (n - 1) * k - (CAST(floor(((n - 1) * k) / 4) AS BIGINT)) * 4 AS rem
      |  FROM n CROSS JOIN (SELECT k FROM range(1, 4) AS t(k))),
      |rr AS (
      |  SELECT event_type, k, lo AS r, 4 - rem AS w FROM ranks
      |  UNION ALL
      |  SELECT event_type, k, lo + 1 AS r, rem AS w FROM ranks WHERE rem > 0)
      |SELECT rr.event_type, CAST(rr.k AS BIGINT) AS quartile,
      |  CAST(SUM(rr.w * c2.v) AS BIGINT) AS q_quarter_cents
      |FROM rr JOIN c2 ON c2.event_type = rr.event_type
      |  AND rr.r >= c2.lo_rank AND rr.r < c2.cum
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "PERCENTILE_CONT quartiles per event type in exact quarter-cents — " +
      "interpolated order statistics off the value-domain histogram, no " +
      "row sort, no float") { (s, d) =>
    val vals = Tables.events(s, d).select(col("event_type"),
      expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("v"))
    val hist = vals.groupBy("event_type", "v").agg(count(lit(1)).as("cnt"))
    val cum = hist
      .withColumn("cum",
        sum("cnt").over(Window.partitionBy("event_type").orderBy("v")))
      .withColumn("lo_rank", col("cum") - col("cnt"))
      .select(col("event_type").as("h_type"), col("v"), col("lo_rank"),
        col("cum"))
    val ranks = vals.groupBy("event_type").agg(count(lit(1)).as("n"))
      .withColumn("k", explode(expr("sequence(1, 3)")))
      .withColumn("lo", expr("((n - 1) * k) div 4"))
      .withColumn("rem", expr("(n - 1) * k - (((n - 1) * k) div 4) * 4"))
    val rr = ranks
      .select(col("event_type"), col("k"), col("lo").as("r"),
        (lit(4L) - col("rem")).as("w"))
      .unionAll(ranks.filter(col("rem") > 0)
        .select(col("event_type"), col("k"), (col("lo") + 1).as("r"),
          col("rem").as("w")))
    broadcast(rr).join(cum,
        col("event_type") === col("h_type") &&
          col("r") >= col("lo_rank") && col("r") < col("cum"))
      .groupBy(col("event_type"), col("k").cast(LongType).as("quartile"))
      .agg(sum(col("w") * col("v")).cast(LongType).as("q_quarter_cents"))
      .orderBy("event_type", "quartile")
  }

  /** Bipartite user–type co-occurrence projection — the "users who do A
    * also do B" affinity table: distinct (user, type) incidence, then the
    * per-user self-join (fan-out bounded by |types| per user, never by
    * event count), co-occurrence counts + exact floor-ppm Jaccard against
    * the per-type user counts. The |types|²-bounded output is the
    * item-item co-occurrence shape recommendation pipelines build at any
    * corpus size; the incidence distinct is the only corpus-sized
    * aggregate.
    */
  val q262_bipartite_projection: QueryDef = q(
    "q262_bipartite_projection",
    """WITH u AS (SELECT DISTINCT user_id, event_type FROM events),
      |nt AS (SELECT event_type, COUNT(*) AS n FROM u GROUP BY 1),
      |pr AS (
      |  SELECT a.event_type AS type_a, b.event_type AS type_b,
      |    COUNT(*) AS co_users
      |  FROM u a JOIN u b ON b.user_id = a.user_id
      |    AND b.event_type > a.event_type
      |  GROUP BY 1, 2)
      |SELECT type_a, type_b, co_users,
      |  CAST(floor((1000000 * co_users) / (na.n + nb.n - co_users)) AS BIGINT) AS jaccard_ppm
      |FROM pr
      |JOIN nt na ON na.event_type = type_a
      |JOIN nt nb ON nb.event_type = type_b
      |ORDER BY type_a, type_b""".stripMargin,
    "Bipartite projection: per type pair, distinct users active in both " +
      "+ exact floor-ppm Jaccard — item-item co-occurrence, per-user " +
      "bounded fan-out") { (s, d) =>
    val u = Tables.events(s, d).select("user_id", "event_type").distinct()
    val nt = u.groupBy("event_type").agg(count(lit(1)).as("n"))
    u.as("a")
      .join(u.as("b"),
        col("b.user_id") === col("a.user_id") &&
          col("b.event_type") > col("a.event_type"))
      .groupBy(col("a.event_type").as("type_a"),
        col("b.event_type").as("type_b"))
      .agg(count(lit(1)).as("co_users"))
      .join(broadcast(nt.select(col("event_type").as("type_a"),
        col("n").as("na"))), Seq("type_a"))
      .join(broadcast(nt.select(col("event_type").as("type_b"),
        col("n").as("nb"))), Seq("type_b"))
      .select(col("type_a"), col("type_b"), col("co_users"),
        expr("(1000000 * co_users) div (na + nb - co_users)")
          .as("jaccard_ppm"))
      .orderBy("type_a", "type_b")
  }

  /** Daily OHLC bars per event type — the time-bucketed
    * open/high/low/close rollup every market/telemetry pipeline ships:
    * open/close ride the partial-aggregable struct-extremum
    * (min/max of (ts_ns, event_id, v) — map-side combinable, no window
    * over the raw rows), high/low/volume are plain aggregates, all in
    * exact cents. The oracle derives open/close through first_value
    * windows instead — two independent formulations agreeing bit-for-bit.
    */
  val q263_ohlc_bars: QueryDef = q(
    "q263_ohlc_bars",
    """WITH e AS (
      |  SELECT event_type, ts, event_id,
      |    CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
      |  FROM events),
      |w AS (
      |  SELECT event_type, day, v,
      |    first_value(v) OVER (PARTITION BY event_type, day
      |      ORDER BY ts, event_id) AS o,
      |    first_value(v) OVER (PARTITION BY event_type, day
      |      ORDER BY ts DESC, event_id DESC) AS c
      |  FROM e)
      |SELECT event_type, CAST(day AS BIGINT) AS day,
      |  MAX(o) AS open_cents, MAX(v) AS high_cents, MIN(v) AS low_cents,
      |  MAX(c) AS close_cents, COUNT(*) AS n_events,
      |  CAST(SUM(v) AS BIGINT) AS volume_cents
      |FROM w GROUP BY 1, 2 ORDER BY event_type, day""".stripMargin,
    "Daily OHLC bars per type in exact cents: open/close via " +
      "struct-extremum aggregates (map-side combinable), high/low/volume " +
      "plain aggregates") { (s, d) =>
    Tables.events(s, d)
      .select(col("event_type"), expr("ts_sec div 86400").as("day"),
        col("ts_ns"), col("event_id"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("v"))
      .groupBy("event_type", "day")
      .agg(
        min(struct(col("ts_ns"), col("event_id"), col("v"))).as("first"),
        max(col("v")).as("high_cents"), min(col("v")).as("low_cents"),
        max(struct(col("ts_ns"), col("event_id"), col("v"))).as("last"),
        count(lit(1)).as("n_events"),
        sum("v").cast(LongType).as("volume_cents"))
      .select(col("event_type"), col("day"),
        col("first.v").as("open_cents"), col("high_cents"),
        col("low_cents"), col("last.v").as("close_cents"),
        col("n_events"), col("volume_cents"))
      .orderBy("event_type", "day")
  }

  /** Seeded Poisson-ish bootstrap CI for the per-type mean — resampling
    * uncertainty WITHOUT resampling: 16 bootstrap replicas get exact
    * integer weights w ~ Binomial(4, 1/4) (mean 1) derived from one md5
    * per event (byte b of the digest drives replica b), so the whole
    * bootstrap is ONE corpus pass computing 32 map-side-combinable sums —
    * no 16× row explosion, no RNG state, replayable bit-for-bit by the
    * oracle. Replica means in exact floor-cents; the CI is the 2nd/15th
    * order statistic of the 16 means (87.5% interval), picked by a
    * 16-row-per-type window.
    */
  val q264_bootstrap_ci: QueryDef = {
    // replica weight from digest byte x: count of zero 2-bit pairs
    def wOf(x: String) =
      s"(CASE WHEN ($x) % 4 = 0 THEN 1 ELSE 0 END + " +
        s"CASE WHEN (($x) div 4) % 4 = 0 THEN 1 ELSE 0 END + " +
        s"CASE WHEN (($x) div 16) % 4 = 0 THEN 1 ELSE 0 END + " +
        s"CASE WHEN (($x) div 64) % 4 = 0 THEN 1 ELSE 0 END)"
    val sqlW = (0 until 16).map { b =>
      // byte value is non-negative, so the zero-2-bit-pair tests reduce
      // to exact modulo arithmetic — engine-portable, no `//`/`div`
      val x = s"CAST(('0x' || substr(h, ${1 + 2 * b}, 2)) AS BIGINT)"
      val w = s"(CASE WHEN ($x) % 4 = 0 THEN 1 ELSE 0 END + " +
        s"CASE WHEN ($x) % 16 < 4 THEN 1 ELSE 0 END + " +
        s"CASE WHEN ($x) % 64 < 16 THEN 1 ELSE 0 END + " +
        s"CASE WHEN ($x) < 64 THEN 1 ELSE 0 END)"
      s"SELECT event_type, $b AS b, $w AS w, v FROM e"
    }.mkString("\nUNION ALL\n")
    q(
      "q264_bootstrap_ci",
      s"""WITH e AS (
        |  SELECT event_type,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v,
        |    md5('bs1:' || CAST(event_id AS STRING)) AS h
        |  FROM events),
        |reps AS (
        |$sqlW),
        |bm AS (
        |  SELECT event_type, b,
        |    CASE WHEN SUM(w) = 0 THEN 0
        |         ELSE CAST(floor(CAST(SUM(w * v) AS BIGINT) / CAST(SUM(w) AS BIGINT)) AS BIGINT)
        |    END AS mean_b
        |  FROM reps GROUP BY 1, 2),
        |rk AS (
        |  SELECT event_type, mean_b,
        |    row_number() OVER (PARTITION BY event_type ORDER BY mean_b, b)
        |      AS rn
        |  FROM bm),
        |pt AS (
        |  SELECT event_type, CAST(floor(CAST(SUM(v) AS BIGINT) / COUNT(*)) AS BIGINT) AS mean_cents
        |  FROM e GROUP BY 1)
        |SELECT pt.event_type, pt.mean_cents,
        |  MAX(CASE WHEN rn = 2 THEN mean_b END) AS ci_lo_cents,
        |  MAX(CASE WHEN rn = 15 THEN mean_b END) AS ci_hi_cents
        |FROM pt JOIN rk ON rk.event_type = pt.event_type
        |GROUP BY 1, 2 ORDER BY pt.event_type""".stripMargin,
      "Seeded one-pass bootstrap CI of the per-type mean: 16 replicas " +
        "weighted Binomial(4,1/4) off one md5 per event, 32 combinable " +
        "sums, CI = 2nd/15th replica-mean order stats (exact cents)") {
      (s, d) =>
        val e = Tables.events(s, d).select(col("event_type"),
          expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)")
            .as("v"),
          md5(concat(lit("bs1:"), col("event_id").cast(StringType)))
            .as("h"))
        val aggs = (0 until 16).flatMap { b =>
          val x = s"CAST(conv(substring(h, ${1 + 2 * b}, 2), 16, 10) AS BIGINT)"
          val w = wOf(x)
          Seq(expr(s"SUM($w * v)").cast(LongType).as(s"swv$b"),
            expr(s"SUM($w)").cast(LongType).as(s"sw$b"))
        } ++ Seq(sum("v").cast(LongType).as("sv"),
          count(lit(1)).as("cnt"))
        val wide = e.groupBy("event_type").agg(aggs.head, aggs.tail: _*)
        val stackArgs = (0 until 16)
          .map(b => s"CAST($b AS BIGINT), swv$b, sw$b").mkString(", ")
        val bm = wide.selectExpr("event_type", "sv div cnt AS mean_cents",
            s"stack(16, $stackArgs) AS (b, swv, sw)")
          .withColumn("mean_b",
            expr("CASE WHEN sw = 0 THEN 0 ELSE swv div sw END"))
        val rk = bm.withColumn("rn", row_number().over(
          Window.partitionBy("event_type").orderBy("mean_b", "b")))
        rk.groupBy("event_type", "mean_cents")
          .agg(max(when(col("rn") === 2, col("mean_b"))).as("ci_lo_cents"),
            max(when(col("rn") === 15, col("mean_b"))).as("ci_hi_cents"))
          .select("event_type", "mean_cents", "ci_lo_cents", "ci_hi_cents")
          .orderBy("event_type")
    }
  }

  /** RFM segmentation — the classic customer-base cut: per user, Recency
    * (last active day), Frequency (events), Monetary (exact cents), each
    * scored into quintiles; output the segment grid with user counts and
    * mean spend. The quintile thresholds come from the q204 value-domain
    * machinery (histogram + cumulative + 4-row threshold frame per
    * dimension, broadcast), so no user-count-sized sort ever happens —
    * the only corpus-sized step is the per-user aggregate. Scores are
    * exact: score = 1 + #(thresholds strictly below the value), ties
    * share a bucket on both engines.
    */
  val q265_rfm_segments: QueryDef = q(
    "q265_rfm_segments",
    """WITH per_user AS (
      |  SELECT user_id,
      |    MAX(CAST(floor(epoch(ts) / 86400) AS BIGINT)) AS r,
      |    COUNT(*) AS f,
      |    CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
      |      AS BIGINT) AS m
      |  FROM events GROUP BY 1),
      |nu AS (SELECT COUNT(*) AS n FROM per_user),
      |dims AS (
      |  SELECT user_id, 'r' AS dim, r AS val FROM per_user
      |  UNION ALL SELECT user_id, 'f', f FROM per_user
      |  UNION ALL SELECT user_id, 'm', m FROM per_user),
      |hist AS (SELECT dim, val, COUNT(*) AS cnt FROM dims GROUP BY 1, 2),
      |cum AS (
      |  SELECT dim, val,
      |    CAST(SUM(cnt) OVER (PARTITION BY dim ORDER BY val) AS BIGINT)
      |      AS cum
      |  FROM hist),
      |thr AS (
      |  SELECT dim, qq, MIN(val) AS t
      |  FROM cum CROSS JOIN (SELECT qq FROM range(1, 5) AS t(qq)) q
      |  CROSS JOIN nu
      |  WHERE cum * 5 >= qq * nu.n
      |  GROUP BY 1, 2),
      |scored AS (
      |  SELECT d.user_id, d.dim,
      |    1 + SUM(CASE WHEN d.val > th.t THEN 1 ELSE 0 END) AS s
      |  FROM dims d JOIN thr th ON th.dim = d.dim
      |  GROUP BY 1, 2),
      |seg AS (
      |  SELECT p.user_id,
      |    MAX(CASE WHEN sc.dim = 'r' THEN sc.s END) AS r_seg,
      |    MAX(CASE WHEN sc.dim = 'f' THEN sc.s END) AS f_seg,
      |    MAX(CASE WHEN sc.dim = 'm' THEN sc.s END) AS m_seg,
      |    MAX(p.m) AS m
      |  FROM per_user p JOIN scored sc ON sc.user_id = p.user_id
      |  GROUP BY 1)
      |SELECT CAST(r_seg AS BIGINT) AS r_seg, CAST(f_seg AS BIGINT) AS f_seg,
      |  CAST(m_seg AS BIGINT) AS m_seg, COUNT(*) AS n_users,
      |  CAST(floor(CAST(SUM(m) AS BIGINT) / COUNT(*)) AS BIGINT) AS mean_monetary_cents
      |FROM seg GROUP BY 1, 2, 3 ORDER BY r_seg, f_seg, m_seg""".stripMargin,
    "RFM quintile segmentation: per-user recency/frequency/monetary " +
      "scored against value-domain quintile thresholds (no user-sized " +
      "sort), segment grid with counts + mean spend in exact cents") {
    (s, d) =>
      val perUser = Tables.events(s, d)
        .groupBy("user_id")
        .agg(max(expr("ts_sec div 86400")).as("r"),
          count(lit(1)).as("f"),
          sum(expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)"))
            .cast(LongType).as("m"))
      val dims = perUser.selectExpr("user_id", "'r' AS dim", "r AS val")
        .unionAll(perUser.selectExpr("user_id", "'f' AS dim", "f AS val"))
        .unionAll(perUser.selectExpr("user_id", "'m' AS dim", "m AS val"))
      val nu = perUser.agg(count(lit(1)).as("n"))
      val cum = dims.groupBy("dim", "val").agg(count(lit(1)).as("cnt"))
        .withColumn("cum",
          sum("cnt").over(Window.partitionBy("dim").orderBy("val")))
      val thr = cum
        .withColumn("qq", explode(expr("sequence(1, 4)")))
        .crossJoin(broadcast(nu))
        .filter(col("cum") * 5 >= col("qq") * col("n"))
        .groupBy("dim", "qq").agg(min("val").as("t"))
      val scored = dims.join(broadcast(thr), Seq("dim"))
        .groupBy("user_id", "dim")
        .agg((lit(1) + sum(when(col("val") > col("t"), 1L).otherwise(0L)))
          .as("s"))
      val seg = perUser.select("user_id", "m")
        .join(scored, Seq("user_id"))
        .groupBy("user_id")
        .agg(max(when(col("dim") === "r", col("s"))).as("r_seg"),
          max(when(col("dim") === "f", col("s"))).as("f_seg"),
          max(when(col("dim") === "m", col("s"))).as("m_seg"),
          max("m").as("m"))
      seg.groupBy(col("r_seg").cast(LongType).as("r_seg"),
          col("f_seg").cast(LongType).as("f_seg"),
          col("m_seg").cast(LongType).as("m_seg"))
        .agg(count(lit(1)).as("n_users"),
          expr("CAST(SUM(m) AS BIGINT) div COUNT(*)")
            .as("mean_monetary_cents"))
        .orderBy("r_seg", "f_seg", "m_seg")
  }

  /** [[graft.ops.Preference.bradleyTerry]] over per-user type
    * preferences (q311): each user "prefers" the event type they spent
    * more on — every user contributes one duel per type pair they
    * touched (items²-bounded per user, never user×user), the ordered
    * wins matrix aggregates to a types²-sized frame, and THREE exact
    * integer-ppm MM updates rate the types. The oracle replays the
    * derivation and all three updates bit-for-bit with the SAME formula
    * strings (the q279 macro-sharing discipline) through the exact
    * portable floor division round((a − a%b)/b) — one text for both
    * engines, no MATERIALIZED needed (every iteration frame is ≤ 20
    * rows at any corpus size).
    */
  val q311_bradley_terry: QueryDef = {
    import graft.ops.Preference
    val nTypes = 5 // click, error, purchase, signup, view — all SFs
    def level(k: Int): String =
      s"""t$k AS (
         |  SELECT item, CAST(SUM(${Preference.tExpr}) AS BIGINT) AS denom
         |  FROM (SELECT pr.item, pr.g, pi.p AS pi, pj.p AS pj
         |        FROM pairs pr
         |        JOIN p$k pi ON pi.item = pr.item
         |        JOIN p$k pj ON pj.item = pr.rival) z
         |  GROUP BY 1),
         |praw$k AS (
         |  SELECT item, ${Preference.prawExpr} AS praw
         |  FROM (SELECT tt.item, tt.wins, dk.denom, pk.p
         |        FROM totals tt
         |        JOIN t$k dk ON dk.item = tt.item
         |        JOIN p$k pk ON pk.item = tt.item) z),
         |p${k + 1} AS (
         |  SELECT item, ${Preference.renormExpr(nTypes)} AS p
         |  FROM (SELECT item, praw,
         |          (SELECT CAST(SUM(praw) AS BIGINT) FROM praw$k) AS total
         |        FROM praw$k) z)""".stripMargin
    QueryDef(
      "q311_bradley_terry",
      (s, d) => {
        val ut = Tables.events(s, d)
          .groupBy(col("user_id").as("rater"),
            col("event_type").as("item"))
          .agg(sum(expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)"))
            .cast(LongType).as("w"))
        graft.ops.Preference
          .bradleyTerry(graft.ops.Preference.winsMatrix(ut), iters = 3)
          .select(col("item").as("event_type"), col("wins"), col("games"),
            col("rating_ppm"))
      },
      Some(s"""WITH ut AS (
        |  SELECT user_id AS rater, event_type AS item,
        |    CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
        |      AS BIGINT) AS w
        |  FROM events GROUP BY 1, 2),
        |duel AS (
        |  SELECT CASE WHEN a.w >= b.w THEN a.item ELSE b.item END AS item,
        |         CASE WHEN a.w >= b.w THEN b.item ELSE a.item END AS rival
        |  FROM ut a JOIN ut b ON b.rater = a.rater AND a.item < b.item),
        |wm AS (SELECT item, rival, CAST(count(*) AS BIGINT) AS wins
        |       FROM duel GROUP BY 1, 2),
        |g0 AS (
        |  SELECT item, rival, wins FROM wm
        |  UNION ALL
        |  SELECT rival AS item, item AS rival, CAST(0 AS BIGINT) AS wins
        |  FROM wm),
        |games AS (SELECT item, rival, CAST(SUM(wins) AS BIGINT) AS w_ij
        |          FROM g0 GROUP BY 1, 2),
        |pairs AS (
        |  SELECT x.item, x.rival, x.w_ij,
        |    x.w_ij + COALESCE(y.w_ij, 0) AS g
        |  FROM games x LEFT JOIN games y
        |    ON y.item = x.rival AND y.rival = x.item),
        |totals AS (SELECT item, CAST(SUM(w_ij) AS BIGINT) AS wins,
        |             CAST(SUM(g) AS BIGINT) AS games
        |           FROM pairs GROUP BY 1),
        |p0 AS (SELECT item, CAST(1000000 AS BIGINT) AS p FROM totals),
        |${level(0)},
        |${level(1)},
        |${level(2)}
        |SELECT t.item AS event_type, t.wins, t.games, p3.p AS rating_ppm
        |FROM totals t JOIN p3 ON p3.item = t.item
        |ORDER BY rating_ppm DESC, event_type""".stripMargin),
      "Bradley-Terry preference ratings over per-user type duels — " +
        "types^2-bounded wins matrix, 3 exact integer-ppm MM updates, " +
        "macro-shared formula strings replayed by the oracle")
  }

  def defs: Seq[QueryDef] = Seq(
    q311_bradley_terry,
    q250_benford, q251_gini, q252_modularity, q253_ols_trend,
    q254_incremental_median, q255_scd2_build, q256_cross_correlation,
    q259_purged_folds, q260_bounce_rate, q261_quartiles_cont,
    q262_bipartite_projection, q263_ohlc_bars, q264_bootstrap_ci,
    q265_rfm_segments,
    q180_hits_scores, q182_weighted_sssp, q185_rolling_distinct, q186_ab_lift,
    q187_linear_attribution, q188_cusum_changepoint, q272_holt_winters,
    q189_sequence_support, q278_sequence_regex, q279_multivar_ols,
    q281_incremental_components,
    q190_theilsen_trend, q191_hhi_concentration, q192_link_prediction,
    q193_incremental_join_view, q271_incremental_join_agg,
    q205_assortativity, q196_seasonal_decompose,
    q197_chisq_independence, q198_twap, q207_path_analysis,
    q210_peak_concurrency, q211_autocorrelation, q221_date_shift, q222_gap_deciles,
    q224_cohort_ltv, q225_user_growth, q176_rolling_actives,
    q226_variant_funnel, q227_wow_growth, q239_khop_reach, q240_mad_outliers,
    q242_incremental_topk, q244_ewma, q245_trimmed_mean,
    q284_winsorized_mean, q288_tv_drift, q289_max_drawdown, q290_top_movers, q292_robustness, q293_rich_club, q294_daily_percentile_bands, q295_log2_histogram, q296_position_attribution, q297_kendall_tau, q301_louvain_refine, q307_louvain_multilevel,
    q228_conversion_latency, q230_local_clustering, q231_markov_stationary, q232_degree_histogram,
    q147_incremental_view, q162_incremental_minmax,
    q234_incremental_distinct, q167_rolling_anomaly, q178_event_transitions, q179_linear_interpolate, q152_scd2_join, q154_event_funnel,
    q155_cohort_retention, q159_windowed_funnel,
    q10_window_lag, q11_interaction_graph, q12_distinct_users, q15_case_agg,
    q19_first_event, q20_sessionize, q22_daily_type_counts, q23_regex_extract,
    q24_chat_parse, q39_graph_filter, q42_asof_join, q43_interval_join,
    q44_asof_native, q73_triangles, q74_pagerank, q77_resample,
    q78_hopping_window, q79_session_window, q80_topk_agg,
    q93_json_extract, q98_personalized_pagerank, q99_weighted_pagerank,
    q108_graph_evolution, q121_kcore, q137_lpa_communities)
}
