package graft.plans

import graft.{SparkSpec, SqlEntry}

/** [[RecursiveUnion]]: DuckDB-semantics recursive CTEs with UNION (dedup)
  * executed as a semi-naive DataFrame fixpoint by the SQL entry.
  */
class RecursiveUnionSpec extends SparkSpec {

  private def rows(sql: String): Seq[Seq[Any]] = {
    SqlEntry.registerViews(spark, "/root/testdata/sf0.001")
    SqlEntry.runSql(spark, sql).collect().toSeq.map(_.toSeq)
  }

  test("transitive closure over a CYCLIC graph terminates and is exact") {
    // 1→2→3→1 is a cycle (UNION ALL recursion would never terminate) plus
    // an isolated edge 5→6; closure from 1 must reach {1, 2, 3}
    val got = rows("""WITH RECURSIVE e AS (
      |  SELECT 1 AS a, 2 AS b UNION ALL SELECT 2, 3
      |  UNION ALL SELECT 3, 1 UNION ALL SELECT 5, 6),
      |r(a, b) AS (
      |  SELECT a, b FROM e
      |  UNION
      |  SELECT r.a, e.b FROM r JOIN e ON r.b = e.a)
      |SELECT a, b FROM r WHERE a = 1 ORDER BY b""".stripMargin)
    assert(got == Seq(Seq(1, 1), Seq(1, 2), Seq(1, 3)))
  }

  test("an empty base yields an empty fixpoint without iterating") {
    val got = rows("""WITH RECURSIVE e AS (SELECT 1 AS a, 2 AS b),
      |r(a, b) AS (
      |  SELECT a, b FROM e WHERE a < 0
      |  UNION
      |  SELECT r.a, e.b FROM r JOIN e ON r.b = e.a)
      |SELECT count(*) AS n FROM r""".stripMargin)
    assert(got == Seq(Seq(0L)))
  }

  test("near miss: UNION ALL recursion stays on Spark's native path") {
    // bounded countdown — native recursive CTE must still run it
    val got = rows("""WITH RECURSIVE t(n) AS (
      |  SELECT 1 UNION ALL SELECT n + 1 FROM t WHERE n < 3)
      |SELECT n FROM t ORDER BY n""".stripMargin)
    assert(got == Seq(Seq(1), Seq(2), Seq(3)))
  }

  test("non-recursive CTEs inlined around the fixpoint keep resolving") {
    val got = rows("""WITH RECURSIVE base AS (
      |  SELECT 10 AS a, 20 AS b UNION ALL SELECT 20, 30),
      |e AS (SELECT a, b FROM base UNION SELECT b, a FROM base),
      |r(a, b) AS (
      |  SELECT a, b FROM e
      |  UNION
      |  SELECT r.a, e.b FROM r JOIN e ON r.b = e.a),
      |comp AS (SELECT a, LEAST(a, MIN(b)) AS cid FROM r GROUP BY a)
      |SELECT count(DISTINCT cid) AS n_components FROM comp""".stripMargin)
    assert(got == Seq(Seq(1L)))
  }
}
