package graft.plans

import graft.{SparkSpec, SqlEntry}
import org.apache.spark.sql.Row

/** The SQL-entry dialect layer: [[ZipUnnest]]'s plan normalization
  * (zipped/nested SELECT-position generators, FROM-position lateral table
  * functions, 1-based subscripts) and [[SqlEntry.dialectNeutral]]'s text
  * rewrites. Every case runs through `SqlEntry.runSql` — the same path
  * RegistrySpec's oracle sweep uses.
  */
class ZipUnnestSpec extends SparkSpec {

  private def rows(sql: String): Seq[Seq[Any]] = {
    SqlEntry.registerViews(spark, "/root/testdata/sf0.001")
    SqlEntry.runSql(spark, sql).collect().toSeq.map(_.toSeq)
  }

  test("same-base zip: generate_subscripts + unnest emit 1-based position/value pairs") {
    val got = rows("""WITH t AS (SELECT string_split('a b c', ' ') AS ws)
      |SELECT generate_subscripts(ws, 1) AS i, unnest(ws) AS w FROM t""".stripMargin)
    assert(got == Seq(Seq(1L, "a"), Seq(2L, "b"), Seq(3L, "c")))
  }

  test("zip preserves scalar nesting around the calls (CAST, arithmetic)") {
    val got = rows("""WITH t AS (SELECT list_value(10, 20) AS xs)
      |SELECT generate_subscripts(xs, 1) - 1 AS p,
      |  CAST(unnest(xs) AS DOUBLE) / 2 AS h FROM t""".stripMargin)
    assert(got == Seq(Seq(0L, 5.0), Seq(1L, 10.0)))
  }

  test("different-base zip runs to the longest list, padding the shorter with NULL") {
    val got = rows("""WITH t AS (SELECT list_value(1, 2, 3) AS a, list_value(7) AS b)
      |SELECT unnest(a) AS x, unnest(b) AS y FROM t""".stripMargin)
    assert(got == Seq(Seq(1, 7), Seq(2, null), Seq(3, null)))
  }

  test("zip over empty and NULL lists emits zero rows") {
    val got = rows("""WITH t AS (
      |  SELECT string_split('', 'x') AS ws UNION ALL
      |  SELECT CAST(NULL AS ARRAY<STRING>) AS ws)
      |SELECT generate_subscripts(list_filter(ws, w -> w <> ''), 1) AS i,
      |  unnest(list_filter(ws, w -> w <> '')) AS w FROM t""".stripMargin)
    assert(got.isEmpty)
  }

  test("near miss: a single bare top-level unnest keeps the registry-shim plan") {
    val sql = "SELECT unnest(list_value(1, 2)) AS v"
    val parsed = spark.sessionState.sqlParser.parsePlan(sql)
    assert(ZipUnnest.rewrite(parsed) eq parsed)
  }

  test("near miss: generate_subscripts over a dimension other than 1 stays unresolved") {
    val e = intercept[Exception] {
      rows("SELECT generate_subscripts(list_value(1, 2), 2) AS i")
    }
    assert(e.getMessage.contains("generate_subscripts"))
  }

  test("FROM-position unnest is lateral: correlated range over the left side") {
    val got = rows("""WITH b AS (SELECT 1 AS x, 2 AS n UNION ALL SELECT 2, 0)
      |SELECT b.x, u.i FROM b, unnest(range(0, b.n)) AS u(i) ORDER BY x, i""".stripMargin)
    assert(got == Seq(Seq(1, 0L), Seq(1, 1L)))
  }

  test("FROM-position generate_series is an inclusive-range table function") {
    val got = rows(
      "SELECT t1.p, t2.i FROM generate_series(1, 2) t1(p), generate_series(5, 5) t2(i) ORDER BY p")
    assert(got == Seq(Seq(1L, 5L), Seq(2L, 5L)))
  }

  test("integer subscripts are 1-based, negative-from-end, NULL out of bounds") {
    val got = rows("""WITH t AS (SELECT string_split('a b c', ' ') AS ws)
      |SELECT ws[1] AS first, ws[-1] AS last, ws[9] AS oob,
      |  ws[1 + 1] AS expr_ix FROM t""".stripMargin)
    assert(got == Seq(Seq("a", "c", null, "b")))
  }

  test("string-literal subscripts stay struct/map field access") {
    val got = rows(
      "SELECT named_struct('k', 7)['k'] AS sf, map('a', 3)['a'] AS mv")
    assert(got == Seq(Seq(7, 3)))
  }

  test("dialectNeutral moves IGNORE NULLS out of the window argument list") {
    assert(SqlEntry.dialectNeutral(
      "SELECT last_value(CASE WHEN v IS NOT NULL THEN d END IGNORE NULLS) OVER w FROM t")
      .contains("END) IGNORE NULLS OVER w"))
  }

  test("dialectNeutral rewrites ordered string_agg to listagg WITHIN GROUP") {
    val got = rows("""WITH t AS (SELECT 1 AS g, 2 AS k, 'b' AS s
      |  UNION ALL SELECT 1, 1, 'a')
      |SELECT string_agg(s, ' ' ORDER BY k) AS txt FROM t GROUP BY g""".stripMargin)
    assert(got == Seq(Seq("a b")))
  }

  test("list_reduce folds from the first element like DuckDB's no-seed reduce") {
    val got = rows(
      "SELECT list_reduce(list_value('a', 'b', 'c'), (acc, x) -> acc || x) AS r")
    assert(got == Seq(Seq("abc")))
  }
}
