package graft

import org.apache.spark.sql.functions._

/** Contract sanity for the driver-facing inventory + a smoke run of the
  * flagship entry at sf0.001.
  */
class RegistrySpec extends SparkSpec {

  test("query names are unique and oracle keys ⊆ query keys") {
    val names = Registry.all.map(_.name)
    assert(names.distinct.size == names.size)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("entry returns rows on sf0.001 with a driver-style plain session") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query runs at sf0.001") {
    val failures = Registry.all.flatMap { q =>
      try { q.fn(spark, "/root/testdata/sf0.001").limit(1).collect(); None }
      catch { case e: Throwable => Some(s"${q.name}: ${e.getMessage.take(120)}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  // Flagship queries whose oracle text is engine-portable ANSI: the SAME
  // SQL the DuckDB oracle runs must, through SqlEntry's temp views and
  // Catalyst's parser, produce the DataFrame form's rows exactly. This
  // pins the SQL-text entry path end-to-end (parse → analyze → optimize →
  // execute) as a first-class way to drive the engine.
  private val sqlFlagships = Seq(
    "q01_pricing_summary", "q02_filter_pushdown", "q03_join_agg",
    "q04_exists_semi", "q05_region_revenue", "q06_filter_agg",
    "q07_anti_join", "q08_topk_orders", "q09_window_rank",
    "q10_window_lag")

  test("SQL-text entry: flagship oracle SQL == DataFrame form via temp views") {
    val sf = "/root/testdata/sf0.001"
    SqlEntry.registerViews(spark, sf)
    val failures = sqlFlagships.flatMap { name =>
      val q = Registry.byName(name)
      try {
        val viaSql = spark.sql(q.oracle.get).collect().map(_.toString).toSeq
        val viaDf = q.fn(spark, sf).collect().map(_.toString).toSeq
        if (viaSql == viaDf) None
        else Some(s"$name: SQL form diverged " +
          s"(${viaSql.size} vs ${viaDf.size} rows; first diff: " +
          s"${viaSql.zipAll(viaDf, "<none>", "<none>")
            .find { case (a, b) => a != b }.getOrElse("")})")
      } catch {
        case e: Throwable => Some(s"$name: ${e.getMessage.take(160)}")
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
