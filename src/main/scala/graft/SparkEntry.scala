package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator inventory (Registry.all); `oracleSql` the
  * DuckDB-equivalent SQL for every SQL-expressible entry. Column names are
  * aligned between both sides (the driver sorts columns by name before
  * hashing values).
  */
object SparkEntry {

  /** Sessions created by the driver's own harness may lack this; every
    * query that touches `events` needs nanos-as-long parquet reading
    * (Spark rejects INT64 TIMESTAMP(NANOS) otherwise). Safe to set
    * repeatedly on an existing session.
    */
  private def configure(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    org.apache.spark.sql.GraftRegistrar.register(spark)
    spark
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the reference's core capability (interaction graph, SURVEY §3.1)
    * expressed over the events table.
    */
  def entry(spark: SparkSession): DataFrame =
    events.EventQueries.q11_interaction_graph.fn(configure(spark), "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.all.map(q => q.name -> { (s: SparkSession, dir: String) =>
      q.fn(configure(s), dir)
    }).toMap

  /** DuckDB-runnable ANSI SQL per query (omitted → rows-only check). */
  def oracleSql: Map[String, String] =
    Registry.all.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
