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
}
