package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JVM-wide cache of built registry query frames for the test suites.
  *
  * Building `q.fn(spark, sf)` is not free: many query bodies run EAGER
  * work at build time (localCheckpoint'ed shortlists, Louvain merge
  * frames, CorpusBuilds artifacts, whole stream lifecycles). The plan
  * lint and the registry sweep both need every query's frame in the same
  * shared-session JVM — without this cache each suite re-paid the eager
  * builds for all ~330 queries (~2–3 min of suite wall time; the suite
  * must fit the driver's test budget). The cached DataFrame is immutable:
  * plan inspection and re-execution (collect) work unchanged.
  */
object TestQueryCache {
  private val frames =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  def df(spark: SparkSession, sf: String, name: String): DataFrame =
    frames.computeIfAbsent(s"$sf|$name",
      _ => Registry.byName(name).fn(spark, sf))
}
