package graft

import org.apache.spark.sql.SparkSession

/** One-call session factory with the engine's recommended configuration —
  * what a library user starts from.
  */
object Graft {

  /** Build (or get) a session: graft extensions (native functions), UTC,
    * nanos-tolerant parquet reads, AQE on. `shufflePartitions` should match
    * cluster parallelism (executors × cores), NOT the 200 default — on
    * local[N] pass N.
    */
  def session(
      master: String = "local[*]",
      shufflePartitions: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val s = SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.extensions", classOf[functions.GraftExtensions].getName)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // getOrCreate may have returned a pre-existing session whose builder
    // didn't run extensions — register on the live session regardless.
    org.apache.spark.sql.GraftRegistrar.register(s)
    s
  }
}
