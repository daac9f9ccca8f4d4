package graft.chat

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.time.LocalDate

/** The reference's flagship query (SURVEY.md §3.1): chat file → weighted
  * undirected interaction graph.
  *
  * Semantics preserved exactly (each is golden-tested):
  *  - F5 date range filters only when BOTH bounds are present
  *    (backend/main.py:274-275,305-307 — one-sided bound = no filter);
  *  - L1 limit counts *accepted* messages (post-filter), and the lag source
  *    is the limited sequence (message limit+1 contributes no edge);
  *  - J1 lag runs AFTER all filters, so dropped lines bridge gaps
  *    (`previous_sender` semantics, backend/main.py:305-319);
  *  - J2 canonical pair via least/greatest — UTF8 binary comparison ==
  *    Python's code-point sort for the full unicode range;
  *  - no self-loops, runs of one sender collapse.
  *
  * Scale: every window partitions by `file` — parallelism scales with the
  * number of chat files; a single file is one task (matches the inherently
  * sequential reference semantics). Two shuffles total: one hash partition
  * by file (reused by all three windows), one for the edge aggregation.
  */
object Network {

  final case class Graph(nodes: DataFrame, links: DataFrame)

  /** msgs: output of ChatParser.analyzeDialect. */
  def analyze(
      msgs: DataFrame,
      startDate: Option[LocalDate] = None,
      endDate: Option[LocalDate] = None,
      limit: Option[Int] = None): Graph = {

    val wFile = Window.partitionBy("file").orderBy("line_no")

    // F5: both-or-nothing date range (inclusive)
    val ranged = (startDate, endDate) match {
      case (Some(s), Some(e)) =>
        msgs.filter(col("message_date").between(
          lit(java.sql.Date.valueOf(s)), lit(java.sql.Date.valueOf(e))))
      case _ => msgs
    }

    // L1: first `limit` accepted messages per file (0/absent = unlimited)
    val limited = limit.filter(_ > 0) match {
      case Some(n) =>
        ranged.withColumn("_rn", row_number().over(wFile)).filter(col("_rn") <= n).drop("_rn")
      case None => ranged
    }

    // J1 after all filters; J2 canonicalization; A2 weight agg
    val edges = limited
      .withColumn("prev", lag("sender", 1).over(wFile))
      .filter(col("prev").isNotNull && col("prev") =!= col("sender"))
      .select(
        least(col("prev"), col("sender")).as("source"),
        greatest(col("prev"), col("sender")).as("target"))
      .groupBy("source", "target")
      .agg(count(lit(1)).cast(LongType).as("weight"))

    // A1: distinct accepted senders
    val nodes = limited.select(col("sender").as("id")).distinct()

    Graph(nodes, edges)
  }

  /** F9/F10 (client post-processing done engine-side): case-insensitive
    * substring filter over node ids, links kept only when BOTH endpoints
    * survive — two left_semi joins (frontend/src/pages/Form.jsx:159-171).
    * P10: √weight link width is the render-side scalar, exposed here too.
    */
  def filterGraph(g: Graph, query: String): Graph = {
    val keep = g.nodes.filter(lower(col("id")).contains(query.toLowerCase))
    val links = g.links
      .join(keep.select(col("id").as("source")), Seq("source"), "left_semi")
      .join(keep.select(col("id").as("target")), Seq("target"), "left_semi")
      .withColumn("width", sqrt(col("weight")))
      .select("source", "target", "weight", "width")
    Graph(keep, links)
  }

  /** One-call façade mirroring GET /analyze/network/{filename}. */
  def analyzeFile(
      spark: SparkSession,
      path: String,
      startDate: Option[LocalDate] = None,
      endDate: Option[LocalDate] = None,
      limit: Option[Int] = None): Graph =
    analyze(ChatParser.analyzeDialect(ChatLines.read(spark, path)), startDate, endDate, limit)

  /** JSON shape of backend/main.py:328-338:
    * {"nodes":[{"id":..}],"links":[{"source","target","weight"}]}.
    * The reference's node order is Python set order (nondeterministic);
    * we emit both lists sorted — a documented, deterministic refinement.
    *
    * FAÇADE-ONLY CONTRACT: the `collect()`s below exist solely to
    * materialize the reference's HTTP RESPONSE shape — a chat network is
    * person-sized, and an API response is driver-sized by definition.
    * This method must never appear inside a pipeline: any operator
    * needing graph output composes on the `Graph` frames (or
    * [[writeGraph]], the executor-side sink) and keeps the data
    * distributed. These are the only collects in the library outside
    * test/probe harnesses, and the plan lints assume that stays true.
    */
  def toJson(g: Graph): String = {
    val nodes = g.nodes.orderBy("id").collect()
      .map(r => s"""{"id": ${jsonStr(r.getString(0))}}""")
    val links = g.links.orderBy("source", "target").collect()
      .map(r =>
        s"""{"source": ${jsonStr(r.getString(0))}, "target": ${jsonStr(r.getString(1))}, "weight": ${r.getLong(2)}}""")
    s"""{"nodes": [${nodes.mkString(", ")}], "links": [${links.mkString(", ")}]}"""
  }

  /** Distributed graph sink: `toJson` mirrors the reference's HTTP response
    * (S12) and must collect; at 100× graph scale that collect is the one
    * driver-side OOM in the API, so large results exit through files
    * instead. Layout: `dir/nodes` + `dir/links` as parquet (sorted within
    * partitions for stable diffing), plus `dir/nodes_json` / `dir/links_json`
    * JSON-lines when `jsonLines = true` — one object per line in the same
    * shape as `toJson`'s entries, written by executors, never the driver.
    */
  def writeGraph(g: Graph, dir: String, jsonLines: Boolean = false): Unit = {
    g.nodes.sortWithinPartitions("id")
      .write.mode("overwrite").parquet(s"$dir/nodes")
    g.links.sortWithinPartitions("source", "target")
      .write.mode("overwrite").parquet(s"$dir/links")
    if (jsonLines) {
      g.nodes.sortWithinPartitions("id")
        .write.mode("overwrite").json(s"$dir/nodes_json")
      g.links.sortWithinPartitions("source", "target")
        .write.mode("overwrite").json(s"$dir/links_json")
    }
  }

  /** Round-trip companion of [[writeGraph]]. */
  def readGraph(spark: SparkSession, dir: String): Graph =
    Graph(
      spark.read.parquet(s"$dir/nodes"),
      spark.read.parquet(s"$dir/links"))

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
}
