package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew-guard scale probe (the BASELINE.md "pathological corpus" harness).
  *
  * `sbt "runMain graft.ScaleProbe [sfDir] [mult] [injectSize]"`
  *
  * Builds a `mult`× replica of the documents corpus PLUS one deliberately
  * pathological boilerplate cluster of `injectSize` near-identical docs,
  * and one celebrity node grafted onto the events interaction graph, then
  * times the four skew-exposed operator families (n-gram Jaccard, LSH
  * candidate pairs, near-dup components, triangles) at 1× and at `mult`×.
  * One JSON line per probe:
  * `{"probe":..,"scale":..,"docs":..,"seconds":..,"rows":..}` — `rows` is
  * the operator's output size, the number that must stay LINEAR in
  * corpus/cluster size for the 100 TB posture to hold. Nothing here is
  * called by queries(); it exists so the skew claims in BASELINE.md are
  * reproducible with one command rather than asserted from memory.
  */
object ScaleProbe {

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val mult = if (args.length > 1) args(1).toInt else 10
    val inject = if (args.length > 2) args(2).toInt else 10000
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val base = relational.Tables.documents(spark, sfDir)
      .select("doc_id", "text").persist()
    val nBase = base.count()

    // mult× replicas (id-remapped — each doc becomes an exact-dup cluster
    // of size `mult`) + the boilerplate cluster: `inject` docs sharing one
    // body with a tiny per-doc suffix, the worst LSH case (every band maps
    // the whole cluster into one bucket).
    val boiler = "subscribe to our newsletter for daily updates unsubscribe " +
      "at any time terms of service privacy policy all rights reserved"
    val cluster = spark.range(inject).select(
      (col("id") + 900000000L).as("doc_id"),
      concat(lit(boiler + " ref"), (col("id") % 7).cast("string")).as("text"))
    val big = (0 until mult).map(k =>
        base.select((col("doc_id") + lit(k * 10000000L)).as("doc_id"), col("text")))
      .reduce(_ unionAll _)
      .unionAll(cluster)
      .repartition(spark.sparkContext.defaultParallelism)
      .persist()
    val nBig = big.count()

    def probeDocs(name: String, scale: String, docs: DataFrame, n: Long): Unit = {
      val (rows29, t29) = time(ops.Dedup.ngramJaccardPairs(
        docs, "doc_id", "text", threshold = 0.2).count())
      emit("q29_ngram_jaccard", scale, n, t29, rows29)
      val (rows37, t37) = time(ops.Dedup.minhashCandidates(
        docs, "doc_id", "text").count())
      emit("q37_minhash_pairs", scale, n, t37, rows37)
      val (rows52, t52) = time(ops.Dedup.canonicalize(
          docs.select("doc_id"), "doc_id",
          ops.Dedup.minhashStarEdges(docs, "doc_id", "text"))
        .filter(col("is_keep") === 0L).count())
      emit("q52_components_dropped", scale, n, t52, rows52)
    }

    probeDocs("docs", "1x", base, nBase)
    probeDocs("docs", s"${mult}x+cluster", big, nBig)

    // q92: repeated-window detection on the same corpora — the boilerplate
    // cluster makes its windows corpus-frequency ~inject, the worst case
    // for the frequency aggregate
    val (r92a, t92a) = time(ops.Dedup.repeatedWindows(base, "doc_id", "text")
      .agg(sum("n_repeated")).collect().head.getLong(0))
    emit("q92_repeated_windows", "1x", nBase, t92a, r92a)
    val (r92b, t92b) = time(ops.Dedup.repeatedWindows(big, "doc_id", "text")
      .agg(sum("n_repeated")).collect().head.getLong(0))
    emit("q92_repeated_windows", s"${mult}x+cluster", nBig, t92b, r92b)

    // q88: fuzzy matching on a name table with one pathological variant
    // bucket (all `inject` cluster "names" are near-identical strings)
    val names = spark.range(inject).select(
      concat(lit("User#"), lpad((col("id") % (inject / 10)).cast("string"), 9, "0"))
        .as("name"))
    val (r88, t88) = time(ops.Dedup.editDistance1Pairs(names, "name").count())
    emit("q88_fuzzy_names", "dense-dup names", inject, t88, r88)

    // celebrity graph: the events interaction edges + one node of degree
    // `inject` (edges to the lowest user ids). Degree orientation keeps
    // the wedge join bounded; the probe pins both the time and the count.
    val edges = ops.GlobalLag.withLag(
        relational.Tables.events(spark, sfDir)
          .select("user_id", "ts_ns", "event_id"),
        Seq("ts_ns", "event_id"), "user_id", "prev")
      .filter(col("prev").isNotNull && col("prev") =!= col("user_id"))
      .select(col("prev").as("source"), col("user_id").as("target"))
      .persist()
    val (tri1, tt1) = time(
      ops.Graph.triangleStats(edges, "source", "target").collect().head)
    emit("q73_triangles", "1x", tri1.getAs[Long]("n_edges"), tt1,
      tri1.getAs[Long]("n_triangles"))
    val celebrity = spark.range(inject).select(
      lit(-1L).as("source"), col("id").as("target"))
    val withCeleb = edges.unionAll(celebrity)
    val (tri2, tt2) = time(
      ops.Graph.triangleStats(withCeleb, "source", "target").collect().head)
    emit("q73_triangles", "celebrity", tri2.getAs[Long]("n_edges"), tt2,
      tri2.getAs[Long]("n_triangles"))

    spark.stop()
  }

  private def emit(probe: String, scale: String, n: Long, sec: Double, rows: Long): Unit =
    println(f"""{"probe":"$probe","scale":"$scale","input":$n,"seconds":$sec%.2f,"rows":$rows}""")
}
