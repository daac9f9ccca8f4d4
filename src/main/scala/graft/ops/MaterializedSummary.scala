package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The MAINTENANCE side of [[graft.plans.MvRewrite]]: a count/sum summary
  * stored through [[VersionedIndex]] (crash-atomic commits, one-version
  * grace, multi-writer claims — the house protocol for standing
  * artifacts) and REFRESHED incrementally from append deltas: the delta
  * aggregates at summary granularity (delta-sized work) and full-outer
  * merges into the standing rows; a base-table group the delta never
  * touches is read and rewritten only because the summary is GROUP-COUNT
  * sized — the corpus is never re-scanned.
  *
  * [[registerCurrent]] resolves the committed summary generation and
  * hands it to the rewrite rule's catalog; after a refresh, re-resolving
  * re-points the catalog at the new generation (the catalog swap is a
  * volatile write — a concurrent query serves old-or-new, never a blend,
  * because each generation directory is immutable).
  */
object MaterializedSummary {

  /** Build and commit v1 of the summary: group `base` by `dims`, carry
    * cnt + SUM and non-null COUNT of every `sumCols` entry (as
    * `sum_<col>` / `cnt_<col>` — the pair lets the rewrite rule serve
    * COUNT(col) and AVG(col) too) + MIN/MAX of every `minMaxCols` entry
    * (as `min_<col>` / `max_<col>`).
    */
  def build(spark: SparkSession, base: DataFrame, dir: String,
      dims: Seq[String], sumCols: Seq[String],
      minMaxCols: Seq[String] = Seq.empty, keepLast: Int = 2): Unit = {
    val c = VersionedIndex.begin(spark, dir, keepLast)
    try {
      summarize(base, dims, sumCols, minMaxCols)
        .coalesce(1).write.mode("overwrite").parquet(s"${c.gen}/summary")
      c.finish(VersionedIndex.Manifest(
        Map("summary" -> Map("-" -> c.genLabel)), Map.empty))
    } catch { case e: Throwable => c.abort(); throw e }
  }

  private def summarize(df: DataFrame, dims: Seq[String],
      sumCols: Seq[String], minMaxCols: Seq[String]): DataFrame =
    df.groupBy(dims.map(col): _*)
      .agg(count(lit(1)).as("cnt"),
        sumCols.flatMap(sc => Seq(sum(sc).cast("long").as(s"sum_$sc"),
          count(col(sc)).as(s"cnt_$sc"))) ++
          minMaxCols.flatMap(mc => Seq(min(mc).as(s"min_$mc"),
            max(mc).as(s"max_$mc"))): _*)

  /** The additively-maintained columns (group size, partial sums,
    * per-column non-null counts) — they add under appends and subtract
    * under exact-row deletes.
    */
  private def additiveCols(sumCols: Seq[String]): Seq[String] =
    "cnt" +: sumCols.flatMap(sc => Seq(s"sum_$sc", s"cnt_$sc"))

  /** Refresh references every cnt_<col>; a summary directory built
    * before those columns existed would otherwise fail mid-plan with an
    * opaque AnalysisException (MvRewrite schema-guards the same case,
    * so the serve path declines cleanly — only maintenance needs this
    * explicit diagnosis).
    */
  private def requireCntCols(standing: DataFrame,
      sumCols: Seq[String]): Unit = {
    val missing = sumCols.map(sc => s"cnt_$sc")
      .filterNot(standing.columns.contains)
    require(missing.isEmpty,
      s"summary predates the per-column non-null counts (missing " +
        s"${missing.mkString(", ")}) — rebuild the summary with build()")
  }

  /** Incremental refresh from an APPEND delta: aggregate the delta at
    * summary granularity, merge into the standing summary (cnt and sums
    * add; brand-new groups insert), commit as the next version. The only
    * corpus-sized input is the delta itself.
    */
  def refresh(spark: SparkSession, dir: String, delta: DataFrame,
      dims: Seq[String], sumCols: Seq[String],
      minMaxCols: Seq[String] = Seq.empty, keepLast: Int = 2): Unit = {
    val c = VersionedIndex.begin(spark, dir, keepLast)
    try {
      val standing = spark.read.parquet(
        s"$dir/${c.baseManifest.parts("summary")("-")}/summary")
      requireCntCols(standing, sumCols)
      val d = summarize(delta, dims, sumCols, minMaxCols)
      def added(a: String) =
        coalesce(col(s"s.$a"), lit(0L)) + coalesce(col(s"d.$a"), lit(0L))
      // SUM(x) over a group is NULL iff its non-null count is zero — the
      // merged cnt_<x> recovers that exactly (a plain coalesce-add would
      // turn an all-null group's NULL sum into 0)
      val sumExprs = additiveCols(sumCols).map { a =>
        (if (a.startsWith("sum_"))
          when(added("cnt_" + a.stripPrefix("sum_")) === 0L,
            lit(null)).otherwise(added(a))
        else added(a)).as(a)
      }
      // extrema merge null-safely: a group present on only one side
      // keeps that side's bound (least/greatest are null-poisoning)
      val mmExprs = minMaxCols.flatMap { mc =>
        def m(a: String, f: (org.apache.spark.sql.Column,
            org.apache.spark.sql.Column) => org.apache.spark.sql.Column) =
          when(col(s"s.$a").isNull, col(s"d.$a"))
            .when(col(s"d.$a").isNull, col(s"s.$a"))
            .otherwise(f(col(s"s.$a"), col(s"d.$a"))).as(a)
        Seq(m(s"min_$mc", least(_, _)), m(s"max_$mc", greatest(_, _)))
      }
      standing.alias("s")
        .join(d.alias("d"), dims, "full_outer")
        .select(dims.map(col) ++ sumExprs ++ mmExprs: _*)
        .coalesce(1).write.mode("overwrite").parquet(s"${c.gen}/summary")
      c.finish(VersionedIndex.Manifest(
        Map("summary" -> Map("-" -> c.genLabel)), Map.empty))
    } catch { case e: Throwable => c.abort(); throw e }
  }

  private val rescanObsId = new java.util.concurrent.atomic.AtomicLong()

  /** Incremental refresh from a SIGNED CDC batch: `inserts` append rows,
    * `deletes` retract exact rows currently in the base (the IVM
    * contract [[Incremental]] documents — a delete batch is a subset of
    * the live rows). cnt and the integral partial sums SUBTRACT; a group
    * whose count reaches zero leaves the summary; MIN/MAX merge
    * arithmetically where provably safe (an insert can only improve an
    * extreme, and a delete strictly inside the stored (min, max)
    * interval cannot move either) and are REPAIRED by re-scanning ONLY
    * the delete-affected groups of `currentBase` — the base AFTER the
    * batch applied — so repair cost follows the affected groups' row
    * mass, never the corpus (the q162 tier-2 pattern lifted into the MV
    * lifecycle; re-scanned row volume observable via
    * `graft.mv.rescan.*`). Committed as the next version and served by
    * the rewrite rule after [[registerCurrent]], exactly like
    * [[refresh]].
    */
  def refreshSigned(spark: SparkSession, dir: String, inserts: DataFrame,
      deletes: DataFrame, currentBase: DataFrame, dims: Seq[String],
      sumCols: Seq[String], minMaxCols: Seq[String] = Seq.empty,
      keepLast: Int = 2): Unit = {
    val c = VersionedIndex.begin(spark, dir, keepLast)
    try {
      val standing = spark.read.parquet(
        s"$dir/${c.baseManifest.parts("summary")("-")}/summary")
      requireCntCols(standing, sumCols)
      val aggCols = additiveCols(sumCols) ++
        minMaxCols.flatMap(mc => Seq(s"min_$mc", s"max_$mc"))
      def tagged(df: DataFrame, t: String): DataFrame =
        summarize(df, dims, sumCols, minMaxCols).select(
          dims.map(col) ++ aggCols.map(a => col(a).as(s"${a}_$t")): _*)
      val merged = standing
        .join(tagged(inserts, "i"), dims, "full_outer")
        .join(tagged(deletes, "d"), dims, "full_outer")
      // a group is affected iff its delete batch touches a stored
      // extreme of ANY tracked column; a strictly-interior delete
      // provably cannot move min or max
      val affectedCond = minMaxCols
        .map(mc => col(s"min_${mc}_d") <= col(s"min_$mc") ||
          col(s"max_${mc}_d") >= col(s"max_$mc"))
        .reduceOption(_ || _).getOrElse(lit(false)) &&
        coalesce(col("cnt_d"), lit(0L)) > 0L
      val withAff = merged.withColumn("_affected", affectedCond)
      val mmAggs = minMaxCols.flatMap(mc => Seq(
        min(mc).as(s"min_${mc}_r"), max(mc).as(s"max_${mc}_r")))
      val rescan =
        if (minMaxCols.isEmpty) null
        else currentBase
          .join(withAff.filter(col("_affected")).select(dims.map(col): _*),
            dims, "left_semi")
          .observe(s"graft.mv.rescan.${rescanObsId.incrementAndGet()}",
            count(lit(1)).as("rows_rescanned"))
          .groupBy(dims.map(col): _*)
          .agg(mmAggs.head, mmAggs.tail: _*)
      val joined =
        if (minMaxCols.isEmpty) withAff
        else withAff.join(rescan, dims, "left_outer")
      def signed(a: String) =
        coalesce(col(a), lit(0L)) + coalesce(col(s"${a}_i"), lit(0L)) -
          coalesce(col(s"${a}_d"), lit(0L))
      // same NULL-sum repair as refresh(): after the signed merge a
      // group whose surviving rows are all NULL in x must report a NULL
      // sum_x, which cnt_x (itself signed-merged) decides exactly
      val sumExprs = additiveCols(sumCols).map { a =>
        (if (a.startsWith("sum_"))
          when(signed("cnt_" + a.stripPrefix("sum_")) === 0L,
            lit(null)).otherwise(signed(a))
        else signed(a)).as(a)
      }
      // unaffected: extrema merge with the insert side (least/greatest
      // skip nulls); affected: the rescan of currentBase is exact and
      // already includes this batch's inserts
      val mmExprs = minMaxCols.flatMap { mc =>
        Seq(
          when(col("_affected"), col(s"min_${mc}_r"))
            .otherwise(least(col(s"min_$mc"), col(s"min_${mc}_i")))
            .as(s"min_$mc"),
          when(col("_affected"), col(s"max_${mc}_r"))
            .otherwise(greatest(col(s"max_$mc"), col(s"max_${mc}_i")))
            .as(s"max_$mc"))
      }
      joined
        .select(dims.map(col) ++ sumExprs ++ mmExprs: _*)
        .filter(col("cnt") > 0L)
        .coalesce(1).write.mode("overwrite").parquet(s"${c.gen}/summary")
      c.finish(VersionedIndex.Manifest(
        Map("summary" -> Map("-" -> c.genLabel)), Map.empty))
    } catch { case e: Throwable => c.abort(); throw e }
  }

  /** Physical path of the committed summary generation. */
  def currentPath(spark: SparkSession, dir: String): String = {
    val (_, m) = VersionedIndex.readManifest(spark, dir)
    s"$dir/${m.parts("summary")("-")}/summary"
  }

  /** TIME TRAVEL: the summary AS OF an older committed version — valid
    * for any version the retention window ([[VersionedIndex.begin]]'s
    * `keepLast`) still holds. The old generation directory is immutable
    * and GC keeps it until keepLast later commits, so the read is
    * exactly the rows that version served when it was current — the
    * zone map's q323 contract, over the MV artifact.
    */
  def readAt(spark: SparkSession, dir: String, version: Long): DataFrame = {
    val m = VersionedIndex.readManifestAt(spark, dir, version)
      .getOrElse(throw new IllegalStateException(
        s"$dir holds no manifest v$version — outside the retention window"))
    spark.read.parquet(s"$dir/${m.parts("summary")("-")}/summary")
  }

  /** Point the rewrite catalog at the committed generation — call after
    * build and after every refresh. The artifact id is the summary DIR:
    * re-registration after a refresh REPLACES this summary's catalog
    * row (never accumulates stale generations), while other summaries
    * registered for the same source coexist and compete tightest-wins.
    */
  def registerCurrent(spark: SparkSession, sourcePath: String, dir: String,
      dims: Set[String], sumCols: Set[String],
      minMaxCols: Set[String] = Set.empty): Unit = {
    org.apache.spark.sql.GraftRegistrar.register(spark)
    graft.plans.MvRewrite.register(spark, sourcePath,
      currentPath(spark, dir), dims, sumCols, minMaxCols,
      artifactId = Some(dir))
  }
}
