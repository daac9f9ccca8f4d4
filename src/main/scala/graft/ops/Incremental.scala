package graft.ops

import graft.relational.Sql
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate-view maintenance — the materialized-view upkeep
  * primitive every standing 100 TB rollup needs: when a CDC batch of
  * inserts and retractions arrives, the new view state is
  * `base ⊕ agg(inserts) ⊖ agg(deletes)` — three map-side-combined hash
  * aggregations and two full-outer merges over AGGREGATE-sized frames —
  * never a re-scan of the standing corpus. COUNT and SUM are the
  * self-maintainable aggregates (they form an abelian group under ⊕);
  * MIN/MAX are deliberately absent — a retraction of the current minimum
  * cannot be repaired from the aggregate alone, which is exactly why
  * production incremental views restrict themselves to group aggregates.
  *
  * Sums run in exact DECIMAL ([[Sql.dec2]]) so `base + ins − del` is
  * bit-identical to a from-scratch recompute on any partitioning — the
  * property the q147 oracle checks by recomputing the final state
  * directly.
  */
object Incremental {

  /** Merge a (count, Σvalue) view: per `keys` group,
    * `n = n_base + n_ins − n_del` and the decimal sum alike; groups whose
    * count reaches zero leave the view. Inputs are ROW frames (the base
    * rows stand in for the stored view in tests; production passes the
    * stored aggregate through an identity-shaped `agg`). Returns
    * keys :+ (n, sum_value) with the sum cast to DOUBLE at the very end.
    */
  def mergeCountSum(base: DataFrame, inserts: DataFrame, deletes: DataFrame,
      keys: Seq[String], valueCol: String): DataFrame = {
    def side(df: DataFrame, tag: String): DataFrame =
      df.groupBy(keys.map(col): _*)
        .agg(count(lit(1)).as(s"n_$tag"),
          sum(Sql.dec2(col(valueCol))).as(s"s_$tag"))
    val z = lit(0).cast(Sql.dec2t)
    side(base, "b")
      .join(side(inserts, "i"), keys, "full_outer")
      .join(side(deletes, "d"), keys, "full_outer")
      .select(keys.map(col) ++ Seq(
        (coalesce(col("n_b"), lit(0L)) + coalesce(col("n_i"), lit(0L)) -
          coalesce(col("n_d"), lit(0L))).as("n"),
        (coalesce(col("s_b"), z) + coalesce(col("s_i"), z) -
          coalesce(col("s_d"), z)).as("s")): _*)
      .filter(col("n") > 0L)
      .withColumn("sum_value", col("s").cast("double"))
      .drop("s")
  }

  private val rescanObsId = new java.util.concurrent.atomic.AtomicLong()

  /** The next maintenance tier: MIN/MAX under deletes and AVG. COUNT/SUM
    * (and therefore AVG = Σ/n, computed at read time) stay group-merge
    * arithmetic exactly as [[mergeCountSum]]; MIN/MAX are only
    * SEMI-maintainable — an insert can only improve an extreme
    * (`least(stored, batch)`), but a retraction of the current extreme
    * cannot be repaired from the aggregate alone. The standard production
    * answer, implemented here: re-scan ONLY the AFFECTED groups — those
    * whose delete batch touches the stored extreme (`del_min ≤ stored_min`
    * or `del_max ≥ stored_max`); a delete strictly inside the stored
    * (min, max) interval provably cannot move either extreme, so those
    * groups merge arithmetically like everything else. The re-scan leg is
    * `base ⋉ affected_keys` (left-semi, partition-prunable at scale when
    * the base is key-partitioned) minus the deleted rows by `rowIdCol`
    * anti-join, so its cost follows the affected groups' row mass, never
    * the standing corpus. Re-scanned row volume is observable via the
    * `graft.ivm.rescan.*` metric.
    *
    * Returns keys :+ (n, min_value, max_value, avg_value); groups whose
    * count reaches zero leave the view; AVG divides the exact decimal sum
    * cast to double by n (deterministic across partitionings).
    */
  def mergeMinMaxAvg(base: DataFrame, inserts: DataFrame, deletes: DataFrame,
      keys: Seq[String], valueCol: String, rowIdCol: String): DataFrame = {
    def side(df: DataFrame, tag: String): DataFrame =
      df.groupBy(keys.map(col): _*)
        .agg(count(lit(1)).as(s"n_$tag"),
          sum(Sql.dec2(col(valueCol))).as(s"s_$tag"),
          min(col(valueCol)).as(s"mn_$tag"),
          max(col(valueCol)).as(s"mx_$tag"))
    val stored = side(base, "b")
    val merged = stored
      .join(side(inserts, "i"), keys, "full_outer")
      .join(side(deletes, "d"), keys, "full_outer")
    val affectedKeys = merged
      .filter(coalesce(col("n_d"), lit(0L)) > 0L &&
        (col("mn_d") <= col("mn_b") || col("mx_d") >= col("mx_b")))
      .select(keys.map(col): _*)
    // affected groups only: stored rows minus the retracted row ids
    val rescan = base
      .join(affectedKeys, keys, "left_semi")
      .join(deletes.select(rowIdCol), Seq(rowIdCol), "left_anti")
      .observe(s"graft.ivm.rescan.${rescanObsId.incrementAndGet()}",
        count(lit(1)).as("rows_rescanned"))
      .groupBy(keys.map(col): _*)
      .agg(min(col(valueCol)).as("mn_r"), max(col(valueCol)).as("mx_r"))
    val z = lit(0).cast(Sql.dec2t)
    merged
      .join(rescan, keys, "left_outer")
      .withColumn("_affected",
        coalesce(col("n_d"), lit(0L)) > 0L &&
          (col("mn_d") <= col("mn_b") || col("mx_d") >= col("mx_b")))
      .select(keys.map(col) ++ Seq(
        (coalesce(col("n_b"), lit(0L)) + coalesce(col("n_i"), lit(0L)) -
          coalesce(col("n_d"), lit(0L))).as("n"),
        (coalesce(col("s_b"), z) + coalesce(col("s_i"), z) -
          coalesce(col("s_d"), z)).as("s"),
        when(col("_affected"), least(col("mn_r"), col("mn_i")))
          .otherwise(least(col("mn_b"), col("mn_i"))).as("min_value"),
        when(col("_affected"), greatest(col("mx_r"), col("mx_i")))
          .otherwise(greatest(col("mx_b"), col("mx_i"))).as("max_value")): _*)
      .filter(col("n") > 0L)
      .withColumn("avg_value", col("s").cast("double") / col("n"))
      .drop("s")
  }

  /** Maintenance tier 5: per-group TOP-K rows (ordered by valueCol DESC,
    * rowIdCol ASC as the deterministic tiebreak) under insert+delete CDC.
    * A top-k view is not self-maintainable the moment a retraction hits a
    * stored top row — the (k+1)-th value was never stored — so the rule is
    * q162's affected-group rescan lifted to ranked views:
    *
    *   - UNAFFECTED groups (no delete touched their stored top-k): the new
    *     top-k is re-ranked from stored-top ∪ that group's inserts — a
    *     frame of ≤ k + |Δins| rows per group, CDC-sized, never the
    *     corpus. Deletes of rows OUTSIDE the stored top-k cannot change
    *     the view (the deleted row was already beaten by k rows that all
    *     survive) and are correctly ignored.
    *   - AFFECTED groups (a delete id hit a stored top row): re-scan that
    *     group's post-churn rows (standing minus deletes, plus inserts)
    *     — one semi-join restriction, partition-prunable on a
    *     key-partitioned standing table, observed via `graft.ivm.rescan.*`
    *     like the MIN/MAX tier.
    *
    * Inputs carry exactly keys :+ (valueCol, rowIdCol). `base` is a ROW
    * frame standing in for the standing corpus; the stored top-k view is
    * derived here (production reads it back instead). Result: keys :+
    * (rank, valueCol, rowIdCol), rank 1..k, proven ≡ a from-scratch
    * re-rank by the q242 oracle.
    *
    * Deletes are matched on keys :+ rowIdCol (not the id alone), so the
    * rule is correct whether row ids are globally unique or only unique
    * WITHIN a group: a delete in one group never marks same-id rows in
    * other groups affected, and never drops them from the rescan.
    */
  def mergeTopK(base: DataFrame, inserts: DataFrame, deletes: DataFrame,
      keys: Seq[String], valueCol: String, rowIdCol: String,
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cols = keys.map(col) ++ Seq(col(valueCol), col(rowIdCol))
    val delKey = keys :+ rowIdCol
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(valueCol).desc, col(rowIdCol).asc)
    val stored = base.select(cols: _*)
      .withColumn("_rk", row_number().over(w)).filter(col("_rk") <= k)
      .drop("_rk")
    val delIds = deletes.select(delKey.map(col): _*)
    val affected = stored.join(delIds, delKey, "left_semi")
      .select(keys.map(col): _*).distinct()
    val ins = inserts.select(cols: _*)
    val unaffected = stored.join(affected, keys, "left_anti")
      .unionByName(ins.join(affected, keys, "left_anti"))
    val rescan = base.select(cols: _*)
      .join(affected, keys, "left_semi")
      .join(delIds, delKey, "left_anti")
      .observe(s"graft.ivm.rescan.${rescanObsId.incrementAndGet()}",
        count(lit(1)).as("rows_rescanned"))
      .unionByName(ins.join(affected, keys, "left_semi"))
    unaffected.unionByName(rescan)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Maintenance tier 4: COUNT(DISTINCT valueCol) under retraction.
    * A distinct count is not self-maintainable from the aggregate alone
    * (retracting one of a value's three occurrences must NOT drop the
    * distinct count; retracting its last one must) — the standard
    * production answer is the per-(group, value) SUPPORT table: a signed
    * count per distinct value, merged exactly like [[mergeCountSum]]'s
    * group counts (`support = n_base + n_ins − n_del`, values at zero
    * leave the table). The support table IS the stored auxiliary view;
    * its size is Σ distinct values per group (≤ the data, usually ≪),
    * and maintenance is three map-side-combined hash aggregations over
    * CDC-sized deltas plus two aggregate-sized merges — never a corpus
    * re-scan. [[distinctCounts]] derives the distinct-count view from it
    * with one more hash agg.
    *
    * `base` is a ROW frame standing in for the stored support table
    * (production passes the stored (group, value, support) rows through
    * an identity-weighted aggregation instead).
    */
  def mergeDistinctSupport(base: DataFrame, inserts: DataFrame,
      deletes: DataFrame, keys: Seq[String], valueCol: String): DataFrame = {
    val g = keys :+ valueCol
    def side(df: DataFrame, tag: String): DataFrame =
      df.groupBy(g.map(col): _*).agg(count(lit(1)).as(s"n_$tag"))
    side(base, "b")
      .join(side(inserts, "i"), g, "full_outer")
      .join(side(deletes, "d"), g, "full_outer")
      .select(g.map(col) :+
        (coalesce(col("n_b"), lit(0L)) + coalesce(col("n_i"), lit(0L)) -
          coalesce(col("n_d"), lit(0L))).as("support"): _*)
      .filter(col("support") > 0L)
  }

  /** The COUNT(DISTINCT) view over a [[mergeDistinctSupport]] table: one
    * hash agg, `n_distinct` = surviving support rows per group.
    */
  def distinctCounts(support: DataFrame, keys: Seq[String]): DataFrame =
    support.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n_distinct"))

  /** Maintenance tier 6: per-group discrete (lower) MEDIAN under
    * insert+delete CDC. A holistic aggregate has no scalar ⊕⊖ rule, but
    * it IS delta-maintainable over the per-group VALUE-HISTOGRAM support
    * table (the [[mergeDistinctSupport]] state with multiplicities):
    * histograms form an abelian group under per-(group, value) count
    * addition, and the median is a pure function of the group's
    * histogram. The update rule:
    *
    *   - UNTOUCHED groups (no CDC row): the stored median passes through
    *     — zero work, an anti-join against the CDC key set.
    *   - TOUCHED groups: merge the stored histogram rows with the CDC's
    *     ⊕⊖ deltas (all frames CDC- or histogram-sized, partition-
    *     prunable on a key-partitioned support table; observed via
    *     `graft.ivm.rescan.*`) and re-derive the median from the merged
    *     histogram — a per-group cumulative over DISTINCT values (the
    *     value-domain frame, never the group's row count).
    *
    * Median convention = q45's portable lower median: the smallest value
    * whose cumulative count reaches ⌊(n+1)/2⌋. Inputs are ROW frames
    * (base stands in for the stored support table + median view in
    * tests). Returns keys :+ (n, median), proven ≡ a from-scratch
    * recompute by the q254 oracle.
    */
  def mergeMedian(base: DataFrame, inserts: DataFrame, deletes: DataFrame,
      keys: Seq[String], valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = keys :+ valueCol
    def hist(df: DataFrame, tag: String): DataFrame =
      df.groupBy(g.map(col): _*).agg(count(lit(1)).as(s"c_$tag"))
    def medianOf(h: DataFrame, cnt: String): DataFrame = {
      val wk = Window.partitionBy(keys.map(col): _*).orderBy(valueCol)
      h.withColumn("_n", sum(col(cnt)).over(
          Window.partitionBy(keys.map(col): _*)))
        .withColumn("_cum", sum(col(cnt)).over(wk))
        .filter(col("_cum") >= expr("(_n + 1) div 2"))
        .groupBy(keys.map(col): _*)
        .agg(max(col("_n")).as("n"), min(col(valueCol)).as("median"))
    }
    val touched = inserts.select(keys.map(col): _*)
      .unionAll(deletes.select(keys.map(col): _*)).distinct()
    val stored = hist(base, "b")
    val merged = stored.join(touched, keys, "left_semi")
      .join(hist(inserts, "i"), g, "full_outer")
      .join(hist(deletes, "d"), g, "full_outer")
      .select(g.map(col) :+
        (coalesce(col("c_b"), lit(0L)) + coalesce(col("c_i"), lit(0L)) -
          coalesce(col("c_d"), lit(0L))).as("c"): _*)
      .filter(col("c") > 0L)
      .observe(s"graft.ivm.rescan.${rescanObsId.incrementAndGet()}",
        sum(col("c")).as("rows_rescanned"))
    medianOf(stored, "c_b").join(touched, keys, "left_anti")
      .unionByName(medianOf(merged, "c"))
      .filter(col("n") > 0L)
  }

  /** Maintenance tier 3: an INNER equi-join VIEW
    * `V = facts ⋈_joinKey dims` (dim unique per key) under a CDC batch
    * of fact inserts, fact deletes (by row id), and dim row UPDATES
    * (replacement payloads by key). The classic delta rules
    * (ΔV = ΔF⋈D ∪ F⋈ΔD ∪ ΔF⋈ΔD), arranged so the standing sides are
    * touched only where the delta lands:
    *
    *   1. drop view rows whose fact id was deleted — one anti-join with
    *      a delta-sized probe;
    *   2. drop view rows whose dim key was updated (stale dim payload)
    *      and RE-DERIVE them: post-churn facts restricted to the updated
    *      keys (one semi-join — the affected-key rescan, q162's rule
    *      lifted to the join tier; partition-prunable on a key-partitioned
    *      fact table) joined against the replacement dim rows;
    *   3. join fact inserts on un-updated keys against the standing dims
    *      (inserts on updated keys already arrived via rule 2's
    *      post-churn fact side).
    *
    * `factCols`/`dimCols` name the view's payload columns. The result is
    * proven ≡ a from-scratch re-join by the q193 oracle.
    */
  def mergeJoinView(view: DataFrame, facts: DataFrame, dims: DataFrame,
      factIns: DataFrame, factDelIds: DataFrame, dimUpd: DataFrame,
      joinKey: String, factIdCol: String): DataFrame = {
    val updKeys = dimUpd.select(joinKey)
    val kept = view
      .join(factDelIds, Seq(factIdCol), "left_anti")
      .join(updKeys, Seq(joinKey), "left_anti")
    // rule 2: post-churn facts of the updated keys only
    val affFacts = facts
      .join(factDelIds, Seq(factIdCol), "left_anti")
      .unionByName(factIns)
      .join(updKeys, Seq(joinKey), "left_semi")
    val rederived = affFacts.join(dimUpd, Seq(joinKey))
    // rule 3: fresh facts on untouched keys against the standing dim
    val freshOther = factIns
      .join(updKeys, Seq(joinKey), "left_anti")
      .join(dims, Seq(joinKey))
    kept.unionByName(rederived).unionByName(freshOther)
  }

  /** Maintenance tier 8 — CONNECTED-COMPONENT labels as an incremental
    * view under edge INSERTS (the insert-only case is the classic
    * incremental union-find; deletes force recompute and are out of
    * scope, as in every production CC view). The standing labels are
    * never re-derived: the delta edges are translated into LABEL pairs
    * (two delta-sized label lookups), only the pairs joining DIFFERENT
    * components survive, pointer-jumping runs on that label-pair graph
    * (bounded by the number of merging components, not by |E| or |V|),
    * and the resulting label remap is applied with one join against the
    * label table. Nodes first seen in the delta seed as their own
    * component. Labels stay "min node id of component" if they were —
    * the remap label is the min of merged labels.
    */
  def mergeComponents(labels: DataFrame, newPairs: DataFrame,
      aCol: String, bCol: String): DataFrame = {
    val deltaNodes = newPairs.select(col(aCol).as("node"))
      .unionByName(newPairs.select(col(bCol).as("node"))).distinct()
    val seeds = deltaNodes.join(labels.select("node"), Seq("node"),
      "left_anti").withColumn("label", col("node"))
    val all = labels.unionByName(seeds)
    val lp = newPairs
      .join(all.select(col("node").as(aCol), col("label").as("_la")),
        Seq(aCol))
      .join(all.select(col("node").as(bCol), col("label").as("_lb")),
        Seq(bCol))
      .filter(col("_la") =!= col("_lb"))
      .select(col("_la"), col("_lb"))
    val remap = Dedup.connectedComponents(lp, "_la", "_lb")
      .select(col("node").as("label"), col("label").as("_newLabel"))
    all.join(remap, Seq("label"), "left")
      .select(col("node"),
        coalesce(col("_newLabel"), col("label")).as("label"))
  }

  /** Maintenance tier 7 — the composed materialized-view workhorse: a
    * grouped COUNT/SUM aggregate OVER an inner equi-join, under a CDC
    * batch touching BOTH join inputs. The signed-delta algebra:
    *
    *   A' ⋈ B' = A⋈B  ∪  ΔA⋈B  ∪  A⋈ΔB  ∪  ΔA⋈ΔB
    *
    * where ΔX = inserts(+1) ∪ deletes(−1) and the cross term multiplies
    * signs — so the three delta joins (each delta-sized on at least one
    * side) produce a signed row stream whose grouped (Σsign, Σsign·value)
    * folds directly into the stored aggregate state:
    * `n' = n + Σsign`, `s' = s + Σ sign·value`, groups reaching n = 0
    * evicted. COUNT/SUM are self-maintainable, so the standing inputs
    * are only ever PROBED by delta-sized builds (broadcast the delta /
    * key-partitioned at scale) — never re-scanned into the aggregate,
    * and the view itself is aggregate-sized.
    *
    * `view` is the stored aggregate: `groupKeys :+ (n, s)` with `s` in
    * exact DECIMAL ([[graft.relational.Sql.dec2t]]); same shape out.
    * `valueCol` lives on the B side; `groupKeys` may come from either
    * side of the joined row. Deletes must be rows present in the
    * corresponding base (standard CDC contract).
    */
  def mergeJoinAggView(view: DataFrame,
      aBase: DataFrame, bBase: DataFrame,
      aIns: DataFrame, aDel: DataFrame,
      bIns: DataFrame, bDel: DataFrame,
      joinKey: String, groupKeys: Seq[String], valueCol: String): DataFrame = {
    def signed(ins: DataFrame, del: DataFrame, s: String): DataFrame =
      ins.withColumn(s, lit(1L))
        .unionByName(del.withColumn(s, lit(-1L)))
    val dA = signed(aIns, aDel, "_sa")
    val dB = signed(bIns, bDel, "_sb")
    val proj = groupKeys.map(col) ++
      Seq(col("_sign"), Sql.dec2(col(valueCol)).as("_v"))
    val d1 = dA.join(bBase, Seq(joinKey))
      .withColumn("_sign", col("_sa")).select(proj: _*)
    val d2 = aBase.join(dB, Seq(joinKey))
      .withColumn("_sign", col("_sb")).select(proj: _*)
    val d3 = dA.join(dB, Seq(joinKey))
      .withColumn("_sign", col("_sa") * col("_sb")).select(proj: _*)
    val z = lit(0).cast(Sql.dec2t)
    val delta = d1.unionByName(d2).unionByName(d3)
      .groupBy(groupKeys.map(col): _*)
      .agg(sum(col("_sign")).as("n_d"),
        sum(col("_v") * col("_sign")).as("s_d"))
    view.join(delta, groupKeys, "full_outer")
      .select(groupKeys.map(col) ++ Seq(
        (coalesce(col("n"), lit(0L)) + coalesce(col("n_d"), lit(0L))).as("n"),
        (coalesce(col("s"), z) +
          coalesce(col("s_d"), z).cast(Sql.dec2t)).as("s")): _*)
      .filter(col("n") > 0L)
  }
}
