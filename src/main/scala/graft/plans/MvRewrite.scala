package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** MATERIALIZED-VIEW auto-rewrite: a Catalyst optimizer rule that swaps a
  * matching aggregate over the base table for a re-aggregation of a
  * registered summary table — the classic warehouse accelerator
  * (Oracle/Calcite "query rewrite", Databricks MV routing), done the
  * Spark-native way: declare the intent in the logical plan, let a
  * `Rule[LogicalPlan]` redirect it.
  *
  * Reference behavior: the POC recomputes every analytics response from
  * the raw chat table per request (`POC/backend/main.py`); at 100 TB the
  * hot aggregates must come from maintained summaries, and the rewrite
  * must be AUTOMATIC — callers keep writing queries against the base
  * table and the planner serves the ones a summary can answer.
  *
  * Matching contract (conservative by design — a miss costs a full scan,
  * a wrong match costs correctness):
  *  - the plan fragment is Aggregate → (Filter | column-pruning Project |
  *    SubqueryAlias)* → parquet scan of the registered source path;
  *  - every grouping expression is a bare dimension column of the MV;
  *  - every aggregate is COUNT(*)/COUNT(1) or SUM(col) over a column the
  *    MV carries a partial sum for — no DISTINCT, no FILTER clauses;
  *  - every Filter predicate references dimension columns only (it then
  *    applies verbatim to the MV rows — each MV row is one whole group,
  *    so a dim predicate keeps or drops entire groups exactly);
  *  - the aggregate is GROUPED (a global COUNT over an empty relation is
  *    0, but SUM over the empty MV is NULL — the one shape whose
  *    re-aggregation is not literally equivalent, so it never rewrites).
  *
  * The rewrite preserves the Aggregate's output attribute ids (each
  * output re-aliased under its original exprId), so parent operators are
  * untouched. COUNT(*) re-aggregates as SUM(cnt), SUM(x) as SUM(sum_x) —
  * exact for integral sums (the only kind the catalog accepts; double
  * partial sums re-added in a different order would not be bit-stable).
  * COUNT(x) re-aggregates as SUM(cnt_x) from the summary's per-column
  * non-null counts (exact for any type — null-ness is order-free), and
  * AVG(x) over an INTEGRAL column as the one final division
  * SUM(sum_x) / SUM(cnt_x) in double — exact-or-better vs Spark's own
  * Average (which accumulates its sum in DOUBLE, so past a 2^53 group
  * sum the two can differ in the last ulp — the rewrite is the exact
  * side); AVG over a
  * double column never rewrites (its base-path accumulation order is
  * not reproducible from partials). Both require the summary schema to
  * carry `cnt_<col>` — summaries built before that column existed
  * simply decline these two shapes (schema-checked, not assumed).
  *
  * Staleness is VERIFIED, not caller-asserted: registration captures the
  * base path's content epoch ([[SkipRewrite.pathEpoch]] — file names +
  * sizes + mtimes) and the rule re-checks it on every match, declining
  * to rewrite when the base has changed since; refresh + re-register
  * re-enables the route. Registration is per-JVM ([[MvCatalog]]); the
  * rule itself is installed once via GraftRegistrar's experimental hooks.
  */
object MvRewrite {

  /** One registered summary: `mvPlan` is the analyzed scan of the summary
    * parquet (instantiated fresh per rewrite via newInstance, so expr ids
    * never collide across queries). MV schema contract: one column per
    * dim (same name), `cnt` (BIGINT group size), and `sum_<col>` (BIGINT)
    * per entry of `sumCols`. `epoch` is the BASE path's content signature
    * at registration ([[SkipRewrite.pathEpoch]]): the rule re-checks it
    * per match and declines when the base has changed since, so a stale
    * summary is never served — staleness is verified, not caller-asserted.
    */
  final case class MvDef(sourcePath: String, dims: Set[String],
      sumCols: Set[String], minMaxCols: Set[String],
      mvPlan: LogicalRelation, epoch: String,
      artifactId: String)

  object MvCatalog {
    @volatile private[plans] var mvs: Seq[MvDef] = Seq.empty
    def register(mv: MvDef): Unit = synchronized {
      // replace-by (source, artifact): ONE catalog row per standing
      // summary artifact (a refresh re-registration swaps its row for
      // the new generation), while DIFFERENT summaries over the same
      // source coexist — the rule then picks the tightest that answers
      mvs = mvs.filterNot(m => m.sourcePath == mv.sourcePath &&
        m.artifactId == mv.artifactId) :+ mv
    }
    def clear(): Unit = synchronized { mvs = Seq.empty }
  }

  /** Register a summary for `sourcePath`. `artifactId` identifies the
    * standing artifact across refreshes (defaults to the resolved
    * generation path — pass the artifact DIR when re-registering
    * refreshed generations of the same summary); several summaries with
    * distinct ids may serve one source, and the rule picks the
    * fewest-dims one that answers each query.
    */
  def register(spark: org.apache.spark.sql.SparkSession, sourcePath: String,
      mvPath: String, dims: Set[String], sumCols: Set[String],
      minMaxCols: Set[String] = Set.empty,
      artifactId: Option[String] = None): Unit = {
    val rel = spark.read.parquet(mvPath).queryExecution.analyzed.collectFirst {
      case l: LogicalRelation => l
    }.getOrElse(throw new IllegalStateException(
      s"$mvPath did not analyze to a parquet relation"))
    MvCatalog.register(MvDef(sourcePath, dims, sumCols, minMaxCols, rel,
      SkipRewrite.freshEpoch(spark, sourcePath),
      artifactId.getOrElse(mvPath)))
  }

  object Rule extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan =
      if (MvCatalog.mvs.isEmpty) plan
      else plan.transformUp {
        case agg @ Aggregate(gs, as, child, _) if gs.nonEmpty =>
          tryRewrite(agg, gs, as, child).getOrElse(agg)
      }

    private def scanPaths(l: LogicalRelation): Seq[String] =
      l.relation match {
        case h: HadoopFsRelation =>
          h.location.rootPaths.map(_.toUri.getPath)
        case _ => Seq.empty
      }

    /** Strip Filter / pruning-Project / SubqueryAlias down to the scan,
      * collecting filter predicates. None if any other operator appears.
      */
    private def strip(p: LogicalPlan,
        conds: Seq[Expression]): Option[(LogicalRelation, Seq[Expression])] =
      p match {
        case Filter(c, ch) => strip(ch, conds :+ c)
        case Project(pl, ch) if pl.forall {
            case _: AttributeReference => true
            case Alias(_: AttributeReference, _) => false // renames change names
            case _ => false
          } => strip(ch, conds)
        case s: SubqueryAlias => strip(s.child, conds)
        case l: LogicalRelation => Some((l, conds))
        case _ => None
      }

    /** Every guard a candidate summary must pass to answer this shape;
      * see the object doc for the contract each line enforces.
      */
    private def answers(mv: MvDef, rel: LogicalRelation,
        gs: Seq[Expression], as: Seq[NamedExpression],
        conds: Seq[Expression]): Boolean =
      // staleness: decline when the base changed after registration —
      // the caller must refresh + re-register to re-enable the route
      // (mtime-memoized: an unchanged base revalidates with one
      // getFileStatus, not a listing per query)
      scala.util.Try(SkipRewrite.cachedEpoch(
          rel.relation.asInstanceOf[HadoopFsRelation].sparkSession,
          mv.sourcePath)).toOption.contains(mv.epoch) &&
        // grouping: bare dim columns only
        gs.forall {
          case a: AttributeReference => mv.dims.contains(a.name)
          case _ => false
        } &&
        // filters: dim references only, and DETERMINISTIC — a
        // nondeterministic predicate (rand() < p) references no columns
        // at all, so the dim check alone would admit it, but its value
        // is per-ROW, not a function of the group: applying it to MV
        // rows (one row per group) changes the sampled population
        conds.forall(c => c.deterministic &&
          c.references.forall(r => mv.dims.contains(r.name))) &&
        // aggregates: derivable from the summary
        as.forall {
          case a: AttributeReference => mv.dims.contains(a.name)
          case Alias(ae: AggregateExpression, _) => derivable(ae, mv)
          case Alias(a: AttributeReference, _) => mv.dims.contains(a.name)
          case _ => false
        }

    private def tryRewrite(agg: Aggregate, gs: Seq[Expression],
        as: Seq[NamedExpression], child: LogicalPlan): Option[LogicalPlan] =
      for {
        (rel, conds) <- strip(child, Seq.empty)
        // the scan must read EXACTLY the registered source: a multi-path
        // relation (spark.read.parquet(base, other)) that merely includes
        // it would lose the other paths' rows if rewritten to the summary
        p <- scanPaths(rel) match {
          case Seq(only) => Some(only)
          case _ => None
        }
        // tightest-wins among the source's registered summaries: the
        // fewest-dims candidate that answers re-aggregates the fewest
        // rows (sortBy is stable, so equal-arity ties keep registration
        // order — deterministic either way)
        mv <- MvCatalog.mvs
          .filter(_.sourcePath.stripSuffix("/") == p.stripSuffix("/"))
          .sortBy(_.dims.size)
          .find(answers(_, rel, gs, as, conds))
      } yield {
        val fresh = mv.mvPlan.newInstance()
        val byName = fresh.output.map(a => a.name -> a).toMap
        def remap(e: Expression): Expression = e.transform {
          case a: AttributeReference => byName(a.name)
        }
        val newChild = conds.foldRight(fresh: LogicalPlan)((c, p) =>
          Filter(remap(c), p))
        val newGroup = gs.map(remap)
        val newAggs: Seq[NamedExpression] = as.map {
          case a: AttributeReference =>
            Alias(byName(a.name), a.name)(exprId = a.exprId)
          case al @ Alias(a: AttributeReference, n) =>
            Alias(byName(a.name), n)(exprId = al.exprId)
          // AVG(x): one final double division of SUM of the exact
          // integral partials by SUM of the non-null counts (legacy
          // divide — Average's null-on-empty semantics). EXACT-OR-BETTER
          // vs the base path, not bit-identical in the extreme: Spark's
          // native Average accumulates a LongType sum in DOUBLE, so once
          // a group's cumulative sum exceeds 2^53 the base plan itself
          // carries rounding this exact-numerator form does not.
          case al @ Alias(ae: AggregateExpression, n)
              if ae.aggregateFunction.isInstanceOf[Average] =>
            val a = ae.aggregateFunction.asInstanceOf[Average]
              .child.asInstanceOf[AttributeReference]
            val num = Sum(byName(s"sum_${a.name}")).toAggregateExpression()
            val den = Sum(byName(s"cnt_${a.name}")).toAggregateExpression()
            Alias(Divide(
              Cast(num, org.apache.spark.sql.types.DoubleType),
              Cast(den, org.apache.spark.sql.types.DoubleType),
              EvalMode.LEGACY), n)(exprId = al.exprId)
          case al @ Alias(ae: AggregateExpression, n) =>
            val nf = ae.aggregateFunction match {
              // COUNT(x) before the generic COUNT(*) case: non-null
              // counts re-aggregate from the per-column cnt_<x>
              case Count(Seq(a: AttributeReference)) =>
                Sum(byName(s"cnt_${a.name}"))
              case _: Count => Sum(byName("cnt"))
              case Sum(a: AttributeReference, _) =>
                Sum(byName(s"sum_${a.name}"))
              // min-of-mins / max-of-maxes: exact for ANY orderable type
              // (unlike re-added double sums, extrema are order-stable)
              case Min(a: AttributeReference) => Min(byName(s"min_${a.name}"))
              case Max(a: AttributeReference) => Max(byName(s"max_${a.name}"))
              case other => throw new IllegalStateException(
                s"derivable() admitted $other")
            }
            Alias(ae.copy(aggregateFunction = nf), n)(exprId = al.exprId)
          case other => throw new IllegalStateException(
            s"match admitted $other")
        }
        logInfo(s"MV rewrite: aggregate over ${mv.sourcePath} served " +
          s"from the registered summary")
        Aggregate(newGroup, newAggs, newChild)
      }

    /** The summary schema carries this column (guards COUNT(x)/AVG(x)
      * against summaries registered before cnt_<col> existed).
      */
    private def hasCol(mv: MvDef, name: String): Boolean =
      mv.mvPlan.output.exists(_.name == name)

    private def derivable(ae: AggregateExpression, mv: MvDef): Boolean =
      !ae.isDistinct && ae.filter.isEmpty && (ae.aggregateFunction match {
        // non-null literals only: COUNT(NULL) is 0 per group, not the
        // group size SUM(cnt) would produce
        case Count(Seq(Literal(v, _))) if v != null => true
        case Count(Seq()) => true
        // COUNT(x) needs the per-column non-null count in the summary
        case Count(Seq(a: AttributeReference)) =>
          mv.sumCols.contains(a.name) && hasCol(mv, s"cnt_${a.name}")
        case Sum(a: AttributeReference, _) =>
          // integral partial sums only: re-adding double partials in a
          // different order is not bit-stable
          mv.sumCols.contains(a.name) &&
            a.dataType == org.apache.spark.sql.types.LongType
        // AVG(x) = SUM(sum_x)/SUM(cnt_x), exact only when the partial
        // sums are themselves exact — integral columns only, same bound
        // as SUM; a double column's Average is accumulation-order-
        // dependent and never rewrites
        case Average(a: AttributeReference, _) =>
          mv.sumCols.contains(a.name) &&
            a.dataType == org.apache.spark.sql.types.LongType &&
            hasCol(mv, s"sum_${a.name}") && hasCol(mv, s"cnt_${a.name}")
        case Min(a: AttributeReference) => mv.minMaxCols.contains(a.name)
        case Max(a: AttributeReference) => mv.minMaxCols.contains(a.name)
        case _ => false
      })
  }
}
