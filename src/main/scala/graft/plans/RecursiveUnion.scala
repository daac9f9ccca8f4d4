package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedRelation, UnresolvedSubqueryColumnAliases}
import org.apache.spark.sql.catalyst.plans.logical.{Distinct, LogicalPlan, SubqueryAlias, Union, UnresolvedWith}

/** DuckDB-semantics recursive CTEs with UNION (dedup) for the SQL entry.
  *
  * Spark 4 runs recursive CTEs natively only with UNION ALL; the UNION
  * spelling — where each iteration's rows are deduplicated against
  * everything produced so far and the loop stops when nothing NEW appears —
  * is the form every transitive-closure/connected-components oracle uses,
  * and its termination depends on that dedup (cycles make UNION ALL loop
  * forever). Rather than decline, the SQL entry executes the fixpoint as
  * SEMI-NAIVE iteration over DataFrames:
  *
  *   acc      = distinct(base)
  *   frontier = acc
  *   repeat:  next = distinct(step(frontier)) EXCEPT acc
  *            acc  = acc UNION ALL next          (disjoint, stays distinct)
  *            frontier = next                     until next is empty
  *
  * — exactly the working-table semantics DuckDB documents, and the classic
  * distributed transitive-closure shape: each round shuffles only the
  * frontier (not the closure), and `localCheckpoint` truncates the growing
  * lineage so round N's plan does not replay rounds 1..N-1. The recursive
  * reference is substituted with the ANALYZED frontier plan wrapped in a
  * SubqueryAlias of the CTE's name, so `r.a`-style qualified references
  * keep resolving.
  *
  * Scope guards, all declining to Spark's own error path rather than
  * diverging: only `base UNION step` bodies where the self-reference
  * appears in the step and not the base; anything else (UNION ALL —
  * Spark-native, mutual recursion, self-join of the recursive table)
  * passes through unchanged.
  */
object RecursiveUnion {

  private val MaxRounds = 512

  def run(spark: SparkSession, plan: LogicalPlan): LogicalPlan = plan match {
    case UnresolvedWith(child, ctes, true)
        // engage only when a UNION-dedup recursive definition is present
        // AND every self-referencing definition matches the supported
        // shape — a coexisting UNION ALL recursion is Spark-native and
        // must stay inside the WITH untouched
        if ctes.exists { case (name, rel, _) =>
          recursivePattern(name, rel.child).isDefined } &&
          ctes.forall { case (name, rel, _) =>
            !refersTo(rel.child, name) ||
              recursivePattern(name, rel.child).isDefined } =>
      // once any CTE is recursive, every definition is inlined (each body
      // with its predecessors already inlined), so fixpoint base/step plans
      // are self-contained when executed outside the WITH scope; the
      // recursive name maps to its MATERIALIZED (analyzed, checkpointed)
      // fixpoint result instead of a plan to re-evaluate
      var replacements = Map.empty[String, LogicalPlan]
      ctes.foreach { case (name, SubqueryAlias(_, body0), _) =>
        val body = substitute(body0, replacements)
        recursivePattern(name, body) match {
          case Some((aliases, base, step)) =>
            val acc = fixpoint(spark, name, aliases, base, step)
            replacements += name.toLowerCase -> acc.queryExecution.analyzed
          case None =>
            replacements += name.toLowerCase -> body
        }
      }
      substitute(child, replacements)
    case _ => plan
  }

  private def stripAliases(body: LogicalPlan): (Seq[String], LogicalPlan) =
    body match {
      case UnresolvedSubqueryColumnAliases(cols, inner) => (cols, inner)
      case other => (Nil, other)
    }

  /** base/step split of a `name AS (base UNION step)` body where only the
    * step refers back to `name`; None for every other shape.
    */
  private def recursivePattern(name: String, body: LogicalPlan)
      : Option[(Seq[String], LogicalPlan, LogicalPlan)] = {
    val (aliases, core) = stripAliases(body)
    core match {
      case Distinct(Union(Seq(base, step), false, false))
          if !refersTo(base, name) && refersTo(step, name) =>
        Some((aliases, base, step))
      case _ => None
    }
  }

  private def refersTo(plan: LogicalPlan, name: String): Boolean = {
    var found = false
    def walk(p: LogicalPlan): Unit = p.foreach {
      case UnresolvedRelation(parts, _, _)
          if parts.size == 1 && parts.head.equalsIgnoreCase(name) =>
        found = true
      case w: UnresolvedWith =>
        w.cteRelations.foreach { case (_, rel, _) => walk(rel) }
      case other =>
        other.subqueries.foreach(walk)
    }
    walk(plan)
    found
  }

  /** Replace single-part relation references by name (case-insensitive)
    * with already-materialized plans, aliased so qualified column
    * references keep resolving. Recurses through nested WITH inner
    * children the same way ZipUnnest does.
    */
  private def substitute(plan: LogicalPlan, repl: Map[String, LogicalPlan]): LogicalPlan =
    if (repl.isEmpty) plan
    else plan.transformUpWithSubqueries {
      case w: UnresolvedWith =>
        w.copy(cteRelations = w.cteRelations.map { case (n, rel, m) =>
          (n, substitute(rel, repl).asInstanceOf[SubqueryAlias], m)
        })
      case UnresolvedRelation(parts, _, _)
          if parts.size == 1 && repl.contains(parts.head.toLowerCase) =>
        SubqueryAlias(parts.head, repl(parts.head.toLowerCase))
    }

  private def fixpoint(spark: SparkSession, name: String, aliases: Seq[String],
      base: LogicalPlan, step: LogicalPlan): DataFrame = {
    // constraint propagation is scoped OFF for the loop: the same
    // checkpointed frontier attributes appear on both sides of the
    // except's join (self-reference), and Union's constraint rewrite
    // chokes mapping constraints across the re-identified copies (a pure
    // optimizer inference — disabling it affects no results)
    val key = "spark.sql.constraintPropagation.enabled"
    val old = spark.conf.getOption(key)
    spark.conf.set(key, "false")
    try fixpointLoop(spark, name, aliases, base, step)
    finally old match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  private def fixpointLoop(spark: SparkSession, name: String, aliases: Seq[String],
      base: LogicalPlan, step: LogicalPlan): DataFrame = {
    def df(p: LogicalPlan): DataFrame =
      org.apache.spark.sql.GraftRegistrar.ofRows(spark, p)
    val base0 = df(Distinct(base))
    var acc = (if (aliases.nonEmpty) base0.toDF(aliases: _*) else base0)
      .localCheckpoint(true)
    var frontier = acc
    var rounds = 0
    while (frontier.limit(1).count() > 0) {
      rounds += 1
      require(rounds <= MaxRounds,
        s"recursive CTE $name did not converge within $MaxRounds rounds")
      val stepPlan = substitute(step,
        Map(name.toLowerCase -> frontier.queryExecution.analyzed))
      val next = df(Distinct(stepPlan)).toDF(acc.columns: _*)
        .except(acc).localCheckpoint(true)
      if (next.limit(1).count() > 0) acc = acc.union(next).localCheckpoint(true)
      frontier = next
    }
    acc
  }
}
