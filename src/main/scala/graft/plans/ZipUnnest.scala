package graft.plans

import org.apache.spark.sql.catalyst.analysis.{UnresolvedAlias, UnresolvedAttribute, UnresolvedExtractValue, UnresolvedFunction, UnresolvedTableValuedFunction, UnresolvedTVFAliases}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, OneRowRelation, Project, SubqueryAlias, UnresolvedWith}
import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType}

/** DuckDB-dialect zipped/nested unnest for the SQL entry.
  *
  * DuckDB runs row-generating calls in SELECT position and ZIPS several of
  * them positionally — `SELECT generate_subscripts(xs, 1) AS i, unnest(xs)
  * AS x` emits one row per element carrying both the 1-based position and
  * the value, and `CAST(unnest(xs) AS DOUBLE)` nests the generator inside
  * a scalar expression. Spark's analyzer allows exactly one generator per
  * SELECT and refuses generators nested in expressions, so these shared
  * oracle spellings fail analysis even with `unnest` bound to Explode.
  *
  * This rewrite runs on the PARSED (unresolved) plan, before analysis:
  * a Project whose list contains zip calls is rewritten onto a single
  * hidden Generate —
  *
  *   explode(sequence(1, greatest(size(b1) .. size(bk)))) AS __graft_zip_i
  *
  * — with every `unnest(b)` replaced by `element_at(b, __graft_zip_i)`
  * (NULL out of bounds, Spark's try_element_at) and every
  * `generate_subscripts(b, 1)` by `CAST(__graft_zip_i AS BIGINT)`. This is
  * exactly DuckDB's zip contract: rows to the LONGEST list, shorter lists
  * padded with NULL, zero rows when every list is NULL/empty (the guarded
  * sequence, like the `range` shim, avoids Spark's auto-descending
  * `sequence(1, 0)`). Replacements happen in place, so arbitrary scalar
  * nesting above the call (CAST, arithmetic, `- 1`) is preserved.
  *
  * A SELECT whose only zip call is one bare top-level `unnest(b)` is left
  * untouched — the expression-registry Explode shim already runs it, and
  * keeping that plan shape avoids disturbing the queries it verified.
  */
object ZipUnnest {

  private val IdxName = "__graft_zip_i"

  private def fname(f: UnresolvedFunction): String =
    f.nameParts.map(_.toLowerCase).mkString(".")

  /** The zipped list of a DuckDB SELECT-position generator call; None for
    * anything this rewrite does not understand (which then surfaces as a
    * normal analysis error instead of silently diverging).
    */
  private def zipBase(e: Expression): Option[Expression] = e match {
    case f: UnresolvedFunction
        if fname(f) == "unnest" && f.arguments.size == 1 =>
      Some(f.arguments.head)
    case f: UnresolvedFunction
        if fname(f) == "generate_subscripts" && f.arguments.size == 2 &&
          f.arguments(1) == Literal(1) =>
      Some(f.arguments.head)
    case _ => None
  }

  private def stripAlias(e: Expression): Expression = e match {
    case a: Alias => a.child
    case u: UnresolvedAlias => u.child
    case other => other
  }

  private def emptyInts: Expression =
    Literal.create(Array.empty[Int], ArrayType(IntegerType, false))

  private def emptyLongs: Expression =
    Literal.create(Array.empty[Long], ArrayType(LongType, false))

  /** The row generator for a DuckDB FROM-position table function this
    * rewrite understands: `unnest(arr)` and the inclusive
    * `generate_series(a, b)` (empty when b < a — guarded because Spark's
    * sequence auto-descends).
    */
  private def tvfGenerator(name: String, args: Seq[Expression]): Option[Generator] =
    name match {
      case "unnest" if args.size == 1 => Some(Explode(args.head))
      case "generate_series" if args.size == 2 =>
        val a = Cast(args(0), LongType)
        val b = Cast(args(1), LongType)
        Some(Explode(If(LessThan(b, a), emptyLongs, new Sequence(a, b, None))))
      case _ => None
    }

  def rewrite(plan: LogicalPlan): LogicalPlan = exprPass(planPass(plan))

  /** DuckDB's 1-based (and negative-from-end) list subscript, applied to
    * every non-struct bracket extraction: `xs[2]` parses to an
    * UnresolvedExtractValue that Spark would resolve 0-BASED on arrays, so
    * the dialect entry re-expresses it as element_at (1-based on both
    * engines, NULL out of bounds like DuckDB). String-literal extractions
    * are left alone — that spelling is struct/map field access, identical
    * on both engines.
    */
  private def exprPass(plan: LogicalPlan): LogicalPlan = plan.transformUpWithSubqueries {
    case w: UnresolvedWith =>
      w.copy(cteRelations = w.cteRelations.map { case (name, rel, maxRec) =>
        (name, exprPass(rel).asInstanceOf[SubqueryAlias], maxRec)
      })
    case node => node.transformExpressionsUp {
      case UnresolvedExtractValue(child, extraction) if !(extraction match {
            case Literal(_, org.apache.spark.sql.types.StringType) => true
            case _ => false
          }) =>
        // the INT cast pins the list-index reading (element_at rejects a
        // BIGINT ordinal, and the dialect's integer subscripts are list
        // positions; string-keyed struct/map access stayed bracket-form
        // above)
        ElementAt(child, Cast(extraction, IntegerType), None,
          failOnError = false)
    }
  }

  private def planPass(plan: LogicalPlan): LogicalPlan = plan.transformUpWithSubqueries {
    // CTE definitions are innerChildren of the unresolved WITH node, which
    // plan transforms do NOT traverse — recurse into them explicitly (every
    // shared oracle text with a zipped unnest puts it inside a CTE)
    case w: UnresolvedWith =>
      w.copy(cteRelations = w.cteRelations.map { case (name, rel, maxRec) =>
        (name, planPass(rel).asInstanceOf[SubqueryAlias], maxRec)
      })
    // FROM-position table functions. DuckDB spells lateral row generation
    // as a FROM item — `FROM b, unnest(range(0, nseg)) AS u(i)` — with
    // implicit lateral correlation to the preceding items. Spark has no
    // unnest/generate_series TVF, so (bottom-up) the aliased TVF becomes a
    // one-row Generate first, and the enclosing comma-join then collapses
    // into a Generate OVER the left side — which is exactly LATERAL VIEW,
    // so correlated arguments resolve against the left plan and an
    // uncorrelated generator degenerates to the same cross product.
    case SubqueryAlias(alias,
        UnresolvedTVFAliases(_, UnresolvedTableValuedFunction(fnParts, args, _), colAliases))
        if fnParts.size == 1 && colAliases.size == 1 &&
          tvfGenerator(fnParts.head.toLowerCase, args).isDefined =>
      SubqueryAlias(alias,
        Generate(tvfGenerator(fnParts.head.toLowerCase, args).get,
          unrequiredChildIndex = Nil, outer = false, qualifier = None,
          generatorOutput = colAliases.map(UnresolvedAttribute(_)),
          OneRowRelation()))
    case Join(left, SubqueryAlias(alias, g @ Generate(_, _, _, _, _, OneRowRelation())),
        Inner, None, _) =>
      g.copy(qualifier = Some(alias.name), child = left)

    case p @ Project(plist, child) =>
      val calls = plist.flatMap(_.collect {
        case f: UnresolvedFunction if zipBase(f).isDefined => f
      })
      val bareSingleUnnest = calls.size == 1 && fname(calls.head) == "unnest" &&
        plist.exists(ne => stripAlias(ne) eq calls.head)
      if (calls.isEmpty || bareSingleUnnest) p
      else {
        val bases = calls.flatMap(zipBase).distinct
        val sizes = bases.map(b => Size(b): Expression)
        val longest = if (sizes.size == 1) sizes.head else Greatest(sizes)
        val rows = If(
          LessThanOrEqual(Coalesce(Seq(longest, Literal(0))), Literal(0)),
          emptyInts,
          new Sequence(Literal(1), longest, None))
        val idx = UnresolvedAttribute(IdxName)
        val newList = plist.map { ne =>
          ne.transformUp {
            case f: UnresolvedFunction if zipBase(f).isDefined =>
              if (fname(f) == "unnest")
                ElementAt(zipBase(f).get, idx, None, failOnError = false)
              else Cast(idx, LongType)
          } match {
            case n: NamedExpression => n
            case other => UnresolvedAlias(other)
          }
        }
        Project(newList,
          Generate(Explode(rows), unrequiredChildIndex = Nil, outer = false,
            qualifier = None, generatorOutput = Seq(UnresolvedAttribute(IdxName)),
            child))
      }
  }
}
