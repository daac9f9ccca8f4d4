package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** TRANSPARENT DATA SKIPPING: a Catalyst optimizer rule that reroutes a
  * filtered scan of a registered base table onto the standing zone-map /
  * bloom copy ([[graft.ops.ZoneMap]]) — [[MvRewrite]]'s catalog+rule
  * pattern applied to filters instead of aggregates. Callers keep
  * writing `spark.read.parquet(base).filter(key between …)`; the planner
  * serves the ones a committed skipping layout can answer by reading
  * ONLY the routed bucket partitions.
  *
  * Reference behavior: the POC filters by scanning the whole collection
  * in process (`POC/backend/main.py`); at 100 TB selective predicates
  * must become metadata-routed partial reads, and — like the MV rule —
  * the routing must be AUTOMATIC, not an opt-in API the caller has to
  * remember ([[graft.ops.ZoneMap.rangeQuery]] remains the explicit
  * form; this rule makes plain DataFrame/SQL text hit the same layout).
  *
  * Matching contract (conservative — a miss costs a scan, a wrong match
  * costs correctness):
  *  - the fragment is Filter → (pruning Project | SubqueryAlias)* →
  *    single-path parquet scan of the registered source;
  *  - the filter is DETERMINISTIC (a rand() conjunct is per-row state:
  *    re-evaluating it over the re-clustered copy samples a different
  *    population, and the rewritten Filter re-applies the whole
  *    predicate);
  *  - at least one top-level conjunct bounds the registered key column
  *    (>, >=, <, <=, =, or IN against integral/DATE/TIMESTAMP literals —
  *    date keys route via their epoch-days/micros literal form) or
  *    equates/INs the registered bloom column against integral literals —
  *    those conjuncts drive the routing; every other conjunct simply
  *    rides along and is re-applied exactly;
  *  - the base path's CONTENT EPOCH still matches the one captured at
  *    registration (file names + sizes + mtimes): an append or rewrite
  *    of the base after the copy was built makes the rule decline
  *    rather than serve stale rows — staleness is checked, not asserted;
  *  - the copy's column names and types match the scan output exactly.
  *
  * The rewrite substitutes ONLY the relation leaf: the routed read is
  * re-aliased under the original scan's exprIds, so the Filter (and any
  * pruning Projects between) re-resolve unchanged, and the predicate is
  * re-applied verbatim — routing must merely be a SUPERSET of the
  * matching rows, which the zone min/max guarantee provides for range
  * conjuncts and the bloom's no-false-negative contract provides for
  * point conjuncts. Correctness therefore never depends on zone
  * tightness; only the pruning ratio does.
  *
  * The zone table (n_buckets rows) is collected once per committed
  * version and cached ([[graft.ops.ZoneMap.zoneRows]]); a bloom probe
  * runs one (n_buckets × k)-bounded job at plan time — the same budget
  * the explicit serve pays, spent by the planner instead of the caller.
  */
object SkipRewrite {

  /** One registered skipping layout for `sourcePath`, built at `dir` by
    * [[graft.ops.ZoneMap.build]] (clustered on `keyCol`, optional bloom
    * over `bloomCol`). `epoch` = the base path's content signature at
    * registration.
    */
  final case class SkipDef(sourcePath: String, dir: String, keyCol: String,
      bloomCol: Option[String], epoch: String)

  object SkipCatalog {
    @volatile private[graft] var defs: Seq[SkipDef] = Seq.empty
    def register(d: SkipDef): Unit = synchronized {
      defs = defs.filterNot(_.sourcePath == d.sourcePath) :+ d
    }
    def clear(): Unit = synchronized { defs = Seq.empty }
  }

  /** Content epoch of a base path: sorted (name, size, mtime) of its
    * data files (or the file itself), hashed. One metadata listing —
    * the same class of work Spark's own file index pays per query — so
    * the staleness check adds no data IO.
    */
  def pathEpoch(spark: SparkSession, path: String): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a pointer-protocol table has no plain dir: registration there is
    // for the forget CASCADE only (nothing scans the bare path, so the
    // rule can never route it) — a stable sentinel keeps register() total
    if (!fs.exists(p)) return "absent"
    fullListings.incrementAndGet()
    val st = fs.getFileStatus(p)
    val files =
      if (st.isFile) Array(st)
      else fs.listStatus(p).filter(s => s.isFile &&
        !s.getPath.getName.startsWith("_") &&
        !s.getPath.getName.startsWith("."))
    val sig = files
      .map(s => s"${s.getPath.getName}:${s.getLen}:${s.getModificationTime}")
      .sorted.mkString("\n")
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(sig.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
  }

  /** Full directory listings performed since JVM start — the test/probe
    * view of the epoch cache's effectiveness (one listing across N
    * matched queries against an unchanged base, not one per query).
    */
  private[graft] val fullListings = new java.util.concurrent.atomic.AtomicLong()

  private val epochCache =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, String)]()

  /** [[pathEpoch]] memoized on the root's OWN modification time: adding
    * or replacing a data file updates the directory mtime (every write
    * path — Spark's committers included — creates/removes entries), so
    * an unchanged mtime revalidates the cached epoch with ONE
    * getFileStatus instead of a full listing. Against an object store
    * with 10⁵ files this turns the per-query staleness check from a
    * driver stall into a single metadata HEAD. The full listing re-runs
    * whenever the mtime moved — staleness detection is never weaker than
    * the uncached form, only cheaper on the unchanged path. (Filesystems
    * with coarse mtime granularity could alias a same-instant change;
    * HDFS/S3/Linux report millisecond or finer.)
    */
  def cachedEpoch(spark: SparkSession, path: String): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) { epochCache.remove(path); return "absent" }
    val mt = fs.getFileStatus(p).getModificationTime
    val hit = epochCache.get(path)
    if (hit != null && hit._1 == mt) hit._2
    else {
      val e = pathEpoch(spark, path)
      epochCache.put(path, (mt, e))
      e
    }
  }

  /** Register the committed layout at `dir` as the skipping copy of
    * `sourcePath` (idempotent per source; captures the epoch NOW — call
    * again after rebuilding the copy from a changed base).
    */
  def register(spark: SparkSession, sourcePath: String, dir: String,
      keyCol: String, bloomCol: Option[String] = None): Unit = {
    org.apache.spark.sql.GraftRegistrar.register(spark)
    SkipCatalog.register(SkipDef(sourcePath, dir, keyCol, bloomCol,
      freshEpoch(spark, sourcePath)))
  }

  /** Fresh listing at registration (never a stale memo), priming the
    * mtime cache so the first matched query revalidates cheaply. Both
    * rewrite catalogs capture their registration epoch through this.
    */
  private[plans] def freshEpoch(spark: SparkSession, path: String): String = {
    epochCache.remove(path)
    cachedEpoch(spark, path)
  }

  object Rule extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan =
      if (SkipCatalog.defs.isEmpty) plan
      else plan.transformUp {
        case f @ Filter(cond, child) if cond.deterministic =>
          tryRewrite(cond, child).map(Filter(cond, _)).getOrElse(f)
      }

    private def singleScanPath(l: LogicalRelation): Option[String] =
      l.relation match {
        case h: HadoopFsRelation =>
          h.location.rootPaths.map(_.toUri.getPath) match {
            case Seq(p) => Some(p)
            case _ => None
          }
        case _ => None
      }

    /** The one relation under pruning Projects / SubqueryAliases; None
      * if any other operator (a join, an agg, a generator) intervenes.
      */
    private def findRel(p: LogicalPlan): Option[LogicalRelation] = p match {
      case l: LogicalRelation => Some(l)
      case Project(pl, ch) if pl.forall(_.isInstanceOf[AttributeReference]) =>
        findRel(ch)
      case s: SubqueryAlias => findRel(s.child)
      case _ => None
    }

    private def litLong(v: Any): Option[Long] = v match {
      case x: Byte => Some(x.toLong)
      case x: Short => Some(x.toLong)
      case x: Int => Some(x.toLong)
      case x: Long => Some(x)
      case _ => None // fractional comparisons have their own rounding
    }

    private def splitAnd(e: Expression): Seq[Expression] = e match {
      case And(a, b) => splitAnd(a) ++ splitAnd(b)
      case other => Seq(other)
    }

    /** IN-list literals in the key's integral form, when EVERY element
      * is one (a non-literal element — a subquery, another column —
      * declines the whole list; routing must be provably a superset).
      * Handles both the parsed `In` and the optimizer's `InSet` form
      * (OptimizeIn converts past the conversion threshold), capped at
      * 256 values — past that a range route or full scan is the better
      * plan anyway, and the per-value bloom probe stays bounded.
      */
    private def inLongs(vs: Seq[Any]): Option[Seq[Long]] = {
      val ls = vs.flatMap(litLong)
      if (ls.size == vs.size && ls.nonEmpty && ls.size <= 256) Some(ls)
      else None
    }

    final case class Route(lo: Option[Long], hi: Option[Long],
        inVals: Option[Seq[Long]], bloomVals: Option[Seq[Long]]) {
      def routable: Boolean =
        lo.isDefined || hi.isDefined || inVals.isDefined ||
          bloomVals.isDefined
    }

    /** (lo, hi) bounds and IN-list the top-level conjuncts place on
      * `key`, and the point/IN values they place on `bloom`. Saturating
      * tighten — multiple conjuncts intersect; conjuncts on other
      * columns are ignored (they re-apply in the Filter).
      */
    private def routing(conds: Seq[Expression], key: String,
        bloom: Option[String]): Route = {
      var lo: Option[Long] = None
      var hi: Option[Long] = None
      var inv: Option[Seq[Long]] = None
      var bv: Option[Seq[Long]] = None
      def tlo(v: Long): Unit = lo = Some(lo.fold(v)(math.max(_, v)))
      def thi(v: Long): Unit = hi = Some(hi.fold(v)(math.min(_, v)))
      def tin(vs: Seq[Long]): Unit =
        inv = Some(inv.fold(vs)(_.toSet.intersect(vs.toSet).toSeq))
      def isK(a: AttributeReference) = a.name == key
      conds.foreach {
        case In(a: AttributeReference, list)
          if isK(a) && list.forall(_.isInstanceOf[Literal]) =>
          inLongs(list.map(_.asInstanceOf[Literal].value)).foreach(tin)
        case InSet(a: AttributeReference, hset) if isK(a) =>
          inLongs(hset.toSeq).foreach(tin)
        case In(a: AttributeReference, list)
          if bloom.contains(a.name) &&
            list.forall(_.isInstanceOf[Literal]) =>
          inLongs(list.map(_.asInstanceOf[Literal].value))
            .foreach(vs => bv = Some(vs))
        case InSet(a: AttributeReference, hset) if bloom.contains(a.name) =>
          inLongs(hset.toSeq).foreach(vs => bv = Some(vs))
        case GreaterThanOrEqual(a: AttributeReference, Literal(v, _))
          if isK(a) => litLong(v).foreach(tlo)
        case GreaterThan(a: AttributeReference, Literal(v, _))
          if isK(a) => litLong(v).foreach(x => tlo(x + 1))
        case LessThanOrEqual(a: AttributeReference, Literal(v, _))
          if isK(a) => litLong(v).foreach(thi)
        case LessThan(a: AttributeReference, Literal(v, _))
          if isK(a) => litLong(v).foreach(x => thi(x - 1))
        case EqualTo(a: AttributeReference, Literal(v, _))
          if isK(a) => litLong(v).foreach { x => tlo(x); thi(x) }
        case GreaterThanOrEqual(Literal(v, _), a: AttributeReference)
          if isK(a) => litLong(v).foreach(thi)
        case GreaterThan(Literal(v, _), a: AttributeReference)
          if isK(a) => litLong(v).foreach(x => thi(x - 1))
        case LessThanOrEqual(Literal(v, _), a: AttributeReference)
          if isK(a) => litLong(v).foreach(tlo)
        case LessThan(Literal(v, _), a: AttributeReference)
          if isK(a) => litLong(v).foreach(x => tlo(x + 1))
        case EqualTo(Literal(v, _), a: AttributeReference)
          if isK(a) => litLong(v).foreach { x => tlo(x); thi(x) }
        case EqualTo(a: AttributeReference, Literal(v, _))
          if bloom.contains(a.name) => bv = litLong(v).map(Seq(_))
        case EqualTo(Literal(v, _), a: AttributeReference)
          if bloom.contains(a.name) => bv = litLong(v).map(Seq(_))
        case _ => // other conjuncts ride along, re-applied by the Filter
      }
      Route(lo, hi, inv, bv)
    }

    private def tryRewrite(cond: Expression,
        child: LogicalPlan): Option[LogicalPlan] =
      for {
        rel <- findRel(child)
        p <- singleScanPath(rel)
        sd <- SkipCatalog.defs.find(
          _.sourcePath.stripSuffix("/") == p.stripSuffix("/"))
        h = rel.relation.asInstanceOf[HadoopFsRelation]
        spark = h.sparkSession
        // staleness: the copy answers for THIS base content only (a
        // vanished/unlistable base declines rather than failing planning);
        // the epoch is mtime-memoized — an unchanged base revalidates
        // with one getFileStatus, not a listing per query
        if scala.util.Try(cachedEpoch(spark, sd.sourcePath))
          .toOption.contains(sd.epoch)
        r = routing(splitAnd(cond), sd.keyCol, sd.bloomCol)
        if r.routable
        routed = graft.ops.ZoneMap.routedData(spark, sd.dir, r.lo, r.hi,
            r.bloomVals, r.inVals)
          .queryExecution.analyzed
        byName = routed.output.map(a => a.name -> a).toMap
        // the copy must supply every scan column, same name + type
        if rel.output.forall(a =>
          byName.get(a.name).exists(_.dataType == a.dataType))
      } yield {
        logInfo(s"skip rewrite: filtered scan of ${sd.sourcePath} served " +
          s"from the zone-mapped copy (lo=${r.lo}, hi=${r.hi}, " +
          s"in=${r.inVals.map(_.size)}, bloom=${r.bloomVals.map(_.size)})")
        val replacement = Project(rel.output.map(a =>
          Alias(byName(a.name), a.name)(exprId = a.exprId)), routed)
        child.transformUp {
          case l: LogicalRelation if l eq rel => replacement
        }
      }
  }
}
