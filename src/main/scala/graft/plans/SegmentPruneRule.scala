package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{NumericType, StringType, TimestampType}

import graft.pipeline.Pipeline
import graft.sink.{SegmentSink, SegmentStore}

/** Catalyst optimizer rule: AUTOMATIC zone-map segment pruning.
  *
  * [[SegmentStore.readPruned]]/[[SegmentStore.readPrunedNumeric]] prune
  * explicitly — the caller must know about the sidecar. This rule closes the
  * loop for plain `spark.read.parquet(store).filter(...)` users (and SQL-only
  * sessions via [[graft.functions.GraftExtensions]]): a Filter directly over
  * a segment-partitioned store whose `_graft_stats` sidecar covers a
  * predicate column gets `segment IN (admitted…)` injected, which Spark's
  * partition pruning turns into a directory-level scan cut — the same
  * mechanism Druid's broker uses segment metadata for at query routing.
  *
  * Soundness: a conjunct `dim = v` / numeric range only ever EXCLUDES
  * segments whose merged [min, max] cannot contain matching rows; segments
  * without stats coverage are kept (pruneSegments* are conservative). Only
  * top-level AND conjuncts are consulted. A conjunct that is itself a
  * string disjunction — `dim IN (a,b,…)` (or its optimized InSet form) or
  * `dim = a OR dim = b` on ONE column, both common shapes of Druid filter
  * JSON — admits the UNION of the per-value admissions (sound: any row
  * matching the disjunct matches one of the values); mixed-column OR trees
  * are ignored.
  *
  * Bounded planning cost: the sidecar is consulted once per distinct
  * (store, predicate, sidecar-mtime) — memoized — and never re-entered
  * (the prune query itself plans through this rule). Plans already
  * constraining `segment` are left untouched, which also makes the rewrite
  * a fixed point.
  */
class SegmentPruneRule(spark: SparkSession) extends Rule[LogicalPlan] {

  import SegmentPruneRule._

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (inRule.get()) plan
    else plan.transform {
      case f @ Filter(cond, rel: LogicalRelation)
          if segmentAttr(rel).isDefined &&
            !cond.references.exists(_.name == Pipeline.SegmentCol) =>
        rootPath(rel) match {
          case Some(path) =>
            admitted(path, cond) match {
              case Some(segs) =>
                val extra =
                  if (segs.isEmpty) Literal.FalseLiteral
                  else In(segmentAttr(rel).get,
                    segs.map(s => Literal.create(s, StringType)))
                Filter(And(cond, extra), rel)
              case None => f
            }
          case _ => f
        }
    }

  private def segmentAttr(rel: LogicalRelation): Option[AttributeReference] =
    rel.output.collectFirst {
      case a: AttributeReference
          if a.name == Pipeline.SegmentCol && a.dataType == StringType => a
    }

  /** Single-root HadoopFsRelation path; never the sidecar's own scan. */
  private def rootPath(rel: LogicalRelation): Option[String] = rel.relation match {
    case hfs: HadoopFsRelation =>
      hfs.location.rootPaths.toList match {
        case p :: Nil if !p.toString.contains(SegmentSink.StatsDir) =>
          Some(p.toString)
        case _ => None
      }
    case _ => None
  }

  /** Sidecar dir modification time (0 = absent) — cache-key ingredient so a
    * regenerated sidecar invalidates memoized prunes. */
  private def sidecarMtime(path: String): Long = {
    val p = new org.apache.hadoop.fs.Path(s"$path/${SegmentSink.StatsDir}")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    try { if (fs.exists(p)) math.max(fs.getFileStatus(p).getModificationTime, 1L) else 0L }
    catch { case _: java.io.IOException => 0L }
  }

  /** Intersection of per-conjunct admitted segment lists; None when no
    * conjunct is answerable. Dim/metric conjuncts need the zone-map sidecar;
    * a time-interval conjunct on the bucket column needs only the segment
    * layout itself (dir names encode chunk starts — the Druid `intervals`
    * clause answered at planning, like the broker's segment timeline).
    *
    * No filesystem work happens unless some conjunct is answerable. The memo
    * key carries everything the answer depends on: the sidecar mtime (dim /
    * numeric prunes), the current segment listing (time prunes — a NEW chunk
    * appearing must invalidate, or its rows would silently vanish behind a
    * stale IN list), and the session timezone (dir names parse in it). */
  private def admitted(path: String, cond: Expression): Option[Seq[String]] = {
    val conjuncts = splitAnd(cond)
    val stringEqAll = conjuncts.collect {
      case EqualTo(a: AttributeReference, Literal(v, StringType)) if v != null =>
        (a.name, v.toString)
      case EqualTo(Literal(v, StringType), a: AttributeReference) if v != null =>
        (a.name, v.toString)
      // the filter DSL compiles selector/equality to `<=>` (never-NULL
      // contract): with a NON-NULL literal its admission set is the same
      // as EqualTo's (a null dim value matches neither, and zone-map
      // ranges never cover nulls) — without this, native-query selector
      // filters over store reads would silently skip pruning
      case EqualNullSafe(a: AttributeReference, Literal(v, StringType))
          if v != null => (a.name, v.toString)
      case EqualNullSafe(Literal(v, StringType), a: AttributeReference)
          if v != null => (a.name, v.toString)
    }
    val stringInAll = collectStringDisjunctions(conjuncts)
    val numericBoundsAll = collectNumericBounds(conjuncts)
    val tsBounds = collectTsBounds(conjuncts)
    if (stringEqAll.isEmpty && stringInAll.isEmpty && numericBoundsAll.isEmpty &&
        tsBounds.isEmpty)
      return None // nothing answerable — zero filesystem cost

    val mtime = sidecarMtime(path)
    val stringEq = if (mtime > 0) stringEqAll else Nil
    val stringIn = if (mtime > 0) stringInAll else Nil
    val numericBounds = if (mtime > 0) numericBoundsAll else Nil
    if (stringEq.isEmpty && stringIn.isEmpty && numericBounds.isEmpty &&
        tsBounds.isEmpty) return None

    // parse dir names in the zone they were WRITTEN under (the sink's
    // marker; session-zone fallback for pre-marker stores) — a reader
    // session in a different zone would otherwise silently prune valid
    // boundary segments (review finding r7)
    val tz = SegmentStore.writerZone(spark, path).getId
    val names = SegmentStore.listSegmentDirs(spark, path)
    if (names.isEmpty) return None
    val key = s"$path@$mtime@$tz@${names.size}:${names.hashCode}|" +
      (stringEq.map(e => s"s:${e._1}=${e._2}") ++
        stringIn.map(e => s"i:${e._1}∈{${e._2.sorted.mkString(",")}}") ++
        numericBounds.map(b => s"n:${b._1}∈[${b._2},${b._3}]") ++
        tsBounds.map(b => s"t:[${b._1},${b._2}]")).sorted.mkString("&")
    // bound the memo: distinct LITERALS create distinct keys (think a
    // dashboard's moving now()-relative ts ranges) — reset wholesale rather
    // than LRU-track; recompute cost is one small sidecar/listing job
    if (cache.size() > 4096) cache.clear()
    val segs = cache.computeIfAbsent(key, _ => {
      inRule.set(true)
      try {
        val lists =
          stringEq.map { case (d, v) =>
            SegmentStore.pruneSegments(spark, path, d, v).toSet } ++
          // disjunction: union of per-value admissions (each conservative)
          stringIn.map { case (d, vs) =>
            vs.map(v => SegmentStore.pruneSegments(spark, path, d, v).toSet)
              .reduce(_ union _) } ++
          numericBounds.map { case (c, lo, hi) =>
            SegmentStore.pruneSegmentsNumericRange(spark, path, c, lo, hi).toSet } ++
          tsBounds.flatMap { case (lo, hi) => timeAdmitted(names, tz, lo, hi) }
        if (lists.isEmpty) AllSegments
        else {
          val admit = lists.reduce(_ intersect _)
          // everything admitted → no rewrite: a full-store IN list would
          // bloat the plan (thousands of chunks) for zero pruning
          if (names.forall(admit)) AllSegments
          else admit.toSeq.sorted
        }
      } finally inRule.set(false)
    })
    if (segs eq AllSegments) None else Some(segs)
  }

  /** Segments whose chunk can overlap [lo, hi] micros on the bucket column.
    * A chunk's rows satisfy start_i ≤ ts < start_{i+1} (equal fixed widths
    * per store; gaps only over-admit), so: admit iff start_i ≤ hi and the
    * NEXT chunk's start > lo (last chunk: unbounded above). Unparseable dir
    * names (not a graft store after all) → no time answer. */
  private def timeAdmitted(names: Seq[String], tz: String,
      lo: Long, hi: Long): Option[Set[String]] = {
    val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd'T'HH.mm.ss")
    fmt.setTimeZone(java.util.TimeZone.getTimeZone(tz))
    val starts = names.map { n =>
      try Some(fmt.parse(n).getTime * 1000L) catch { case _: Exception => None }
    }
    if (names.isEmpty || starts.exists(_.isEmpty)) return None
    val s = starts.map(_.get)
    Some(names.indices.collect {
      case i if s(i) <= hi && (i == names.size - 1 || s(i + 1) > lo) => names(i)
    }.toSet)
  }

  /** [lo, hi] micros over the bucket column from timestamp comparisons. */
  private def collectTsBounds(conjuncts: Seq[Expression]): Option[(Long, Long)] = {
    def tsAttr(e: Expression): Boolean = e match {
      case a: AttributeReference =>
        a.name == Pipeline.TsCol && a.dataType == TimestampType
      case _ => false
    }
    def micros(l: Literal): Option[Long] = l.value match {
      case v: java.lang.Long if l.dataType == TimestampType => Some(v)
      case _ => None
    }
    var lo = Long.MinValue; var hi = Long.MaxValue; var seen = false
    conjuncts.foreach {
      case EqualTo(e, l: Literal) if tsAttr(e) =>
        micros(l).foreach { v => lo = math.max(lo, v); hi = math.min(hi, v); seen = true }
      case EqualTo(l: Literal, e) if tsAttr(e) =>
        micros(l).foreach { v => lo = math.max(lo, v); hi = math.min(hi, v); seen = true }
      case GreaterThanOrEqual(e, l: Literal) if tsAttr(e) =>
        micros(l).foreach { v => lo = math.max(lo, v); seen = true }
      case GreaterThan(e, l: Literal) if tsAttr(e) =>
        micros(l).foreach { v => lo = math.max(lo, v); seen = true }
      case LessThanOrEqual(e, l: Literal) if tsAttr(e) =>
        micros(l).foreach { v => hi = math.min(hi, v); seen = true }
      case LessThan(e, l: Literal) if tsAttr(e) =>
        micros(l).foreach { v => hi = math.min(hi, v); seen = true }
      case GreaterThanOrEqual(l: Literal, e) if tsAttr(e) =>
        micros(l).foreach { v => hi = math.min(hi, v); seen = true }
      case GreaterThan(l: Literal, e) if tsAttr(e) =>
        micros(l).foreach { v => hi = math.min(hi, v); seen = true }
      case LessThanOrEqual(l: Literal, e) if tsAttr(e) =>
        micros(l).foreach { v => lo = math.max(lo, v); seen = true }
      case LessThan(l: Literal, e) if tsAttr(e) =>
        micros(l).foreach { v => lo = math.max(lo, v); seen = true }
      case _ => ()
    }
    if (seen) Some((lo, hi)) else None
  }

  private def splitAnd(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitAnd(l) ++ splitAnd(r)
    case other     => Seq(other)
  }

  /** Single-column string disjunctions: `dim IN (a,b,…)`, its optimized
    * `InSet` form, and `dim = a OR dim = b [OR …]` Or-trees whose every
    * leaf is an equality on the SAME string column. Null values make the
    * conjunct unanswerable (null never matches an equality, but excluding
    * on it would be wrong for the IN-list's other values only if we
    * dropped them — simplest sound rule: skip). */
  private def collectStringDisjunctions(
      conjuncts: Seq[Expression]): Seq[(String, Seq[String])] = {
    def strLit(e: Expression): Option[String] = e match {
      case Literal(v, StringType) if v != null => Some(v.toString)
      case _ => None
    }
    def orLeaves(e: Expression): Seq[Expression] = e match {
      case Or(l, r) => orLeaves(l) ++ orLeaves(r)
      case other    => Seq(other)
    }
    conjuncts.flatMap {
      case In(a: AttributeReference, vs)
          if a.dataType == StringType && vs.nonEmpty &&
            vs.forall(strLit(_).isDefined) =>
        Some(a.name -> vs.flatMap(strLit))
      case InSet(a: AttributeReference, hset)
          if a.dataType == StringType && hset.nonEmpty && !hset.contains(null) =>
        Some(a.name -> hset.toSeq.map(_.toString))
      case o @ Or(_, _) =>
        val eqs = orLeaves(o).map {
          case EqualTo(a: AttributeReference, l: Literal)
              if a.dataType == StringType => strLit(l).map(a.name -> _)
          case EqualTo(l: Literal, a: AttributeReference)
              if a.dataType == StringType => strLit(l).map(a.name -> _)
          // `<=>` with a non-null literal — same admission as EqualTo
          case EqualNullSafe(a: AttributeReference, l: Literal)
              if a.dataType == StringType => strLit(l).map(a.name -> _)
          case EqualNullSafe(l: Literal, a: AttributeReference)
              if a.dataType == StringType => strLit(l).map(a.name -> _)
          case _ => None
        }
        if (eqs.forall(_.isDefined) &&
            eqs.flatten.map(_._1).distinct.size == 1)
          Some(eqs.flatten.head._1 -> eqs.flatten.map(_._2))
        else None
      case _ => None
    }
  }

  /** Per-attribute [lo, hi] from numeric comparisons with literals —
    * inclusive bounds (widening is sound: it only admits more segments). */
  private def collectNumericBounds(
      conjuncts: Seq[Expression]): Seq[(String, Double, Double)] = {
    def num(l: Literal): Option[Double] = l.value match {
      case null      => None
      case n: Number => Some(n.doubleValue())
      case d: org.apache.spark.sql.types.Decimal => Some(d.toDouble)
      case _         => None
    }
    def numericAttr(e: Expression): Option[String] = e match {
      case a: AttributeReference if a.dataType.isInstanceOf[NumericType] => Some(a.name)
      case _ => None
    }
    val bounds = scala.collection.mutable.Map.empty[String, (Double, Double)]
    def tighten(name: String, lo: Double, hi: Double): Unit = {
      val (clo, chi) = bounds.getOrElse(name,
        (Double.NegativeInfinity, Double.PositiveInfinity))
      bounds(name) = (math.max(clo, lo), math.min(chi, hi))
    }
    conjuncts.foreach {
      case EqualTo(e, l: Literal) =>
        for (a <- numericAttr(e); v <- num(l)) tighten(a, v, v)
      case EqualTo(l: Literal, e) =>
        for (a <- numericAttr(e); v <- num(l)) tighten(a, v, v)
      case GreaterThanOrEqual(e, l: Literal) =>
        for (a <- numericAttr(e); v <- num(l)) tighten(a, v, Double.PositiveInfinity)
      case GreaterThan(e, l: Literal) =>
        for (a <- numericAttr(e); v <- num(l)) tighten(a, v, Double.PositiveInfinity)
      case LessThanOrEqual(e, l: Literal) =>
        for (a <- numericAttr(e); v <- num(l)) tighten(a, Double.NegativeInfinity, v)
      case LessThan(e, l: Literal) =>
        for (a <- numericAttr(e); v <- num(l)) tighten(a, Double.NegativeInfinity, v)
      case GreaterThanOrEqual(l: Literal, e) =>
        for (a <- numericAttr(e); v <- num(l)) tighten(a, Double.NegativeInfinity, v)
      case GreaterThan(l: Literal, e) =>
        for (a <- numericAttr(e); v <- num(l)) tighten(a, Double.NegativeInfinity, v)
      case LessThanOrEqual(l: Literal, e) =>
        for (a <- numericAttr(e); v <- num(l)) tighten(a, v, Double.PositiveInfinity)
      case LessThan(l: Literal, e) =>
        for (a <- numericAttr(e); v <- num(l)) tighten(a, v, Double.PositiveInfinity)
      case _ => ()
    }
    bounds.toSeq.map { case (n, (lo, hi)) => (n, lo, hi) }
  }
}

object SegmentPruneRule {
  /** The prune query must not re-enter the rule (its own stats scan is a
    * Filter over parquet). */
  private val inRule: ThreadLocal[java.lang.Boolean] =
    ThreadLocal.withInitial[java.lang.Boolean](() => java.lang.Boolean.FALSE)

  /** (path, predicate, sidecar-mtime) → admitted segments. Bounded: distinct
    * stores × distinct predicates actually planned. */
  private val cache = new ConcurrentHashMap[String, Seq[String]]()

  /** Sentinel: every prune was conservative (keep-all) — no rewrite, cached
    * so re-optimization doesn't recompute. */
  private[plans] val AllSegments: Seq[String] = Seq(" __all__")
}
