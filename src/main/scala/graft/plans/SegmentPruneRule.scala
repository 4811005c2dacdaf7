package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{NumericType, StringType}

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
  * top-level AND conjuncts are consulted; OR trees are ignored.
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
          case Some(path) if sidecarMtime(path) > 0 =>
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
    * conjunct is zone-map-answerable. */
  private def admitted(path: String, cond: Expression): Option[Seq[String]] = {
    val conjuncts = splitAnd(cond)
    val stringEq = conjuncts.collect {
      case EqualTo(a: AttributeReference, Literal(v, StringType)) if v != null =>
        (a.name, v.toString)
      case EqualTo(Literal(v, StringType), a: AttributeReference) if v != null =>
        (a.name, v.toString)
    }
    val numericBounds = collectNumericBounds(conjuncts)
    if (stringEq.isEmpty && numericBounds.isEmpty) return None

    val key = s"$path@${sidecarMtime(path)}|" +
      (stringEq.map(e => s"s:${e._1}=${e._2}") ++
        numericBounds.map(b => s"n:${b._1}∈[${b._2},${b._3}]")).sorted.mkString("&")
    Some(cache.computeIfAbsent(key, _ => {
      inRule.set(true)
      try {
        val lists =
          stringEq.map { case (d, v) =>
            SegmentStore.pruneSegments(spark, path, d, v).toSet } ++
          numericBounds.map { case (c, lo, hi) =>
            SegmentStore.pruneSegmentsNumericRange(spark, path, c, lo, hi).toSet }
        lists.reduce(_ intersect _).toSeq.sorted
      } finally inRule.set(false)
    }))
  }

  private def splitAnd(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitAnd(l) ++ splitAnd(r)
    case other     => Seq(other)
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
}
