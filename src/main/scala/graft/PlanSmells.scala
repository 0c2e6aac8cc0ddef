package graft

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Deduplicate, EventTimeWatermark, Join, LogicalPlan, Window}

/** Structural plan-smell detectors shared by the [[Explain]] auditor and
  * the seeded smell fuzz ([[SmellFuzzSpec]]) — extracted so a planted
  * violation can be asserted against in tests, not just eyeballed in
  * the audit log.
  */
object PlanSmells {

  /** Known dataset-bounded dictionary columns (3 returnflags, 5
    * segments/priorities, 20 sources, 10 labels, 5 langs, 2
    * linestatuses). A Window partitioned ONLY by these funnels the
    * whole SF-scaled input through that many tasks — the r12/r13 rule
    * is that such scans go through
    * [[operators.GlobalOrder.groupedRowNumber]] / `groupedCumSum`.
    */
  val boundedKeys: Set[String] = Set("l_returnflag", "l_linestatus",
    "c_mktsegment", "o_orderpriority", "label", "source", "lang", "grp")

  /** Unpartitioned Window: the whole frame through ONE task (the r11
    * de-globalization rule — global ranks go through
    * [[operators.GlobalOrder]] instead).
    */
  def globalWindow(analyzed: LogicalPlan): Boolean =
    analyzed.collectFirst {
      case w: Window if w.partitionSpec.isEmpty => w
    }.nonEmpty

  /** exprId → root column name through Alias-of-attribute chains, built
    * bottom-up so transitive aliases (`l_returnflag AS x` … `x AS y`)
    * resolve in one pass. This is what makes the bounded-key rule
    * ALIAS-TRANSPARENT: before r14 the check compared the partition
    * attribute's surface name against [[boundedKeys]], so any fresh
    * alias silently escaped detection (the r13 fuzz finding this module
    * exists to close). Aliases of computed expressions are left
    * unresolved by design — a derived key's cardinality is not the
    * source column's.
    */
  private def aliasRoots(plan: LogicalPlan): Map[Long, String] = {
    val roots = scala.collection.mutable.Map.empty[Long, String]
    plan.foreachUp { node =>
      node.expressions.foreach(_.foreach {
        case a: Alias =>
          a.child match {
            case ar: AttributeReference =>
              roots(a.exprId.id) = roots.getOrElse(ar.exprId.id, ar.name)
            case _ => ()
          }
        case _ => ()
      })
    }
    roots.toMap
  }

  /** True when EVERY leaf-to-node path of `p` passes through an
    * Aggregate — i.e. the aggregate has provably collapsed the
    * SF-scaled input before the window sees it. The weaker
    * any-Aggregate-below check this replaces (r13) was exploitable: a
    * bounded-key window over the FACT side of a join whose OTHER side
    * aggregated would have been exempted for exactly the smell the
    * rule targets.
    */
  private def aggregateDominates(p: LogicalPlan): Boolean = p match {
    case _: Aggregate => true
    case leaf if leaf.children.isEmpty => false
    case other => other.children.forall(aggregateDominates)
  }

  /** Bounded-cardinality-key window over an SF-scaled frame, seen
    * through alias chains; exempt only when an Aggregate dominates the
    * window's input.
    */
  def boundedKeyWindow(analyzed: LogicalPlan): Boolean = {
    val roots = aliasRoots(analyzed)
    analyzed.collectFirst {
      case w: Window
          if w.partitionSpec.nonEmpty &&
            w.partitionSpec.forall {
              case a: Attribute =>
                boundedKeys.contains(roots.getOrElse(a.exprId.id, a.name))
              case _ => false
            } && !aggregateDominates(w.child) => w
    }.nonEmpty
  }

  // ------------------------------------------------- streaming-state smells
  //
  // The batch smells above guard plan SHAPE (task funnels); these guard
  // streaming STATE growth — the axis that kills an unbounded 100 TB/day
  // source. All three run on the ANALYZED logical plan of a streaming
  // DataFrame (before writeStream), so the audit costs nothing at runtime.

  private def hasWatermark(p: LogicalPlan): Boolean =
    p.collectFirst { case e: EventTimeWatermark => e }.nonEmpty

  /** exprId chain through pure Alias-of-attribute renames, down to the
    * terminal attribute id — the streaming analogue of [[aliasRoots]],
    * kept id-typed so "raw source column" is decidable (a NAME match
    * cannot distinguish `user_id` from `hash(user_id) AS user_id`).
    */
  private def resolvesToLeaf(id: Long, plan: LogicalPlan): Boolean = {
    val step = scala.collection.mutable.Map.empty[Long, Long]
    plan.foreachUp { node =>
      node.expressions.foreach(_.foreach {
        case a: Alias => a.child match {
          case ar: AttributeReference => step(a.exprId.id) = ar.exprId.id
          case _ => ()
        }
        case _ => ()
      })
    }
    val leafIds =
      plan.collectLeaves().flatMap(_.output).map(_.exprId.id).toSet
    var cur = id
    var hops = 0
    while (step.contains(cur) && hops < 64) { cur = step(cur); hops += 1 }
    leafIds.contains(cur)
  }

  /** Streaming aggregation keyed on a RAW source column with no
    * watermark below it: state = one row per key value forever (a
    * per-user running count over an unbounded user domain never
    * evicts). Derived keys (mod/hash buckets, literal fan-outs — the
    * CMS shape) are exempt: their domain is fixed by construction, so
    * watermark-less complete-mode sketches stay legal.
    */
  def unboundedStreamAgg(analyzed: LogicalPlan): Boolean =
    analyzed.collectFirst {
      case a: Aggregate
          if a.child.isStreaming && !hasWatermark(a.child) &&
            a.groupingExpressions.exists {
              case attr: Attribute => resolvesToLeaf(attr.exprId.id, analyzed)
              case _ => false
            } => a
    }.nonEmpty

  /** Streaming dropDuplicates WITHOUT a watermark: the seen-key set
    * grows with the stream, never evicts.
    * (`dropDuplicatesWithinWatermark` plans a different node and
    * requires the watermark itself.)
    */
  def unboundedStreamDedup(analyzed: LogicalPlan): Boolean =
    analyzed.collectFirst {
      case d: Deduplicate if d.child.isStreaming && !hasWatermark(d.child) => d
    }.nonEmpty

  private def hasRangePredicate(e: Expression): Boolean = e.exists {
    case _: GreaterThan | _: GreaterThanOrEqual |
        _: LessThan | _: LessThanOrEqual => true
    case _ => false
  }

  /** Stream-stream join whose condition carries NO range predicate:
    * without an event-time bound neither side's state store can ever
    * evict a row (any future match remains possible), so state grows
    * with the full stream on both sides.
    */
  def unboundedStreamJoin(analyzed: LogicalPlan): Boolean =
    analyzed.collectFirst {
      case j: Join
          if j.left.isStreaming && j.right.isStreaming &&
            !j.condition.exists(hasRangePredicate) => j
    }.nonEmpty

  /** All streaming-state smells of one streaming plan, by name. */
  def streamSmells(analyzed: LogicalPlan): Seq[String] =
    Seq(
      "unbounded-stream-agg" -> unboundedStreamAgg(analyzed),
      "unbounded-stream-dedup" -> unboundedStreamDedup(analyzed),
      "unbounded-stream-join" -> unboundedStreamJoin(analyzed)
    ).collect { case (n, true) => n }
}
