package graft

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Window}

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
}
