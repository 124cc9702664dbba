package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Join,
  LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/**
 * Optimizer rule: FUSE a self-join of two aggregates over the same child on
 * their (identical) grouping keys into ONE aggregate.
 *
 * The target is the composed fixed-vocab pivot-family pattern (SURVEY.md
 * §4.3; reference `run.py:238-322` builds count/sum/calendar families
 * separately and merges on user, `run.py:420-430`):
 *
 *   pivotCount(e, user, ...).join(pivotSum(e, user, ...), "user")
 *
 * Each `Pivots` family is already a single-exchange conditional
 * aggregation, but composing k families via joins still costs k scans of
 * the input, k shuffles, and a join. Fused, the whole feature matrix is
 * ONE scan + ONE exchange with map-side partial combine — at 100 TB the
 * difference between reading the event log k times and once.
 *
 * Soundness, each condition checked in the match:
 *  - both children must be CANONICALLY IDENTICAL and deterministic —
 *    the two aggregate inputs are the same data, so both sides see the
 *    same group set and the inner join is a 1:1 key match (the DataFrame
 *    self-join path realiases the right side's exprIds; canonicalized
 *    comparison sees through that);
 *  - grouping columns must be plain attributes, equal in number, mapping
 *    to each other under the right-child → left-child positional
 *    attribute map;
 *  - the join condition must be EXACTLY the conjunction of per-key
 *    equalities pairing the two sides' grouping outputs — nothing else;
 *  - NULL keys: an inner `=` join DROPS the null-key group row that both
 *    aggregates produce, while a fused aggregate would keep it — so when
 *    a key is nullable and the equality is `=` (not `<=>`), the fusion
 *    appends `Filter(IsNotNull(key))`, preserving join semantics exactly.
 *
 * The right side's output exprIds are preserved by re-aliasing its
 * aggregate expressions under their old ids, so parent operators (the
 * using-join Project, downstream family joins) are untouched. Applied
 * bottom-up, a chain `((a join b) join c)` collapses left to right into a
 * single Aggregate: the fused (a+b) node is again an Aggregate whose child
 * canonically matches c's.
 */
object PivotFusion extends Rule[LogicalPlan] {

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  private def deterministicTree(p: LogicalPlan): Boolean =
    !p.exists(_.expressions.exists(e => e.exists(!_.deterministic)))

  /** Peel a column-pruning Project (bare attributes only) off an aggregate
    * child: by the time user rules run, ColumnPruning has given each side
    * its OWN projection of the shared input, so the children compare
    * unequal even though the data source is identical. Returns (projected
    * attrs, base). */
  private def peel(p: LogicalPlan): LogicalPlan = p match {
    case Project(list, child)
        if list.forall(_.isInstanceOf[AttributeReference]) =>
      peel(child)
    case f @ Filter(_, c) =>
      // keep the filter, normalize below it (a pruning Project can sit on
      // either side of a pushed-down filter)
      f.withNewChildren(Seq(peel(c)))
    case r: org.apache.spark.sql.catalyst.plans.logical.RepartitionOperation =>
      // repartition passes rows through untouched; pruning lands on
      // either side of it depending on the side's column needs
      r.withNewChildren(Seq(peel(r.child)))
    case other => other
  }

  /** Strip the tower an optimized (or already once-fused) family join
    * carries on top of its aggregate: attribute-only Projects (using-join
    * output projections, including the one this rule emits) and Filters
    * that are conjunctions of IsNotNull over attributes the JOIN CONDITION
    * references (inferred not-null constraints and this rule's own
    * null-key filter — an inner `=` join re-implies them, and the fusion
    * re-adds them for nullable keys, so stripping preserves semantics). */
  private def stripTower(p: LogicalPlan, condIds: Set[ExprId]): LogicalPlan =
    p match {
      case Project(list, c)
          if list.forall(_.isInstanceOf[AttributeReference]) =>
        stripTower(c, condIds)
      case Filter(fc, c) if conjuncts(fc).forall {
            case IsNotNull(a: AttributeReference) => condIds.contains(a.exprId)
            case _ => false
          } =>
        stripTower(c, condIds)
      case other => other
    }

  /** Cheap structural fingerprint: node-class sequence. Two peeled
    * children can only be canonically identical if their shapes match,
    * and comparing shapes allocates no rewritten trees. */
  private def shape(p: LogicalPlan): Seq[Class[_]] =
    p.collect { case n => n.getClass }

  /** The join condition can only be the per-key equality conjunction if
    * every conjunct is an attribute equality — O(|cond|), no plan walk.
    * This alone rejects the self-join shapes that dominate real plans
    * (pair generation `a.key = b.key AND a.id < b.id`, range/interval
    * joins), which must NOT pay canonicalization: measured 17x on the
    * posting-join dedup family when the expensive compare ran first. */
  private def condIsAttrEqs(cond: Expression): Boolean =
    conjuncts(cond).forall {
      case EqualTo(_: AttributeReference, _: AttributeReference) => true
      case EqualNullSafe(_: AttributeReference, _: AttributeReference) =>
        true
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(l, r, Inner, Some(cond), _) if condIsAttrEqs(cond) =>
      val condIds = cond.references.map(_.exprId).toSet
      (stripTower(l, condIds), stripTower(r, condIds)) match {
        case (la: Aggregate, ra: Aggregate)
            // guards ordered cheapest-first; `canonicalized` rebuilds the
            // whole subtree and must stay LAST behind the shape compare
            if la.groupingExpressions.length ==
                ra.groupingExpressions.length &&
              la.groupingExpressions
                .forall(_.isInstanceOf[AttributeReference]) &&
              ra.groupingExpressions
                .forall(_.isInstanceOf[AttributeReference]) && {
                val pa = peel(la.child); val pb = peel(ra.child)
                pa.output.length == pb.output.length &&
                shape(pa) == shape(pb) &&
                pa.canonicalized == pb.canonicalized &&
                deterministicTree(la.child)
              } =>
          // wrap back to the join's exact output (attrs all live in the
          // fused aggregate; the Project also restores output order)
          fuse(la, ra, cond)
            .map(f => Project(j.output, f): LogicalPlan).getOrElse(j)
        case _ => j
      }
  }

  private def fuse(la: Aggregate, ra: Aggregate,
                   cond: Expression): Option[LogicalPlan] = {
    val baseA = peel(la.child)
    val baseB = peel(ra.child)
    // right-base attr -> left-base attr, positional (bases are
    // canonically identical, so outputs align)
    val attrMap = AttributeMap(baseB.output.zip(baseA.output))
    def remap(e: Expression): Expression = e.transform {
      case a: AttributeReference => attrMap.getOrElse(a, a)
    }
    val gA = la.groupingExpressions.map(_.asInstanceOf[AttributeReference])
    val gB = ra.groupingExpressions.map(_.asInstanceOf[AttributeReference])
    // grouping keys must correspond under the child mapping (same keys,
    // same order — the DataFrame groupBy(col).join(groupBy(col)) shape)
    if (!gA.zip(gB).forall { case (a, b) =>
        remap(b).asInstanceOf[AttributeReference].exprId == a.exprId })
      return None

    // each side's OUTPUT attribute for grouping key i (the attr the join
    // condition references): the aggregate list must carry the key through
    // as a bare attribute or a direct alias of it
    def keyOut(ag: Aggregate, g: AttributeReference): Option[Attribute] =
      ag.aggregateExpressions.collectFirst {
        case a: AttributeReference if a.exprId == g.exprId => a
        case al @ Alias(a: AttributeReference, _) if a.exprId == g.exprId =>
          al.toAttribute
      }
    val keyOutA = gA.map(keyOut(la, _))
    val keyOutB = gB.map(keyOut(ra, _))
    if (keyOutA.exists(_.isEmpty) || keyOutB.exists(_.isEmpty)) return None
    val keysA = keyOutA.flatten
    val pairIds = keysA.map(_.exprId).zip(keyOutB.flatten.map(_.exprId))

    // the condition must be exactly the per-key equalities, one per key
    var nullFilterKeys = Seq.empty[Attribute]
    val matchedKeys = scala.collection.mutable.Set.empty[Int]
    val allKeyEqualities = conjuncts(cond).forall { c =>
      val pair = c match {
        case EqualTo(l: AttributeReference, r: AttributeReference) =>
          Some((l, r, false))
        case EqualNullSafe(l: AttributeReference, r: AttributeReference) =>
          Some((l, r, true))
        case _ => None
      }
      pair.exists { case (l, r, nullSafe) =>
        val ids = Set(l.exprId, r.exprId)
        val i = pairIds.indexWhere { case (a, b) => ids == Set(a, b) }
        i >= 0 && {
          matchedKeys += i
          if (!nullSafe && (l.nullable || r.nullable))
            nullFilterKeys :+= keysA(i)
          true
        }
      }
    }
    if (!allKeyEqualities || matchedKeys.size != pairIds.length) return None

    // right aggregate list re-expressed over the LEFT base, old exprIds
    // preserved so parents keep resolving
    val remappedB: Seq[NamedExpression] = ra.aggregateExpressions.map {
      case a: AttributeReference =>
        Alias(remap(a), a.name)(exprId = a.exprId, qualifier = a.qualifier)
      case al: Alias =>
        remap(al).asInstanceOf[Alias] // transform preserves Alias exprId
      case other =>
        Alias(remap(other), other.name)(exprId = other.exprId)
    }
    // fused child: the normalized left base, re-pruned to the UNION of
    // both sides' needs (peel widened it back to full width)
    val needed = (la.aggregateExpressions ++ remappedB ++ gA)
      .flatMap(_.references.toSeq).map(_.exprId).toSet
    val projCols = baseA.output.filter(a => needed.contains(a.exprId))
    val child =
      if (projCols.length == baseA.output.length) baseA
      else Project(projCols, baseA)
    val fused = Aggregate(gA, la.aggregateExpressions ++ remappedB, child)
    Some(if (nullFilterKeys.isEmpty) fused
         else Filter(nullFilterKeys.distinct.map(IsNotNull)
           .reduce[Expression](And), fused))
  }
}
