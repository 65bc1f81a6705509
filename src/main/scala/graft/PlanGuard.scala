package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
import org.apache.spark.sql.catalyst.plans._
import org.apache.spark.sql.catalyst.plans.logical.{Join, JoinHint,
  UnionLoop}
import org.apache.spark.sql.execution._
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec,
  BroadcastNestedLoopJoinExec, CartesianProductExec, ShuffledHashJoinExec,
  SortMergeJoinExec}
import org.apache.spark.sql.execution.window.{WindowExec,
  WindowGroupLimitExec}

/**
 * Automated physical-plan tripwire (round-11 verdict item 5): with 285
 * driver entries, PLANS.md is a review snapshot, not a gate — these
 * checks ARE the gate, run by `PlansSpec` over every `SparkEntry.queries`
 * entry. A violation is a plan shape that silently stops scaling:
 *
 *  1. `CartesianProductExec` — never acceptable; every all-pairs leg in
 *     the repo is blocked/bucketed into an equi-join by construction.
 *  2. `BroadcastNestedLoopJoinExec` whose BUILD side is not provably
 *     bounded (no aggregate / limit / top-k / literal scan in its
 *     subtree). The scalar-attach idiom (crossJoin of a broadcast 1-row
 *     aggregate) and broadcast bucket lists pass; broadcasting an
 *     unbounded table does not.
 *  3. A window (`WindowExec` / `WindowGroupLimitExec`) with an EMPTY
 *     partition spec over an unbounded child — a single-partition sort
 *     that serializes the whole input through one task. Windows above
 *     an aggregate / limit / literal frame are the documented bounded
 *     post-aggregation sites and pass.
 *  4. A logical equi-join with a side small enough (per Catalyst stats)
 *     and legal (per join type) to broadcast, while the physical plan
 *     has FEWER broadcast hash joins than such eligible joins — i.e. a
 *     broadcastable join that shuffled anyway.
 *  5. An UNPRUNED partitioned scan: a `FileSourceScanExec` over a
 *     partitioned table with EMPTY `partitionFilters`, while some
 *     filter in the plan references one of that scan's partition
 *     columns — the query constrains topic/date but the constraint
 *     never reached the file index, so every partition is listed and
 *     read. The classic 100 TB killer: correct at fixture scale,
 *     reads the whole table in production. (A partitioned scan with
 *     no partition-column filter anywhere is a deliberate full scan
 *     and passes.)
 *
 * The heuristics are deliberately conservative (checks 2-4 look for
 * boundedness evidence, not sizes at runtime); anything they misjudge
 * belongs in `PlansSpec`'s explicit allowlist with a justification.
 */
object PlanGuard {

  /** All violations in `df`'s plan, empty when the plan is clean. */
  def violations(df: DataFrame): Seq[String] = {
    val physical = flatten(df.queryExecution.executedPlan)
    val structural = physical.flatMap {
      case c: CartesianProductExec =>
        Some(s"CartesianProduct: ${oneLine(c)}")
      case j: BroadcastNestedLoopJoinExec =>
        val build = j.buildSide match {
          case BuildLeft => j.left
          case BuildRight => j.right
        }
        if (bounded(build)) None
        else Some(s"BroadcastNestedLoopJoin with unbounded build side: " +
          oneLine(j))
      case w: WindowExec if w.partitionSpec.isEmpty && !bounded(w.child) =>
        Some(s"single-partition window over unbounded input: ${oneLine(w)}")
      case w: WindowGroupLimitExec
          if w.partitionSpec.isEmpty && !bounded(w.child) =>
        Some(s"single-partition window-group-limit over unbounded input: " +
          oneLine(w))
      case _ => None
    }
    structural ++ missedBroadcasts(df, physical) ++
      unprunedPartitionedScans(physical) ++ duplicatedInterpreted(physical) ++
      oversizedLiteralPayloads(physical)
  }

  /** Check 7: BAKED-ARTIFACT ceiling (round-16 verdict item 5). A
    * driver-held artifact folded into an expression as literal data —
    * a centroid matrix, a PQ codebook, an inlined vocabulary — ships
    * with EVERY task binary and serializes per stage; the class is
    * fine at k×dim sync sizes (the x6/x78 pattern) and ruinous when
    * the artifact grows with the corpus (the pre-fix x140 shape: a
    * C = N/250 centroid matrix made the task binary LINEAR in N).
    * This check sums the non-child literal payload of every expression
    * tree per physical node — `Literal` values AND the constructor
    * payloads of custom expressions (Seq/Array/String fields; child
    * Expressions are walked as their own nodes) — and flags any node
    * above [[MaxLiteralPayload]]. The fix is structural: keep the big
    * side's work as `element_at` lookups against a BROADCAST frame (a
    * real broadcast variable is shipped once per executor, not per
    * task binary) or shrink the artifact (C ∝ √N, two-level
    * quantizers, sampled training). */
  private def oversizedLiteralPayloads(
      physical: Seq[SparkPlan]): Seq[String] = {
    import org.apache.spark.sql.catalyst.expressions.{Expression,
      UnsafeArrayData, UnsafeRow}
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    def bytesOf(x: Any, depth: Int): Long = x match {
      case null => 0L
      case _ if depth > 8 => 0L
      case _: Expression => 0L // counted at its own tree node
      case _: org.apache.spark.sql.types.DataType => 0L
      case s: String => 2L * s.length
      case u: org.apache.spark.unsafe.types.UTF8String => u.numBytes.toLong
      case u: UnsafeArrayData => u.getSizeInBytes.toLong
      case u: UnsafeRow => u.getSizeInBytes.toLong
      case g: GenericArrayData => bytesOf(g.array, depth + 1)
      case _: java.lang.Boolean | _: java.lang.Byte => 1L
      case _: java.lang.Short | _: java.lang.Character => 2L
      case _: java.lang.Integer | _: java.lang.Float => 4L
      case _: java.lang.Long | _: java.lang.Double => 8L
      case _: java.math.BigDecimal | _: BigDecimal |
           _: org.apache.spark.sql.types.Decimal => 16L
      case a: Array[_] => a.foldLeft(0L)(_ + bytesOf(_, depth + 1))
      case s: Iterable[_] => s.foldLeft(0L)(_ + bytesOf(_, depth + 1))
      case p: Product =>
        p.productIterator.foldLeft(0L)(_ + bytesOf(_, depth + 1))
      case _ => 0L
    }
    val seen = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[SparkPlan, java.lang.Boolean]())
    physical.filter(seen.add).flatMap { p =>
      val payload = p.expressions.foldLeft(0L) { (acc, root) =>
        var s = acc
        root.foreach { e =>
          s += e.productIterator.foldLeft(0L)(_ + bytesOf(_, 0))
        }
        s
      }
      if (payload <= MaxLiteralPayload) None
      else Some(f"driver-baked literal payload ${payload / 1024}%d KiB " +
        "in one plan node (ceiling " +
        f"${MaxLiteralPayload / 1024}%d KiB) — ship the artifact as a " +
        s"broadcast LUT join or shrink it: ${oneLine(p)}")
    }
  }

  /** Per-node literal-payload ceiling for check 7: 1 MiB. Every
    * legitimate baked artifact in the query map is k×dim sync-sized
    * (DSIR's 2048 weights = 16 KiB, PQ codebooks ≤ 32 KiB, fixture
    * vocabularies ≪ 100 KiB); anything above a mebibyte per node is an
    * artifact that should ride a broadcast variable — or one that
    * grows with the corpus and needs a structural fix. */
  private val MaxLiteralPayload: Long = 1L << 20

  /** Check 6: an EXPENSIVE interpreted expression subtree planned into
    * two or more physical nodes of one query — the thrice-seen (x73 /
    * x128 / x139) optimizer-duplication bug class. Higher-order
    * functions never enter codegen, so a long derived chain re-planned
    * per consumer multiplies a per-row interpreted loop by the branch
    * count (x139 round 15: 53 s for 5000 fixture docs, clean janino
    * stderr); the fix is always to materialize the small derived
    * projection ONCE (localCheckpoint) before fanning out. Size-gated
    * ([[MinInterpretedSize]] expression nodes) so a cheap reused lambda
    * does not trip it; reference-deduplicated so a reused — genuinely
    * computed-once — subquery or exchange subtree does not. */
  private def duplicatedInterpreted(
      physical: Seq[SparkPlan]): Seq[String] = {
    import org.apache.spark.sql.catalyst.expressions.{Expression,
      HigherOrderFunction}
    def exprSize(e: Expression): Int = 1 + e.children.map(exprSize).sum
    // key on the canonicalized tree with exprIds STRIPPED: self-join
    // deduplication re-aliases one branch's attributes, so the SAME
    // duplicated chain carries different ids across the two join sides
    // (the pre-fix x139 shape) — id-sensitive keys would miss it.
    // .sql (not .toString): toString prints array/struct LITERALS by
    // object identity (UnsafeArrayData@…), so two copies of one chain
    // only matched when the optimizer happened to share the literal
    // instance — the x137 flag flickered across runs on exactly this.
    // The PRE-canonicalization leaf attribute NAMES are kept in the key
    // (sorted; canonicalization normalizes them away with the ids):
    // re-aliasing preserves names, so the x139 shape still matches, but
    // two structurally identical chains applied to DIFFERENT input
    // columns (legitimate multi-field work) no longer collapse to one
    // key and get falsely flagged (round-16 ADVICE).
    def key(e: Expression): String = {
      import scala.util.control.NonFatal
      val c = e.canonicalized
      val leaves = e.references.map(_.name).toSeq.sorted.mkString(",")
      // NonFatal, not Throwable (round-16 ADVICE): an OOM must propagate.
      // StackOverflowError is special-cased — .sql recurses and a deep
      // generated chain overflowing must not kill the sweep.
      val body = (try c.sql catch {
        case NonFatal(_) | (_: StackOverflowError) => c.toString
      }).replaceAll("#\\d+", "#")
      s"[$leaves] $body"
    }
    val seen = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[SparkPlan, java.lang.Boolean]())
    val perNode: Seq[Set[String]] = physical.filter(seen.add).map { p =>
      p.expressions.flatMap(_.collect {
        case h: HigherOrderFunction if exprSize(h) >= MinInterpretedSize =>
          key(h)
      }).toSet
    }
    perNode.flatten.groupBy(identity).collect {
      case (k, hits) if hits.size >= 2 =>
        s"interpreted higher-order subtree planned into ${hits.size} " +
          s"plan nodes — materialize the derived column once: " +
          k.take(160)
    }.toSeq
  }

  /** Expression-node floor for check 6: below this an interpreted
    * subtree duplicated across branches is noise, above it the per-row
    * re-evaluation is the x139 defect. The x139 chain measured ~200
    * nodes; the floor sits far under it and above every legitimate
    * reused lambda in the query map (swept empty-allowlist). */
  private val MinInterpretedSize = 20

  /** Check 5: a partitioned file scan with no partition filters, while a
    * filter elsewhere in the plan references its partition columns (by
    * exprId, so only THIS scan's attributes count). Catalyst pushes
    * adjacent deterministic partition predicates itself; what this
    * catches is the predicate stranded above a plan barrier (a window or
    * aggregate it cannot cross) — the filter still runs, every file is
    * still read. */
  private def unprunedPartitionedScans(
      physical: Seq[SparkPlan]): Seq[String] = {
    import org.apache.spark.sql.catalyst.expressions.AttributeSet
    val filterRefs = physical.collect { case f: FilterExec =>
      f.condition.references
    }.foldLeft(AttributeSet.empty)(_ ++ _)
    if (filterRefs.isEmpty) return Nil
    physical.flatMap {
      case scan: FileSourceScanExec
          if scan.relation.partitionSchema.nonEmpty &&
            scan.partitionFilters.isEmpty =>
        val partNames = scan.relation.partitionSchema.fieldNames.toSet
        val hit = scan.output.filter(a =>
          partNames.contains(a.name) && filterRefs.contains(a))
        if (hit.isEmpty) None
        else Some("unpruned partitioned scan: filter on partition " +
          s"column(s) ${hit.map(_.name).mkString(", ")} never reached " +
          s"the file index as a partition filter: ${oneLine(scan)}")
      case _ => None
    }
  }

  /** Check 4: every stats-eligible broadcast join must actually plan as
    * a broadcast hash join. Counted, not matched node-to-node (physical
    * joins don't link back to logical ones), so the signal is "fewer
    * broadcast joins than eligible joins". */
  private def missedBroadcasts(df: DataFrame,
      physical: Seq[SparkPlan]): Seq[String] = {
    val threshold = df.sparkSession.sessionState.conf.autoBroadcastJoinThreshold
    if (threshold <= 0) return Nil // broadcasting disabled: nothing to check
    def canBuildRight(jt: JoinType): Boolean = jt match {
      case _: InnerLike | LeftOuter | LeftSemi | LeftAnti |
           _: ExistenceJoin => true
      case _ => false
    }
    def canBuildLeft(jt: JoinType): Boolean = jt match {
      case _: InnerLike | RightOuter => true
      case _ => false
    }
    val logical = df.queryExecution.optimizedPlan
    // joins inside a recursive CTE's loop body run per iteration inside
    // UnionLoopExec — their physical form is invisible to this pass, so
    // counting them against the physical broadcast tally is a false alarm
    val inLoop = logical.collectWithSubqueries {
      case ul: UnionLoop => ul
    }.flatMap(_.collect { case j: Join => j }).toSet
    val eligible = logical.collectWithSubqueries {
      // joins carrying an explicit hint (merge/shuffle demos like the
      // salted and AQE-skew entries) are deliberate — skip them
      case j @ Join(l, r, jt, Some(_), hint)
          if hint == JoinHint.NONE &&
             ((canBuildRight(jt) && r.stats.sizeInBytes <= threshold) ||
              (canBuildLeft(jt) && l.stats.sizeInBytes <= threshold)) => j
    }.filterNot(inLoop)
    // BNLJ with a bounded build side covers non-equi broadcast joins;
    // broadcast hash joins cover the equi ones
    val planned = physical.count {
      case _: BroadcastHashJoinExec => true
      case _: BroadcastNestedLoopJoinExec => true
      case _ => false
    }
    if (planned >= eligible.size) Nil
    else Seq(s"${eligible.size} broadcast-eligible joins (stats <= " +
      s"$threshold B on a legal build side) but only $planned broadcast " +
      "joins in the physical plan — a broadcastable join shuffled")
  }

  /** Physical nodes including subqueries and un-executed AQE subtrees. */
  private def flatten(p: SparkPlan): Seq[SparkPlan] =
    p.collectWithSubqueries { case n => n }.flatMap {
      case a: AdaptiveSparkPlanExec => a +: flatten(a.executedPlan)
      case n => Seq(n)
    }

  /** Evidence the subtree's row count is bounded independent of input
    * scale: an aggregate (group count is the bound), a limit / top-k, or
    * a literal / parallelized / in-memory driver-built frame — STRUCTURAL
    * recursion, not `exists` (an aggregate on one join side must not
    * vouch for the join's whole output). Unary operators pass their
    * child's verdict through; joins are bounded only by a bounded
    * streamed/both side depending on type; unseen leaves are unbounded. */
  private def bounded(p: SparkPlan): Boolean = p match {
    case _: BaseAggregateExec => true
    case _: TakeOrderedAndProjectExec => true
    case _: GlobalLimitExec => true
    case _: LocalLimitExec => true
    case _: CollectLimitExec => true
    case _: LocalTableScanExec => true
    case _: RDDScanExec => true
    case _: RangeExec => true // driver-literal bounds, data-independent
    case a: AdaptiveSparkPlanExec => bounded(a.executedPlan)
    case j: SortMergeJoinExec => boundedJoin(j.joinType, j.left, j.right)
    case j: ShuffledHashJoinExec => boundedJoin(j.joinType, j.left, j.right)
    case j: BroadcastHashJoinExec => boundedJoin(j.joinType, j.left, j.right)
    case j: BroadcastNestedLoopJoinExec =>
      boundedJoin(j.joinType, j.left, j.right)
    case u: UnionExec => u.children.forall(bounded)
    case _: LeafExecNode => false
    case other if other.children.nonEmpty => other.children.forall(bounded)
    case _ => false
  }

  /** Semi/anti joins emit at most their left input; other joins are
    * bounded only when both sides are. */
  private def boundedJoin(jt: JoinType, left: SparkPlan,
      right: SparkPlan): Boolean = jt match {
    case LeftSemi | LeftAnti | _: ExistenceJoin => bounded(left)
    case _ => bounded(left) && bounded(right)
  }

  private def oneLine(p: SparkPlan): String =
    p.simpleStringWithNodeId().linesIterator.next().take(160)
}
