package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** As-of join as a first-class operator: logical node + planner strategy +
  * merge-scan physical operator (SURVEY.md §7.2 tier (c)).
  *
  * Compared to the composed union+window form ([[graft.operators.AsofJoin]]),
  * the physical operator declares its needs to the planner — co-clustered
  * children on the join keys, (key, ts)-sorted partitions — and then merges
  * the two sorted streams in one pass with O(1) state: no union
  * materialization, no window buffer, and the right side's payload never
  * round-trips through a struct. EnsureRequirements inserts only the
  * exchanges/sorts that are actually missing, so pre-partitioned (bucketed)
  * inputs join with no shuffle at all — the property that matters at 100 TB.
  *
  * Semantics: for every left row, the right row with the greatest
  * `rightTs <= leftTs` within the same key group (left outer: unmatched
  * left rows pad the right side with nulls). Identical to
  * [[graft.operators.AsofJoin.asof]]; asserted by AsofExecSpec.
  */
/** Keys/timestamps are carried BY NAME and resolved lazily against the
  * children's current output: the analyzer's DeduplicateRelations re-ids a
  * self-joined right subtree without visiting custom nodes' expressions, so
  * holding Attribute references here would dangle. Name resolution (plus an
  * overridden `references` so column pruning keeps the key columns) stays
  * correct through every rewrite.
  */
case class AsofJoinNode(left: LogicalPlan, right: LogicalPlan,
                        keys: Seq[String], leftTsName: String, rightTsName: String)
    extends BinaryNode {
  private def find(p: LogicalPlan, n: String): Attribute =
    p.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(s"column $n not in ${p.output.map(_.name)}"))
  def leftKeys: Seq[Attribute] = keys.map(find(left, _))
  def rightKeys: Seq[Attribute] = keys.map(find(right, _))
  def leftTsAttr: Attribute = find(left, leftTsName)
  def rightTsAttr: Attribute = find(right, rightTsName)

  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(
      leftKeys ++ rightKeys ++ Seq(leftTsAttr, rightTsAttr))
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(newLeft: LogicalPlan, newRight: LogicalPlan): LogicalPlan =
    copy(left = newLeft, right = newRight)
}

object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n @ AsofJoinNode(l, r, _, _, _) =>
      AsofJoinExec(planLater(l), planLater(r),
        n.leftKeys, n.rightKeys, n.leftTsAttr, n.rightTsAttr) :: Nil
    case _ => Nil
  }
}

case class AsofJoinExec(left: SparkPlan, right: SparkPlan,
                        leftKeys: Seq[Expression], rightKeys: Seq[Expression],
                        leftTs: Expression, rightTs: Expression)
    extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] = {
    // pin an identical partition count on both children: doExecute zips
    // partitions pairwise, so asymmetric AQE coalescing would be incorrect
    val n = Some(conf.numShufflePartitions)
    ClusteredDistribution(leftKeys, requiredNumPartitions = n) ::
      ClusteredDistribution(rightKeys, requiredNumPartitions = n) :: Nil
  }

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTs).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTs).map(SortOrder(_, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTs).map(SortOrder(_, Ascending))

  protected override def doExecute(): RDD[InternalRow] = {
    val keyTypes = leftKeys.map(_.dataType)
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(leftKeys, left.output)
      val rKeyProj = UnsafeProjection.create(rightKeys, right.output)
      val lTsEval = BindReferences.bindReference(leftTs, left.output)
      val rTsEval = BindReferences.bindReference(rightTs, right.output)
      val keyOrd = org.apache.spark.sql.catalyst.expressions.RowOrdering
        .createNaturalAscendingOrdering(keyTypes)
      val joiner = new JoinedRow
      val nullRight = new GenericInternalRow(right.output.size)

      new Iterator[InternalRow] {
        private var pendingRight: InternalRow = _   // read but not yet classified
        private var candidate: InternalRow = _      // best right row for current key so far
        private var candidateKey: UnsafeRow = _

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val lRow = lIter.next()
          val lKey = lKeyProj(lRow)
          val lTsRaw = lTsEval.eval(lRow)
          // SQL join semantics: null keys/timestamps never match (DuckDB's
          // ASOF — our parity oracle — behaves the same). Null-first sort
          // order puts such left rows at the front, so skipping them leaves
          // the merge pointers untouched.
          if (lKey.anyNull || lTsRaw == null) return joiner(lRow, nullRight)
          val lTsV = lTsRaw.asInstanceOf[Long]
          var done = false
          while (!done && (pendingRight != null || rIter.hasNext)) {
            if (pendingRight == null) pendingRight = rIter.next().copy()
            val rKey = rKeyProj(pendingRight)
            val rTsRaw = if (rKey.anyNull) null else rTsEval.eval(pendingRight)
            if (rKey.anyNull || rTsRaw == null) {
              pendingRight = null // null key/ts can never match; discard
            } else {
              val cmp = keyOrd.compare(rKey, lKey)
              if (cmp < 0) {
                pendingRight = null // right key fully behind; discard
              } else if (cmp == 0) {
                if (rTsRaw.asInstanceOf[Long] <= lTsV) {
                  candidate = pendingRight
                  candidateKey = rKey.copy()
                  pendingRight = null
                } else done = true // right too new for this left row; keep for later
              } else done = true // right key ahead of left key
            }
          }
          if (candidate != null && candidateKey != null && keyOrd.compare(candidateKey, lKey) == 0)
            joiner(lRow, candidate)
          else
            joiner(lRow, nullRight)
        }
      }
    }
  }

  override protected def withNewChildrenInternal(newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)
}

/** User-facing constructor: resolves key/ts columns by name against the
  * children's analyzed plans and registers the strategy once per session.
  */
object AsofJoinExecApi {
  def asof(leftDf: DataFrame, rightDf: DataFrame, keys: Seq[String],
           leftTs: String, rightTs: String): DataFrame = {
    val spark = leftDf.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsofJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsofJoinStrategy
    org.apache.spark.sql.graft.shim.ofRows(spark,
      AsofJoinNode(leftDf.queryExecution.analyzed, rightDf.queryExecution.analyzed,
        keys, leftTs, rightTs))
  }
}
