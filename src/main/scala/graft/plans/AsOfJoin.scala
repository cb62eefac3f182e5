package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Custom whole-operator as-of join — the SURVEY.md §2.3 preference-(c)
  * ladder: LogicalPlan + Strategy + physical exec, for an operator Spark's
  * DataFrame API lacks as a primitive.
  *
  * Semantics (left-outer as-of): for every left row, attach the single
  * right row with the same key and the greatest right-time ≤ left-time
  * (ties broken by the right side's sort order), or nulls if none exists.
  * Equivalent to the join+window composition (SparkEntry `q_asof_join`)
  * but in ONE pass: no intermediate multiplication of matches, no
  * row_number shuffle — each side is hash-partitioned on its key and
  * sorted (key, time) by EnsureRequirements, then merged per partition in
  * O(|L| + |R|).
  *
  * Scale: exactly the sort-merge-join shape — one shuffle per side, linear
  * merge, no state beyond the last-match row. At 100 TB this beats the
  * compositional form, whose join can fan out to |matches-per-event| rows
  * before row_number prunes them.
  *
  * v1 contract: key and time expressions must be LongType (cast upstream).
  */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
                        leftKey: Expression, leftTime: Expression,
                        rightKey: Expression, rightTime: Expression,
                        rightTie: Expression)
    extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(l: LogicalPlan, r: LogicalPlan): AsOfJoinPlan =
    copy(left = l, right = r)
}

object AsOfStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, lt, rk, rt, tie) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, lt, rk, rt, tie) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
                        leftKey: Expression, leftTime: Expression,
                        rightKey: Expression, rightTime: Expression,
                        rightTie: Expression)
    extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // co-partition both sides on their keys, sort (key, time) within — the
  // sort-merge-join requirements, satisfied by EnsureRequirements.
  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(leftKey)), ClusteredDistribution(Seq(rightKey)))

  // right tie-break DESC so the merge's pick-last-eligible semantics select
  // the max time, then the MIN tie value — matching the row_number oracle
  // (ORDER BY time DESC, tie ASC, rn = 1)
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending),
      SortOrder(rightTie, org.apache.spark.sql.catalyst.expressions.Descending)))

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val lk = BindReferences.bindReference(leftKey, left.output)
    val lt = BindReferences.bindReference(leftTime, left.output)
    val rk = BindReferences.bindReference(rightKey, right.output)
    val rt = BindReferences.bindReference(rightTime, right.output)
    val nRight = right.output.length

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val rBuf = rIter.buffered
      val nullRight = new GenericInternalRow(nRight)
      val joined = new JoinedRow
      // last right row (copied — unsafe rows are reused) with key == curKey
      var matchKey = 0L
      var hasMatch = false
      var matchRow: InternalRow = null

      lIter.map { lRow =>
        val kv = lk.eval(lRow)
        val tv = lt.eval(lRow)
        if (kv == null || tv == null) {
          // SQL comparison semantics: NULL key/time never matches
          joined(lRow, nullRight)
        } else {
          val k = kv.asInstanceOf[Long]
          val t = tv.asInstanceOf[Long]
          if (hasMatch && matchKey != k) { hasMatch = false; matchRow = null }
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val head = rBuf.head
            val hkv = rk.eval(head)
            if (hkv == null) { rBuf.next() } // NULL right key never matches
            else {
              val hk = hkv.asInstanceOf[Long]
              if (hk < k) { rBuf.next() } // keys before ours: discard
              else if (hk == k) {
                val htv = rt.eval(head)
                if (htv == null) { rBuf.next() } // NULL right time never matches
                else if (htv.asInstanceOf[Long] <= t) {
                  matchRow = rBuf.next().copy(); matchKey = k; hasMatch = true
                } else advancing = false
              } else advancing = false
            }
          }
          if (hasMatch && matchKey == k) joined(lRow, matchRow)
          else joined(lRow, nullRight)
        }
      }
    }
  }

  override protected def withNewChildrenInternal(l: SparkPlan, r: SparkPlan): AsOfJoinExec =
    copy(left = l, right = r)
}

/** Public API. Key/time are column NAMES resolved against each side. */
object AsOf {
  def join(left: DataFrame, leftKey: String, leftTime: String,
           right: DataFrame, rightKey: String, rightTime: String,
           rightTie: String): DataFrame = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfStrategy
    val lp = GraftBridge.logicalPlan(left)
    val rp = GraftBridge.logicalPlan(right)
    def attr(p: LogicalPlan, name: String): Attribute = {
      val a = p.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not found in ${p.output.map(_.name).mkString(", ")}"))
      require(a.dataType == org.apache.spark.sql.types.LongType,
        s"as-of join v1 requires BIGINT key/time columns; $name is ${a.dataType.catalogString}")
      a
    }
    GraftBridge.ofRows(spark, AsOfJoinPlan(lp, rp,
      attr(lp, leftKey), attr(lp, leftTime),
      attr(rp, rightKey), attr(rp, rightTime), attr(rp, rightTie)))
  }
}
