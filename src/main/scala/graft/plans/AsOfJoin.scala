package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftInternal, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.functions._

/** Native AS-OF JOIN — the whole-operator custom tier from the brief
  * ((c): custom LogicalPlan + Strategy + SparkPlan, registered through
  * SparkSessionExtensions).
  *
  * Semantics: for every left row, attach the single right row with the
  * same key and the greatest right-time ≤ left-time (pandas
  * `merge_asof`; the two-table general case of the reference's
  * correlated `ORDER BY trade_date DESC LIMIT 1` lookup,
  * full_stock_pipeline.py:397-399).
  *
  * Physical execution: both sides hash-clustered on the key and sorted
  * by (key, time) — EnsureRequirements inserts exactly one co-shuffle
  * per side — then a single streaming merge pass per partition holding
  * ONE candidate row of state. No window materialization, no union, no
  * per-key buffering: O(left + right) time, O(1) memory per partition
  * beyond the sort. That profile is what makes it safe for a 100 TB
  * trades × quotes alignment where the window-union formulation pays an
  * extra global union + window over the combined stream.
  *
  * [[AsOf.join]] uses the native operator when the strategy is
  * installed and falls back to the equivalent union+window formulation
  * on a plain session (results identical — AsOfJoinSpec).
  */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
                        leftKeys: Seq[Expression], rightKeys: Seq[Expression],
                        leftTime: Expression, rightTime: Expression)
    extends BinaryNode {
  // right side is outer: unmatched left rows keep nulls
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(newLeft: LogicalPlan, newRight: LogicalPlan): LogicalPlan =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy (injected by [[GraftExtensions]]). */
object AsOfJoinStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
                        leftKeys: Seq[Expression], rightKeys: Seq[Expression],
                        leftTime: Expression, rightTime: Expression)
    extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeys = leftKeys
    val rKeys = rightKeys
    val lTime = leftTime
    val rTime = rightTime
    val lOut = left.output
    val rOut = right.output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeys, lOut)
      val rKeyProj = UnsafeProjection.create(rKeys, rOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTime), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTime), rOut)
      val timeOrd = org.apache.spark.sql.catalyst.expressions.RowOrdering
        .createNaturalAscendingOrdering(Seq(lTime.dataType))
      val keyOrd = org.apache.spark.sql.catalyst.expressions.RowOrdering
        .createNaturalAscendingOrdering(lKeys.map(_.dataType))
      val nullRight = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(rOut.length)
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        private val rBuf = rIter.buffered
        private var candidate: InternalRow = _      // last right row ≤ current left time, same key
        private var candidateKey: InternalRow = _
        override def hasNext: Boolean = lIter.hasNext
        override def next(): InternalRow = {
          val l = lIter.next()
          val lk = lKeyProj(l)
          val lt = lTimeProj(l).copy()
          // drop candidate from a previous key
          if (candidateKey != null && keyOrd.compare(candidateKey, lk) != 0) {
            candidate = null; candidateKey = null
          }
          // advance the right side while it is behind (key, time)-wise
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val rk = rKeyProj(rBuf.head)
            val kc = keyOrd.compare(rk, lk)
            if (kc < 0) { rBuf.next() } // right key behind: discard
            else if (kc == 0 && timeOrd.compare(rTimeProj(rBuf.head), lt) <= 0) {
              candidate = rBuf.next().copy()
              candidateKey = rk.copy()
            } else advancing = false   // right is ahead: stop
          }
          if (candidate != null && candidateKey != null && keyOrd.compare(candidateKey, lk) == 0)
            joined(l, candidate)
          else joined(l, nullRight)
        }
      }
    }
  }

  override protected def withNewChildrenInternal(newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)
}

/** Public API. Output columns: all of left's, then right's non-key
  * columns (null-padded when no match). Right payload names must not
  * collide with left's — rename beforehand. */
object AsOf {

  def join(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTimeCol: String, rightTimeCol: String): DataFrame = {
    val spark = left.sparkSession
    val native = spark.conf.getOption("spark.sql.extensions")
      .exists(_.contains("graft.plans.GraftExtensions"))
    if (native) {
      val lPlan = GraftInternal.logicalPlan(left)
      // Fresh-alias the right boundary: with a self-join-shaped input the
      // two subtrees share exprIds, and the analyzer's dedup cannot know
      // our captured rightKeys meant the RIGHT child. Unique boundary
      // IDs make the binding unambiguous.
      val rPlan0 = GraftInternal.logicalPlan(right)
      val rPlan: LogicalPlan = org.apache.spark.sql.catalyst.plans.logical.Project(
        rPlan0.output.map(a =>
          org.apache.spark.sql.catalyst.expressions.Alias(a, a.name)()), rPlan0)
      def resolve(plan: LogicalPlan, name: String): Attribute =
        plan.output.find(_.name == name).getOrElse(
          throw new IllegalArgumentException(s"column $name not found in ${plan.output.map(_.name)}"))
      val asof = AsOfJoinPlan(
        lPlan, rPlan,
        keys.map(resolve(lPlan, _)), keys.map(resolve(rPlan, _)),
        resolve(lPlan, leftTimeCol), resolve(rPlan, rightTimeCol))
      // project away the duplicated right-side key columns; take the
      // right-side attributes from asof.output (NOT rPlan.output) so the
      // public schema keeps the nullable=true the null-padding implies —
      // otherwise the optimizer may fold isNull checks on padded columns
      val keep = asof.output.take(lPlan.output.length) ++
        asof.output.drop(lPlan.output.length).filterNot(a => keys.contains(a.name))
      GraftInternal.ofRows(spark,
        org.apache.spark.sql.catalyst.plans.logical.Project(keep, asof))
    } else fallback(left, right, keys, leftTimeCol, rightTimeCol)
  }

  /** Composable fallback for plain sessions: tag-union + per-key
    * ignore-nulls `last` window in (time, tag) order (right rows sort
    * before left rows at equal time → inclusive ≤). Caveat vs native:
    * a genuinely-null right payload value is skipped back to the
    * previous row rather than attached as null. */
  private[graft] def fallback(left: DataFrame, right: DataFrame, keys: Seq[String],
                              leftTimeCol: String, rightTimeCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val leftPayload = left.columns.filterNot(keys.contains).toSeq
    val rightPayload = right.columns.filterNot(keys.contains).toSeq // includes rightTimeCol
    val l2 = rightPayload.foldLeft(
      left.withColumn("__t", col(leftTimeCol)).withColumn("__tag", lit(1))) {
      (d, c) => d.withColumn(s"__r_$c", lit(null).cast(right.schema(c).dataType))
    }
    val r2 = leftPayload.foldLeft(
      rightPayload.foldLeft(
        right.withColumn("__t", col(rightTimeCol)).withColumn("__tag", lit(0))) {
        (d, c) => d.withColumnRenamed(c, s"__r_$c")
      }) { (d, c) => d.withColumn(c, lit(null).cast(left.schema(c).dataType)) }
    val cols = (keys ++ Seq("__t", "__tag") ++ leftPayload ++ rightPayload.map(c => s"__r_$c")).map(col)
    val unioned = l2.select(cols: _*).unionByName(r2.select(cols: _*))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val filled = rightPayload.foldLeft(unioned) { (d, c) =>
      d.withColumn(s"__r_$c",
        last(when(col("__tag") === 0, col(s"__r_$c")), ignoreNulls = true).over(w))
    }
    val out = filled.filter(col("__tag") === 1)
    val renamed = rightPayload.foldLeft(out)((d, c) => d.withColumnRenamed(s"__r_$c", c))
    renamed.select((left.columns.toSeq ++ rightPayload).map(col): _*)
  }
}
