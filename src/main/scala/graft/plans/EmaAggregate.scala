package graft.plans

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType}

/** W8/F3 at engine tier: EMA as a native window aggregate.
  *
  * `ema(value, span) OVER (PARTITION BY k ORDER BY t ROWS BETWEEN
  * UNBOUNDED PRECEDING AND CURRENT ROW)` evaluates INCREMENTALLY: the
  * growing-frame window processor calls `update` once per new row, so a
  * key with n rows costs O(n) total — versus O(n²) for the
  * `aggregate(collect_list(...))` closed form (which also materializes
  * an n-element array per row). This is the "promote to
  * TypedImperativeAggregate when scale demands" path from SURVEY §7.3.
  *
  * State is 9 bytes (seeded flag + current ema). `merge` is
  * unsupported by construction: EMA is order-sensitive, so partial
  * aggregation would silently compute garbage — window frames never
  * merge, grouped aggregation must use
  * `Indicators.emaByKey` instead.
  */
case class EmaAggregate(
    child: Expression,
    spanExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[EmaAggregate.State] {

  import EmaAggregate.State

  private lazy val span: Int = spanExpr.eval(InternalRow.empty) match {
    case i: Int => i
    case l: Long => l.toInt
    case other => throw new IllegalArgumentException(s"graft_ema span must be a literal int, got $other")
  }
  private lazy val alpha: Double = 2.0 / (span + 1)

  override def children: Seq[Expression] = Seq(child, spanExpr)
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType && (spanExpr.dataType == IntegerType) && spanExpr.foldable)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_ema(value DOUBLE, span INT-literal)")

  override def createAggregationBuffer(): State = State(seeded = false, ema = 0.0)

  override def update(buffer: State, input: InternalRow): State = {
    val v = child.eval(input)
    if (v == null) buffer
    else {
      val x = v.asInstanceOf[Double]
      if (!buffer.seeded) State(seeded = true, ema = x)
      else State(seeded = true, ema = x * alpha + buffer.ema * (1 - alpha))
    }
  }

  override def merge(buffer: State, input: State): State =
    throw new UnsupportedOperationException(
      "graft_ema is order-sensitive and cannot merge partial states; " +
        "use it as a running window aggregate (ROWS UNBOUNDED PRECEDING) " +
        "or use Indicators.emaByKey for grouped computation")

  override def eval(buffer: State): Any =
    if (buffer.seeded) buffer.ema else null

  override def serialize(buffer: State): Array[Byte] = {
    val bb = ByteBuffer.allocate(9)
    bb.put(if (buffer.seeded) 1.toByte else 0.toByte)
    bb.putDouble(buffer.ema)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): State = {
    val bb = ByteBuffer.wrap(bytes)
    State(bb.get() == 1.toByte, bb.getDouble())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): EmaAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): EmaAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), spanExpr = newChildren(1))

  override def prettyName: String = "graft_ema"
}

object EmaAggregate {
  case class State(seeded: Boolean, ema: Double)
}
