package graft.plans

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items ("heavy hitters") sketch as a native
  * aggregate: `graft_freq_items(item, capacity)` returns
  * `array<struct<item:string, est:bigint>>` sorted by estimate
  * descending (item ascending on ties).
  *
  * This is the 100 TB shape of the "top n-grams" profile
  * (`q_top_ngrams`): the exact form shuffles every distinct gram to
  * count it, while this sketch keeps ≤ capacity counters per partial
  * state, merges associatively (Agarwal et al., Mergeable Summaries,
  * PODS '12), and ships O(capacity) per partition — one pass, no
  * vocabulary-sized shuffle. Guarantees, for N total items:
  *  - estimates never overcount: est ≤ true;
  *  - undercount is bounded: true − est ≤ N/(capacity+1), across any
  *    merge tree (mergeability theorem);
  *  - every item with true > N/(capacity+1) is present in the sketch;
  *  - if the stream's distinct-item count never exceeds capacity (in
  *    any partial OR merged state), no decrement ever fires and every
  *    estimate is EXACT — which is what `q_freq_items_check` gates
  *    against the oracle on the synthetic corpus.
  *
  * Estimates depend on arrival order once decrements fire, so the raw
  * sketch output is rows-only (like the HLL++/GK profile); the
  * oracle-gated companion asserts the bounds in-engine.
  */
case class FreqItemsAggregate(
    child: Expression,
    capExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  private lazy val capacity: Int = capExpr.eval(InternalRow.empty) match {
    case i: Int => i
    case l: Long => l.toInt
    case other => throw new IllegalArgumentException(
      s"graft_freq_items capacity must be a literal int, got $other")
  }

  override def children: Seq[Expression] = Seq(child, capExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("est", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && capExpr.dataType == IntegerType && capExpr.foldable)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_freq_items(item STRING, capacity INT-literal)")

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Long], input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val item = v.asInstanceOf[UTF8String].toString
    buf.get(item) match {
      case Some(c) => buf.update(item, c + 1)
      case None if buf.size < capacity => buf.update(item, 1L)
      case None =>
        // classic MG decrement-all: cancels one occurrence of every
        // tracked item plus the new one (amortized O(1) per update —
        // each decrement pairs with a previous increment)
        val dead = mutable.ArrayBuffer[String]()
        buf.keysIterator.foreach { k =>
          val c = buf(k) - 1
          if (c == 0) dead += k else buf.update(k, c)
        }
        dead.foreach(buf.remove)
    }
    buf
  }

  override def merge(a: mutable.HashMap[String, Long], b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b.foreach { case (k, c) => a.update(k, a.getOrElse(k, 0L) + c) }
    if (a.size > capacity) {
      // subtract the (capacity+1)-th largest count from everything and
      // drop the non-positive: ≤ capacity survivors, error growth still
      // within the N/(capacity+1) envelope (mergeable-summaries bound)
      val counts = a.values.toArray
      java.util.Arrays.sort(counts)
      val cut = counts(counts.length - (capacity + 1)) // (capacity+1)-th largest
      val dead = mutable.ArrayBuffer[String]()
      a.keysIterator.foreach { k =>
        val c = a(k) - cut
        if (c <= 0) dead += k else a.update(k, c)
      }
      dead.foreach(a.remove)
    }
    a
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val sorted = buf.toArray.sortBy { case (item, est) => (-est, item) }
    new GenericArrayData(sorted.map { case (item, est) =>
      InternalRow(UTF8String.fromString(item), est)
    })
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val entries = buf.toArray.map { case (k, c) => (k.getBytes(StandardCharsets.UTF_8), c) }
    val bb = ByteBuffer.allocate(4 + entries.map(_._1.length + 12).sum)
    bb.putInt(entries.length)
    entries.foreach { case (kb, c) => bb.putInt(kb.length); bb.put(kb); bb.putLong(c) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val kb = new Array[Byte](bb.getInt)
      bb.get(kb)
      buf.update(new String(kb, StandardCharsets.UTF_8), bb.getLong)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqItemsAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqItemsAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), capExpr = newChildren(1))

  override def prettyName: String = "graft_freq_items"
}
