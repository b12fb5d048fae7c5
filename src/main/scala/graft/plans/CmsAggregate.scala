package graft.plans

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Count-min sketch as a native dense-buffer aggregate:
  * `graft_cms(key, depth, width)` returns `array<bigint>` of length
  * depth·width — row r's counter c at index r·width + c.
  *
  * Why this exists next to [[graft.operators.Profile.countMinSketch]]
  * (the explode + groupBy form): the declarative build's map-side
  * partial combine emits up to depth·width ROWS PER PARTITION into
  * the shuffle, so a wide sketch (the join-size estimator's 4×65536)
  * ships partitions × 262k rows — measured 3+ s per build at sf0.1
  * where the hashing itself is milliseconds. This aggregate holds the
  * counters as ONE dense long array per partial state, merges by
  * elementwise add (counters are sums — the same linearity the
  * artifact fold uses), and ships exactly one ~depth·width·8-byte
  * buffer per partition: the shape a native engine gives this sketch,
  * expressed as a first-class Catalyst aggregate (ObjectHashAggregate
  * handles the non-mutable buffer).
  *
  * Scope: designed for GLOBAL aggregation (or a handful of groups) —
  * the buffer is depth·width·8 bytes PER GROUP, so a high-cardinality
  * groupBy over this aggregate would allocate corpus-scale state;
  * per-key frequency questions belong to the sparse form + cmsLookup.
  *
  * Hash parity is load-bearing: counters must equal the SQL form's
  * exactly (bucket r of key k = first 60 bits of md5("r:k") mod
  * width), so the sparse view of this array is byte-identical to the
  * explode-form sketch and every CMS oracle replays unchanged —
  * CmsAggSpec pins the equality. The 60-bit prefix is the first 15
  * hex chars: big-endian first 8 digest bytes >>> 4.
  */
case class CmsAggregate(
    child: Expression,
    depthExpr: Expression,
    widthExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  private def litInt(e: Expression, what: String): Int = e.eval(InternalRow.empty) match {
    case i: Int => i
    case l: Long => l.toInt
    case other => throw new IllegalArgumentException(
      s"graft_cms $what must be a literal int, got $other")
  }
  private lazy val depth: Int = {
    val d = litInt(depthExpr, "depth")
    require(d >= 1 && d <= 16, s"depth must be in 1..16, got $d"); d
  }
  private lazy val width: Int = {
    val w = litInt(widthExpr, "width")
    require(w >= 2 && w <= (1 << 22), s"width must be in 2..2^22, got $w"); w
  }

  override def children: Seq[Expression] = Seq(child, depthExpr, widthExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType &&
        depthExpr.dataType == IntegerType && depthExpr.foldable &&
        widthExpr.dataType == IntegerType && widthExpr.foldable)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_cms(key STRING, depth INT-literal, width INT-literal)")

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.toString
      val md = CmsAggregate.digest.get()
      var r = 0
      while (r < depth) {
        md.reset()
        val d = md.digest(s"$r:$key".getBytes(StandardCharsets.UTF_8))
        // first 15 hex chars = first 60 bits: big-endian 8 bytes >>> 4
        var top = 0L
        var i = 0
        while (i < 8) { top = (top << 8) | (d(i) & 0xffL); i += 1 }
        val bucket = ((top >>> 4) % width).toInt
        buf(r * width + bucket) += 1L
        r += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), depthExpr = newChildren(1), widthExpr = newChildren(2))

  override def prettyName: String = "graft_cms"
}

object CmsAggregate {
  /** MessageDigest is stateful and not thread-safe; aggregate
    * instances can be shared across tasks in a JVM. */
  private val digest: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))
}
