package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic bottom-k sample as a native `TypedImperativeAggregate`
  * — the distributed-sampling primitive: every partial carries at most
  * k entries REGARDLESS of partition size, partials merge by
  * union-then-retake-bottom-k (the mergeable-summaries shape), and the
  * result is the same k rows any engine computes as
  * `ORDER BY priority LIMIT k` — because the priority is the house
  * cross-engine hash (first 12 md5 hex digits of 'smp|'||key as a
  * 48-bit integer), NOT an RNG draw. Determinism properties that
  * matter at 1000 executors: order-independent (a bottom-k set is a
  * multiset function of the inputs), partitioning-independent, and
  * re-runnable (same corpus → same sample). This is the k-minimum-
  * values / deterministic A-Res shape ([[graft.llm.Curation]]'s
  * sample_bottom_k as SQL); the native form exists so the whole sample
  * rides ONE aggregate with bounded shuffle state instead of a global
  * TakeOrdered over corpus rows.
  *
  * Ties: md5 collisions aside (2⁻⁴⁸ per pair), priorities are unique;
  * the (priority, key) compare is total either way.
  *
  * SQL: `graft_ares_sample(key, k)` → array<string> of the k
  * minimum-priority keys, in priority order.
  */
case class AresSampleAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Long, UTF8String)]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  // max-heap on (priority, key): the head is the WORST member, popped
  // whenever a better candidate arrives and the buffer is full
  private def ord: Ordering[(Long, UTF8String)] =
    Ordering.by { case (p, t) => (p, t.toString) }

  override def createAggregationBuffer()
      : mutable.PriorityQueue[(Long, UTF8String)] =
    mutable.PriorityQueue.empty(ord)

  // update() runs once per input row: the digest is cached per thread
  // (MessageDigest is stateful but reset by digest()) and the 48-bit
  // priority assembles directly from the first 6 digest bytes —
  // bit-identical to parsing the 12-char hex prefix, without the JCA
  // provider lookup, 6 format() calls, and Long.parseLong the old path
  // paid per row (round-14 review).
  private def priorityOf(tok: UTF8String): Long = {
    val md = AresSampleAgg.md5.get()
    val d = md.digest(("smp|" + tok.toString).getBytes("UTF-8"))
    ((d(0) & 0xffL) << 40) | ((d(1) & 0xffL) << 32) |
      ((d(2) & 0xffL) << 24) | ((d(3) & 0xffL) << 16) |
      ((d(4) & 0xffL) << 8) | (d(5) & 0xffL)
  }

  override def update(
      buf: mutable.PriorityQueue[(Long, UTF8String)],
      input: InternalRow): mutable.PriorityQueue[(Long, UTF8String)] = {
    val v = child.eval(input)
    if (v == null) return buf
    val tok = v.asInstanceOf[UTF8String]
    val p = priorityOf(tok)
    if (buf.size < k) buf.enqueue((p, tok.clone()))
    else if (ord.lt((p, tok), buf.head)) {
      buf.dequeue()
      buf.enqueue((p, tok.clone()))
    }
    buf
  }

  override def merge(
      x: mutable.PriorityQueue[(Long, UTF8String)],
      y: mutable.PriorityQueue[(Long, UTF8String)])
      : mutable.PriorityQueue[(Long, UTF8String)] = {
    y.foreach { e =>
      if (x.size < k) x.enqueue(e)
      else if (ord.lt(e, x.head)) { x.dequeue(); x.enqueue(e) }
    }
    x
  }

  override def eval(
      buf: mutable.PriorityQueue[(Long, UTF8String)]): Any =
    new GenericArrayData(
      buf.toArray.sorted(ord).map(_._2.asInstanceOf[Any]))

  override def serialize(
      buf: mutable.PriorityQueue[(Long, UTF8String)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (p, t) =>
      out.writeLong(p)
      val b = t.getBytes
      out.writeInt(b.length)
      out.write(b)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(
      bytes: Array[Byte]): mutable.PriorityQueue[(Long, UTF8String)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.PriorityQueue.empty(ord)
    var i = 0
    while (i < n) {
      val p = in.readLong()
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.enqueue((p, UTF8String.fromBytes(b)))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): AresSampleAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): AresSampleAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): AresSampleAgg =
    copy(child = newChildren.head)
  override def prettyName: String = "graft_ares_sample"
}

object AresSampleAgg {
  /** Per-thread MD5 instance for the hot per-row priority path —
    * MessageDigest is not thread-safe but digest() resets it, so one
    * cached instance per executor thread is sound. */
  private[functions] val md5: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() =>
      java.security.MessageDigest.getInstance("MD5"))
}
