package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.types.{DataType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries frequent-items sketch as a native
  * `TypedImperativeAggregate` — the production-shape twin of the typed
  * `Aggregator` in `graft.queries.TypedAggs`: the buffer is a mutable
  * open-hash map updated in place (no per-row immutable-Map copying),
  * partials serialize to a compact length-prefixed byte stream for the
  * shuffle, and `merge` applies the mergeable-summaries rule (Agarwal
  * et al., PODS'12): sum counts, then subtract the (m+1)-th largest
  * and drop non-positives, restoring the ≤ m bound.
  *
  * Guarantee preserved end-to-end: every item with true frequency
  * > n/(m+1) survives with a positive (under)count; the shuffle moves
  * at most m entries per partial regardless of input size.
  *
  * SQL: `graft_misra_gries(expr, m)` → map<string, bigint>.
  */
case class MisraGriesAgg(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = MapType(StringType, LongType, false)

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  override def update(
      buf: mutable.HashMap[UTF8String, Long],
      input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val tok = v.asInstanceOf[UTF8String]
    buf.get(tok) match {
      case Some(c) => buf.update(tok, c + 1)
      case None if buf.size < capacity =>
        // clone: UTF8String from a columnar reader may point into a
        // reused buffer; the sketch outlives the row
        buf.update(tok.clone(), 1L)
      case None => // decrement-all; happens ≤ n/(m+1) times in total
        val dead = buf.iterator.collect { case (t, 1L) => t }.toList
        buf.mapValuesInPlace((_, c) => c - 1)
        dead.foreach(buf.remove)
    }
    buf
  }

  override def merge(
      x: mutable.HashMap[UTF8String, Long],
      y: mutable.HashMap[UTF8String, Long]): mutable.HashMap[UTF8String, Long] = {
    y.foreach { case (t, c) => x.update(t, x.getOrElse(t, 0L) + c) }
    if (x.size > capacity) {
      val cut = x.values.toArray.sorted(Ordering[Long].reverse).apply(capacity)
      val dead = x.iterator.collect { case (t, c) if c - cut <= 0 => t }.toList
      x.mapValuesInPlace((_, c) => c - cut)
      dead.foreach(x.remove)
    }
    x
  }

  override def eval(buf: mutable.HashMap[UTF8String, Long]): Any = {
    // deterministic map-entry order (hash maps iterate arbitrarily)
    val entries = buf.toArray.sortBy(_._1.toString)
    ArrayBasedMapData(
      entries.map(_._1.asInstanceOf[Any]),
      entries.map(_._2.asInstanceOf[Any]))
  }

  override def serialize(buf: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (t, c) =>
      val b = t.getBytes
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[UTF8String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(UTF8String.fromBytes(b), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesAgg =
    copy(child = newChildren.head)
  override def prettyName: String = "graft_misra_gries"
}
