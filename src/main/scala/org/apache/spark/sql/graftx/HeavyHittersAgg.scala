package org.apache.spark.sql.graftx

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.{ImperativeAggregate, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters sketch as a `TypedImperativeAggregate`: the
  * single-pass, O(k)-memory, MERGEABLE frequent-items summary (Agarwal et
  * al., "Mergeable Summaries") — the corpus-stats op that replaces a full
  * `groupBy(token).count()` shuffle when only the frequent tail matters at
  * 100 TB. Upstream analog: none (sketch family, SURVEY.md §3B marks it
  * no-oracle by design); bounds are asserted in scalatest instead.
  *
  * Guarantees with k counters over N items (they survive partial/merge,
  * which is the point of the MG merge rule):
  *   - estimate ≤ true count (underestimate only);
  *   - estimate ≥ true count − N/(k+1);
  *   - any item with true count > N/(k+1) is PRESENT in the summary.
  *
  * update: hit → +1; miss with free slot → insert 1; miss when full →
  * decrement ALL by 1, drop zeros (amortized O(1) per input: each
  * decrement pays for k+1 arrivals). merge: pointwise sum, then subtract
  * the (k+1)-th largest count from all and keep positives — the summary
  * stays ≤ k counters with the same error bound.
  */
case class HeavyHittersAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[HeavyHittersAgg.Buf] {
  require(k > 0, s"heavy_hitters needs k > 0, got $k")

  import HeavyHittersAgg.Buf

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType), StructField("est", LongType))))
  override def prettyName: String = "heavy_hitters"

  override def createAggregationBuffer(): Buf =
    new Buf(new java.util.HashMap[String, java.lang.Long](), 0L)

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) {
      buf.n += 1
      val s = v.asInstanceOf[UTF8String].toString
      val cur = buf.counts.get(s)
      if (cur != null) buf.counts.put(s, java.lang.Long.valueOf(cur.longValue() + 1L))
      else if (buf.counts.size < k) buf.counts.put(s, java.lang.Long.valueOf(1L))
      else {
        // decrement-all: every counter (and implicitly the new item) loses 1
        val it = buf.counts.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue.longValue() <= 1L) it.remove()
          else e.setValue(java.lang.Long.valueOf(e.getValue.longValue() - 1L))
        }
      }
    }
    buf
  }

  override def merge(a: Buf, b: Buf): Buf = {
    a.n += b.n
    b.counts.forEach { (s, c) =>
      val cur = a.counts.get(s)
      a.counts.put(s,
        if (cur == null) c else java.lang.Long.valueOf(cur.longValue() + c.longValue()))
    }
    if (a.counts.size > k) {
      // subtract the (k+1)-th largest count from everything, keep positives
      val values = new java.util.ArrayList[java.lang.Long](a.counts.values())
      values.sort(java.util.Collections.reverseOrder[java.lang.Long]())
      val cut = values.get(k).longValue()
      val it = a.counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue.longValue() <= cut) it.remove()
        else e.setValue(java.lang.Long.valueOf(e.getValue.longValue() - cut))
      }
    }
    a
  }

  override def eval(buf: Buf): Any = {
    // deterministic output order: estimate desc, item asc
    val rows = new Array[AnyRef](buf.counts.size)
    val entries = new java.util.ArrayList(buf.counts.entrySet())
    entries.sort { (x, y) =>
      val c = java.lang.Long.compare(y.getValue.longValue(), x.getValue.longValue())
      if (c != 0) c else x.getKey.compareTo(y.getKey)
    }
    var i = 0
    while (i < rows.length) {
      val e = entries.get(i)
      rows(i) = InternalRow(UTF8String.fromString(e.getKey), e.getValue.longValue())
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(buf.n)
    out.writeInt(buf.counts.size)
    buf.counts.forEach { (s, c) => out.writeUTF(s); out.writeLong(c.longValue()) }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readLong()
    val size = in.readInt()
    val m = new java.util.HashMap[String, java.lang.Long]()
    var i = 0
    while (i < size) { m.put(in.readUTF(), java.lang.Long.valueOf(in.readLong())); i += 1 }
    new Buf(m, n)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HeavyHittersAgg =
    copy(child = newChildren.head)
}

object HeavyHittersAgg {
  /** MG summary buffer: ≤ k counters + items-seen total. */
  final class Buf(val counts: java.util.HashMap[String, java.lang.Long], var n: Long)

  /** Column-API entry: `heavyHitters(col, 64)` aggregates to an array of
    * (item, est) structs, largest estimates first. */
  def heavyHitters(c: Column, k: Int): Column =
    ExpressionUtils.column(
      HeavyHittersAgg(ExpressionUtils.expression(c), k).toAggregateExpression())
}
