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

/** One-pass MinHash signature sketch as a native
  * `TypedImperativeAggregate` (the custom-sketch slot SURVEY.md §5
  * reserved for the 100 TB dedup path).
  *
  * Semantics: for each of k hash slots, the minimum of `md5("<i>:" ++
  * value)` hex over the group — EXACTLY the formula the composable
  * DataFrame form uses (k separate `min(md5(concat(i,':',shingle)))`
  * aggregates, see q_dedup_minhash), so the two paths are
  * interchangeable and cross-checked in MinHashAggSpec.
  *
  * Why a typed aggregate: one buffer of k strings per group, one pass
  * over the input, partial-merge = element-wise min — at 100 TB the
  * planner runs it map-side like any hash aggregate, and the buffer is
  * O(k) regardless of group size (vs collect_set's O(group)).
  */
case class MinHashAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[String]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "min_hash_sig"

  override def createAggregationBuffer(): Array[String] = Array.fill[String](k)(null)

  private def md5hex(s: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  override def update(buf: Array[String], input: InternalRow): Array[String] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String].toString
      var i = 0
      while (i < k) {
        val h = md5hex(s"$i:$s")
        if (buf(i) == null || h < buf(i)) buf(i) = h
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[String], b: Array[String]): Array[String] = {
    var i = 0
    while (i < k) {
      if (a(i) == null || (b(i) != null && b(i) < a(i))) a(i) = b(i)
      i += 1
    }
    a
  }

  override def eval(buf: Array[String]): Any =
    new GenericArrayData(buf.map(s => if (s == null) null else UTF8String.fromString(s)))

  override def serialize(buf: Array[String]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach { s =>
      out.writeBoolean(s != null)
      if (s != null) out.writeUTF(s)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[String] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    Array.fill(in.readInt())(if (in.readBoolean()) in.readUTF() else null)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinHashAgg =
    copy(child = newChildren.head)
}

object MinHashAgg {
  /** Column-API entry: `minHashSig(col, 8)` aggregates to an array of 8
    * md5-hex signature minima. */
  def minHashSig(c: Column, k: Int): Column =
    ExpressionUtils.column(
      MinHashAgg(ExpressionUtils.expression(c), k).toAggregateExpression())
}
