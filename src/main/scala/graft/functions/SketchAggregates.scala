package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom typed-imperative aggregates (the UDAF rung of the extension ladder —
  * bounded mutable state per group, partial/merge/final like HLL or KLL, not a
  * fold of built-ins).
  *
  * [[BottomK]] is a bottom-k (KMV) sketch: the k smallest DISTINCT values of a
  * string column per group. Unlike most sketches its result is a pure function
  * of the input SET — insertion order, partitioning, and merge order cannot
  * change it — so it is exactly reproducible anywhere (and an exact SQL oracle
  * applies). Uses: distinct-count estimation ((k-1)/F(k-th) for hash inputs),
  * set-similarity between groups (KMV sketch intersection), cheap per-group
  * "signature" rows. State is O(k) per group; update/merge are map-side, so a
  * 100 TB scan shuffles only k strings per group. */
object SketchAggregates {

  /** k smallest distinct values, ascending. Null inputs ignored; empty group →
    * empty array. */
  case class BottomK(child: Expression, k: Int,
                     mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[java.util.TreeSet[UTF8String]]
      with UnaryLike[Expression] {
    require(k >= 1 && k <= 65536, s"bottom_k: k out of range: $k")

    override def createAggregationBuffer(): java.util.TreeSet[UTF8String] =
      new java.util.TreeSet[UTF8String]()

    override def update(buf: java.util.TreeSet[UTF8String], input: InternalRow)
    : java.util.TreeSet[UTF8String] = {
      child.eval(input) match {
        case null => ()
        case v: UTF8String =>
          // copy: the incoming UTF8String may alias a reused row buffer.
          // Evict only on a GENUINE insert — re-adding a value already in the
          // set returns false and must not pop the current max.
          if (buf.size < k) { buf.add(v.clone()); () }
          else if (v.compareTo(buf.last()) < 0 && buf.add(v.clone())) {
            buf.pollLast(); ()
          }
      }
      buf
    }

    override def merge(a: java.util.TreeSet[UTF8String], b: java.util.TreeSet[UTF8String])
    : java.util.TreeSet[UTF8String] = {
      val it = b.iterator()
      while (it.hasNext) {
        val v = it.next()
        if (a.size < k) { a.add(v); () }
        else if (v.compareTo(a.last()) < 0 && a.add(v)) { a.pollLast(); () }
      }
      a
    }

    override def eval(buf: java.util.TreeSet[UTF8String]): Any =
      new GenericArrayData(buf.toArray.asInstanceOf[Array[AnyRef]])

    override def serialize(buf: java.util.TreeSet[UTF8String]): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val out = new DataOutputStream(bos)
      out.writeInt(buf.size)
      val it = buf.iterator()
      while (it.hasNext) {
        val bytes = it.next().getBytes
        out.writeInt(bytes.length)
        out.write(bytes)
      }
      out.flush(); bos.toByteArray
    }

    override def deserialize(bytes: Array[Byte]): java.util.TreeSet[UTF8String] = {
      val in = new DataInputStream(new ByteArrayInputStream(bytes))
      val buf = createAggregationBuffer()
      var n = in.readInt()
      while (n > 0) {
        val b = new Array[Byte](in.readInt())
        in.readFully(b)
        buf.add(UTF8String.fromBytes(b))
        n -= 1
      }
      buf
    }

    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullable: Boolean = false
    override def withNewMutableAggBufferOffset(offset: Int): BottomK =
      copy(mutableAggBufferOffset = offset)
    override def withNewInputAggBufferOffset(offset: Int): BottomK =
      copy(inputAggBufferOffset = offset)
    override protected def withNewChildInternal(newChild: Expression): BottomK =
      copy(child = newChild)
    override def prettyName: String = "bottom_k"
  }

  import org.apache.spark.sql.graft.ColumnBridge.{column, expression}

  /** DataFrame-side: `bottomK(col, k)` usable inside `agg(...)`. */
  def bottomK(c: Column, k: Int): Column =
    column(BottomK(expression(c), k).toAggregateExpression())
}
