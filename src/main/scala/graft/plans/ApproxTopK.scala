package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.graftbridge.{ExprBridge => ExpressionUtils}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SpaceSaving heavy hitters (Metwally, Agrawal, El Abbadi 2005:
  * "Efficient computation of frequent and top-k elements in data
  * streams") as a Catalyst `TypedImperativeAggregate`.
  *
  * Why it matters at 100 TB: exact corpus-wide top-k
  * (`groupBy(gram).count.orderBy.limit`) shuffles one row per DISTINCT
  * gram — billions for web-scale n-grams. SpaceSaving keeps a bounded
  * `capacity`-entry summary per partition, partial summaries MERGE
  * (mergeable-summaries property, Agarwal et al. 2012), and the shuffle
  * carries at most `capacity` entries per map task regardless of input
  * size. Guarantee: any value with true count > N/capacity is present,
  * and reported counts overestimate by at most the tracked `err`.
  * When distinct values ≤ capacity, no eviction happens and the counts
  * are EXACT (which is what the oracle gate exercises).
  *
  * Output: array<struct<value, count, err>> sorted by (count DESC,
  * value ASC), truncated to `k`.
  */
object ApproxTopK {

  // value → [count, err]
  type SSBuf = java.util.HashMap[Any, Array[Long]]

  case class SpaceSavingTopK(
      child: Expression,
      k: Int,
      capacity: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[SSBuf] with UnaryLike[Expression] {

    require(k > 0 && capacity >= k, s"need capacity >= k > 0, got k=$k capacity=$capacity")

    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("value", child.dataType),
      StructField("count", LongType, nullable = false),
      StructField("err", LongType, nullable = false))), containsNull = false)
    override def nullable: Boolean = false
    override def prettyName: String = "graft_approx_top_k"

    @transient private lazy val valueOrd = TypeUtils.getInterpretedOrdering(child.dataType)

    override def createAggregationBuffer(): SSBuf = new java.util.HashMap[Any, Array[Long]]()

    /** Core SpaceSaving offer of an entry claiming true count in
      * [cnt − err, cnt]: add to the tracked entry; adopt a free slot if
      * under capacity; otherwise evict the min-count entry and inherit
      * its count as additional error (the classic substitution step).
      */
    private def offer(buf: SSBuf, key: Any, cnt: Long, err: Long): Unit = {
      val cur = buf.get(key)
      if (cur != null) { cur(0) += cnt; cur(1) += err }
      else if (buf.size() < capacity) buf.put(key, Array(cnt, err))
      else {
        var minK: Any = null
        var minC = Long.MaxValue
        val it = buf.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue()(0) < minC) { minC = e.getValue()(0); minK = e.getKey }
        }
        buf.remove(minK)
        buf.put(key, Array(minC + cnt, minC + err))
      }
    }

    override def update(buf: SSBuf, input: InternalRow): SSBuf = {
      val v = child.eval(input)
      if (v != null) {
        val key = v match {
          case s: UTF8String => s.clone()
          case other         => other
        }
        offer(buf, key, 1L, 0L)
      }
      buf
    }

    override def merge(buf: SSBuf, other: SSBuf): SSBuf = {
      val it = other.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        offer(buf, e.getKey, e.getValue()(0), e.getValue()(1))
      }
      buf
    }

    override def eval(buf: SSBuf): Any = {
      val entries = new Array[(Any, Long, Long)](buf.size())
      val it = buf.entrySet().iterator()
      var i = 0
      while (it.hasNext) {
        val e = it.next()
        entries(i) = (e.getKey, e.getValue()(0), e.getValue()(1))
        i += 1
      }
      java.util.Arrays.sort(entries, new java.util.Comparator[(Any, Long, Long)] {
        override def compare(a: (Any, Long, Long), b: (Any, Long, Long)): Int = {
          val c = java.lang.Long.compare(b._2, a._2) // count DESC
          if (c != 0) c else valueOrd.compare(a._1, b._1) // value ASC
        }
      })
      new GenericArrayData(entries.take(k).map { case (v, c, e) =>
        new GenericInternalRow(Array[Any](v, c, e))
      })
    }

    override def serialize(buf: SSBuf): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val out = new DataOutputStream(bos)
      out.writeInt(buf.size())
      val it = buf.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        e.getKey match { // same type tags as RefAggregates.HistogramAgg
          case v: java.lang.Long    => out.writeByte(0); out.writeLong(v)
          case v: java.lang.Double  => out.writeByte(1); out.writeDouble(v)
          case v: java.lang.Integer => out.writeByte(2); out.writeInt(v)
          case v: UTF8String =>
            val b = v.getBytes
            out.writeByte(3); out.writeInt(b.length); out.write(b)
          case v: java.lang.Short   => out.writeByte(4); out.writeShort(v.toInt)
          case v: java.lang.Byte    => out.writeByte(5); out.writeByte(v.toInt)
          case v: java.lang.Boolean => out.writeByte(6); out.writeBoolean(v)
          case v: java.lang.Float   => out.writeByte(7); out.writeFloat(v)
          case other => throw new UnsupportedOperationException(
            s"approx_top_k: unsupported key ${other.getClass}")
        }
        out.writeLong(e.getValue()(0))
        out.writeLong(e.getValue()(1))
      }
      out.flush()
      bos.toByteArray
    }

    override def deserialize(bytes: Array[Byte]): SSBuf = {
      val in = new DataInputStream(new ByteArrayInputStream(bytes))
      val n = in.readInt()
      val buf = new java.util.HashMap[Any, Array[Long]](n * 2)
      var i = 0
      while (i < n) {
        val key: Any = in.readByte() match {
          case 0 => in.readLong()
          case 1 => in.readDouble()
          case 2 => in.readInt()
          case 3 =>
            val len = in.readInt()
            val b = new Array[Byte](len)
            in.readFully(b)
            UTF8String.fromBytes(b)
          case 4 => in.readShort()
          case 5 => in.readByte()
          case 6 => in.readBoolean()
          case 7 => in.readFloat()
        }
        buf.put(key, Array(in.readLong(), in.readLong()))
        i += 1
      }
      buf
    }

    override def withNewMutableAggBufferOffset(offset: Int): SpaceSavingTopK =
      copy(mutableAggBufferOffset = offset)
    override def withNewInputAggBufferOffset(offset: Int): SpaceSavingTopK =
      copy(inputAggBufferOffset = offset)
    override protected def withNewChildInternal(c: Expression): SpaceSavingTopK =
      copy(child = c)
  }

  /** Column wrapper: `approxTopK($"gram", k = 100, capacity = 4096)`. */
  def approxTopK(c: Column, k: Int, capacity: Int): Column =
    ExpressionUtils.column(
      SpaceSavingTopK(ExpressionUtils.expression(c), k, capacity).toAggregateExpression())
}
