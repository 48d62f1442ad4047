package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.TernaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.{ExprBridge => ExpressionUtils}
import org.apache.spark.sql.types._

/** Exact per-group top-k rows as a bounded `TypedImperativeAggregate`.
  *
  * Why it matters at 100 TB: the textbook per-group top-k
  * (`row_number() OVER (PARTITION BY g ORDER BY v)` then `rn <= k`)
  * shuffles EVERY input row to its group's reducer and sorts the full
  * group — at web scale that is the whole table through the exchange
  * to keep k rows per group. This aggregate keeps a k-bounded
  * worst-first heap per group; partial aggregation (map-side combine)
  * caps the exchange payload at k rows per group PER MAP TASK
  * regardless of input size, and merge is heap-union. Same
  * result-set contract as the window route (ties on the order key
  * break by the caller-supplied unique tie key, ascending), pinned by
  * spec and by a DuckDB `row_number` oracle.
  *
  * Children: (orderKey DOUBLE, tieKey LONG, payload STRUCT). Rows with
  * a NULL order or tie key are excluded (the window oracle's
  * `WHERE v IS NOT NULL` counterpart). NaN orders greatest, matching
  * Spark sort semantics. Output: `array<payload>` best-first.
  */
object TopKRows {

  final case class Entry(key: Double, tie: Long, row: UnsafeRow)

  /** Worst-first comparator: the heap root is the entry to evict.
    * `desc = true` keeps the k LARGEST keys (so the smallest key is
    * the worst); ties on key make the LARGER tie the worse entry
    * (smaller tie wins a spot, matching `ORDER BY v DESC, tie ASC`).
    */
  private def worstFirst(desc: Boolean): java.util.Comparator[Entry] =
    new java.util.Comparator[Entry] {
      override def compare(a: Entry, b: Entry): Int = {
        val c =
          if (desc) java.lang.Double.compare(a.key, b.key)
          else java.lang.Double.compare(b.key, a.key)
        if (c != 0) c else java.lang.Long.compare(b.tie, a.tie)
      }
    }

  final class Buf(k: Int, desc: Boolean) {
    val heap = new java.util.PriorityQueue[Entry](k, worstFirst(desc))
    private val cmp = worstFirst(desc)
    def offer(e: Entry): Unit =
      if (heap.size < k) { heap.add(e); () }
      else if (cmp.compare(heap.peek(), e) < 0) { heap.poll(); heap.add(e); () }
  }

  case class TopKRowsAgg(
      first: Expression,
      second: Expression,
      third: Expression,
      k: Int,
      desc: Boolean,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[Buf] with TernaryLike[Expression] {

    require(k > 0, s"top-k needs k > 0, got $k")

    // deferred to analysis: children are unresolved (NullType) at
    // construction when built through the Column wrapper
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      if (first.dataType != DoubleType) TypeCheckResult.TypeCheckFailure(
        s"order key must be DOUBLE (cast upstream), got ${first.dataType.simpleString}")
      else if (second.dataType != LongType) TypeCheckResult.TypeCheckFailure(
        s"tie key must be LONG (cast upstream), got ${second.dataType.simpleString}")
      else if (!third.dataType.isInstanceOf[StructType]) TypeCheckResult.TypeCheckFailure(
        s"payload must be a STRUCT, got ${third.dataType.simpleString}")
      else TypeCheckResult.TypeCheckSuccess
    }
    private def payloadType: StructType = third.dataType.asInstanceOf[StructType]

    override def dataType: DataType = ArrayType(payloadType, containsNull = false)
    override def nullable: Boolean = false
    override def prettyName: String = "graft_top_k_rows"

    @transient private lazy val proj = UnsafeProjection.create(payloadType)

    override def createAggregationBuffer(): Buf = new Buf(k, desc)

    override def update(buf: Buf, input: InternalRow): Buf = {
      val kv = first.eval(input)
      val tv = second.eval(input)
      if (kv != null && tv != null) {
        val payload = third.eval(input).asInstanceOf[InternalRow]
        // copy: both the projection's buffer and the source row are
        // reused across input rows
        buf.offer(Entry(kv.asInstanceOf[Double], tv.asInstanceOf[Long],
          proj(payload).copy()))
      }
      buf
    }

    override def merge(buf: Buf, other: Buf): Buf = {
      val it = other.heap.iterator()
      while (it.hasNext) buf.offer(it.next())
      buf
    }

    override def eval(buf: Buf): Any = {
      val entries = buf.heap.toArray(new Array[Entry](buf.heap.size))
      // best-first output order: the reverse of the worst-first heap order
      java.util.Arrays.sort(entries,
        java.util.Collections.reverseOrder(worstFirst(desc)))
      new GenericArrayData(entries.map(_.row.asInstanceOf[Any]))
    }

    override def serialize(buf: Buf): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val out = new DataOutputStream(bos)
      out.writeInt(buf.heap.size)
      val it = buf.heap.iterator()
      while (it.hasNext) {
        val e = it.next()
        out.writeDouble(e.key)
        out.writeLong(e.tie)
        val b = e.row.getBytes
        out.writeInt(b.length)
        out.write(b)
      }
      out.flush()
      bos.toByteArray
    }

    override def deserialize(bytes: Array[Byte]): Buf = {
      val in = new DataInputStream(new ByteArrayInputStream(bytes))
      val n = in.readInt()
      val buf = new Buf(k, desc)
      var i = 0
      while (i < n) {
        val key = in.readDouble()
        val tie = in.readLong()
        val len = in.readInt()
        val b = new Array[Byte](len)
        in.readFully(b)
        val row = new UnsafeRow(payloadType.length)
        row.pointTo(b, len)
        buf.offer(Entry(key, tie, row))
        i += 1
      }
      buf
    }

    override def withNewMutableAggBufferOffset(offset: Int): TopKRowsAgg =
      copy(mutableAggBufferOffset = offset)
    override def withNewInputAggBufferOffset(offset: Int): TopKRowsAgg =
      copy(inputAggBufferOffset = offset)
    override protected def withNewChildrenInternal(
        f: Expression, s: Expression, t: Expression): TopKRowsAgg =
      copy(first = f, second = s, third = t)
  }

  /** Column wrapper: `topKRows($"v".cast("double"), $"id".cast("long"),
    * struct(cols), k = 3, desc = true)`.
    */
  def topKRows(order: Column, tie: Column, payload: Column,
      k: Int, desc: Boolean): Column =
    ExpressionUtils.column(TopKRowsAgg(
      ExpressionUtils.expression(order),
      ExpressionUtils.expression(tie),
      ExpressionUtils.expression(payload),
      k, desc).toAggregateExpression())
}
