package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.graftbridge.{ExprBridge => ExpressionUtils}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Exact-parity Median and Mode — the reference's histogram-based
  * accumulators (nimlite/funcs/groupby.nim:280-441) as Catalyst
  * `TypedImperativeAggregate`s.
  *
  * Both build a value → count histogram, so partial aggregation works:
  * map-side histograms merge by key addition — ONE shuffle carrying one
  * (value, count) pair per distinct value per partition, never the raw
  * rows. The composed alternative (groupBy(value).count + window over the
  * histogram) costs two shuffles and a per-group sort. Buffer size is
  * bounded by the column's distinct-value count per group — same memory
  * shape as the reference's in-process histogram.
  *
  * Reference semantics reproduced exactly (groupby.nim:357-390 median,
  * 394-441 mode; pinned by tests/test_groupby_and_pivot.py:387-432):
  *
  *  - Median parity is decided by the number of DISTINCT values, not the
  *    row count: keys==1 → that value; keys odd → the first value (sorted
  *    ascending) whose cumulative count exceeds half the total rows;
  *    keys even → the mean of that value and its predecessor. So
  *    [3,3,6,6,9,9] → 6 (3 distinct, odd) and [3,3,3,9,9,9] → 6.0
  *    (2 distinct, even → (3+9)/2), where a row-parity median gives 6
  *    for both by interpolation.
  *  - Mode is the most frequent value; count ties break to the LARGEST
  *    value (sortedHistogramReversed: descending (count, value)).
  *
  * Divergence (documented): the reference dereferences an undefined
  * predecessor when the first distinct value already crosses the midpoint
  * on an even distinct count (e.g. [1,1,2]) — a crash. We return that
  * value itself as a float.
  */
object RefAggregates {

  type Hist = java.util.HashMap[Any, java.lang.Long]

  /** Shared histogram machinery: update/merge/serialize over a
    * value → count map keyed by the Catalyst value (Long/Double/Int/
    * UTF8String/...). Serialization writes a type tag per key —
    * supported atomic types cover the reference's type system.
    */
  abstract class HistogramAgg extends TypedImperativeAggregate[Hist]
      with UnaryLike[Expression] {

    override def createAggregationBuffer(): Hist = new java.util.HashMap[Any, java.lang.Long]()

    private def add(buf: Hist, key: Any, n: Long): Unit = {
      val cur = buf.get(key)
      buf.put(key, java.lang.Long.valueOf(if (cur == null) n else cur.longValue() + n))
    }

    override def update(buf: Hist, input: InternalRow): Hist = {
      val v = child.eval(input)
      if (v != null) {
        // UTF8String from an unsafe row points into the row buffer — copy
        val key = v match {
          case s: UTF8String => s.clone()
          case other         => other
        }
        add(buf, key, 1L)
      }
      buf
    }

    override def merge(buf: Hist, other: Hist): Hist = {
      val it = other.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        add(buf, e.getKey, e.getValue.longValue())
      }
      buf
    }

    override def serialize(buf: Hist): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val out = new DataOutputStream(bos)
      out.writeInt(buf.size())
      val it = buf.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        e.getKey match {
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
            s"histogram aggregate: unsupported key ${other.getClass}")
        }
        out.writeLong(e.getValue.longValue())
      }
      out.flush()
      bos.toByteArray
    }

    override def deserialize(bytes: Array[Byte]): Hist = {
      val in = new DataInputStream(new ByteArrayInputStream(bytes))
      val n = in.readInt()
      val buf = new java.util.HashMap[Any, java.lang.Long](n * 2)
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
        buf.put(key, java.lang.Long.valueOf(in.readLong()))
        i += 1
      }
      buf
    }

    override def nullable: Boolean = true
  }

  /** Distinct-parity median (groupby.nim:343-390). Input coerced to
    * double (use `apply` / the wrappers, which insert the cast); result
    * is DoubleType (the reference returns the original int on the odd
    * path — numerically identical).
    */
  case class RefMedian(
      child: Expression,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0) extends HistogramAgg {

    override def dataType: DataType = DoubleType
    override def prettyName: String = "graft_ref_median"

    override def eval(buf: Hist): Any = {
      val keys = buf.size()
      if (keys == 0) return null
      val entries = new Array[(Double, Long)](keys)
      val it = buf.entrySet().iterator()
      var i = 0
      var total = 0L
      while (it.hasNext) {
        val e = it.next()
        entries(i) = (e.getKey.asInstanceOf[Double], e.getValue.longValue())
        total += e.getValue.longValue()
        i += 1
      }
      if (keys == 1) return entries(0)._1
      java.util.Arrays.sort(entries, Ordering.by((p: (Double, Long)) => p._1))
      val midpoint = total / 2.0
      var cum = 0L
      i = 0
      if (keys % 2 == 0) {
        var prev = Double.NaN
        var hasPrev = false
        while (i < keys) {
          cum += entries(i)._2
          if (cum > midpoint) {
            // reference crashes when the first value already crosses the
            // midpoint (undefined predecessor); we return the value itself
            return if (hasPrev) (prev + entries(i)._1) / 2.0 else entries(i)._1
          }
          prev = entries(i)._1
          hasPrev = true
          i += 1
        }
        null
      } else {
        while (i < keys) {
          cum += entries(i)._2
          if (cum > midpoint) return entries(i)._1
          i += 1
        }
        null
      }
    }

    override def withNewMutableAggBufferOffset(offset: Int): RefMedian =
      copy(mutableAggBufferOffset = offset)
    override def withNewInputAggBufferOffset(offset: Int): RefMedian =
      copy(inputAggBufferOffset = offset)
    override protected def withNewChildInternal(c: Expression): RefMedian = copy(child = c)
  }

  /** Mode with the reference's tie-break: most frequent value, count ties
    * broken to the largest value (groupby.nim:394-441). Output type =
    * input type; works on any ordered atomic type (numbers, strings,
    * dates as days, timestamps as micros).
    */
  case class RefMode(
      child: Expression,
      tieLargest: Boolean = true,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0) extends HistogramAgg {

    override def dataType: DataType = child.dataType
    override def prettyName: String = "graft_ref_mode"
    @transient private lazy val valueOrd = TypeUtils.getInterpretedOrdering(child.dataType)

    // groupby mode ties to the LARGEST value (groupby.nim:394-441);
    // summary_statistics mode ties to the SMALLEST (utils.py ascending
    // scan with strict `>`) — tieLargest selects which contract
    override def eval(buf: Hist): Any = {
      if (buf.isEmpty) return null
      var bestV: Any = null
      var bestC = -1L
      val it = buf.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val c = e.getValue.longValue()
        val cmp = if (bestV == null) 0 else valueOrd.compare(e.getKey, bestV)
        if (c > bestC || (c == bestC && (if (tieLargest) cmp > 0 else cmp < 0))) {
          bestV = e.getKey
          bestC = c
        }
      }
      bestV
    }

    override def withNewMutableAggBufferOffset(offset: Int): RefMode =
      copy(mutableAggBufferOffset = offset)
    override def withNewInputAggBufferOffset(offset: Int): RefMode =
      copy(inputAggBufferOffset = offset)
    override protected def withNewChildInternal(c: Expression): RefMode = copy(child = c)
  }

  /** Wrap a median input in the double coercion the aggregate expects
    * (no-op casts are removed by the optimizer).
    */
  /** Count-threshold quartile — the reference's `summary_statistics`
    * quantile method (utils.py:241-270), distinct from [[RefMedian]]'s
    * distinct-parity groupby median. `p` is the quarter numerator
    * (1 = iqr_low, 2 = median, 3 = iqr_high). Walking the sorted
    * histogram with cumulative counts: a value strictly straddling
    * `total·p/4` wins outright; landing exactly ON the threshold
    * interpolates with the predecessor by `divmod(p·(total−1), 4)`
    * weights. Pinned by test_api_basics.py:662-681 ([1,2,3] →
    * 1 / 2 / 3 where continuous percentile gives 1.5 / 2 / 2.5).
    */
  case class RefQuartile(
      child: Expression,
      p: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0) extends HistogramAgg {
    require(p >= 1 && p <= 3, s"quarter numerator: $p")

    override def dataType: DataType = DoubleType
    override def prettyName: String = s"graft_ref_quartile_$p"

    override def eval(buf: Hist): Any = {
      if (buf.isEmpty) return null
      val entries = new Array[(Double, Long)](buf.size())
      val it = buf.entrySet().iterator()
      var i = 0
      var total = 0L
      while (it.hasNext) {
        val e = it.next()
        entries(i) = (e.getKey.asInstanceOf[Double], e.getValue.longValue())
        total += e.getValue.longValue()
        i += 1
      }
      java.util.Arrays.sort(entries, Ordering.by((x: (Double, Long)) => x._1))
      val thr = total.toDouble * p / 4.0
      var cum = 0L
      var prev = Double.NaN
      i = 0
      while (i < entries.length) {
        val before = cum
        cum += entries(i)._2
        if (before < thr && thr < cum) return entries(i)._1
        else if (before.toDouble == thr) {
          val delta = (p.toLong * (total - 1)) % 4
          return (prev * (4 - delta) + entries(i)._1 * delta) / 4.0
        }
        prev = entries(i)._1
        i += 1
      }
      entries(entries.length - 1)._1
    }

    override def withNewMutableAggBufferOffset(offset: Int): RefQuartile =
      copy(mutableAggBufferOffset = offset)
    override def withNewInputAggBufferOffset(offset: Int): RefQuartile =
      copy(inputAggBufferOffset = offset)
    override protected def withNewChildInternal(c: Expression): RefQuartile = copy(child = c)
  }

  /** Primitive open-address double→count histogram — [[HistMedian]]'s
    * aggregation buffer. The generic `java.util.HashMap[Any, Long]`
    * buffer costs a Double box + a Long box per update; with hundreds of
    * thousands of groups each carrying its own map, that allocation
    * churn IS the aggregate's cost (measured on q_groupby_accs). Two
    * parallel primitive arrays, linear probing, NaN-key slot sentinel
    * (real NaN inputs never reach the buffer — Spark's `=!= NaN` inputs
    * do, but a NaN key would be un-probe-able anyway and the reference
    * skips non-comparable values; nulls are skipped upstream).
    */
  final class DoubleHist(initialCapacity: Int = 8) {
    private val cap0 = Integer.highestOneBit(math.max(initialCapacity, 4))
    private var keys = new Array[Double](cap0)
    private var vals = new Array[Long](cap0)
    private var used = new Array[Boolean](cap0)
    private var cnt = 0
    // NaN can't live in an open-address slot (NaN != NaN breaks probing);
    // the boxed-map buffer coalesced NaNs via Double.equals, so keep that
    // contract with a dedicated counter, emitted as one trailing entry
    private var nanCnt = 0L

    def size: Int = cnt + (if (nanCnt > 0) 1 else 0)
    def isEmpty: Boolean = cnt == 0 && nanCnt == 0L

    private def mask: Int = keys.length - 1

    def add(k0: Double, n: Long): Unit = {
      if (k0 != k0) { nanCnt += n; return }
      // canonicalize -0.0 → +0.0: probing compares with numeric == (which
      // says the two are equal) but Double.hashCode distinguishes them, so
      // without this the slot a zero lands in would depend on arrival order
      val k = if (k0 == 0.0d) 0.0d else k0
      var i = java.lang.Double.hashCode(k) & mask
      while (used(i) && keys(i) != k) i = (i + 1) & mask
      if (!used(i)) {
        used(i) = true; keys(i) = k; vals(i) = n; cnt += 1
        if (cnt * 2 > keys.length) grow()
      } else vals(i) += n
    }

    private def grow(): Unit = {
      val ok = keys; val ov = vals; val ou = used
      keys = new Array[Double](ok.length * 2)
      vals = new Array[Long](ok.length * 2)
      used = new Array[Boolean](ok.length * 2)
      cnt = 0
      var i = 0
      while (i < ok.length) { if (ou(i)) add(ok(i), ov(i)); i += 1 }
    }

    /** NaN entry (if any) is emitted LAST — sort-after-everything, the
      * Java array-sort convention the median walk relies on.
      */
    def foreach(f: (Double, Long) => Unit): Unit = {
      var i = 0
      while (i < keys.length) { if (used(i)) f(keys(i), vals(i)); i += 1 }
      if (nanCnt > 0) f(Double.NaN, nanCnt)
    }
  }

  /** Standard interpolating median (odd n → middle value, even n → mean
    * of the two middle values — the DuckDB/Spark `median` contract for
    * numeric input, unlike [[RefMedian]]'s distinct-parity reference
    * semantics) over a value→count histogram. One shuffle carrying
    * (value, count) pairs instead of `percentile(0.5)`'s every-row
    * buffer: the default exact-median route for grouped aggregation,
    * where the per-group distinct count is what bounds memory. Buffer is
    * the primitive [[DoubleHist]], serialized as flat (double, long)
    * pairs.
    */
  case class HistMedian(
      child: Expression,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[DoubleHist] with UnaryLike[Expression] {

    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def prettyName: String = "graft_hist_median"

    override def createAggregationBuffer(): DoubleHist = new DoubleHist()

    override def update(buf: DoubleHist, input: InternalRow): DoubleHist = {
      val v = child.eval(input)
      if (v != null) buf.add(v.asInstanceOf[Double], 1L)
      buf
    }

    override def merge(buf: DoubleHist, other: DoubleHist): DoubleHist = {
      other.foreach((k, n) => buf.add(k, n))
      buf
    }

    override def serialize(buf: DoubleHist): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(4 + buf.size * 16)
      out.putInt(buf.size)
      buf.foreach((k, n) => { out.putDouble(k); out.putLong(n) })
      out.array()
    }

    override def deserialize(bytes: Array[Byte]): DoubleHist = {
      val in = java.nio.ByteBuffer.wrap(bytes)
      val n = in.getInt
      val buf = new DoubleHist(Integer.highestOneBit(math.max(n, 4)) * 4)
      var i = 0
      while (i < n) { buf.add(in.getDouble, in.getLong); i += 1 }
      buf
    }

    override def eval(buf: DoubleHist): Any = {
      if (buf.isEmpty) return null
      val keys = new Array[Double](buf.size)
      val counts = new Array[Long](buf.size)
      var i = 0
      var total = 0L
      var nanN = 0L
      buf.foreach { (k, n) =>
        if (k != k) nanN = n // foreach emits the NaN entry last
        else { keys(i) = k; counts(i) = n; i += 1 }
        total += n
      }
      // sort the two parallel arrays by key (indices via boxed sort would
      // re-box; a simple insertion-friendly dual quicksort). NaN is kept
      // OUT of the sort (comparisons against it are all-false) and
      // appended after, matching Java's sort-NaN-last convention.
      sortPairs(keys, counts, 0, i - 1)
      if (nanN > 0L) { keys(i) = Double.NaN; counts(i) = nanN }
      val loRank = (total + 1) / 2 // 1-indexed lower-middle (== upper for odd n)
      val hiRank = total / 2 + 1
      var lo = Double.NaN
      var haveLo = false
      var cum = 0L
      i = 0
      while (i < keys.length) {
        cum += counts(i)
        if (!haveLo && cum >= loRank) { lo = keys(i); haveLo = true }
        if (cum >= hiRank) return (lo + keys(i)) / 2.0
        i += 1
      }
      null // unreachable: hiRank <= total
    }

    private def sortPairs(k: Array[Double], v: Array[Long], lo: Int, hi: Int): Unit = {
      if (lo >= hi) return
      if (hi - lo < 16) { // insertion sort for small runs
        var i = lo + 1
        while (i <= hi) {
          val kk = k(i); val vv = v(i)
          var j = i - 1
          while (j >= lo && k(j) > kk) { k(j + 1) = k(j); v(j + 1) = v(j); j -= 1 }
          k(j + 1) = kk; v(j + 1) = vv
          i += 1
        }
        return
      }
      val pivot = k((lo + hi) >>> 1)
      var i = lo; var j = hi
      while (i <= j) {
        while (k(i) < pivot) i += 1
        while (k(j) > pivot) j -= 1
        if (i <= j) {
          val tk = k(i); k(i) = k(j); k(j) = tk
          val tv = v(i); v(i) = v(j); v(j) = tv
          i += 1; j -= 1
        }
      }
      sortPairs(k, v, lo, j)
      sortPairs(k, v, i, hi)
    }

    override def withNewMutableAggBufferOffset(offset: Int): HistMedian =
      copy(mutableAggBufferOffset = offset)
    override def withNewInputAggBufferOffset(offset: Int): HistMedian =
      copy(inputAggBufferOffset = offset)
    override protected def withNewChildInternal(c: Expression): HistMedian = copy(child = c)
  }

  def medianInput(e: Expression): Expression = Cast(e, DoubleType)

  // Column-API wrappers
  def refMedian(c: Column): Column =
    ExpressionUtils.column(
      RefMedian(medianInput(ExpressionUtils.expression(c))).toAggregateExpression())
  def histMedian(c: Column): Column =
    ExpressionUtils.column(
      HistMedian(medianInput(ExpressionUtils.expression(c))).toAggregateExpression())
  def refMode(c: Column): Column =
    ExpressionUtils.column(RefMode(ExpressionUtils.expression(c)).toAggregateExpression())
  def refQuartile(c: Column, p: Int): Column =
    ExpressionUtils.column(
      RefQuartile(medianInput(ExpressionUtils.expression(c)), p).toAggregateExpression())
}
