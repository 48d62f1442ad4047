package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.{ExprBridge => ExpressionUtils}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the similarity/dedup hot paths.
  *
  * The pure-`functions._` formulations (k-pass minhash via `transform`,
  * per-bit simhash via 64 `aggregate` calls, cosine via
  * `aggregate(zip_with(...))`) evaluate higher-order functions
  * interpretively — one lambda dispatch per element per pass. These
  * kernels do the same math in a single tight JVM loop per row, which
  * benchmarked ~10-50× faster at sf0.1 and is the difference between a
  * usable and unusable dedup pass at 100 TB.
  *
  * Every kernel implements `doGenCode` (not `CodegenFallback`): the
  * generated Java calls the static eval helpers below, so a projection
  * containing these expressions stays inside one WholeStageCodegen span —
  * no interpreted `eval(InternalRow)` dispatch, no input-row
  * materialization per call. The helpers are `object Kernels` methods;
  * Scala emits static forwarders on class `graft.plans.Kernels`, which is
  * what the generated code references.
  *
  * Hashing uses Spark's own XXH64 (catalyst's xxhash64 implementation),
  * seeded per minhash permutation.
  */
object Kernels {

  private def hashUtf8(s: UTF8String, seed: Long): Long = XXH64.hashUTF8String(s, seed)

  // ---------------------------------------------------------------------
  // Static eval helpers — single source of truth for both the interpreted
  // path (nullSafeEval) and the generated code (doGenCode emits a call).
  // ---------------------------------------------------------------------

  def simhashEval(arr: ArrayData): Long = {
    val counts = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = hashUtf8(arr.getUTF8String(i), 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) != 0L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  def minhashSigEval(arr: ArrayData, k: Int): ArrayData = {
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val base = hashUtf8(arr.getUTF8String(i), 0L)
        var j = 0
        while (j < k) {
          val h = XXH64.hashLong(base, j.toLong)
          if (h < mins(j)) mins(j) = h
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  def cosineEval(a: ArrayData, b: ArrayData, aIsFloat: Boolean, bIsFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (aIsFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bIsFloat) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else dot / denom
  }

  /** keyKind: 0 = long/int (mightContainLong), 1 = string (UTF-8 bytes —
    * matches `BloomFilter.putString`'s encoding without a `String` alloc
    * per row).
    */
  def bloomMightContainEval(
      bloom: org.apache.spark.util.sketch.BloomFilter, v: Any, keyKind: Int): Boolean =
    if (keyKind == 0) {
      v match {
        case l: java.lang.Long    => bloom.mightContainLong(l)
        case i: java.lang.Integer => bloom.mightContainLong(i.longValue())
        case s: java.lang.Short   => bloom.mightContainLong(s.longValue())
        case b: java.lang.Byte    => bloom.mightContainLong(b.longValue())
        case _                    => true // unknown type: never prune
      }
    } else {
      bloom.mightContainBinary(v.asInstanceOf[UTF8String].getBytes)
    }

  /** Z-order value: per column, binary-search its quantile boundaries to a
    * bucket id (`bits` bits), then interleave the columns' bucket bits
    * MSB-first. Nulls sort to bucket 0. One tight loop per row, no alloc.
    */
  def zValueEval(arr: ArrayData, boundaries: Array[Array[Double]], bits: Int): Long = {
    val k = boundaries.length
    val buckets = new Array[Int](k)
    var c = 0
    while (c < k) {
      buckets(c) =
        if (arr.isNullAt(c)) 0
        else {
          val v = arr.getDouble(c)
          val bs = boundaries(c)
          // first index whose boundary exceeds v == count of boundaries <= v
          var lo = 0; var hi = bs.length
          while (lo < hi) {
            val mid = (lo + hi) >>> 1
            if (bs(mid) <= v) lo = mid + 1 else hi = mid
          }
          lo
        }
      c += 1
    }
    var z = 0L
    var b = bits - 1
    while (b >= 0) {
      var c2 = 0
      while (c2 < k) {
        z = (z << 1) | ((buckets(c2) >>> b) & 1)
        c2 += 1
      }
      b -= 1
    }
    z
  }

  /** elemKind: 0 = float, 1 = double, 2 = other (contributes 0.0). */
  def hyperplaneEval(a: ArrayData, nPlanes: Int, elemKind: Int): Long = {
    val n = a.numElements()
    var out = 0L
    var p = 0
    while (p < nPlanes) {
      var d = 0.0
      var i = 0
      while (i < n) {
        val v =
          if (elemKind == 0) a.getFloat(i).toDouble
          else if (elemKind == 1) a.getDouble(i)
          else 0.0
        // deterministic pseudo-random plane component in [-0.5, 0.5)
        val h = XXH64.hashLong(i.toLong, p.toLong)
        val comp = ((h & 0xFFFFFFL).toDouble / 0x1000000L.toDouble) - 0.5
        d += v * comp
        i += 1
      }
      if (d > 0) out |= (1L << p)
      p += 1
    }
    out
  }

  /** Query-directed multi-probe LSH (Lv et al., VLDB'07): emit the base
    * bucket plus the `nProbes − 1` cheapest perturbation buckets, where a
    * perturbation's cost is the summed |margin| of the flipped planes —
    * flipping the planes the vector barely cleared first. Subsets are
    * enumerated in nondecreasing cost with the classic shift/expand heap,
    * so cost is O(nProbes log nProbes) after the plane dot products —
    * no 2^nPlanes enumeration. Query-side only; the index keeps one
    * bucket per vector.
    */
  def hyperplaneProbesEval(
      a: ArrayData, nPlanes: Int, nProbes: Int, elemKind: Int): ArrayData = {
    val n = a.numElements()
    val margins = new Array[Double](nPlanes)
    var base = 0L
    var p = 0
    while (p < nPlanes) {
      var d = 0.0
      var i = 0
      while (i < n) {
        val v =
          if (elemKind == 0) a.getFloat(i).toDouble
          else if (elemKind == 1) a.getDouble(i)
          else 0.0
        val h = XXH64.hashLong(i.toLong, p.toLong)
        val comp = ((h & 0xFFFFFFL).toDouble / 0x1000000L.toDouble) - 0.5
        d += v * comp
        i += 1
      }
      if (d > 0) base |= (1L << p)
      // |margin| score (Lv et al. use x_i²; linear measured equal-or-
      // better on near-uniform data and is ordering-compatible)
      margins(p) = math.abs(d)
      p += 1
    }
    probeBuckets(base, margins, nPlanes, nProbes)
  }

  /** Shared multi-probe enumeration: base bucket + cheapest margin-
    * ordered perturbations (shift/expand heap — see
    * [[hyperplaneProbesEval]] for the algorithm notes). Used by both the
    * hash-derived and the learned-plane ([[learnedProbesEval]]) families.
    */
  private def probeBuckets(
      base: Long, margins: Array[Double], nPlanes: Int, nProbes: Int): ArrayData = {
    // Long-safe cap: 1 << nPlanes wraps for nPlanes >= 31 (the Long
    // bucket admits up to 63 planes). Floor at 1: the base bucket is
    // always emitted, so nProbes <= 0 (SQL misuse of graft_lsh_probes)
    // degrades to a single-probe lookup instead of an array-size crash
    // surfacing from inside codegen.
    val maxProbes =
      if (nPlanes >= 63) Long.MaxValue else 1L << nPlanes
    val out = new Array[Any](math.max(math.min(nProbes.toLong, maxProbes), 1L).toInt)
    out(0) = base
    if (out.length > 1) {
      // plane ids sorted by margin ascending; a perturbation set is a
      // bitmask over positions in this order
      val order = Array.range(0, nPlanes).sortBy(margins)
      val costOf = (mask: Long) => {
        var c = 0.0
        var b = 0
        while (b < nPlanes) { if ((mask & (1L << b)) != 0) c += margins(order(b)); b += 1 }
        c
      }
      val heap = new java.util.PriorityQueue[Long](16,
        (x: Long, y: Long) => java.lang.Double.compare(costOf(x), costOf(y)))
      heap.add(1L)
      var k = 1
      while (k < out.length && !heap.isEmpty) {
        val mask = heap.poll()
        var bucket = base
        var b = 0
        var maxB = 0
        while (b < nPlanes) {
          if ((mask & (1L << b)) != 0) { bucket ^= 1L << order(b); maxB = b }
          b += 1
        }
        out(k) = bucket
        k += 1
        if (maxB + 1 < nPlanes) {
          heap.add(mask | (1L << (maxB + 1)))                       // expand
          heap.add((mask & ~(1L << maxB)) | (1L << (maxB + 1)))     // shift
        }
      }
      if (k < out.length) return new GenericArrayData(out.take(k))
    }
    new GenericArrayData(out)
  }

  /** Signed margins against LEARNED hyperplanes (ITQ/PCA — planes(p) is
    * a d-vector, offsets(p) the plane's threshold): writes
    * `margins(p) = v·planes(p) − offsets(p)` and returns the sign-bit
    * bucket. The offsets carry the training mean (b_p = μ·w_p), so
    * centering never has to materialize a shifted vector column.
    */
  private def learnedMargins(
      a: ArrayData, planes: Array[Array[Double]], offsets: Array[Double],
      margins: Array[Double], elemKind: Int): Long = {
    val nPlanes = planes.length
    val n = a.numElements()
    var base = 0L
    var p = 0
    while (p < nPlanes) {
      val w = planes(p)
      val m = math.min(n, w.length)
      var d = -offsets(p)
      var i = 0
      while (i < m) {
        val v =
          if (elemKind == 0) a.getFloat(i).toDouble
          else if (elemKind == 1) a.getDouble(i)
          else 0.0
        d += v * w(i)
        i += 1
      }
      if (d > 0) base |= (1L << p)
      margins(p) = math.abs(d)
      p += 1
    }
    base
  }

  /** Learned-plane LSH bucket (data-dependent ITQ/PCA planes ride as
    * expression constants, like the IVF centroids).
    */
  def learnedBucketEval(
      a: ArrayData, planes: Array[Array[Double]], offsets: Array[Double],
      elemKind: Int): Long =
    learnedMargins(a, planes, offsets, new Array[Double](planes.length), elemKind)

  /** Query-directed multi-probe over learned planes — same Lv et al.
    * enumeration as [[hyperplaneProbesEval]], margins from the trained
    * projection.
    */
  def learnedProbesEval(
      a: ArrayData, planes: Array[Array[Double]], offsets: Array[Double],
      nProbes: Int, elemKind: Int): ArrayData = {
    val margins = new Array[Double](planes.length)
    val base = learnedMargins(a, planes, offsets, margins, elemKind)
    probeBuckets(base, margins, planes.length, nProbes)
  }

  /** Rolling-hash token windows for exact duplicated-substring dedup
    * (Lee et al. 2022 at token-window granularity): one pass emits the
    * 64-bit polynomial rolling hash of every `winLen`-token window, so
    * window identity travels as 8 bytes — window STRINGS never
    * materialize and never shuffle (the string form would be a winLen×
    * blowup of the corpus in the df shuffle). Tokenization is `\s+`
    * with trailing-empty retention (limit −1), matching Spark's
    * `split(col, "\\s+")` and DuckDB's regexp_split_to_array, so window
    * positions align across engines.
    */
  def tokenWindowHashesEval(input: UTF8String, winLen: Int): ArrayData = {
    val toks = input.toString.split("\\s+", -1)
    val t = toks.length
    val n = t - winLen + 1
    if (n <= 0) return new GenericArrayData(Array.empty[Any])
    val th = new Array[Long](t)
    var i = 0
    while (i < t) {
      val b = toks(i).getBytes(java.nio.charset.StandardCharsets.UTF_8)
      th(i) = XXH64.hashUnsafeBytes(b,
        org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, b.length,
        0x9E3779B97F4A7C15L)
      i += 1
    }
    val B = 0x100000001B3L // odd multiplier → full-period mod 2^64
    var bPowL = 1L
    i = 0
    while (i < winLen) { bPowL *= B; i += 1 }
    val out = new Array[Any](n)
    var h = 0L
    i = 0
    while (i < winLen) { h = h * B + th(i); i += 1 }
    out(0) = h
    var s = 1
    while (s < n) {
      h = h * B + th(s + winLen - 1) - bPowL * th(s - 1)
      out(s) = h
      s += 1
    }
    new GenericArrayData(out)
  }

  // java.text.Collator is stateful/non-thread-safe; one per task thread.
  // ROOT locale + TERTIARY + canonical decomposition approximates the
  // DUCET order pyuca implements (tablite sort_utils.py:7): primary =
  // base letter, secondary = diacritics, tertiary = case — so
  // a < A < å < Å < b, where binary UTF-8 order gives A < B < a < å.
  private val rootCollator = new ThreadLocal[java.text.Collator] {
    override def initialValue(): java.text.Collator = {
      val c = java.text.Collator.getInstance(java.util.Locale.ROOT)
      c.setStrength(java.text.Collator.TERTIARY)
      c.setDecomposition(java.text.Collator.CANONICAL_DECOMPOSITION)
      c
    }
  }

  /** Collation sort key: byte array whose unsigned-lexicographic order
    * equals the root-locale collator's order over the source strings.
    */
  def collationKeyEval(input: UTF8String): Array[Byte] =
    rootCollator.get.getCollationKey(input.toString).toByteArray

  /** Unicode repair for ingest (the ftfy/C4 cleanup step): NFC
    * normalization (combining sequences → precomposed) plus removal of
    * control characters other than tab and newline (CR included — C4
    * newline normalization). Single pass post-normalize; DuckDB's
    * `nfc_normalize` + a control-class regexp_replace is the oracle
    * equivalent.
    */
  def normalizeTextEval(input: UTF8String): UTF8String = {
    val s = java.text.Normalizer.normalize(input.toString,
      java.text.Normalizer.Form.NFC)
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if ((c >= 0x20 && c != 0x7F) || c == '\n' || c == '\t') sb.append(c)
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** Remove the `winLen`-token spans starting at `starts` from the text
    * (tokenize `\s+`, skip covered tokens, rejoin single-spaced — the
    * whitespace normalization applies to untouched docs too, keeping
    * output uniform). Companion of [[tokenWindowHashesEval]]: `starts`
    * are positions in ITS token numbering, which this tokenizer shares.
    */
  def removeSpansEval(input: UTF8String, starts: ArrayData, winLen: Int): UTF8String = {
    val toks = input.toString.split("\\s+", -1)
    val covered = new Array[Boolean](toks.length)
    var i = 0
    while (i < starts.numElements()) {
      val s = starts.getInt(i)
      var j = s
      val e = math.min(s + winLen, toks.length)
      while (j < e) { covered(j) = true; j += 1 }
      i += 1
    }
    val sb = new java.lang.StringBuilder(input.numBytes())
    var first = true
    i = 0
    while (i < toks.length) {
      if (!covered(i)) {
        if (!first) sb.append(' ')
        sb.append(toks(i))
        first = false
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** Union length of the intervals [s, s+winLen) for ascending-sorted
    * `starts` — the removed-token count, without touching the text.
    */
  def coveredCountEval(starts: ArrayData, winLen: Int): Long = {
    val ns = starts.numElements()
    var covered = 0L
    var end = Int.MinValue
    var i = 0
    while (i < ns) {
      val s = starts.getInt(i)
      val e = s + winLen
      if (s >= end) { covered += winLen; end = e }
      else if (e > end) { covered += e - end; end = e }
      i += 1
    }
    covered
  }

  def wordShinglesEval(input: UTF8String, n: Int): ArrayData = {
    val s = input.toString
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c >= 'a' && c <= 'z' || c >= '0' && c <= '9') sb.append(c)
      else if (c >= 'A' && c <= 'Z') sb.append((c + 32).toChar)
      else sb.append(' ')
      i += 1
    }
    val toks = sb.toString.split("\\s+").filter(_.nonEmpty)
    val count = toks.length - (n - 1)
    if (count <= 0) new GenericArrayData(Array.empty[Any])
    else {
      val out = new Array[Any](count)
      var j = 0
      while (j < count) {
        val g = new java.lang.StringBuilder()
        var m = 0
        while (m < n) {
          if (m > 0) g.append(' ')
          g.append(toks(j + m))
          m += 1
        }
        out(j) = UTF8String.fromString(g.toString)
        j += 1
      }
      new GenericArrayData(out)
    }
  }

  def jaccardEval(a: ArrayData, b: ArrayData): Double = {
    val setA = new java.util.HashSet[UTF8String](a.numElements() * 2)
    var i = 0
    while (i < a.numElements()) {
      if (!a.isNullAt(i)) setA.add(a.getUTF8String(i))
      i += 1
    }
    val setB = new java.util.HashSet[UTF8String](b.numElements() * 2)
    var inter = 0
    i = 0
    while (i < b.numElements()) {
      if (!b.isNullAt(i)) {
        val s = b.getUTF8String(i)
        if (setB.add(s) && setA.contains(s)) inter += 1
      }
      i += 1
    }
    val union = setA.size + setB.size - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }

  def minKHashesEval(arr: ArrayData, k: Int): ArrayData = {
    val buf = new Array[Long](k) // ascending, first `sz` slots live
    var sz = 0
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = hashUtf8(arr.getUTF8String(i), 42L)
        if (sz < k || h < buf(sz - 1)) {
          // binary search insertion point in buf[0, sz)
          var lo = 0; var hi = sz
          while (lo < hi) {
            val mid = (lo + hi) >>> 1
            if (buf(mid) < h) lo = mid + 1 else hi = mid
          }
          // skip duplicates (distinct semantics)
          if (lo >= sz || buf(lo) != h) {
            val last = math.min(sz, k - 1)
            var j = last
            while (j > lo) { buf(j) = buf(j - 1); j -= 1 }
            buf(lo) = h
            if (sz < k) sz += 1
          }
        }
      }
      i += 1
    }
    val out = new Array[Long](sz)
    System.arraycopy(buf, 0, out, 0, sz)
    new GenericArrayData(out)
  }

  /** Repetition stats over a bag of strings (Gopher-style quality
    * signals, Rae et al. 2021 §A1.1). Returns 4 doubles:
    * [0] dup fraction        = (total − distinct) / total
    * [1] dup char fraction   = Σ chars·count over items with count>1 / Σ chars·count
    * [2] top freq share      = max count / total
    * [3] top char share      = max chars·count over items / Σ chars·count
    * All 0.0 on an empty bag. Single hash-map pass.
    */
  def repStatsCore(it: java.util.Iterator[UTF8String]): ArrayData = {
    val counts = new java.util.HashMap[UTF8String, Int]()
    var total = 0L
    while (it.hasNext) {
      val s = it.next()
      if (s != null) {
        counts.put(s, counts.getOrDefault(s, 0) + 1)
        total += 1
      }
    }
    if (total == 0L) return new GenericArrayData(Array(0.0, 0.0, 0.0, 0.0))
    var maxCount = 0L
    var dupMass = 0L
    var topMass = 0L
    var allMass = 0L
    val e = counts.entrySet().iterator()
    while (e.hasNext) {
      val kv = e.next()
      val c = kv.getValue.toLong
      val mass = kv.getKey.numChars().toLong * c
      allMass += mass
      if (c > maxCount) maxCount = c
      if (c > 1) dupMass += mass
      if (mass > topMass) topMass = mass
    }
    new GenericArrayData(Array(
      (total - counts.size).toDouble / total,
      if (allMass == 0L) 0.0 else dupMass.toDouble / allMass,
      maxCount.toDouble / total,
      if (allMass == 0L) 0.0 else topMass.toDouble / allMass))
  }

  def repStatsEval(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    repStatsCore(new java.util.Iterator[UTF8String] {
      private var i = 0
      override def hasNext: Boolean = i < n
      override def next(): UTF8String = {
        val v = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
        i += 1
        v
      }
    })
  }

  /** Line-level repetition stats: split on '\n', trim ' ' '\t' '\r'
    * '\n', drop empties, then [[repStatsCore]] over the lines.
    */
  def lineRepStatsEval(text: UTF8String): ArrayData = {
    val s = text.toString
    val out = new java.util.ArrayList[UTF8String]()
    var start = 0
    var i = 0
    val len = s.length
    while (i <= len) {
      if (i == len || s.charAt(i) == '\n') {
        var a = start
        var b = i
        while (a < b && (s.charAt(a) == ' ' || s.charAt(a) == '\t' || s.charAt(a) == '\r')) a += 1
        while (b > a && {
          val c = s.charAt(b - 1)
          c == ' ' || c == '\t' || c == '\r'
        }) b -= 1
        if (b > a) out.add(UTF8String.fromString(s.substring(a, b)))
        start = i + 1
      }
      i += 1
    }
    repStatsCore(out.iterator())
  }

  /** Exact two-level nearest-centroid index (triangle-inequality
    * pruning, the Elkan 2003 k-means acceleration bound): centroids are
    * deterministically grouped under G ≈ √nc super-centroids (strided
    * seeds → one exact assignment pass → recentre on the group mean,
    * no RNG, no iteration), and a lookup computes the G super-distances
    * first, then scans only groups whose lower bound
    * `d(v, s_g) − r_g` can still beat the current best. EXACT — the
    * returned index is identical to the flat scan's (ties break to the
    * smallest centroid index on both paths; the skip test is strict so
    * an at-the-bound tie is still scanned) — but ~O(√nc) distance
    * evaluations per row on clustered centroid sets. This is what turns
    * the IVF-family coarse ASSIGNMENT from O(n·nList) = O(n^1.5) (with
    * nList ∝ √n) into ~O(n·√nList): the sf1 scale rehearsal measured
    * the flat assignment as the one super-linear build term
    * (NOTES round-11). Shorter input vectors stay exact: projections
    * only shrink distances, so the full-dimension radius still lower-
    * bounds the projected member distance.
    */
  private final class CentroidHier(cs: Array[Array[Double]]) {
    private val nc = cs.length
    val g: Int = math.max(1, math.sqrt(nc.toDouble).toInt)
    val members: Array[Array[Int]] = new Array(g)
    val superCents: Array[Array[Double]] = new Array(g)
    val radii: Array[Double] = new Array(g)
    locally {
      def d2(a: Array[Double], b: Array[Double]): Double = {
        val m = math.min(a.length, b.length); var d = 0.0; var i = 0
        while (i < m) { val t = a(i) - b(i); d += t * t; i += 1 }
        d
      }
      // strided seeds, one exact assignment pass
      val seeds = Array.tabulate(g)(j => cs((j.toLong * nc / g).toInt))
      val assign = new Array[Int](nc)
      var ci = 0
      while (ci < nc) {
        var best = Double.MaxValue; var bi = 0; var j = 0
        while (j < g) {
          val d = d2(cs(ci), seeds(j)); if (d < best) { best = d; bi = j }; j += 1
        }
        assign(ci) = bi; ci += 1
      }
      val buf = Array.fill(g)(new scala.collection.mutable.ArrayBuilder.ofInt)
      ci = 0
      while (ci < nc) { buf(assign(ci)) += ci; ci += 1 }
      var j = 0
      while (j < g) {
        val mem = buf(j).result()
        members(j) = mem
        val dim = if (nc == 0) 0 else cs(0).length
        val mean = new Array[Double](dim)
        var k = 0
        while (k < mem.length) {
          val c = cs(mem(k)); var i = 0
          while (i < math.min(dim, c.length)) { mean(i) += c(i); i += 1 }
          k += 1
        }
        if (mem.length > 0) { var i = 0; while (i < dim) { mean(i) /= mem.length; i += 1 } }
        superCents(j) = mean
        var r = 0.0; k = 0
        while (k < mem.length) { r = math.max(r, math.sqrt(d2(cs(mem(k)), mean))); k += 1 }
        radii(j) = r
        j += 1
      }
    }
  }

  /** Java arrays equal by reference, so a plain LinkedHashMap keyed on
    * the centroids array IS an identity memo — one hierarchy per
    * deserialized expression constant, 64-entry LRU (the quantizer-memo
    * pattern).
    */
  private val hierMemo: java.util.Map[Array[Array[Double]], CentroidHier] =
    java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[Array[Array[Double]], CentroidHier](16, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[Array[Array[Double]], CentroidHier]): Boolean =
          size() > 64
      })
  private def hierOf(cs: Array[Array[Double]]): CentroidHier = {
    val got = hierMemo.get(cs)
    if (got != null) got
    else { val h = new CentroidHier(cs); hierMemo.put(cs, h); h }
  }

  /** Flat scan pays off below this many centroids; above it the
    * two-level exact index wins.
    */
  private val HierThreshold = 192

  private def vecCentDistSq(
      a: ArrayData, len: Int, c: Array[Double], elemKind: Int): Double = {
    val m = math.min(len, c.length)
    var d = 0.0; var i = 0
    while (i < m) {
      val v = if (elemKind == 0) a.getFloat(i).toDouble else a.getDouble(i)
      val diff = v - c(i)
      d += diff * diff
      i += 1
    }
    d
  }

  /** Indices of the `n` nearest centroids (squared L2, ascending) for a
    * numeric array. elemKind: 0 = float, 1 = double. The n == 1
    * assignment case (the per-corpus-row hot path of every IVF-family
    * build) routes through [[CentroidHier]] when the centroid set is
    * large; n > 1 probing runs per QUERY row, where the flat scan is
    * already cheap relative to the list scans it gates.
    */
  def nearestCentroidsEval(
      a: ArrayData, centroids: Array[Array[Double]], n: Int, elemKind: Int): ArrayData = {
    val nc = centroids.length
    if (n == 1 && nc >= HierThreshold) {
      val h = hierOf(centroids)
      val len = a.numElements()
      val g = h.g
      val ds = new Array[Double](g)
      val order = new Array[Int](g)
      var j = 0
      while (j < g) {
        ds(j) = math.sqrt(vecCentDistSq(a, len, h.superCents(j), elemKind))
        order(j) = j
        j += 1
      }
      // primitive insertion sort by ds — g ≈ √nList is small and this runs
      // per ROW, so no boxed comparator allocation in the hot path
      var si = 1
      while (si < g) {
        val oi0 = order(si); val d0 = ds(oi0)
        var sj = si - 1
        while (sj >= 0 && ds(order(sj)) > d0) { order(sj + 1) = order(sj); sj -= 1 }
        order(sj + 1) = oi0
        si += 1
      }
      // bestI starts at 0 (not a sentinel): on a corrupt vector (NaN/Inf
      // components) every distance comparison below is false, and the flat
      // scan would return index 0 — the hier path must match, never emit
      // an out-of-range index
      var best = Double.MaxValue
      var bestI = 0
      var oi = 0
      while (oi < g) {
        val gi = order(oi)
        val lb = ds(gi) - h.radii(gi)
        // strict skip: an at-the-bound tie must still be scanned so the
        // smallest-index tie-break matches the flat scan exactly; a
        // non-finite lower bound (NaN/Inf input vector) never justifies
        // skipping — NaN comparisons would otherwise prune every group
        if (!(java.lang.Double.isFinite(lb) && lb > 0 && lb * lb > best)) {
          val mem = h.members(gi)
          var k = 0
          while (k < mem.length) {
            val ci = mem(k)
            val d = vecCentDistSq(a, len, centroids(ci), elemKind)
            if (d < best || (d == best && ci < bestI)) { best = d; bestI = ci }
            k += 1
          }
        }
        oi += 1
      }
      return new GenericArrayData(Array(bestI))
    }
    val keep = math.min(n, nc)
    val bestD = Array.fill(keep)(Double.MaxValue)
    val bestI = new Array[Int](keep)
    val len = a.numElements()
    var ci = 0
    while (ci < nc) {
      val c = centroids(ci)
      val m = math.min(len, c.length)
      var d = 0.0
      var i = 0
      while (i < m) {
        val v = if (elemKind == 0) a.getFloat(i).toDouble else a.getDouble(i)
        val diff = v - c(i)
        d += diff * diff
        i += 1
      }
      if (d < bestD(keep - 1)) {
        // insertion into the sorted top-n
        var p = keep - 1
        while (p > 0 && bestD(p - 1) > d) {
          bestD(p) = bestD(p - 1); bestI(p) = bestI(p - 1); p -= 1
        }
        bestD(p) = d; bestI(p) = ci
      }
      ci += 1
    }
    new GenericArrayData(bestI)
  }

  /** Squared L2 distance of two numeric arrays. elemKind as above. */
  def l2DistEval(a: ArrayData, b: ArrayData, aIsFloat: Boolean, bIsFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var d = 0.0
    var i = 0
    while (i < n) {
      val x = if (aIsFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bIsFloat) b.getFloat(i).toDouble else b.getDouble(i)
      val diff = x - y
      d += diff * diff
      i += 1
    }
    d
  }

  /** Residual of `vec` against its coarse centroid, optionally passed
    * through a learned orthogonal rotation (OPQ, Ge et al. 2013 —
    * `rot` is d×d row-major, rotated(i) = Σ_j rot(i)(j)·r(j); null skips
    * the rotation so the plain-PQ hot path pays nothing).
    */
  private def pqResidual(
      vec: ArrayData, cc: Array[Double], rot: Array[Array[Double]],
      elemKind: Int): Array[Double] = {
    val d = cc.length
    val r = new Array[Double](d)
    val n = math.min(vec.numElements(), d)
    var i = 0
    while (i < n) {
      val v = if (elemKind == 0) vec.getFloat(i).toDouble else vec.getDouble(i)
      r(i) = v - cc(i)
      i += 1
    }
    if (rot == null) r
    else {
      val out = new Array[Double](d)
      var p = 0
      while (p < d) {
        val row = rot(p)
        var s = 0.0
        var j = 0
        while (j < d) { s += row(j) * r(j); j += 1 }
        out(p) = s
        p += 1
      }
      out
    }
  }

  /** Product-quantization encode (Jégou et al. 2011): subtract the
    * coarse centroid (IVFADC residual), optionally rotate (OPQ), then
    * per subspace emit the index of the nearest sub-codebook centroid.
    * Output: m bytes. `flatCodebooks(i)` holds subspace i's codeK×dsub
    * centroids row-major.
    */
  def pqEncodeEval(
      vec: ArrayData, list: Int, coarse: Array[Array[Double]],
      flatCodebooks: Array[Array[Double]], codeK: Int, rot: Array[Array[Double]],
      elemKind: Int): Array[Byte] = {
    val m = flatCodebooks.length
    val dsub = coarse(list).length / m
    val r = pqResidual(vec, coarse(list), rot, elemKind)
    val out = new Array[Byte](m)
    var i = 0
    while (i < m) {
      val cb = flatCodebooks(i)
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < codeK) {
        var dist = 0.0
        var j = 0
        while (j < dsub) {
          val diff = r(i * dsub + j) - cb(c * dsub + j)
          dist += diff * diff
          j += 1
        }
        if (dist < bestD) { bestD = dist; best = c }
        c += 1
      }
      out(i) = best.toByte
      i += 1
    }
    out
  }

  /** Asymmetric distance (ADC) from (query vector, coarse list, residual
    * code), FAISS-style: an executor-thread-local lookup table
    * T[subspace][code] = ||q_residual_sub − codebook entry||² is built
    * once per distinct (query, probed list) and the per-candidate cost
    * drops from codeK·d flops to d (hash/verify) + m table lookups. The
    * table is keyed by query content + list + codebook identity, so
    * concurrent indexes in one JVM (tests) cannot cross-contaminate; a
    * probe scan visits each (query, list) pair over a contiguous-ish run
    * of candidates, so a tiny LRU suffices and memory stays bounded
    * (m·codeK doubles ≈ 16 KB per entry).
    */
  private final class AdcEntry(
      val q: Array[Double], val cb: Array[Array[Double]],
      val coarse: Array[Array[Double]], val list: Int,
      val rot: Array[Array[Double]], val table: Array[Double])

  private val adcCache =
    new ThreadLocal[java.util.LinkedHashMap[java.lang.Long, AdcEntry]] {
      override def initialValue(): java.util.LinkedHashMap[java.lang.Long, AdcEntry] =
        new java.util.LinkedHashMap[java.lang.Long, AdcEntry](256, 0.75f, true) {
          // 128 entries × m·codeK doubles (≈16 KB at m=8) ≈ 2 MB/thread:
          // roomy enough that a whole probe batch's (query, list) pairs
          // stay resident even when the join streams them interleaved
          override def removeEldestEntry(
              e: java.util.Map.Entry[java.lang.Long, AdcEntry]): Boolean = size() > 128
        }
    }

  def pqAdcDistEval(
      q: ArrayData, list: Int, code: Array[Byte],
      coarse: Array[Array[Double]], flatCodebooks: Array[Array[Double]],
      rot: Array[Array[Double]], elemKind: Int): Double = {
    val m = flatCodebooks.length
    val d = coarse(0).length
    val dsub = d / m
    val codeK = flatCodebooks(0).length / dsub
    // hash the query in place (no allocation on the hit path) —
    // candidates vastly outnumber distinct (query, list) pairs, so the
    // codeK·d table build amortizes to the O(d) hash + m lookups per row
    // ALL quantizer artifacts key the table: same codebooks with
    // retrained coarse centroids (or a different OPQ rotation) must not
    // serve stale residual tables
    var h = 1125899906842597L * (list + 1) + System.identityHashCode(flatCodebooks) +
      31L * System.identityHashCode(coarse) + 17L * System.identityHashCode(rot)
    var i = 0
    while (i < d) {
      val v = if (elemKind == 0) q.getFloat(i).toDouble else q.getDouble(i)
      h = h * 31 + java.lang.Double.doubleToLongBits(v)
      i += 1
    }
    val cache = adcCache.get()
    val key = java.lang.Long.valueOf(h)
    var e = cache.get(key)
    if (e != null && (e.list != list || (e.cb ne flatCodebooks) ||
        (e.coarse ne coarse) || (e.rot ne rot))) e = null
    if (e != null) {
      // verify content equality without materializing the query
      var j = 0
      var same = e.q.length == d
      while (same && j < d) {
        val v = if (elemKind == 0) q.getFloat(j).toDouble else q.getDouble(j)
        same = java.lang.Double.doubleToLongBits(v) ==
          java.lang.Double.doubleToLongBits(e.q(j))
        j += 1
      }
      if (!same) e = null
    }
    if (e == null) {
      val qa = new Array[Double](d)
      var x = 0
      while (x < d) {
        qa(x) = if (elemKind == 0) q.getFloat(x).toDouble else q.getDouble(x)
        x += 1
      }
      val cc = coarse(list)
      // query residual, through the OPQ rotation when trained — the d²
      // rotate runs once per (query, list) table build, amortized over
      // every candidate in the probed list
      val qr = new Array[Double](d)
      if (rot == null) {
        var j = 0
        while (j < d) { qr(j) = qa(j) - cc(j); j += 1 }
      } else {
        var p = 0
        while (p < d) {
          val row = rot(p)
          var s = 0.0
          var j = 0
          while (j < d) { s += row(j) * (qa(j) - cc(j)); j += 1 }
          qr(p) = s
          p += 1
        }
      }
      val table = new Array[Double](m * codeK)
      var s = 0
      while (s < m) {
        val cb = flatCodebooks(s)
        var c = 0
        while (c < codeK) {
          var dist = 0.0
          var j = 0
          while (j < dsub) {
            val df = qr(s * dsub + j) - cb(c * dsub + j)
            dist += df * df
            j += 1
          }
          table(s * codeK + c) = dist
          c += 1
        }
        s += 1
      }
      e = new AdcEntry(qa, flatCodebooks, coarse, list, rot, table)
      cache.put(key, e)
    }
    var dist = 0.0
    var s2 = 0
    while (s2 < m) {
      dist += e.table(s2 * codeK + (code(s2) & 0xFF))
      s2 += 1
    }
    dist
  }

  private def isGrouping3(s: String, sep: Char): Boolean = {
    // ^[+-]?\d{1,3}(sep\d{3})+$
    var i = 0
    if (i < s.length && (s.charAt(i) == '+' || s.charAt(i) == '-')) i += 1
    var d = 0
    while (i < s.length && Character.isDigit(s.charAt(i))) { d += 1; i += 1 }
    if (d < 1 || d > 3) return false
    var groups = 0
    while (i < s.length && s.charAt(i) == sep) {
      i += 1
      var g = 0
      while (i < s.length && Character.isDigit(s.charAt(i))) { g += 1; i += 1 }
      if (g != 3) return false
      groups += 1
    }
    groups >= 1 && i == s.length
  }

  private def plainParse(s: String): java.lang.Double = {
    // guard: plain decimal/scientific only (Java parseDouble would also
    // accept "1d", "0x1p3", "Infinity" — Spark cast semantics do not)
    var i = 0
    var digits = 0
    var dot = false
    var exp = false
    var ok = s.nonEmpty
    if (i < s.length && (s.charAt(i) == '+' || s.charAt(i) == '-')) i += 1
    while (ok && i < s.length) {
      val c = s.charAt(i)
      if (Character.isDigit(c)) digits += 1
      else if (c == '.' && !dot && !exp) dot = true
      else if ((c == 'e' || c == 'E') && !exp && digits > 0) {
        exp = true
        if (i + 1 < s.length && (s.charAt(i + 1) == '+' || s.charAt(i + 1) == '-')) i += 1
      } else ok = false
      i += 1
    }
    if (!ok || digits == 0) null
    else try java.lang.Double.valueOf(s) catch { case _: NumberFormatException => null }
  }

  /** Locale-separator normalization ONLY: strip whitespace/nbsp/apostrophe
    * grouping AND double-quote characters (the reference's numeric
    * inference removes every `"` before parsing, datatypes.py:548,568 —
    * so the doubly-quoted CSV cell `"3,333"` guesses to 3333), resolve
    * the US/EU decimal-vs-thousands ambiguity, emit a plain
    * "[+-]?digits[.digits][eN]" candidate string. No validation and
    * no numeric conversion — the full digit string survives, so callers
    * that need EXACT values beyond double precision (int64 edge, the
    * arbitrary-precision decimal(38,0) route) can cast the string
    * directly instead of round-tripping through a lossy Double.
    */
  def localeNormEval(input: UTF8String): UTF8String = {
    val raw = input.toString
    val sb = new java.lang.StringBuilder(raw.length)
    var i = 0
    while (i < raw.length) {
      val c = raw.charAt(i)
      if (!Character.isWhitespace(c) && c != ' ' && c != '\'' && c != '"') sb.append(c)
      i += 1
    }
    val s = sb.toString
    val lastDot = s.lastIndexOf('.')
    val lastComma = s.lastIndexOf(',')
    val norm =
      if (lastDot >= 0 && lastComma >= 0) {
        if (lastDot > lastComma) s.replace(",", "") // 1,000.5
        else s.replace(".", "").replace(',', '.')   // 1.000,5
      } else if (lastComma >= 0) {
        if (isGrouping3(s, ',')) s.replace(",", "") else s.replace(',', '.')
      } else if (lastDot >= 0 && s.indexOf('.') != lastDot && isGrouping3(s, '.')) {
        // dot-only with MULTIPLE dots in 3-groups = EU thousands
        // ("1.123.456"); a single dot stays the decimal point
        s.replace(".", "")
      } else s
    UTF8String.fromString(norm)
  }

  /** Locale-tolerant number parse; null (boxed) on failure. */
  def localeNumberEval(input: UTF8String): java.lang.Double =
    plainParse(localeNormEval(input).toString)

  // ---------------------------------------------------------------------
  // Expressions
  // ---------------------------------------------------------------------

  /** 64-bit SimHash over an array<string> of tokens. */
  case class SimHash64Expr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullSafeEval(input: Any): Any =
      simhashEval(input.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = graft.plans.Kernels.simhashEval($c);")
    override protected def withNewChildInternal(c: Expression): SimHash64Expr = copy(c)
  }

  /** MinHash signature: array<string> shingles → array<long> of length k.
    * One base hash per shingle, then k cheap long re-hashes — O(s·k) long
    * mixes instead of O(s·k) string hashes.
    */
  case class MinHashSigExpr(child: Expression, k: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any =
      minhashSigEval(input.asInstanceOf[ArrayData], k)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = graft.plans.Kernels.minhashSigEval($c, $k);")
    override protected def withNewChildInternal(c: Expression): MinHashSigExpr = copy(child = c)
  }

  /** Cosine similarity of two numeric arrays (float or double elements). */
  case class CosineSimExpr(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = DoubleType
    // type dispatch hoisted out of the per-element loop
    @transient private lazy val aIsFloat =
      left.dataType.asInstanceOf[ArrayType].elementType == FloatType
    @transient private lazy val bIsFloat =
      right.dataType.asInstanceOf[ArrayType].elementType == FloatType
    override def nullSafeEval(l: Any, r: Any): Any =
      cosineEval(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData], aIsFloat, bIsFloat)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = graft.plans.Kernels.cosineEval($a, $b, $aIsFloat, $bIsFloat);")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSimExpr =
      copy(left = l, right = r)
  }

  /** Random-hyperplane LSH bucket: sign bits of dot products with nPlanes
    * hash-derived deterministic hyperplanes.
    */
  case class HyperplaneBucketExpr(child: Expression, nPlanes: Int) extends UnaryExpression {
    override def dataType: DataType = LongType
    @transient private lazy val elemKind =
      child.dataType.asInstanceOf[ArrayType].elementType match {
        case FloatType  => 0
        case DoubleType => 1
        case _          => 2
      }
    override def nullSafeEval(input: Any): Any =
      hyperplaneEval(input.asInstanceOf[ArrayData], nPlanes, elemKind)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.plans.Kernels.hyperplaneEval($c, $nPlanes, $elemKind);")
    override protected def withNewChildInternal(c: Expression): HyperplaneBucketExpr =
      copy(child = c)
  }

  /** Query-directed multi-probe buckets (see [[hyperplaneProbesEval]]):
    * base bucket + the cheapest margin-ordered perturbations. Applied to
    * the (small) query side only — the corpus keeps one bucket per row.
    */
  case class HyperplaneProbesExpr(child: Expression, nPlanes: Int, nProbes: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    @transient private lazy val elemKind =
      child.dataType.asInstanceOf[ArrayType].elementType match {
        case FloatType  => 0
        case DoubleType => 1
        case _          => 2
      }
    override def nullSafeEval(input: Any): Any =
      hyperplaneProbesEval(input.asInstanceOf[ArrayData], nPlanes, nProbes, elemKind)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.plans.Kernels.hyperplaneProbesEval($c, $nPlanes, $nProbes, $elemKind);")
    override protected def withNewChildInternal(c: Expression): HyperplaneProbesExpr =
      copy(child = c)
  }

  /** Data-dependent LSH bucket: sign bits against LEARNED planes
    * (PCA+ITQ, trained by [[graft.ml.Ann.trainItq]]). Planes and offsets
    * ride as codegen reference constants — assignment stays map-side.
    */
  case class LearnedBucketExpr(
      child: Expression, planes: Array[Array[Double]], offsets: Array[Double])
      extends UnaryExpression {
    override def dataType: DataType = LongType
    @transient private lazy val elemKind =
      child.dataType.asInstanceOf[ArrayType].elementType match {
        case FloatType  => 0
        case DoubleType => 1
        case _          => 2
      }
    override def nullSafeEval(input: Any): Any =
      learnedBucketEval(input.asInstanceOf[ArrayData], planes, offsets, elemKind)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val pRef = ctx.addReferenceObj("lshPlanes", planes, "double[][]")
      val oRef = ctx.addReferenceObj("lshOffsets", offsets, "double[]")
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.plans.Kernels.learnedBucketEval($c, $pRef, $oRef, $elemKind);")
    }
    override protected def withNewChildInternal(c: Expression): LearnedBucketExpr =
      copy(child = c)
  }

  /** Query-directed multi-probe over learned planes (query side of
    * [[LearnedBucketExpr]]).
    */
  case class LearnedProbesExpr(
      child: Expression, planes: Array[Array[Double]], offsets: Array[Double],
      nProbes: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    @transient private lazy val elemKind =
      child.dataType.asInstanceOf[ArrayType].elementType match {
        case FloatType  => 0
        case DoubleType => 1
        case _          => 2
      }
    override def nullSafeEval(input: Any): Any =
      learnedProbesEval(input.asInstanceOf[ArrayData], planes, offsets, nProbes, elemKind)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val pRef = ctx.addReferenceObj("lshPlanes", planes, "double[][]")
      val oRef = ctx.addReferenceObj("lshOffsets", offsets, "double[]")
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.plans.Kernels.learnedProbesEval($c, $pRef, $oRef, $nProbes, $elemKind);")
    }
    override protected def withNewChildInternal(c: Expression): LearnedProbesExpr =
      copy(child = c)
  }

  /** Unicode repair (see [[normalizeTextEval]]). */
  /** UCA-ish collation sort key (see [[collationKeyEval]]): BinaryType
    * surrogate whose unsigned-lexicographic order IS the collator order,
    * so a distributed range-partitioned sort on the key reproduces
    * linguistic string order with zero comparator plumbing.
    */
  case class CollationKeyExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = BinaryType
    override def nullSafeEval(input: Any): Any =
      collationKeyEval(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.plans.Kernels.collationKeyEval($c);")
    override protected def withNewChildInternal(c: Expression): CollationKeyExpr =
      copy(child = c)
  }

  case class NormalizeTextExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def nullSafeEval(input: Any): Any =
      normalizeTextEval(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.plans.Kernels.normalizeTextEval($c);")
    override protected def withNewChildInternal(c: Expression): NormalizeTextExpr =
      copy(child = c)
  }

  /** DEFLATE compression ratio of a document's UTF-8 bytes —
    * `compressed/raw`, the classic cheap redundancy signal a quality
    * pipeline thresholds on (machine-generated boilerplate and
    * template spam compress far below natural prose). Level 6, raw
    * deflate (no zlib header), one thread-local `Deflater` reused
    * across rows — zero per-row allocation beyond the output buffer.
    * Empty text → 1.0 (nothing to compress, nothing saved). The
    * ratio can exceed 1 on short/incompressible text (deflate block
    * overhead) — that is honest signal, not clamped away.
    */
  private val deflaters = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater =
      new java.util.zip.Deflater(6, true)
  }

  def deflateRatioEval(input: UTF8String): Double = {
    val bytes = input.getBytes
    if (bytes.length == 0) return 1.0
    val d = deflaters.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    var total = 0L
    val buf = new Array[Byte](8192)
    while (!d.finished()) total += d.deflate(buf)
    total.toDouble / bytes.length
  }

  case class DeflateRatioExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(input: Any): Any =
      deflateRatioEval(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.plans.Kernels.deflateRatioEval($c);")
    override protected def withNewChildInternal(c: Expression): DeflateRatioExpr =
      copy(child = c)
  }

  /** Rolling window hashes (see [[tokenWindowHashesEval]]); index in the
    * output array IS the window's token start position.
    */
  case class TokenWindowHashesExpr(child: Expression, winLen: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any =
      tokenWindowHashesEval(input.asInstanceOf[UTF8String], winLen)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.plans.Kernels.tokenWindowHashesEval($c, $winLen);")
    override protected def withNewChildInternal(c: Expression): TokenWindowHashesExpr =
      copy(child = c)
  }

  /** Span removal (see [[removeSpansEval]]). */
  case class RemoveSpansExpr(left: Expression, right: Expression, winLen: Int)
      extends BinaryExpression {
    override def dataType: DataType = StringType
    override def nullSafeEval(text: Any, starts: Any): Any =
      removeSpansEval(text.asInstanceOf[UTF8String], starts.asInstanceOf[ArrayData], winLen)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (t, s) =>
        s"${ev.value} = graft.plans.Kernels.removeSpansEval($t, $s, $winLen);")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): RemoveSpansExpr =
      copy(left = l, right = r)
  }

  /** Covered-token count (see [[coveredCountEval]]). */
  case class CoveredCountExpr(child: Expression, winLen: Int) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullSafeEval(starts: Any): Any =
      coveredCountEval(starts.asInstanceOf[ArrayData], winLen)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.plans.Kernels.coveredCountEval($c, $winLen);")
    override protected def withNewChildInternal(c: Expression): CoveredCountExpr =
      copy(child = c)
  }

  /** One-pass word n-gram shingling: lowercase, strip non-alphanumerics,
    * tokenize, emit space-joined n-grams. Replaces a 4-expression chain
    * (2× regexp_replace + split + transform/slice/concat_ws) whose lambda
    * re-evaluated the normalization PER ELEMENT when interpreted (no CSE
    * across higher-order function boundaries) — ~50× slower.
    */
  case class WordShinglesExpr(child: Expression, n: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullSafeEval(input: Any): Any =
      wordShinglesEval(input.asInstanceOf[UTF8String], n)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = graft.plans.Kernels.wordShinglesEval($c, $n);")
    override protected def withNewChildInternal(c: Expression): WordShinglesExpr =
      copy(child = c)
  }

  /** Exact Jaccard similarity of two string arrays — hash-set intersection
    * in one pass (vs array_intersect + array_union materializing two
    * arrays per pair). Duplicate elements count once (set semantics).
    */
  case class JaccardSimExpr(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(l: Any, r: Any): Any =
      jaccardEval(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = graft.plans.Kernels.jaccardEval($a, $b);")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): JaccardSimExpr =
      copy(left = l, right = r)
  }

  /** The k smallest DISTINCT xxhash64 values of an array<string> —
    * the rare-shingle posting-list sampler for n-gram candidate
    * generation. Replaces `slice(array_sort(transform(sh, xxhash64)), 1,
    * k)`, whose lambda evaluates interpretively per element and whose
    * sort materializes the full hash array per row. One pass, bounded
    * insertion buffer, output ascending.
    */
  case class MinKHashesExpr(child: Expression, k: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any =
      minKHashesEval(input.asInstanceOf[ArrayData], k)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = graft.plans.Kernels.minKHashesEval($c, $k);")
    override protected def withNewChildInternal(c: Expression): MinKHashesExpr =
      copy(child = c)
  }

  /** Repetition stats of an array<string> bag (n-gram repetition
    * signals); see [[repStatsCore]] for the 4-slot layout.
    */
  case class RepStatsExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def nullSafeEval(input: Any): Any =
      repStatsEval(input.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = graft.plans.Kernels.repStatsEval($c);")
    override protected def withNewChildInternal(c: Expression): RepStatsExpr = copy(c)
  }

  /** Line-level repetition stats of raw text (duplicate-line signals). */
  case class LineRepStatsExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def nullSafeEval(input: Any): Any =
      lineRepStatsEval(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = graft.plans.Kernels.lineRepStatsEval($c);")
    override protected def withNewChildInternal(c: Expression): LineRepStatsExpr = copy(c)
  }

  /** IVF coarse-quantizer probe: the `n` nearest centroid ids for a
    * vector, squared-L2 ascending. Centroids ride along with the
    * expression (broadcast in the closure — nList × dim doubles), so
    * assignment is pure map-side: no join, no shuffle. Codegen references
    * the centroid array via `addReferenceObj`.
    */
  case class NearestCentroidsExpr(child: Expression, centroids: Array[Array[Double]], n: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    @transient private lazy val elemKind =
      child.dataType.asInstanceOf[ArrayType].elementType match {
        case FloatType => 0
        case _         => 1
      }
    override def nullSafeEval(input: Any): Any =
      nearestCentroidsEval(input.asInstanceOf[ArrayData], centroids, n, elemKind)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val cRef = ctx.addReferenceObj("centroids", centroids, "double[][]")
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.plans.Kernels.nearestCentroidsEval($c, $cRef, $n, $elemKind);")
    }
    override protected def withNewChildInternal(c: Expression): NearestCentroidsExpr =
      copy(child = c)
  }

  /** Squared L2 distance of two numeric arrays (float or double). */
  case class L2DistExpr(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = DoubleType
    @transient private lazy val aIsFloat =
      left.dataType.asInstanceOf[ArrayType].elementType == FloatType
    @transient private lazy val bIsFloat =
      right.dataType.asInstanceOf[ArrayType].elementType == FloatType
    override def nullSafeEval(l: Any, r: Any): Any =
      l2DistEval(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData], aIsFloat, bIsFloat)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = graft.plans.Kernels.l2DistEval($a, $b, $aIsFloat, $bIsFloat);")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): L2DistExpr =
      copy(left = l, right = r)
  }

  /** PQ residual encode: (vec, coarse list id) → m-byte code. Codebooks
    * and coarse centroids ride as expression constants (map-side, no
    * shuffle — same pattern as [[NearestCentroidsExpr]]).
    */
  case class PqEncodeExpr(
      left: Expression, right: Expression,
      coarse: Array[Array[Double]], flatCodebooks: Array[Array[Double]], codeK: Int,
      rot: Array[Array[Double]] = null)
      extends BinaryExpression {
    override def dataType: DataType = BinaryType
    @transient private lazy val elemKind =
      left.dataType.asInstanceOf[ArrayType].elementType match {
        case FloatType => 0
        case _         => 1
      }
    override def nullSafeEval(v: Any, l: Any): Any =
      pqEncodeEval(v.asInstanceOf[ArrayData], l.asInstanceOf[Int],
        coarse, flatCodebooks, codeK, rot, elemKind)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val coarseRef = ctx.addReferenceObj("pqCoarse", coarse, "double[][]")
      val cbRef = ctx.addReferenceObj("pqCodebooks", flatCodebooks, "double[][]")
      val rotRef =
        if (rot == null) "((double[][]) null)"
        else ctx.addReferenceObj("pqRot", rot, "double[][]")
      nullSafeCodeGen(ctx, ev, (v, l) =>
        s"${ev.value} = graft.plans.Kernels.pqEncodeEval($v, $l, $coarseRef, $cbRef, $codeK, $rotRef, $elemKind);")
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): PqEncodeExpr =
      copy(left = l, right = r)
  }

  /** ADC distance: (query vector, coarse list, residual code) → double,
    * codebooks as codegen reference constants (same pattern as
    * [[NearestCentroidsExpr]]).
    */
  case class PqAdcDistExpr(
      first: Expression, second: Expression, third: Expression,
      coarse: Array[Array[Double]], flatCodebooks: Array[Array[Double]],
      rot: Array[Array[Double]] = null)
      extends TernaryExpression {
    override def dataType: DataType = DoubleType
    @transient private lazy val elemKind =
      first.dataType.asInstanceOf[ArrayType].elementType match {
        case FloatType => 0
        case _         => 1
      }
    override def nullSafeEval(q: Any, l: Any, c: Any): Any =
      pqAdcDistEval(q.asInstanceOf[ArrayData], l.asInstanceOf[Int],
        c.asInstanceOf[Array[Byte]], coarse, flatCodebooks, rot, elemKind)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val coarseRef = ctx.addReferenceObj("pqCoarse", coarse, "double[][]")
      val cbRef = ctx.addReferenceObj("pqCodebooks", flatCodebooks, "double[][]")
      val rotRef =
        if (rot == null) "((double[][]) null)"
        else ctx.addReferenceObj("pqRot", rot, "double[][]")
      nullSafeCodeGen(ctx, ev, (q, l, c) =>
        s"${ev.value} = graft.plans.Kernels.pqAdcDistEval($q, $l, $c, $coarseRef, $cbRef, $rotRef, $elemKind);")
    }
    override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): PqAdcDistExpr =
      copy(first = f, second = s, third = t)
  }

  /** Bloom-filter membership over a broadcast sketch (the explicit form of
    * Spark's runtime row-level bloom join filter): the small side's key
    * sketch rides into codegen as a reference object — like the centroid
    * kernels — so the 100 TB fact side is pruned map-side BEFORE its
    * shuffle, inside the scan's WholeStageCodegen span. False positives
    * only fail to prune; the downstream join keeps the result exact.
    */
  case class BloomMightContainExpr(
      child: Expression, bloom: org.apache.spark.util.sketch.BloomFilter)
      extends UnaryExpression {
    override def dataType: DataType = BooleanType
    @transient private lazy val keyKind = child.dataType match {
      case StringType => 1
      case _          => 0
    }
    override def nullSafeEval(v: Any): Any = bloomMightContainEval(bloom, v, keyKind)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val bRef = ctx.addReferenceObj("bloom", bloom,
        "org.apache.spark.util.sketch.BloomFilter")
      nullSafeCodeGen(ctx, ev, v =>
        s"${ev.value} = graft.plans.Kernels.bloomMightContainEval($bRef, $v, $keyKind);")
    }
    override protected def withNewChildInternal(c: Expression): BloomMightContainExpr =
      copy(child = c)
  }

  /** Z-order curve value over an array of double-cast columns; quantile
    * boundaries (driver-computed sketch) ride as a reference object.
    */
  case class ZValueExpr(child: Expression, boundaries: Array[Array[Double]], bits: Int)
      extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullSafeEval(v: Any): Any =
      zValueEval(v.asInstanceOf[ArrayData], boundaries, bits)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val bRef = ctx.addReferenceObj("zBoundaries", boundaries, "double[][]")
      nullSafeCodeGen(ctx, ev, v =>
        s"${ev.value} = graft.plans.Kernels.zValueEval($v, $bRef, $bits);")
    }
    override protected def withNewChildInternal(c: Expression): ZValueExpr =
      copy(child = c)
  }

  /** Locale-tolerant number parse (the reference's ingest differentiator,
    * infertypes.nim:26-120): "1,000,000.5" (US), "1.000.000,5" (EU),
    * "1 000 000" (space/nbsp/apostrophe groupings) → double; null on
    * failure. Single pass over the string; mirrors
    * `TypeInference.normalizeNumber` semantics exactly.
    */
  /** Single-pass per-row LM perplexity under a hashed bigram/unigram
    * model riding as expression constants (sorted bucket arrays +
    * parallel counts — same constants-in-the-expression pattern as
    * [[NearestCentroidsExpr]]). One tokenize, binary-search lookups,
    * no explode/join/groupBy — fully STATELESS, so it composes into
    * Structured Streaming where the broadcast-join scoring path's
    * per-doc aggregation cannot. Bucket hashing reproduces the
    * DataFrame path bit-exactly: `xxhash64(shingle, lit(seed:Int))` =
    * `hashInt(seed, hashUTF8String(shingle, 42L))`, then pmod.
    * Null for docs with < 2 tokens (no transitions — the scoring
    * path's contract).
    */
  def pplScoreEval(
      input: UTF8String,
      uniK: Array[Long], uniV: Array[Long],
      biK: Array[Long], biV: Array[Long],
      triK: Array[Long], triV: Array[Long],
      nTokens: Long, buckets: Long, seed: Int, lambda: Double,
      order: Int): java.lang.Double = {
    def bucketOf(u: UTF8String): Long = {
      val h = XXH64.hashInt(seed, XXH64.hashUTF8String(u, 42L))
      ((h % buckets) + buckets) % buckets
    }
    def lookup(keys: Array[Long], vals: Array[Long], k: Long): Long = {
      val idx = java.util.Arrays.binarySearch(keys, k)
      if (idx >= 0) vals(idx) else 0L
    }
    val toks = wordShinglesEval(input, 1)
    val n = toks.numElements()
    if (n < order) return null
    var nll = 0.0
    if (order == 2) {
      var i = 0
      while (i < n - 1) {
        val prev = toks.getUTF8String(i)
        val cur = toks.getUTF8String(i + 1)
        val sh = UTF8String.fromString(prev.toString + " " + cur.toString)
        val cb = lookup(biK, biV, bucketOf(sh))
        val cprev = lookup(uniK, uniV, bucketOf(prev))
        val cu = lookup(uniK, uniV, bucketOf(cur))
        val pCond = if (cb > 0L && cprev > 0L) cb.toDouble / cprev.toDouble else 0.0
        val pUni = (cu.toDouble + 1.0) / (nTokens.toDouble + buckets.toDouble)
        nll -= math.log(lambda * pCond + (1.0 - lambda) * pUni)
        i += 1
      }
      java.lang.Double.valueOf(math.exp(nll / (n - 1)))
    } else {
      // recursive Jelinek–Mercer: P₃ = λ·c₃/c₂(hist) + (1−λ)·P₂,
      // P₂ = λ·c₂(last)/c₁(v) + (1−λ)·P₁, P₁ add-one-smoothed — never
      // zero, so the log is total
      var i = 0
      while (i < n - 2) {
        val u = toks.getUTF8String(i).toString
        val v = toks.getUTF8String(i + 1).toString
        val w = toks.getUTF8String(i + 2).toString
        val c3 = lookup(triK, triV, bucketOf(UTF8String.fromString(u + " " + v + " " + w)))
        val c2h = lookup(biK, biV, bucketOf(UTF8String.fromString(u + " " + v)))
        val c2l = lookup(biK, biV, bucketOf(UTF8String.fromString(v + " " + w)))
        val cv = lookup(uniK, uniV, bucketOf(UTF8String.fromString(v)))
        val cw = lookup(uniK, uniV, bucketOf(UTF8String.fromString(w)))
        val p3 = if (c3 > 0L && c2h > 0L) c3.toDouble / c2h.toDouble else 0.0
        val p2 = if (c2l > 0L && cv > 0L) c2l.toDouble / cv.toDouble else 0.0
        val p1 = (cw.toDouble + 1.0) / (nTokens.toDouble + buckets.toDouble)
        nll -= math.log(lambda * p3 + (1.0 - lambda) * (lambda * p2 + (1.0 - lambda) * p1))
        i += 1
      }
      java.lang.Double.valueOf(math.exp(nll / (n - 2)))
    }
  }

  /** Per-row interpolated Kneser–Ney perplexity — bit-compatible with
    * the KN branch of `Perplexity.score` (same hashing, same discount
    * math, same two wholesale-backoff fallbacks; pinned by spec).
    * Lookup of an absent bucket returns count 0, which is exactly the
    * join path's left-join-null: "history unseen" ⇔ c(history) == 0.
    */
  def knPplScoreEval(
      input: UTF8String,
      uniK: Array[Long], uniV: Array[Long],
      biK: Array[Long], biV: Array[Long],
      triK: Array[Long], triV: Array[Long],
      contK: Array[Long], contV: Array[Long],
      folK: Array[Long], folV: Array[Long],
      fol2K: Array[Long], fol2V: Array[Long],
      b2Types: Long, buckets: Long, seed: Int, discount: Double,
      order: Int): java.lang.Double = {
    def bucketOf(s: String): Long = {
      val h = XXH64.hashInt(seed, XXH64.hashUTF8String(UTF8String.fromString(s), 42L))
      ((h % buckets) + buckets) % buckets
    }
    def lookup(keys: Array[Long], vals: Array[Long], k: Long): Long = {
      val idx = java.util.Arrays.binarySearch(keys, k)
      if (idx >= 0) vals(idx) else 0L
    }
    val toks = wordShinglesEval(input, 1)
    val n = toks.numElements()
    if (n < order) return null
    def pCont(w: String): Double =
      (lookup(contK, contV, bucketOf(w)).toDouble + 1.0) /
        (b2Types.toDouble + buckets.toDouble)
    def p2Of(v: String, w: String): Double = {
      val pcont = pCont(w)
      val cv = lookup(uniK, uniV, bucketOf(v))
      val p2raw =
        if (cv > 0L) {
          val c2 = lookup(biK, biV, bucketOf(v + " " + w))
          val fol = lookup(folK, folV, bucketOf(v))
          (math.max(c2.toDouble - discount, 0.0) +
            discount * fol.toDouble * pcont) / cv.toDouble
        } else pcont
      if (p2raw > 0.0) p2raw else pcont
    }
    var nll = 0.0
    if (order == 2) {
      var i = 0
      while (i < n - 1) {
        nll -= math.log(p2Of(toks.getUTF8String(i).toString,
          toks.getUTF8String(i + 1).toString))
        i += 1
      }
      java.lang.Double.valueOf(math.exp(nll / (n - 1)))
    } else {
      var i = 0
      while (i < n - 2) {
        val u = toks.getUTF8String(i).toString
        val v = toks.getUTF8String(i + 1).toString
        val w = toks.getUTF8String(i + 2).toString
        val p2 = p2Of(v, w)
        val c2h = lookup(biK, biV, bucketOf(u + " " + v))
        val p3raw =
          if (c2h > 0L) {
            val c3 = lookup(triK, triV, bucketOf(u + " " + v + " " + w))
            val fol2 = lookup(fol2K, fol2V, bucketOf(u + " " + v))
            (math.max(c3.toDouble - discount, 0.0) +
              discount * fol2.toDouble * p2) / c2h.toDouble
          } else p2
        nll -= math.log(if (p3raw > 0.0) p3raw else p2)
        i += 1
      }
      java.lang.Double.valueOf(math.exp(nll / (n - 2)))
    }
  }

  case class KnPplScoreExpr(
      child: Expression,
      uniK: Array[Long], uniV: Array[Long],
      biK: Array[Long], biV: Array[Long],
      triK: Array[Long], triV: Array[Long],
      contK: Array[Long], contV: Array[Long],
      folK: Array[Long], folV: Array[Long],
      fol2K: Array[Long], fol2V: Array[Long],
      b2Types: Long, buckets: Long, seed: Int, discount: Double, order: Int)
      extends UnaryExpression {
    // discount is spliced into generated Java source as a literal (the
    // PplScoreExpr lambda invariant)
    require(java.lang.Double.isFinite(discount) && discount > 0.0 && discount < 1.0,
      s"discount: $discount")
    require(order == 2 || order == 3, s"order: $order (2 or 3)")
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def nullSafeEval(input: Any): Any =
      knPplScoreEval(input.asInstanceOf[UTF8String],
        uniK, uniV, biK, biV, triK, triV, contK, contV, folK, folV,
        fol2K, fol2V, b2Types, buckets, seed, discount, order)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      def ref(name: String, a: Array[Long]) = ctx.addReferenceObj(name, a, "long[]")
      val (uk, uv) = (ref("uniK", uniK), ref("uniV", uniV))
      val (bk, bv) = (ref("biK", biK), ref("biV", biV))
      val (tk, tv) = (ref("triK", triK), ref("triV", triV))
      val (ck, cv) = (ref("contK", contK), ref("contV", contV))
      val (fk, fv) = (ref("folK", folK), ref("folV", folV))
      val (f2k, f2v) = (ref("fol2K", fol2K), ref("fol2V", fol2V))
      nullSafeCodeGen(ctx, ev, c => s"""
        java.lang.Double ${ev.value}_r = graft.plans.Kernels.knPplScoreEval(
          $c, $uk, $uv, $bk, $bv, $tk, $tv, $ck, $cv, $fk, $fv, $f2k, $f2v,
          ${b2Types}L, ${buckets}L, $seed, $discount, $order);
        if (${ev.value}_r == null) {
          ${ev.isNull} = true;
        } else {
          ${ev.value} = ${ev.value}_r.doubleValue();
        }
      """)
    }
    override protected def withNewChildInternal(c: Expression): KnPplScoreExpr =
      copy(child = c)
  }

  /** Single-pass per-row DSIR log importance weight (Xie et al. 2023)
    * under a hashed-n-gram log-ratio table riding as expression
    * constants (sorted bucket keys + parallel ratios — the
    * [[PplScoreExpr]] pattern). One tokenize, binary-search lookups, no
    * explode/join/groupBy — fully STATELESS, so it composes into
    * Structured Streaming where the broadcast-join scoring path's
    * per-doc aggregation cannot. Bucket hashing reproduces the
    * DataFrame path bit-exactly (`xxhash64(shingle, lit(seed:Int))` =
    * `hashInt(seed, hashUTF8String(shingle, 42L))`, then pmod); an
    * n-gram hashing to a bucket absent from the table contributes the
    * smoothed `floor` — the join path's left-join + coalesce rule.
    * Docs with no n-grams return 0.0 (weight 1 — the join path's
    * `na.fill(0.0)` for docs the explode dropped).
    */
  def dsirWeightEval(
      input: UTF8String,
      keys: Array[Long], vals: Array[Double],
      floor: Double, nGram: Int, buckets: Long, seed: Int,
      mean: Boolean): Double = {
    val shingles = wordShinglesEval(input, nGram)
    val n = shingles.numElements()
    if (n == 0) return 0.0
    var sum = 0.0
    var i = 0
    while (i < n) {
      val h = XXH64.hashInt(seed, XXH64.hashUTF8String(shingles.getUTF8String(i), 42L))
      val b = ((h % buckets) + buckets) % buckets
      val idx = java.util.Arrays.binarySearch(keys, b)
      sum += (if (idx >= 0) vals(idx) else floor)
      i += 1
    }
    if (mean) sum / n else sum
  }

  case class DsirWeightExpr(
      child: Expression,
      keys: Array[Long], vals: Array[Double],
      floor: Double, nGram: Int, buckets: Long, seed: Int, mean: Boolean)
      extends UnaryExpression {
    // floor is spliced into generated Java source as a literal below —
    // NaN/Infinity have no Java literal form and would fail codegen.
    // (Dsir's degenerate-ratio-frame guards make this unreachable today;
    // the invariant belongs to the expression, not its callers.)
    require(java.lang.Double.isFinite(floor), s"non-finite DSIR floor: $floor")
    override def dataType: DataType = DoubleType
    override def nullSafeEval(input: Any): Any =
      dsirWeightEval(input.asInstanceOf[UTF8String],
        keys, vals, floor, nGram, buckets, seed, mean)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val k = ctx.addReferenceObj("dsirKeys", keys, "long[]")
      val v = ctx.addReferenceObj("dsirVals", vals, "double[]")
      nullSafeCodeGen(ctx, ev, c =>
        s"""${ev.value} = graft.plans.Kernels.dsirWeightEval(
           $c, $k, $v, $floor, $nGram, ${buckets}L, $seed, $mean);""")
    }
    override protected def withNewChildInternal(c: Expression): DsirWeightExpr =
      copy(child = c)
  }

  case class PplScoreExpr(
      child: Expression,
      uniK: Array[Long], uniV: Array[Long],
      biK: Array[Long], biV: Array[Long],
      triK: Array[Long], triV: Array[Long],
      nTokens: Long, buckets: Long, seed: Int, lambda: Double, order: Int)
      extends UnaryExpression {
    // lambda is spliced into generated Java source as a literal — a
    // non-finite value has no Java literal form (same invariant as
    // DsirWeightExpr's floor)
    require(java.lang.Double.isFinite(lambda) && lambda > 0.0 && lambda < 1.0,
      s"lambda: $lambda")
    require(order == 2 || order == 3, s"order: $order (2 or 3)")
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def nullSafeEval(input: Any): Any =
      pplScoreEval(input.asInstanceOf[UTF8String],
        uniK, uniV, biK, biV, triK, triV, nTokens, buckets, seed, lambda, order)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val uk = ctx.addReferenceObj("uniK", uniK, "long[]")
      val uv = ctx.addReferenceObj("uniV", uniV, "long[]")
      val bk = ctx.addReferenceObj("biK", biK, "long[]")
      val bv = ctx.addReferenceObj("biV", biV, "long[]")
      val tk = ctx.addReferenceObj("triK", triK, "long[]")
      val tv = ctx.addReferenceObj("triV", triV, "long[]")
      nullSafeCodeGen(ctx, ev, c => s"""
        java.lang.Double ${ev.value}_r = graft.plans.Kernels.pplScoreEval(
          $c, $uk, $uv, $bk, $bv, $tk, $tv, ${nTokens}L, ${buckets}L, $seed, $lambda, $order);
        if (${ev.value}_r == null) {
          ${ev.isNull} = true;
        } else {
          ${ev.value} = ${ev.value}_r.doubleValue();
        }
      """)
    }
    override protected def withNewChildInternal(c: Expression): PplScoreExpr =
      copy(child = c)
  }

  case class LocaleNumberExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def nullSafeEval(input: Any): Any = {
      val r = localeNumberEval(input.asInstanceOf[UTF8String])
      if (r == null) null else r.doubleValue()
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => s"""
        java.lang.Double ${ev.value}_r = graft.plans.Kernels.localeNumberEval($c);
        if (${ev.value}_r == null) {
          ${ev.isNull} = true;
        } else {
          ${ev.value} = ${ev.value}_r.doubleValue();
        }
      """)
    override protected def withNewChildInternal(c: Expression): LocaleNumberExpr =
      copy(child = c)
  }

  /** Locale-separator normalization as a string→string kernel (see
    * [[localeNormEval]]). Profiling (driver-side eval) and the
    * distributed cast share this ONE implementation, so the
    * exact-integer routes (bigint, decimal(38,0)) can never disagree
    * with what the profiler sampled.
    */
  case class LocaleNormExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    override def nullSafeEval(input: Any): Any =
      localeNormEval(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = graft.plans.Kernels.localeNormEval($c);")
    override protected def withNewChildInternal(c: Expression): LocaleNormExpr =
      copy(child = c)
  }

  /** All hashed n-gram buckets of a document, orders 1..maxOrder, one
    * element per OCCURRENCE (duplicates kept — they carry the term
    * frequency). Bucket hashing is bit-identical to the DataFrame path
    * (`pmod(xxhash64(shingle, lit(seed:Int)), buckets)` =
    * `hashInt(seed, hashUTF8String(shingle, 42L))` then pmod — the
    * [[dsirWeightEval]]/[[pplScoreEval]] contract), so a model trained
    * through this kernel scores identically through the broadcast-join
    * path. Empty text → empty array.
    */
  def hashedGramsEval(
      input: UTF8String, buckets: Long, seed: Int, maxOrder: Int): ArrayData = {
    var total = 0
    val parts = new Array[ArrayData](maxOrder)
    var o = 0
    while (o < maxOrder) {
      parts(o) = wordShinglesEval(input, o + 1)
      total += parts(o).numElements()
      o += 1
    }
    val out = new Array[Any](total)
    var j = 0
    o = 0
    while (o < maxOrder) {
      val p = parts(o)
      val n = p.numElements()
      var i = 0
      while (i < n) {
        val h = XXH64.hashInt(seed, XXH64.hashUTF8String(p.getUTF8String(i), 42L))
        out(j) = ((h % buckets) + buckets) % buckets
        j += 1
        i += 1
      }
      o += 1
    }
    new GenericArrayData(out)
  }

  case class HashedGramsExpr(child: Expression, buckets: Long, seed: Int, maxOrder: Int)
      extends UnaryExpression {
    require(buckets > 0 && maxOrder >= 1 && maxOrder <= 3,
      s"buckets: $buckets, maxOrder: $maxOrder")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any =
      hashedGramsEval(input.asInstanceOf[UTF8String], buckets, seed, maxOrder)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.plans.Kernels.hashedGramsEval($c, ${buckets}L, $seed, $maxOrder);")
    override protected def withNewChildInternal(c: Expression): HashedGramsExpr =
      copy(child = c)
  }

  /** 8-bit scalar-quantization encode (the FAISS SQ8 shape): per
    * dimension, code = round((x − lo) / step) clamped to [0, 255],
    * with step = (hi − lo)/255 trained from the corpus. 4× smaller
    * than float32 at far higher fidelity than PQ — the middle rung of
    * the memory/recall ladder. A degenerate dimension (hi == lo →
    * step 0) encodes 0 and decodes back to lo exactly.
    */
  def sqEncodeEval(
      vec: ArrayData, lo: Array[Double], step: Array[Double],
      elemKind: Int): Array[Byte] = {
    val d = lo.length
    require(vec.numElements() == d,
      s"vector dim ${vec.numElements()} != trained dim $d")
    val out = new Array[Byte](d)
    var i = 0
    while (i < d) {
      val x = if (elemKind == 0) vec.getFloat(i).toDouble else vec.getDouble(i)
      val q =
        if (step(i) <= 0.0) 0L
        else math.round((x - lo(i)) / step(i))
      out(i) = math.max(0L, math.min(255L, q)).toByte
      i += 1
    }
    out
  }

  /** Asymmetric SQ distance: squared L2 between a raw query vector and
    * a dequantized SQ8 code (lo(i) + (code(i) & 0xFF)·step(i)) — the
    * codes never decode to a materialized float column.
    */
  def sqAdcDistEval(
      q: ArrayData, code: Array[Byte], lo: Array[Double], step: Array[Double],
      elemKind: Int): Double = {
    val d = lo.length
    var s = 0.0
    var i = 0
    while (i < d) {
      val x = if (elemKind == 0) q.getFloat(i).toDouble else q.getDouble(i)
      val y = lo(i) + (code(i) & 0xFF).toDouble * step(i)
      val diff = x - y
      s += diff * diff
      i += 1
    }
    s
  }

  case class SqEncodeExpr(child: Expression, lo: Array[Double], step: Array[Double])
      extends UnaryExpression {
    require(lo.length == step.length, s"lo/step dims: ${lo.length}/${step.length}")
    override def dataType: DataType = BinaryType
    @transient private lazy val elemKind =
      child.dataType.asInstanceOf[ArrayType].elementType match {
        case FloatType => 0
        case _         => 1
      }
    override def nullSafeEval(input: Any): Any =
      sqEncodeEval(input.asInstanceOf[ArrayData], lo, step, elemKind)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val l = ctx.addReferenceObj("sqLo", lo, "double[]")
      val s = ctx.addReferenceObj("sqStep", step, "double[]")
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.plans.Kernels.sqEncodeEval($c, $l, $s, $elemKind);")
    }
    override protected def withNewChildInternal(c: Expression): SqEncodeExpr =
      copy(child = c)
  }

  case class SqAdcDistExpr(left: Expression, right: Expression,
      lo: Array[Double], step: Array[Double])
      extends BinaryExpression {
    require(lo.length == step.length, s"lo/step dims: ${lo.length}/${step.length}")
    override def dataType: DataType = DoubleType
    @transient private lazy val elemKind =
      left.dataType.asInstanceOf[ArrayType].elementType match {
        case FloatType => 0
        case _         => 1
      }
    override def nullSafeEval(q: Any, code: Any): Any =
      sqAdcDistEval(q.asInstanceOf[ArrayData], code.asInstanceOf[Array[Byte]],
        lo, step, elemKind)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val l = ctx.addReferenceObj("sqLo", lo, "double[]")
      val s = ctx.addReferenceObj("sqStep", step, "double[]")
      nullSafeCodeGen(ctx, ev, (q, c) =>
        s"${ev.value} = graft.plans.Kernels.sqAdcDistEval($q, $c, $l, $s, $elemKind);")
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): SqAdcDistExpr =
      copy(left = l, right = r)
  }

  /** Greedy byte-pair encode of ONE word (symbol list of single chars +
    * an `</w>` end marker) under a learned merge-rank table: repeatedly
    * merge the adjacent pair with the LOWEST rank until none remains —
    * the canonical BPE application order (Sennrich et al. 2016, §3.2:
    * merges learned on the training dictionary replay in learned
    * order). Pairs are keyed `"left right"` in `ranks`.
    */
  private def bpeEncodeWord(
      word: String, ranks: java.util.HashMap[String, Integer]): Array[String] = {
    var syms = new Array[String](word.length + 1)
    var i = 0
    while (i < word.length) { syms(i) = String.valueOf(word.charAt(i)); i += 1 }
    syms(word.length) = "</w>"
    while (syms.length > 1) {
      var best = -1
      var bestRank = Int.MaxValue
      var j = 0
      while (j < syms.length - 1) {
        val r = ranks.get(syms(j) + " " + syms(j + 1))
        if (r != null && r.intValue() < bestRank) { bestRank = r.intValue(); best = j }
        j += 1
      }
      if (best < 0) return syms
      val merged = new Array[String](syms.length - 1)
      System.arraycopy(syms, 0, merged, 0, best)
      merged(best) = syms(best) + syms(best + 1)
      System.arraycopy(syms, best + 2, merged, best + 1, syms.length - best - 2)
      syms = merged
    }
    syms
  }

  /** BPE tokens of a whole document: tokenize with the engine-wide word
    * rule ([[wordShinglesEval]] order 1 — lowercased [a-z0-9] runs), then
    * greedy-encode each word. Per-call word memo: natural text repeats
    * words heavily, so each distinct word encodes once per row batch.
    */
  def bpeTokensEval(
      input: UTF8String, ranks: java.util.HashMap[String, Integer]): ArrayData = {
    val words = wordShinglesEval(input, 1)
    val n = words.numElements()
    val memo = new java.util.HashMap[String, Array[String]]()
    val out = new java.util.ArrayList[Any]()
    var i = 0
    while (i < n) {
      val w = words.getUTF8String(i).toString
      var toks = memo.get(w)
      if (toks == null) { toks = bpeEncodeWord(w, ranks); memo.put(w, toks) }
      var j = 0
      while (j < toks.length) { out.add(UTF8String.fromString(toks(j))); j += 1 }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  case class BpeTokensExpr(child: Expression, ranks: java.util.HashMap[String, Integer])
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullSafeEval(input: Any): Any =
      bpeTokensEval(input.asInstanceOf[UTF8String], ranks)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val r = ctx.addReferenceObj("bpeRanks", ranks, "java.util.HashMap")
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.plans.Kernels.bpeTokensEval($c, $r);")
    }
    override protected def withNewChildInternal(c: Expression): BpeTokensExpr =
      copy(child = c)
  }

  /** Viterbi-best unigram-LM segmentation of one word (Kudo 2018,
    * "Subword Regularization", §3.1 decoding): maximize the sum of
    * piece log-probabilities over all segmentations — classic dp over
    * word positions, transitions bounded by `maxLen`. Ties keep the
    * EARLIEST start (longest final piece) — deterministic given the
    * table. A position unreachable through the table (a character
    * outside the trained vocabulary) falls back to per-character
    * emission so encoding is total.
    */
  private def unigramViterbiWord(
      word: String, logp: java.util.HashMap[String, java.lang.Double],
      maxLen: Int): Array[String] = {
    val n = word.length
    val best = new Array[Double](n + 1)
    val back = new Array[Int](n + 1)
    java.util.Arrays.fill(best, Double.NegativeInfinity)
    best(0) = 0.0
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - maxLen)
      while (j < i) {
        if (best(j) != Double.NegativeInfinity) {
          val p = logp.get(word.substring(j, i))
          if (p != null) {
            val s = best(j) + p.doubleValue()
            if (s > best(i)) { best(i) = s; back(i) = j }
          }
        }
        j += 1
      }
      i += 1
    }
    if (best(n) == Double.NegativeInfinity) {
      val out = new Array[String](n)
      var k = 0
      while (k < n) { out(k) = String.valueOf(word.charAt(k)); k += 1 }
      return out
    }
    val rev = new java.util.ArrayList[String]()
    var pos = n
    while (pos > 0) { rev.add(word.substring(back(pos), pos)); pos = back(pos) }
    val out = new Array[String](rev.size)
    var k = 0
    while (k < out.length) { out(k) = rev.get(out.length - 1 - k); k += 1 }
    out
  }

  /** Unigram-LM tokens of a whole document: engine-wide word rule
    * ([[wordShinglesEval]] order 1), then Viterbi-segment each word.
    * Per-call word memo, like [[bpeTokensEval]].
    */
  def unigramTokensEval(
      input: UTF8String, logp: java.util.HashMap[String, java.lang.Double],
      maxLen: Int): ArrayData = {
    val words = wordShinglesEval(input, 1)
    val n = words.numElements()
    val memo = new java.util.HashMap[String, Array[String]]()
    val out = new java.util.ArrayList[Any]()
    var i = 0
    while (i < n) {
      val w = words.getUTF8String(i).toString
      var toks = memo.get(w)
      if (toks == null) { toks = unigramViterbiWord(w, logp, maxLen); memo.put(w, toks) }
      var j = 0
      while (j < toks.length) { out.add(UTF8String.fromString(toks(j))); j += 1 }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  case class UnigramTokensExpr(child: Expression,
      logp: java.util.HashMap[String, java.lang.Double], maxLen: Int)
      extends UnaryExpression {
    require(maxLen > 0, s"maxLen: $maxLen")
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullSafeEval(input: Any): Any =
      unigramTokensEval(input.asInstanceOf[UTF8String], logp, maxLen)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val t = ctx.addReferenceObj("unigramLogp", logp, "java.util.HashMap")
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.plans.Kernels.unigramTokensEval($c, $t, $maxLen);")
    }
    override protected def withNewChildInternal(c: Expression): UnigramTokensExpr =
      copy(child = c)
  }

  /** Ids for an already-encoded token array: one HashMap probe per token
    * (O(1)), NOT an `element_at` over a Catalyst map literal (a linear
    * probe of ArrayBasedMapData — O(|V|) per token, ~100× slower at a
    * production 32k–64k vocabulary). `missing` is emitted for a token
    * outside the table; null means emit SQL NULL.
    */
  def tokenIdsEval(toks: ArrayData,
      ids: java.util.HashMap[String, Integer],
      missing: java.lang.Integer): ArrayData = {
    val n = toks.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      val id = ids.get(toks.getUTF8String(i).toString)
      out(i) = if (id != null) id else missing
      i += 1
    }
    new GenericArrayData(out)
  }

  def bpeTokenIdsEval(input: UTF8String,
      ranks: java.util.HashMap[String, Integer],
      ids: java.util.HashMap[String, Integer]): ArrayData =
    // BPE's charset is closed (encode only emits base symbols and merge
    // outputs, all present in the id table) — `missing` null never fires
    tokenIdsEval(bpeTokensEval(input, ranks), ids, null)

  def unigramTokenIdsEval(input: UTF8String,
      logp: java.util.HashMap[String, java.lang.Double], maxLen: Int,
      ids: java.util.HashMap[String, Integer]): ArrayData =
    // characters outside the trained charset fall back to per-character
    // emission in the encoder and carry the explicit OOV id -1
    tokenIdsEval(unigramTokensEval(input, logp, maxLen), ids, Integer.valueOf(-1))

  /** Tokenize + id-emit in ONE kernel call — the training-export hot
    * path (q_pack_export's token-id stream). Nullability mirrors the
    * map-literal path it replaces: element_at is nullable (though BPE's
    * closed charset means null never actually occurs).
    */
  case class BpeTokenIdsExpr(child: Expression,
      ranks: java.util.HashMap[String, Integer],
      ids: java.util.HashMap[String, Integer])
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(IntegerType, containsNull = true)
    override def nullSafeEval(input: Any): Any =
      bpeTokenIdsEval(input.asInstanceOf[UTF8String], ranks, ids)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val r = ctx.addReferenceObj("bpeRanks", ranks, "java.util.HashMap")
      val t = ctx.addReferenceObj("bpeIds", ids, "java.util.HashMap")
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.plans.Kernels.bpeTokenIdsEval($c, $r, $t);")
    }
    override protected def withNewChildInternal(c: Expression): BpeTokenIdsExpr =
      copy(child = c)
  }

  /** [[BpeTokenIdsExpr]]'s unigram twin; -1 is the explicit OOV id
    * (the coalesce fallback of the map-literal path), so the array is
    * null-free.
    */
  case class UnigramTokenIdsExpr(child: Expression,
      logp: java.util.HashMap[String, java.lang.Double], maxLen: Int,
      ids: java.util.HashMap[String, Integer])
      extends UnaryExpression {
    require(maxLen > 0, s"maxLen: $maxLen")
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def nullSafeEval(input: Any): Any =
      unigramTokenIdsEval(input.asInstanceOf[UTF8String], logp, maxLen, ids)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val l = ctx.addReferenceObj("unigramLogp", logp, "java.util.HashMap")
      val t = ctx.addReferenceObj("unigramIds", ids, "java.util.HashMap")
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.plans.Kernels.unigramTokenIdsEval($c, $l, $maxLen, $t);")
    }
    override protected def withNewChildInternal(c: Expression): UnigramTokenIdsExpr =
      copy(child = c)
  }

  /** Greedy longest-match-first WordPiece encode of ONE word — the
    * published BERT tokenizer application algorithm (Devlin et al.
    * 2019 §A; vocabulary pieces at word start are plain, word-internal
    * pieces carry the `##` continuation prefix; Schuster & Nakajima
    * 2012 for the vocabulary-learning criterion). At each position
    * take the LONGEST matching vocabulary piece (payload bounded by
    * `maxLen` chars); a position with NO matching piece makes the
    * whole word the single `unk` token — all-or-nothing, per the
    * public algorithm.
    */
  private def wordpieceEncodeWord(word: String,
      vocab: java.util.HashSet[String], maxLen: Int, unk: String): Array[String] = {
    val n = word.length
    val out = new java.util.ArrayList[String]()
    var pos = 0
    while (pos < n) {
      val lim = math.min(n, pos + maxLen)
      var e = lim
      var found: String = null
      while (e > pos && found == null) {
        val sub = word.substring(pos, e)
        val cand = if (pos == 0) sub else "##" + sub
        if (vocab.contains(cand)) found = cand else e -= 1
      }
      if (found == null) return Array(unk)
      out.add(found)
      pos = e
    }
    out.toArray(new Array[String](out.size))
  }

  /** WordPiece tokens of a whole document: engine-wide word rule
    * ([[wordShinglesEval]] order 1), then greedy longest-match encode
    * of each word. Per-call word memo, like [[bpeTokensEval]].
    */
  def wordpieceTokensEval(input: UTF8String,
      vocab: java.util.HashSet[String], maxLen: Int, unk: String): ArrayData = {
    val words = wordShinglesEval(input, 1)
    val n = words.numElements()
    val memo = new java.util.HashMap[String, Array[String]]()
    val out = new java.util.ArrayList[Any]()
    var i = 0
    while (i < n) {
      val w = words.getUTF8String(i).toString
      var toks = memo.get(w)
      if (toks == null) { toks = wordpieceEncodeWord(w, vocab, maxLen, unk); memo.put(w, toks) }
      var j = 0
      while (j < toks.length) { out.add(UTF8String.fromString(toks(j))); j += 1 }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  case class WordPieceTokensExpr(child: Expression,
      vocab: java.util.HashSet[String], maxLen: Int, unk: String)
      extends UnaryExpression {
    require(maxLen > 0, s"maxLen: $maxLen")
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullSafeEval(input: Any): Any =
      wordpieceTokensEval(input.asInstanceOf[UTF8String], vocab, maxLen, unk)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val v = ctx.addReferenceObj("wpVocab", vocab, "java.util.HashSet")
      val u = ctx.addReferenceObj("wpUnk", unk, "java.lang.String")
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.plans.Kernels.wordpieceTokensEval($c, $v, $maxLen, $u);")
    }
    override protected def withNewChildInternal(c: Expression): WordPieceTokensExpr =
      copy(child = c)
  }

  def wordpieceTokenIdsEval(input: UTF8String,
      vocab: java.util.HashSet[String], maxLen: Int, unk: String,
      ids: java.util.HashMap[String, Integer]): ArrayData =
    // encoding only ever emits vocabulary members or `unk`, and the id
    // table carries all of them — `missing` null never fires
    tokenIdsEval(wordpieceTokensEval(input, vocab, maxLen, unk), ids, null)

  /** [[BpeTokenIdsExpr]]'s WordPiece sibling: tokenize + id-emit in ONE
    * kernel call, O(1) HashMap probe per token.
    */
  case class WordPieceTokenIdsExpr(child: Expression,
      vocab: java.util.HashSet[String], maxLen: Int, unk: String,
      ids: java.util.HashMap[String, Integer])
      extends UnaryExpression {
    require(maxLen > 0, s"maxLen: $maxLen")
    override def dataType: DataType = ArrayType(IntegerType, containsNull = true)
    override def nullSafeEval(input: Any): Any =
      wordpieceTokenIdsEval(input.asInstanceOf[UTF8String], vocab, maxLen, unk, ids)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val v = ctx.addReferenceObj("wpVocab", vocab, "java.util.HashSet")
      val u = ctx.addReferenceObj("wpUnk", unk, "java.lang.String")
      val t = ctx.addReferenceObj("wpIds", ids, "java.util.HashMap")
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.plans.Kernels.wordpieceTokenIdsEval($c, $v, $maxLen, $u, $t);")
    }
    override protected def withNewChildInternal(c: Expression): WordPieceTokenIdsExpr =
      copy(child = c)
  }

  /** Single-pass logistic-regression quality probability under a DENSE
    * hashed-n-gram weight vector riding as a reference object (the
    * fastText-supervised / CCNet-linear-classifier shape): tokenize
    * once, x = per-bucket term frequency over orders 1..maxOrder
    * (L1-normalized by the total gram count), return
    * σ(bias + w·x) = σ(bias + Σ w[h(g)] / total). No explode, no join,
    * no shuffle — STATELESS, so it composes into Structured Streaming.
    * A doc with no grams carries no evidence: returns σ(bias) (the
    * prior), matching the join path's fill.
    */
  def logRegProbEval(
      input: UTF8String, weights: Array[Double], bias: Double,
      buckets: Long, seed: Int, maxOrder: Int): Double = {
    var sum = 0.0
    var total = 0
    var o = 0
    while (o < maxOrder) {
      val p = wordShinglesEval(input, o + 1)
      val n = p.numElements()
      total += n
      var i = 0
      while (i < n) {
        val h = XXH64.hashInt(seed, XXH64.hashUTF8String(p.getUTF8String(i), 42L))
        sum += weights((((h % buckets) + buckets) % buckets).toInt)
        i += 1
      }
      o += 1
    }
    val z = if (total == 0) bias else bias + sum / total
    1.0 / (1.0 + math.exp(-z))
  }

  case class LogRegProbExpr(
      child: Expression, weights: Array[Double], bias: Double,
      buckets: Long, seed: Int, maxOrder: Int)
      extends UnaryExpression {
    // bias is spliced into generated Java source as a literal —
    // non-finite values have no Java literal form (the DsirWeightExpr
    // floor invariant)
    require(java.lang.Double.isFinite(bias), s"non-finite bias: $bias")
    require(weights.length == buckets,
      s"weights length ${weights.length} != buckets $buckets")
    override def dataType: DataType = DoubleType
    override def nullSafeEval(input: Any): Any =
      logRegProbEval(input.asInstanceOf[UTF8String],
        weights, bias, buckets, seed, maxOrder)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val w = ctx.addReferenceObj("logRegWeights", weights, "double[]")
      nullSafeCodeGen(ctx, ev, c =>
        s"""${ev.value} = graft.plans.Kernels.logRegProbEval(
           $c, $w, $bias, ${buckets}L, $seed, $maxOrder);""")
    }
    override protected def withNewChildInternal(c: Expression): LogRegProbExpr =
      copy(child = c)
  }

  // Column-API wrappers
  def simhash64(tokens: Column): Column =
    ExpressionUtils.column(SimHash64Expr(ExpressionUtils.expression(tokens)))
  def minhashSig(shingles: Column, k: Int): Column =
    ExpressionUtils.column(MinHashSigExpr(ExpressionUtils.expression(shingles), k))
  def cosineSim(a: Column, b: Column): Column =
    ExpressionUtils.column(CosineSimExpr(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
  def hyperplaneBucket(vec: Column, nPlanes: Int): Column =
    ExpressionUtils.column(HyperplaneBucketExpr(ExpressionUtils.expression(vec), nPlanes))
  def hyperplaneProbes(vec: Column, nPlanes: Int, nProbes: Int): Column =
    ExpressionUtils.column(HyperplaneProbesExpr(ExpressionUtils.expression(vec), nPlanes, nProbes))
  def learnedBucket(vec: Column, planes: Array[Array[Double]], offsets: Array[Double]): Column =
    ExpressionUtils.column(LearnedBucketExpr(ExpressionUtils.expression(vec), planes, offsets))
  def learnedProbes(vec: Column, planes: Array[Array[Double]], offsets: Array[Double],
      nProbes: Int): Column =
    ExpressionUtils.column(
      LearnedProbesExpr(ExpressionUtils.expression(vec), planes, offsets, nProbes))
  def tokenWindowHashes(text: Column, winLen: Int): Column =
    ExpressionUtils.column(TokenWindowHashesExpr(ExpressionUtils.expression(text), winLen))
  def deflateRatio(text: Column): Column =
    ExpressionUtils.column(DeflateRatioExpr(ExpressionUtils.expression(text)))
  def normalizeText(text: Column): Column =
    ExpressionUtils.column(NormalizeTextExpr(ExpressionUtils.expression(text)))
  def collationKey(text: Column): Column =
    ExpressionUtils.column(CollationKeyExpr(ExpressionUtils.expression(text)))
  def removeSpans(text: Column, starts: Column, winLen: Int): Column =
    ExpressionUtils.column(RemoveSpansExpr(
      ExpressionUtils.expression(text), ExpressionUtils.expression(starts), winLen))
  def coveredCount(starts: Column, winLen: Int): Column =
    ExpressionUtils.column(CoveredCountExpr(ExpressionUtils.expression(starts), winLen))
  def wordShingles(text: Column, n: Int): Column =
    ExpressionUtils.column(WordShinglesExpr(ExpressionUtils.expression(text), n))
  def dsirWeight(text: Column, keys: Array[Long], vals: Array[Double],
      floor: Double, nGram: Int, buckets: Long, seed: Int, mean: Boolean): Column =
    ExpressionUtils.column(DsirWeightExpr(ExpressionUtils.expression(text),
      keys, vals, floor, nGram, buckets, seed, mean))
  def pplScore(text: Column, uniK: Array[Long], uniV: Array[Long],
      biK: Array[Long], biV: Array[Long], triK: Array[Long], triV: Array[Long],
      nTokens: Long, buckets: Long, seed: Int, lambda: Double, order: Int): Column =
    ExpressionUtils.column(PplScoreExpr(ExpressionUtils.expression(text),
      uniK, uniV, biK, biV, triK, triV, nTokens, buckets, seed, lambda, order))
  def localeNumber(s: Column): Column =
    ExpressionUtils.column(LocaleNumberExpr(ExpressionUtils.expression(s)))
  def localeNorm(s: Column): Column =
    ExpressionUtils.column(LocaleNormExpr(ExpressionUtils.expression(s)))
  def jaccardSim(a: Column, b: Column): Column =
    ExpressionUtils.column(JaccardSimExpr(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
  def minKHashes(arr: Column, k: Int): Column =
    ExpressionUtils.column(MinKHashesExpr(ExpressionUtils.expression(arr), k))
  def nearestCentroids(vec: Column, centroids: Array[Array[Double]], n: Int): Column =
    ExpressionUtils.column(
      NearestCentroidsExpr(ExpressionUtils.expression(vec), centroids, n))
  def repStats(arr: Column): Column =
    ExpressionUtils.column(RepStatsExpr(ExpressionUtils.expression(arr)))
  def lineRepStats(text: Column): Column =
    ExpressionUtils.column(LineRepStatsExpr(ExpressionUtils.expression(text)))
  def l2Dist(a: Column, b: Column): Column =
    ExpressionUtils.column(L2DistExpr(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
  def pqEncode(vec: Column, list: Column, coarse: Array[Array[Double]],
      flatCodebooks: Array[Array[Double]], codeK: Int,
      rot: Array[Array[Double]] = null): Column =
    ExpressionUtils.column(PqEncodeExpr(ExpressionUtils.expression(vec),
      ExpressionUtils.expression(list), coarse, flatCodebooks, codeK, rot))
  def pqAdcDist(qv: Column, list: Column, code: Column,
      coarse: Array[Array[Double]], flatCodebooks: Array[Array[Double]],
      rot: Array[Array[Double]] = null): Column =
    ExpressionUtils.column(PqAdcDistExpr(ExpressionUtils.expression(qv),
      ExpressionUtils.expression(list), ExpressionUtils.expression(code),
      coarse, flatCodebooks, rot))
  def bloomMightContain(key: Column, bloom: org.apache.spark.util.sketch.BloomFilter): Column =
    ExpressionUtils.column(BloomMightContainExpr(ExpressionUtils.expression(key), bloom))
  def zValue(cols: Column, boundaries: Array[Array[Double]], bits: Int): Column =
    ExpressionUtils.column(ZValueExpr(ExpressionUtils.expression(cols), boundaries, bits))
  def sqEncode(vec: Column, lo: Array[Double], step: Array[Double]): Column =
    ExpressionUtils.column(SqEncodeExpr(ExpressionUtils.expression(vec), lo, step))
  def sqAdcDist(qv: Column, code: Column, lo: Array[Double], step: Array[Double]): Column =
    ExpressionUtils.column(SqAdcDistExpr(
      ExpressionUtils.expression(qv), ExpressionUtils.expression(code), lo, step))
  def knPplScore(text: Column, uniK: Array[Long], uniV: Array[Long],
      biK: Array[Long], biV: Array[Long], triK: Array[Long], triV: Array[Long],
      contK: Array[Long], contV: Array[Long], folK: Array[Long], folV: Array[Long],
      fol2K: Array[Long], fol2V: Array[Long],
      b2Types: Long, buckets: Long, seed: Int, discount: Double, order: Int): Column =
    ExpressionUtils.column(KnPplScoreExpr(ExpressionUtils.expression(text),
      uniK, uniV, biK, biV, triK, triV, contK, contV, folK, folV, fol2K, fol2V,
      b2Types, buckets, seed, discount, order))
  def bpeTokens(text: Column, ranks: java.util.HashMap[String, Integer]): Column =
    ExpressionUtils.column(BpeTokensExpr(ExpressionUtils.expression(text), ranks))
  def unigramTokens(text: Column,
      logp: java.util.HashMap[String, java.lang.Double], maxLen: Int): Column =
    ExpressionUtils.column(UnigramTokensExpr(ExpressionUtils.expression(text), logp, maxLen))
  def bpeTokenIds(text: Column, ranks: java.util.HashMap[String, Integer],
      ids: java.util.HashMap[String, Integer]): Column =
    ExpressionUtils.column(BpeTokenIdsExpr(ExpressionUtils.expression(text), ranks, ids))
  def unigramTokenIds(text: Column,
      logp: java.util.HashMap[String, java.lang.Double], maxLen: Int,
      ids: java.util.HashMap[String, Integer]): Column =
    ExpressionUtils.column(
      UnigramTokenIdsExpr(ExpressionUtils.expression(text), logp, maxLen, ids))
  def wordpieceTokens(text: Column, vocab: java.util.HashSet[String],
      maxLen: Int, unk: String): Column =
    ExpressionUtils.column(
      WordPieceTokensExpr(ExpressionUtils.expression(text), vocab, maxLen, unk))
  def wordpieceTokenIds(text: Column, vocab: java.util.HashSet[String],
      maxLen: Int, unk: String, ids: java.util.HashMap[String, Integer]): Column =
    ExpressionUtils.column(
      WordPieceTokenIdsExpr(ExpressionUtils.expression(text), vocab, maxLen, unk, ids))
  def hashedGrams(text: Column, buckets: Long, seed: Int, maxOrder: Int): Column =
    ExpressionUtils.column(HashedGramsExpr(ExpressionUtils.expression(text),
      buckets, seed, maxOrder))
  def logRegProb(text: Column, weights: Array[Double], bias: Double,
      buckets: Long, seed: Int, maxOrder: Int): Column =
    ExpressionUtils.column(LogRegProbExpr(ExpressionUtils.expression(text),
      weights, bias, buckets, seed, maxOrder))
}
