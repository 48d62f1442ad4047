package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The exact two-level nearest-centroid path (triangle-inequality
  * pruning) must return the IDENTICAL index to the flat scan for every
  * vector — it is a pure acceleration of the IVF-family coarse
  * assignment, never an approximation.
  */
class CentroidHierSpec extends SparkSpec {
  import spark.implicits._

  private def mkCentroids(nc: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(nc) { c =>
      // clustered layout (what k-means training emits): 16 macro blobs
      // with per-centroid jitter, deterministic
      val blob = c % 16
      Array.tabulate(dim)(j => blob * 3.0 + math.sin(c * 31 + j * 7) * 0.4)
    }

  private def flatArgmin(v: Array[Double], cs: Array[Array[Double]]): Int = {
    var best = Double.MaxValue; var bi = 0
    cs.indices.foreach { ci =>
      val m = math.min(v.length, cs(ci).length)
      var d = 0.0; var i = 0
      while (i < m) { val t = v(i) - cs(ci)(i); d += t * t; i += 1 }
      if (d < best) { best = d; bi = ci }
    }
    bi
  }

  test("hier assignment == flat argmin for 300 clustered centroids, double vecs") {
    val cs = mkCentroids(300, 12) // ≥ HierThreshold → hier path
    val vecs = Seq.tabulate(500)(i =>
      (i.toLong, Array.tabulate(12)(j => (i % 16) * 3.0 + math.cos(i * 13 + j) * 1.5)))
    val df = vecs.toDF("id", "v").repartition(4)
    val got = df.select($"id", element_at(Kernels.nearestCentroids($"v", cs, 1), 1).as("list"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    vecs.foreach { case (id, v) =>
      assert(got(id) === flatArgmin(v, cs), s"id $id")
    }
  }

  test("hier assignment == flat argmin for float vecs and short (projected) vecs") {
    val cs = mkCentroids(256, 8)
    val fvecs = Seq.tabulate(200)(i =>
      (i.toLong, Array.tabulate(8)(j => ((i % 16) * 3.0 + math.sin(i + j)).toFloat)))
    val df = fvecs.toDF("id", "v")
    val got = df.select($"id", element_at(Kernels.nearestCentroids($"v", cs, 1), 1).as("list"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    fvecs.foreach { case (id, v) =>
      assert(got(id) === flatArgmin(v.map(_.toDouble), cs), s"id $id")
    }
    // shorter vector than centroid dim: distances project to the prefix,
    // still exact (full-dim radius upper-bounds the projected one)
    val svecs = Seq.tabulate(100)(i =>
      (i.toLong, Array.tabulate(5)(j => (i % 16) * 3.0 + math.cos(i * 3 + j))))
    val sgot = svecs.toDF("id", "v")
      .select($"id", element_at(Kernels.nearestCentroids($"v", cs, 1), 1).as("list"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    svecs.foreach { case (id, v) =>
      assert(sgot(id) === flatArgmin(v, cs), s"short id $id")
    }
  }

  test("degenerate duplicate centroids: ties resolve to the smallest index, " +
      "exactly like the flat scan") {
    // 250 centroids where every 5th is an EXACT duplicate of centroid 0 —
    // the argmin for vectors near centroid 0 is a many-way exact tie
    val base = mkCentroids(250, 6)
    val cs = base.zipWithIndex.map { case (c, i) => if (i % 5 == 0) base(0).clone() else c }
    val vecs = Seq.tabulate(60)(i =>
      (i.toLong, base(0).map(v => v + (i % 3) * 1e-7)))
    val got = vecs.toDF("id", "v")
      .select($"id", element_at(Kernels.nearestCentroids($"v", cs, 1), 1).as("list"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    vecs.foreach { case (id, v) =>
      assert(got(id) === flatArgmin(v, cs), s"id $id")
    }
    // vectors exactly AT the duplicated centroid: every duplicate ties at
    // distance 0; the winner must be index 0, the first
    val exact = Seq((0L, base(0))).toDF("id", "v")
      .select(element_at(Kernels.nearestCentroids($"v", cs, 1), 1))
      .first().getInt(0)
    assert(exact === 0)
  }

  test("corrupt vectors (NaN / Infinity components) return index 0 on the hier " +
      "path, matching the flat scan — never Int.MaxValue") {
    val cs = mkCentroids(300, 6) // ≥ HierThreshold → hier path
    val bad = Seq(
      (0L, Array(Double.NaN, 1.0, 2.0, 3.0, 4.0, 5.0)),
      (1L, Array.fill(6)(Double.NaN)),
      (2L, Array(Double.PositiveInfinity, 0.0, 0.0, 0.0, 0.0, 0.0)),
      (3L, Array.fill(6)(Double.PositiveInfinity)),
      (4L, Array(Double.NegativeInfinity, 1.0, 1.0, 1.0, 1.0, 1.0)))
    val got = bad.toDF("id", "v")
      .select($"id", element_at(Kernels.nearestCentroids($"v", cs, 1), 1).as("idx"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    bad.foreach { case (id, v) =>
      val flat = flatArgmin(v, cs)
      assert(got(id) === flat, s"id $id")
      assert(got(id) >= 0 && got(id) < cs.length, s"id $id out of range")
    }
    // a healthy vector through the SAME centroid set stays exact
    val ok = Seq((9L, Array.tabulate(6)(j => 3.0 + j))).toDF("id", "v")
      .select(element_at(Kernels.nearestCentroids($"v", cs, 1), 1)).first().getInt(0)
    assert(ok === flatArgmin(Array.tabulate(6)(j => 3.0 + j), cs))
  }

  test("below the threshold the flat scan still answers (n=1 small, and n>1 probing)") {
    val cs = mkCentroids(20, 6)
    val vecs = Seq.tabulate(50)(i =>
      (i.toLong, Array.tabulate(6)(j => (i % 16) * 3.0 + math.sin(i + j))))
    val got = vecs.toDF("id", "v")
      .select($"id", element_at(Kernels.nearestCentroids($"v", cs, 1), 1).as("list"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    vecs.foreach { case (id, v) => assert(got(id) === flatArgmin(v, cs)) }
    // n > 1: ascending distance order, first element == argmin
    val multi = vecs.toDF("id", "v")
      .select($"id", Kernels.nearestCentroids($"v", cs, 3).as("probes"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    vecs.foreach { case (id, v) =>
      assert(multi(id).head === flatArgmin(v, cs))
      assert(multi(id).length === 3)
    }
  }
}
