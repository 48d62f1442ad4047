package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft_layout").toString

  test("zorderWrite preserves the row multiset exactly") {
    val df = (1 to 5000).map(i => (i % 97, (i * 31) % 89, s"v$i")).toDF("a", "b", "s")
    val dir = tmpDir()
    Layout.zorderWrite(df, Seq("a", "b"), s"$dir/z", numFiles = 8, bits = 4)
    val back = spark.read.parquet(s"$dir/z")
    assert(back.count() === 5000)
    assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("z-order clusters 2-D ranges into few files; linear sort does not") {
    // two independent uniform dims: a lexicographic sort on (a, b) spreads
    // any selective `b` range across every file, the z-curve does not
    val df = (1 to 40000)
      .map { i => val r = new scala.util.Random(i); (r.nextInt(1000), r.nextInt(1000)) }
      .toDF("a", "b")
    val dir = tmpDir()
    Layout.zorderWrite(df, Seq("a", "b"), s"$dir/z", numFiles = 16, bits = 6)
    df.repartitionByRange(16, col("a"), col("b"))
      .sortWithinPartitions("a", "b")
      .write.parquet(s"$dir/lex")

    def filesTouched(path: String, cond: org.apache.spark.sql.Column): Long =
      spark.read.parquet(path).filter(cond)
        .select(input_file_name()).distinct().count()

    val cond = col("a").between(100, 160) && col("b").between(500, 560)
    // ~0.4% selectivity: the z-layout confines survivors to a few curve cells
    val zFiles = filesTouched(s"$dir/z", cond)
    assert(zFiles <= 4, s"z-order touched $zFiles files")
    // the CONTRAST claim needs a b-only range: the lexicographic (a, b)
    // range layout prunes `a` ranges fine but scatters any b range over
    // ~every file, while the z-curve constrains b's interleaved bits.
    // (On an a-AND-b cond both layouts prune to ~2 files and the margin
    // is scheduling-noise thin — the old flaky assertion.)
    val bOnly = col("b").between(500, 560)
    val zB = filesTouched(s"$dir/z", bOnly)
    val lexB = filesTouched(s"$dir/lex", bOnly)
    assert(zB < lexB, s"z=$zB vs lex=$lexB on a b-only range")
    // same rows either way — layout never changes results
    assert(spark.read.parquet(s"$dir/z").filter(cond).count() ===
      spark.read.parquet(s"$dir/lex").filter(cond).count())
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("zValueFor interleaves: z range maps to a compact 2-D block") {
    val df = (0 until 256).flatMap(a => (0 until 16).map(b => (a, b * 16))).toDF("a", "b")
    val z = Layout.zValueFor(df, Seq("a", "b"), bits = 4)
    val withZ = df.withColumn("z", z)
    // every bucket pair occurs; z is a bijection of (bucketA, bucketB) up
    // to quantile-sketch boundary snapping (a probe landing ON a value
    // boundary may merge two buckets — rank error, not an interleave bug)
    val distinctZ = withZ.select("z").distinct().count()
    assert(distinctZ >= 14 * 14, s"only $distinctZ distinct z values")
  }
}
