package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthetic scale-up generator for the sf1 rehearsal (committed this
  * round — r11's equivalent was session-local): multiplies an sf dir by
  * `factor` into a scratch dir, preserving the join topology so every
  * bench query stays semantically valid at 10× data.
  *
  *  - dimension tables (region/nation) copy unchanged — their key
  *    spaces are fixed by the schema;
  *  - fact/entity tables replicate `factor`× with remapped primary keys
  *    (`key + copy·stride`) and remapped foreign keys INTO the scaled
  *    parents, so join fan-outs scale linearly instead of
  *    quadratically;
  *  - documents keep CONSTANT near-dup group density (size 10) at any
  *    factor: copy c splits into (group = c/10, member = c%10); members
  *    of a group differ only by a ` variantN` suffix (near-dups, the
  *    sf1 convention), while groups ≥ 1 interleave a per-group token
  *    between every word — every word-3-shingle changes, so
  *    cross-group Jaccard collapses to ~0 and 10× more data means 10×
  *    more groups, not 10×-bigger groups. (At factor ≤ 10 this reduces
  *    exactly to the original sf1 scheme: one 10-member group per
  *    source doc. Group-size BLOWUP is a corpus-density axis, measured
  *    separately by PairBudgetSpec and the sf1 dense record — conflating
  *    it with the data-scale axis would make every pairs row read as a
  *    quadratic regression that is really output volume.)
  *  - embeddings get a per-copy +(c%10)·0.001 + (c/10)·0.0001 offset on
  *    every component (distinct vectors, preserved cluster structure —
  *    max offset 0.0099 at factor 100).
  *
  * Usage: `sbt "Test/runMain graft.ScaleTestData /root/testdata/sf0.1
  * /tmp/sf1 10"` (sf10: factor 100). Writes nothing outside the target
  * dir.
  */
object ScaleTestData {

  /** ids get `copy * stride` added; stride must exceed every source id. */
  private val Stride = 100000000L

  private def replicate(spark: SparkSession, df: DataFrame, factor: Int,
      idCols: Seq[String]): DataFrame = {
    val copies = spark.range(factor).select(col("id").as("__copy"))
    val crossed = df.crossJoin(copies)
    idCols.foldLeft(crossed) { case (acc, c) =>
      acc.withColumn(c, col(c) + col("__copy") * Stride)
    }.drop("__copy")
  }

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse("/tmp/graft_sf1")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = GraftSession.builder("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def read(t: String): DataFrame = spark.read.parquet(s"$src/$t.parquet")
    // Replicated tables write as MULTI-FILE layouts (32 splits): the
    // crossJoin against the broadcast copy list inherits the SOURCE
    // scan's partitioning, and the sf dirs are single-file — so without
    // this the factor-100 documents table lands as ONE 27 MB
    // single-row-group parquet file that Spark cannot split, and every
    // downstream map stage (shingle explode → partial agg most visibly)
    // runs on 1 of 32 cores (measured: a 28-minute single-task straggler
    // in the r14 sf10 rehearsal). A real corpus at 10×-100× scale is
    // always many files; a monolith here would benchmark the generator's
    // artifact, not the engine.
    def write(t: String, df: DataFrame, parts: Int = 32): Unit = {
      df.repartition(parts).write.mode("overwrite").parquet(s"$dst/$t.parquet")
      println(s"[scale] $t: ${spark.read.parquet(s"$dst/$t.parquet").count()} rows")
    }

    // dimensions copy unchanged and stay tiny — single file is correct
    write("region", read("region"), parts = 1)
    write("nation", read("nation"), parts = 1)
    write("customer", replicate(spark, read("customer"), factor, Seq("c_custkey")))
    write("supplier", replicate(spark, read("supplier"), factor, Seq("s_suppkey")))
    write("part", replicate(spark, read("part"), factor, Seq("p_partkey")))
    write("orders", replicate(spark, read("orders"), factor,
      Seq("o_orderkey", "o_custkey")))
    write("lineitem", replicate(spark, read("lineitem"), factor,
      Seq("l_orderkey", "l_partkey", "l_suppkey")))
    write("events", replicate(spark, read("events"), factor, Seq("event_id")))
    // documents: remapped ids + constant-density near-dup groups (see
    // scaladoc). group = copy/10 rewrites every word-3-shingle via a
    // per-group interleave token; member = copy%10 appends the sf1-style
    // near-dup suffix.
    locally {
      val docs = read("documents")
      val copies = spark.range(factor).select(col("id").as("__copy"))
      val grp = (col("__copy") / 10).cast("long")
      val member = col("__copy") % 10
      // The interleave token carries the SOURCE doc id, not just the
      // group number: the corpus vocabulary is ~31 words, so a token
      // shared by every orig's group g would put all 10%-of-corpus docs
      // of that group number into one shingle space of ~31² + 31 values
      // — measured cross-orig Jaccard ≈ 0.26, which at factor 100 made
      // each group number ONE 50 k-doc J≈0.26 mega-cluster and the
      // 16×4 LSH banding passed ~7% of its C(50k,2) pairs: ~900 M
      // spurious candidates, zero true pairs (J < 0.7), 60 GB of
      // distinct-stage spill. Per-(orig, grp) tokens restore the
      // scheme's documented contract: near-dup groups stay size 10 and
      // CROSS-group Jaccard collapses to ~0 at every factor. (Dense
      // boilerplate clusters are a real corpus axis, but it is measured
      // by the dense sf1 record and PairBudgetSpec — the SCALE axis
      // must not quietly turn quadratic.)
      val grouped = when(grp === 0, col("text")).otherwise(
        regexp_replace(col("text"), lit(" "),
          concat(lit(" zg"), grp.cast("string"), lit("x"),
            col("__orig").cast("string"), lit(" "))))
      val scaled = docs.crossJoin(copies)
        .withColumn("__orig", col("doc_id"))
        .withColumn("doc_id", col("doc_id") + col("__copy") * Stride)
        .withColumn("text",
          when(member === 0, grouped)
            .otherwise(concat(grouped, lit(" variant"), member)))
        .withColumn("n_chars", length(col("text")))
        .drop("__copy", "__orig")
      write("documents", scaled)
    }
    // embeddings: remapped ids + per-copy component offset (unique per
    // copy up to factor 100, max 0.0099 — cluster structure preserved)
    locally {
      val emb = read("embeddings")
      val copies = spark.range(factor).select(col("id").as("__copy"))
      val off = (col("__copy") % 10).cast("float") * lit(0.001f) +
        (col("__copy") / 10).cast("long").cast("float") * lit(0.0001f)
      val scaled = emb.crossJoin(copies)
        .withColumn("vec_id", col("vec_id") + col("__copy") * Stride)
        .withColumn("embedding",
          transform(col("embedding"), x => (x + off).cast("float")))
        .drop("__copy")
      write("embeddings", scaled)
    }
    spark.stop()
  }
}
