package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Similarity primitives: shingling, MinHash, SimHash, n-gram Jaccard,
  * vector cosine. All pure column expressions (codegen'd); the pipelines
  * that use them (LSH banding joins, ANN) live in `graft.ml`.
  */
object Similarity {

  /** Word n-gram shingles of normalized text → array<string>. */
  def shingles(text: Column, n: Int = 3): Column = {
    val toks = split(TextFunctions.normalized(text), " ", -1)
    // sliding n-grams via transform over start indices; sequence(0, c-1)
    // would DESCEND for c<=0, so guard the empty case explicitly
    val count = size(toks) - (n - 1)
    when(count <= 0, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), count - 1), i =>
        concat_ws(" ", slice(toks, i + 1, lit(n)))))
  }

  /** Character n-gram shingles (better for CJK / no-whitespace text). */
  def charShingles(text: Column, n: Int = 5): Column = {
    val norm = TextFunctions.normalized(text)
    val count = length(norm) - (n - 1)
    when(count <= 0, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), count - 1), i =>
        norm.substr(i + 1, lit(n))))
  }

  /** MinHash signature: for each of `k` seeded hash functions, the min
    * xxhash64 over the shingle set → array<bigint> of length k.
    * One pass over the shingles; no shuffle.
    */
  def minhash(shingleArr: Column, k: Int = 64): Column =
    array((0 until k).map { seed =>
      // empty shingle set → MaxValue sentinel (array_min of [] is null)
      coalesce(array_min(transform(shingleArr, s => xxhash64(lit(seed), s))),
        lit(Long.MaxValue))
    }: _*)

  /** LSH band keys: split a minhash signature into `bands` bands of
    * `rowsPerBand` and hash each band → array of (bandIndex, bandHash)
    * strings usable as join/bucket keys after explode.
    */
  def lshBands(signature: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      val bandSlice = slice(signature, b * rowsPerBand + 1, rowsPerBand)
      concat_ws(":", lit(b), xxhash64(concat_ws(",", transform(bandSlice, _.cast("string")))))
    }: _*)

  /** SimHash (64-bit) over token hashes: sign-sum each bit of xxhash64 of
    * every token, emit the sign vector as a Long. Near-dup iff hamming
    * distance small.
    */
  def simhash(tokens: Column): Column = {
    val hashes = transform(tokens, t => xxhash64(t))
    val bitSums = (0 until 64).map { bit =>
      aggregate(hashes, lit(0L), (acc, h) =>
        acc + when(h.bitwiseAND(lit(1L << bit)) =!= 0, 1L).otherwise(-1L))
    }
    bitSums.zipWithIndex.map { case (s, bit) =>
      when(s > 0, lit(1L << bit)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Hamming distance between two 64-bit simhashes. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Exact Jaccard similarity of two shingle arrays. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val union = size(array_union(a, b)).cast("double")
    when(union === 0, 0.0).otherwise(inter / union)
  }

  /** Cosine similarity of two float-array embeddings (zip_with dot product
    * + aggregate norms — single codegen'd expression, no UDF).
    */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    def norm(x: Column): Column = sqrt(dot(x, x))
    dot(a, b) / (norm(a) * norm(b))
  }

  /** Random-hyperplane LSH bucket for an embedding: sign bits of dot
    * products with `nPlanes` pseudo-random (hash-derived, deterministic)
    * hyperplanes → integer bucket id. The scale path for ANN: equal
    * buckets → candidate pairs.
    */
  def hyperplaneBucket(vec: Column, dim: Int, nPlanes: Int = 12): Column = {
    // deterministic pseudo-random plane component for (plane p, coord i):
    // a fixed-seed hash mapped to [-0.5, 0.5)
    def comp(p: Int, i: Column): Column =
      (pmod(xxhash64(lit(p), i), lit(1000000L)).cast("double") / 1000000.0) - 0.5
    val bits = (0 until nPlanes).map { p =>
      val d = aggregate(
        zip_with(vec, sequence(lit(0), lit(dim - 1)), (v, i) => v.cast("double") * comp(p, i)),
        lit(0.0), (acc, v) => acc + v)
      when(d > 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }
}
