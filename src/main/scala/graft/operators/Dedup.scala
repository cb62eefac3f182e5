package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Deduplication operators for large-scale training-data pipelines:
  * exact (hash groupBy), MinHash+LSH banding, n-gram Jaccard, SimHash
  * (see graft.expressions.SimHash), embedding-cosine (see Ann).
  *
  * Scale design: every variant avoids the O(n²) all-pairs comparison —
  * exact dedup is one shuffle on the content hash; MinHash/LSH shuffles on
  * band keys so only same-bucket candidates meet (the 100 TB-safe shape;
  * hot buckets are the residual skew risk — salt or cap bucket size there);
  * SimHash groups on fingerprint prefixes. All hashing is md5-derived and
  * integer-exact, so every stage is oracle-checkable.
  */
object Dedup {

  /** Exact dedup: keep the smallest id per identical content. One shuffle. */
  def exact(df: DataFrame, idCol: Column, contentCol: Column): DataFrame =
    df.groupBy(contentCol)
      .agg(min(idCol).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Word n-gram shingles of text; whole-text fallback below n tokens. */
  def shingles(text: Column, n: Int = 3): Column = {
    val t = TextFunctions.tokens(text)
    when(size(t) >= n,
      transform(sequence(lit(0), size(t) - n),
        i => concat_ws(" ", (0 until n).map(j => element_at(t, i + j + 1)): _*)))
      .otherwise(array(concat_ws(" ", t)))
  }

  /** MinHash signature: element h is min over shingles of md5("h|" + shingle)
    * — a seeded-md5 permutation; the hex-string min is an order statistic
    * identical in any engine (lexicographic on lowercase hex).
    */
  def minhashSignature(text: Column, numHashes: Int = 8, shingleN: Int = 3): Column = {
    val sh = shingles(text, shingleN)
    array((0 until numHashes).map { h =>
      array_min(transform(sh, s => md5(concat(lit(s"$h|"), s))))
    }: _*)
  }

  /** LSH band keys from a signature: rowsPerBand consecutive minhashes
    * concatenated. Docs sharing any band key are candidate near-dups.
    */
  def bands(sig: Column, numHashes: Int, rowsPerBand: Int = 2): Column =
    array((0 until numHashes / rowsPerBand).map { b =>
      concat((0 until rowsPerBand).map(r => element_at(sig, b * rowsPerBand + r + 1)): _*)
    }: _*)

  /** MinHash+LSH candidate pairs with estimated Jaccard.
    * Input: (idCol, textCol). Output: a_id < b_id, est_jaccard ∈ [0,1].
    * Shuffles: one on band key (the LSH bucket-join), one distinct. No O(n²).
    */
  def minhashPairs(df: DataFrame, idCol: Column, textCol: Column,
                   numHashes: Int = 8, rowsPerBand: Int = 2,
                   shingleN: Int = 3): DataFrame = {
    val sigs = df.select(idCol.as("id"),
      minhashSignature(textCol, numHashes, shingleN).as("sig"))
    val banded = sigs.select(col("id"), col("sig"),
        posexplode(bands(col("sig"), numHashes, rowsPerBand)).as(Seq("band_idx", "band")))
    val a = banded.select(col("id").as("a_id"), col("sig").as("a_sig"),
      col("band_idx"), col("band"))
    val b = banded.select(col("id").as("b_id"), col("sig").as("b_sig"),
      col("band_idx").as("b_band_idx"), col("band").as("b_band"))
    // count of agreeing signature components, exact integer
    val matchCount = aggregate(zip_with(col("a_sig"), col("b_sig"),
      (x, y) => when(x === y, 1).otherwise(0)), lit(0), (acc, v) => acc + v)
    a.join(b, col("band_idx") === col("b_band_idx") && col("band") === col("b_band")
        && col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        (matchCount.cast("double") / numHashes).as("est_jaccard"))
      .distinct()
  }

  /** Exact n-gram Jaccard for explicit candidate pairs.
    * `pairs`: (a_id, b_id). Computes |A∩B| / |A∪B| over distinct shingles.
    * Use LSH candidates (minhashPairs) upstream at scale — never all pairs.
    */
  def ngramJaccard(df: DataFrame, idCol: Column, textCol: Column,
                   pairs: DataFrame, shingleN: Int = 3): DataFrame = {
    val sh = df.select(idCol.as("id"),
      array_distinct(shingles(textCol, shingleN)).as("sh"))
    pairs
      .join(sh.select(col("id").as("a_id"), col("sh").as("a_sh")), Seq("a_id"))
      .join(sh.select(col("id").as("b_id"), col("sh").as("b_sh")), Seq("b_id"))
      .select(col("a_id"), col("b_id"),
        (size(array_intersect(col("a_sh"), col("b_sh"))).cast("double") /
          (size(col("a_sh")) + size(col("b_sh"))
            - size(array_intersect(col("a_sh"), col("b_sh"))))).as("jaccard"))
  }
}
