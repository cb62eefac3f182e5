package graft.oracle

/** Generators for DuckDB oracle SQL that is *bit-identical* to the Spark
  * side. Strategy (SURVEY.md §7 hard part (b)):
  *
  *  - distances: expand the vector math into an explicit left-associated
  *    sum chain `t1 + t2 + ... + tD`. Spark's `aggregate` fold computes
  *    `((0.0 + t1) + t2) + ...` — identical under IEEE 754 since every
  *    term is non-negative or the same first term. Element access is
  *    1-based in DuckDB (`v[1]`), 0-based in Spark.
  *  - query vectors: never inline computed doubles; inline the *formula*
  *    with integer literals so both engines derive the same double.
  */
object OracleGen {

  /** Deterministic synthetic query vector, shared by Spark and SQL sides:
    * q(i) = ((i*37) % 100)/100.0 - 0.5, i = 0-based index.
    */
  object QueryVec {
    val dim = 64
    def value(i: Int): Double = ((i * 37) % 100) / 100.0 - 0.5
    val values: Seq[Double] = (0 until dim).map(value)
    /** SQL term producing the identical double, k = 1-based position. */
    def sqlTerm(k: Int): String = {
      val m = ((k - 1) * 37) % 100
      s"($m/100.0 - 0.5)"
    }
    /** The multi-query batch family: query b is the same formula with an
      * integer shift, q_b(i) = ((i·37 + b·11) % 100)/100 − 0.5 — so b = 0
      * IS [[values]] and every member inlines into SQL as integer-literal
      * arithmetic both engines fold to the same double.
      */
    def shiftedValues(b: Int): Seq[Double] =
      (0 until dim).map(i => ((i * 37 + b * 11) % 100) / 100.0 - 0.5)
    def sqlTermShifted(k: Int, b: Int): String = {
      val m = ((k - 1) * 37 + b * 11) % 100
      s"($m/100.0 - 0.5)"
    }
  }

  /** L2 distance between a FLOAT[] column and batch query b (see
    * QueryVec.shiftedValues), as DuckDB SQL.
    */
  def l2ToQueryShifted(vecCol: String, b: Int, dim: Int = QueryVec.dim): String =
    "sqrt(" + chain(dim, k => {
      val e = elem(vecCol, k); val q = QueryVec.sqlTermShifted(k, b)
      s"($e - $q) * ($e - $q)"
    }) + ")"

  private def elem(vecCol: String, k: Int): String =
    s"CAST($vecCol[$k] AS DOUBLE)"

  /** Left-associated sum chain of per-element terms. */
  private def chain(dim: Int, term: Int => String): String =
    (1 to dim).map(term).mkString(" + ")

  /** L2 distance between a FLOAT[] column and the QueryVec, as DuckDB SQL. */
  def l2ToQuery(vecCol: String, dim: Int = QueryVec.dim): String =
    "sqrt(" + chain(dim, k => {
      val e = elem(vecCol, k); val q = QueryVec.sqlTerm(k)
      s"($e - $q) * ($e - $q)"
    }) + ")"

  /** Dot product between a FLOAT[] column and the QueryVec. */
  def dotToQuery(vecCol: String, dim: Int = QueryVec.dim): String =
    chain(dim, k => s"${elem(vecCol, k)} * ${QueryVec.sqlTerm(k)}")

  /** Squared L2 norm of a FLOAT[] column. */
  def normSq(vecCol: String, dim: Int = QueryVec.dim): String =
    chain(dim, k => s"${elem(vecCol, k)} * ${elem(vecCol, k)}")

  /** Squared L2 norm of the QueryVec itself. */
  def queryNormSq(dim: Int = QueryVec.dim): String =
    chain(dim, k => s"${QueryVec.sqlTerm(k)} * ${QueryVec.sqlTerm(k)}")

  /** Cosine similarity between a FLOAT[] column and the QueryVec. */
  def cosineToQuery(vecCol: String, dim: Int = QueryVec.dim): String =
    s"(${dotToQuery(vecCol, dim)}) / (sqrt(${normSq(vecCol, dim)}) * sqrt(${queryNormSq(dim)}))"

  /** Signed random-projection chain for output coordinate `j` (0-based),
    * mirroring VectorFunctions.randProjDim term for term: the ±1 sign
    * matrix comes from the same integer formula, terms are the casted
    * elements, association is left-to-right.
    */
  def randProjChain(vecCol: String, j: Int, dim: Int = QueryVec.dim): String =
    (1 to dim).map { k =>
      val t = elem(vecCol, k)
      if (graft.functions.VectorFunctions.randProjSign(k - 1, j) > 0) t
      else s"-($t)"
    }.mkString(" + ")

  /** The same chain over the deterministic QueryVec's constant terms —
    * folds to the identical double VectorFunctions.randProjectQuery
    * computes on the driver.
    */
  def randProjQueryChain(j: Int, dim: Int = QueryVec.dim): String =
    (1 to dim).map { k =>
      val t = QueryVec.sqlTerm(k)
      if (graft.functions.VectorFunctions.randProjSign(k - 1, j) > 0) t
      else s"-($t)"
    }.mkString(" + ")

  /** Dot product between two FLOAT[] columns (for pairwise similarity). */
  def dotCols(a: String, b: String, dim: Int = QueryVec.dim): String =
    chain(dim, k => s"${elem(a, k)} * ${elem(b, k)}")

  /** Cosine similarity between two FLOAT[] columns. */
  def cosineCols(a: String, b: String, dim: Int = QueryVec.dim): String =
    s"(${dotCols(a, b, dim)}) / (sqrt(${normSq(a, dim)}) * sqrt(${normSq(b, dim)}))"

  /** L2 distance between two DOUBLE[] columns (no cast — already double). */
  def l2DoubleCols(a: String, b: String, dim: Int = QueryVec.dim): String =
    "sqrt(" + chain(dim, k => s"($a[$k] - $b[$k]) * ($a[$k] - $b[$k])") + ")"

  /** L2 distance between two FLOAT[] columns — each element cast to DOUBLE
    * before subtracting, matching the Spark expressions' widen-then-
    * accumulate contract (a float-space subtraction differs in low bits).
    */
  def l2FloatCols(a: String, b: String, dim: Int = QueryVec.dim): String =
    "sqrt(" + chain(dim,
      k => s"(${elem(a, k)} - ${elem(b, k)}) * (${elem(a, k)} - ${elem(b, k)})") + ")"

  // ---- product quantization (mirrors graft.operators.Pq) ----

  /** L2 distance between subspace `[lo+1, lo+subDim]` of FLOAT[] column
    * `a` and a subDim-element DOUBLE[] codebook column `b` — the
    * training-assignment chain of the per-subspace Lloyd.
    */
  def l2FloatColsOffset(a: String, b: String, lo: Int, subDim: Int): String =
    "sqrt(" + (1 to subDim).map { k =>
      val e = s"CAST($a[${lo + k}] AS DOUBLE)"
      s"($e - CAST($b[$k] AS DOUBLE)) * ($e - CAST($b[$k] AS DOUBLE))"
    }.mkString(" + ") + ")"

  /** Squared variant (no sqrt) — the PQ encode argmin and ADC entries
    * rank by squared distance (monotone, so the argmin and its ties are
    * identical).
    */
  def l2SqFloatColsOffset(a: String, b: String, lo: Int, subDim: Int): String =
    (1 to subDim).map { k =>
      val e = s"CAST($a[${lo + k}] AS DOUBLE)"
      s"($e - CAST($b[$k] AS DOUBLE)) * ($e - CAST($b[$k] AS DOUBLE))"
    }.mkString(" + ")

  /** Squared L2 from a subDim-element DOUBLE[] codebook column to the
    * QueryVec's subspace slice — the ADC table entry (Pq.adcTables'
    * driver chain term for term: (c - q)·(c - q), left-associated).
    */
  def l2SqToQueryOffset(cvecCol: String, lo: Int, subDim: Int): String =
    (1 to subDim).map { k =>
      val q = QueryVec.sqlTerm(lo + k)
      s"($cvecCol[$k] - $q) * ($cvecCol[$k] - $q)"
    }.mkString(" + ")

  /** [[l2SqToQueryOffset]] against batch query b (QueryVec.shiftedValues)
    * — the per-query ADC table entry of the batched IVF-PQ replay.
    */
  def l2SqToQueryOffsetShifted(cvecCol: String, lo: Int, subDim: Int,
                               b: Int): String =
    (1 to subDim).map { k =>
      val q = QueryVec.sqlTermShifted(lo + k, b)
      s"($cvecCol[$k] - $q) * ($cvecCol[$k] - $q)"
    }.mkString(" + ")

  // ---- hash-embedding oracle (mirrors graft.expressions.HashEmbed) ----

  private def hv(t: String, pos: Int): String =
    s"(strpos('0123456789abcdef', substr(md5($t), $pos, 1)) - 1)"

  /** bucket(token) — md5 hex chars 4..6 as int, mod dim (HashEmbed.bucketSign). */
  def bucketSql(t: String, dim: Int): String =
    s"((${hv(t, 4)} * 256 + ${hv(t, 5)} * 16 + ${hv(t, 6)}) % $dim)"

  /** sign(token) — +1 if md5 hex char 7 is even (HashEmbed.bucketSign). */
  def signSql(t: String): String =
    s"(CASE WHEN ${hv(t, 7)} % 2 = 0 THEN 1 ELSE -1 END)"

  /** Tokens of lowercased text, empties dropped (TextFunctions.tokens). */
  def toksSql(textExpr: String): String =
    s"list_filter(string_split_regex(lower(trim($textExpr)), '\\s+'), t -> t <> '')"

  /** Shingles as a plain expression given a `tk` token-list column in scope
    * (Dedup.shingles).
    */
  def shinglesOfToks(tkCol: String, n: Int = 3): String = {
    val gram = (1 to n).map(j => s"$tkCol[i+$j]").mkString(" || ' ' || ")
    s"""CASE WHEN len($tkCol) >= $n
       | THEN list_transform(range(0, len($tkCol) - ${n - 1}), i -> $gram)
       | ELSE [array_to_string($tkCol, ' ')] END""".stripMargin
  }

  /** Hex rotation for signature slot i (MinHashSig.shift formula). */
  def rotHexSql(h: String, i: Int): String = {
    val s = graft.expressions.MinHashSig.shift(i)
    if (s == 0) h
    else s"(substr($h, ${s + 1}, ${32 - s}) || substr($h, 1, $s))"
  }

  /** MinHash signature over a per-shingle md5 list column
    * (Dedup.minhashSignatureFromHashes).
    */
  def minhashSigOfHashes(hsCol: String, numHashes: Int): String =
    (0 until numHashes).map { i =>
      s"list_min(list_transform($hsCol, h -> ${rotHexSql("h", i)}))"
    }.mkString("[", ", ", "]")

  /** Count of agreeing signature components (Dedup.minhashPairs match count). */
  def sigMatchCount(a: String, b: String, numHashes: Int): String =
    (1 to numHashes).map(i => s"(CASE WHEN $a[$i] = $b[$i] THEN 1 ELSE 0 END)")
      .mkString("(", " + ", ")")

  /** uint32 token hash (first 8 hex chars of md5) — SimHash.tokenHash. */
  def tokenHash32Sql(t: String): String = {
    val factors = Seq(268435456L, 16777216L, 1048576L, 65536L, 4096L, 256L, 16L, 1L)
    factors.zipWithIndex.map { case (f, i) =>
      s"(strpos('0123456789abcdef', substr(md5($t), ${i + 1}, 1)) - 1) * $f"
    }.mkString("(", " + ", ")")
  }

  /** SimHash fingerprint over a token-hash list column `th` (SimHash.fingerprint). */
  def simhashOfTokenHashes(thCol: String, bits: Int = 32): String =
    (0 until bits).map { k =>
      s"""(CASE WHEN coalesce(list_sum(list_transform($thCol,
         |  h -> CASE WHEN ((h >> $k) & 1) = 1 THEN 1 ELSE -1 END)), 0) > 0
         |  THEN ${1L << k} ELSE 0 END)""".stripMargin
    }.mkString("CAST(", " + ", " AS BIGINT)")

  /** Dot of a FLOAT[] column with LSH hyperplane j (Ann.planeValue formula). */
  def dotPlane(vecCol: String, j: Int, dim: Int): String =
    chain(dim, k => {
      val m = (((k - 1) * 7 + j * 13) % 19)
      s"${elem(vecCol, k)} * ($m/19.0 - 0.5)"
    })

  /** LSH bucket of a FLOAT[] column (Ann.bucketOf). */
  def lshBucket(vecCol: String, numPlanes: Int, dim: Int): String =
    (0 until numPlanes).map { j =>
      s"(CASE WHEN ${dotPlane(vecCol, j, dim)} > 0 THEN ${1 << j} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  /** L2 distance from a FLOAT[] column to IVF centroid j (Ann.centroidValue
    * formula: c_j(i) = ((i*11 + j*23) % 17)/17.0 - 0.5, i 0-based).
    */
  def l2ToCentroid(vecCol: String, j: Int, dim: Int): String =
    "sqrt(" + chain(dim, k => {
      val m = ((k - 1) * 11 + j * 23) % 17
      val e = elem(vecCol, k)
      s"($e - ($m/17.0 - 0.5)) * ($e - ($m/17.0 - 0.5))"
    }) + ")"

  /** LSH bucket of the QueryVec itself — all-literal arithmetic. */
  def lshBucketOfQuery(numPlanes: Int, dim: Int = QueryVec.dim): String =
    (0 until numPlanes).map { j =>
      val c = chain(dim, k => {
        val m = (((k - 1) * 7 + j * 13) % 19)
        s"${QueryVec.sqlTerm(k)} * ($m/19.0 - 0.5)"
      })
      s"(CASE WHEN $c > 0 THEN ${1 << j} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  /** CTE chain computing `(id, emb DOUBLE[])` for `textExpr` rows of `srcSql`
    * — exact SQL mirror of HashEmbed.embed: integer bucket counts, exact
    * integer norm², single exactly-rounded division per element.
    * Yields CTE definitions (caller embeds in WITH); final relation `{a}_emb`.
    */
  def embedCte(a: String, srcSql: String, idExpr: String, textExpr: String,
               dim: Int): String = {
    val toks = s"list_filter(string_split_regex(lower(trim($textExpr)), '\\s+'), t -> t <> '')"
    val bs = s"list_transform($toks, t -> {'b': ${bucketSql("t", dim)}, 's': ${signSql("t")}})"
    s"""${a}_tok AS (SELECT $idExpr AS id, $bs AS bs FROM $srcSql),
       |${a}_n AS (
       |  SELECT id, comps,
       |         CAST(list_sum(list_transform(comps, x -> x*x)) AS BIGINT) AS norm2
       |  FROM (SELECT id,
       |          list_transform(range(0, $dim), j ->
       |            CAST(coalesce(list_sum(list_transform(bs,
       |              p -> CASE WHEN p.b = j THEN p.s ELSE 0 END)), 0) AS BIGINT)) AS comps
       |        FROM ${a}_tok)),
       |${a}_emb AS (
       |  SELECT id,
       |         CASE WHEN norm2 = 0 THEN list_transform(comps, x -> 0.0)
       |              ELSE list_transform(comps, x -> CAST(x AS DOUBLE) / sqrt(CAST(norm2 AS DOUBLE)))
       |         END AS emb
       |  FROM ${a}_n)""".stripMargin
  }
}
