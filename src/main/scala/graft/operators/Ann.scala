package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Approximate nearest-neighbour search over embedding columns.
  *
  * Baseline: exact brute force (Knn). Scale path: random-hyperplane LSH —
  * assign each vector a bucket from the sign bits of H fixed hyperplane
  * projections; a query probes only its own bucket, then exact re-ranks.
  * Search cost drops from O(n) to O(n / 2^H) per query at a recall cost;
  * multi-probe (flip low-margin bits) recovers recall without rescanning.
  *
  * The hyperplanes are formula-deterministic (no RNG) so bucket assignment
  * is reproducible and oracle-checkable:
  *   plane(j)(i) = ((i*7 + j*13) % 19) / 19.0 - 0.5
  *
  * At 100 TB: bucket assignment is a narrow projection; storing the table
  * bucketed/partitioned by `bucket` makes every query a partition-pruned
  * scan of ~1/2^H of the data — the IVF-style layout.
  */
object Ann {

  def planeValue(j: Int, i: Int): Double = ((i * 7 + j * 13) % 19) / 19.0 - 0.5

  def plane(j: Int, dim: Int): Seq[Double] = (0 until dim).map(i => planeValue(j, i))

  /** Sign-bit LSH bucket of a vector column under H hyperplanes. */
  def bucketOf(vec: Column, numPlanes: Int, dim: Int): Column =
    (0 until numPlanes).map { j =>
      when(dot(vec, typedlit(plane(j, dim))) > 0, lit(1 << j)).otherwise(lit(0))
    }.reduce(_ + _)

  /** Driver-side bucket of a query vector — same fold order as the SQL
    * oracle's left-associated chain.
    */
  def bucketOfQuery(q: Seq[Double], numPlanes: Int): Int = {
    (0 until numPlanes).map { j =>
      var s = 0.0
      var i = 0
      while (i < q.length) { s += q(i) * planeValue(j, i); i += 1 }
      if (s > 0) 1 << j else 0
    }.sum
  }

  /** LSH-accelerated top-k: probe the query's bucket, exact re-rank inside. */
  def annLsh(df: DataFrame, vecCol: Column, idCol: Column, query: Seq[Double],
             k: Int, numPlanes: Int = 4): DataFrame = {
    val dim = query.length
    val qBucket = bucketOfQuery(query, numPlanes)
    df.withColumn("bucket", bucketOf(vecCol, numPlanes, dim))
      .filter(col("bucket") === lit(qBucket))
      .withColumn("distance", l2(vecCol, typedlit(query)))
      .orderBy(col("distance").asc, idCol.asc)
      .limit(k)
  }

  /** Multi-probe LSH probe set: the query's own bucket plus every
    * single-bit flip of it — neighbours that fall just across one
    * hyperplane land in a flipped bucket, so probing H+1 buckets
    * recovers most of the recall lost to bucket boundaries while still
    * scanning only (H+1)/2^H of the table.
    */
  def probesOf(q: Seq[Double], numPlanes: Int): Seq[Int] = {
    val qb = bucketOfQuery(q, numPlanes)
    qb +: (0 until numPlanes).map(j => qb ^ (1 << j))
  }

  /** Multi-probe LSH top-k: scan the query bucket + its single-bit
    * flips, exact re-rank inside (the recall lever over annLsh).
    */
  def annLshMulti(df: DataFrame, vecCol: Column, idCol: Column, query: Seq[Double],
                  k: Int, numPlanes: Int = 4): DataFrame = {
    val dim = query.length
    val probes = probesOf(query, numPlanes)
    df.withColumn("bucket", bucketOf(vecCol, numPlanes, dim))
      .filter(col("bucket").isin(probes: _*))
      .withColumn("distance", l2(vecCol, typedlit(query)))
      .orderBy(col("distance").asc, idCol.asc)
      .limit(k)
  }

  /** ANN-accelerated batch KNN join (the multi-query twin of
    * Knn.knnJoin): every query row probes only its own LSH bucket plus
    * its single-bit flips (multi-probe), so the per-query candidate set
    * is (H+1)/2^H of the corpus instead of all of it. The query batch is
    * exploded over its probe set and broadcast; the corpus joins on
    * bucket equality — an equi-join where knnJoin has a cross join — and
    * the same two-level salted tournament selects the exact top-k among
    * the candidates (level 1 bounds window keys at |queries|·probes·salts,
    * level 2 re-ranks the k·salts survivors). Buckets are the
    * formula-deterministic hyperplanes above, so the whole join is
    * oracle-replayable. Output: (q_id, c_id, distance, rn).
    */
  /** Probe masks for a `numPlanes`-bit bucket at probe depth `probeBits`:
    * every XOR mask with ≤ probeBits bits set. Depth 1 is classic
    * multi-probe (own bucket + single-bit flips); depth 2 adds the
    * two-plane boundary cases — the recall lever, scan fraction
    * Σ C(H,0..b) / 2^H.
    */
  def probeMasks(numPlanes: Int, probeBits: Int): Seq[Int] =
    (0 until (1 << numPlanes)).filter(Integer.bitCount(_) <= probeBits)

  def annJoin(queries: DataFrame, corpus: DataFrame,
              qIdCol: Column, qVecCol: Column,
              cIdCol: Column, cVecCol: Column,
              k: Int, numPlanes: Int = 4, probeBits: Int = 1, dim: Int = 64,
              salts: Int = 32): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k > 0 && salts > 0, "k and salts must be positive")
    val qb = bucketOf(col("q_vec"), numPlanes, dim)
    val probeArr = array(probeMasks(numPlanes, probeBits).map(m =>
      qb.bitwiseXOR(lit(m))): _*)
    val q = queries.select(qIdCol.as("q_id"), qVecCol.as("q_vec"))
      .withColumn("probe", explode(probeArr))
    val c = corpus.select(cIdCol.as("c_id"), cVecCol.as("c_vec"),
      bucketOf(cVecCol, numPlanes, dim).as("bucket"))
    val dists = c.join(broadcast(q), col("bucket") === col("probe"))
      .select(col("q_id"), col("c_id"),
        l2(col("c_vec"), col("q_vec")).as("distance"),
        pmod(crc32(col("c_id").cast("string")), lit(salts)).as("salt"))
    val w1 = Window.partitionBy(col("q_id"), col("salt"))
      .orderBy(col("distance").asc, col("c_id").asc)
    val survivors = dists.withColumn("r1", row_number().over(w1))
      .filter(col("r1") <= k)
    val w2 = Window.partitionBy(col("q_id"))
      .orderBy(col("distance").asc, col("c_id").asc)
    survivors.withColumn("rn", row_number().over(w2).cast("long"))
      .filter(col("rn") <= k)
      .select(col("q_id"), col("c_id"), col("distance"), col("rn"))
  }

  // ---- IVF (inverted-file) layout ----
  //
  // Coarse-quantize every vector to its nearest centroid ("cell"); a query
  // scans only its nprobe nearest cells, then exact re-ranks. Unlike the
  // sign-bit LSH above, cells adapt their shape to centroid geometry and
  // recall is tuned by nprobe without re-assigning the corpus. Centroids
  // are formula-deterministic (no trained k-means, no RNG) so assignment
  // is reproducible and oracle-checkable:
  //   centroid(j)(i) = ((i*11 + j*23) % 17) / 17.0 - 0.5
  // At 100 TB: `cell` is a narrow projection; partitioning the stored
  // table by cell makes a query a partition-pruned scan of nprobe/nlist
  // of the data, and the same layout serves every query vector.

  def centroidValue(j: Int, i: Int): Double = ((i * 11 + j * 23) % 17) / 17.0 - 0.5

  def centroid(j: Int, dim: Int): Seq[Double] = (0 until dim).map(i => centroidValue(j, i))

  /** Nearest-centroid cell of a vector column: least distance, first-wins
    * tie-break (d_j == min matches the smallest j first).
    */
  def cellOf(vec: Column, nlist: Int, dim: Int): Column = {
    val ds = (0 until nlist).map(j => l2(vec, typedlit(centroid(j, dim))))
    val m = least(ds: _*)
    ds.tail.zipWithIndex
      .foldLeft(when(ds.head === m, lit(0))) { case (acc, (d, j)) =>
        acc.when(d === m, lit(j + 1))
      }
      .otherwise(lit(nlist - 1))
  }

  /** Driver-side probe list: the query's nprobe nearest centroids (same
    * left-associated arithmetic as the column/SQL sides; the resulting
    * integers are inlined identically into both engines).
    */
  def ivfProbes(q: Seq[Double], nlist: Int, nprobe: Int): Seq[Int] = {
    val ds = (0 until nlist).map { j =>
      var acc = 0.0
      var i = 0
      while (i < q.length) {
        val t = q(i) - centroidValue(j, i); acc += t * t; i += 1
      }
      math.sqrt(acc)
    }
    (0 until nlist).sortBy(j => (ds(j), j)).take(nprobe)
  }

  /** IVF top-k: scan the query's nprobe nearest cells, exact re-rank. */
  def annIvf(df: DataFrame, vecCol: Column, idCol: Column, query: Seq[Double],
             k: Int, nlist: Int = 8, nprobe: Int = 2): DataFrame = {
    val dim = query.length
    val probes = ivfProbes(query, nlist, nprobe)
    df.withColumn("cell", cellOf(vecCol, nlist, dim))
      .filter(col("cell").isin(probes: _*))
      .withColumn("distance", l2(vecCol, typedlit(query)))
      .orderBy(col("distance").asc, idCol.asc)
      .limit(k)
  }

  /** Scale-safe top similar pairs by cosine: only pairs sharing an LSH
    * bucket are compared — bucket equality is an equi-join key, so the
    * plan is a hash/sort-merge join on `bucket`, never a cartesian
    * product. Near-identical vectors agree on every hyperplane sign bit
    * w.h.p., so the top pairs survive the prefilter; at 100 TB the
    * bucket column becomes the partition key and each bucket's pair
    * loop stays local to its partition (pair count n²/2^H instead of n²).
    */
  def topCosinePairsBucketed(df: DataFrame, idCol: Column, vecCol: Column,
                             k: Int, numPlanes: Int = 4, dim: Int = 64): DataFrame = {
    val sides = df.select(idCol.as("id"), vecCol.as("vec"),
      norm(vecCol).as("nrm"), bucketOf(vecCol, numPlanes, dim).as("bucket"))
    val a = sides.select(col("id").as("a_id"), col("vec").as("a_vec"),
      col("nrm").as("a_norm"), col("bucket"))
    val b = sides.select(col("id").as("b_id"), col("vec").as("b_vec"),
      col("nrm").as("b_norm"), col("bucket").as("b_bucket"))
    a.join(b, col("bucket") === col("b_bucket") && col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        (dot(col("a_vec"), col("b_vec")) / (col("a_norm") * col("b_norm"))).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("a_id").asc, col("b_id").asc)
      .limit(k)
  }

  /** Contrastive hard-negative mining: for every anchor vector, the
    * `perAnchor` most-similar SAME-BUCKET neighbours whose cosine falls in
    * [lo, hi) — similar enough to be hard (same LSH bucket, mid-band
    * similarity), dissimilar enough to be true negatives (the ≥ hi band is
    * the near-dup zone, mined separately and excluded). This is the
    * training-pair generator for contrastive embedding fine-tuning: easy
    * negatives (random) teach nothing, near-dups (≥ hi) are false
    * negatives; the mid-band is where the gradient is.
    *
    * Scale shape: the LSH bucket equi-join bounds candidates to same-bucket
    * pairs (2^numPlanes buckets — no cartesian), and the per-anchor top-k
    * is one window over anchor keys. Both shuffles are on well-spread keys.
    */
  def hardNegatives(df: DataFrame, idCol: Column, vecCol: Column,
                    lo: Double, hi: Double, perAnchor: Int,
                    numPlanes: Int = 4, dim: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sides = df.select(idCol.as("id"), vecCol.as("vec"),
      norm(vecCol).as("nrm"), bucketOf(vecCol, numPlanes, dim).as("bucket"))
    val a = sides.select(col("id").as("anchor_id"), col("vec").as("a_vec"),
      col("nrm").as("a_norm"), col("bucket"))
    val b = sides.select(col("id").as("neg_id"), col("vec").as("b_vec"),
      col("nrm").as("b_norm"), col("bucket").as("b_bucket"))
    val w = Window.partitionBy(col("anchor_id"))
      .orderBy(col("cos_sim").desc, col("neg_id"))
    a.join(b, col("bucket") === col("b_bucket") && col("anchor_id") =!= col("neg_id"))
      .select(col("anchor_id"), col("neg_id"),
        (dot(col("a_vec"), col("b_vec")) / (col("a_norm") * col("b_norm"))).as("cos_sim"))
      .filter(col("cos_sim") >= lo && col("cos_sim") < hi)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= perAnchor)
      .select(col("anchor_id"), col("neg_id"), col("cos_sim"))
  }

  /** Margin-criterion parallel-pair mining (the LASER/CCMatrix bitext
    * shape): for every vector on side A, its best side-B neighbour is
    * kept only when its similarity stands OUT of both local
    * neighbourhoods — margin = cos(a, best) / mean(top-`k` candidate
    * cosines of a and of best). An absolute cosine threshold can't
    * separate translations from topically-similar text (dense regions
    * score everything high); the margin normalizes by local density,
    * which is the published fix.
    *
    * All scoring is integer fixed point (cos_fp = ⌊cos·1e6⌋ per pair —
    * the one float→int step, on a per-row double both engines compute
    * bit-identically) and negative-cosine candidates are dropped UP
    * FRONT, so every later division has a non-negative numerator and
    * floor == truncate on both engines — the report hash-replays in SQL.
    *
    * Scale shape: candidates are same-LSH-bucket pairs only (equi-join,
    * no cartesian); the neighbourhood stats are two windows partitioned
    * by well-spread vector ids; the candidate relation is pinned once
    * (localCheckpoint — it feeds both windows; the cluster path would
    * stage it, cf. Stage.Parquet).
    *
    * Output: (a_id, b_id, cos_fp, margin_fp) for a-side best pairs with
    * margin_fp ≥ `marginFpMin` (1000 = margin 1.0), ordered by a_id.
    */
  def bitextMine(df: DataFrame, idCol: Column, vecCol: Column,
                 aSide: Column, k: Int = 4, marginFpMin: Long = 1050L,
                 numPlanes: Int = 4, dim: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sides = df.select(idCol.as("id"), vecCol.as("vec"),
      norm(vecCol).as("nrm"), bucketOf(vecCol, numPlanes, dim).as("bucket"),
      aSide.as("is_a"))
    val a = sides.filter(col("is_a")).select(col("id").as("a_id"),
      col("vec").as("a_vec"), col("nrm").as("a_norm"), col("bucket"))
    val b = sides.filter(!col("is_a")).select(col("id").as("b_id"),
      col("vec").as("b_vec"), col("nrm").as("b_norm"),
      col("bucket").as("b_bucket"))
    val cand = a.join(b, col("bucket") === col("b_bucket"))
      .select(col("a_id"), col("b_id"),
        floor(dot(col("a_vec"), col("b_vec")) /
          (col("a_norm") * col("b_norm")) * lit(1000000.0))
          .cast("long").as("cos_fp"))
      .filter(col("cos_fp") >= 0L)
      .localCheckpoint()
    val wa = Window.partitionBy(col("a_id"))
      .orderBy(col("cos_fp").desc, col("b_id"))
    val wb = Window.partitionBy(col("b_id"))
      .orderBy(col("cos_fp").desc, col("a_id"))
    val ra = cand.withColumn("rn_a", row_number().over(wa))
    val avgA = ra.filter(col("rn_a") <= k).groupBy(col("a_id"))
      .agg(sum(col("cos_fp")).as("s_a"), count(lit(1)).as("n_a"))
      .select(col("a_id"), expr("s_a DIV n_a").as("avg_a"))
    val avgB = cand.withColumn("rn_b", row_number().over(wb))
      .filter(col("rn_b") <= k).groupBy(col("b_id"))
      .agg(sum(col("cos_fp")).as("s_b"), count(lit(1)).as("n_b"))
      .select(col("b_id"), expr("s_b DIV n_b").as("avg_b"))
    ra.filter(col("rn_a") === 1)
      .join(avgA, "a_id").join(avgB, "b_id")
      .withColumn("denom", expr("(avg_a + avg_b) DIV 2"))
      .filter(col("denom") > 0L)
      .withColumn("margin_fp", expr("cos_fp * 1000L DIV denom"))
      .filter(col("margin_fp") >= marginFpMin)
      .select(col("a_id"), col("b_id"), col("cos_fp"), col("margin_fp"))
  }

  // ---- Graph ANN (NSW-family: beam search over a navigable graph) ----
  //
  // The reference's Chroma collection builds an HNSW index implicitly on
  // add (`email_fetching.py:27,54-57`). The distributed re-formulation
  // here is a SINGLE navigable layer: HNSW's upper layers are a latency
  // device for one machine's pointer-chasing (log-n entry descent); on a
  // cluster the entry problem is solved by seeding one beam start per
  // LSH bucket (spread across the space by construction), and the
  // navigable small-world edges do the rest. The graph is STAGED like
  // any index (built once by a bucketed equi-join — never all-pairs —
  // plus a per-node top-degree window), and each query is a fixed number
  // of hops, each hop a broadcast semi-join against the edge list plus a
  // keyed vector fetch — hops·beam·degree vector reads instead of a
  // corpus scan, with no cell-boundary recall cliff (edges cross bucket
  // boundaries by construction).

  /** Neighbour edges of the navigable graph: per node, its
    * `edgesPerBucket` nearest counterparts in EACH LSH bucket ≤
    * `probeBits` bits from its own. Candidates come from an equi-join on
    * exploded probe keys (the maxBucket-style bound: never all-pairs).
    * The per-ADJACENT-BUCKET truncation — not a global per-node top-k —
    * is the deterministic version of HNSW's diverse-neighbour heuristic,
    * and it is load-bearing: on a clustered corpus a global top-k gives
    * every node only same-cluster edges (the graph decomposes into
    * cliques and beam search strands at its entry cluster — measured
    * recall@10 0.2–0.5); forcing ≥1 edge into every adjacent bucket
    * guarantees the cross-bucket links navigability needs (measured
    * ≥0.9 at the same visited-set size). Edge build cost is
    * Σ C(H,0..probeBits)/2^H of the all-pairs volume — a constant
    * fraction paid once at index-build time, like any graph index.
    * Determinism: edges ranked by (distance, dst id) within each
    * (src, bucket) group; every tie-break is by id.
    */
  def buildNeighborGraph(df: DataFrame, idCol: Column, vecCol: Column,
                         edgesPerBucket: Int = 2, numPlanes: Int = 4,
                         dim: Int = 64, probeBits: Int = 2): DataFrame =
    neighborEdges(df, idCol, vecCol, edgesPerBucket, numPlanes, dim, probeBits)
      .select(col("src"), col("dst"))

  /** [[buildNeighborGraph]] with the per-edge destination bucket kept in
    * the output — (src, dst, d_bucket). The d_bucket column is what the
    * persisted index ([[GraphAnnIndex]]) partitions the adjacency by:
    * incremental maintenance replaces exactly the (src, d_bucket) groups
    * whose destination bucket received new nodes, so the partition key
    * IS the maintenance unit.
    */
  def neighborEdges(df: DataFrame, idCol: Column, vecCol: Column,
                    edgesPerBucket: Int = 2, numPlanes: Int = 4,
                    dim: Int = 64, probeBits: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val nodes = df.select(idCol.as("id"), vecCol.as("vec"),
      bucketOf(vecCol, numPlanes, dim).as("bucket"))
    // each unordered pair at XOR distance ≤ probeBits matches exactly one
    // mask, so the exploded join emits each candidate edge once
    val probed = nodes.withColumn("probe",
        explode(array(probeMasks(numPlanes, probeBits).map(m =>
          col("bucket").bitwiseXOR(lit(m))): _*)))
      .select(col("id").as("src"), col("vec").as("s_vec"), col("probe"))
    val cand = probed.join(
        nodes.select(col("id").as("dst"), col("vec").as("d_vec"),
          col("bucket").as("d_bucket")),
        col("probe") === col("d_bucket") && col("src") =!= col("dst"))
      .select(col("src"), col("dst"), col("d_bucket"),
        l2(col("s_vec"), col("d_vec")).as("edge_dist"))
    val w = Window.partitionBy(col("src"), col("d_bucket"))
      .orderBy(col("edge_dist").asc, col("dst").asc)
    cand.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= edgesPerBucket)
      .select(col("src"), col("dst"), col("d_bucket"))
  }

  /** Deterministic beam search over a staged neighbour graph, with
    * QUERY-LOCAL entry: seeds are the min-id node of each of the query's
    * multi-probe LSH buckets (own + single-bit flips) — the LSH bucketing
    * plays the role HNSW's upper layers play on one machine, an O(1)
    * descent to the query's neighbourhood, and the graph walk refines
    * recall from there (entry from GLOBAL fixed seeds measured 0.2–0.5
    * recall@10: a fixed hop budget cannot navigate a local-edge graph
    * across the whole space; entry from the query's own buckets measures
    * ≥0.9 at the same scan size). Each hop expands the current top-`beam`
    * frontier's edges (both directions), scores only NEWLY reached ids
    * (keyed vector fetch — the corpus is never scanned), and re-selects
    * the frontier from everything visited. Returns the whole visited set
    * as (id, distance) — bounded by numPlanes+1 + hops·2·beam·degree
    * rows — so callers can top-k AND audit the scan fraction. Fully
    * deterministic (ties by id everywhere), hence SQL-replayable hop by
    * hop.
    */
  def graphAnnBeam(graph: DataFrame, corpus: DataFrame, idCol: Column,
                   vecCol: Column, query: Seq[Double], beam: Int = 8,
                   hops: Int = 3, numPlanes: Int = 4): DataFrame = {
    val dim = query.length
    val probes = probesOf(query, numPlanes)
    val seeds = corpus.select(idCol.as("id"),
        bucketOf(vecCol, numPlanes, dim).as("bucket"))
      .filter(col("bucket").isin(probes: _*))
      .groupBy(col("bucket")).agg(min(col("id")).as("id"))
      .select(col("id"))
    graphAnnBeamFrom(graph, corpus, seeds, idCol, vecCol, query, beam, hops)
  }

  /** The beam-search core, from an explicit seed id set. */
  def graphAnnBeamFrom(graph: DataFrame, corpus: DataFrame, seeds: DataFrame,
                       idCol: Column, vecCol: Column, query: Seq[Double],
                       beam: Int, hops: Int,
                       stage: Stage = Stage.Local): DataFrame = {
    // Traversal is UNDIRECTED (own edges ∪ reversed edges): per-node
    // top-k truncation makes the stored edge list directed, and one-way
    // traversal of a truncated graph strands the search in weakly
    // navigable pockets (measured: recall@10 0.5 → 1.0 on the gate
    // corpus). The adjacency is staged ONCE, pre-doubled — without the
    // cut, every hop re-runs the whole graph BUILD lineage (LSH
    // bucketing + per-node top-k window over the corpus; measured ~2×
    // the entire query's useful work per hop), and pre-doubling folds
    // each hop's two direction joins into one semi-join. Same
    // staged-relation discipline as the pagerank rounds: an index is
    // built once, then looked up.
    val g = stage.cut(doubledAdj(graph), "graph_ann_adj")
    graphAnnBeamFromPrepared(g,
      corpus.select(idCol.as("id"), vecCol.as("vec")), seeds, query,
      beam, hops)
  }

  /** Undirected view of a directed edge list: own ∪ reversed edges. */
  def doubledAdj(graph: DataFrame): DataFrame =
    graph.select(col("src"), col("dst"))
      .unionAll(graph.select(col("dst").as("src"), col("src").as("dst")))

  /** [[graphAnnBeamFrom]] with the adjacency ALREADY doubled and
    * materialized (and the corpus projected to (id, vec)) — the entry
    * the persisted index's generation-keyed relation cache uses
    * ([[GraphAnnIndex]]): a streaming serve re-walks the same committed
    * index every micro-batch, and re-doubling + re-pinning the full
    * adjacency per batch was the top fixed cost of the whole bench's
    * streaming family.
    */
  def graphAnnBeamFromPrepared(g: DataFrame, vecs: DataFrame,
                               seeds: DataFrame, query: Seq[Double],
                               beam: Int, hops: Int): DataFrame =
    graphAnnBeamBatchFromPrepared(g, vecs,
      seeds.select(lit(0L).as("q_id"), col("id")),
      seeds.sparkSession.range(1)
        .select(lit(0L).as("q_id"), typedlit(query).as("q_vec")),
      beam, hops)
      .select(col("id"), col("distance"))

  /** MULTI-QUERY batched beam search — the serving twin of
    * [[graphAnnBeamFrom]] (and the graph-walk analogue of Knn.knnJoin's
    * batch KNN): ONE job set walks N queries at once by keying every
    * relation in the walk by (q_id, node) instead of walking queries
    * one-by-one — the N+1 pattern the reference itself commits with its
    * per-email IMAP fetch (email_fetching.py:38-40). Per hop: the
    * per-QUERY top-`beam` frontier (one window over q_id — bounded at
    * |queries|·beam rows, broadcast), ONE equi-join against the staged
    * adjacency expands every query's frontier together, newly reached
    * (q_id, id) pairs score via a keyed vector fetch joined to the
    * broadcast query batch. Per-query results are row-identical to the
    * single-query walk (AnnSpec asserts it): the frontier window's
    * (distance, id) ordering is the single walk's orderBy-limit, and
    * the anti-join dedup is per query. Cost: the hop joins are shared —
    * walking N queries costs ~1 walk's job count, not N (the whole
    * point; BENCH measures it).
    *
    * `seeds` = (q_id, id); `queries` = (q_id, q_vec). Output: the
    * distinct visited set (q_id, id, distance) per query.
    */
  def graphAnnBeamBatchFrom(graph: DataFrame, corpus: DataFrame,
                            seeds: DataFrame, queries: DataFrame,
                            idCol: Column, vecCol: Column,
                            beam: Int, hops: Int,
                            stage: Stage = Stage.Local): DataFrame = {
    val g = stage.cut(doubledAdj(graph), "graph_ann_adj")
    graphAnnBeamBatchFromPrepared(g,
      corpus.select(idCol.as("id"), vecCol.as("vec")), seeds, queries,
      beam, hops)
  }

  /** [[graphAnnBeamBatchFrom]] with the adjacency already doubled and
    * materialized — the batched twin of [[graphAnnBeamFromPrepared]].
    *
    * The walk STATE lives on the driver. This is not a departure from
    * distributed design but the honest form of what the relational walk
    * already did: frontier, fresh set and visited set are metadata-sized
    * by construction (≤ |queries|·(seeds + hops·beam·degree) rows), and
    * the relational formulation re-COLLECTED them to the driver every
    * hop anyway — that is what `broadcast()` does — then paid a
    * broadcast-build job per relation per hop (frontier, visited
    * anti-join side, the query batch again) plus a window exchange and a
    * distinct exchange, ~6 scheduler round-trips per hop of pure
    * overhead (measured: a warm 4-query batched walk spent ~4 s on
    * ~2 000 rows). Holding the same rows in driver arrays makes each hop
    * exactly TWO single-stage jobs over the corpus-scale relations,
    * which stay fully distributed:
    *
    *   1. expand — scan the pinned adjacency against the frontier as a
    *      broadcast LOCAL relation (its broadcast build is a driver-side
    *      LocalTableScan: no job), collect the reached (q_id, dst) pairs;
    *   2. score — scan the pinned vector relation against the
    *      driver-deduped fresh ids, same local-relation broadcast shape,
    *      collect (q_id, id, distance).
    *
    * Per-query results are row-identical to the relational walk (AnnSpec
    * asserts batch ≡ single per query): the driver-side per-query
    * (distance, id) sort is the frontier window's ordering, the `seen`
    * set is the anti-join, and a hop whose SCORED fresh set is empty
    * ends the walk — once nothing new lands, every frontier is fixed and
    * all later hops are provably no-ops.
    *
    * `seeds` = (q_id, id); `queries` = (q_id, q_vec). Output: the
    * distinct visited set (q_id, id, distance) per query.
    */
  def graphAnnBeamBatchFromPrepared(g: DataFrame, vecs: DataFrame,
                                    seeds: DataFrame, queries: DataFrame,
                                    beam: Int, hops: Int): DataFrame = {
    import org.apache.spark.sql.Row
    import scala.jdk.CollectionConverters._
    val spark = g.sparkSession
    // the query batch, request-sized by declaration — the same rows the
    // relational shape re-broadcast every hop, collected ONCE
    val qvSchema = org.apache.spark.sql.types.StructType(
      queries.schema("q_id") :: queries.schema("q_vec") :: Nil)
    // "request-sized" is enforced, not just declared: the driver state is
    // ≤ |queries|·beam·degree rows per hop, so an unbounded caller batch
    // turns graceful distributed execution into a silent driver OOM.
    // Checked AFTER the one collect (a limit here would turn the collect
    // into CollectLimit's multi-step partition scan — extra jobs on
    // every walk): the walk state multiplies the batch by beam·degree,
    // so failing on the collected batch still fires orders of magnitude
    // before the state the bound protects against.
    val maxBatch = spark.conf.getOption("graft.ann.maxWalkBatch")
      .map(_.toInt).getOrElse(8192)
    val qvRows = queries.select(col("q_id"), col("q_vec")).collect()
    require(qvRows.length <= maxBatch,
      s"graph-ANN walk batch of ${qvRows.length} exceeds " +
        s"graft.ann.maxWalkBatch=$maxBatch; split the batch (or raise " +
        "the bound for a driver sized to hold batch*beam*degree rows " +
        "per hop)")
    val qvRel = spark.createDataFrame(qvRows.toSeq.asJava, qvSchema)
    val pairSchema = org.apache.spark.sql.types.StructType(
      queries.schema("q_id") ::
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType) :: Nil)
    def pairsRel(rows: Seq[Row]): DataFrame =
      spark.createDataFrame(rows.asJava, pairSchema)
    // (q_id, id, distance) — one distributed scan of the pinned vectors;
    // every small side is a LOCAL relation, so no broadcast-build jobs
    def score(pairs: Seq[Row]): Array[Row] =
      vecs.join(broadcast(pairsRel(pairs)), "id")
        .join(broadcast(qvRel), "q_id")
        .select(col("q_id"), col("id").cast("long").as("id"),
          graft.functions.VectorFunctions.l2(col("vec"), col("q_vec"))
            .as("distance"))
        .collect()
    def pairOf(r: Row): Row = Row(r.get(0), r.getLong(1))
    // visited/seen — the walk's metadata-sized state
    val visited = scala.collection.mutable.ArrayBuffer.empty[Row]
    val seen = scala.collection.mutable.HashSet.empty[(Any, Long)]
    def admit(scored: Array[Row]): Int = {
      var n = 0
      scored.foreach { r =>
        if (seen.add((r.get(0), r.getLong(1)))) { visited += r; n += 1 }
      }
      n
    }
    val seedPairs = seeds.select(col("q_id"), col("id").cast("long"))
      .collect().map(pairOf).distinct.toSeq
    admit(score(seedPairs))
    var hop = 0
    var converged = false
    while (hop < hops && !converged) {
      // per-query top-beam frontier: the window's (distance asc, id asc)
      // ordering, driver-side
      val frontier = visited.groupBy(_.get(0)).iterator.flatMap {
        case (_, rows) =>
          rows.sortBy(r => (r.getDouble(2), r.getLong(1))).take(beam)
      }.map(pairOf).toSeq
      // expand: ONE scan of the corpus-scale adjacency; the reached set
      // is ≤ |frontier|·degree rows (dedup + anti-join happen driver-side
      // against `seen`, so no shuffle at all in this job)
      val reached = g.join(broadcast(pairsRel(frontier)
            .withColumnRenamed("id", "src")), "src")
        .select(col("q_id"), col("dst").cast("long").as("id"))
        .collect()
      val fresh = reached.iterator.map(pairOf)
        .filter(p => !seen.contains((p.get(0), p.getLong(1))))
        .toSeq.distinct
      if (fresh.isEmpty || admit(score(fresh)) == 0) converged = true
      hop += 1
    }
    if (sys.env.contains("GRAFT_WALK_DEBUG"))
      println(s"[walk] $hop hops, converged=$converged")
    val outSchema = org.apache.spark.sql.types.StructType(Seq(
      pairSchema("q_id"), pairSchema("id"),
      org.apache.spark.sql.types.StructField("distance",
        org.apache.spark.sql.types.DoubleType)))
    spark.createDataFrame(visited.toSeq.asJava, outSchema)
  }

  /** HIERARCHICAL graph ANN — the distributed HNSW shape proper. A
    * deterministic coarse layer (every `sampleMod`-th id — the id-hash
    * sample plays the role of HNSW's random level assignment) gets its
    * own navigable graph; the query walks the coarse layer first (long
    * strides: its neighbours are ~sampleMod× farther apart, so a fixed
    * hop budget crosses the space), and the best coarse results seed the
    * base-layer walk (local refinement). This is what keeps the hop
    * budget CONSTANT as the corpus grows — the flat walk's required hops
    * grow with bucket population (measured: flat recall@10 at fixed
    * hops decays 1.0 → 0.7 over a 100× corpus growth; hierarchical
    * holds ≥ 0.9) — at the price of one extra graph build over a
    * 1/sampleMod sample. Returns the distinct visited set (id,
    * distance); both layers' scans are included, so n_scored audits the
    * true cost.
    */
  def graphAnnHierarchical(corpus: DataFrame, idCol: Column, vecCol: Column,
                           query: Seq[Double], sampleMod: Int = 16,
                           beam: Int = 16, hops: Int = 6,
                           edgesPerBucket: Int = 3, numPlanes: Int = 4,
                           dim: Int = 64, probeBits: Int = 2): DataFrame = {
    val coarse = corpus.filter(idCol % sampleMod === 0)
    val g1 = buildNeighborGraph(coarse, idCol, vecCol, edgesPerBucket,
      numPlanes, dim, probeBits)
    // coarse entry: min id per bucket over the WHOLE coarse layer (≤
    // 2^numPlanes seeds) — the top layer is small enough that entry
    // needs no query locality, exactly like HNSW's arbitrary top entry
    val seeds1 = coarse.select(idCol.as("id"),
        bucketOf(vecCol, numPlanes, dim).as("bucket"))
      .groupBy(col("bucket")).agg(min(col("id")).as("id"))
      .select(col("id"))
    val v1 = graphAnnBeamFrom(g1, coarse, seeds1, idCol, vecCol, query,
      beam, hops)
    val g0 = buildNeighborGraph(corpus, idCol, vecCol, edgesPerBucket,
      numPlanes, dim, probeBits)
    // base entry: the best coarse hits plus the query's own probe-bucket
    // min-ids (the O(1) LSH descent — cheap and hedges a sparse sample)
    val probes = probesOf(query, numPlanes)
    val probeSeeds = corpus.select(idCol.as("id"),
        bucketOf(vecCol, numPlanes, dim).as("bucket"))
      .filter(col("bucket").isin(probes: _*))
      .groupBy(col("bucket")).agg(min(col("id")).as("id"))
      .select(col("id"))
    val entry0 = v1.orderBy(col("distance").asc, col("id").asc)
      .limit(beam).select(col("id"))
      .unionAll(probeSeeds)
    val v0 = graphAnnBeamFrom(g0, corpus, entry0, idCol, vecCol, query,
      beam, hops)
    v1.unionByName(v0).distinct()
  }

  /** Exact top similar pairs by cosine — brute force for modest n (the
    * oracle-checkable baseline and the recall reference for the bucketed
    * variant above; never the declared path at scale).
    */
  def topCosinePairs(df: DataFrame, idCol: Column, vecCol: Column, k: Int): DataFrame = {
    // precompute each side's norm once (narrow projection) so the O(n²)
    // pair loop only pays one fused dot product per pair; cos = dot/(na·nb)
    // evaluates identically to the single-expression cosine.
    val a = df.select(idCol.as("a_id"), vecCol.as("a_vec"), norm(vecCol).as("a_norm"))
    val b = df.select(idCol.as("b_id"), vecCol.as("b_vec"), norm(vecCol).as("b_norm"))
    a.join(b, col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        (dot(col("a_vec"), col("b_vec")) / (col("a_norm") * col("b_norm"))).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("a_id").asc, col("b_id").asc)
      .limit(k)
  }
}
