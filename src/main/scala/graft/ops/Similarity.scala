package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Similarity search over an embedding column (SURVEY §2C).
  *
  * Three tiers, scale-first:
  *  - [[bruteForceTopK]]: exact cosine top-k — broadcast the (small)
  *    query set against the (huge) corpus; one pass, no corpus shuffle.
  *    This is the correctness baseline and the re-rank stage.
  *  - [[lshTopK]]: sign-bit LSH bucketing — queries only score vectors
  *    in their bucket; cost drops from N·Q to Σ bucket·Q_bucket. The
  *    100 TB path: bucket is the shuffle/partition key.
  *  - [[centroidAssign]] (IVF flavor): partition the corpus by
  *    nearest-centroid, probe only matching partitions.
  *
  * Scores use quantized-integer arithmetic (see VectorFunctions) so
  * results are bit-identical to the DuckDB oracle.
  */
object Similarity {

  /** Exact integer division for the floor-mean centroid update. Spark's
    * `/` (Divide) is DOUBLE arithmetic — exact only while per-cluster
    * per-dimension sums stay below 2^53; `div` (IntegralDivide) keeps
    * the update on the integer grid at any magnitude, matching the
    * oracle's true integer `//`. The numerator is always pmod-adjusted
    * to be exactly divisible, so floor == truncate here.
    */
  private def floorDiv(num: Column, den: Column): Column =
    call_function("div", num, den)

  /** Shared final stage: rank scored (query_id, n_id, cosine) rows and
    * keep the top k per query (deterministic tie-break on neighbor id).
    */
  private def topKPerQuery(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("n_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("n_id").as("neighbor_id"), col("cosine"))
  }

  /** Exact top-k neighbors for each query vector (queries broadcast).
    * Output: (query_id, rank, neighbor_id, cosine).
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val c = corpus.select(col("vec_id").as("n_id"), quantize(col("embedding")).as("n_q"))
      .withColumn("n_norm", normSqQ(col("n_q")))
    val q = queries.select(col("vec_id").as("query_id"), quantize(col("embedding")).as("q_q"))
      .withColumn("q_norm", normSqQ(col("q_q")))
    topKPerQuery(
      c.join(broadcast(q), col("n_id") =!= col("query_id"))
        .withColumn("cosine", cosineQ(col("q_q"), col("n_q"), col("q_norm"), col("n_norm"))),
      k)
  }

  /** Hard-negative mining (contrastive training, c22): for each query
    * vector, the top-k HIGHEST-cosine vectors whose label DIFFERS —
    * the negatives a contrastive or triplet loss learns most from —
    * excluding pairs with cosine > `dupMax`: a near-identical vector
    * carrying a different label is overwhelmingly LABEL NOISE (the
    * d05/d13 near-dup finding restated), and training on it as a
    * negative teaches the model to separate duplicates. Both rules
    * (label inequality, the dup ceiling) ride the one scored relation;
    * queries broadcast like [[bruteForceTopK]] (anchors are a sampled
    * sliver of the corpus), so the corpus never shuffles — at 100 TB
    * the same shape holds with the s02/s06 bucketed candidate join
    * replacing the full scan. Cosines are the house quantized-exact
    * doubles, so the dup ceiling cuts at the same pair in both
    * engines. Output: (query_id, rank, neighbor_id, neighbor_label,
    * cosine).
    */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, k: Int,
      dupMax: Double): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(dupMax > 0.0 && dupMax <= 1.0,
      s"dupMax must be in (0, 1], got $dupMax")
    val c = corpus.select(col("vec_id").as("n_id"),
        col("label").cast("long").as("n_label"),
        quantize(col("embedding")).as("n_q"))
      .withColumn("n_norm", normSqQ(col("n_q")))
    val q = queries.select(col("vec_id").as("query_id"),
        col("label").cast("long").as("q_label"),
        quantize(col("embedding")).as("q_q"))
      .withColumn("q_norm", normSqQ(col("q_q")))
    val scored = c.join(broadcast(q),
        col("n_id") =!= col("query_id") && col("n_label") =!= col("q_label"))
      .withColumn("cosine",
        cosineQ(col("q_q"), col("n_q"), col("q_norm"), col("n_norm")))
      .where(col("cosine") <= lit(dupMax))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("n_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("n_id").as("neighbor_id"),
        col("n_label").as("neighbor_label"), col("cosine"))
  }

  /** ANN top-k for any deterministic bucketing function: score only
    * same-bucket vectors (recall < 1 by design — the standard LSH
    * tradeoff; oracles apply the identical rule).
    */
  def bucketedTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      bucketFn: Column => Column): DataFrame = {
    def withBucket(df: DataFrame): DataFrame =
      df.select(col("vec_id"), quantize(col("embedding")).as("q"))
        .withColumn("bucket", bucketFn(col("q")))
        .withColumn("norm", normSqQ(col("q")))
    val c = withBucket(corpus)
      .select(col("vec_id").as("n_id"), col("q").as("n_q"), col("bucket"), col("norm").as("n_norm"))
    val q = withBucket(queries)
      .select(col("vec_id").as("query_id"), col("q").as("q_q"), col("bucket"), col("norm").as("q_norm"))
    topKPerQuery(
      c.join(broadcast(q), Seq("bucket"))
        .where(col("n_id") =!= col("query_id"))
        .withColumn("cosine", cosineQ(col("q_q"), col("n_q"), col("q_norm"), col("n_norm"))),
      k)
  }

  /** Axis-aligned sign-bit LSH top-k. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, bits: Int = 8): DataFrame =
    bucketedTopK(corpus, queries, k, signBucket(_, bits))

  /** Multiprobe SRP LSH top-k (Lv et al., VLDB 2007): each query
    * probes its own bucket AND every Hamming-distance-1 neighbour
    * bucket (flip one sign bit) — the standard way to buy recall
    * WITHOUT more hash tables: a near neighbour that lands across one
    * hyperplane (the dominant miss mode — one marginal projection) is
    * recovered by the flipped probe, so one table at b bits probes
    * like b+1 tables. The deterministic variant: the full radius-1
    * ring, not margin-ordered partial probing (which reorders the SAME
    * candidate set at this T and would need per-query float margins
    * in the contract). Cost shape: the CORPUS is bucketed and
    * shuffled once; only the (tiny, broadcast) query side explodes
    * ×(b+1), and buckets partition the corpus, so probe buckets are
    * disjoint — no candidate is scored twice and the join stays a
    * plain bucket equi-join. Recall ordering vs the single-probe s06
    * at identical planes is spec-gated.
    */
  def multiprobeTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      planes: Array[Array[Long]]): DataFrame = {
    val bits = planes.length
    def withBucket(df: DataFrame): DataFrame =
      df.select(col("vec_id"), quantize(col("embedding")).as("q"))
        .withColumn("bucket", srpBucket(col("q"), planes))
        .withColumn("norm", normSqQ(col("q")))
    val c = withBucket(corpus)
      .select(col("vec_id").as("n_id"), col("q").as("n_q"),
        col("bucket"), col("norm").as("n_norm"))
    val probes = array(
      (0 until bits).map(i => col("bucket").bitwiseXOR(lit(1L << i))) :+
        col("bucket"): _*)
    val q = withBucket(queries)
      .select(col("vec_id").as("query_id"), col("q").as("q_q"),
        col("norm").as("q_norm"), explode(probes).as("bucket"))
    topKPerQuery(
      c.join(broadcast(q), Seq("bucket"))
        .where(col("n_id") =!= col("query_id"))
        .withColumn("cosine",
          cosineQ(col("q_q"), col("n_q"), col("q_norm"), col("n_norm"))),
      k)
  }

  /** Seeded signed-random-projection LSH top-k. */
  def srpTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      planes: Array[Array[Long]]): DataFrame =
    bucketedTopK(corpus, queries, k, srpBucket(_, planes))

  /** k-NN GRAPH construction: every corpus vector is a query, so this
    * is [[bucketedTopK]]'s semantics with the one 100 TB-critical plan
    * change — the query side is NOT broadcast (it IS the corpus); the
    * candidate generation is a bucket-keyed equi-self-join, shuffling
    * both sides on the LSH bucket. The k-NN graph feeds SemDeDup-style
    * clustering, graph-based label propagation, and diversity pruning.
    *
    * Cost is Σ_buckets m² like every LSH self-join in this repo; the
    * sign-bit bucket count (2^bits) is the knob, and d11's
    * candidate-budget guard runs HERE too (round 7): Σ C(bucket, 2) is
    * checked against `maxCandidatePairs` BEFORE the self-join, so a
    * corpus that collapses into few buckets (skew, correlated
    * embeddings) or simply outgrows 2^bits fails fast with a diagnosis
    * instead of entering the quadratic regime. Size `bits` with
    * [[scaledBits]] (expected volume then stays linear in n); use
    * [[knnGraphBanded]] when high bits costs too much recall. Output:
    * (node_id, rank, neighbor_id, cosine) with rank ≤ k per node,
    * ties broken on neighbor id — nodes whose bucket holds no other
    * vector emit no rows (stated: an isolated node has no k-NN edge).
    */
  def knnGraph(corpus: DataFrame, k: Int, bits: Int = 8,
      maxCandidatePairs: Long = 1L << 26): DataFrame = {
    require(maxCandidatePairs > 0, "maxCandidatePairs must be positive")
    val base = corpus
      .select(col("vec_id"), quantize(col("embedding")).as("q"))
      .withColumn("bucket", signBucket(col("q"), bits))
      .withColumn("norm", normSqQ(col("q")))
      .localCheckpoint(true) // guard + both sides of the self-join scan it
    assertCandidateBudget(base.groupBy("bucket").agg(count(lit(1)).as("m")),
      maxCandidatePairs,
      s"knnGraph: sign-bucket self-join candidate volume exceeds the " +
        s"$maxCandidatePairs budget — 2^$bits buckets are too few for this " +
        "corpus (expected volume grows as n^2/2^bits, and skewed/correlated " +
        "embeddings concentrate it further). Raise `bits` (see scaledBits), " +
        "use knnGraphBanded for recall at higher bits, or raise " +
        "maxCandidatePairs.")
    val c = base.select(col("vec_id").as("n_id"), col("q").as("n_q"),
      col("bucket"), col("norm").as("n_norm"))
    val q = base.select(col("vec_id").as("query_id"), col("q").as("q_q"),
      col("bucket"), col("norm").as("q_norm"))
    topKPerQuery(
      q.join(c, Seq("bucket"))
        .where(col("n_id") =!= col("query_id"))
        .withColumn("cosine",
          cosineQ(col("q_q"), col("n_q"), col("q_norm"), col("n_norm"))),
      k)
      .withColumnRenamed("query_id", "node_id")
  }

  /** RUNTIME candidate-budget guard (d11's `prefixFilterPairs` house
    * pattern applied to every LSH self-join): Σ_buckets C(m, 2) is one
    * cheap aggregate over the already-checkpointed bucket relation,
    * checked BEFORE the self-join so a skewed corpus fails in seconds
    * with a diagnosis instead of discovering the quadratic regime as a
    * multi-hour join. The sum is taken in DOUBLE — a degenerate corpus
    * can push Σ C(m, 2) past 2^63, and a wrapped-negative Long would
    * silently DISABLE the guard in exactly the regime it exists to
    * catch; double precision loss (>2^53) is irrelevant to a budget
    * comparison.
    */
  private def assertCandidateBudget(bucketCounts: DataFrame,
      maxCandidatePairs: Long, diagnosis: String): Unit = {
    val nCand = bucketCounts
      .agg(coalesce(
        sum(col("m").cast("double") * (col("m") - 1).cast("double") / 2.0),
        lit(0.0)))
      .head().getDouble(0)
    if (nCand > maxCandidatePairs.toDouble)
      throw new IllegalStateException(f"candidate volume $nCand%.0f: $diagnosis")
  }

  /** Corpus-scaled LSH bucket width: the smallest `bits` whose 2^bits
    * buckets hold ≤ `targetBucketSize` vectors each in expectation —
    * the SemDeDup argument (k scales with n so per-cluster work stays
    * bounded) applied to sign-bucket LSH. Expected candidate volume is
    * then ≤ n·targetBucketSize/2, linear in n by construction.
    */
  def scaledBits(corpusSize: Long, targetBucketSize: Long = 1024L,
      minBits: Int = 4, maxBits: Int = 30): Int = {
    require(targetBucketSize > 0, "targetBucketSize must be positive")
    var bits = minBits
    while (bits < maxBits && (corpusSize >> bits) > targetBucketSize) bits += 1
    bits
  }

  /** Multi-band k-NN graph — the recall knob that makes high `bits`
    * usable: `bands` independent seeded SRP bucketings, a pair is a
    * candidate if it collides in ANY band (union + distinct, the
    * classic LSH banding OR-construction), then exact cosine re-rank.
    * Raising bits-per-band cuts candidate volume ~2×/bit; adding a band
    * restores recall at +1 self-join of the id+bucket relation.
    *
    * Plan shape, deliberate: the band/bucket relation carries ids and
    * buckets ONLY — vectors never ride the candidate union or the
    * distinct; scoring re-attaches the two vectors by id against the
    * one checkpointed base. Budget-guarded like [[knnGraph]], summed
    * across bands.
    *
    * SKEW-AWARE SIZING (`targetP99Occupancy` > 0): mean-occupancy
    * sizing ([[scaledBits]]) under-sizes when real SRP buckets skew —
    * correlated embeddings concentrate mass in few buckets and the
    * n²/2^bits model's tail goes quadratic while the mean looks fine
    * (the measured r7 cliff: 10→30× tail exponent 2.28). So the
    * operator measures what the model guesses: build the band
    * relation, take the p99 bucket occupancy (exact `percentile` over
    * the already-aggregated bucket-count relation — bucket-count-
    * sized, never corpus-sized), and while p99 exceeds the target,
    * raise bitsPerBand by log₂(p99/target) and re-measure. Each probe
    * is one cheap aggregate; convergence is 2–3 rounds because every
    * added bit halves occupancy IN THE MEASURED TAIL, not in the
    * mean. When the corpus is small enough that the starting bits
    * already meet the target (every test SF), the escalation never
    * fires and output is bit-identical to the fixed-bits form.
    */
  def knnGraphBanded(corpus: DataFrame, k: Int, bands: Int = 2,
      bitsPerBand: Int = 6, dim: Int = 64,
      maxCandidatePairs: Long = 1L << 26,
      targetP99Occupancy: Long = 0L, maxBits: Int = 24): DataFrame = {
    require(bands > 0, "bands must be positive")
    require(targetP99Occupancy >= 0, "targetP99Occupancy must be >= 0")
    val base = corpus
      .select(col("vec_id"), quantize(col("embedding")).as("q"))
      .withColumn("norm", normSqQ(col("q")))
      .localCheckpoint(true)
    def bandRel(bits: Int) = (0 until bands).map { b =>
      base.select(col("vec_id"), lit(b).as("band"),
        srpBucket(col("q"), bandPlanes(b, bits, dim)).as("bucket"))
    }.reduce(_ unionAll _).localCheckpoint(true)
    // coalesce: percentile over an EMPTY band relation is NULL — an
    // empty corpus must fall through to an empty graph, not NPE here
    def p99Of(rel: DataFrame): Double = rel
      .groupBy("band", "bucket").agg(count(lit(1)).as("m"))
      .agg(coalesce(expr("percentile(m, 0.99)"), lit(0.0)))
      .head().getDouble(0)
    var bits = bitsPerBand
    var banded = bandRel(bits)
    if (targetP99Occupancy > 0L) {
      var p99 = p99Of(banded)
      while (p99 > targetP99Occupancy.toDouble && bits < maxBits) {
        val step = math.max(1,
          math.ceil(math.log(p99 / targetP99Occupancy) / math.log(2.0)).toInt)
        bits = math.min(maxBits, bits + step)
        banded = bandRel(bits)
        p99 = p99Of(banded)
      }
    }
    assertCandidateBudget(
      banded.groupBy("band", "bucket").agg(count(lit(1)).as("m")),
      maxCandidatePairs,
      s"knnGraphBanded: banded self-join candidate volume exceeds the " +
        s"$maxCandidatePairs budget across $bands bands × 2^$bits " +
        "buckets. Raise bitsPerBand (see scaledBits), set " +
        "targetP99Occupancy to size bits from measured tail occupancy, " +
        "drop a band, or raise maxCandidatePairs.")
    val pairs = banded.select(col("band"), col("bucket"),
        col("vec_id").as("node_id"))
      .join(banded.select(col("band"), col("bucket"),
        col("vec_id").as("n_id")), Seq("band", "bucket"))
      .where(col("n_id") =!= col("node_id"))
      .select("node_id", "n_id").distinct()
    val scored = pairs
      .join(base.select(col("vec_id").as("node_id"), col("q").as("q_q"),
        col("norm").as("q_norm")), "node_id")
      .join(base.select(col("vec_id").as("n_id"), col("q").as("n_q"),
        col("norm").as("n_norm")), "n_id")
      .withColumn("cosine",
        cosineQ(col("q_q"), col("n_q"), col("q_norm"), col("n_norm")))
      .withColumnRenamed("node_id", "query_id")
    topKPerQuery(scored, k).withColumnRenamed("query_id", "node_id")
  }

  /** The per-band SRP hyperplanes — seed derivation is part of the
    * cross-engine contract (the s17 oracle embeds the same literals).
    */
  def bandPlanes(band: Int, bitsPerBand: Int, dim: Int): Array[Array[Long]] =
    graft.functions.VectorFunctions.srpPlanes(bitsPerBand, dim,
      seed = 101L + band)

  /** Quantized per-label centroids (the label column stands in for a
    * k-means assignment; same plumbing): (c_label, c_q, c_norm).
    */
  def centroids(corpus: DataFrame): DataFrame =
    corpus.select(col("vec_id"), col("label"),
        posexplode(quantize(col("embedding"))).as(Seq("pos", "v")))
      .groupBy(col("label").as("c_label"), col("pos"))
      .agg(round(avg(col("v"))).cast("long").as("cv"))
      .groupBy("c_label")
      .agg(array_sort(collect_list(struct(col("pos"), col("cv")))).as("pairs"))
      .select(col("c_label"), transform(col("pairs"), p => p.getField("cv")).as("c_q"))
      .withColumn("c_norm", normSqQ(col("c_q")))

  /** Rank every (vector, centroid) pair by cosine; rn = 1 is the IVF
    * list assignment, rn <= nprobe the query probe set.
    */
  private def rankedCentroids(vecs: DataFrame, cents: DataFrame): DataFrame = {
    val scored = vecs.join(broadcast(cents), lit(true))
      .withColumn("c_cos", cosineQ(col("q"), col("c_q"), col("norm"), col("c_norm")))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("c_cos").desc, col("c_label"))
    scored.withColumn("rn", row_number().over(w))
  }

  private def quantized(corpus: DataFrame): DataFrame =
    corpus.select(col("vec_id"), col("label"), quantize(col("embedding")).as("q"))
      .withColumn("norm", normSqQ(col("q")))

  /** IVF coarse quantizer health check: nearest-centroid assignment
    * confusion counts. Output: (label, predicted, n).
    */
  def centroidAssign(corpus: DataFrame): DataFrame =
    rankedCentroids(quantized(corpus), centroids(corpus))
      .where(col("rn") === 1)
      .groupBy(col("label").cast("long").as("label"), col("c_label").cast("long").as("predicted"))
      .agg(count(lit(1)).as("n"))

  /** Deterministic Lloyd k-means over quantized integer vectors — the
    * IVF TRAINING step ([[centroidAssign]]/[[ivfTopK]] consume
    * centroids; this is how they get fit without importing anyone's
    * model). Every choice is exact, engine-portable arithmetic so the
    * DuckDB oracle replays the whole training bit-for-bit (s08):
    *
    *  - init: the k lowest-`vec_id` vectors (content-stable, no RNG);
    *  - distance: integer squared-L2 (no float accumulation order);
    *  - ties: lowest centroid id;
    *  - update: per-dimension floor(mean), back onto the integer grid;
    *    a cluster that loses all members keeps its previous centroid.
    *
    * Scale shape: centroids are k×dim longs — model state lives on the
    * driver and enters the plan as literals inside ONE codegen'd
    * per-row argmin (k fused `zip_with`+`aggregate` expressions), so
    * each of the `iters` assignment passes scans the corpus once with
    * zero shuffle, and each update is one groupBy(k) with map-side
    * combine. Returns the final (vec_id, cid, dist) assignment.
    */
  def kmeansAssign(corpus: DataFrame, k: Int = 8, iters: Int = 2,
      keepQ: Boolean = false): DataFrame = {
    require(k >= 1 && iters >= 1, s"need k >= 1 and iters >= 1, got k=$k iters=$iters")
    val qv = corpus.select(col("vec_id"), quantize(col("embedding")).as("q"))
    // one action seeds AND probes the dimension (was two)
    val seedRows = qv.orderBy("vec_id").limit(k).select("q").collect()
    require(seedRows.nonEmpty, "kmeansAssign needs a non-empty corpus")
    val dim = seedRows.head.getSeq[Long](0).length
    var cents: Array[(Int, Array[Long])] = seedRows.zipWithIndex
      .map { case (r, i) => i -> r.getSeq[Long](0).toArray }
    def assign(): DataFrame = {
      val distCols = cents.map { case (cid, cv) =>
        struct(
          aggregate(zip_with(col("q"), array(cv.map(lit).toSeq: _*),
            (x, y) => (x - y) * (x - y)), lit(0L), (acc, v) => acc + v).as("dist"),
          lit(cid).as("cid"))
      }
      // array_min over (dist, cid) structs = argmin with the lowest-cid
      // tie-break, evaluated in one codegen'd projection
      qv.withColumn("best", array_min(array(distCols.toSeq: _*)))
        .select(col("vec_id"), col("q"),
          col("best.cid").as("cid"), col("best.dist").as("dist"))
    }
    (1 until iters).foreach { _ =>
      // EXACT integer floor division for the mean — no float division:
      // floor(s/n) via the non-negative remainder (pmod), so negative
      // sums floor identically in every engine. A double division here
      // sits on rounding edges (a true quotient of k - ε can round to
      // exactly k) and diverged from the oracle at sf0.1.
      val means = assign().groupBy("cid").agg(
        array((0 until dim).map { i =>
          val s = sum(element_at(col("q"), i + 1))
          val n = count(lit(1))
          floorDiv(s - pmod(s, n), n)
        }.toSeq: _*).as("cv"))
        .collect().map(r => r.getInt(0) -> r.getSeq[Long](1).toArray).toMap
      cents = cents.map { case (cid, prev) => cid -> means.getOrElse(cid, prev) }
    }
    // keepQ retains the quantized vectors for consumers that score
    // within clusters afterwards (Dedup.semDedup) — saves them a second
    // quantize + join against the corpus
    if (keepQ) assign() else assign().drop("q")
  }

  // --- product quantization --------------------------------------------------

  /** Integer squared-L2 between a sub-vector column and a literal
    * centroid — the one distance kernel every PQ stage shares.
    */
  private def l2Lit(sub: Column, cv: Array[Long]): Column =
    aggregate(zip_with(sub, array(cv.map(lit).toSeq: _*),
      (x, y) => (x - y) * (x - y)), lit(0L), (acc, v) => acc + v)

  /** argmin over literal centroids as (dist, cid) struct-min — lowest
    * cid wins ties, evaluated in one codegen'd projection.
    */
  private def argminCid(sub: Column, book: Array[Array[Long]]): Column =
    array_min(array(book.zipWithIndex.map { case (cv, cid) =>
      struct(l2Lit(sub, cv).as("dist"), lit(cid).as("cid"))
    }.toSeq: _*)).getField("cid")

  /** Product-quantization codebook training: the quantized vector is
    * split into `m` contiguous subspaces and each subspace gets its own
    * `k`-centroid Lloyd codebook, trained with EXACTLY the rules of
    * [[kmeansAssign]] (lowest-vec_id init, integer L2, lowest-cid ties,
    * floor-mean update via pmod, empty cluster keeps its centroid) — so
    * the DuckDB oracle replays the whole fit bit-for-bit, per subspace.
    *
    * Scale shape: ALL subspaces train in each pass — the per-subspace
    * argmins are fused into one codegen'd projection, and the update is
    * ONE explode to (subspace, cid, sub-vector) rows + ONE map-side-
    * combined groupBy((subspace, cid)) — so an iteration costs one
    * corpus scan and one k·m-group shuffle regardless of m. Codebooks
    * (m·k·dsub longs) are driver state entering plans as literals, like
    * every model in this package. Returns books(subspace)(cid)(dim).
    */
  def pqCodebooks(corpus: DataFrame, m: Int, k: Int, iters: Int): Array[Array[Array[Long]]] = {
    require(m >= 1 && k >= 1 && iters >= 1, s"need m,k,iters >= 1, got m=$m k=$k iters=$iters")
    // training drives iters+1 driver actions over the quantized corpus
    // (dim probe, seed scan, per-iteration mean collects) — materialize
    // it once instead of re-reading + re-quantizing the source per
    // action (at scale: the persisted quantized-vector table)
    val qv = corpus.select(col("vec_id"), quantize(col("embedding")).as("q"))
      .localCheckpoint(true)
    // one action seeds AND probes the dimension (was two)
    val seed = qv.orderBy("vec_id").limit(k).select("q").collect()
      .map(_.getSeq[Long](0).toArray)
    require(seed.nonEmpty, "pqCodebooks needs a non-empty corpus")
    val dim = seed.head.length
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val dsub = dim / m
    def subCol(mi: Int): Column = slice(col("q"), mi * dsub + 1, dsub)
    var books: Array[Array[Array[Long]]] =
      Array.tabulate(m)(mi => seed.map(_.slice(mi * dsub, (mi + 1) * dsub)))
    (1 until iters).foreach { _ =>
      val assigns = qv.select(explode(array((0 until m).map { mi =>
        struct(lit(mi).as("mi"), argminCid(subCol(mi), books(mi)).as("cid"),
          subCol(mi).as("sub"))
      }: _*)).as("a"))
        .select(col("a.mi"), col("a.cid"), col("a.sub"))
      // exact floor mean on the integer grid (pmod form — see
      // kmeansAssign for why a double division diverges)
      val means = assigns.groupBy("mi", "cid").agg(
        array((0 until dsub).map { i =>
          val s = sum(element_at(col("sub"), i + 1))
          val n = count(lit(1))
          floorDiv(s - pmod(s, n), n)
        }: _*).as("cv"))
        .collect()
        .map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Long](2).toArray).toMap
      books = Array.tabulate(m) { mi =>
        books(mi).zipWithIndex.map { case (prev, cid) =>
          means.getOrElse((mi, cid), prev)
        }
      }
    }
    books
  }

  /** PQ asymmetric-distance top-k search. Corpus vectors are ENCODED to
    * m byte-sized codes (the 100 TB property: a 64-dim vector becomes m
    * small ints — the index is ~64x smaller than the raw vectors, and
    * encoding is one corpus scan). Each query precomputes its m×k
    * distance TABLE once (per-subspace L2 to every centroid); scoring a
    * pair is then m table lookups + adds — no per-pair vector math at
    * all. approx dist(q, x) = Σ_m dtab_m[code_m(x)], the standard ADC
    * bound. Everything is integer, so results are oracle-exact (unlike
    * float PQ there is no reconstruction rounding to argue about).
    *
    * Output: (query_id, rank, neighbor_id, adc_dist) — rank by
    * (adc_dist asc, neighbor_id asc), self excluded.
    */
  /** The one copy of each PQ search expression (encode array, distance
    * tables, ADC lookup sum, final rank) — [[pqTopK]] and [[ivfPqTopK]]
    * assemble different plans from the SAME kernels, so a fix to e.g.
    * the 1-based ADC indexing can never leave one of them stale.
    */
  private def pqCodesCol(books: Array[Array[Array[Long]]]): Column = {
    val dsub = books(0)(0).length
    array(books.indices.map { mi =>
      argminCid(slice(col("q"), mi * dsub + 1, dsub), books(mi))
    }: _*)
  }

  private def pqDistTableCols(books: Array[Array[Array[Long]]]): Seq[Column] = {
    val dsub = books(0)(0).length
    books.indices.map { mi =>
      array(books(mi).map(cv =>
        l2Lit(slice(col("q"), mi * dsub + 1, dsub), cv)).toSeq: _*).as(s"dt$mi")
    }
  }

  private def adcDistCol(m: Int): Column = (0 until m).map { mi =>
    element_at(col(s"dt$mi"), element_at(col("codes"), mi + 1).cast("int") + 1)
  }.reduce(_ + _)

  private def rankByAdc(scored: DataFrame, topK: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_dist").asc, col("n_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= topK)
      .select(col("query_id"), col("rank"), col("n_id").as("neighbor_id"),
        col("adc_dist"))
  }

  def pqTopK(corpus: DataFrame, queries: DataFrame, topK: Int,
      m: Int = 4, codebookK: Int = 16, iters: Int = 2): DataFrame = {
    val books = pqCodebooks(corpus, m, codebookK, iters)
    val enc = corpus.select(col("vec_id").as("n_id"), quantize(col("embedding")).as("q"))
      .select(col("n_id"), pqCodesCol(books).as("codes"))
    val qdt = queries.select(col("vec_id").as("query_id"), quantize(col("embedding")).as("q"))
      .select(col("query_id") +: pqDistTableCols(books): _*)
    val scored = enc.join(broadcast(qdt), col("n_id") =!= col("query_id"))
      .withColumn("adc_dist", adcDistCol(m))
    rankByAdc(scored, topK)
  }

  /** IVF-PQ composed search — the index structure 100 TB ANN actually
    * ships (FAISS's IVFPQ, residuals off): the coarse quantizer prunes
    * (each query touches only its `nprobe` inverted lists — at scale
    * the list label is the PARTITION key, so pruning is partition
    * pruning), and PQ codes compress (each corpus vector is m small
    * ints; scoring a candidate is m distance-table lookups, no vector
    * math). Composition of [[ivfTopK]]'s lists with [[pqTopK]]'s ADC:
    * codebooks are trained on the full corpus (no per-list residual
    * training — that variant trades oracle replayability for recall),
    * all arithmetic integer, so the whole index — train, encode,
    * probe, score — replays exactly in SQL.
    *
    * Output: (query_id, rank, neighbor_id, adc_dist).
    */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, topK: Int, nprobe: Int,
      m: Int = 4, codebookK: Int = 16, iters: Int = 2): DataFrame = {
    val books = pqCodebooks(corpus, m, codebookK, iters)
    val cents = centroids(corpus)
    // inverted lists, members carried as PQ codes only (the scale point)
    val enc = rankedCentroids(quantized(corpus), cents).where(col("rn") === 1)
      .select(col("vec_id").as("n_id"), col("c_label").as("list_label"),
        pqCodesCol(books).as("codes"))
    // probe PAIRS and distance TABLES broadcast separately: the m×k
    // table is computed once per QUERY, not once per (query, list) —
    // inlining it into the probe relation would redo (and re-ship)
    // every table nprobe times
    val probes = rankedCentroids(quantized(queries), cents).where(col("rn") <= nprobe)
      .select(col("vec_id").as("query_id"), col("c_label").as("list_label"))
    val qdt = queries.select(col("vec_id").as("query_id"), quantize(col("embedding")).as("q"))
      .select(col("query_id") +: pqDistTableCols(books): _*)
    val scored = enc.join(broadcast(probes), Seq("list_label"))
      .where(col("n_id") =!= col("query_id"))
      .join(broadcast(qdt), Seq("query_id"))
      .withColumn("adc_dist", adcDistCol(m))
    rankByAdc(scored, topK)
  }

  /** IVF probe search: corpus vectors are bucketed by their nearest
    * centroid (the inverted list — at scale this is the partitioning
    * key, so a probe touches nprobe/nlists of the data); each query
    * scores only vectors in its nprobe closest lists, then exact top-k.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int, nprobe: Int): DataFrame = {
    val cents = centroids(corpus)
    val lists = rankedCentroids(quantized(corpus), cents).where(col("rn") === 1)
      .select(col("vec_id").as("n_id"), col("q").as("n_q"),
        col("norm").as("n_norm"), col("c_label").as("list_label"))
    val probes = rankedCentroids(quantized(queries), cents).where(col("rn") <= nprobe)
      .select(col("vec_id").as("query_id"), col("q").as("q_q"),
        col("norm").as("q_norm"), col("c_label").as("list_label"))
    topKPerQuery(
      lists.join(broadcast(probes), Seq("list_label"))
        .where(col("n_id") =!= col("query_id"))
        .withColumn("cosine", cosineQ(col("q_q"), col("n_q"), col("q_norm"), col("n_norm"))),
      k)
  }

  /** [[ivfTopK]] across several nprobe values at once (the s16 tuning
    * sweep): the nprobe-INDEPENDENT structure — centroids, the
    * corpus's list assignment, the queries' ranked-centroid relation —
    * is computed once and checkpointed; each sweep point is only a
    * probe-rank filter plus the list equi-join. Output adds `nprobe`.
    */
  def ivfTopKSweep(corpus: DataFrame, queries: DataFrame, k: Int,
      nprobes: Seq[Int]): DataFrame = {
    require(nprobes.nonEmpty, "ivfTopKSweep: empty nprobe list")
    val cents = centroids(corpus)
    val lists = rankedCentroids(quantized(corpus), cents).where(col("rn") === 1)
      .select(col("vec_id").as("n_id"), col("q").as("n_q"),
        col("norm").as("n_norm"), col("c_label").as("list_label"))
      .localCheckpoint(true)
    val qRanked = rankedCentroids(quantized(queries), cents)
      .select(col("vec_id").as("query_id"), col("q").as("q_q"),
        col("norm").as("q_norm"), col("c_label").as("list_label"), col("rn"))
      .localCheckpoint(true)
    nprobes.map { np =>
      val probes = qRanked.where(col("rn") <= np).drop("rn")
      topKPerQuery(
        lists.join(broadcast(probes), Seq("list_label"))
          .where(col("n_id") =!= col("query_id"))
          .withColumn("cosine",
            cosineQ(col("q_q"), col("n_q"), col("q_norm"), col("n_norm"))),
        k).withColumn("nprobe", lit(np.toLong))
    }.reduce(_ unionByName _)
  }

  /** Maximal-marginal-relevance re-rank: retrieve a `poolSize` pool per
    * query (exact brute force — the expensive, corpus-wide stage), then
    * greedily pick `k` items maximizing
    * `0.5·relevance − 0.5·max_similarity_to_already_picked` — the
    * standard diversified-retrieval step a training pipeline runs so k
    * near-duplicate contexts don't fill the whole window.
    *
    * The greedy loop is UNROLLED INTO THE PLAN: each of the k steps is
    * a window argmax plus two joins over pool-sized relations
    * (#queries × poolSize rows — broadcast-scale by construction, like
    * every model state in this file), so nothing is collected to the
    * driver. The corpus appears in exactly TWO pruned columnar scans —
    * the pool scoring pass and the candidate-vector attach (a
    * broadcast join on pool ids) — a deliberate trade: carrying
    * vectors through the pool stage would fatten its corpus-sized
    * top-k exchange with the embedding arrays, which costs more than
    * a second pushed-down scan that reads only the id and embedding
    * columns.
    *
    * Every step is materialized with an eager `localCheckpoint`:
    * a k-step DataFrame loop whose state feeds both the output AND the
    * next state otherwise re-expands its whole lineage at every
    * reference — the plan grows multiplicatively and the corpus gets
    * re-scanned per step (the iterative-plan trap; same discipline as
    * connectedComponents' checkpoints). The checkpointed relations are
    * pool-sized, so the materializations are trivial; the two corpus
    * scans above are the only data-proportional work.
    * Pick 1 is pure relevance; its mmr_score is defined as relevance
    * (empty selected set ⇒ no penalty term), which the oracle states
    * identically. Ties break on neighbor id everywhere. Scores stay on
    * the quantized-integer grid until the one shared double-division
    * sequence (cosineQ), so the whole greedy trajectory — argmax
    * decisions included — replays bit-identically in SQL.
    */
  def mmrRerank(corpus: DataFrame, queries: DataFrame, poolSize: Int,
      k: Int): DataFrame = {
    require(k >= 1 && poolSize >= k, s"need poolSize >= k >= 1: $poolSize, $k")
    val cands = bruteForceTopK(corpus, queries, poolSize)
      .select(col("query_id"), col("neighbor_id").as("n_id"),
        col("cosine").as("rel"))
      .localCheckpoint(true)
    def argmax(df: DataFrame, score: Column): DataFrame = {
      val w = Window.partitionBy("query_id")
        .orderBy(col("__s").desc, col("n_id"))
      df.withColumn("__s", score)
        .withColumn("__rn", row_number().over(w)).where(col("__rn") === 1)
    }
    val p1 = argmax(cands, col("rel"))
      .select(col("query_id"), col("n_id"), lit(1L).as("pick"),
        col("rel"), col("__s").as("mmr_score"))
    if (k == 1)
      // no penalty term exists for a single pick — return before the
      // (now-eager) vector attach / pairwise sims run for nothing
      return p1.select(col("query_id"), col("pick"),
        col("n_id").as("neighbor_id"), col("rel"), col("mmr_score"))
    // attach candidate vectors (one broadcast-semi pass over the
    // corpus), then pairwise sims within each query's pool — both
    // directions, so the greedy joins are plain equi-joins
    val cvec = corpus
      .select(col("vec_id"), quantize(col("embedding")).as("q"))
      .withColumn("nn", normSqQ(col("q")))
      .join(broadcast(cands.select(col("query_id"),
        col("n_id").as("vec_id")).distinct()), Seq("vec_id"))
      .select(col("query_id"), col("vec_id").as("n_id"), col("q"), col("nn"))
      .localCheckpoint(true)
    val sims = cvec.as("a").join(cvec.as("b"),
        col("a.query_id") === col("b.query_id") &&
          col("a.n_id") =!= col("b.n_id"))
      .select(col("a.query_id").as("query_id"), col("a.n_id").as("id_a"),
        col("b.n_id").as("id_b"),
        cosineQ(col("a.q"), col("b.q"), col("a.nn"), col("b.nn")).as("sim"))
      .localCheckpoint(true)
    // sims keyed for the greedy joins: (query_id, n_id = remaining
    // candidate, sel_id = newest pick) -> sim
    val simsKeyed = sims.select(col("query_id"), col("id_a").as("n_id"),
      col("id_b").as("sel_id"), col("sim"))
    var picks = p1
    // state: remaining pool rows with the running max similarity to
    // the picked set; each step retires the newest pick and folds its
    // sims in via greatest()
    var state = cands
      .join(p1.select(col("query_id"), col("n_id").as("sel_id")), Seq("query_id"))
      .where(col("n_id") =!= col("sel_id"))
      .join(simsKeyed, Seq("query_id", "n_id", "sel_id"))
      .select(col("query_id"), col("n_id"), col("rel"),
        col("sim").as("maxsim"))
      .localCheckpoint(true)
    for (i <- 2 to k) {
      val pi = argmax(state, lit(0.5) * col("rel") - lit(0.5) * col("maxsim"))
        .select(col("query_id"), col("n_id"), lit(i.toLong).as("pick"),
          col("rel"), col("__s").as("mmr_score"))
      picks = picks.unionByName(pi)
      if (i < k) {
        // truncate before the next step: `state` feeds both the pick
        // and the next state, and `pi` both the output and the retire
        // join — without the checkpoint the lineage doubles per step
        state = state
          .join(pi.select(col("query_id"), col("n_id").as("sel_id")), Seq("query_id"))
          .where(col("n_id") =!= col("sel_id"))
          .join(simsKeyed.withColumnRenamed("sim", "sim2"),
            Seq("query_id", "n_id", "sel_id"))
          .select(col("query_id"), col("n_id"), col("rel"),
            greatest(col("maxsim"), col("sim2")).as("maxsim"))
          .localCheckpoint(true)
      }
    }
    picks.select(col("query_id"), col("pick"), col("n_id").as("neighbor_id"),
      col("rel"), col("mmr_score"))
  }

  /** Johnson–Lindenstrauss random projection to `outDim` dimensions
    * with a deterministic ±1 sign matrix (Achlioptas 2001's database-
    * friendly projection): out_j = Σ_i sign(i,j)·x_i. The standard
    * pre-step before clustering / ANN when the native dimension is
    * wide — distances are preserved within (1±ε) for outDim =
    * O(log n / ε²), at 1/dim the storage and flops.
    *
    * DETERMINISM: sign(i,j) = +1 iff the first hex char of
    * md5("i:j") < '8' (top bit of the digest clear) — derivable
    * identically in any engine with md5; the per-vector sum is an
    * ordered index fold (zip_with then left fold from 0.0), so the
    * projected doubles are bit-reproducible (the t14 house rules).
    * The sign matrix is outDim×dim BOOLEANS of driver-side literal —
    * model state in the plan like s08's centroids, broadcast free.
    *
    * Scale shape: pure per-row column math over one corpus scan — no
    * shuffle at all; the projection composes with every downstream
    * s-family operator (cluster on p*, ANN on p*).
    *
    * `dim` must equal the embedding array length (checked per row:
    * a mismatched row would silently project nulls, so it
    * raise_errors instead).
    */
  def randomProjection(emb: DataFrame, idCol: String, vecCol: String,
      dim: Int, outDim: Int = 16): DataFrame = {
    require(dim >= 1 && outDim >= 1, s"dim/outDim must be >= 1, got $dim/$outDim")
    val md = java.security.MessageDigest.getInstance("MD5")
    def sign(i: Int, j: Int): Double = {
      val d = md.digest(s"$i:$j".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      if ((d(0) & 0x80) == 0) 1.0 else -1.0
    }
    // the null case must be EXPLICIT: size(null) is null, so a plain
    // `size =!= dim` condition is null (not true) for a NULL embedding
    // and would silently project null p* columns — the exact failure
    // this guard exists to prevent
    val guarded = when(col(vecCol).isNull || size(col(vecCol)) =!= dim,
      raise_error(concat(lit(s"randomProjection: expected dim $dim, got "),
        coalesce(size(col(vecCol)).cast("string"), lit("NULL vector")))))
      .otherwise(col(vecCol))
    val projCols = (0 until outDim).map { j =>
      val sLit = array((0 until dim).map(i => lit(sign(i, j))): _*)
      aggregate(
        zip_with(guarded, sLit, (x, s) => x.cast("double") * s),
        lit(0.0), (acc, x) => acc + x).as(s"p$j")
    }
    emb.select(col(idCol) +: projCols: _*)
  }

  /** Exact maximum-inner-product top-k (s19) with norm-band pruning —
    * the retrieval objective when vectors are NOT normalized (learned
    * sparse/dense retrievers score by raw dot product; cosine top-k
    * is the wrong answer there). Scores are exact integer dots over
    * quantized vectors ([[graft.functions.VectorFunctions.dotQ]]), so
    * the result hash-matches a brute-force oracle bit-for-bit.
    *
    * The pruning is the classic Cauchy–Schwarz bound, made exact in
    * integers: dot(q, x)² ≤ |q|²·|x|². The corpus is banded by
    * floor(log₂(|x|²)); a SEED pass scores only the highest-norm
    * bands holding ≥ `seedMul`·k vectors and collects each query's
    * provisional kth-best dot t (a |Q|-row driver scalar — the
    * bounded-collect discipline). A remaining band with max norm M
    * can then be skipped for query q iff t > 0 and M·|q|² < t² —
    * every dot inside is provably below the incumbent top-k, and a
    * TIED dot is never pruned (strict <), so the deterministic
    * (dot desc, id) tie-break survives. Surviving (query, band) pairs
    * are a small broadcast relation; the second pass scans only those
    * bands. On real embedding corpora norms concentrate: most bands
    * prune for most queries and the scan cost approaches the seed
    * pass alone, while the worst case degrades gracefully to s01's
    * full broadcast scan — never worse, exactly equal output.
    *
    * Output: (query_id, rank, neighbor_id, dot) — dot in quantized
    * integer units (milliunit² per dimension).
    */
  def mipsTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      seedMul: Int = 4, maxQueryRows: Long = 1L << 20): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(seedMul >= 1, s"seedMul must be >= 1, got $seedMul")
    require(maxQueryRows >= 1, s"maxQueryRows must be >= 1, got $maxQueryRows")
    // ENFORCE the bounded-collect contract the scaladoc states: the
    // per-query thresholds, norms and band-survivor list all live on
    // the driver at |Q| (×bands) rows — a corpus-sized `queries` input
    // must fail loudly here, not as a silent driver OOM three collects
    // later (the containment-guard discipline)
    // probe one row past the budget, saturating at Int.MaxValue: a
    // naive (maxQueryRows + 1).toInt wraps for budgets >= Int.MaxValue
    // (negative limit, or a silent limit(1) at 1L<<32) — exactly
    // defeating the OOM guard this probe enforces
    val probe = math.min(maxQueryRows + 1, Int.MaxValue.toLong).toInt
    val nQ = queries.limit(probe).count()
    if (nQ > maxQueryRows)
      throw new IllegalStateException(
        s"mipsTopK: query relation exceeds the $maxQueryRows-row driver " +
          "budget (per-query thresholds and band survivors are collected). " +
          "Split the query set, or swap roles if the corpus is the small " +
          "side — the operator's state is |Q|-bounded by design.")
    val c = corpus.select(col("vec_id").as("n_id"),
        quantize(col("embedding")).as("n_q"))
      .withColumn("n_norm", normSqQ(col("n_q")))
      .withColumn("band",
        floor(log2(col("n_norm").cast("double") + 1.0)).cast("int"))
      .localCheckpoint(true)
    val q = queries.select(col("vec_id").as("query_id"),
        quantize(col("embedding")).as("q_q"))
      .withColumn("q_norm", normSqQ(col("q_q")))
      .localCheckpoint(true)
    // band histogram: ≤ 64 rows (log₂ of a BIGINT norm) — driver-safe
    val bands = c.groupBy("band")
      .agg(count(lit(1)).as("cnt"), max("n_norm").as("max_norm"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy(-_._1)
    val need = k.toLong * seedMul
    val seedBands = {
      var cum = 0L
      bands.takeWhile { b => val take = cum < need; cum += b._2; take }
        .map(_._1).toSet
    }
    def scored(cand: DataFrame): DataFrame =
      cand.join(broadcast(q), col("n_id") =!= col("query_id"))
        .withColumn("dot", dotQ(col("q_q"), col("n_q")))
    val seed = scored(c.where(col("band").isInCollection(seedBands)))
      .localCheckpoint(true)
    // per-query incumbent: the kth-best seed dot (or the worst seed
    // dot when the seed holds < k candidates — a weaker but still
    // correct bound); |Q| rows to the driver
    val wk = Window.partitionBy(col("query_id"))
      .orderBy(col("dot").desc, col("n_id"))
    val thresholds = seed.withColumn("__rk", row_number().over(wk))
      .where(col("__rk") <= k)
      .groupBy("query_id")
      .agg(min(col("dot")).as("t"), count(lit(1)).as("n_seen"))
      .collect()
      .map(r => (r.get(0), (r.getLong(1), r.getLong(2)))).toMap
    // surviving (query, band) pairs: Cauchy–Schwarz in exact BIGINTs.
    // An under-filled seed (n_seen < k, including a query with NO seed
    // candidate at all) keeps every band — the bound only holds once
    // k candidates are in hand.
    val qNorms = q.select("query_id", "q_norm").collect()
      .map(r => (r.get(0), r.getLong(1)))
    val survivors = for {
      (qid, qn) <- qNorms.toSeq
      (band, _, maxNorm) <- bands if !seedBands.contains(band)
      (t, nSeen) = thresholds.getOrElse(qid, (Long.MinValue, 0L))
      if nSeen < k || t <= 0L ||
        BigInt(maxNorm) * BigInt(qn) >= BigInt(t) * BigInt(t)
    } yield (qid, band)
    val full = if (survivors.isEmpty) seed else {
      val spark = corpus.sparkSession
      import org.apache.spark.sql.types._
      val pairSchema = StructType(Seq(
        StructField("query_id", q.schema("query_id").dataType),
        StructField("band", IntegerType)))
      val pairDf = spark.createDataFrame(
        spark.sparkContext.parallelize(
          survivors.map(p => org.apache.spark.sql.Row(p._1, p._2)), 1),
        pairSchema)
      // the second scan joins candidates to ONLY their surviving
      // queries: band equi-join first (prunes the corpus), then the
      // usual broadcast-query score restricted to that query id
      val cand2 = c.join(broadcast(pairDf), Seq("band"))
      val sc2 = cand2.join(broadcast(q), Seq("query_id"))
        .where(col("n_id") =!= col("query_id"))
        .withColumn("dot", dotQ(col("q_q"), col("n_q")))
        .select(seed.columns.map(col): _*)
      seed.unionByName(sc2)
    }
    full.withColumn("rank", row_number().over(wk).cast("long"))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("n_id").as("neighbor_id"),
        col("dot"))
  }
}
