package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators (SURVEY §2C): exact, MinHash-LSH, SimHash,
  * n-gram Jaccard, embedding-cosine. Designed scale-first:
  *
  *  - exact dedup = one hash-shuffle groupBy (map-side partial agg);
  *  - MinHash/SimHash candidate generation = equi-joins on band/bucket
  *    keys (never an all-pairs theta join), so cost is Σ bucket² not N²;
  *  - signatures are built from codegen'd higher-order functions over
  *    arrays — no UDFs, no driver involvement;
  *  - all hashes derive from md5 of the content (identical in the DuckDB
  *    oracle), with (a*h+b) mod p permutations whose params are literals
  *    shared between the Spark plan and the generated oracle SQL.
  */
object Dedup {

  // --- exact ---------------------------------------------------------------

  /** Exact content dedup: canonical row = min id per normalized-text
    * hash. Returns (fingerprint, canonical_id, n_copies).
    */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(TextAnalysis.fingerprintMd5(col(textCol)).as("fingerprint"))
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("n_copies"))

  /** Incremental exact dedup — the settle step of a daily pipeline:
    * from `batch`, keep one canonical row per fingerprint (min id,
    * with its in-batch copy count) and drop every fingerprint `history`
    * already holds. One map-side-combined groupBy over the batch plus
    * one left ANTI join against history's distinct fingerprints.
    *
    * Scale shape: history enters as (textCol) rows here for oracle
    * parity, but at 100 TB a pipeline persists yesterday's FINGERPRINT
    * relation and feeds it straight in — the anti join then shuffles
    * only the new batch (small) against a pre-aggregated key set, and
    * the d08 Bloom pre-filter upstream has already discarded the bulk
    * of known content without any shuffle at all.
    *
    * Returns (fingerprint, canonical_id, n_copies) for surviving rows.
    */
  def incrementalNew(batch: DataFrame, history: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val hist = history
      .select(TextAnalysis.fingerprintMd5(col(textCol)).as("fingerprint"))
      .distinct()
    exactGroups(batch, idCol, textCol).join(hist, Seq("fingerprint"), "left_anti")
  }

  // --- MinHash LSH ---------------------------------------------------------

  /** Fixed permutation params (a*h + b) mod P; a,b < 2^20 so a*h stays
    * within Long for 32-bit base hashes. 16 hashes = 4 bands x 4 rows.
    */
  val MinHashP: Long = 4294967311L // prime > 2^32
  val minHashParams: Seq[(Long, Long)] = Seq(
    (7919L, 104729L), (12553L, 24593L), (104729L, 7919L), (49157L, 98317L),
    (3079L, 6151L), (196613L, 786433L), (389L, 1543L), (769L, 334214L),
    (24593L, 49157L), (6151L, 12289L), (786433L, 196613L), (1543L, 389L),
    (98317L, 3079L), (12289L, 24571L), (334214L, 769L), (24571L, 12553L))
  val Bands = 4
  val Rows = 4
  val ShingleK = 8

  /** 32-bit base hash of a string: first 8 md5 hex chars as an integer
    * (identical in DuckDB: ('0x' || substr(md5(s),1,8))::BIGINT).
    */
  def md5Hash32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** Stride between sampled shingle start positions: hashing per shingle
    * is the dominant LSH cost; overlapping shingles at every 2nd position
    * retain near-dup recall at half the hashing (standard shingling
    * practice). The oracle SQL uses the same stride.
    */
  val ShingleStride = 2

  /** Character k-shingle base hashes of a text column (docs shorter than
    * k get one saturated shingle; chars past the end contribute 0).
    *
    * One fused codegen'd pass (ShingleHash32 — polynomial mod 2^32, same
    * arithmetic stated literally in the oracle SQL): replaces the
    * md5-per-shingle formulation whose digest+hex+parse per position was
    * the measured d02 cost floor.
    */
  def shingleHashes(text: Column, k: Int = ShingleK): Column =
    graft.functions.TextHashExpressions.shingle_hash32(text, k, ShingleStride)

  /** MinHash signature: array of minHashParams.size minima. */
  def minHashSignature(shingles: Column): Column =
    array(minHashParams.map { case (a, b) =>
      array_min(transform(shingles, h => (h * a + b) % MinHashP))
    }: _*)

  /** (id, band_idx, band_key) rows — the LSH bucketing relation.
    * Shingle hashes are materialized as a column FIRST: inlining them
    * into the 16 permutation minima would re-evaluate md5 per
    * permutation (16x the dominant cost — measured 82s -> ~5s at sf0.1).
    */
  /** The (band_idx, band_key) structs of a signature column — ONE
    * definition shared by [[bandKeys]] and [[minhashEstimateVsExact]],
    * so the estimator's candidate set can never drift from the
    * production dedup's band layout.
    */
  private def sigBands(sig: Column): Column =
    array((0 until Bands).map { bi =>
      struct(lit(bi).as("band_idx"),
        concat_ws("_", (1 to Rows).map(r => element_at(sig, bi * Rows + r)): _*).as("band_key"))
    }: _*)

  def bandKeys(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val withSig = docs
      .select(col(idCol).as("id"), shingleHashes(col(textCol)).as("hs"))
      .select(col("id"), minHashSignature(col("hs")).as("sig"))
    withSig.select(col("id"), explode(sigBands(col("sig"))).as("b"))
      .select(col("id"), col("b.band_idx"), col("b.band_key"))
  }

  /** Candidate near-dup pairs: ids sharing any band bucket (id_a < id_b).
    * One shuffle on (band_idx, band_key); never an all-pairs join.
    */
  def minHashCandidatePairs(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val bands = bandKeys(docs, idCol, textCol)
    val a = bands.as("a")
    val b = bands.as("b")
    a.join(b, col("a.band_idx") === col("b.band_idx") &&
        col("a.band_key") === col("b.band_key") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
  }

  /** Incremental near-dup candidates — d09's settle pattern applied to
    * the LSH index: `historyBands` is the persisted [[bandKeys]]
    * relation of everything previously indexed (the index IS the
    * state, like d09's fingerprint keys and t15's postings), and a new
    * batch produces exactly the candidate pairs that TOUCH it —
    * batch×history via one equi-join on the band bucket, plus
    * batch×batch. History×history pairs are already known from prior
    * runs and are never recomputed, so the per-batch cost is
    * batch-sized band rows joining a bucket-partitioned index: refresh
    * ∝ batch, the corpus never rescanned. Spec/oracle contract: equal
    * to `minHashCandidatePairs(history ∪ batch)` restricted to pairs
    * with at least one batch member (d16 states it as SQL).
    *
    * The caller appends the batch's band rows to the index afterwards
    * (idempotent per-batch-id dirs — the [[graft.streaming]] layout);
    * ids must be unique across history and batch (exact-dedup first).
    */
  def incrementalMinHashCandidates(historyBands: DataFrame, batch: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    // two consumers (the probe join and the in-batch self-join) — one
    // banding pass
    val nb = bandKeys(batch, idCol, textCol).localCheckpoint(true)
    val probe = nb.as("a").join(historyBands.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_key") === col("b.band_key") &&
          col("a.id") =!= col("b.id"))
      .select(least(col("a.id"), col("b.id")).as("id_a"),
        greatest(col("a.id"), col("b.id")).as("id_b"))
    val inBatch = nb.as("a").join(nb.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_key") === col("b.band_key") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
    probe.unionByName(inBatch).distinct()
  }

  /** Incremental cluster maintenance — the settle pattern completed:
    * given the PERSISTED label relation of everything clustered so far
    * (`historyLabels`: (id, label), labels = component min ids, the
    * [[connectedComponents]] invariant) and a batch's new candidate
    * edges (from [[incrementalMinHashCandidates]]: every edge touches
    * the batch), produce the updated label relation WITHOUT re-running
    * CC over history. The algebra is union-find contraction lifted to
    * relations: each new edge's endpoints are replaced by their current
    * labels (batch nodes not in history lift to themselves), CC runs on
    * that LABEL graph — batch-edge-sized, orders of magnitude smaller
    * than the corpus graph — and the resulting old-label → new-label
    * map joins back: history relabels by one broadcast-sized equi-join
    * on `label` (only touched labels move), batch nodes take their
    * mapped label or themselves. Because old labels are component
    * minima, the label-graph minimum of a merged set IS the global
    * minimum of the merged component, so the output is exactly
    * `connectedComponents(allPairs(history ∪ batch))` — the d17 oracle
    * states that equality over the full corpus.
    *
    * Nodes covered: history nodes ∪ batch edge endpoints (the same
    * paired-nodes-only coverage the batch operator has; a batch doc
    * with no candidate edge has no cluster to join). Refresh cost ∝
    * batch edges; history×history never recomputes.
    */
  def incrementalClusters(historyLabels: DataFrame,
      newEdges: DataFrame): DataFrame = {
    val lifted = newEdges
      .join(historyLabels.select(col("id").as("__ia"), col("label").as("__la")),
        col("id_a") === col("__ia"), "left")
      .join(historyLabels.select(col("id").as("__ib"), col("label").as("__lb")),
        col("id_b") === col("__ib"), "left")
      .select(coalesce(col("__la"), col("id_a")).as("la"),
        coalesce(col("__lb"), col("id_b")).as("lb"))
      .where(col("la") =!= col("lb"))
      .select(least(col("la"), col("lb")).as("id_a"),
        greatest(col("la"), col("lb")).as("id_b"))
      .distinct()
      // two consumers below (the remap join and batch-node labeling)
      // plus the CC iteration — pin the lift once
      .localCheckpoint(true)
    val labelMap = connectedComponents(lifted)
    val histUpdated = historyLabels
      .join(labelMap.select(col("id").as("__ol"), col("label").as("__nl")),
        col("label") === col("__ol"), "left")
      .select(col("id"), coalesce(col("__nl"), col("label")).as("label"))
    val batchNodes = newEdges.select(col("id_a").as("id"))
      .unionByName(newEdges.select(col("id_b").as("id"))).distinct()
      .join(historyLabels.select("id"), Seq("id"), "left_anti")
    val batchLabeled = batchNodes
      .join(labelMap.withColumnRenamed("label", "__bl"), Seq("id"), "left")
      .select(col("id"), coalesce(col("__bl"), col("id")).as("label"))
    histUpdated.unionByName(batchLabeled)
  }

  /** MinHash estimator accuracy, measured in-engine (d18): for every
    * band-candidate pair, the Jaccard ESTIMATE (matching signature
    * positions / signature length — the quantity LSH theory says
    * concentrates around true Jaccard) next to the EXACT shingle-set
    * Jaccard and the absolute error. This is the tuning view for the
    * (bands, rows) knobs: the error distribution tells you whether the
    * signature is long enough for the dedup threshold in force, BEFORE
    * a 100 TB run commits to it — and it's fully deterministic (fixed
    * hash permutations, rational arithmetic), so the oracle replays it
    * bit-for-bit.
    *
    * One shingle pass feeds all three uses (signature, band pairs,
    * exact sets — checkpointed); the exact intersect runs only on
    * candidate pairs, never all pairs.
    */
  def minhashEstimateVsExact(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val sigLen = Bands * Rows
    val base = docs
      .select(col(idCol).as("id"), shingleHashes(col(textCol)).as("hs"))
      .select(col("id"), minHashSignature(col("hs")).as("sig"),
        array_distinct(col("hs")).as("st"))
      .localCheckpoint(true)
    val bandRows = base.select(col("id"), explode(sigBands(col("sig"))).as("b"))
      .select(col("id"), col("b.band_idx"), col("b.band_key"))
    val pairs = bandRows.as("a").join(bandRows.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_key") === col("b.band_key") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    val sa = base.select(col("id").as("id_a"), col("sig").as("sig_a"),
      col("st").as("st_a"))
    val sb = base.select(col("id").as("id_b"), col("sig").as("sig_b"),
      col("st").as("st_b"))
    pairs.join(sa, Seq("id_a")).join(sb, Seq("id_b"))
      .withColumn("est_matches",
        aggregate(zip_with(col("sig_a"), col("sig_b"),
          (x, y) => when(x === y, 1L).otherwise(0L)),
          lit(0L), (acc, v) => acc + v))
      .withColumn("inter",
        size(array_intersect(col("st_a"), col("st_b"))).cast("long"))
      .withColumn("na", size(col("st_a")).cast("long"))
      .withColumn("nb", size(col("st_b")).cast("long"))
      .select(col("id_a"), col("id_b"), col("est_matches"),
        (col("est_matches").cast("double") / lit(sigLen.toDouble))
          .as("est_jaccard"),
        (col("inter").cast("double") /
          (col("na") + col("nb") - col("inter")).cast("double"))
          .as("exact_jaccard"))
      .withColumn("est_error", abs(col("est_jaccard") - col("exact_jaccard")))
  }

  // --- near-dup clustering ---------------------------------------------------

  /** Partition-local union-find pre-contraction: each edge partition is
    * collapsed to the star edges of its own spanning forest (one
    * `node -> partition-local root` edge per non-root node). The union
    * of those stars across partitions connects exactly what the
    * original edges connect, so downstream components are IDENTICAL —
    * but every path that fits inside one partition collapses to depth
    * <= 2 before the distributed iteration starts. Typical corpora
    * resolve most edges locally, so the iteration — whose cost at small
    * SF is per-action scheduling latency × rounds, not shuffle bytes —
    * converges in a fraction of the rounds. The union-find state is
    * bounded by one partition's node count (a ~128 MB edge partition on
    * a cluster), never the graph.
    *
    * Ids stay generic (long or string): the pass runs on `RDD[Row]`
    * with hash-equality union-find — no Encoder, no assumed id type.
    * The root of each local set is its MINIMUM id (unions attach the
    * larger root under the smaller): components are invariant to root
    * choice, but min-roots let [[connectedComponents]] seed its labels
    * straight from the star edges — a fully-local cluster then enters
    * the distributed iteration ALREADY at its fixpoint, so the first
    * convergence check can succeed immediately instead of running two
    * propagation rounds to rediscover what the contraction knew.
    */
  private def localContract(pairs: DataFrame): DataFrame = {
    val two = pairs.select("id_a", "id_b")
    // ids within one pair relation share a runtime type; Long is the
    // common case, anything else falls back to string comparison
    def lt(a: Any, b: Any): Boolean = (a, b) match {
      case (x: Long, y: Long)     => x < y
      case (x: Int, y: Int)       => x < y
      case (x: String, y: String) => x < y
      case _                      => String.valueOf(a) < String.valueOf(b)
    }
    val contracted = two.rdd.mapPartitions { it =>
      val parent = new java.util.HashMap[Any, Any]()
      def find(x: Any): Any = {
        var r = x
        while ({ val p = parent.get(r); p != null && p != r }) r = parent.get(r)
        if (parent.get(r) == null) parent.put(r, r)
        // path compression keeps the in-partition pass near-linear
        var c = x
        while (c != r) { val n = parent.get(c); parent.put(c, r); c = n }
        r
      }
      it.foreach { row =>
        val ra = find(row.get(0))
        val rb = find(row.get(1))
        if (ra != rb) {
          if (lt(ra, rb)) parent.put(rb, ra) else parent.put(ra, rb)
        }
      }
      val nodes = parent.keySet().toArray
      nodes.iterator.flatMap { node =>
        val r = find(node)
        if (r == node) Iterator.empty
        else Iterator(org.apache.spark.sql.Row(r, node))
      }
    }
    pairs.sparkSession.createDataFrame(contracted, two.schema)
  }

  /** Connected components over an undirected pair relation
    * (id_a < id_b): label every node with the minimum id reachable from
    * it — the canonical document of its near-dup cluster. Edges first
    * pass through [[localContract]] (partition-local union-find), then
    * iterative min-label propagation (one join+agg per step,
    * `stepsPerCheck` steps per driver action), checkpoints to cut
    * lineage; converges in O(diameter of the CONTRACTED graph) steps —
    * near-dup clusters are shallow to begin with, and contraction
    * collapses any chain that fits in one edge partition. Deterministic
    * at the fixpoint regardless of iteration schedule.
    *
    * @param checkpointDir when set, lineage cuts go through RELIABLE
    *   checkpoints in this directory (HDFS/object-store path on a
    *   cluster): `localCheckpoint` pins blocks in executor storage, so
    *   losing one executor mid-iteration loses the computation — fine on
    *   local[n], not at a 100 TB backfill. When unset, keeps the cheap
    *   local default.
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 20,
      checkpointDir: Option[String] = None, stepsPerCheck: Int = 2): DataFrame = {
    require(stepsPerCheck >= 1, s"stepsPerCheck must be >= 1, got $stepsPerCheck")
    checkpointDir.foreach(pairs.sparkSession.sparkContext.setCheckpointDir)
    def cut(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint(true) else df.localCheckpoint(true)
    // materialize the contraction BEFORE symmetrizing: localContract's
    // star edges depend on row order within a partition (first-touched
    // root), so the two union branches must read one materialized result
    // — recomputing it per branch could orient the same edge two ways
    // and drop a node from the src side entirely
    val contracted = cut(localContract(pairs))
    val sym = cut(contracted.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionByName(contracted.select(col("id_b").as("src"), col("id_a").as("dst"))))
    // labels seeded FROM the contraction, not identity: id_a is the
    // partition-local minimum of its star, so every member starts at
    // its local root's id and every root at itself. Correctness: an
    // initial label is always an id inside the node's own component,
    // and the component minimum m keeps label m (m <= its roots in
    // every partition), so the min-label fixpoint is unchanged — but a
    // cluster whose edges sat in one partition starts CONVERGED, and
    // the first batched check can observe zero diffs immediately.
    var labels = cut(
      contracted.select(col("id_a").as("id"), col("id_a").as("label"))
        .unionByName(contracted.select(col("id_b").as("id"),
          least(col("id_a"), col("id_b")).as("label")))
        .groupBy("id").agg(min(col("label")).as("label")))
    // one min-label propagation step; the accumulated change flag rides
    // along in the select so several steps can share one convergence
    // action (no extra join against the previous round)
    def step(lbl: DataFrame): DataFrame = {
      val prop = sym.join(lbl.select(col("id").as("dst2"), col("label")),
          sym("dst") === col("dst2"))
        .groupBy(col("src").as("id"))
        .agg(min(col("label")).as("nlabel"))
      lbl.join(prop, Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nlabel"), col("label"))).as("label"),
          (col("__chg") ||
            coalesce(col("nlabel"), col("label")) < col("label")).as("__chg"))
    }
    var i = 0      // propagation steps taken
    var block = 0  // convergence actions taken
    var converged = false
    // the actual persisted object of the previous block — unpersist must
    // target it, not a projection over it (CacheManager matches plans by
    // sameResult; unpersisting a Project over the cached plan frees
    // nothing and would leak one cached label set per block)
    var pinned: DataFrame = null
    while (!converged && i < maxIter) {
      val k = math.min(stepsPerCheck, maxIter - i)
      var next = labels.withColumn("__chg", lit(false))
      (0 until k).foreach(_ => next = step(next))
      // ONE action per block of k steps: the diff count both
      // materializes `next` (persist) and decides convergence. Under
      // same-machine load the per-action job latency — not shuffle
      // volume — dominates at small SF, so checks are batched: the
      // worst case wastes k-1 no-op steps after the true fixpoint,
      // against a saved action every block. Checkpoint only every other
      // block to bound lineage without paying a write per block.
      val materialized =
        if (block % 2 == 1) cut(next)
        else { next.persist(); next }
      val diffs = materialized.where(col("__chg")).count()
      if (pinned ne null) pinned.unpersist()
      pinned = if (block % 2 == 1) null else materialized
      labels = materialized.drop("__chg")
      converged = diffs == 0
      i += k
      block += 1
    }
    // fail loudly rather than return split (wrong) clusters — a chain
    // longer than maxIter hops needs more steps
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter steps; raise maxIter")
    labels
  }

  /** Connected components WITHOUT materializing candidate pairs:
    * star-contract each LSH band bucket to its minimum member — a
    * bucket of m docs becomes m-1 (min, member) edges, which connect
    * exactly what the bucket's C(m,2) pair clique connects, so the
    * components are IDENTICAL to components over the pair relation and
    * the same oracle applies. A pathologically dense bucket costs m
    * rows here versus m² in the pair expansion: this is the clustering
    * form that survives skewed buckets at 100 TB.
    *
    * Buckets with fewer than 2 members connect nothing and are dropped
    * by the hub aggregation's count filter before any edge exists.
    * (Round 2 modeled buckets as graph NODES instead: correct, but it
    * dragged ~4 singleton memberships per doc through every CC round —
    * 49% of the whole bench. The star contraction keeps the O(m)
    * dense-bucket property with doc-only nodes and no synthetic
    * bucket-id space to guard.) Two non-hub members of a bucket sit 2
    * hops apart (member→hub→member), so propagation distances are
    * still up to 2× the pair-clique's — the default step budget stays
    * at 2× the pair form's; converged graphs stop early regardless,
    * so the larger budget costs nothing unless it is needed.
    *
    * The hub aggregation is a map-side-combining groupBy on the same
    * (band_idx, band_key) the membership join shuffles on, so the
    * exchange is reused; edges arrive with id_a < id_b by construction
    * (the hub is the bucket minimum).
    */
  def connectedComponentsOverBuckets(docs: DataFrame, idCol: String, textCol: String,
      maxIter: Int = 40, checkpointDir: Option[String] = None): DataFrame =
    connectedComponents(bucketStarEdges(docs, idCol, textCol), maxIter, checkpointDir)

  /** The star-contracted edge relation feeding
    * [[connectedComponentsOverBuckets]], exposed so plan tests can gate
    * its shape (hub aggregation sharing the membership join's
    * (band_idx, band_key) partitioning; no synthetic id generation).
    */
  def bucketStarEdges(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val bk = bandKeys(docs, idCol, textCol)
    val hubs = bk.groupBy("band_idx", "band_key")
      .agg(min(col("id")).as("hub"), count(lit(1)).as("members"))
      .where(col("members") >= 2)
      .select("band_idx", "band_key", "hub")
    bk.join(hubs, Seq("band_idx", "band_key"))
      .where(col("id") =!= col("hub"))
      .select(col("hub").as("id_a"), col("id").as("id_b"))
      .distinct()
  }

  // --- Bloom pre-filter ----------------------------------------------------

  /** Incremental dedup against a HISTORICAL corpus without joining it:
    * build a Bloom filter over the historical fingerprints (one
    * distributed aggregation, bits sized by `expectedItems`/`fpp`),
    * broadcast the megabyte-scale filter, and probe each incoming
    * document per-row. Bloom filters have NO false negatives — a true
    * duplicate always flags — so `probably_seen` is a safe PRE-FILTER:
    * only flagged documents need the exact confirmation join against
    * history, shrinking that join's probe side by roughly the novelty
    * rate. That is the shape that matters when history is 100 TB and
    * the daily increment is small: the big corpus is scanned once to
    * build the filter (or the filter is maintained incrementally) and
    * never shuffled per batch.
    *
    * The probe runs in `mapPartitions` over the broadcast sketch (same
    * pattern as the multimodal codec): the filter's bit layout is
    * Spark-internal, so this operator is envelope-checked
    * (`SketchEnvelopeSpec`) rather than DuckDB-oracle'd — zero false
    * negatives exactly, false-positive rate near `fpp`.
    *
    * `idCol` keeps its original type (string UUIDs included); a null
    * text yields a null fingerprint and `probably_seen = false` on the
    * incoming side, and is excluded from the historical filter — null
    * content has no meaningful identity to deduplicate on. Call
    * [[BloomProbe.release]] once `flags` is consumed to drop the
    * executor-side broadcast blocks (the value survives on the driver,
    * so a later re-use of `flags` transparently re-broadcasts).
    *
    * `flags` columns: (id, fingerprint, probably_seen).
    */
  final class BloomProbe(val flags: DataFrame,
      bcast: org.apache.spark.broadcast.Broadcast[org.apache.spark.util.sketch.BloomFilter]) {
    def release(): Unit = { bcast.unpersist(false); () }
  }

  def bloomSeenFlags(historical: DataFrame, incoming: DataFrame,
      idCol: String, textCol: String,
      expectedItems: Long, fpp: Double = 0.01): BloomProbe = {
    val spark = incoming.sparkSession
    val bf = historical
      .select(TextAnalysis.fingerprintMd5(col(textCol)).as("f"))
      .where(col("f").isNotNull) // null content has no identity (doc above)
      .stat.bloomFilter("f", expectedItems, fpp)
    val bcast = spark.sparkContext.broadcast(bf)
    val probe = incoming.select(col(idCol).as("id"),
      TextAnalysis.fingerprintMd5(col(textCol)).as("fingerprint"))
    val outSchema = org.apache.spark.sql.types.StructType(
      probe.schema.fields :+ org.apache.spark.sql.types.StructField(
        "probably_seen", org.apache.spark.sql.types.BooleanType, nullable = false))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    val flags = probe.mapPartitions { it =>
      val b = bcast.value
      it.map { r =>
        val f = if (r.isNullAt(1)) null else r.getString(1)
        org.apache.spark.sql.Row.fromSeq(
          r.toSeq :+ (f != null && b.mightContainString(f)))
      }
    }(enc)
    new BloomProbe(flags, bcast)
  }

  /** Deterministic Bloom geometry (d10): m bits, k md5-derived hash
    * positions per fingerprint. Shared with the oracle SQL — the whole
    * filter is a pure function of the corpus, so unlike the
    * engine-private sketch in [[bloomSeenFlags]] any engine can rebuild
    * it bit-for-bit and the membership flags hash-match exactly.
    */
  val BloomBits = 1 << 17
  val BloomHashes = 3

  /** Deterministic Bloom pre-filter: the filter is represented as the
    * RELATION of set bit positions — at most [[BloomBits]] rows after
    * `distinct` no matter how large `historical` is (positions live mod
    * m), so it broadcasts at any corpus size, exactly like the byte
    * array in [[bloomSeenFlags]] but engine-portable. Probe = explode k
    * positions per incoming fingerprint, broadcast-join against the set
    * bits, seen ⇔ all k hit. Zero false negatives by construction; the
    * false-positive rate is the standard (1-e^{-kn/m})^k.
    *
    * Null text ⇒ null fingerprint ⇒ null positions ⇒ never matches ⇒
    * `probably_seen = false`, and null content is excluded from the
    * filter build — same contract as [[bloomSeenFlags]].
    *
    * Returns (id, fingerprint, probably_seen).
    */
  def deterministicBloomFlags(historical: DataFrame, incoming: DataFrame,
      idCol: String, textCol: String,
      bits: Int = BloomBits, numHashes: Int = BloomHashes): DataFrame = {
    def positions(f: Column): Column = array((0 until numHashes).map { i =>
      pmod(md5Hash32(concat(lit(s"$i:"), f)), lit(bits.toLong))
    }: _*)
    val setBits = historical
      .select(TextAnalysis.fingerprintMd5(col(textCol)).as("f"))
      .where(col("f").isNotNull)
      .select(explode(positions(col("f"))).as("p"))
      .distinct()
      .withColumn("hit", lit(1))
    incoming
      .select(col(idCol).as("id"),
        TextAnalysis.fingerprintMd5(col(textCol)).as("fingerprint"))
      .select(col("id"), col("fingerprint"),
        explode(positions(col("fingerprint"))).as("p"))
      .join(broadcast(setBits), Seq("p"), "left")
      .groupBy("id", "fingerprint")
      .agg((count(col("hit")) === numHashes).as("probably_seen"))
  }

  // --- SimHash -------------------------------------------------------------

  val SimHashBits = 32
  val SimHashBands = 4 // 4 bands x 8 bits

  /** 32-bit SimHash over whitespace tokens: bit j = sign of
    * Σ_tokens (((h >> j) & 1) * 2 - 1). One fused codegen'd pass per
    * document (SimHash32Expr) — the signature needs no explode, no
    * per-token md5, and no 32-sum groupBy shuffle; the oracle computes
    * the identical votes set-oriented over exploded tokens.
    */
  def simHash(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("id"),
      graft.functions.TextHashExpressions.simhash32(col(textCol)).as("simhash"))

  /** Near-dup pairs with hamming distance <= maxHamming (default 3).
    * Candidate generation: equi-join on each of 4 8-bit bands — by
    * pigeonhole any pair within hamming 3 of 32 bits agrees exactly on
    * at least one band, so recall is 1.0 while bucket sizes stay
    * O(N / 2^8) per band; never an all-pairs join.
    */
  def simHashPairs(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val sh = simHash(docs, idCol, textCol)
    val bands = sh.select(col("id"), col("simhash"),
      explode(array((0 until SimHashBands).map { bi =>
        struct(lit(bi).as("band_idx"),
          shiftright(col("simhash"), bi * 8).bitwiseAND(255).as("band_key"))
      }: _*)).as("b"))
      .select(col("id"), col("simhash"), col("b.band_idx"), col("b.band_key"))
    val a = bands.as("a"); val b = bands.as("b")
    a.join(b, col("a.band_idx") === col("b.band_idx") &&
        col("a.band_key") === col("b.band_key") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.simhash").as("sh_a"), col("b.simhash").as("sh_b"))
      .distinct()
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).cast("long"))
      .where(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  // --- n-gram Jaccard ------------------------------------------------------

  /** Bigrams occurring in more than this many documents of a block are
    * dropped before pair generation (stop-gram removal): a gram shared
    * by df documents contributes C(df,2) intersection rows, so common
    * vocabulary dominates cost while contributing nothing to near-dup
    * discrimination. Jaccard is computed over the filtered gram sets
    * (the oracle applies the identical rule).
    */
  val NgramMaxDocFreq = 10

  /** Word-bigram Jaccard similarity between documents sharing a blocking
    * key (e.g. source): explode distinct bigrams, drop stop-grams,
    * equi-join inside the block, |A∩B| via count,
    * Jaccard = inter / (|A| + |B| - inter).
    *
    * Bigrams are reduced to 32-bit hashes (md5Hash32, identical in the
    * oracle) BEFORE the distinct/df/intersect joins: the self-join within
    * dense blocks is the cost center, and shuffling an 8-byte long
    * instead of a ~15-byte string roughly halves every exchange on the
    * path. A hash collision merges two grams in BOTH engines alike, so
    * results stay oracle-exact; the Jaccard over hashed gram sets is the
    * standard approximation.
    */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      blockCol: String, minJaccard: Double): DataFrame = {
    // per-doc dedup happens BEFORE the explode (array_distinct on the
    // hashed gram array): (id, g) rows leave the scan already unique, so
    // no cluster-wide distinct() shuffle of every gram instance is
    // needed. Gram hashing is the fused BigramHash32 pass (the md5
    // formulation paid digest+hex+parse per gram).
    val allGrams = docs.select(col(idCol).as("id"), col(blockCol).as("blk"),
        col(textCol).as("t"))
      .where(size(split(col("t"), " ")) >= 2)
      .select(col("id"), col("blk"),
        explode(array_distinct(
          graft.functions.TextHashExpressions.bigram_hash32(col("t")))).as("g"))
    val rare = allGrams.groupBy("blk", "g").agg(count(lit(1)).as("df"))
      .where(col("df") <= NgramMaxDocFreq)
      .select("blk", "g")
    val grams = allGrams.join(rare, Seq("blk", "g"), "left_semi")
    val sizes = grams.groupBy("id").agg(count(lit(1)).as("n"))
    // |A∩B| WITHOUT a grams x grams self-join: after the df filter every
    // (blk, g) bucket holds <= NgramMaxDocFreq docs, so collect the
    // bucket's id set (bounded — safe to materialize) and expand its
    // C(df,2) ordered pairs with array combinatorics. Same math as the
    // equi-join formulation (the oracle keeps that form), but the
    // biggest exchange on the path — re-shuffling the gram relation
    // twice to join it with itself — disappears; the collect_set groupBy
    // shares the semi-join's (blk, g) partitioning.
    val buckets = grams.groupBy("blk", "g")
      .agg(sort_array(collect_set(col("id"))).as("ids"))
      .where(size(col("ids")) >= 2)
    val inter = buckets.select(explode(expr(
        "flatten(transform(ids, (x, i) -> " +
          "transform(slice(ids, i + 2, size(ids) - i - 1), " +
          "y -> struct(x AS id_a, y AS id_b))))")).as("p"))
      .select(col("p.id_a"), col("p.id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n", "n_a"), "id_a")
      .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n", "n_b"), "id_b")
      .withColumn("jaccard", col("inter") / (col("n_a") + col("n_b") - col("inter")).cast("double"))
      .where(col("jaccard") >= minJaccard)
      .select("id_a", "id_b", "jaccard")
  }

  /** EXACT set-similarity join via prefix filtering (the AllPairs /
    * PPJoin family): every pair with token-set Jaccard >= tau is
    * found — no blocking key, no df cap, no false negatives, unlike
    * [[ngramJaccardPairs]] whose rare-gram filter deliberately trades
    * recall for fan-out. The filter theorem: order the vocabulary
    * globally (here by ascending document frequency, ties by token —
    * rarest first); if |A∩B| / |A∪B| >= tau then A and B MUST share at
    * least one token among each one's first n - ceil(tau·n) + 1 tokens
    * in that order, so an inverted index over PREFIX tokens alone
    * yields a complete candidate set. Why it scales: candidate
    * generation fans out per prefix token by its df among prefixes —
    * and the global order puts the rarest tokens first, so prefixes
    * are made of exactly the tokens with the smallest fan-out; the
    * hot head of the vocabulary sorts last and almost never enters a
    * prefix. Verification re-joins only candidate pairs against the
    * token relation (co-partitioned on id). The threshold compare is
    * pure integer cross-multiplication (inter·tauDen >= union·tauNum);
    * the one double division only FORMATS the already-accepted
    * jaccard, so both engines decide membership identically.
    *
    * `tokens` picks the set universe. The whitespace default suits
    * natural text; for bag-of-few-words corpora word SETS degenerate
    * (most docs share most of a small vocabulary, so nearly every
    * pair passes tau) — pass an order-sensitive tokenizer such as
    * shingle hashes and the same filter isolates true near-dups.
    *
    * COST MODEL, stated honestly: candidate volume is
    * Σ_prefix-tokens C(df_among_prefixes, 2). On high-entropy corpora
    * (real text) rare tokens have bounded df and this is near-linear;
    * on LOW-entropy corpora every token's df grows with the corpus
    * and the exact join is inherently quadratic — no exact algorithm
    * escapes that (the qualifying-pair count itself can be linear
    * while candidates are quadratic). tau is the caller's knob: the
    * prefix is the (1 − tau) fraction of each set, so candidate
    * volume scales ~(1 − tau)², and a near-dup threshold of 9/10
    * costs ~1/16th of 3/5. When even that is too hot, the df-capped
    * (d04) or LSH (d02) forms are the scale path — they exist because
    * exactness has this price. The model is ENFORCED at runtime:
    * the exact candidate count is aggregated before the self-join and
    * `maxCandidatePairs` turns the quadratic regime into an immediate
    * diagnosable error pointing at those alternatives.
    *
    * Verification is per-candidate array math: each doc's sorted
    * token array is collected once (set-cardinality-sized rows), and
    * one codegen'd expression scores a candidate pair — the native
    * [[graft.functions.SortedIntersectSize]] two-pointer merge for
    * integer-hash tokenizers (measured: halves the whole operator at
    * sf0.1 vs `array_intersect`'s per-pair hash set), `array_intersect`
    * for string tokenizers. Never a re-explode of the token relation
    * against the candidate set (the join formulation materializes
    * |candidates|·|set| rows; measured 10x slower at sf0.1).
    */
  def prefixFilterPairs(docs: DataFrame, idCol: String, textCol: String,
      tauNum: Int, tauDen: Int,
      tokens: Column => Column = c =>
        filter(array_distinct(split(c, " ")), t => length(t) > 0),
      maxCandidatePairs: Long = 1L << 26): DataFrame = {
    require(tauNum > 0 && tauDen > 0 && tauNum <= tauDen,
      s"tau must be a fraction in (0,1]: $tauNum/$tauDen")
    require(maxCandidatePairs > 0,
      s"maxCandidatePairs must be > 0, got $maxCandidatePairs")
    // token SETS: per-doc distinct inside `tokens` (array_distinct
    // before the explode — no corpus-wide distinct shuffle). Three
    // consumers read this relation (the df table, the prefix rank, the
    // per-doc verify arrays); without the eager checkpoint each one
    // re-runs the tokenizer over every document. At 100 TB this
    // materialization is the tokenized-corpus intermediate table.
    val toks = docs
      .select(col(idCol).as("id"), explode(tokens(col(textCol))).as("tok"))
      .localCheckpoint(true)
    val dfreq = toks.groupBy("tok").agg(count(lit(1)).as("df"))
    val part = org.apache.spark.sql.expressions.Window.partitionBy("id")
    val w = part.orderBy(col("df"), col("tok"))
    // rank each doc's tokens in the global (df, tok) order; keep the
    // (n - ceil(tau*n) + 1)-prefix. ceil in integers: (a + b - 1) div b.
    // Set size via a window count sharing the rank's partitioning.
    val prefix = toks.join(dfreq, "tok")
      .withColumn("n", count(lit(1)).over(part))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <=
        col("n") - expr(s"($tauNum * n + $tauDen - 1) div $tauDen") + 1)
      .select("id", "tok", "rn", "n")
    // RUNTIME budget guard (the RangeJoin.maxBucketsPerInterval house
    // pattern applied to the cost model above): the candidate volume
    // Σ_tok C(df_among_prefixes, 2) — an upper bound now that the
    // positional filter below prunes entries inside the join — is one
    // cheap aggregate over the prefix relation, checked BEFORE the
    // self-join so a
    // low-entropy corpus fails in seconds with a diagnosis instead of
    // discovering the quadratic regime as a multi-hour join. The
    // prefix relation is checkpointed first: the check, and then BOTH
    // sides of the self-join, read one materialization (a raise_error
    // gate column was tried instead and silently column-pruned away —
    // the eager check cannot be optimized out).
    val prefixCk = prefix.localCheckpoint(true)
    // the sum is taken in DOUBLE: a degenerate corpus can push
    // Σ C(dfp, 2) past 2^63, and a wrapped-negative Long would
    // silently DISABLE this guard in exactly the regime it exists to
    // catch; double precision loss (>2^53) is irrelevant to a budget
    // comparison
    val nCand = prefixCk.groupBy("tok")
      .agg(count(lit(1)).as("dfp"))
      .agg(coalesce(
        sum(col("dfp").cast("double") * (col("dfp") - 1).cast("double") / 2.0),
        lit(0.0)))
      .head().getDouble(0)
    if (nCand > maxCandidatePairs.toDouble)
      throw new IllegalStateException(
        f"prefixFilterPairs: exact-join candidate volume $nCand%.0f exceeds the " +
          s"$maxCandidatePairs budget — low-entropy corpus in the quadratic " +
          "regime. Use minHashCandidatePairs (d02) or ngramJaccardPairs " +
          "(d04), raise tau, pass an order-sensitive tokenizer (shingle " +
          "hashes), or raise maxCandidatePairs.")
    // PPJoin positional filter (Xiao et al. 2008), applied per prefix
    // entry: total overlap ≤ (shared before this entry) + 1 +
    // min(n_a − rn_a, n_b − rn_b), and at a pair's FIRST shared prefix
    // token nothing is shared before it — so a pair that can reach
    // jaccard τ (overlap ≥ α = ⌈τ(n_a+n_b)/(1+τ)⌉) always keeps at
    // least that first entry, and pruning entries below the bound
    // loses NO valid pair (integer form: α ≤ u ⟺ τnum·(n_a+n_b) ≤
    // u·(τnum+τden)). The filter also subsumes the classic length
    // filter (|a|,|b| within τ of each other). This cuts the verified
    // candidate set, not just the joined rows: the d11 scale curve
    // showed candidates growing superlinearly with corpus size, and
    // most cross-size pairs die here instead of in the verify kernel.
    val cand = prefixCk.as("a").join(prefixCk.as("b"),
        col("a.tok") === col("b.tok") && col("a.id") < col("b.id") &&
          lit(tauNum) * (col("a.n") + col("b.n")) <=
            (lit(1) + least(col("a.n") - col("a.rn"), col("b.n") - col("b.rn"))) *
              lit(tauNum + tauDen))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    val arrs = toks.groupBy("id").agg(sort_array(collect_list(col("tok"))).as("ts"))
    // verify kernel: the arrays are sorted distinct sets, so for
    // integer-hash tokenizers (the d11 shingle path) the native
    // two-pointer merge count equals size(array_intersect(...)) exactly
    // while skipping its per-pair hash-set build + intersection-array
    // allocation (the oracle keeps the portable list_intersect); string
    // tokenizers keep the builtin
    val interCol =
      if (toks.schema("tok").dataType == org.apache.spark.sql.types.LongType)
        graft.functions.VecExpressions.sorted_intersect_size(col("ts_a"), col("ts_b"))
      else size(array_intersect(col("ts_a"), col("ts_b"))).cast("long")
    cand
      .join(arrs.select(col("id").as("id_a"), col("ts").as("ts_a")), "id_a")
      .join(arrs.select(col("id").as("id_b"), col("ts").as("ts_b")), "id_b")
      .withColumn("inter", interCol)
      .withColumn("un",
        size(col("ts_a")).cast("long") + size(col("ts_b")).cast("long") - col("inter"))
      .where(col("inter") * tauDen >= col("un") * tauNum)
      .select(col("id_a"), col("id_b"),
        (col("inter") / col("un").cast("double")).as("jaccard"))
  }

  /** EXACT containment join (the asymmetric prefix filter): every
    * ordered pair (a, b), a ≠ b, with containment |A∩B| / |A| >= tau —
    * the doc-IN-doc signal a symmetric Jaccard join is structurally
    * blind to. An excerpt of half a document has containment 1.0 in
    * its source but Jaccard ≈ 0.5, so [[prefixFilterPairs]] at a
    * near-dup threshold never surfaces it; quotes, excerpts and
    * boilerplate supersets are exactly what a curation run removes
    * (drop the CONTAINED member, keep the superset).
    *
    * Filter theorem, asymmetric form: C(A,B) >= tau requires overlap
    * >= ceil(tau·|A|); under any global token order, by pigeonhole A's
    * first |A| − ceil(tau·|A|) + 1 tokens in that order must intersect
    * B's FULL token set. So the candidate join is A-prefix × the whole
    * token relation: only the PROBE side shrinks to a prefix — the
    * indexed side cannot be shortened, because tau bounds nothing
    * about |B| (that asymmetry is the entire difference from the
    * Jaccard form, and the reason a separate operator exists). No
    * false negatives by construction; a PPJoin-style positional filter
    * adds nothing here — the probe prefix bound rn <= n − ceil(tau·n)
    * + 1 already IS the positional bound when the other side carries
    * no rank. The global order is (df asc, token): prefixes are made
    * of each doc's rarest tokens, the smallest possible fan-out.
    *
    * LENGTH LOWER-BOUND (the AllPairs filter, asymmetric form):
    * |A∩B| ≤ |B|, so C(A,B) ≥ τ additionally forces |B| ≥ ⌈τ·|A|⌉ —
    * both token relations carry per-doc sizes and the candidate join
    * prunes `b.n·tauDen < a.n·tauNum` pairs before they exist. On
    * mixed-length corpora this is the difference between the token
    * df products and the (much smaller) products among comparable
    * lengths; output is unchanged (every pruned pair provably fails
    * verification).
    *
    * COST MODEL: unfiltered candidate volume is Σ_tok dfp(tok)·
    * (df(tok) − 1) — dfp from the prefix relation but df from the
    * FULL relation, so the quadratic cliff on low-entropy corpora is
    * steeper than the Jaccard form's Σ C(dfp, 2); the length bound
    * divides out the cross-length terms. The same runtime guard discipline
    * applies: the exact volume is aggregated BEFORE the join and
    * `maxCandidatePairs` turns the degenerate regime into an immediate
    * diagnosable error. Verification re-joins candidates against the
    * per-doc sorted token arrays (the d11 two-pointer kernel); the one
    * double division only formats an integer-decided containment.
    *
    * PRE-BLOCKING (`blockBy`, the documented escape hatch when even
    * the length-bounded volume exceeds the budget): pairs are sought
    * only WITHIN equal values of the blocking column — a stated
    * domain assumption (e.g. excerpts never cross `source`), not an
    * approximation within a block. Implemented as exact token
    * QUALIFICATION: tok ↦ blockKey·2³² + tok, blockKey = the md5-
    * derived 31-bit key of the block value ([[md5Hash32]] mod 2³¹ —
    * the sum then fits signed 64-bit exactly) — distinct
    * blocks occupy disjoint token spaces, so the unchanged df order /
    * prefix / budget-guard / candidate machinery provably never pairs
    * across blocks, and within a block every count is bit-identical
    * to running the operator on that block alone. Candidate volume
    * drops from Σ_tok dfp·df to the per-block sums — on a B-block
    * corpus with spread tokens, ~1/B. Requires an integer-hash
    * tokenizer producing 32-bit values (the [[shingleHashes]] path);
    * the qualification is restated verbatim in the oracle.
    */
  def containmentPairs(docs: DataFrame, idCol: String, textCol: String,
      tauNum: Int, tauDen: Int,
      tokens: Column => Column = c =>
        filter(array_distinct(split(c, " ")), t => length(t) > 0),
      maxCandidatePairs: Long = 1L << 26,
      blockBy: Option[Column] = None): DataFrame = {
    require(tauNum > 0 && tauDen > 0 && tauNum <= tauDen,
      s"tau must be a fraction in (0,1]: $tauNum/$tauDen")
    require(maxCandidatePairs > 0,
      s"maxCandidatePairs must be > 0, got $maxCandidatePairs")
    // block key reduced to 31 bits: bkey·2³² + tok must fit SIGNED
    // 64-bit (max = (2³¹−1)·2³² + 2³²−1 = Long.MaxValue exactly; the
    // full 32-bit key overflows under ANSI arithmetic). A key
    // collision merges two blocks — which only ADDS candidate scope,
    // never drops a within-block pair: the conservative direction.
    val toks0 = docs
      .select(col(idCol).as("id"),
        blockBy.map(b => pmod(md5Hash32(b.cast("string")),
            lit(2147483648L)))
          .getOrElse(lit(0L)).as("bkey"),
        explode(tokens(col(textCol))).as("tok0"))
    containmentFromToks0(toks0, tauNum, tauDen, maxCandidatePairs,
      blocked = blockBy.isDefined, inputMaterialized = false)
  }

  /** The containment chain after tokenization, over a
    * (id, bkey, tok0) relation: `blocked` composes the block key into
    * the token, plain ignores it — so ONE tokenized relation can feed
    * both forms (the [[containmentPairsAuto]] routing without paying
    * the corpus's most expensive setup stage twice).
    * `inputMaterialized` skips the internal checkpoint when toks0 is
    * already a checkpoint — the derived token relation is then pure
    * column math over it, cheaper to recompute per consumer than to
    * copy.
    */
  private def containmentFromToks0(toks0: DataFrame,
      tauNum: Int, tauDen: Int, maxCandidatePairs: Long,
      blocked: Boolean, inputMaterialized: Boolean): DataFrame = {
    // the tokenized corpus feeds four consumers (df table, prefix
    // rank, the probe join's indexed side, verify arrays) — one
    // materialization (the prefixFilterPairs discipline)
    val toksRaw =
      if (!blocked) toks0.select(col("id"), col("tok0").as("tok"))
      else {
        val dt = toks0.schema("tok0").dataType
        require(dt == org.apache.spark.sql.types.LongType ||
            dt == org.apache.spark.sql.types.IntegerType,
          s"containmentPairs: blockBy requires an integer-hash tokenizer " +
            s"producing 32-bit values (shingleHashes), got $dt")
        toks0.select(col("id"),
          (col("bkey") * lit(4294967296L) +
            pmod(col("tok0").cast("long"), lit(4294967296L))).as("tok"))
      }
    val toks =
      if (inputMaterialized) toksRaw else toksRaw.localCheckpoint(true)
    val dfreq = toks.groupBy("tok").agg(count(lit(1)).as("df"))
    val part = org.apache.spark.sql.expressions.Window.partitionBy("id")
    val w = part.orderBy(col("df"), col("tok"))
    val prefix = toks.join(dfreq, "tok")
      .withColumn("n", count(lit(1)).over(part))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <=
        col("n") - expr(s"($tauNum * n + $tauDen - 1) div $tauDen") + 1)
      .select("id", "tok", "n")
    val prefixCk = prefix.localCheckpoint(true)
    // AllPairs length lower-bound: C(A,B) ≥ τ forces |B| ≥ ⌈τ·|A|⌉
    // (|A∩B| ≤ |B|), so the indexed side carries per-doc sizes and
    // any candidate with b.n·tauDen < a.n·tauNum is provably dead —
    // the asymmetric family's analogue of the Jaccard length filter,
    // and the pruning that keeps mixed-length corpora off the cliff.
    val sizes = toks.groupBy("id").agg(count(lit(1)).as("n"))
    val toksN = toks.join(sizes, "id").localCheckpoint(true)
    // budget guard over the LENGTH-FILTERED volume (in DOUBLE — the
    // d11 overflow rule: a wrapped Long would disable the guard
    // exactly when it matters)
    val nCand = lengthFilteredCandVolume(prefixCk, toksN, tauNum, tauDen,
      selfRows = prefixCk.count())
    if (nCand > maxCandidatePairs.toDouble)
      throw new IllegalStateException(
        f"containmentPairs: candidate volume $nCand%.0f exceeds the " +
          s"$maxCandidatePairs budget — low-entropy corpus in the quadratic " +
          "regime even after the length lower-bound (the indexed side is " +
          "the FULL token relation; the cliff is steeper than " +
          "prefixFilterPairs'). Raise tau, pass an order-sensitive " +
          "tokenizer (shingle hashes), pre-block the corpus (blockBy = a " +
          "column containment never crosses, e.g. source), or raise " +
          "maxCandidatePairs.")
    val cand = prefixCk.as("a").join(toksN.as("b"),
        col("a.tok") === col("b.tok") && col("a.id") =!= col("b.id") &&
          col("b.n") * tauDen >= col("a.n") * tauNum)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    val arrs = toks.groupBy("id").agg(sort_array(collect_list(col("tok"))).as("ts"))
    val interCol =
      if (toks.schema("tok").dataType == org.apache.spark.sql.types.LongType)
        graft.functions.VecExpressions.sorted_intersect_size(col("ts_a"), col("ts_b"))
      else size(array_intersect(col("ts_a"), col("ts_b"))).cast("long")
    cand
      .join(arrs.select(col("id").as("id_a"), col("ts").as("ts_a")), "id_a")
      .join(arrs.select(col("id").as("id_b"), col("ts").as("ts_b")), "id_b")
      .withColumn("inter", interCol)
      .withColumn("n_a", size(col("ts_a")).cast("long"))
      .where(col("inter") * tauDen >= col("n_a") * tauNum)
      .select(col("id_a"), col("id_b"),
        (col("inter") / col("n_a").cast("double")).as("containment"))
  }

  /** [[containmentPairs]] with the pre-blocked escape hatch RAISED
    * INTO CODE (the d26 routing decision): run the exact whole-corpus
    * containment join while its measured candidate volume fits the
    * budget, and when it does not — the regime where the plain
    * operator refuses with "pre-block the corpus" — route to the
    * block-qualified form over `blockBy` instead. The caller declares
    * ONCE the column containment never crosses (e.g. `source`);
    * refusal becomes the last resort, reached only if even the
    * per-block volume exceeds the budget. The routing signal is the
    * same measured pre-join volume the guard prints, so the switch
    * costs one extra guard evaluation only in the regime that was
    * previously a hard stop. Requires the integer-hash tokenizer
    * (shingle hashes) the blocked form needs, on BOTH paths — the
    * routed plan must not change tokenization semantics mid-corpus.
    */
  def containmentPairsAuto(docs: DataFrame, idCol: String, textCol: String,
      tauNum: Int, tauDen: Int, blockBy: Column,
      tokens: Column => Column = c => array_distinct(shingleHashes(c)),
      maxCandidatePairs: Long = 1L << 26): DataFrame = {
    require(tauNum > 0 && tauDen > 0 && tauNum <= tauDen,
      s"tau must be a fraction in (0,1]: $tauNum/$tauDen")
    require(maxCandidatePairs > 0,
      s"maxCandidatePairs must be > 0, got $maxCandidatePairs")
    // tokenize ONCE (block key included — the blocked form needs it,
    // the plain form ignores it) and checkpoint: shingle-hashing the
    // corpus is the chain's most expensive setup stage, and the routed
    // regime — plain attempt trips the guard, blocked rerun — would
    // otherwise pay it twice. Both attempts derive their token
    // relation from this checkpoint by pure column math.
    val toks0 = docs
      .select(col(idCol).as("id"),
        pmod(md5Hash32(blockBy.cast("string")), lit(2147483648L))
          .as("bkey"),
        explode(tokens(col(textCol))).as("tok0"))
      .localCheckpoint(true)
    val plainDf =
      try Some(containmentFromToks0(toks0, tauNum, tauDen,
        maxCandidatePairs, blocked = false, inputMaterialized = true))
      catch {
        // ONLY the budget guard reroutes (its volume/budget message is
        // the routing signal); any other failure propagates
        case e: IllegalStateException
            if Option(e.getMessage).exists(_.contains("budget")) => None
      }
    plainDf.getOrElse(containmentFromToks0(toks0, tauNum, tauDen,
      maxCandidatePairs, blocked = true, inputMaterialized = true))
  }

  /** Length-filtered candidate-volume upper bound for the containment
    * family's pre-join budget guard. Both inputs carry (id, tok, n);
    * the true post-filter volume is Σ over candidate rows surviving
    * `b.n·tauDen ≥ a.n·tauNum` — computing that exactly IS the join
    * being guarded, so docs group into log₂ length buckets and a
    * bucket pair contributes its full dfp·df product iff its most
    * permissive corner (min probe n vs max indexed n) could survive.
    * Conservative by construction (may refuse a corpus the filtered
    * join would survive — guard semantics), exact when every doc in a
    * bucket pair passes, and the bucket join is Σ_tok (≤ ~40)² rows —
    * never candidate-volume-sized. `selfRows` subtracts the probe
    * side's guaranteed self-matches (a doc's own rows on the indexed
    * side always pass the corner test), keeping the bound tight and
    * still an upper bound on the non-self volume.
    */
  private def lengthFilteredCandVolume(probePrefix: DataFrame,
      indexedToks: DataFrame, tauNum: Int, tauDen: Int,
      selfRows: Long = 0L): Double = {
    // bucket via INTEGER bit arithmetic (length(bin(n)) - 1 ==
    // floor(log2(n)) exactly): floating log(x)/log(2) can round DOWN on
    // exact powers of two, putting a 2^k-token doc in bucket k-1 whose
    // maxN = 2^k - 1 < n — a knife-edge pair the real length filter
    // keeps would silently vanish from a "conservative" bound
    val p = probePrefix
      .withColumn("minN",
        expr("cast(shiftleft(1L, length(bin(n)) - 1) as double)"))
      .groupBy("tok", "minN").agg(count(lit(1)).as("dfp"))
    val t = indexedToks
      .withColumn("maxN",
        expr("cast(shiftleft(1L, length(bin(n))) as double) - 1"))
      .groupBy("tok", "maxN").agg(count(lit(1)).as("df"))
    val joined = p.as("p").join(t.as("t"),
        col("p.tok") === col("t.tok") &&
          col("t.maxN") * tauDen >= col("p.minN") * tauNum)
      .agg(coalesce(
        sum(col("dfp").cast("double") * col("df").cast("double")), lit(0.0)))
      .head().getDouble(0)
    math.max(0.0, joined - selfRows.toDouble)
  }

  /** The persisted containment index ([[incrementalContainmentPairs]]):
    * history tokens, history prefixes and the history df table, all
    * under the FROZEN (history-df, token) global order. At 100 TB
    * these are three parquet tables a daily job reads back — the q46
    * persist-the-sketch pattern at index granularity.
    */
  final case class ContainmentIndex(toks: DataFrame, prefix: DataFrame,
    dfreq: DataFrame)

  /** Build the persisted index from a history corpus: the d21 chain's
    * first half, stopped before any join — everything downstream
    * (probe, verify) reuses these relations.
    */
  def containmentIndex(history: DataFrame, idCol: String, textCol: String,
      tauNum: Int, tauDen: Int,
      tokens: Column => Column = c =>
        filter(array_distinct(split(c, " ")), t => length(t) > 0)): ContainmentIndex = {
    require(tauNum > 0 && tauDen > 0 && tauNum <= tauDen,
      s"tau must be a fraction in (0,1]: $tauNum/$tauDen")
    val toks = history
      .select(col(idCol).as("id"), explode(tokens(col(textCol))).as("tok"))
      .localCheckpoint(true)
    val dfreq = toks.groupBy("tok").agg(count(lit(1)).as("df"))
      .localCheckpoint(true)
    val part = org.apache.spark.sql.expressions.Window.partitionBy("id")
    val w = part.orderBy(col("df"), col("tok"))
    val prefix = toks.join(dfreq, "tok")
      .withColumn("n", count(lit(1)).over(part))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <=
        col("n") - expr(s"($tauNum * n + $tauDen - 1) div $tauDen") + 1)
      .select("id", "tok")
      .localCheckpoint(true)
    ContainmentIndex(toks, prefix, dfreq)
  }

  /** Incremental containment detection — the d16 settle pattern for
    * the ASYMMETRIC family: a new batch probes the persisted
    * [[containmentIndex]]; history×history pairs are already known and
    * never recompute, so the refresh is batch-sized.
    *
    * The theory that makes this exact: the prefix-filter theorem holds
    * for ANY shared total order — df-rarest-first is only the fan-out
    * heuristic, not a correctness requirement. So the index FREEZES
    * the order at build time ((history-df, token); batch-new tokens
    * coalesce to df 0 = rarest-first position), history prefixes stay
    * valid verbatim, and the batch computes its prefixes under the
    * same frozen order. Asymmetry needs BOTH probe directions: a
    * batch doc contained in history (batch.prefix × history.toks), a
    * history doc contained in a batch superset (history.prefix ×
    * batch.toks), plus the in-batch join. Candidate volume for all
    * three terms is aggregated BEFORE any join (the d11/d21 guard),
    * each term under the AllPairs length lower-bound the candidate
    * joins enforce (|B| ≥ ⌈τ·|A|⌉, see [[containmentPairs]]).
    *
    * PRECONDITION, enforced loudly: history and batch document ids
    * must be DISJOINT. A re-ingested id would merge both token sets
    * in the verify arrays and emit corrupted containments, so the
    * overlap check (one join of the two id-sized size relations)
    * throws before any candidate work.
    *
    * Returns (id_a, id_b, containment) for every qualifying ordered
    * pair TOUCHING the batch.
    */
  def incrementalContainmentPairs(index: ContainmentIndex, batch: DataFrame,
      idCol: String, textCol: String, tauNum: Int, tauDen: Int,
      tokens: Column => Column = c =>
        filter(array_distinct(split(c, " ")), t => length(t) > 0),
      maxCandidatePairs: Long = 1L << 26): DataFrame = {
    require(tauNum > 0 && tauDen > 0 && tauNum <= tauDen,
      s"tau must be a fraction in (0,1]: $tauNum/$tauDen")
    require(maxCandidatePairs > 0,
      s"maxCandidatePairs must be > 0, got $maxCandidatePairs")
    val btoks = batch
      .select(col(idCol).as("id"), explode(tokens(col(textCol))).as("tok"))
      .localCheckpoint(true)
    val part = org.apache.spark.sql.expressions.Window.partitionBy("id")
    // the frozen order: history df, unseen tokens at 0 (rarest-first)
    val w = part.orderBy(col("df"), col("tok"))
    val bprefix = btoks
      .join(index.dfreq, Seq("tok"), "left")
      .withColumn("df", coalesce(col("df"), lit(0L)))
      .withColumn("n", count(lit(1)).over(part))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <=
        col("n") - expr(s"($tauNum * n + $tauDen - 1) div $tauDen") + 1)
      .select("id", "tok", "n")
      .localCheckpoint(true)
    // the settle contract REQUIRES disjoint id spaces: an id in both
    // history and batch would merge both token multisets in the verify
    // arrays and corrupt every containment it touches — fail loudly
    // (one join of the two id-sized size relations, never corpus-sized)
    val hsizes = index.toks.groupBy("id").agg(count(lit(1)).as("n"))
      .localCheckpoint(true)
    val bsizes = btoks.groupBy("id").agg(count(lit(1)).as("n"))
      .localCheckpoint(true)
    val clash = hsizes.join(bsizes, "id").limit(1).count()
    if (clash > 0)
      throw new IllegalArgumentException(
        "incrementalContainmentPairs: batch contains document ids already " +
          "present in the history index — history/batch id spaces must be " +
          "disjoint (a shared id would merge both token sets in the verify " +
          "arrays and emit corrupted containments). Re-key the batch or " +
          "rebuild the index without the re-ingested ids.")
    val htoksN = index.toks.join(hsizes, "id")
    val btoksN = btoks.join(bsizes, "id").localCheckpoint(true)
    val hprefixN = index.prefix.join(hsizes, "id")
    // budget guard over all three probe terms, each under the AllPairs
    // length lower-bound (see containmentPairs / lengthFilteredCandVolume)
    val vol =
      lengthFilteredCandVolume(bprefix, htoksN, tauNum, tauDen) +
      lengthFilteredCandVolume(hprefixN, btoksN, tauNum, tauDen) +
      lengthFilteredCandVolume(bprefix, btoksN, tauNum, tauDen,
        selfRows = bprefix.count())
    if (vol > maxCandidatePairs.toDouble)
      throw new IllegalStateException(
        f"incrementalContainmentPairs: candidate volume $vol%.0f exceeds " +
          s"the $maxCandidatePairs budget — see containmentPairs' cost " +
          "model; raise tau, re-tokenize, or raise maxCandidatePairs.")
    val lenOk = col("b.n") * tauDen >= col("a.n") * tauNum
    val candBH = bprefix.as("a").join(htoksN.as("b"),
        col("a.tok") === col("b.tok") && lenOk)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
    val candHB = hprefixN.as("a").join(btoksN.as("b"),
        col("a.tok") === col("b.tok") && lenOk)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
    val candBB = bprefix.as("a").join(btoksN.as("b"),
        col("a.tok") === col("b.tok") && col("a.id") =!= col("b.id") && lenOk)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
    val cand = candBH.unionByName(candHB).unionByName(candBB).distinct()
    // verify arrays: history arrs would be the index's fourth persisted
    // relation in production; derived here from index.toks
    val arrs = index.toks.unionByName(btoks)
      .groupBy("id").agg(sort_array(collect_list(col("tok"))).as("ts"))
    val interCol =
      if (btoks.schema("tok").dataType == org.apache.spark.sql.types.LongType)
        graft.functions.VecExpressions.sorted_intersect_size(col("ts_a"), col("ts_b"))
      else size(array_intersect(col("ts_a"), col("ts_b"))).cast("long")
    cand
      .join(arrs.select(col("id").as("id_a"), col("ts").as("ts_a")), "id_a")
      .join(arrs.select(col("id").as("id_b"), col("ts").as("ts_b")), "id_b")
      .withColumn("inter", interCol)
      .withColumn("n_a", size(col("ts_a")).cast("long"))
      .where(col("inter") * tauDen >= col("n_a") * tauNum)
      .select(col("id_a"), col("id_b"),
        (col("inter") / col("n_a").cast("double")).as("containment"))
  }

  /** The superset-KEEP rewrite over a [[containmentPairs]] relation —
    * what Lee et al.'s dedup does with containment: drop the CONTAINED
    * member, keep the superset (the excerpt adds no training signal
    * its source doesn't already carry). Mutual containment
    * (near-identical docs contained in each other) keeps the lower
    * id — without the tie-break a mutual pair drops BOTH members.
    * Greedy, not transitive-closure: a doc is dropped iff some pair
    * says so, matching the one-pass rewrite a production run applies.
    *
    * Returns (id, kept_in) for dropped docs, kept_in = the smallest
    * qualifying container (deterministic attribution). Cost: one
    * self-join of the pair relation (mutuality probe) + one groupBy —
    * pair-relation-sized, never corpus-sized.
    */
  def supersetDrops(pairs: DataFrame): DataFrame = {
    val p = pairs.select(col("id_a"), col("id_b")).localCheckpoint(true)
    p.as("p").join(p.as("q"),
        col("q.id_a") === col("p.id_b") && col("q.id_b") === col("p.id_a"),
        "left_outer")
      .where(col("q.id_a").isNull || col("p.id_a") > col("p.id_b"))
      .groupBy(col("p.id_a").as("id"))
      .agg(min(col("p.id_b")).as("kept_in"))
  }

  /** Cross-document duplicated-span profile (the per-document signal
    * behind Lee et al. 2022, "Deduplicating Training Data Makes
    * Language Models Better": repeated substrings across documents are
    * boilerplate worth removing): for each document, the fraction of
    * its sampled shingle positions whose shingle hash occurs in ≥ 2
    * DISTINCT documents. High fraction = the document is mostly text
    * that exists elsewhere (templates, navigation chrome, licenses);
    * t10's rarity is the complementary mean-df view over a sample —
    * this is positional span coverage over every document.
    *
    * Scale shape: one fused `ShingleHash32` pass per document (no
    * per-shingle allocation), the document-frequency table is one
    * map-side-combined groupBy over distinct (doc, hash), and scoring
    * is one equi-join on the hash — the same df-table discipline as
    * t10, where the df relation is the thing you persist and reuse.
    * Shingle multiplicity within a doc counts positionally (a doc
    * repeating a duplicated span twice has both positions covered).
    */
  def duplicatedSpans(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val es = docs.where(col(textCol).isNotNull)
      .select(col(idCol), explode(shingleHashes(col(textCol))).as("__h"))
    val dfr = es.select(col(idCol), col("__h")).distinct()
      .groupBy("__h").agg(count(lit(1)).as("__docs_with"))
    es.join(dfr, "__h")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_positions"),
        sum(when(col("__docs_with") >= 2, 1L).otherwise(0L))
          .as("n_dup_positions"))
      .withColumn("dup_fraction",
        col("n_dup_positions") / col("n_positions").cast("double"))
  }

  /** Cross-document duplicated-span REMOVAL — the rewrite step Lee et
    * al. 2022 actually apply (ExactSubstr dedup: cut the repeated
    * substring, keep the document), where [[duplicatedSpans]] only
    * measures. A span is cut when its shingle hash occurs in >= 2
    * DISTINCT documents (within-doc repeats are kept, as in d14); the
    * cut covers the shingle's k characters. Sampling caveat shared
    * with d14: only stride-aligned span starts are tested, so a
    * duplicated region's first/last < stride characters can survive —
    * the price of the fused sampled hash pass, stated, not hidden.
    *
    * The rewrite needs NO interval merging pass: cut positions are
    * sorted ascending and every cut has the same width k, so cut ENDS
    * are ascending too — the kept text is exactly
    * head(before first cut) ++ per-consecutive-pair gaps
    * `[p_i + k, p_{i+1})` (clamped to empty when cuts overlap) ++
    * tail(after last cut end). That makes the whole rewrite three
    * substrings + one `zip_with`/`array_join` fold of per-gap
    * substrings — pure codegen'd column math over the (doc, sorted
    * cut-position array) relation, replayed literally by the DuckDB
    * oracle (d15).
    *
    * Scale shape: same as [[duplicatedSpans]] — one fused positional
    * hash pass, one distinct groupBy for the df relation (the thing a
    * 100 TB pipeline persists), one semi-join back, one per-doc
    * collect of CUT positions only (bounded by text length / stride).
    * Text bytes never join against the df table — only (id, pos, h)
    * rows do; the rewrite touches text once, per-row.
    *
    * Returns `docs`' non-null-text rows plus a `cleaned` string column.
    */
  def removeDuplicatedSpans(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    require(!docs.columns.exists(_.equalsIgnoreCase("cleaned")),
      "removeDuplicatedSpans produces `cleaned`; rename that input column")
    val k = ShingleK
    val base = docs.where(col(textCol).isNotNull)
    val es = base.select(col(idCol),
        posexplode(shingleHashes(col(textCol))).as(Seq("__p", "__h")))
    val dupHashes = es.select(col(idCol), col("__h")).distinct()
      .groupBy("__h").agg(count(lit(1)).as("__d"))
      .where(col("__d") >= 2).select("__h")
    // 1-based char start of shingle p, matching the oracle's
    // generate_series(1, ..., stride)
    val dupPos = es.join(dupHashes, Seq("__h"), "left_semi")
      .select(col(idCol), (col("__p") * ShingleStride + 1).as("__s"))
      .groupBy(col(idCol)).agg(sort_array(collect_list(col("__s"))).as("__ps"))
    val cleaned = expr(
      s"""CASE WHEN __ps IS NULL THEN $textCol ELSE concat(
         |  substring($textCol, 1, element_at(__ps, 1) - 1),
         |  array_join(zip_with(
         |    slice(__ps, 1, size(__ps) - 1), slice(__ps, 2, size(__ps) - 1),
         |    (p, pn) -> substring($textCol, p + $k, greatest(0, pn - (p + $k)))), ''),
         |  substring($textCol, element_at(__ps, -1) + $k)) END""".stripMargin)
    base.join(dupPos, Seq(idCol), "left")
      .withColumn("cleaned", cleaned)
      .drop("__ps")
  }

  /** EXACT repeated-substring dedup — the suffix-array member of the
    * Lee et al. 2022 family that d14/d15 sample: duplicated-token
    * COVERAGE, found exactly (no stride, no sampling, within-doc
    * repeats count — d14 requires ≥ 2 distinct DOCUMENTS; both
    * semantics stated). A token is covered iff some `l`-token window
    * containing it occurs at ≥ 2 distinct (document, position) sites
    * corpus-wide; output spans are the maximal covered runs — exactly
    * the ranges ExactSubstr dedup cuts. PRECISION of the semantics:
    * an island is a union of (possibly different) duplicated windows,
    * so the island's text as a WHOLE need not repeat anywhere (two
    * abutting windows duplicated at two different remote sites merge
    * into one island); every length-l slice aligned on a duplicated
    * start does. Consumers wanting verbatim-repeating extents read the
    * per-window dup relation, not the merged islands.
    *
    * The suffix-array connection, relationally: grouping suffixes by
    * their FIRST l TOKENS (the fixed-width suffix key; equal keys =
    * the adjacent-suffix LCP ≥ l test) finds exactly the duplicated
    * window starts, and the coverage islands are the
    * overlapping-or-adjacent starts merged. Three stages:
    *
    *  1. window enumeration — per document, `transform(sequence(...))`
    *     emits the l-gram at every position as pure column math (no
    *     per-position window function);
    *  2. one groupBy on the l-gram (map-side combined) keeps keys with
    *     ≥ 2 occurrences — THE data-sized shuffle, the exactness price
    *     (the key is the raw token text, so equality is literal, never
    *     probabilistic; the 100 TB run shuffles a 128-bit gram hash
    *     instead and re-verifies groups, the d02→d11 ladder —
    *     implemented as [[exactDuplicatedSpansHashed]], identical
    *     output by property spec);
    *  3. a semi-join flags duplicated starts, and the island merge
    *     (new island when start > max prior end) runs per DOCUMENT —
    *     the only window, bounded by document length like d15's cut
    *     fold, never corpus-sized.
    *
    * Output: one row per maximal covered run —
    * (idCol, span_start, span_end, span_tokens), token positions
    * 0-based, end exclusive.
    */
  def exactDuplicatedSpans(docs: DataFrame, idCol: String, textCol: String,
      l: Int): DataFrame = {
    require(l >= 1, s"l must be >= 1 (got $l)")
    val base = docs.where(col(textCol).isNotNull)
      .select(col(idCol), split(col(textCol), " ").as("__toks"))
      .where(size(col("__toks")) >= l)
    val grams = base.select(col(idCol),
      posexplode(expr(
        s"""transform(sequence(0, size(__toks) - $l),
           |  i -> array_join(slice(__toks, i + 1, $l), ' '))""".stripMargin))
        .as(Seq("__p", "__gram")))
    val dup = grams.groupBy("__gram").agg(count(lit(1)).as("__occ"))
      .where(col("__occ") >= 2).select("__gram")
    val starts = grams.join(dup, Seq("__gram"), "left_semi")
      .select(col(idCol), col("__p").cast("long").as("__p"))
    mergeSpanIslands(starts, idCol, l)
  }

  /** Stage 3 of the exact-span family (shared by [[exactDuplicatedSpans]]
    * and [[exactDuplicatedSpansHashed]]): merge duplicated window
    * starts into maximal covered runs. Per-DOCUMENT window only —
    * bounded by document length, never corpus-sized.
    */
  private def mergeSpanIslands(starts: DataFrame, idCol: String,
      l: Int): DataFrame = {
    val w = Window.partitionBy(col(idCol)).orderBy(col("__p"))
    val prevEnd = max(col("__p") + l)
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    starts
      .withColumn("__brk",
        when(col("__p") > coalesce(prevEnd, lit(-1L)), 1L).otherwise(0L))
      .withColumn("__island", sum(col("__brk"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(idCol), col("__island"))
      .agg(min(col("__p")).as("span_start"),
        (max(col("__p")) + l).as("span_end"))
      .withColumn("span_tokens", col("span_end") - col("span_start"))
      .select(col(idCol), col("span_start"), col("span_end"),
        col("span_tokens"))
  }

  /** The 100 TB form of [[exactDuplicatedSpans]], promised by its
    * scaladoc since r7 and implemented here: the data-sized shuffle
    * carries a 128-bit gram HASH (md5 of the l-gram) instead of the
    * raw token text — at corpus scale the l-gram relation dominates
    * the job's bytes and hashing divides the shuffled width by the
    * mean gram length. Exactness is NOT delegated to the hash: hash
    * groups with ≥ 2 occurrences are only CANDIDATES; their raw grams
    * are re-derived by position against the per-doc token arrays
    * (an id-keyed join — candidate-sized, not corpus-sized) and
    * re-grouped on the literal text, so a 128-bit collision costs a
    * few re-verified rows, never a wrong span. Identical output to
    * the raw-text form by construction (property-spec'd).
    */
  def exactDuplicatedSpansHashed(docs: DataFrame, idCol: String,
      textCol: String, l: Int): DataFrame = {
    require(l >= 1, s"l must be >= 1 (got $l)")
    val base = docs.where(col(textCol).isNotNull)
      .select(col(idCol), split(col(textCol), " ").as("__toks"))
      .where(size(col("__toks")) >= l)
      .localCheckpoint(true) // scanned by the hash pass AND the re-verify join
    // the gram text exists only inside this projection; what shuffles
    // is (id, pos, 16-byte hash)
    val gramHashes = base.select(col(idCol),
      posexplode(expr(
        s"""transform(sequence(0, size(__toks) - $l),
           |  i -> unhex(md5(array_join(slice(__toks, i + 1, $l), ' '))))"""
          .stripMargin))
        .as(Seq("__p", "__h")))
    val dupH = gramHashes.groupBy("__h").agg(count(lit(1)).as("__occ"))
      .where(col("__occ") >= 2).select("__h")
    // candidates re-attach their doc's tokens by id and re-derive the
    // raw gram at the flagged position only
    val candGram = gramHashes.join(dupH, Seq("__h"), "left_semi")
      .join(base, Seq(idCol))
      .select(col(idCol), col("__p"),
        expr(s"array_join(slice(__toks, __p + 1, $l), ' ')").as("__gram"))
      .localCheckpoint(true) // feeds the verify groupBy AND the semi-join
    val verified = candGram.groupBy("__gram").agg(count(lit(1)).as("__occ"))
      .where(col("__occ") >= 2).select("__gram")
    val starts = candGram.join(verified, Seq("__gram"), "left_semi")
      .select(col(idCol), col("__p").cast("long").as("__p"))
    mergeSpanIslands(starts, idCol, l)
  }

  /** The removal twin of [[exactDuplicatedSpans]] (d15 : d14 ::
    * this : d19): cut every token covered by a maximal duplicated
    * span — ALL occurrences, the d15 rule — and keep the stitched
    * remainder. Unlike d15's char-stride cuts, spans here are exact
    * token islands, so the rewrite is one indexed `filter` over the
    * token array against the doc's (bounded) span list — pure codegen'd
    * column math; text tokens never join anything, only the id-keyed
    * span relation does.
    *
    * Returns non-null-text `docs` rows plus (n_tokens, kept array
    * columns folded to) `cleaned` — callers digest it (md5) rather than
    * ship text.
    */
  def removeExactDuplicatedSpans(docs: DataFrame, idCol: String,
      textCol: String, l: Int): DataFrame = {
    Seq("cleaned", "n_tokens", "n_kept_tokens").foreach { r =>
      require(!docs.columns.exists(_.equalsIgnoreCase(r)),
        s"removeExactDuplicatedSpans produces `$r`; rename that input column")
    }
    val spans = exactDuplicatedSpans(docs, idCol, textCol, l)
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(struct(col("span_start").as("s"),
        col("span_end").as("e")))).as("__spans"))
    docs.where(col(textCol).isNotNull)
      .join(spans, Seq(idCol), "left")
      .withColumn("__toks", split(col(textCol), " "))
      .withColumn("__kept", expr(
        """CASE WHEN __spans IS NULL THEN __toks
          |ELSE filter(__toks, (w, i) ->
          |  NOT exists(__spans, sp -> i >= sp.s AND i < sp.e)) END""".stripMargin))
      .withColumn("n_tokens", size(col("__toks")).cast("long"))
      .withColumn("n_kept_tokens", size(col("__kept")).cast("long"))
      .withColumn("cleaned", array_join(col("__kept"), " "))
      .drop("__spans", "__toks", "__kept")
  }

  // --- semantic dedup (SemDeDup) -------------------------------------------

  /** Cosine threshold for [[semDedup]], shared with the d13 oracle. */
  val SemDeDupTau = 0.999

  /** Cluster count for [[semDedup]]'s default / the d13 query. Pair
    * volume is n²/k, so k grows with the corpus (the paper's regime);
    * 32 holds the benchmark corpus's per-cluster fan-out to ~n/32
    * while keeping the centroid-literal argmin projection small. */
  val SemDeDupK = 32

  /** SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
    * web-scale through semantic deduplication"): k-means-cluster the
    * embeddings, then within each cluster flag every vector whose
    * cosine similarity to a LOWER-id cluster member reaches `tau` —
    * semantic duplicates whose removal the paper shows speeds training
    * at equal quality. The lowest id is the kept representative (a
    * deterministic stand-in for the paper's random/centroid-distance
    * keep rules).
    *
    * Scale shape: clustering is [[Similarity.kmeansAssign]] (model
    * state = k×dim driver literals, each pass one corpus scan, zero
    * shuffle in assignment). The pairwise stage joins the corpus to
    * itself ON THE CLUSTER ID, so candidate volume is Σ|cluster|² —
    * n²/k expected — and the paper's regime picks k proportional to n
    * (50k clusters at LAION scale) to keep per-cluster membership, and
    * thus per-key join fan-out, bounded. Quantized integer vectors ride
    * the join; cosine is the exact dot/sqrt·sqrt sequence the oracle
    * replays bit-for-bit.
    */
  def semDedup(embeddings: DataFrame, k: Int = SemDeDupK, iters: Int = 2,
      tau: Double = SemDeDupTau): DataFrame = {
    import graft.functions.VectorFunctions._
    val assigned = Similarity.kmeansAssign(embeddings, k, iters, keepQ = true)
      .withColumn("norm", normSqQ(col("q")))
      .localCheckpoint(true) // assignment scans the corpus `iters` times;
                             // both join sides below must reuse ONE result
    val a = assigned.as("a")
    val b = assigned.as("b")
    // zero-norm guard: an all-zero quantized embedding has cosine
    // 0/0 = NaN to every cluster-mate, and BOTH engines order NaN
    // above tau — without the guard every zero vector is "flagged as a
    // semantic duplicate" of every zero-norm neighbor (agreeingly
    // wrong, so the oracle hash-match would stay green). Zero vectors
    // carry no direction, hence no semantic-duplicate evidence.
    val dropped = a.join(b,
        col("a.cid") === col("b.cid") && col("b.vec_id") < col("a.vec_id"))
      .where(col("a.norm") > 0 && col("b.norm") > 0 &&
        cosineQ(col("a.q"), col("b.q"), col("a.norm"), col("b.norm")) >= tau)
      .select(col("a.vec_id").as("vec_id")).distinct()
      .withColumn("dup", lit(true))
    assigned.select(col("vec_id"), col("cid").cast("long").as("cid"))
      .join(dropped, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cid"),
        coalesce(col("dup"), lit(false)).as("is_semantic_dup"))
  }

  /** Per-(source, chunk-hash) index over content-defined chunks (the
    * d27 primitive, see `CdcChunks`): one generated pass per doc,
    * then a map-side-combinable groupBy over the ~n/divisor-row chunk
    * relation. The index is the MERGEABLE state: counts add, lengths
    * min — so incremental maintenance (d28) is pure algebra over two
    * independently built indexes, never a recompute of history.
    */
  /** The shared CDC parameters (rolling-window width, boundary
    * divisor): the ONE definition the batch operators (d27/d28),
    * their oracle, and the streaming index
    * ([[graft.streaming.DedupStreams.cdcChunkIndexStream]]) all
    * default to.
    */
  val CdcW = 8
  val CdcDivisor = 31

  def cdcChunkIndex(docs: DataFrame, w: Int = CdcW,
      divisor: Int = CdcDivisor): DataFrame =
    docs.where(col("text").isNotNull)
      .select(col("source"),
        explode(graft.functions.TextHashExpressions
          .cdc_chunks(col("text"), w, divisor)).as("chunk"))
      .select(col("source"), md5(col("chunk")).as("h"),
        length(col("chunk")).cast("long").as("len"))
      .groupBy("source", "h")
      .agg(count(lit(1)).as("cnt"), min("len").as("len"))

  /** Algebraic merge of two chunk indexes: definitionally equal to
    * [[cdcChunkIndex]] of the unioned corpora (counts are sums over
    * disjoint doc sets; a hash's length is content-determined, so min
    * is a no-op across sides) — d28 shares d27's oracle to prove it.
    */
  def cdcChunkMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("source", "h")
      .agg(sum("cnt").as("cnt"), min("len").as("len"))

  /** The d27 reporting face over any chunk index: per-source chunk
    * volume, distinct volume, and the duplicated-character mass
    * chunk-level dedup would reclaim. `docs` supplies n_docs (every
    * source keeps a row even when all its texts are empty).
    */
  def cdcChunkStats(docs: DataFrame, index: DataFrame): DataFrame = {
    val stats = index.groupBy("source").agg(
      sum("cnt").as("n_chunks"),
      count(lit(1)).as("n_distinct_chunks"),
      sum(col("cnt") * col("len")).as("total_chars"),
      sum((col("cnt") - 1) * col("len")).as("dup_chars"))
    docs.where(col("text").isNotNull)
      .groupBy("source").agg(count(lit(1)).as("n_docs"))
      .join(stats, Seq("source"), "left")
      .select(col("source"), col("n_docs"),
        coalesce(col("n_chunks"), lit(0L)).as("n_chunks"),
        coalesce(col("n_distinct_chunks"), lit(0L)).as("n_distinct_chunks"),
        coalesce(col("total_chars"), lit(0L)).as("total_chars"),
        coalesce(col("dup_chars"), lit(0L)).as("dup_chars"))
  }

  /** The shared winnowing parameters (gram length k, window w): the
    * ONE definition the batch operators (d29/d33), their oracles, and
    * the streaming index ([[graft.streaming.DedupStreams
    * .winnowIndexStream]]) all default to — stream and batch cannot
    * drift unless a caller overrides both deliberately.
    */
  val WinnowK = 5
  val WinnowW = 8

  /** The p07 funnel's winnowing parameters — gram length 24 (vs
    * d29's 5) with the same window: the funnel's skip contract is
    * "no fingerprint selected by two docs of a source ⟹ no cross-doc
    * repeat of >= k+w−1 = 31 chars in that source", and the long
    * gram keeps word-level chance collisions from flagging sources
    * that carry no real boilerplate (round 10 measured k=12 flagging
    * effectively every source on natural text — any repeated ≥12-char
    * WORD across two documents flags — which made p07clean pay the
    * whole-corpus exact pass it exists to skip; 24 consecutive
    * identical chars across documents is a phrase-level signal, and
    * 31 chars is well under the 50-token thresholds substring-dedup
    * pipelines actually deploy, Lee et al. 2022).
    */
  val FunnelK = 24
  val FunnelW = 8

  /** The exploded winnowed-fingerprint relation: one row per selected
    * (doc, position) with the 32-bit hash unpacked; fingerprint-free
    * docs (text shorter than k) keep a null-hash row so the stats
    * face reports them with zeros.
    */
  def winnowFingerprints(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", k: Int = WinnowK, w: Int = WinnowW): DataFrame =
    docs.where(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"),
        greatest(length(col(textCol)) - (k - 1), lit(0)).cast("long").as("n_grams"),
        graft.functions.TextHashExpressions
          .winnow_fingerprints(col(textCol), k, w).as("fps"))
      .select(col("doc_id"), col("n_grams"),
        explode_outer(col("fps")).as("packed"))
      .withColumn("h", col("packed").bitwiseAND(lit(0xFFFFFFFFL)))

  /** Per-hash index over winnowed fingerprints: how many DISTINCT
    * documents selected each hash. The MERGEABLE state of the family:
    * indexes over disjoint doc sets merge by summing (a doc
    * contributes to each side at most once), so incremental
    * maintenance (d33) is pure algebra — history never re-fingerprints.
    */
  def winnowIndex(fps: DataFrame): DataFrame =
    fps.where(col("h").isNotNull)
      .groupBy("h").agg(countDistinct(col("doc_id")).as("nd"))

  /** Algebraic merge of two winnow indexes built over DISJOINT doc
    * sets — definitionally equal to [[winnowIndex]] of the union
    * (distinct-doc counts add across disjoint sides); d33 shares d29's
    * oracle to prove it.
    */
  def winnowIndexMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("h").agg(sum("nd").as("nd"))

  /** The p07 funnel's VERIFIED candidate sources: a source is flagged
    * iff some winnow fingerprint hash is selected by ≥ 2 of its
    * documents AND the actual k-char grams at the selecting positions
    * match. The verification matters at scale: the winnow hash is
    * 32-bit, so once a source selects ~2¹⁶ fingerprints, birthday
    * collisions flag it by CHANCE (measured: every source of a salted
    * no-repeat corpus flagged at 3× sf0.1) — and a funnel that flags
    * everything skips nothing. Hash-colliding rows are
    * candidate-sized, so the gram fetch joins and the
    * (source, h, gram) distinct-doc count cost ~nothing; grouping by
    * the GRAM (not a witness pair) keeps the skip guarantee exact
    * even when a real repeat and a chance collision share one hash.
    */
  def funnelCandidateSources(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", srcCol: String = "source",
      k: Int = FunnelK, w: Int = FunnelW): DataFrame = {
    val base = docs.select(col(idCol).as("doc_id"),
      col(textCol).as("text"), col(srcCol).as("source"))
    val fps = winnowFingerprints(base, "doc_id", "text", k, w)
      .where(col("h").isNotNull)
      .withColumn("pos", shiftright(col("packed"), 32))
      .join(base.select("doc_id", "source"), Seq("doc_id"))
    // one-pass multi-doc tests (round 13): a (source, h[, gram]) group
    // is selected by >= 2 distinct docs iff min(doc_id) != max(doc_id)
    // — exactly countDistinct >= 2, but via plain partial min/max, so
    // each test costs ONE map-side-combined exchange instead of
    // countDistinct's two (the fingerprint relation is the funnel's
    // data-sized stage; the gram-verified recount is candidate-sized)
    val hc = fps.groupBy("source", "h")
      .agg(min("doc_id").as("__d0"), max("doc_id").as("__d1"))
      .where(col("__d0") =!= col("__d1"))
      .select("source", "h")
    fps.join(hc, Seq("source", "h"), "left_semi")
      .join(base.select("doc_id", "text"), Seq("doc_id"))
      .withColumn("gram",
        expr(s"substring(text, cast(pos as int), $k)"))
      .groupBy("source", "h", "gram")
      .agg(min("doc_id").as("__d0"), max("doc_id").as("__d1"))
      .where(col("__d0") =!= col("__d1"))
      .select("source").distinct()
  }

  /** The d29 reporting face over any fingerprint index: per doc, gram
    * count, fingerprints selected, fingerprints shared with at least
    * one OTHER document (nd >= 2 in the index).
    */
  def winnowStatsFromIndex(fps: DataFrame, index: DataFrame): DataFrame = {
    val shared = index.where(col("nd") >= 2)
      .select(col("h"), lit(true).as("is_shared"))
    fps.join(shared, Seq("h"), "left")
      .groupBy("doc_id", "n_grams")
      .agg(count(col("h")).as("n_fingerprints"),
        count(when(col("is_shared"), lit(1))).as("n_shared_fp"))
      .select("doc_id", "n_grams", "n_fingerprints", "n_shared_fp")
  }

  /** Winnowing fingerprint profile (Schleimer–Wilkerson–Aiken 2003 —
    * the MOSS scheme, see `WinnowFingerprints`): per document, the
    * gram count, the selected fingerprint count (expected density
    * 2/(w+1)), and how many of its fingerprints are SHARED — selected
    * by at least one other document too. Because selection is
    * content-locked, shared boilerplate selects the same grams in
    * every document regardless of offset, so shared-fingerprint mass
    * is the plagiarism/boilerplate signal at ~2/(w+1) of the d19
    * shuffle volume: only the selected (hash, doc) rows travel, never
    * one row per gram. Scale shape: one generated pass per doc, one
    * map-side-combined groupBy over the fingerprint relation, one
    * equi-join back on the 32-bit hash (d01's shape, never pairwise).
    */
  def winnowStats(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", k: Int = WinnowK, w: Int = WinnowW): DataFrame = {
    val fps = winnowFingerprints(docs, idCol, textCol, k, w)
    winnowStatsFromIndex(fps, winnowIndex(fps))
  }
}
