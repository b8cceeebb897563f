package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Graph analytics over relations (SURVEY §2C extension): derive an
  * interaction graph from an event log and rank nodes by a
  * deterministic integer PageRank. Web-scale corpus pipelines use
  * exactly this shape for URL/source quality (Common Crawl publishes
  * harmonic-centrality ranks; "quality weight by link centrality" is a
  * standard curation signal) — here the same operator family runs on
  * the `events` table's user-interaction graph.
  *
  * Graph representation is the house adjacency-list relation (SURVEY
  * §1.1 "tree/graph"): an edge DataFrame (src, dst) — no graph library,
  * every step is joins + aggregations, which is also how GraphX/Pregel
  * execute under the hood.
  *
  * DETERMINISM: PageRank is usually float math under nondeterministic
  * aggregation order; this one is INTEGER-exact. Ranks live in units of
  * 1/[[Scale]] (a million "rank micros"), per-edge contributions use
  * integer division, and integer sums are order-independent — so the
  * result is bit-identical across engines, partitionings, and retries,
  * and the DuckDB oracle replays every iteration verbatim. The
  * truncation error vs float PageRank is ≤ outdeg/Scale per node per
  * iteration — noise at Scale = 10⁶.
  */
object Graph {

  /** Rank unit: 1.0 of classic PageRank == `Scale` integer units. */
  val Scale = 1000000L

  /** Damping factor 0.85 as the integer pair (85, 100). */
  val DampNum = 85L
  val DampDen = 100L

  /** Co-occurrence CHAIN edges: within each group (e.g. event type ×
    * hour), order the distinct users by (first event time, id) and link
    * each to its successor. The chain, NOT the clique: a k-user group
    * contributes k−1 edges instead of k·(k−1)/2, so |edges| ≤ |events|
    * by construction and a hot group (every user touching the same
    * page that hour) cannot blow up quadratically — the d11-style cost
    * cliff designed out rather than guarded. Ordering by first-seen
    * time keeps the edge direction meaningful (earlier actor → later
    * actor). Per-group windows partition by the group key — never a
    * global sort.
    */
  def chainEdges(events: DataFrame, groupCols: Seq[Column],
      nodeCol: String, tsCol: String): DataFrame = {
    val gs = groupCols.zipWithIndex.map { case (c, i) => c.as(s"__g$i") }
    val gNames = gs.indices.map(i => col(s"__g$i"))
    // a NULL node would chain as a phantom member (null src/dst edges
    // downstream); drop such rows instead — same for a null timestamp,
    // which would sort indeterminately between engines
    val members = events
      .where(col(nodeCol).isNotNull && col(tsCol).isNotNull)
      .select(gs :+ col(nodeCol) :+ col(tsCol): _*)
      .groupBy(gNames :+ col(nodeCol): _*)
      .agg(min(col(tsCol)).as("__mts"))
    val w = Window.partitionBy(gNames: _*)
      .orderBy(col("__mts"), col(nodeCol))
    members
      .select(col(nodeCol).as("dst"), lag(col(nodeCol), 1).over(w).as("src"))
      .where(col("src").isNotNull)
      .select("src", "dst").distinct()
  }

  /** Integer PageRank over `edges` (src, dst), `iterations` rounds,
    * Pregel-example semantics (rank = 0.15·Scale + 0.85·Σ in-contribs;
    * no global normalization, dangling mass drops — the classic
    * distributed formulation). Returns (node, pagerank long) for every
    * node appearing in any edge.
    *
    * Scale shape: the edge relation (with out-degree attached) and the
    * node list are built once and checkpointed; each iteration is one
    * rank⋈edge equi-join on src, one map-side-combinable integer sum by
    * dst, and one node-sized left join — the textbook Pregel superstep
    * as relational algebra, shuffle-bound on the edge key. Ranks are
    * node-sized. Unlike the CC family's data-dependent fixpoint, the
    * unrolled loop here is LINEAR lineage (each superstep references
    * the previous ranks exactly once, and the fan-in relations ewd /
    * nodes are already truncated), so the whole k-superstep plan
    * executes as ONE action — no per-iteration checkpoint latency;
    * measured 4.7 s → ~2 s at sf0.1 for 5 supersteps. For very large
    * `iterations` a caller would re-introduce a checkpoint every ~10
    * supersteps to bound planning time.
    */
  def pageRank(edges: DataFrame, iterations: Int = 5,
      seed: Option[DataFrame] = None): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val e = edges.select(col("src"), col("dst")).localCheckpoint(true)
    val od = e.groupBy("src").agg(count(lit(1)).as("__od"))
    val ewd = e.join(od, "src")
      .select(col("src"), col("dst"), col("__od")).localCheckpoint(true)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct().localCheckpoint(true)
    val base = lit(Scale * (DampDen - DampNum) / DampDen)
    var ranks = seededRanks(nodes, seed)
    for (_ <- 1 to iterations) {
      val inc = ranks.join(ewd, ranks("node") === ewd("src"))
        .select(col("dst"),
          expr(s"($DampNum * __r) div ($DampDen * __od)").as("__c"))
        .groupBy("dst").agg(sum(col("__c")).as("__inc"))
      ranks = nodes.join(inc, nodes("node") === inc("dst"), "left")
        .select(col("node"), (base + coalesce(col("__inc"), lit(0L))).as("__r"))
    }
    ranks.select(col("node"), col("__r").as("pagerank"))
  }

  /** Initial rank vector: uniform `Scale`, or — the WARM START
    * (round 7) — yesterday's persisted (node, pagerank) relation. New
    * nodes (absent from the seed — a graph delta) start at `Scale`;
    * departed nodes drop via the join. Because the integer superstep is
    * a deterministic map, resuming k steps from a k-step cold run
    * equals a 2k-step cold run EXACTLY (g06's oracle states the 2k
    * unroll), and a converged warm start re-reaches the fixpoint in a
    * fraction of the supersteps after a small delta (spec-measured).
    */
  private def seededRanks(nodes: DataFrame, seed: Option[DataFrame]): DataFrame =
    seed match {
      case None => nodes.select(col("node"), lit(Scale).as("__r"))
      case Some(s) =>
        nodes.join(s.select(col("node"), col("pagerank").as("__seed")),
            Seq("node"), "left")
          .select(col("node"), coalesce(col("__seed"), lit(Scale)).as("__r"))
    }

  /** Personalized PageRank (g11): the teleport mass lands only on the
    * SEED set — rank(v) = [v ∈ S]·(1−d)·Scale + d·Σ in-contributions —
    * so ranks measure proximity TO the seeds (random walks restart at
    * S, never uniformly), the seed-relative relevance a
    * recommendation / similar-entity query runs where global
    * PageRank's uniform teleport would wash the locality out. Same
    * deterministic integer machinery as [[pageRank]] (Scale units,
    * integer-division contributions, order-independent sums —
    * bit-identical across engines/partitionings/retries; the oracle
    * replays the k-superstep unroll with the seed-conditional base);
    * non-seed nodes unreachable from S converge to exactly 0. Each
    * superstep is one rank⋈edge equi-join + one map-side-combined
    * sum; the seed flag rides the checkpointed node relation, so
    * personalization adds no extra join.
    */
  def personalizedPageRank(edges: DataFrame, seeds: DataFrame,
      iterations: Int = 5): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val e = edges.select(col("src"), col("dst")).localCheckpoint(true)
    val od = e.groupBy("src").agg(count(lit(1)).as("__od"))
    val ewd = e.join(od, "src")
      .select(col("src"), col("dst"), col("__od")).localCheckpoint(true)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
    val flagged = nodes
      .join(seeds.select(col("node")).distinct().withColumn("__s", lit(1L)),
        Seq("node"), "left")
      .select(col("node"), coalesce(col("__s"), lit(0L)).as("__s"))
      .localCheckpoint(true)
    val baseVal = Scale * (DampDen - DampNum) / DampDen
    var ranks = flagged.select(col("node"), (col("__s") * Scale).as("__r"))
    for (_ <- 1 to iterations) {
      val inc = ranks.join(ewd, ranks("node") === ewd("src"))
        .select(col("dst"),
          expr(s"($DampNum * __r) div ($DampDen * __od)").as("__c"))
        .groupBy("dst").agg(sum(col("__c")).as("__inc"))
      ranks = flagged.join(inc, flagged("node") === inc("dst"), "left")
        .select(col("node"),
          (col("__s") * baseVal + coalesce(col("__inc"), lit(0L))).as("__r"))
    }
    ranks.select(col("node"), col("__r").as("pagerank"))
  }

  /** [[pageRank]] with a residual stop for callers who need CONVERGED
    * ranks rather than a fixed-depth approximation: supersteps run in
    * blocks of `checkEvery`, and after each block one extra action
    * computes the residual max |Δrank| (in integer rank units); the
    * loop stops when it drops below `epsilonUnits` or at
    * `maxIterations`. Returns (ranks, superstepsRun).
    *
    * Integer ranks make the stop EXACT as well as cheap: with
    * `epsilonUnits = 1` the loop runs until the rank vector is
    * literally a fixpoint (float PageRank can only ever approach one),
    * and the result is bit-reproducible like g01's.
    *
    * Action economics: the fixed-depth variant is ONE action for k
    * supersteps; this one pays ⌈k/checkEvery⌉ extra residual actions
    * plus a checkpoint per block (which also keeps the unrolled plan
    * from growing unboundedly at large k). Raise `checkEvery` when
    * actions dominate (deep convergence), lower it when supersteps are
    * expensive (huge graphs).
    */
  def pageRankConverged(edges: DataFrame, maxIterations: Int = 50,
      epsilonUnits: Long = 1L, checkEvery: Int = 5,
      seed: Option[DataFrame] = None): (DataFrame, Int) = {
    require(maxIterations >= 1 && checkEvery >= 1 && epsilonUnits >= 0,
      s"bad args: maxIterations=$maxIterations checkEvery=$checkEvery " +
        s"epsilonUnits=$epsilonUnits")
    val e = edges.select(col("src"), col("dst")).localCheckpoint(true)
    val od = e.groupBy("src").agg(count(lit(1)).as("__od"))
    val ewd = e.join(od, "src")
      .select(col("src"), col("dst"), col("__od")).localCheckpoint(true)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct().localCheckpoint(true)
    val base = lit(Scale * (DampDen - DampNum) / DampDen)
    var ranks = seededRanks(nodes, seed).localCheckpoint(true)
    var done = 0
    var converged = false
    while (done < maxIterations && !converged) {
      val block = math.min(checkEvery, maxIterations - done)
      var cur = ranks
      for (_ <- 1 to block) {
        val inc = cur.join(ewd, cur("node") === ewd("src"))
          .select(col("dst"),
            expr(s"($DampNum * __r) div ($DampDen * __od)").as("__c"))
          .groupBy("dst").agg(sum(col("__c")).as("__inc"))
        cur = nodes.join(inc, nodes("node") === inc("dst"), "left")
          .select(col("node"), (base + coalesce(col("__inc"), lit(0L))).as("__r"))
      }
      val next = cur.localCheckpoint(true)
      done += block
      val residual = next.as("n")
        .join(ranks.as("p"), col("n.node") === col("p.node"))
        .agg(coalesce(max(abs(col("n.__r") - col("p.__r"))), lit(0L)))
        .head().getLong(0)
      ranks.unpersist()
      ranks = next
      converged = residual < epsilonUnits
    }
    (ranks.select(col("node"), col("__r").as("pagerank")), done)
  }

  /** Per-node triangle participation counts over an undirected graph
    * given as (src, dst) edge rows (direction ignored; self-loops and
    * duplicate edges collapsed). Returns (node, n_triangles) for every
    * node in ≥ 1 triangle.
    *
    * Edges are oriented by the DEGREE total order ((deg, id), low →
    * high) — the orientation web-scale triangle counting ships: a
    * consistent total order makes the oriented graph acyclic, so every
    * triangle has exactly one x→y→z chain plus its closing x→z edge
    * and the two-join plan counts it once; and degree-ordering bounds
    * max out-degree by O(√m) BY CONSTRUCTION, so the wedge volume
    * Σ outdeg² cannot be detonated by a hub (a plain id order lets one
    * low-id hub go quadratic). Both joins shuffle on node keys.
    */
  def triangleCounts(edges: DataFrame): DataFrame = {
    val und = edges
      .where(col("src").isNotNull && col("dst").isNotNull &&
        col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .distinct().localCheckpoint(true)
    val deg = und.select(col("u").as("n"))
      .union(und.select(col("v").as("n")))
      .groupBy("n").agg(count(lit(1)).as("dg"))
    val o = und
      .join(deg.select(col("n").as("u"), col("dg").as("du")), Seq("u"))
      .join(deg.select(col("n").as("v"), col("dg").as("dv")), Seq("v"))
      .select(
        when(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")),
          struct(col("u").as("a"), col("v").as("b")))
          .otherwise(struct(col("v").as("a"), col("u").as("b"))).as("e"))
      .select(col("e.a").as("a"), col("e.b").as("b"))
      .localCheckpoint(true)
    val tri = o.as("e1")
      .join(o.as("e2"), col("e1.b") === col("e2.a"))
      .join(o.as("e3"),
        col("e1.a") === col("e3.a") && col("e2.b") === col("e3.b"))
      .select(col("e1.a").as("x"), col("e1.b").as("y"), col("e2.b").as("z"))
      .localCheckpoint(true)
    tri.select(col("x").as("node"))
      .union(tri.select(col("y").as("node")))
      .union(tri.select(col("z").as("node")))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
  }

  /** k-core decomposition by iterative peeling: the maximal subgraph
    * in which every node has degree >= k — the community/bot-ring/
    * influence-core primitive (a dense core survives peeling; casual
    * periphery does not). Each round recomputes degrees over the
    * SURVIVING edge set and drops nodes below k; removal cascades
    * (dropping a node can push its neighbors under k), so peeling
    * repeats until a fixpoint.
    *
    * Scale shape: one map-side-combined degree count + two semi-joins
    * per round, each over the (shrinking) surviving edge relation;
    * rounds are bounded by the cascade depth, not the node count
    * (real graphs converge in a handful). Every round checkpoints —
    * the [[pageRank]] linear-lineage rule — and the convergence test
    * is ONE count action per round over that checkpointed relation
    * (the [[pageRankConverged]] discipline). A graph that has not
    * converged within `maxRounds` throws LOUDLY: returning a
    * partially peeled subgraph would silently claim core membership
    * for nodes the next cascade removes. Converged output is the
    * exact fixpoint, so an oracle unrolling MORE rounds than needed
    * replays it verbatim (peeling is idempotent at the fixpoint).
    *
    * Returns (node, core_degree) for surviving nodes — core_degree is
    * the degree WITHIN the core (>= k by construction).
    */
  def kCore(edges: DataFrame, k: Int, maxRounds: Int = 12): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(maxRounds >= 1, s"maxRounds must be >= 1, got $maxRounds")
    def degrees(e: DataFrame): DataFrame =
      e.select(col("a").as("node"))
        .union(e.select(col("b").as("node")))
        .groupBy("node").agg(count(lit(1)).as("deg"))
    var e = edges
      .where(col("src").isNotNull && col("dst").isNotNull &&
        col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct().localCheckpoint(true)
    var nEdges = e.count()
    var converged = false
    var round = 0
    while (!converged && round < maxRounds) {
      val keep = degrees(e).where(col("deg") >= k).select("node")
      val next = e
        .join(keep.withColumnRenamed("node", "a"), Seq("a"), "left_semi")
        .join(keep.withColumnRenamed("node", "b"), Seq("b"), "left_semi")
        .localCheckpoint(true)
      val n = next.count()
      converged = n == nEdges
      e = next; nEdges = n; round += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"kCore: not converged after $maxRounds peel rounds " +
          s"($nEdges edges remain) — raise maxRounds; a partial peel " +
          "is NOT a k-core.")
    degrees(e).withColumnRenamed("deg", "core_degree")
  }

  /** Ancestor transitive closure over a parent-pointer FOREST — the
    * engine's answer to `WITH RECURSIVE` (Spark has no recursive CTE;
    * the reference's output schema is exactly this adjacency list,
    * `main_ingest.py:211-212`, and "reconstruct hierarchy by
    * self-joins" is its documented query pattern). Returns one row per
    * (node, ancestor, depth ≥ 1) pair up to `maxDepth`.
    *
    * Contract: `edges` is (node, parent) with at most one parent per
    * node (a forest — XML trees, org charts, category trees). Each
    * (node, ancestor) pair then has exactly ONE path, so the unrolled
    * frontier extension generates no duplicates and needs no distinct.
    * For DAG inputs, dedup/min-depth policy is the caller's.
    *
    * Scale shape: `maxDepth` frontier extensions, each one equi-join of
    * the (≤ node-count) frontier against the edge relation — shuffle on
    * the ancestor key; the frontier EMPTIES once depth exceeds the
    * actual tree height, so over-provisioned maxDepth costs empty joins
    * only (no action per round; the whole unrolled plan is one job —
    * the [[pageRank]] linear-lineage rule). For depth ≫ 10 use
    * [[ancestorClosureDoubling]] (log₂ rounds).
    */
  def ancestorClosure(edges: DataFrame, maxDepth: Int = 8): DataFrame = {
    require(maxDepth >= 1, s"maxDepth must be >= 1, got $maxDepth")
    val e = edges.select(col("node"), col("parent")).localCheckpoint(true)
    val d1 = e.select(col("node"), col("parent").as("ancestor"),
      lit(1L).as("depth"))
    var acc = d1
    var frontier = d1
    for (d <- 2 to maxDepth) {
      frontier = frontier
        .join(e.select(col("node").as("ancestor"), col("parent").as("__gp")),
          Seq("ancestor"))
        .select(col("node"), col("__gp").as("ancestor"), lit(d.toLong).as("depth"))
      acc = acc.unionByName(frontier)
    }
    acc
  }

  /** Multi-source BFS hop distances — the reachability/blast-radius
    * view (how far does influence propagate from a seed set): every
    * node's MINIMUM directed hop count from any seed, bounded by
    * `maxDepth`. Level-synchronous frontier expansion — round d joins
    * the frontier to the edge relation and anti-joins everything
    * already labeled, so a node is claimed exactly once at its true
    * minimum distance (the visited-set pruning that keeps the work
    * per round ∝ NEW nodes, where a naive unrolled walk re-expands
    * every path — exponential on diamond-shaped graphs). Frontier and
    * accumulator checkpoint per round (the CC/closure discipline);
    * rounds after the frontier empties cost empty joins only.
    * Seeds not present in the graph surface at dist 0 (stated).
    * Output: (id, dist long).
    */
  def bfsDistances(edges: DataFrame, seeds: DataFrame,
      maxDepth: Int = 8): DataFrame = {
    require(maxDepth >= 0, s"maxDepth must be >= 0, got $maxDepth")
    val e = edges.select(col("src"), col("dst")).localCheckpoint(true)
    var dist = seeds.select(col("id")).distinct()
      .select(col("id"), lit(0L).as("dist")).localCheckpoint(true)
    var frontier = dist
    for (d <- 1 to maxDepth) {
      frontier = frontier.select(col("id").as("src"))
        .join(e, Seq("src"))
        .select(col("dst").as("id")).distinct()
        .join(dist.select("id"), Seq("id"), "left_anti")
        .select(col("id"), lit(d.toLong).as("dist"))
        .localCheckpoint(true)
      dist = dist.unionByName(frontier).localCheckpoint(true)
    }
    dist
  }

  /** [[ancestorClosure]] in ⌈log₂ maxDepth⌉ rounds instead of maxDepth
    * — the deep-hierarchy variant (org trees, category taxonomies,
    * thread chains with depth 100+, where 100 sequential frontier
    * joins would serialize the plan).
    *
    * Path doubling without a distinct: alongside the accumulated
    * closure `acc` (all pairs with depth ≤ k) it carries the EXACT-k
    * pointer table `p` (each node's 2^i-th ancestor — one row per node
    * that deep, because a forest has one path up). One round doubles
    * both:
    *
    *   acc₂ₖ = accₖ ∪ (accₖ ⋈ pₖ)   — depth d in 1..k extends to d+k;
    *                                   every pair of depth k+1..2k
    *                                   decomposes UNIQUELY as
    *                                   (d−k ≤ k via acc) + (k via p),
    *                                   so no duplicates arise and no
    *                                   distinct is needed (the
    *                                   DAG-input caveat of
    *                                   ancestorClosure applies here
    *                                   unchanged);
    *   p₂ₖ  = pₖ ⋈ pₖ                — the 2k-th ancestor pointer.
    *
    * Both sides are checkpointed per round: the doubling join
    * references accₖ twice, so an unchecked plan would double in SIZE
    * each round (2^rounds operator copies by round 7) — the eager
    * checkpoint pins each round to one action and keeps every plan
    * flat, the price path doubling pays for exponentially fewer
    * rounds. `p` empties once 2^i exceeds the forest height, so
    * over-provisioned maxDepth costs log₂ near-empty rounds.
    *
    * Output is filtered to depth ≤ maxDepth (the final doubling may
    * overshoot to the next power of two) — row-for-row equal to
    * `ancestorClosure(edges, maxDepth)` (property-spec'd on random
    * forests in `GraphSpec`).
    */
  def ancestorClosureDoubling(edges: DataFrame, maxDepth: Int = 64): DataFrame = {
    require(maxDepth >= 1, s"maxDepth must be >= 1, got $maxDepth")
    val e = edges.select(col("node"), col("parent")).localCheckpoint(true)
    var acc = e.select(col("node"), col("parent").as("ancestor"),
      lit(1L).as("depth"))
    var p = e.select(col("node"), col("parent").as("ancestor"))
    var k = 1L
    while (k < maxDepth) {
      val ext = acc.as("a")
        .join(p.as("p"), col("a.ancestor") === col("p.node"))
        .select(col("a.node").as("node"), col("p.ancestor").as("ancestor"),
          (col("a.depth") + k).as("depth"))
      acc = acc.unionByName(ext).localCheckpoint(true)
      p = p.as("l").join(p.as("r"), col("l.ancestor") === col("r.node"))
        .select(col("l.node").as("node"), col("r.ancestor").as("ancestor"))
        .localCheckpoint(true)
      k = k * 2
    }
    acc.where(col("depth") <= maxDepth)
  }

  /** Min-label fixpoint with POINTER JUMPING — the shared kernel of
    * [[stronglyConnectedComponents]]'s two phases. Propagates
    * `min(label)` along `rel`'s (from → to) direction until no label
    * shrinks: each iteration is one relax (edge groupBy-min) plus one
    * jump (labels chase their own label's label — f(v) ← min(f(v),
    * f(f(v))), valid because "x's label reaches x" is an invariant
    * both steps preserve), so a length-d chain converges in O(log d)
    * iterations instead of d — the path-doubling discipline of
    * [[ancestorClosureDoubling]] applied to labels. One count action
    * per iteration over the checkpointed label relation; throws
    * loudly on non-convergence ([[kCore]] rule).
    */
  private def minLabelFixpoint(nodes: DataFrame, rel: DataFrame,
      maxIters: Int, what: String): DataFrame = {
    var f = nodes.select(col("id"), col("id").as("lbl")).localCheckpoint(true)
    var changed = 1L
    var it = 0
    while (changed > 0 && it < maxIters) {
      val relaxed = rel
        .join(f.select(col("id").as("from"), col("lbl").as("flbl")), Seq("from"))
        .groupBy(col("to").as("id")).agg(min("flbl").as("elbl"))
      val base = f.join(relaxed, Seq("id"), "left")
        .select(col("id"), col("lbl").as("old"),
          least(col("lbl"), coalesce(col("elbl"), col("lbl"))).as("l1"))
        .localCheckpoint(true) // feeds the jump map AND the jump join
      val jmap = base.select(col("id").as("l1"), col("l1").as("l2"))
      val next = base.join(jmap, Seq("l1"), "left")
        .select(col("id"), col("old"),
          least(col("l1"), coalesce(col("l2"), col("l1"))).as("lbl"))
        .localCheckpoint(true)
      changed = next.where(col("lbl") < col("old")).count()
      f = next.select("id", "lbl")
      it += 1
    }
    if (changed > 0)
      throw new IllegalStateException(
        s"stronglyConnectedComponents: $what labeling not converged after " +
          s"$maxIters iterations — raise maxIters (each iteration doubles " +
          "the propagated distance, so this is a pathological graph).")
    f
  }

  /** Strongly connected components over a DIRECTED edge relation —
    * the cycle-detection primitive the weak-CC family (g03) cannot
    * express: u and v share an SCC iff each reaches the other, the
    * "can this cascade loop?" check a schema consumer runs over the
    * reference's FK edge graph (`main_ingest.py:607-613` — directed
    * parent→child CASCADE edges) and the link-farm/ring detector over
    * the event chain graph.
    *
    * Algorithm: iterative COLORING (the FW-BW-coloring family, Slota
    * et al.'s Multistep shape), all classes processed in parallel per
    * round, each phase the house min-label machinery:
    *
    *  1. forward labels — f(v) = min id that REACHES v (relax + jump,
    *     [[minLabelFixpoint]]). Key closure property: if f(v) = c,
    *     every node on any c→v path also labels c (a smaller label on
    *     the path would have propagated to v), so each color class is
    *     closed under the paths that witness it;
    *  2. within-class backward labels — r(v) = min id v REACHES
    *     through same-class edges; by (1) the class minimum c is
    *     reachable within the class iff v reaches c at all, so
    *     f(v) = c ∧ r(v) = c  ⟺  c →* v ∧ v →* c  ⟺  v ∈ SCC(c);
    *  3. emit those members with scc = c, remove them, repeat on the
    *     remainder — every class loses at least its pivot SCC per
    *     round.
    *
    * Scale shape: each round is two O(log diameter)-iteration label
    * fixpoints over the SHRINKING remainder, every intermediate
    * checkpointed, one count action per iteration. The degenerate
    * regime is a long CHAIN of singleton SCCs (a path graph peels one
    * pivot per round) — real interaction graphs collapse into few
    * dense cores plus periphery and finish in a handful of rounds;
    * the `maxRounds` guard throws LOUDLY with the remainder size
    * rather than returning a partial labeling ([[kCore]] rule).
    * Nodes are the endpoints of non-null edges; self-loops are
    * dropped (they never change an SCC).
    *
    * Returns (id, scc) — scc is the smallest node id in the
    * component, so singleton nodes label themselves.
    */
  def stronglyConnectedComponents(edges: DataFrame, maxRounds: Int = 10,
      maxIters: Int = 30): DataFrame = {
    require(maxRounds >= 1, s"maxRounds must be >= 1, got $maxRounds")
    require(maxIters >= 1, s"maxIters must be >= 1, got $maxIters")
    val e0 = edges
      .where(col("src").isNotNull && col("dst").isNotNull)
      .select(col("src"), col("dst")).distinct().localCheckpoint(true)
    var nodes = e0.select(col("src").as("id"))
      .union(e0.select(col("dst").as("id")))
      .distinct().localCheckpoint(true)
    var e = e0.where(col("src") =!= col("dst")).localCheckpoint(true)
    // start from an EMPTY typed (id, scc) relation, not null: an empty
    // edge input (or all-null endpoints) never enters the round loop,
    // and the contract is "empty decomposition", not an NPE downstream
    var result: DataFrame =
      nodes.withColumn("scc", col("id")).where(lit(false))
    var remaining = nodes.count()
    var round = 0
    while (remaining > 0 && round < maxRounds) {
      val f = minLabelFixpoint(nodes,
        e.select(col("src").as("from"), col("dst").as("to")),
        maxIters, "forward")
      // same-class edge restriction for the backward phase
      val ec = e
        .join(f.select(col("id").as("src"), col("lbl").as("scl")), Seq("src"))
        .join(f.select(col("id").as("dst"), col("lbl").as("dcl")), Seq("dst"))
        .where(col("scl") === col("dcl"))
        .select(col("src"), col("dst")).localCheckpoint(true)
      // backward: propagate "min id I can reach" AGAINST edge direction
      val r = minLabelFixpoint(nodes,
        ec.select(col("dst").as("from"), col("src").as("to")),
        maxIters, "backward")
      val scc = f.join(r.withColumnRenamed("lbl", "rl"), Seq("id"))
        .where(col("lbl") === col("rl"))
        .select(col("id"), col("lbl").as("scc")).localCheckpoint(true)
      result = result.unionByName(scc).localCheckpoint(true)
      nodes = nodes.join(scc.select("id"), Seq("id"), "left_anti")
        .localCheckpoint(true)
      e = e.join(scc.select(col("id").as("src")), Seq("src"), "left_anti")
        .join(scc.select(col("id").as("dst")), Seq("dst"), "left_anti")
        .localCheckpoint(true)
      remaining = nodes.count()
      round += 1
    }
    if (remaining > 0)
      throw new IllegalStateException(
        s"stronglyConnectedComponents: $remaining nodes unassigned after " +
          s"$maxRounds rounds — a long chain of singleton SCCs peels one " +
          "pivot per round; raise maxRounds. A partial labeling is NOT " +
          "an SCC decomposition.")
    result
  }

  /** Label-propagation community detection (synchronous LPA, Raghavan
    * et al. 2007) over an UNDIRECTED edge relation — the clustering
    * step after the s15 k-NN graph that SemDeDup-style curation runs
    * (near-duplicate neighborhoods condense into communities; modules
    * in the interaction graph surface without a modularity solver).
    * Weak CC (g03) answers "touching at all"; LPA answers "densely
    * touching": a single bridge edge joins two cliques into one weak
    * component but LPA keeps them distinct communities.
    *
    * DETERMINISM is the house rule floating-point LPA breaks: updates
    * are SYNCHRONOUS (all nodes vote on the step-t labels — async
    * visit order is scheduler-dependent), the vote is an integer
    * count, and ties break on the smallest label, so the result is
    * identical across partitionings and replayable superstep-by-
    * superstep by the oracle. Classic LPA caveat, stated: synchronous
    * updates can 2-cycle on bipartite-ish structure, which a FIXED
    * superstep count turns into a deterministic output rather than a
    * non-terminating loop — `supersteps` is part of the contract,
    * exactly like the g01 PageRank unroll.
    *
    * Scale shape per superstep: one symmetrized-edge join to the
    * label relation, one (node, label) count groupBy, one per-node
    * window over that node's DISTINCT candidate labels (bounded by
    * degree, never corpus-wide), checkpointed ([[pageRank]] linear-
    * lineage rule). Input rows are (src, dst); direction, self-loops
    * and duplicates are normalized away.
    *
    * Returns (id, community) — community = the surviving label,
    * itself a node id.
    */
  def labelPropagationCommunities(edges: DataFrame,
      supersteps: Int = 4): DataFrame = {
    require(supersteps >= 1, s"supersteps must be >= 1, got $supersteps")
    val sym = edges
      .where(col("src").isNotNull && col("dst").isNotNull &&
        col("src") =!= col("dst"))
      .select(col("src").as("a"), col("dst").as("b"))
      .unionByName(edges
        .where(col("src").isNotNull && col("dst").isNotNull &&
          col("src") =!= col("dst"))
        .select(col("dst").as("a"), col("src").as("b")))
      .distinct().localCheckpoint(true)
    var lbl = sym.select(col("a").as("id")).distinct()
      .select(col("id"), col("id").as("community")).localCheckpoint(true)
    val w = Window.partitionBy("id")
      .orderBy(col("votes").desc, col("cand").asc)
    for (_ <- 1 to supersteps) {
      lbl = sym
        .join(lbl.select(col("id").as("b"), col("community").as("cand")),
          Seq("b"))
        .groupBy(col("a").as("id"), col("cand"))
        .agg(count(lit(1)).as("votes"))
        .withColumn("__rn", row_number().over(w))
        .where(col("__rn") === 1)
        .select(col("id"), col("cand").as("community"))
        .localCheckpoint(true)
    }
    lbl
  }

  /** [[stronglyConnectedComponents]] for SCHEMA-SIZED graphs: the FK
    * cascade graph (x06) has one node per TABLE — dozens, whatever
    * the data volume — so the distributed FW-BW machinery pays ~30
    * scheduler round-trips per peel round to label a relation that
    * fits in one partition. This variant collects the edge list
    * (BOUNDED, enforced loudly — the house bounded-collect rule:
    * model scalars, k seeds, and here a schema's table graph) and
    * runs an iterative Tarjan on the driver. Same contract as the
    * distributed form: (id, scc), scc = the smallest member id,
    * self-loops and null endpoints dropped — the `SccLpaSpec`
    * equivalence test pins the two implementations to each other.
    * Data-scale graphs (g09's event chains) must keep using
    * [[stronglyConnectedComponents]]; the guard here REFUSES rather
    * than degrade into a driver bottleneck.
    */
  def sccBounded(edges: DataFrame, maxEdges: Int = 100000): DataFrame = {
    val spark = edges.sparkSession
    val e0 = edges
      .where(col("src").isNotNull && col("dst").isNotNull)
      .select(col("src").cast("string"), col("dst").cast("string"))
      .distinct()
    val collected = e0.limit(maxEdges + 1).collect()
    require(collected.length <= maxEdges,
      s"sccBounded: edge relation exceeds maxEdges=$maxEdges — this " +
        "entry point is for schema-sized graphs (one node per table); " +
        "use stronglyConnectedComponents for data-scale graphs.")
    val es = collected.map(r => (r.getString(0), r.getString(1)))
    val nodes = (es.map(_._1) ++ es.map(_._2)).distinct.sorted
    val adj = es.filter(p => p._1 != p._2).groupBy(_._1)
      .map { case (s, ps) => s -> ps.map(_._2).sorted.toList }
    // iterative Tarjan (explicit stack — no recursion depth limit)
    val index = scala.collection.mutable.HashMap.empty[String, Int]
    val low = scala.collection.mutable.HashMap.empty[String, Int]
    val onStack = scala.collection.mutable.HashSet.empty[String]
    val stack = scala.collection.mutable.ArrayBuffer.empty[String]
    val comp = scala.collection.mutable.HashMap.empty[String, List[String]]
    var counter = 0
    for (root <- nodes if !index.contains(root)) {
      // explicit DFS frames: fnode(i) with its yet-unscanned successors
      val fnode = scala.collection.mutable.ArrayBuffer.empty[String]
      val fsucc = scala.collection.mutable.ArrayBuffer.empty[List[String]]
      index(root) = counter; low(root) = counter; counter += 1
      stack += root; onStack += root
      fnode += root; fsucc += adj.getOrElse(root, Nil)
      while (fnode.nonEmpty) {
        val v = fnode.last
        fsucc.last match {
          case w :: rest =>
            fsucc(fsucc.length - 1) = rest
            if (!index.contains(w)) { // tree edge: descend
              index(w) = counter; low(w) = counter; counter += 1
              stack += w; onStack += w
              fnode += w; fsucc += adj.getOrElse(w, Nil)
            } else if (onStack(w)) { // back/cross edge into the stack
              low(v) = math.min(low(v), index(w))
            }
          case Nil => // v fully scanned: close the frame
            if (low(v) == index(v)) {
              var members = List.empty[String]
              var done = false
              while (!done) {
                val w = stack.remove(stack.length - 1)
                onStack -= w
                members = w :: members
                done = w == v
              }
              members.foreach(m => comp(m) = members)
            }
            fnode.remove(fnode.length - 1)
            fsucc.remove(fsucc.length - 1)
            if (fnode.nonEmpty) {
              val p = fnode.last
              low(p) = math.min(low(p), low(v))
            }
        }
      }
    }
    val rows = nodes.map(n => (n, comp(n).min))
    import spark.implicits._
    rows.toSeq.toDF("id", "scc")
  }

  /** HyperBall sketch geometry — mirrors the q38 cross-engine HLL
    * contract (m = 64 registers from the low 6 bits of the 32-bit md5
    * hash, 26-bit register values, rho ∈ 1..27, harmonic sum kept as
    * the exact integer Σ 2^(27−rho)) so the per-node sketches below
    * hash-match a DuckDB replay register by register.
    */
  val HbM = 64
  private val HbValueBits = 26

  /** rho(v) = leading zeros of the 26-bit value + 1 (v = 0 → 27): the
    * q38 pure-integer threshold ladder — no log2, whose libm rounding
    * the two engines need not share.
    */
  private def hbRho(v: Column): Column =
    (2 to HbValueBits).foldLeft(
      when(v >= (1L << (HbValueBits - 1)), 1)) { (acc, i) =>
      acc.when(v >= (1L << (HbValueBits - i)), i)
    }.otherwise(HbValueBits + 1)

  /** The same ladder as SQL text — generated, not transcribed (shared
    * with the g12 oracle so the two ladders cannot drift).
    */
  def hbRhoSql(v: String): String =
    (1 to HbValueBits).map { i =>
      s"WHEN $v >= ${1L << (HbValueBits - i)} THEN $i"
    }.mkString("CASE ", " ", s" ELSE ${HbValueBits + 1} END")

  /** HyperBall (Boldi–Vigna 2013): the approximate NEIGHBOURHOOD
    * FUNCTION — for every node v and radius r, |{u : v →≤r u}| — via
    * one HLL sketch per node, max-merged along out-edges each round.
    * This is THE 100 TB way to centralities: the exact ball relation
    * (g04/x04 closures) is Θ(Σ|ball|) rows — quadratic on dense
    * graphs — while HyperBall carries a fixed m-register sketch per
    * node, so a round is one edges⋈registers equi-join + one
    * (id, bucket) max-aggregation (map-side combinable), whatever the
    * ball sizes. Common Crawl's published harmonic-centrality ranks
    * are computed exactly this way.
    *
    * DETERMINISM: registers are integer (bucket, rho) pairs under MAX
    * — order-independent, retry-safe — and the returned harmonic sum
    * `s_present` = Σ 2^(27−rho) is exact integer, so every row
    * hash-matches a register-level DuckDB replay (the q38 contract,
    * per node per radius instead of per source). The float HLL
    * estimate uses the q38 literal-arithmetic formula, identical text
    * both engines.
    *
    * Returns (id, r, n_regs, s_present, hll_estimate) for r = 0..radius
    * — r = 0 is the self-only sketch (the calibration row: its
    * estimate must be ≈1 for every node). Self-loops dropped; rows
    * with null endpoints dropped. Lineage is checkpointed per round
    * ([[pageRank]] linear-lineage rule).
    */
  def hyperBall(edges: DataFrame, radius: Int): DataFrame = {
    require(radius >= 1, s"radius must be >= 1, got $radius")
    val e = edges
      .where(col("src").isNotNull && col("dst").isNotNull &&
        col("src") =!= col("dst"))
      .select(col("src"), col("dst")).distinct().localCheckpoint(true)
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id")))
      .distinct()
    var regs = nodes
      .select(col("id"),
        graft.ops.Dedup.md5Hash32(col("id").cast("string")).as("h"))
      .select(col("id"), pmod(col("h"), lit(HbM.toLong)).as("bucket"),
        hbRho(expr(s"h div $HbM")).as("rho"))
      .localCheckpoint(true)
    def stats(rel: DataFrame, r: Int): DataFrame = {
      val alpha = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(HbM.toDouble))
      rel.groupBy("id").agg(
        count(lit(1)).as("n_regs"),
        sum(expr("shiftleft(cast(1 as bigint), cast(27 - rho as int))"))
          .as("s_present"))
        .select(col("id"), lit(r.toLong).as("r"), col("n_regs"),
          col("s_present"),
          (alpha * lit((HbM * HbM).toDouble) * lit(134217728.0) /
            (col("s_present") +
              (lit(HbM.toLong) - col("n_regs")) * lit(134217728L))
            .cast("double")).as("hll_estimate"))
    }
    var out = stats(regs, 0)
    for (r <- 1 to radius) {
      regs = regs
        .unionByName(e
          .join(regs.select(col("id").as("dst"), col("bucket"), col("rho")),
            Seq("dst"))
          .select(col("src").as("id"), col("bucket"), col("rho")))
        .groupBy("id", "bucket").agg(max(col("rho")).as("rho"))
        .localCheckpoint(true)
      out = out.unionByName(stats(regs, r))
    }
    out
  }

  /** Bipartite projection (g14): from a (node, item) membership
    * relation, the item–item co-occurrence graph — one weighted edge
    * per unordered item pair sharing at least one node, weight = the
    * number of shared nodes. The user→item side of every
    * recommender / "files changed together" / co-view analysis.
    *
    * Scale shape: pairs per node grow QUADRATICALLY in that node's
    * distinct-item count, so the projection's cost is Σ d_n², driven
    * entirely by hub nodes — the same cliff as d11's mega-prefix. The
    * `maxItemsPerNode` cap bounds it by construction: nodes holding
    * more distinct items are dropped before pairing (a bot account
    * touching every item would otherwise contribute |items|²/2 pairs
    * and says nothing about item affinity — dropping hubs is the
    * standard Newman-collaboration-network treatment, and the cap is
    * part of the operator's stated semantics, replayed by the
    * oracle). The self-join is an equi-join on the node key: each
    * node's membership list co-locates in one partition, pairs stream
    * out of the sort-merge join — no broadcast of anything
    * corpus-sized, no cross join.
    *
    * Output: (item_a < item_b, weight ≥ 1).
    */
  def bipartiteProjection(membership: DataFrame, nodeCol: String,
      itemCol: String, maxItemsPerNode: Int = 64): DataFrame = {
    require(maxItemsPerNode >= 2,
      s"maxItemsPerNode must be >= 2, got $maxItemsPerNode")
    val m = membership
      .select(col(nodeCol).as("__n"), col(itemCol).as("__i"))
      .where(col("__n").isNotNull && col("__i").isNotNull)
      .distinct()
    val kept = m.join(
      m.groupBy("__n").agg(count(lit(1)).as("__nd"))
        .where(col("__nd") <= maxItemsPerNode)
        .select("__n"),
      Seq("__n"), "left_semi")
    kept.as("a").join(kept.as("b"),
        col("a.__n") === col("b.__n") && col("a.__i") < col("b.__i"))
      .groupBy(col("a.__i").as("item_a"), col("b.__i").as("item_b"))
      .agg(count(lit(1)).as("weight"))
  }

  /** Resource-allocation link prediction (g15, Zhou–Lü–Zhang 2009):
    * for every NON-adjacent node pair (x, y) with common neighbors,
    * score(x, y) = Σ_{z ∈ N(x) ∩ N(y)} 1/deg(z) — common neighbors
    * weighted down by how promiscuous they are (a shared hub predicts
    * nothing; a shared degree-2 node predicts a lot). Chosen over
    * Adamic–Adar because 1/deg is RATIONAL: in micro-units
    * (`micro div deg(z)`, integer division) the score is exact and
    * order-free, so it hash-matches the oracle bit-for-bit — the
    * house integer discipline; log-weighted variants cannot state
    * that.
    *
    * Scale shape: wedges are generated by one self-equi-join of the
    * adjacency relation on the CENTER z — Σ deg(z)² rows, the same
    * hub-driven cost as [[bipartiteProjection]], bounded the same
    * way: centers past `maxWedgeDegree` are dropped (their per-wedge
    * contribution `micro div deg` is already the smallest in the
    * graph, so the cap removes the most expensive and least
    * informative wedges first — cap semantics replayed by the
    * oracle). The existing-edge exclusion is one left-anti equi-join
    * on the canonical pair key.
    *
    * Output: (node_a < node_b, n_common, ra_score_micro).
    */
  def resourceAllocation(edges: DataFrame, maxWedgeDegree: Int = 256,
      micro: Long = 1000000L): DataFrame = {
    require(maxWedgeDegree >= 2,
      s"maxWedgeDegree must be >= 2, got $maxWedgeDegree")
    val und = edges
      .where(col("src").isNotNull && col("dst").isNotNull &&
        col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct().localCheckpoint(true)
    val adj = und.select(col("a").as("z"), col("b").as("n"))
      .unionByName(und.select(col("b").as("z"), col("a").as("n")))
    val deg = adj.groupBy("z").agg(count(lit(1)).as("degz"))
    val adjd = adj.join(deg.where(col("degz") <= maxWedgeDegree), Seq("z"))
    adjd.as("l").join(adjd.as("r"),
        col("l.z") === col("r.z") && col("l.n") < col("r.n"))
      .select(col("l.n").as("a"), col("r.n").as("b"),
        call_function("div", lit(micro), col("l.degz")).as("__c"))
      .join(und, Seq("a", "b"), "left_anti")
      .groupBy(col("a").as("node_a"), col("b").as("node_b"))
      .agg(count(lit(1)).as("n_common"), sum(col("__c")).as("ra_score_micro"))
  }
}
