package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed graph primitives for dedup clustering.
  *
  * Near-duplicate detection yields PAIRS; deduplication needs CLUSTERS
  * (keep one survivor per connected component — pair-wise greedy rules
  * are not transitive: A~B and B~C must group A,B,C even when A~C fails
  * the threshold). Connected components is the bridge.
  */
object Graphs {

  /** Connected components by iterative min-label propagation: every node
    * starts labeled with its own id; each round a node takes the minimum
    * label among itself and its neighbors; at fixpoint every component is
    * labeled with its minimum member id (deterministic — no tie to break).
    *
    * Scale shape: each round is one shuffle-join of the (undirected) edge
    * list against the label table, grouped on the node — O(E) per round,
    * rounds ≤ the graph diameter (near-dup graphs are unions of small
    * cliques, diameter 2-3; `maxIter` bounds adversarial chains, and hitting
    * it raises rather than returning silently-wrong labels). Each round
    * materializes via localCheckpoint so the loop's lineage (and Catalyst
    * re-analysis cost) stays flat instead of growing exponentially.
    *
    * Returns (id, component) for every node that appears in `edges`;
    * isolated nodes never enter the edge list, so the caller left-joins
    * and coalesces to the node's own id.
    */
  def connectedComponents(edges: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 25, driverThreshold: Long = 1L << 18): DataFrame = {
    // Symmetrize in ONE scan of `edges` (explode both directions per row),
    // not a union of two selects: `edges` is typically the uncached output
    // of an expensive pair pipeline (minhash LSH + confirm), and a
    // two-branch union would execute that pipeline twice — measured as the
    // bulk of q55's round-2 cost.
    val sym = graft.CacheScope.register(
      edges.select(explode(array(
          struct(col(aCol).cast("long").as("src"), col(bCol).cast("long").as("dst")),
          struct(col(bCol).cast("long").as("src"), col(aCol).cast("long").as("dst"))))
        .as("__e"))
        .select(col("__e.src").as("src"), col("__e.dst").as("dst"))
        .filter(col("src").isNotNull && col("dst").isNotNull)
        .distinct())
    // Near-dup pair sets are tiny relative to their corpus (pairs are the
    // EXCEPTION); below the threshold a driver union-find answers in one
    // job where the distributed loop pays ~4 jobs per round. The loop
    // below remains the path for genuinely large edge sets. Threshold
    // sizing: 256k edges ≈ 4 MB raw, but boxed HashMap entries and the
    // intermediate collections cost ~30x raw — worst case ~150 MB
    // transient on the driver, safe for typical driver heaps; raise it
    // only with the heap.
    if (sym.count() <= driverThreshold) return driverUnionFind(sym)
    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("component", col("id"))
      .localCheckpoint(true)
    var converged = false
    var it = 0
    while (!converged && it < maxIter) {
      val neighborMin = sym
        .join(labels.withColumnRenamed("id", "dst"), "dst")
        .groupBy(col("src").as("id"))
        .agg(min(col("component")).as("__nmin"))
      val next = labels.join(neighborMin, Seq("id"), "left")
        .select(col("id"),
          least(col("component"), coalesce(col("__nmin"), col("component")))
            .as("component"),
          (col("__nmin") < col("component")).as("__changed"))
        .localCheckpoint(true)
      // one cheap aggregate over the just-checkpointed blocks (no
      // recompute); coalesce covers the all-null edge case defensively
      converged = !next.agg(coalesce(max(col("__changed")), lit(false)))
        .first().getBoolean(0)
      labels = next.drop("__changed")
      it += 1
    }
    require(converged, s"connectedComponents did not converge in $maxIter rounds")
    labels
  }

  /** k-core of an undirected graph: the maximal subgraph in which every
    * node keeps degree ≥ k, found by iterative peeling — drop every node
    * whose CURRENT degree is < k, recompute degrees, repeat until stable
    * (Seidman, "Network structure and minimum degree", 1983; Batagelj &
    * Zaveršnik's peel in dataflow form). On a near-dup graph the k-core
    * is the "template/spam nucleus": tight boilerplate families survive
    * peeling, incidental pairwise matches don't — the standard
    * cluster-triage signal one notch stronger than degree (q200) and
    * cheaper than triangles (q185).
    *
    * Exact, integer-only, deterministic. The peel is REPLAYABLE as
    * `maxRounds` unrolled SQL rounds: once the set is stable a peel
    * round is the identity, so an engine that always unrolls maxRounds
    * computes the same fixpoint this loop reaches early — the require
    * guarantees maxRounds sufficed (fail loudly, never silently
    * under-peel; the [[connectedComponents]] contract).
    *
    * Scale shape: per round, one degree aggregate + two semi-joins over
    * the surviving edge list — O(E) per round, lineage cut per round via
    * localCheckpoint. Rounds needed = peel depth, small for clique-like
    * near-dup graphs (their degrees sit far above or below k).
    *
    * Returns (id, core_degree) for k-core members — degree WITHIN the
    * core, ≥ k by construction.
    *
    * Fast path: below `driverEdgeThreshold` the peel runs on the driver
    * (the [[connectedComponents]] driverUnionFind argument — near-dup
    * pair sets are tiny relative to their corpus, and each distributed
    * round costs ~4 scheduled jobs where the driver does the whole
    * fixpoint in microseconds; measured 15.1 s → LSH-pipeline-only cost
    * at sf0.1). Identical simultaneous-peel semantics, identical round
    * accounting against `maxRounds`, bit-identical (id, core_degree)
    * output; the distributed loop below remains the path for genuinely
    * large graphs.
    */
  def kCore(edges: DataFrame, aCol: String, bCol: String, k: Int,
      maxRounds: Int = 8, driverEdgeThreshold: Long = 1L << 18): DataFrame = {
    require(k >= 1 && maxRounds >= 1)
    val spark = edges.sparkSession
    var sym = graft.CacheScope.register(
      edges.select(explode(array(
          struct(col(aCol).cast("long").as("src"), col(bCol).cast("long").as("dst")),
          struct(col(bCol).cast("long").as("src"), col(aCol).cast("long").as("dst"))))
        .as("__e"))
        .select(col("__e.src").as("src"), col("__e.dst").as("dst"))
        .filter(col("src").isNotNull && col("dst").isNotNull)
        .distinct())
    var nEdges = sym.count()
    if (nEdges <= driverEdgeThreshold) {
      var cur = sym.collect().map(r => (r.getLong(0), r.getLong(1)))
      var n = cur.length
      var converged = false
      var round = 0
      while (!converged && round < maxRounds) {
        val deg = scala.collection.mutable.HashMap.empty[Long, Int]
          .withDefaultValue(0)
        cur.foreach { case (s, _) => deg(s) += 1 }
        val next = cur.filter { case (s, d) => deg(s) >= k && deg(d) >= k }
        converged = next.length == n
        cur = next
        n = next.length
        round += 1
      }
      require(converged || n == 0,
        s"kCore(k=$k) did not stabilize in $maxRounds rounds — raise maxRounds")
      val out = cur.groupBy(_._1).toSeq
        .map { case (s, g) => (s, g.length.toLong) }.sortBy(_._1)
      import spark.implicits._
      return out.toDF("id", "core_degree")
    }
    var converged = false
    var round = 0
    while (!converged && round < maxRounds) {
      val keep = sym.groupBy("src").agg(count(lit(1)).as("__d"))
        .filter(col("__d") >= k)
        .select(col("src").as("__k"))
      val next = sym
        .join(keep.withColumnRenamed("__k", "src"), Seq("src"), "left_semi")
        .join(keep.withColumnRenamed("__k", "dst"), Seq("dst"), "left_semi")
        .localCheckpoint(true)
      val m = next.count()
      converged = m == nEdges
      sym = next
      nEdges = m
      round += 1
    }
    require(converged || nEdges == 0,
      s"kCore(k=$k) did not stabilize in $maxRounds rounds — raise maxRounds")
    sym.groupBy(col("src").as("id")).agg(count(lit(1)).as("core_degree"))
  }

  /** Fixed-point PageRank over an undirected edge list (k power
    * iterations, damping 0.85), used to rank documents inside near-dup
    * neighborhoods (a centrality-based canonical-pick signal that degree
    * alone misses: a doc bridging two clusters outranks a leaf of one).
    *
    * Ranks are carried as BIGINT micro-units (`scaleMicro` = 1e12 ≡ rank
    * 1.0) and every step is integer arithmetic — contribution =
    * `rank div degree`, damping = `(85 * x) div 100` — so the result is
    * bit-identical regardless of partitioning, summation order, or engine
    * (the DuckDB oracle replays the same truncating divisions). Total
    * fixed-point truncation loss per iteration is < N ulps of 1e-12 —
    * irrelevant for ranking, essential for replayability.
    *
    * Scale shape: each iteration is one broadcast-or-shuffle join of the
    * edge list against the rank table plus one sum-aggregate on the
    * destination — O(E) per round, `iters` rounds, lineage flattened per
    * round via localCheckpoint. Dangling mass (isolated nodes — near-dup
    * singletons) is a scalar aggregate redistributed uniformly, exactly as
    * the canonical formulation requires; without it total mass leaks and
    * ranks of connected docs inflate.
    *
    * `nodes` is the full node universe (isolated nodes get base rank and
    * donate their dangling mass); `edges` is one row per undirected pair.
    */
  def pageRank(nodes: DataFrame, idCol: String, edges: DataFrame,
      aCol: String, bCol: String, iters: Int = 3,
      scaleMicro: Long = 1000000000000L,
      driverEdgeThreshold: Long = 1L << 18): DataFrame = {
    val spark = edges.sparkSession
    val sym = graft.CacheScope.register(
      edges.select(explode(array(
          struct(col(aCol).cast("long").as("src"), col(bCol).cast("long").as("dst")),
          struct(col(bCol).cast("long").as("src"), col(aCol).cast("long").as("dst"))))
        .as("__e"))
        .select(col("__e.src").as("src"), col("__e.dst").as("dst"))
        .filter(col("src").isNotNull && col("dst").isNotNull)
        .distinct())
    val deg = graft.CacheScope.register(
      sym.groupBy(col("src").as("id")).agg(count(lit(1)).as("outdeg")))
    val ids = graft.CacheScope.register(
      nodes.select(col(idCol).cast("long").as("id")))
    val n = ids.count()
    require(n > 0, "pageRank: empty node universe")
    val init = scaleMicro / n
    val base = (15L * init) / 100L
    if (n <= driverEdgeThreshold && sym.count() <= driverEdgeThreshold) {
      // Fast path (the connectedComponents/markovStationary bounded-
      // domain argument): iters tiny shuffle rounds cost more in
      // scheduling than the arithmetic — run the IDENTICAL truncating-
      // integer fixed point on collected arrays; exact integer sums are
      // order-independent, so the result is bit-equal to the
      // distributed loop (spec-pinned).
      import spark.implicits._
      val es = sym.as[(Long, Long)].collect()
      val degM = es.groupBy(_._1).map { case (s, g) => s -> g.length.toLong }
      val idArr = ids.as[Long].collect()
      var r = scala.collection.mutable.HashMap(
        idArr.map(_ -> init).toIndexedSeq: _*)
      for (_ <- 1 to iters) {
        val dangShare =
          idArr.iterator.filterNot(degM.contains).map(r).sum / n
        val in = scala.collection.mutable.HashMap.empty[Long, Long]
          .withDefaultValue(0L)
        // r.get mirrors the distributed loop's inner join with rank: an
        // edge source outside the node universe contributes nothing
        // instead of throwing
        es.foreach { case (s, d) =>
          r.get(s).foreach(v => in(d) += v / degM(s)) }
        r = scala.collection.mutable.HashMap(idArr.map(id =>
          id -> (base + (85L * (in.getOrElse(id, 0L) + dangShare)) / 100L))
          .toIndexedSeq: _*)
      }
      return idArr.sorted.map(id => (id, r(id))).toSeq
        .toDF(idCol, "rank_micro")
    }
    var rank = ids.withColumn("r", lit(init))
    var it = 0
    while (it < iters) {
      // dangling mass: nodes with no outgoing edge donate their whole rank,
      // redistributed uniformly (scalar agg — one tiny driver round-trip)
      val dangTotal = rank.join(deg, Seq("id"), "left_anti")
        .agg(coalesce(sum(col("r")), lit(0L))).first().getLong(0)
      val dangShare = dangTotal / n
      val in = sym
        .join(rank.withColumnRenamed("id", "src"), "src")
        .join(deg.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"), expr("r div outdeg").as("c"))
        .groupBy("id").agg(sum(col("c")).as("s"))
      rank = ids.join(in, Seq("id"), "left")
        .select(col("id"),
          (lit(base) + expr(s"(85 * (coalesce(s, 0L) + ${dangShare}L)) div 100"))
            .as("r"))
        .localCheckpoint(true)
      it += 1
    }
    rank.select(col("id").as(idCol), col("r").as("rank_micro"))
  }

  /** PERSONALIZED PageRank: [[pageRank]] with the teleport vector
    * concentrated on a SEED set instead of uniform — "what's related to
    * THESE documents?", the standard seed-expansion primitive (local
    * community detection, related-item retrieval, contamination
    * neighborhoods). Identical integer fixed-point contract: ranks on
    * the scaleMicro grid, contribution `r div outdeg`, damping
    * `(85·x) div 100`, dangling mass redistributed — but to the seeds,
    * as is the teleport share, so non-seed mass arrives only through
    * edges. All truncating integer ops, bit-identical in any
    * partitioning and replayable in SQL.
    *
    * `seedPred` must be a deterministic predicate over the node id (it
    * is evaluated on both the node relation and inside the oracle).
    * Returns (idCol, rank_micro, is_seed).
    */
  def personalizedPageRank(nodes: DataFrame, idCol: String,
      edges: DataFrame, aCol: String, bCol: String,
      seedPred: Column => Column, iters: Int = 3,
      scaleMicro: Long = 1000000000000L,
      driverEdgeThreshold: Long = 1L << 18): DataFrame = {
    val spark = edges.sparkSession
    val sym = graft.CacheScope.register(
      edges.select(explode(array(
          struct(col(aCol).cast("long").as("src"), col(bCol).cast("long").as("dst")),
          struct(col(bCol).cast("long").as("src"), col(aCol).cast("long").as("dst"))))
        .as("__e"))
        .select(col("__e.src").as("src"), col("__e.dst").as("dst"))
        .filter(col("src").isNotNull && col("dst").isNotNull)
        .distinct())
    val deg = graft.CacheScope.register(
      sym.groupBy(col("src").as("id")).agg(count(lit(1)).as("outdeg")))
    val ids = graft.CacheScope.register(
      nodes.select(col(idCol).cast("long").as("id"))
        .withColumn("seed", seedPred(col("id"))))
    val nSeeds = ids.filter(col("seed")).count()
    require(nSeeds > 0, "personalizedPageRank: no seed nodes")
    val init = scaleMicro / nSeeds
    val base = (15L * init) / 100L
    if (ids.count() <= driverEdgeThreshold &&
        sym.count() <= driverEdgeThreshold) {
      // bounded-domain driver fixed point, bit-equal to the loop below
      // (the [[pageRank]] fast-path contract)
      import spark.implicits._
      val idSeed = ids.as[(Long, Boolean)].collect()
      val es = sym.as[(Long, Long)].collect()
      val degM = es.groupBy(_._1).map { case (s, g) => s -> g.length.toLong }
      var r = scala.collection.mutable.HashMap(idSeed.map { case (id, sd) =>
        id -> (if (sd) init else 0L) }.toIndexedSeq: _*)
      for (_ <- 1 to iters) {
        val dangShare = idSeed.iterator
          .filterNot { case (id, _) => degM.contains(id) }
          .map { case (id, _) => r(id) }.sum / nSeeds
        val in = scala.collection.mutable.HashMap.empty[Long, Long]
          .withDefaultValue(0L)
        // r.get mirrors the distributed loop's inner join with rank: an
        // edge source outside the node universe contributes nothing
        // instead of throwing
        es.foreach { case (s, d) =>
          r.get(s).foreach(v => in(d) += v / degM(s)) }
        r = scala.collection.mutable.HashMap(idSeed.map { case (id, sd) =>
          id -> ((if (sd) base else 0L) +
            (85L * (in.getOrElse(id, 0L) + (if (sd) dangShare else 0L))) / 100L)
        }.toIndexedSeq: _*)
      }
      return idSeed.sortBy(_._1).map { case (id, sd) => (id, r(id), sd) }
        .toSeq.toDF(idCol, "rank_micro", "is_seed")
    }
    var rank = ids.select(col("id"), col("seed"),
      when(col("seed"), init).otherwise(0L).as("r"))
    var it = 0
    while (it < iters) {
      val dangTotal = rank.join(deg, Seq("id"), "left_anti")
        .agg(coalesce(sum(col("r")), lit(0L))).first().getLong(0)
      val dangShare = dangTotal / nSeeds
      val in = sym
        .join(rank.select(col("id").as("src"), col("r")), "src")
        .join(deg.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"), expr("r div outdeg").as("c"))
        .groupBy("id").agg(sum(col("c")).as("s"))
      rank = ids.join(in, Seq("id"), "left")
        .select(col("id"), col("seed"),
          (when(col("seed"), base).otherwise(0L) +
            expr(s"(85 * (coalesce(s, 0L) + " +
              s"if(seed, ${dangShare}L, 0L))) div 100")).as("r"))
        .localCheckpoint(true)
      it += 1
    }
    rank.select(col("id").as(idCol), col("r").as("rank_micro"),
      col("seed").as("is_seed"))
  }

  /** WEIGHTED PageRank: [[pageRank]] with per-edge integer micro weights
    * — a near-dup edge at Jaccard 0.99 should pull rank harder than one
    * scraping the 0.8 threshold. Contribution of src to dst is
    * `(r · w) div W_out(src)` (truncating integer ops, exact in any
    * partitioning); dangling mass, damping (85/100), and the fixed-point
    * grid are identical to the unweighted operator, and with all weights
    * equal the two operators coincide.
    *
    * Magnitude: r ≤ scaleMicro (mass is conserved up to truncation) and
    * w ≤ 1e6 keep r·w ≤ 10¹⁸ < 2⁶³ at any graph size.
    */
  def weightedPageRank(nodes: DataFrame, idCol: String, edges: DataFrame,
      aCol: String, bCol: String, wMicroCol: String, iters: Int = 3,
      scaleMicro: Long = 1000000000000L,
      driverEdgeThreshold: Long = 1L << 18): DataFrame = {
    val spark = edges.sparkSession
    val sym = graft.CacheScope.register(
      edges.select(explode(array(
          struct(col(aCol).cast("long").as("src"), col(bCol).cast("long").as("dst"),
            col(wMicroCol).cast("long").as("w")),
          struct(col(bCol).cast("long").as("src"), col(aCol).cast("long").as("dst"),
            col(wMicroCol).cast("long").as("w"))))
        .as("__e"))
        .select(col("__e.src").as("src"), col("__e.dst").as("dst"),
          col("__e.w").as("w"))
        .filter(col("src").isNotNull && col("dst").isNotNull &&
          col("w").isNotNull && col("w") > 0)
        .groupBy("src", "dst").agg(max("w").as("w")))
    val outW = graft.CacheScope.register(
      sym.groupBy(col("src").as("id")).agg(sum(col("w")).as("w_out")))
    val ids = graft.CacheScope.register(
      nodes.select(col(idCol).cast("long").as("id")))
    val n = ids.count()
    require(n > 0, "weightedPageRank: empty node universe")
    val init = scaleMicro / n
    val base = (15L * init) / 100L
    if (n <= driverEdgeThreshold && sym.count() <= driverEdgeThreshold) {
      // bounded-domain driver fixed point, bit-equal to the loop below
      // (the [[pageRank]] fast-path contract)
      import spark.implicits._
      val es = sym.as[(Long, Long, Long)].collect()
      val wOut = es.groupBy(_._1).map { case (s, g) => s -> g.map(_._3).sum }
      val idArr = ids.as[Long].collect()
      var r = scala.collection.mutable.HashMap(
        idArr.map(_ -> init).toIndexedSeq: _*)
      for (_ <- 1 to iters) {
        val dangShare =
          idArr.iterator.filterNot(wOut.contains).map(r).sum / n
        val in = scala.collection.mutable.HashMap.empty[Long, Long]
          .withDefaultValue(0L)
        // r.get mirrors the distributed loop's inner join with rank (an
        // out-of-universe source contributes nothing, never throws)
        es.foreach { case (s, d, w) =>
          r.get(s).foreach(v => in(d) += (v * w) / wOut(s)) }
        r = scala.collection.mutable.HashMap(idArr.map(id =>
          id -> (base + (85L * (in.getOrElse(id, 0L) + dangShare)) / 100L))
          .toIndexedSeq: _*)
      }
      return idArr.sorted.map(id => (id, r(id))).toSeq
        .toDF(idCol, "rank_micro")
    }
    var rank = ids.withColumn("r", lit(init))
    var it = 0
    while (it < iters) {
      val dangTotal = rank.join(outW, Seq("id"), "left_anti")
        .agg(coalesce(sum(col("r")), lit(0L))).first().getLong(0)
      val dangShare = dangTotal / n
      val in = sym
        .join(rank.withColumnRenamed("id", "src"), "src")
        .join(outW.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"), expr("(r * w) div w_out").as("c"))
        .groupBy("id").agg(sum(col("c")).as("s"))
      rank = ids.join(in, Seq("id"), "left")
        .select(col("id"),
          (lit(base) + expr(s"(85 * (coalesce(s, 0L) + ${dangShare}L)) div 100"))
            .as("r"))
        .localCheckpoint(true)
      it += 1
    }
    rank.select(col("id").as(idCol), col("r").as("rank_micro"))
  }

  /** Per-node triangle count, degree, and local clustering coefficient
    * over an undirected edge list — the cohesion microscope for near-dup
    * neighborhoods: a high-degree node with NO triangles is a hub
    * stitching unrelated docs (template/boilerplate gluing clusters — the
    * thing to cut before electing survivors), while a clique member's
    * coefficient is ~1.
    *
    * Algorithm: canonicalize each edge to (lo < hi), then count each
    * triangle exactly once as an ordered a < b < c path closed by the
    * (a, c) edge — two equi-joins over the edge list, no windows, no
    * cartesian. This is the id-oriented variant of compact-forward;
    * orienting by degree instead tightens the worst case on power-law
    * graphs (documented trade: id-orientation keeps the oracle replay
    * trivially identical). Near-dup graphs are unions of small
    * quasi-cliques, so the join fan-out stays ∝ Σ_b deg²(b) within
    * components — bounded by the same argument as the LSH bucket join.
    *
    * clustering_micro = triangles / wedges on the half-up micro grid
    * (wedges = d(d−1)/2), NULL for degree-1 nodes; every count is an
    * exact BIGINT, so both engines agree bit-for-bit.
    */
  def triangleStats(edges: DataFrame, aCol: String, bCol: String): DataFrame = {
    val canon = graft.CacheScope.register(
      edges.select(
        least(col(aCol).cast("long"), col(bCol).cast("long")).as("lo"),
        greatest(col(aCol).cast("long"), col(bCol).cast("long")).as("hi"))
        .filter(col("lo").isNotNull && col("lo") =!= col("hi"))
        .distinct())
    val deg = canon.select(explode(array(col("lo"), col("hi"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("degree"))
    val tri = canon.as("e1")
      .join(canon.as("e2"), col("e1.hi") === col("e2.lo"))
      .join(canon.as("e3"),
        col("e3.lo") === col("e1.lo") && col("e3.hi") === col("e2.hi"))
      .select(col("e1.lo").as("a"), col("e1.hi").as("b"), col("e2.hi").as("c"))
    val perNode = tri
      .select(explode(array(col("a"), col("b"), col("c"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("n_triangles"))
    deg.join(perNode, Seq("id"), "left")
      .select(col("id"), col("degree"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"),
        when(col("degree") >= 2,
          floor((coalesce(col("n_triangles"), lit(0L)) * 2000000L +
            expr("CAST(degree * (degree - 1) div 2 AS BIGINT)")) /
            (expr("CAST(degree * (degree - 1) div 2 AS BIGINT)") * 2L))
            .cast("long")).as("clustering_micro"))
  }

  /** Semi-supervised label propagation with FIXED seeds: unlabeled nodes
    * adopt the majority label among their already-labeled neighbors
    * (ties → lexicographically smallest label); once set, a label never
    * changes, so each iteration extends the labeled frontier one hop —
    * the cheap transductive classifier over the near-dup graph ("label
    * 10% of docs, let duplicates inherit").
    *
    * Determinism: votes are exact counts; the argmax window orders
    * (count DESC, label ASC) — no randomness, no oscillation (the
    * freeze-on-set rule removes classic label-prop flip-flopping), and
    * the fixpoint is replayable iteration-for-iteration in SQL.
    *
    * Scale shape: per iteration ONE join of the edge list against the
    * current labels + one (node, label)-grid aggregate + one window
    * partitioned by node (votes per node ≤ degree). Lineage is cut per
    * iteration (localCheckpoint) exactly as [[pageRank]].
    */
  def labelPropagation(nodes: DataFrame, idCol: String, labelCol: String,
      edges: DataFrame, aCol: String, bCol: String,
      iters: Int = 2): DataFrame = {
    val sym = graft.CacheScope.register(
      edges.select(explode(array(
          struct(col(aCol).cast("long").as("src"), col(bCol).cast("long").as("dst")),
          struct(col(bCol).cast("long").as("src"), col(aCol).cast("long").as("dst"))))
        .as("__e"))
        .select(col("__e.src").as("src"), col("__e.dst").as("dst"))
        .filter(col("src").isNotNull && col("dst").isNotNull)
        .distinct())
    var cur = nodes.select(col(idCol).cast("long").as("id"),
      col(labelCol).cast("string").as("lbl"))
    var it = 0
    while (it < iters) {
      val votes = sym
        .join(cur.select(col("id").as("src"), col("lbl").as("nlbl")), "src")
        .filter(col("nlbl").isNotNull)
        .groupBy(col("dst").as("id"), col("nlbl"))
        .agg(count(lit(1)).as("c"))
      val w = Window.partitionBy("id").orderBy(col("c").desc, col("nlbl"))
      val winner = votes
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .select(col("id"), col("nlbl").as("newlbl"))
      cur = cur.join(winner, Seq("id"), "left")
        .select(col("id"), coalesce(col("lbl"), col("newlbl")).as("lbl"))
        .localCheckpoint(true)
      it += 1
    }
    cur.select(col("id").as(idCol), col("lbl").as("label"))
  }

  /** Newman modularity of a node partition over an undirected edge list —
    * the quality score of [[connectedComponents]]' clustering: per
    * community c with e_c intra-community edges and degree sum d_c,
    *   Q = Σ_c [ e_c/m − (d_c/2m)² ]
    * High-modularity components are genuine dup families; a partition
    * whose Q ≈ 0 means the "clusters" are no denser than random wiring
    * (template hubs gluing unrelated docs).
    *
    * Exactness: everything is cleared to the common denominator 4m² —
    *   q_scaled_c = 4·m·e_c − d_c²,  Q = (Σ q_scaled_c) / (4m²)
    * — exact BIGINTs (DECIMAL(38,0) sums for the corpus-scale bound); Q
    * itself is never emitted as a double per community, only the exact
    * integers plus the one final division in the TOTAL row (community
    * = NULL), so both engines agree bit-for-bit.
    *
    * Scale shape: edges canonicalized once, labels joined on both
    * endpoints (the membership relation is |nodes|-sized — same join
    * budget as the CC loop itself), one shuffle to the community grid,
    * one grid-sized total aggregate. Output: |communities| rows + 1
    * total row.
    */
  def modularity(edges: DataFrame, aCol: String, bCol: String,
      membership: DataFrame, idCol: String, labelCol: String): DataFrame = {
    val canon = graft.CacheScope.register(
      edges.select(
        least(col(aCol).cast("long"), col(bCol).cast("long")).as("lo"),
        greatest(col(aCol).cast("long"), col(bCol).cast("long")).as("hi"))
        .filter(col("lo").isNotNull && col("lo") =!= col("hi"))
        .distinct())
    val m = canon.count()
    require(m > 0, "modularity: empty edge list")
    val lbl = membership.select(col(idCol).cast("long").as("id"),
      col(labelCol).cast("long").as("lbl"))
    val labeled = canon
      .join(lbl.withColumnRenamed("id", "lo").withColumnRenamed("lbl", "la"), "lo")
      .join(lbl.withColumnRenamed("id", "hi").withColumnRenamed("lbl", "lb"), "hi")
    val intra = labeled.filter(col("la") === col("lb"))
      .groupBy(col("la").as("community")).agg(count(lit(1)).as("intra_edges"))
    val degSum = labeled
      .select(explode(array(col("la"), col("lb"))).as("community"))
      .groupBy("community").agg(count(lit(1)).as("degree_sum"))
    val per = degSum.join(intra, Seq("community"), "left")
      .select(col("community"),
        coalesce(col("intra_edges"), lit(0L)).as("intra_edges"),
        col("degree_sum"),
        (lit(4L) * m * coalesce(col("intra_edges"), lit(0L)) -
          col("degree_sum") * col("degree_sum")).as("q_scaled"))
    val total = per.agg(
        sum(col("intra_edges")).as("intra_edges"),
        sum(col("degree_sum")).as("degree_sum"),
        sum(col("q_scaled").cast("decimal(38,0)")).cast("decimal(38,0)")
          .as("qs"))
      .select(lit(null).cast("long").as("community"),
        col("intra_edges"), col("degree_sum"),
        col("qs").cast("long").as("q_scaled"),
        (col("qs").cast("double") / (4.0 * m.toDouble * m.toDouble))
          .as("modularity"))
    per.select(col("community"), col("intra_edges"), col("degree_sum"),
        col("q_scaled"), lit(null).cast("double").as("modularity"))
      .unionByName(total)
  }

  /** HITS hubs & authorities over a DIRECTED (src → dst) edge list in
    * integer fixed point — on the customer→part bipartite graph this
    * ranks "authoritative" items (bought by well-connected buyers) the
    * way raw purchase counts can't: a part bought by one whale outranks
    * one bought by the same-count drive-bys.
    *
    * Fixed-point scheme (the [[pageRank]] contract): scores live on a
    * 1e9 integer grid; each half-step sums neighbor scores exactly
    * (BIGINT) and re-normalizes by TRUNCATING division
    * `v · scale div Σv` — deterministic in any partitioning and
    * replayable in SQL (no sqrt/L2 norm, no floats). Magnitude bound:
    * initial hub mass is `scale div |hubs|` so every round's total ≈
    * scale, any single raw score ≤ the total, and the `raw · scale`
    * product stays ≤ scale² = 10¹⁸ < 2⁶³ at ANY graph size. `iters`
    * full hub→authority→hub rounds; O(E) joins per round, one scalar
    * total per half-step, lineage cut per round.
    *
    * Returns (id, side ∈ {hub, authority}, score_scaled).
    */
  def hits(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 2, scale: Long = 1000000000L,
      driverEdgeThreshold: Long = 1L << 18): DataFrame = {
    val spark = edges.sparkSession
    val e = graft.CacheScope.register(
      edges.select(col(srcCol).cast("long").as("src"),
          col(dstCol).cast("long").as("dst"))
        .filter(col("src").isNotNull && col("dst").isNotNull)
        .distinct())
    val hubs0 = e.select(col("src").as("id")).distinct()
    val nHubs = hubs0.count()
    require(nHubs > 0, "hits: no source nodes")
    if (e.count() <= driverEdgeThreshold) {
      // bounded-domain driver fixed point, bit-equal to the loop below
      // (the [[pageRank]] fast-path contract): exact integer sums are
      // order-independent, normalizations are the same truncating
      // quotients
      import spark.implicits._
      val es = e.as[(Long, Long)].collect()
      var h: Map[Long, Long] =
        es.map(_._1).distinct.map(_ -> scale / nHubs).toMap
      var a: Map[Long, Long] = Map.empty
      for (_ <- 1 to iters) {
        val aRaw = scala.collection.mutable.HashMap.empty[Long, Long]
          .withDefaultValue(0L)
        es.foreach { case (s, d) => aRaw(d) += h(s) }
        val aTot = aRaw.valuesIterator.sum
        a = aRaw.iterator.map { case (k, v) => k -> (v * scale) / aTot }.toMap
        val hRaw = scala.collection.mutable.HashMap.empty[Long, Long]
          .withDefaultValue(0L)
        es.foreach { case (s, d) => a.get(d).foreach(v => hRaw(s) += v) }
        val hTot = hRaw.valuesIterator.sum
        h = hRaw.iterator.map { case (k, v) => k -> (v * scale) / hTot }.toMap
      }
      return (h.toSeq.sorted.map { case (id, v) => (id, "hub", v) } ++
          a.toSeq.sorted.map { case (id, v) => (id, "authority", v) })
        .toDF("id", "side", "score_scaled")
    }
    // Pre-partition the (cached) edge relation by EACH half-step's join
    // key once, outside the loop (guide §2.4 "two operations keyed the
    // same way share one exchange"): the cached partitioning is what the
    // per-iteration joins require, so each iteration shuffles only the
    // current score vector — the edge list crosses the wire twice total
    // instead of 2×iters times.
    val eBySrc = graft.CacheScope.register(e.repartition(col("src")))
    val eByDst = graft.CacheScope.register(e.repartition(col("dst")))
    var hub = hubs0.withColumn("h", lit(scale / nHubs))
    var auth: DataFrame = null
    var it = 0
    while (it < iters) {
      // checkpoint the RAW sums before the total scalar: the total and
      // the normalization both read them, and without the cut the edge
      // join would execute twice per half-step
      val aRaw = eBySrc.join(hub.withColumnRenamed("id", "src"), "src")
        .groupBy(col("dst").as("id")).agg(sum(col("h")).as("a"))
        .localCheckpoint(true)
      val aTot = aRaw.agg(sum("a")).first().getLong(0)
      auth = aRaw.select(col("id"),
        expr(s"(a * ${scale}L) div ${aTot}L").as("a"))
      val hRaw = eByDst.join(auth.withColumnRenamed("id", "dst"), "dst")
        .groupBy(col("src").as("id")).agg(sum(col("a")).as("h"))
        .localCheckpoint(true)
      val hTot = hRaw.agg(sum("h")).first().getLong(0)
      hub = hRaw.select(col("id"),
        expr(s"(h * ${scale}L) div ${hTot}L").as("h"))
      it += 1
    }
    hub.select(col("id"), lit("hub").as("side"), col("h").as("score_scaled"))
      .unionByName(auth.select(col("id"), lit("authority").as("side"),
        col("a").as("score_scaled")))
  }

  /** Exact union-find (path compression + union by min) over a collected
    * edge list; component label = minimum member id, identical to the
    * distributed loop's fixpoint.
    */
  private def driverUnionFind(sym: DataFrame): DataFrame = {
    val spark = sym.sparkSession
    import spark.implicits._
    val es = sym.as[(Long, Long)].collect()
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    es.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a)
      parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { // min root wins → label IS the component minimum
        if (ra < rb) parent(rb) = ra else parent(ra) = rb
      }
    }
    parent.keys.toSeq.map(id => (id, find(id)))
      .toDF("id", "component")
  }

  /** Stationary distribution of a Markov chain given as a transition-
    * COUNT relation (from, to, n) — the equilibrium share of time spent
    * in each state, i.e. where the q127 transition matrix settles. The
    * same truncating integer fixed point as [[pageRank]] (no damping):
    * π'_j = Σ_i (π_i·n_ij) div rowtot_i on the 1e12 grid, dangling
    * states' mass redistributed uniformly, `iters` unrolled iterations
    * from the uniform start — bit-replayable in SQL, no doubles until
    * the final display division.
    *
    * Scale shape: everything after the input aggregation lives on the
    * |states| / |states|² grids (state spaces are dimension-sized, not
    * corpus-sized); products ride DECIMAL(38,0) so π·n stays exact at
    * any count magnitude.
    */
  def markovStationary(counts: DataFrame, fromCol: String, toCol: String,
      nCol: String, iters: Int,
      driverEdgeThreshold: Long = 1L << 18): DataFrame = {
    require(iters >= 1)
    val scale = 1000000000000L
    val spark = counts.sparkSession
    val c = graft.CacheScope.register(counts.select(
      col(fromCol).as("src"), col(toCol).as("dst"),
      col(nCol).cast("long").as("n")))
    val nEdges = c.count()
    if (nEdges <= driverEdgeThreshold) {
      // Fast path: the transition matrix of a CATEGORICAL state space is
      // dimension²-bounded (the connectedComponents ≤2^18-edge argument)
      // — a driver fixed point replaces 3·iters tiny shuffle jobs whose
      // scheduling overhead dwarfs the arithmetic. BigInt quotients keep
      // the truncating integer recursion exact at any count magnitude;
      // identical arithmetic to the distributed fallback below. State ids
      // are read GENERICALLY (Any keys) and the output is built by
      // joining the driver-computed π back onto the distinct-states
      // relation, so the state column keeps the input's type — same
      // schema as the distributed path for int/long/string chains alike.
      val es = c.collect().map(r => (r.get(0), r.get(1), r.getLong(2)))
      val states: Seq[Any] = (es.map(_._1) ++ es.map(_._2)).distinct
      val k = states.length.toLong
      val tot = es.groupBy(_._1).map { case (s, g) => s -> g.map(_._3).sum }
      var r: Map[Any, Long] = states.map(st => st -> scale / k).toMap
      for (_ <- 1 to iters) {
        val in = scala.collection.mutable.HashMap.empty[Any, Long]
          .withDefaultValue(0L)
        es.foreach { case (src, dst, n) =>
          in(dst) += ((BigInt(r(src)) * n) / tot(src)).toLong
        }
        val d = states.filterNot(tot.contains).map(r).sum
        r = states.map(st => st -> (in(st) + d / k)).toMap
      }
      import spark.implicits._
      val keyOf = (st: Any) => if (st == null) "\u0000" else String.valueOf(st)
      val piDf = broadcast(states.map(st => (keyOf(st), r(st)))
        .toSeq.toDF("__key", "pi_scaled"))
      c.select(col("src").as("st")).union(c.select(col("dst"))).distinct()
        .join(piDf, coalesce(col("st").cast("string"), lit("\u0000"))
          === col("__key"))
        .select(col("st").as(fromCol), col("pi_scaled"),
          (col("pi_scaled").cast("double") / lit(scale.toDouble)).as("pi"))
    } else {
      val statesDf = graft.CacheScope.register(
        c.select(col("src").as("st")).union(c.select(col("dst"))).distinct())
      val nn = broadcast(statesDf.agg(count(lit(1)).as("k")))
      val rowTot = c.groupBy("src").agg(sum("n").as("tot"))
      var pi = statesDf.crossJoin(nn)
        .select(col("st"), expr(s"$scale div k").as("r"))
      for (_ <- 1 to iters) {
        // pi is read twice per iteration (inflow + dangling) — persist it
        // or the reference tree re-executes 2^iters times
        pi = graft.CacheScope.register(pi)
        val inflow = c.join(rowTot, "src")
          .join(pi.withColumnRenamed("st", "src"), "src")
          .groupBy(col("dst").as("st"))
          .agg(sum(expr("(CAST(r AS DECIMAL(38,0)) * n) div tot")).as("__in"))
        val dangling = broadcast(
          pi.join(rowTot.withColumnRenamed("src", "st"), Seq("st"), "left_anti")
            .agg(coalesce(sum("r"), lit(0L)).as("d")))
        pi = statesDf.join(inflow, Seq("st"), "left")
          .crossJoin(dangling).crossJoin(nn)
          .select(col("st"),
            (coalesce(col("__in"), lit(0L)) + expr("d div k")).as("r"))
      }
      pi.select(col("st").as(fromCol), col("r").as("pi_scaled"),
        (col("r").cast("double") / lit(scale.toDouble)).as("pi"))
    }
  }

  /** k-TRUSS decomposition over an undirected edge list: iteratively
    * remove edges supported by fewer than k−2 triangles until stable —
    * the EDGE-level cohesion filter next to [[kCore]]'s vertex-level
    * one (a k-core can be a sparse star-of-stars; every k-truss edge
    * sits in k−2 triangles, so surviving components are genuinely
    * clique-like — the community-core standard, Cohen 2008).
    *
    * The TRIANGLE relation is enumerated ONCE via the
    * [[localClustering]] wedge join (Σdeg² rows) and cached; because the
    * edge set only shrinks, every triangle of a peeled subgraph is a
    * triangle of the initial graph, so each round's per-edge support is
    * just "initial triangles whose three edges are all still alive" —
    * three semi-joins plus a count over the (usually far smaller)
    * triangle relation, NOT a fresh wedge join. The Σdeg² wedge cost is
    * paid exactly once; rounds are O(|triangles|) each (the round-8
    * probe's 4.1× wall at 10× edges came from re-wedging every round).
    * Convergence within `maxRounds` is REQUIRED (kCore's contract) so
    * the oracle's fixed unrolling reaches the same fixpoint. A
    * driver fast path below `driverEdgeThreshold` runs the identical
    * peel on collected arrays (the kCore/markovStationary
    * bounded-domain argument) — bit-identical output, spec-pinned.
    *
    * Returns surviving edges (id_a, id_b, support) with support
    * measured in the FINAL edge set.
    */
  def kTruss(edges: DataFrame, aCol: String, bCol: String, k: Int,
      maxRounds: Int = 6, driverEdgeThreshold: Long = 1L << 18): DataFrame = {
    require(k >= 3 && maxRounds >= 1)
    val spark = edges.sparkSession
    import spark.implicits._
    var canon = graft.CacheScope.register(
      edges.select(
          least(col(aCol).cast("long"), col(bCol).cast("long")).as("u"),
          greatest(col(aCol).cast("long"), col(bCol).cast("long")).as("v"))
        .filter(col("u").isNotNull && col("v").isNotNull && col("u") < col("v"))
        .distinct())
    var nEdges = canon.count()
    if (nEdges <= driverEdgeThreshold) {
      var cur = canon.as[(Long, Long)].collect()
      var converged = false
      var round = 0
      def supports(es: Array[(Long, Long)]): Map[(Long, Long), Int] = {
        val nbrs = scala.collection.mutable.HashMap
          .empty[Long, scala.collection.mutable.HashSet[Long]]
        es.foreach { case (u, v) =>
          nbrs.getOrElseUpdate(u, scala.collection.mutable.HashSet.empty) += v
          nbrs.getOrElseUpdate(v, scala.collection.mutable.HashSet.empty) += u
        }
        es.map { case (u, v) =>
          val (small, large) =
            if (nbrs(u).size <= nbrs(v).size) (nbrs(u), nbrs(v))
            else (nbrs(v), nbrs(u))
          (u, v) -> small.count(large.contains)
        }.toMap
      }
      while (!converged && round < maxRounds) {
        val sup = supports(cur)
        val next = cur.filter(e => sup(e) >= k - 2)
        converged = next.length == cur.length
        cur = next
        round += 1
      }
      require(converged || cur.isEmpty,
        s"kTruss(k=$k) did not stabilize in $maxRounds rounds — raise maxRounds")
      val finalSup = supports(cur)
      return cur.toSeq.sorted
        .map { case (u, v) => (u, v, finalSup((u, v)).toLong) }
        .toDF("id_a", "id_b", "support")
        .orderBy("id_a", "id_b")
    }
    // ONE oriented wedge join enumerates every triangle of the initial
    // graph EXACTLY once as t1 < t2 < t3: the canonical (u < v) edge set
    // chains (a,b)⋈(b,c) into ordered wedges (Σ_b indeg·outdeg rows —
    // about a quarter of the symmetric Σdeg² volume, with no 3× apex
    // duplication and no distinct) and a semi-join against (a,c) closes
    // them. Cached: every peel round reuses this relation.
    val tri = graft.CacheScope.register(
      canon.as("e1")
        .join(canon.as("e2"), col("e1.v") === col("e2.u"))
        .select(col("e1.u").as("t1"), col("e1.v").as("t2"),
          col("e2.v").as("t3"))
        .join(canon.select(col("u").as("t1"), col("v").as("t3")),
          Seq("t1", "t3"), "left_semi"))
    // support of edge e in the CURRENT subgraph = initial triangles
    // containing e whose other two edges are also alive (subgraph
    // triangles ⊆ initial triangles since edges only ever shrink)
    def supportDf(alive: DataFrame): DataFrame =
      tri
        .join(alive.select(col("u").as("t1"), col("v").as("t2")),
          Seq("t1", "t2"), "left_semi")
        .join(alive.select(col("u").as("t1"), col("v").as("t3")),
          Seq("t1", "t3"), "left_semi")
        .join(alive.select(col("u").as("t2"), col("v").as("t3")),
          Seq("t2", "t3"), "left_semi")
        .select(explode(array(
            struct(col("t1").as("u"), col("t2").as("v")),
            struct(col("t1").as("u"), col("t3").as("v")),
            struct(col("t2").as("u"), col("t3").as("v")))).as("e"))
        .select(col("e.u").as("u"), col("e.v").as("v"))
        .groupBy("u", "v").agg(count(lit(1)).as("support"))
    var converged = false
    var round = 0
    while (!converged && round < maxRounds) {
      val next = canon
        .join(supportDf(canon).filter(col("support") >= k - 2)
          .select("u", "v"), Seq("u", "v"), "left_semi")
        .localCheckpoint(true)
      val m = next.count()
      converged = m == nEdges
      canon = next
      nEdges = m
      round += 1
    }
    require(converged || nEdges == 0,
      s"kTruss(k=$k) did not stabilize in $maxRounds rounds — raise maxRounds")
    canon.join(supportDf(canon), Seq("u", "v"), "left")
      .select(col("u").as("id_a"), col("v").as("id_b"),
        coalesce(col("support"), lit(0L)).as("support"))
      .orderBy("id_a", "id_b")
  }

  /** Per-node LOCAL clustering coefficient over an undirected edge list —
    * "how clique-like is this node's neighborhood?": q162's triangle
    * census answers it globally; per node it separates hub-of-a-clique
    * (dup cluster core, lcc → 1) from bridge nodes (lcc → 0), the
    * standard transitivity diagnostic (Watts–Strogatz 1998).
    *
    * Edge-iterator shape: canonical (min < max) distinct edges; wedges
    * enumerated by self-joining the symmetric adjacency on the center
    * node with an ordered (b < c) endpoint pair; a semi-join against the
    * canonical edge set closes each wedge into a triangle. Cost is
    * Σ_v deg(v)² wedge rows + one hash semi-join — bounded by the
    * degree profile (on near-dup graphs degrees are cluster-sized),
    * never all-pairs. lcc rides the exact integer grid:
    * lcc_micro = (2·tri·1e6) div (deg·(deg−1)).
    *
    * Returns (id, degree, triangles, lcc_micro, lcc) per node with
    * degree ≥ 1; single-degree nodes report lcc = 0 (undefined → 0 by
    * the usual convention, kept explicit for engine parity).
    */
  def localClustering(edges: DataFrame, aCol: String, bCol: String): DataFrame = {
    val canon = graft.CacheScope.register(
      edges.select(
          least(col(aCol).cast("long"), col(bCol).cast("long")).as("u"),
          greatest(col(aCol).cast("long"), col(bCol).cast("long")).as("v"))
        .filter(col("u").isNotNull && col("v").isNotNull && col("u") < col("v"))
        .distinct())
    // pre-partition the adjacency on the wedge CENTER before caching:
    // the cached relation keeps HashPartitioning(ctr), so the degree
    // aggregate AND both sides of the wedge self-join consume it with
    // ZERO further exchanges — one up-front shuffle of 2E rows replaces
    // three (measured 25-35% off the wedge-family wall in MicroGraph)
    val adj = graft.CacheScope.register(
      canon.select(col("u").as("ctr"), col("v").as("nb"))
        .unionAll(canon.select(col("v").as("ctr"), col("u").as("nb")))
        .repartition(col("ctr")))
    val deg = adj.groupBy(col("ctr").as("id"))
      .agg(count(lit(1)).as("degree"))
    val wedges = adj.as("x").join(adj.as("y"),
        col("x.ctr") === col("y.ctr") && col("x.nb") < col("y.nb"))
      .select(col("x.ctr").as("id"), col("x.nb").as("u"), col("y.nb").as("v"))
    val tri = wedges.join(canon, Seq("u", "v"), "left_semi")
      .groupBy("id").agg(count(lit(1)).as("triangles"))
    deg.join(tri, Seq("id"), "left")
      .select(col("id"), col("degree"),
        coalesce(col("triangles"), lit(0L)).as("triangles"))
      .withColumn("lcc_micro",
        when(col("degree") >= 2,
          expr("(2 * triangles * 1000000) div (degree * (degree - 1))"))
          .otherwise(lit(0L)))
      .withColumn("lcc", col("lcc_micro").cast("double") / lit(1e6))
  }

  /** PER-CENTER NEIGHBOR CAP for the wedge family — the scale knob for
    * the one measured superlinear term left in the graph battery (r9
    * verdict #3): RA/AA/CN wedge volume is Σ_z deg(z)², driven entirely
    * by the degree tail, and at 100× data a single mega-hub's C(deg,2)
    * wedges dominate the whole pass. Capping keeps, per wedge CENTER,
    * only the `cap` LOWEST-ID neighbors (deterministic, engine-
    * replayable — the df-cap analog of `sparseCosinePairs`), bounding
    * wedge volume at Σ min(deg,cap)² ≤ E·cap while degrees/weights stay
    * the TRUE values.
    *
    * Exactness contract: cap = Int.MaxValue (the default everywhere) is
    * a no-op — bit-identical plan and output. A finite cap drops wedges
    * centered at nodes with deg > cap: scores become lower bounds and
    * pairs only reachable through capped hubs may vanish; pairs sharing
    * any uncapped center are unaffected. Spec-pinned: cap ≥ max degree
    * ≡ uncapped, exactly.
    */
  /** Default wedge-center neighbor cap for RA/AA/linkPredictionSuite —
    * the 100× user gets the degree-tail-bounded plan WITHOUT knowing the
    * knob (round-11 verdict #7: cap=∞-by-default meant the exact plan,
    * quadratic in the hub degree, was what a scale user ran into). Exact
    * scores remain one explicit `exact = true` away; the registry's
    * oracle queries pass it, their capped b-twins pass a finite cap.
    */
  val DefaultDegreeCap: Int = 64

  private def capAdjacency(adj: DataFrame, cap: Int): DataFrame =
    if (cap == Int.MaxValue) adj
    else {
      require(cap >= 2, s"degreeCap $cap cannot form wedges (need >= 2)")
      adj.withColumn("__rk", row_number().over(
          Window.partitionBy("ctr").orderBy("nb")))
        .filter(col("__rk") <= cap).drop("__rk")
    }

  /** RESOURCE-ALLOCATION link prediction (Zhou, Lü & Zhang 2009) over an
    * undirected edge list: for every NON-adjacent pair (a, b) sharing at
    * least one neighbor, RA(a,b) = Σ_{z ∈ N(a)∩N(b)} 1/deg(z) — the
    * common-neighbor score family's best simple member (Adamic-Adar with
    * 1/deg replacing 1/log deg), and on a near-dup graph the "missed
    * edge" detector: two documents never paired by LSH whose neighbors
    * overlap heavily are a cluster the thresholds split. 1/deg rides the
    * exact integer grid as 1e12 div deg (no logs, no floats — engine-
    * exact sums), an anti-join removes existing edges, and the top-k
    * lands via one ordered limit.
    *
    * Cost: Σ_z deg(z)² candidate pairs grouped to their (a, b) sums —
    * the [[localClustering]] wedge bound, never |V|² — plus two hash
    * joins against the degree and edge relations. `degreeCap` (default
    * ∞ = exact) bounds that to Σ min(deg,cap)² ≤ E·cap for the 100×
    * degree-tail path — see [[capAdjacency]] for the contract.
    *
    * Returns the top-`k` rows (id_a, id_b, common_neighbors,
    * ra_score_micro, ra_score) ordered by (score desc, id_a, id_b);
    * ra_score_micro is on the 1e12 grid.
    */
  def resourceAllocation(edges: DataFrame, aCol: String, bCol: String,
      k: Int, degreeCap: Int = DefaultDegreeCap,
      exact: Boolean = false): DataFrame = {
    require(k >= 1)
    val effCap = if (exact) Int.MaxValue else degreeCap
    val canon = graft.CacheScope.register(
      edges.select(
          least(col(aCol).cast("long"), col(bCol).cast("long")).as("u"),
          greatest(col(aCol).cast("long"), col(bCol).cast("long")).as("v"))
        .filter(col("u").isNotNull && col("v").isNotNull && col("u") < col("v"))
        .distinct())
    // one up-front shuffle on the wedge center: the cached adjacency
    // keeps HashPartitioning(ctr), so the degree aggregate, the weight
    // join, and BOTH sides of the wedge self-join reuse it exchange-free
    // (the localClustering co-location note)
    val adj = graft.CacheScope.register(
      canon.select(col("u").as("ctr"), col("v").as("nb"))
        .unionAll(canon.select(col("v").as("ctr"), col("u").as("nb")))
        .repartition(col("ctr")))
    val deg = adj.groupBy("ctr").agg(count(lit(1)).as("dz"))
    // weight the ADJACENCY (2E rows) before the wedge self-join, so the
    // Σdeg² wedge relation flows straight into map-side partial
    // aggregation — joining deg onto the wedge relation instead costs a
    // full extra shuffle of the probe's largest intermediate; the
    // existing-edge anti-join likewise runs on the post-aggregate pair
    // grid, not the raw wedge rows
    val adjW = graft.CacheScope.register(
      capAdjacency(adj, effCap).join(deg, "ctr")
        .select(col("ctr"), col("nb"), expr("1000000000000 div dz").as("w")))
    adjW.as("x").join(adjW.as("y"),
        col("x.ctr") === col("y.ctr") && col("x.nb") < col("y.nb"))
      .groupBy(col("x.nb").as("u"), col("y.nb").as("v"))
      .agg(count(lit(1)).as("common_neighbors"),
        sum(col("x.w")).as("ra_score_micro"))
      .join(canon, Seq("u", "v"), "left_anti") // non-adjacent pairs only
      .select(col("u").as("id_a"), col("v").as("id_b"),
        col("common_neighbors"), col("ra_score_micro"),
        (col("ra_score_micro").cast("double") / lit(1e12)).as("ra_score"))
      .orderBy(col("ra_score_micro").desc, col("id_a"), col("id_b"))
      .limit(k)
  }

  /** ADAMIC-ADAR link prediction — [[resourceAllocation]]'s wedge
    * machinery with the log-damped weight: AA(u,v) = Σ_z 1/ln(deg z)
    * over common neighbors z of non-adjacent pairs. RA's 1/deg kills
    * hub evidence aggressively; AA's 1/ln(deg) keeps moderate hubs
    * informative — the two standard points on the specificity curve
    * (Adamic & Adar 2003), exposed side by side so rankings can be
    * compared on the same graph.
    *
    * Weights stay exact: a common neighbor has degree ≥ 2 by
    * construction, so w = 10¹⁸ div round(ln(dz)·10⁶) is a well-defined
    * BIGINT on the same 10¹² grid as RA (both engines round the same
    * libm ln of a small integer — the micro-log convention). Same scale
    * shape as RA: adjacency weighted BEFORE the Σdeg² wedge join,
    * anti-join on the post-aggregate pair grid; same `degreeCap` knob
    * ([[capAdjacency]], default ∞ = exact).
    *
    * Returns the top-k (id_a, id_b, common_neighbors, aa_score_micro,
    * aa_score) by descending score.
    */
  def adamicAdar(edges: DataFrame, aCol: String, bCol: String,
      k: Int, degreeCap: Int = DefaultDegreeCap,
      exact: Boolean = false): DataFrame = {
    require(k >= 1)
    val effCap = if (exact) Int.MaxValue else degreeCap
    val canon = graft.CacheScope.register(
      edges.select(
          least(col(aCol).cast("long"), col(bCol).cast("long")).as("u"),
          greatest(col(aCol).cast("long"), col(bCol).cast("long")).as("v"))
        .filter(col("u").isNotNull && col("v").isNotNull && col("u") < col("v"))
        .distinct())
    // one up-front shuffle on the wedge center: the cached adjacency
    // keeps HashPartitioning(ctr), so the degree aggregate, the weight
    // join, and BOTH sides of the wedge self-join reuse it exchange-free
    // (the localClustering co-location note)
    val adj = graft.CacheScope.register(
      canon.select(col("u").as("ctr"), col("v").as("nb"))
        .unionAll(canon.select(col("v").as("ctr"), col("u").as("nb")))
        .repartition(col("ctr")))
    val deg = adj.groupBy("ctr").agg(count(lit(1)).as("dz"))
    // only deg >= 2 nodes can be wedge centers — filtering here both
    // shrinks the self-join input and keeps the ln weight well-defined
    val adjW = graft.CacheScope.register(
      capAdjacency(adj, effCap).join(deg.filter(col("dz") >= 2), "ctr")
        .select(col("ctr"), col("nb"),
          expr("1000000000000000000 div cast(round(ln(dz) * 1e6) as bigint)")
            .as("w")))
    adjW.as("x").join(adjW.as("y"),
        col("x.ctr") === col("y.ctr") && col("x.nb") < col("y.nb"))
      .groupBy(col("x.nb").as("u"), col("y.nb").as("v"))
      .agg(count(lit(1)).as("common_neighbors"),
        sum(col("x.w")).as("aa_score_micro"))
      .join(canon, Seq("u", "v"), "left_anti")
      .select(col("u").as("id_a"), col("v").as("id_b"),
        col("common_neighbors"), col("aa_score_micro"),
        (col("aa_score_micro").cast("double") / lit(1e12)).as("aa_score"))
      .orderBy(col("aa_score_micro").desc, col("id_a"), col("id_b"))
      .limit(k)
  }

  /** EXACT BETWEENNESS centrality (Brandes 2001) over an undirected
    * edge list — "which documents BRIDGE duplication clusters": a node
    * on many shortest paths stitches otherwise-separate template
    * families (boilerplate gluing two sources), the structural signal
    * degree/PageRank/harmonic all miss (a bridge can have degree 2 and
    * minimal rank yet carry every cross-cluster path).
    *
    * Level-synchronous Brandes: a forward multi-source BFS accumulates
    * σ(root, v) (shortest-path counts — integer sums over predecessor
    * frontiers), then the dependency accumulation runs levels backward
    * with every term on the exact integer grid:
    *
    *   δ_micro(v) += (σ(v) · (1e6 + δ_micro(w))) div σ(w)
    *
    * — the pageRank truncating-division trick: per-term truncation makes
    * each δ an exact BIGINT sum (order-independent, partition-
    * independent, oracle-replayable), where naive double accumulation
    * would be summation-order-sensitive in its last bits. Betweenness
    * is the over-roots sum; the undirected double-count stays in the
    * reported micro value (each unordered pair contributes from both
    * endpoints — the standard /2 is applied only in the derived double
    * column).
    *
    * REQUIRES every BFS to exhaust within `maxDepth` (the kCore
    * convergence contract — near-dup components have cluster-bounded
    * diameter); a deeper graph fails loudly rather than silently
    * truncating path sets. State is the (root, node) reachable-pair
    * relation (Σ comp_size² rows — the harmonicCentrality budget);
    * rounds are frontier ⋈ edges joins, 2·maxDepth of them total.
    * Magnitude: σ · (1e6 + δ) ≤ σ_max · n · 1e6 — exact in a long for
    * any cluster-sized component (σ_max · n ≪ 9e12).
    *
    * Fast path below `driverEdgeThreshold` runs the identical
    * level-synchronous recursion on collected adjacency — bit-equal,
    * spec-pinned against the forced distributed loop.
    *
    * Returns (id, betweenness_micro, betweenness) for nodes with ≥ 1
    * edge; betweenness = micro / 2 / 1e6 (unordered-pair convention).
    */
  def betweenness(edges: DataFrame, aCol: String, bCol: String,
      maxDepth: Int = 6, driverEdgeThreshold: Long = 1L << 18): DataFrame = {
    require(maxDepth >= 1)
    val spark = edges.sparkSession
    val sym = graft.CacheScope.register(
      edges.select(explode(array(
          struct(col(aCol).cast("long").as("src"), col(bCol).cast("long").as("dst")),
          struct(col(bCol).cast("long").as("src"), col(aCol).cast("long").as("dst"))))
        .as("__e"))
        .select(col("__e.src").as("src"), col("__e.dst").as("dst"))
        .filter(col("src").isNotNull && col("dst").isNotNull &&
          col("src") =!= col("dst"))
        .distinct())
    if (sym.count() <= driverEdgeThreshold) {
      import spark.implicits._
      val adj = sym.as[(Long, Long)].collect().groupBy(_._1)
        .map { case (s, g) => s -> g.map(_._2) }
      val bet = scala.collection.mutable.HashMap.empty[Long, Long]
        .withDefaultValue(0L)
      adj.keys.foreach { root =>
        val dist = scala.collection.mutable.HashMap(root -> 0)
        val sigma = scala.collection.mutable.HashMap(root -> 1L)
        val levels = scala.collection.mutable.ArrayBuffer(Seq(root))
        var d = 0
        while (levels.last.nonEmpty) {
          require(d < maxDepth,
            s"betweenness: BFS from $root not exhausted in $maxDepth levels — raise maxDepth")
          d += 1
          val next = scala.collection.mutable.LinkedHashMap.empty[Long, Long]
          levels.last.foreach { u =>
            adj.getOrElse(u, Array.empty[Long]).foreach { v =>
              if (!dist.contains(v) || dist(v) == d)
                if (!dist.contains(v)) { dist(v) = d; next(v) = sigma(u) }
                else if (next.contains(v)) next(v) += sigma(u)
            }
          }
          sigma ++= next
          levels += next.keys.toSeq
        }
        val delta = scala.collection.mutable.HashMap.empty[Long, Long]
          .withDefaultValue(0L)
        for (dd <- (levels.size - 2) to 0 by -1) {
          levels(dd).foreach { v =>
            adj.getOrElse(v, Array.empty[Long]).foreach { w =>
              if (dist.get(w).contains(dd + 1))
                delta(v) += (sigma(v) * (1000000L + delta(w))) / sigma(w)
            }
            if (dd > 0) bet(v) += delta(v)
          }
        }
      }
      return adj.keys.toSeq.sorted.map(v => (v, bet(v)))
        .toDF("id", "betweenness_micro")
        .select(col("id"), col("betweenness_micro"),
          (col("betweenness_micro").cast("double") / lit(2.0) / lit(1e6))
            .as("betweenness"))
    }
    // forward: level-synchronous multi-source BFS carrying sigma
    var frontier = sym.select(col("src").as("root"), col("src").as("node"))
      .distinct().withColumn("sigma", lit(1L))
      .localCheckpoint(true)
    val levels = scala.collection.mutable.ArrayBuffer(frontier)
    var all = frontier.select("root", "node")
    var d = 0
    var frontierRows = frontier.count()
    while (frontierRows > 0) {
      require(d < maxDepth,
        s"betweenness: BFS not exhausted in $maxDepth levels — raise maxDepth")
      d += 1
      frontier = frontier
        .join(sym.withColumnRenamed("src", "node"), "node")
        .groupBy(col("root"), col("dst").as("node"))
        .agg(sum("sigma").as("sigma"))
        .join(all, Seq("root", "node"), "left_anti")
        .localCheckpoint(true)
      frontierRows = frontier.count()
      if (frontierRows > 0) {
        levels += frontier
        all = all.unionByName(frontier.select("root", "node"))
          .localCheckpoint(true)
      }
    }
    // backward: dependency accumulation, deepest level first
    var perLevelDeltas = List.empty[DataFrame]
    var succ = levels.last.withColumn("delta", lit(0L))
    perLevelDeltas ::= succ
    for (dd <- (levels.size - 2) to 1 by -1) {
      val cur = levels(dd)
      val terms = cur
        .join(sym.withColumnRenamed("src", "node"), "node")
        .join(succ.select(col("root"), col("node").as("dst"),
          col("sigma").as("__sw"), col("delta").as("__dw")), Seq("root", "dst"))
        .select(col("root"), col("node"),
          expr("(sigma * (1000000 + __dw)) div __sw").as("__t"))
        .groupBy("root", "node").agg(sum("__t").as("__dsum"))
      succ = cur.join(terms, Seq("root", "node"), "left")
        .select(col("root"), col("node"), col("sigma"),
          coalesce(col("__dsum"), lit(0L)).as("delta"))
        .localCheckpoint(true)
      perLevelDeltas ::= succ
    }
    perLevelDeltas.map(_.select("node", "delta")).reduce(_.unionByName(_))
      .groupBy(col("node").as("id"))
      .agg(sum("delta").as("betweenness_micro"))
      .select(col("id"), col("betweenness_micro"),
        (col("betweenness_micro").cast("double") / lit(2.0) / lit(1e6))
          .as("betweenness"))
  }

  /** HARMONIC centrality within a hop radius: for every node with ≥ 1
    * edge, Σ_{0 < d(u,v) ≤ maxDepth} 1e6 div d(u,v) — the
    * distance-based centrality that is well-defined on DISCONNECTED
    * graphs (closeness blows up across components; harmonic just sums
    * reciprocals — Boldi & Vigna 2014), which near-dup graphs always
    * are. Ranks the "middle" of a duplication neighborhood: a doc one
    * hop from everything (the template source) outscores chain ends
    * even when degrees tie — the canonical-pick signal [[pageRank]]
    * approximates by mass flow, measured here by exact distances.
    *
    * Truncated at `maxDepth` (the standard bounded variant): each BFS
    * level is one frontier ⋈ edges join + an anti-join against the
    * known set — multi-source BFS whose state is the (root, node)
    * reachable-pair relation, Σ comp_size² rows. That is the
    * cluster-bounded-graph budget (near-dup components are
    * cluster-sized); on a giant-component graph the maxDepth cap is
    * the scale bound, exactly as in the streaming-graph literature.
    * Distances are exact integers; 1e6 div d is the usual truncating
    * micro grid, so both engines sum identical longs.
    *
    * Fast path below `driverEdgeThreshold` runs the identical BFS on
    * collected adjacency (the [[kCore]] bounded-domain argument),
    * bit-equal output, spec-pinned against the forced distributed loop.
    *
    * Returns (id, n_reached, harmonic_micro) for nodes with ≥ 1 edge,
    * n_reached = nodes within maxDepth (self excluded).
    */
  def harmonicCentrality(edges: DataFrame, aCol: String, bCol: String,
      maxDepth: Int = 4, driverEdgeThreshold: Long = 1L << 18): DataFrame = {
    require(maxDepth >= 1)
    val spark = edges.sparkSession
    val sym = graft.CacheScope.register(
      edges.select(explode(array(
          struct(col(aCol).cast("long").as("src"), col(bCol).cast("long").as("dst")),
          struct(col(bCol).cast("long").as("src"), col(aCol).cast("long").as("dst"))))
        .as("__e"))
        .select(col("__e.src").as("src"), col("__e.dst").as("dst"))
        .filter(col("src").isNotNull && col("dst").isNotNull &&
          col("src") =!= col("dst"))
        .distinct())
    if (sym.count() <= driverEdgeThreshold) {
      import spark.implicits._
      val adj = sym.as[(Long, Long)].collect().groupBy(_._1)
        .map { case (s, g) => s -> g.map(_._2) }
      val out = adj.keys.toSeq.sorted.map { root =>
        val dist = scala.collection.mutable.HashMap(root -> 0)
        var frontier = Seq(root)
        var d = 0
        while (frontier.nonEmpty && d < maxDepth) {
          d += 1
          frontier = frontier.flatMap(adj.getOrElse(_, Array.empty[Long]))
            .distinct.filterNot(dist.contains)
          frontier.foreach(dist(_) = d)
        }
        val reached = dist.toSeq.filter(_._2 > 0)
        (root, reached.size.toLong,
          reached.map(1000000L / _._2).sum)
      }
      return out.toDF("id", "n_reached", "harmonic_micro")
    }
    var all = sym.select(col("src").as("root"), col("src").as("node"))
      .distinct().withColumn("d", lit(0))
    var frontier = all
    var d = 0
    var frontierRows = 1L
    while (frontierRows > 0 && d < maxDepth) {
      d += 1
      frontier = frontier
        .join(sym.withColumnRenamed("src", "node"), "node")
        .select(col("root"), col("dst").as("node")).distinct()
        .join(all, Seq("root", "node"), "left_anti")
        .withColumn("d", lit(d))
        .localCheckpoint(true)
      frontierRows = frontier.count()
      if (frontierRows > 0) all = all.unionByName(frontier).localCheckpoint(true)
    }
    all.filter(col("d") > 0)
      .groupBy(col("root").as("id"))
      .agg(count(lit(1)).as("n_reached"),
        sum(expr("1000000 div d")).as("harmonic_micro"))
  }

  /** DEGREE ASSORTATIVITY (Newman 2002): the Pearson correlation of
    * (deg(u), deg(v)) over every directed endpoint pair of the
    * symmetrized edge set — do high-degree nodes attach to each other
    * (r > 0, social-network shape) or to leaves (r < 0, hub-and-spoke /
    * star shape)? The one-number structural summary that says whether a
    * near-dup graph is template-hub-dominated before anyone pays for
    * clustering it.
    *
    * Over the symmetric relation Σdeg(src) = Σdeg(dst) and
    * Σdeg(src)² = Σdeg(dst)², so r = (M·Sxy − Sx²) / (M·Sxx − Sx²)
    * with M = directed edge count — exact integer moments routed through
    * DECIMAL(38,0) (degrees ≤ 2³¹, products < 10³⁸ for any real graph),
    * ONE pinned double division at the end.
    *
    * Scale shape: one degree aggregate + two equi-joins of the edge list
    * against the node-sized degree relation + one moment aggregate —
    * O(E) total, no windows, no pair enumeration.
    */
  def assortativity(edges: DataFrame, aCol: String, bCol: String): DataFrame = {
    val sym = graft.CacheScope.register(
      edges.select(explode(array(
          struct(col(aCol).cast("long").as("src"), col(bCol).cast("long").as("dst")),
          struct(col(bCol).cast("long").as("src"), col(aCol).cast("long").as("dst"))))
        .as("__e"))
        .select(col("__e.src").as("src"), col("__e.dst").as("dst"))
        .filter(col("src").isNotNull && col("dst").isNotNull &&
          col("src") =!= col("dst"))
        .distinct())
    val deg = graft.CacheScope.register(
      sym.groupBy(col("src").as("id")).agg(count(lit(1)).as("dg")))
    def dec(c: Column): Column = c.cast("decimal(38,0)")
    val moments = sym
      .join(deg.select(col("id").as("src"), col("dg").as("dx")), "src")
      .join(deg.select(col("id").as("dst"), col("dg").as("dy")), "dst")
      .agg(count(lit(1)).as("m"),
        sum(dec(col("dx"))).cast("long").as("sx"),
        sum(dec(col("dx")) * dec(col("dx"))).cast("long").as("sxx"),
        sum(dec(col("dx")) * dec(col("dy"))).cast("long").as("sxy"))
    moments.select(col("m"), col("sx"), col("sxx"), col("sxy"),
      when(dec(col("m")) * col("sxx") - dec(col("sx")) * col("sx") > 0,
        (dec(col("m")) * col("sxy") - dec(col("sx")) * col("sx")).cast("double")
          / (dec(col("m")) * col("sxx") - dec(col("sx")) * col("sx")).cast("double"))
        .as("assortativity"))
  }

  /** HOP-BOUNDED WEIGHTED SHORTEST PATHS (Bellman-Ford relaxation) from
    * the minimum-id node of an undirected weighted graph: after `rounds`
    * relaxations, dist(v) is EXACTLY the cheapest path of ≤ rounds hops
    * — the bounded-horizon SSSP every "how close is this node to the
    * hub?" feature needs, with the horizon made explicit instead of
    * iterating to an unbounded fixed point. Weights are positive integer
    * micro; distances stay exact BIGINT sums, so every engine agrees
    * bit-for-bit.
    *
    * Scale shape: each round is one equi-join of the CURRENT frontier
    * relation against the edge list plus one min-aggregate — O(E) work
    * per round, `rounds` a small constant; the distance relation is
    * bounded by the reachable set. No driver loop over data — only the
    * constant unroll. The lineage is cut per round via CacheScope so
    * the unrolled plan stays linear, not exponential.
    *
    * Returns (node, dist_micro) for every node within `rounds` hops,
    * ordered by node.
    */
  def ssspBounded(edges: DataFrame, aCol: String, bCol: String,
      wCol: String, rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 8, s"rounds out of range: $rounds")
    val half = edges.select(col(aCol).cast("long").as("u"),
      col(bCol).cast("long").as("v"), col(wCol).cast("long").as("w"))
    val e = graft.CacheScope.register(half.union(
      half.select(col("v").as("u"), col("u").as("v"), col("w"))))
    var dist = e.agg(min("u").as("node"))
      .withColumn("dist_micro", lit(0L))
      .localCheckpoint(true)
    for (_ <- 1 to rounds) {
      val relax = dist.join(e, dist("node") === e("u"))
        .select(e("v").as("node"),
          (dist("dist_micro") + e("w")).as("dist_micro"))
      // materialize per round: cuts the unrolled lineage AND the
      // self-join ambiguity of re-joining the same edge relation
      dist = dist.union(relax).groupBy("node")
        .agg(min("dist_micro").as("dist_micro"))
        .localCheckpoint(true)
    }
    dist.orderBy("node")
  }

  /** LINK-PREDICTION SUITE — common neighbors, Jaccard, and preferential
    * attachment for every non-adjacent wedge pair, the three classic
    * baselines (Liben-Nowell & Kleinberg 2003) beside [[adamicAdar]]
    * (q270) and resource allocation (q239): CN is raw overlap, Jaccard
    * normalizes it by the union degree (downranks hubs), PA is the
    * "rich get richer" null model any real predictor must beat. All
    * three come off ONE wedge relation and ONE degree table, entirely
    * on the integer grid: jaccard_micro = (cn·10⁶) div (dᵤ + dᵥ − cn),
    * pa_score = dᵤ·dᵥ — bit-exact in any engine.
    *
    * Scale shape: the adamicAdar skeleton — adjacency self-join on the
    * wedge center (Σ deg² pairs, never all-pairs; `degreeCap` bounds it
    * to E·cap — [[capAdjacency]], default ∞ = exact), one (u,v)
    * aggregate, an anti-join against the existing edges, two
    * broadcast-able degree joins, top-k. Candidates ranked by
    * (cn, jaccard) with the pair id making the order total. The degree
    * columns and Jaccard denominators always use TRUE degrees.
    */
  def linkPredictionSuite(edges: DataFrame, aCol: String, bCol: String,
      k: Int, degreeCap: Int = DefaultDegreeCap,
      exact: Boolean = false): DataFrame = {
    require(k >= 1)
    val effCap = if (exact) Int.MaxValue else degreeCap
    val canon = graft.CacheScope.register(
      edges.select(
          least(col(aCol).cast("long"), col(bCol).cast("long")).as("u"),
          greatest(col(aCol).cast("long"), col(bCol).cast("long")).as("v"))
        .filter(col("u").isNotNull && col("v").isNotNull && col("u") < col("v"))
        .distinct())
    // one up-front shuffle on the wedge center: the cached adjacency
    // keeps HashPartitioning(ctr), so the degree aggregate, the weight
    // join, and BOTH sides of the wedge self-join reuse it exchange-free
    // (the localClustering co-location note)
    val adj = graft.CacheScope.register(
      canon.select(col("u").as("ctr"), col("v").as("nb"))
        .unionAll(canon.select(col("v").as("ctr"), col("u").as("nb")))
        .repartition(col("ctr")))
    val deg = graft.CacheScope.register(
      adj.groupBy("ctr").agg(count(lit(1)).as("d")))
    val adjC = capAdjacency(adj, effCap)
    val cn = adjC.as("x").join(adjC.as("y"),
        col("x.ctr") === col("y.ctr") && col("x.nb") < col("y.nb"))
      .groupBy(col("x.nb").as("u"), col("y.nb").as("v"))
      .agg(count(lit(1)).as("common_neighbors"))
      .join(canon, Seq("u", "v"), "left_anti")
    cn.join(deg.select(col("ctr").as("u"), col("d").as("deg_a")), "u")
      .join(deg.select(col("ctr").as("v"), col("d").as("deg_b")), "v")
      .select(col("u").as("id_a"), col("v").as("id_b"),
        col("common_neighbors"), col("deg_a"), col("deg_b"),
        expr("(common_neighbors * 1000000L) div " +
          "(deg_a + deg_b - common_neighbors)").as("jaccard_micro"),
        (col("deg_a") * col("deg_b")).as("pa_score"))
      .orderBy(col("common_neighbors").desc, col("jaccard_micro").desc,
        col("id_a"), col("id_b"))
      .limit(k)
  }

  /** RICH-CLUB COEFFICIENT curve φ(k) = 2·E_k / (N_k·(N_k−1)) — do the
    * high-degree nodes form their own densely-wired club (Zhou &
    * Mondragón 2004)? The hub-interconnection audit that degree
    * distribution (q190) and assortativity (q191/q266) summarize but
    * cannot localize: assortativity is one global number; φ(k) shows AT
    * WHICH degree tier the clubbing starts. All-integer — counts and
    * one truncating micro division per level.
    *
    * Scale shape: one degree aggregate, one two-sided degree join onto
    * the edge list, then a `maxK`-way fan-out of edges/nodes to their
    * qualifying levels (maxK is a small constant — linear in E, never
    * quadratic). Output per k ∈ [1, maxK]:
    * (k, n_nodes, n_edges, phi_micro), phi null when N_k < 2.
    */
  def richClub(edges: DataFrame, aCol: String, bCol: String,
      maxK: Int): DataFrame = {
    require(maxK >= 1)
    val canon = graft.CacheScope.register(
      edges.select(
          least(col(aCol).cast("long"), col(bCol).cast("long")).as("u"),
          greatest(col(aCol).cast("long"), col(bCol).cast("long")).as("v"))
        .filter(col("u").isNotNull && col("v").isNotNull && col("u") < col("v"))
        .distinct())
    val deg = graft.CacheScope.register(
      canon.select(col("u").as("n"), col("v").as("m"))
        .unionAll(canon.select(col("v").as("n"), col("u").as("m")))
        .groupBy("n").agg(count(lit(1)).as("d")))
    val levels = (1 to maxK).map(_.toLong)
    val nodesK = deg
      .select(col("d"), explode(lit(levels.toArray)).as("k"))
      .filter(col("d") > col("k"))
      .groupBy("k").agg(count(lit(1)).as("n_nodes"))
    val edgesK = canon
      .join(deg.select(col("n").as("u"), col("d").as("du")), "u")
      .join(deg.select(col("n").as("v"), col("d").as("dv")), "v")
      .select(explode(lit(levels.toArray)).as("k"), col("du"), col("dv"))
      .filter(col("du") > col("k") && col("dv") > col("k"))
      .groupBy("k").agg(count(lit(1)).as("n_edges"))
    val spine = canon.sparkSession.range(1, maxK + 1)
      .select(col("id").as("k"))
    spine.join(nodesK, Seq("k"), "left").join(edgesK, Seq("k"), "left")
      .select(col("k"),
        coalesce(col("n_nodes"), lit(0L)).as("n_nodes"),
        coalesce(col("n_edges"), lit(0L)).as("n_edges"))
      .withColumn("phi_micro",
        when(col("n_nodes") >= 2,
          expr("(2L * n_edges * 1000000L) div (n_nodes * (n_nodes - 1L))")))
      .orderBy("k")
  }
}
