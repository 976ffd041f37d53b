package graft.operators

import graft.SparkSpec

class GraphsSpec extends SparkSpec {

  private def cc(edges: Seq[(Long, Long)], driverThreshold: Long = 1L << 20): Map[Long, Long] = {
    import spark.implicits._
    Graphs.connectedComponents(edges.toDF("a", "b"), "a", "b",
        driverThreshold = driverThreshold)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("markovStationary: symmetric 2-state chain stays uniform; biased " +
      "chain matches the hand-unrolled truncating fixed point") {
    import spark.implicits._
    val sym = Seq(("a", "b", 1L), ("b", "a", 1L)).toDF("f", "t", "n")
    val symPi = Graphs.markovStationary(sym, "f", "t", "n", 3)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("pi_scaled")).toMap
    assert(symPi == Map("a" -> 500000000000L, "b" -> 500000000000L))

    // a→a:3, a→b:1, b→a:1 — hand-unrolled on the 1e12 grid:
    // r1=(875e9, 125e9), r2=(781.25e9, 218.75e9),
    // r3=(804.6875e9, 195.3125e9)
    val biased = Seq(("a", "a", 3L), ("a", "b", 1L), ("b", "a", 1L))
      .toDF("f", "t", "n")
    val pi = Graphs.markovStationary(biased, "f", "t", "n", 3)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("pi_scaled")).toMap
    assert(pi == Map("a" -> 804687500000L, "b" -> 195312500000L))

    // the distributed fallback (forced via threshold 0) computes the
    // SAME truncating integer recursion bit-for-bit
    val piDist = Graphs.markovStationary(biased, "f", "t", "n", 3,
        driverEdgeThreshold = 0L)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("pi_scaled")).toMap
    assert(piDist == pi)
  }

  test("driver union-find and distributed label propagation agree") {
    val edges = Seq((3L, 7L), (7L, 9L), (9L, 12L), (20L, 25L), (1L, 25L))
    assert(cc(edges) == cc(edges, driverThreshold = 0L)) // force the loop
  }

  test("connectedComponents labels every component with its minimum id") {
    // two components: a 4-node path (transitivity across hops) + a pair
    val out = cc(Seq((3L, 7L), (7L, 9L), (9L, 12L), (20L, 25L)))
    assert(out == Map(3L -> 3L, 7L -> 3L, 9L -> 3L, 12L -> 3L,
      20L -> 20L, 25L -> 20L))
  }

  test("connectedComponents handles a long chain (diameter > 2) and " +
      "reversed edge direction") {
    val chain = (0L until 12L).map(i => (i + 1, i)) // edges given high->low
    val out = cc(chain, driverThreshold = 0L)       // force the loop path
    assert(out.values.toSet == Set(0L))
    assert(out.keySet == (0L to 12L).toSet)
  }

  test("connectedComponents is deterministic across partitionings " +
      "(distributed loop path)") {
    import spark.implicits._
    val edges = Seq((1L, 5L), (5L, 2L), (8L, 9L), (2L, 7L), (10L, 9L))
    val a = cc(edges, driverThreshold = 0L) // force the loop, not union-find
    val b = Graphs.connectedComponents(
        edges.toDF("a", "b").repartition(13), "a", "b", driverThreshold = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
    assert(a(7L) == 1L && a(10L) == 8L)
  }

  test("triangleStats: exact counts on a triangle + pendant, reversed and " +
      "duplicate edges collapse, degree-1 coefficient is NULL") {
    import spark.implicits._
    // triangle 1-2-3, pendant 4 on 1; (2,1) duplicates (1,2) reversed
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (1L, 4L), (2L, 1L))
      .toDF("a", "b")
    val out = Graphs.triangleStats(edges, "a", "b").collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3))))).toMap
    // node 1: degree 3, 1 triangle, cc = 1/3 wedges → floor((2e6+3)/6)
    assert(out(1L) == ((3L, 1L, Some(333333L))))
    // nodes 2,3: degree 2, 1 triangle, cc = 1/1 → 1e6
    assert(out(2L) == ((2L, 1L, Some(1000000L))))
    assert(out(3L) == ((2L, 1L, Some(1000000L))))
    // pendant: no wedge, NULL coefficient
    assert(out(4L) == ((1L, 0L, None)))
  }

  test("triangleStats: two disjoint K4 cliques — every node deg 3, " +
      "3 triangles, coefficient exactly 1") {
    import spark.implicits._
    def k4(base: Long) = for {
      i <- 0 until 4; j <- i + 1 until 4
    } yield (base + i, base + j)
    val edges = (k4(0L) ++ k4(100L)).toDF("a", "b")
    val out = Graphs.triangleStats(edges, "a", "b").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out.size == 8)
    out.values.foreach(v => assert(v == ((3L, 3L, 1000000L))))
  }

  private def pr(nodes: Seq[Long], edges: Seq[(Long, Long)],
      iters: Int = 3): Map[Long, Long] = {
    import spark.implicits._
    Graphs.pageRank(nodes.toDF("id"), "id",
        edges.toDF("a", "b"), "a", "b", iters = iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("pageRank: star center outranks leaves, leaves tie by symmetry") {
    val out = pr(Seq(1L, 2L, 3L, 4L), Seq((1L, 2L), (1L, 3L), (1L, 4L)))
    assert(out(1L) > out(2L))
    assert(out(2L) == out(3L) && out(3L) == out(4L))
  }

  test("pageRank: conserves total mass up to integer truncation") {
    val nodes = (1L to 50L).toSeq
    val edges = (1L until 50L).map(i => (i, i + 1)) // path graph
    val out = pr(nodes, edges)
    val total = out.values.sum
    val scale = 1000000000000L
    // each truncating division loses < 1 micro-unit; 3 iterations over
    // N nodes + E directed edges bounds the loss far below this slack
    assert(total <= scale)
    assert(total > scale - 3L * (nodes.size + 2 * edges.size + 2) - 100)
  }

  test("pageRank: fully disconnected graph keeps every node at base rank") {
    val out = pr(Seq(1L, 2L, 3L, 4L, 5L), Seq.empty)
    // all nodes dangling: rank = 0.15/N + 0.85*(danglingShare) each round,
    // which fixes at ~1/N for every node
    assert(out.values.toSet.size == 1)
    val r = out.values.head
    assert(math.abs(r - 200000000000L) < 5) // 1/5 in micro-units
  }

  test("pageRank: isolated node holds base-level rank while a clique " +
      "concentrates mass, and reruns are bit-identical across partitionings") {
    import spark.implicits._
    val nodes = Seq(1L, 2L, 3L, 9L)
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L)) // triangle + isolated 9
    val a = pr(nodes, edges)
    // triangle members tie; isolated node keeps less than a member
    assert(a(1L) == a(2L) && a(2L) == a(3L))
    assert(a(9L) < a(1L))
    val b = Graphs.pageRank(nodes.toDF("id").repartition(7), "id",
        edges.toDF("a", "b").repartition(5), "a", "b", iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
  }

  test("pageRank family: an edge whose endpoint is OUTSIDE the node " +
      "universe contributes nothing — fast path matches the distributed " +
      "join semantics instead of throwing") {
    import spark.implicits._
    val nodes = Seq(1L, 2L, 3L)
    // edge (3,99): 99 is not in `nodes` — the distributed loop drops its
    // contribution via the inner join with rank; the driver fast path
    // must do the same (round-8 regression: r(99) threw)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 99L))
    val fast = pr(nodes, edges)
    val dist = Graphs.pageRank(nodes.toDF("id"), "id",
        edges.toDF("a", "b"), "a", "b", iters = 3,
        driverEdgeThreshold = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast == dist)
    assert(fast.keySet == Set(1L, 2L, 3L))
    val wFast = Graphs.weightedPageRank(nodes.toDF("id"), "id",
        edges.map { case (a, b) => (a, b, 500000L) }.toDF("a", "b", "w"),
        "a", "b", "w", iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val wDist = Graphs.weightedPageRank(nodes.toDF("id"), "id",
        edges.map { case (a, b) => (a, b, 500000L) }.toDF("a", "b", "w"),
        "a", "b", "w", iters = 3, driverEdgeThreshold = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(wFast == wDist)
    val pFast = Graphs.personalizedPageRank(nodes.toDF("id"), "id",
        edges.toDF("a", "b"), "a", "b", _ === 1L, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pDist = Graphs.personalizedPageRank(nodes.toDF("id"), "id",
        edges.toDF("a", "b"), "a", "b", _ === 1L, iters = 3,
        driverEdgeThreshold = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pFast == pDist)
  }

  test("harmonicCentrality: exact hand-computed sums on a path graph, " +
      "depth cap honored, fast and distributed paths bit-equal") {
    import spark.implicits._
    // path 1-2-3-4-5, maxDepth 2
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("a", "b")
    def m(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("n_reached"), r.getAs[Long]("harmonic_micro"))).toMap
    val fast = m(Graphs.harmonicCentrality(edges, "a", "b", maxDepth = 2))
    // node 3 (center): d=1 to {2,4}, d=2 to {1,5} -> 2e6 + 2*5e5 = 3e6
    assert(fast(3L) == ((4L, 3000000L)))
    // node 1 (end): d=1 to 2, d=2 to 3; 4 and 5 beyond the cap
    assert(fast(1L) == ((2L, 1500000L)))
    assert(fast(2L) == ((3L, 2500000L))) // 1,3 at d=1; 4 at d=2
    val dist = m(Graphs.harmonicCentrality(edges, "a", "b", maxDepth = 2,
      driverEdgeThreshold = 0L))
    assert(fast == dist)
    graft.CacheScope.releaseAll()
  }

  test("betweenness: hand-computed exact-integer Brandes on a path, " +
      "clique members all zero, fast and distributed paths bit-equal") {
    import spark.implicits._
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    def m(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("betweenness_micro"), r.getAs[Double]("betweenness")))
      .toMap
    val fast = m(Graphs.betweenness(path, "a", "b"))
    // path 1-2-3-4: node 2 carries (1,3) and (1,4) -> bc 2.0; by the
    // exact recursion the micro sum is 2e6 (root1) + 1e6 (root3) + 1e6
    // (root4) = 4e6, symmetric for node 3; ends carry nothing
    assert(fast == Map(1L -> ((0L, 0.0)), 2L -> ((4000000L, 2.0)),
      3L -> ((4000000L, 2.0)), 4L -> ((0L, 0.0))))
    val dist = m(Graphs.betweenness(path, "a", "b",
      driverEdgeThreshold = 0L))
    assert(fast == dist)
    graft.CacheScope.releaseAll()
    // a triangle has no intermediate shortest-path nodes
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("a", "b")
    assert(m(Graphs.betweenness(tri, "a", "b"))
      .values.forall(_ == ((0L, 0.0))))
    graft.CacheScope.releaseAll()
    // diameter deeper than maxDepth fails loudly instead of truncating
    val long = (1L to 9L).map(i => (i, i + 1)).toDF("a", "b")
    intercept[IllegalArgumentException] {
      Graphs.betweenness(long, "a", "b", maxDepth = 3)
    }
    graft.CacheScope.releaseAll()
  }

  test("kCore: a clique survives, chains and pendants peel away in a " +
      "cascade, and the empty core is an empty frame") {
    import spark.implicits._
    // 4-clique {1,2,3,4} + pendant 8 on node 1 + chain 5-6-7
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (1L, 8L), (5L, 6L), (6L, 7L)).toDF("a", "b")
    val core3 = Graphs.kCore(edges, "a", "b", k = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // only the clique: pendant 8 drops round 1 (deg 1); node 1 keeps
    // degree 3 WITHIN the core (the pendant edge is gone)
    assert(core3 == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    val core2 = Graphs.kCore(edges, "a", "b", k = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // chain peels in CASCADE: 5 and 7 (deg 1) drop round 1, leaving 6
    // with deg 0 to drop round 2 — clique survives, pendant drops
    assert(core2.keySet == Set(1L, 2L, 3L, 4L))
    // k above the max degree: everything peels, empty result
    assert(Graphs.kCore(edges, "a", "b", k = 5).count() == 0L)
  }

  test("kCore: result is partitioning-independent and matches a fresh " +
      "run bit-for-bit") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 5L),
      (4L, 6L), (5L, 6L)).toDF("a", "b")
    val a = Graphs.kCore(edges, "a", "b", k = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Graphs.kCore(edges.repartition(7), "a", "b", k = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
    // the driver fast path and the forced distributed loop agree
    // bit-for-bit (same simultaneous-peel rounds, same degrees)
    val dist = Graphs.kCore(edges, "a", "b", k = 2,
        driverEdgeThreshold = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == dist)
    // two triangles bridged by 3-4: every node keeps degree >= 2, so
    // nothing peels and the bridge edge STAYS in the 2-core (its ends
    // carry it: degree 3 each)
    assert(a == Map(1L -> 2L, 2L -> 2L, 3L -> 3L, 4L -> 3L, 5L -> 2L, 6L -> 2L))
  }

  test("localClustering: triangle + tail degrees, triangles, exact lcc") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("a", "b")
    val out = Graphs.localClustering(edges, "a", "b").collect()
      .map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("degree"), r.getAs[Long]("triangles"),
          r.getAs[Long]("lcc_micro")))).toMap
    assert(out(1L) == ((2L, 1L, 1000000L)))
    assert(out(2L) == ((2L, 1L, 1000000L)))
    // node 3: degree 3, one closed pair of three -> 2*1e6/6
    assert(out(3L) == ((3L, 1L, 333333L)))
    assert(out(4L) == ((1L, 0L, 0L))) // degree-1 convention: lcc = 0
  }

  test("resourceAllocation: non-adjacent pairs scored 1/deg of shared hub") {
    import spark.implicits._
    // star around 2: leaves 1, 3, 4 pairwise non-adjacent, hub degree 3
    val edges = Seq((1L, 2L), (2L, 3L), (2L, 4L)).toDF("a", "b")
    val out = Graphs.resourceAllocation(edges, "a", "b", 10).collect()
      .map(r => ((r.getAs[Long]("id_a"), r.getAs[Long]("id_b")),
        (r.getAs[Long]("common_neighbors"), r.getAs[Long]("ra_score_micro"))))
      .toMap
    val third = 1000000000000L / 3
    assert(out == Map((1L, 3L) -> ((1L, third)), (1L, 4L) -> ((1L, third)),
      (3L, 4L) -> ((1L, third))))
  }

  test("degreeCap: cap >= max degree is bit-identical to uncapped for " +
      "RA/AA/linkPredictionSuite; a tight cap drops only capped-hub wedges") {
    import spark.implicits._
    // hub 0 with 5 leaves (deg 5) + a separate wedge 10-11-12 (deg 2)
    val edges = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L), (0L, 5L),
      (10L, 11L), (11L, 12L)).toDF("a", "b")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSeq
    // cap >= max degree (5): exactness contract — identical output for
    // an explicit cap, the bounded DEFAULT (64 > every degree here), and
    // the exact = true opt-out (r11 verdict #7: the default is finite)
    assert(rows(Graphs.resourceAllocation(edges, "a", "b", 50, degreeCap = 5))
      == rows(Graphs.resourceAllocation(edges, "a", "b", 50)))
    assert(rows(Graphs.resourceAllocation(edges, "a", "b", 50))
      == rows(Graphs.resourceAllocation(edges, "a", "b", 50, exact = true)))
    assert(rows(Graphs.adamicAdar(edges, "a", "b", 50, degreeCap = 5))
      == rows(Graphs.adamicAdar(edges, "a", "b", 50)))
    assert(rows(Graphs.adamicAdar(edges, "a", "b", 50))
      == rows(Graphs.adamicAdar(edges, "a", "b", 50, exact = true)))
    assert(rows(Graphs.linkPredictionSuite(edges, "a", "b", 50, degreeCap = 5))
      == rows(Graphs.linkPredictionSuite(edges, "a", "b", 50)))
    assert(rows(Graphs.linkPredictionSuite(edges, "a", "b", 50))
      == rows(Graphs.linkPredictionSuite(edges, "a", "b", 50, exact = true)))
    // cap 2 keeps the hub's two LOWEST-ID neighbors {1,2}: only the
    // (1,2) hub wedge survives, and its weight still uses TRUE deg 5;
    // the uncapped center 11 (deg 2) keeps its (10,12) wedge untouched
    val capped = Graphs.resourceAllocation(edges, "a", "b", 50, degreeCap = 2)
      .collect().map(r => ((r.getAs[Long]("id_a"), r.getAs[Long]("id_b")),
        r.getAs[Long]("ra_score_micro"))).toMap
    assert(capped == Map(
      (1L, 2L) -> 1000000000000L / 5, (10L, 12L) -> 1000000000000L / 2))
  }

  test("degreeCap default (64) actually bounds the default path: a hub " +
      "over the cap keeps only its 64 lowest-id neighbors' wedges") {
    import spark.implicits._
    // hub 0 with 70 leaves: exact RA has C(70,2) pairs, default C(64,2)
    val edges = (1L to 70L).map(l => (0L, l)).toDF("a", "b")
    val dflt = Graphs.resourceAllocation(edges, "a", "b", 5000)
    val expl = Graphs.resourceAllocation(edges, "a", "b", 5000,
      degreeCap = Graphs.DefaultDegreeCap)
    val exact = Graphs.resourceAllocation(edges, "a", "b", 5000, exact = true)
    assert(dflt.count() == 64L * 63 / 2)
    assert(exact.count() == 70L * 69 / 2)
    assert(dflt.collect().map(_.toSeq).toSeq
      == expl.collect().map(_.toSeq).toSeq)
    // capped wedges still weight by the TRUE hub degree (70)
    assert(dflt.select("ra_score_micro").distinct().collect()
      .map(_.getLong(0)).toSeq == Seq(1000000000000L / 70))
  }

  test("kTruss: triangle edges survive k=3, bridge and tail edges peel; " +
      "driver and distributed paths agree bit-exactly") {
    import spark.implicits._
    // triangle {1,2,3} + bridge 3-4 + tail 4-5
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
      .toDF("a", "b")
    val viaDriver = Graphs.kTruss(edges, "a", "b", k = 3, maxRounds = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(viaDriver == Seq((1L, 2L, 1L), (1L, 3L, 1L), (2L, 3L, 1L)))
    val viaDistributed = Graphs.kTruss(edges, "a", "b", k = 3,
        maxRounds = 4, driverEdgeThreshold = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(viaDistributed == viaDriver)
    // k=4 on the same graph: every edge has support 1 < 2 -> empty truss
    assert(Graphs.kTruss(edges, "a", "b", k = 4, maxRounds = 4).count() == 0)
  }

  test("personalizedPageRank: mass concentrates at the seed; all-seeds " +
      "degenerates to uniform pageRank bit-exactly") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    val nodes = Seq(1L, 2L, 3L, 4L).toDF("id")
    val ppr = Graphs.personalizedPageRank(nodes, "id", edges, "a", "b",
        id => id === 1L, iters = 3)
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("rank_micro"), r.getAs[Boolean]("is_seed")))).toMap
    assert(ppr(1L)._2 && !ppr(2L)._2)
    // hand-unrolled 3-iteration fixed point (path 1-2-3-4, seed 1,
    // damping 85/100, teleport 150e9 to the seed): the degree-1 seed
    // donates its whole mass to node 2 each round, and the odd/even hop
    // parity of a path leaves node 4 ahead of node 3 at iteration 3 —
    // the exact integer values pin the arithmetic
    assert(ppr(1L)._1 == 204187500000L)
    assert(ppr(2L)._1 == 588093750000L)
    assert(ppr(3L)._1 == 54187500000L)
    assert(ppr(4L)._1 == 153531250000L)
    // with EVERY node a seed, the teleport vector is uniform: PPR must
    // reproduce pageRank bit-exactly (same fixed-point arithmetic)
    val uniform = Graphs.personalizedPageRank(nodes, "id", edges, "a", "b",
        _ => org.apache.spark.sql.functions.lit(true), iters = 3)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("rank_micro"))
      .toMap
    val pr = Graphs.pageRank(nodes, "id", edges, "a", "b", iters = 3)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("rank_micro"))
      .toMap
    assert(uniform == pr)
  }

  test("pageRank family driver fast paths are bit-equal to the forced " +
      "distributed loops") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L))
      .toDF("a", "b")
    val nodes = Seq(1L, 2L, 3L, 4L, 5L).toDF("id") // 5 is dangling
    def m(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.toSeq.toList).toSet
    assert(m(Graphs.pageRank(nodes, "id", edges, "a", "b", iters = 3)) ==
      m(Graphs.pageRank(nodes, "id", edges, "a", "b", iters = 3,
        driverEdgeThreshold = 0L)))
    val wEdges = edges.withColumn("w",
      org.apache.spark.sql.functions.lit(500000L))
    assert(m(Graphs.weightedPageRank(nodes, "id", wEdges, "a", "b", "w",
        iters = 3)) ==
      m(Graphs.weightedPageRank(nodes, "id", wEdges, "a", "b", "w",
        iters = 3, driverEdgeThreshold = 0L)))
    assert(m(Graphs.hits(edges, "a", "b", iters = 2)) ==
      m(Graphs.hits(edges, "a", "b", iters = 2, driverEdgeThreshold = 0L)))
    assert(m(Graphs.personalizedPageRank(nodes, "id", edges, "a", "b",
        id => id <= 2L, iters = 3)) ==
      m(Graphs.personalizedPageRank(nodes, "id", edges, "a", "b",
        id => id <= 2L, iters = 3, driverEdgeThreshold = 0L)))
  }

  test("adamicAdar: star-graph leaf pairs score 1/ln(deg center) on the " +
      "integer grid; adjacent pairs excluded; ln(2) path case") {
    import spark.implicits._
    // star: center 9 with leaves 1..4 -> every leaf pair shares only the
    // deg-4 center
    val star = (1L to 4L).map(l => (9L, l)).toDF("a", "b")
    val out = Graphs.adamicAdar(star, "a", "b", 50).collect()
    graft.CacheScope.releaseAll()
    assert(out.length == 6) // C(4,2) leaf pairs; center pairs are edges
    val w4 = 1000000000000000000L / math.round(math.log(4.0) * 1e6)
    assert(out.forall(_.getAs[Long]("common_neighbors") == 1L))
    assert(out.forall(_.getAs[Long]("aa_score_micro") == w4))
    assert(out.forall(r => r.getAs[Long]("id_a") < r.getAs[Long]("id_b")))
    // path 1-2-3: candidate (1,3) via the deg-2 center -> 1/ln 2
    val path = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val rp = Graphs.adamicAdar(path, "a", "b", 10).collect()
    graft.CacheScope.releaseAll()
    val w2 = 1000000000000000000L / math.round(math.log(2.0) * 1e6)
    assert(rp.length == 1)
    assert(rp.head.getAs[Long]("id_a") == 1L &&
      rp.head.getAs[Long]("id_b") == 3L &&
      rp.head.getAs[Long]("aa_score_micro") == w2)
  }

  test("assortativity: star graph is exactly -1, regular graphs are " +
      "null-variance, path moments match the hand computation") {
    import spark.implicits._
    // star: center 0, leaves 1..5
    val star = (1L to 5L).map(l => (0L, l)).toDF("a", "b")
    val rs = Graphs.assortativity(star, "a", "b").collect().head
    graft.CacheScope.releaseAll()
    assert(rs.getAs[Double]("assortativity") == -1.0)
    // 4-cycle: every degree 2 -> zero variance -> undefined (null)
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("a", "b")
    val rc = Graphs.assortativity(cyc, "a", "b").collect().head
    graft.CacheScope.releaseAll()
    assert(rc.isNullAt(rc.fieldIndex("assortativity")))
    // path a-b-c: directed endpoints (1,2),(2,1),(2,1),(1,2)
    // m=4, sx=6, sxx=10, sxy=8 -> r=(32-36)/(40-36)=-1
    val path = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val rp = Graphs.assortativity(path, "a", "b").collect().head
    graft.CacheScope.releaseAll()
    assert(rp.getAs[Long]("m") == 4L)
    assert(rp.getAs[Long]("sx") == 6L)
    assert(rp.getAs[Long]("sxx") == 10L)
    assert(rp.getAs[Long]("sxy") == 8L)
    assert(rp.getAs[Double]("assortativity") == -1.0)
  }

  test("ssspBounded: hop-horizon Bellman-Ford distances are exact and " +
      "tighten with more rounds") {
    import spark.implicits._
    // path 1-2-3-4 (cheap) with an expensive 1-3 shortcut
    val edges = Seq((1L, 2L, 5L), (2L, 3L, 5L), (1L, 3L, 100L),
      (3L, 4L, 5L)).toDF("a", "b", "w")
    def run(rounds: Int) =
      Graphs.ssspBounded(edges, "a", "b", "w", rounds).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 2 rounds: node 3 still pays the shortcut relaxed to 10 via 2;
    // node 4 only reachable through the expensive 1-hop-3 path so far
    val r2 = run(2)
    assert(r2 == Map(1L -> 0L, 2L -> 5L, 3L -> 10L, 4L -> 105L))
    // 3 rounds: the cheap 3-hop path reaches node 4
    val r3 = run(3)
    assert(r3(4L) == 15L && r3(3L) == 10L && r3(1L) == 0L)
  }

  test("linkPredictionSuite: path-graph wedges score CN/Jaccard/PA by " +
      "hand; adjacent pairs are excluded") {
    import spark.implicits._
    // path 1-2-3-4: candidates are the two wedge pairs (1,3) and (2,4),
    // each with cn = 1, |union| = 2 → jaccard 0.5, pa = deg products
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    val out = Graphs.linkPredictionSuite(path, "a", "b", 10).collect()
    assert(out.length == 2)
    val m = out.map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
    val p13 = m((1L, 3L))
    assert(p13.getAs[Long]("common_neighbors") == 1L)
    assert(p13.getAs[Long]("deg_a") == 1L && p13.getAs[Long]("deg_b") == 2L)
    assert(p13.getAs[Long]("jaccard_micro") == 500000L)
    assert(p13.getAs[Long]("pa_score") == 2L)
    val p24 = m((2L, 4L))
    assert(p24.getAs[Long]("jaccard_micro") == 500000L &&
      p24.getAs[Long]("pa_score") == 2L)
    // close the (1,3) edge: that pair leaves the candidate set; the
    // deg-3 center 3 now wedges (1,4) and (2,4), both at jaccard 0.5
    val tri = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 3L)).toDF("a", "b")
    val out2 = Graphs.linkPredictionSuite(tri, "a", "b", 10).collect()
    val keys = out2.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(keys == Set((1L, 4L), (2L, 4L)))
    val q24 = out2.find(r => (r.getLong(0), r.getLong(1)) == (2L, 4L)).get
    assert(q24.getAs[Long]("deg_a") == 2L && q24.getAs[Long]("deg_b") == 1L &&
      q24.getAs[Long]("jaccard_micro") == 500000L)
  }

  test("richClub: path graph — the two inner nodes form a complete " +
      "k=1 club; higher tiers are empty") {
    import spark.implicits._
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    val out = Graphs.richClub(path, "a", "b", 2).collect()
    assert(out.length == 2)
    // k=1: nodes {2,3} (deg 2 > 1), their edge (2,3) exists → phi = 1
    assert(out(0).getAs[Long]("k") == 1L &&
      out(0).getAs[Long]("n_nodes") == 2L &&
      out(0).getAs[Long]("n_edges") == 1L &&
      out(0).getAs[Long]("phi_micro") == 1000000L)
    // k=2: nobody exceeds degree 2 → empty tier, phi undefined
    assert(out(1).getAs[Long]("n_nodes") == 0L && out(1).isNullAt(3))
  }
}
