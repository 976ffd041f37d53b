package graft.operators

import graft.SparkSpec

class GraphsSpec extends SparkSpec {

  private def cc(edges: Seq[(Long, Long)], driverThreshold: Long = 1L << 20): Map[Long, Long] = {
    import spark.implicits._
    Graphs.connectedComponents(edges.toDF("a", "b"), "a", "b",
        driverThreshold = driverThreshold)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
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
}
