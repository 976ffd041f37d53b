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
}
