package graft

import org.scalatest.funsuite.AnyFunSuite

/** Cost-balanced chunk packing for the forked-JVM bench harness (round-7
  * verdict item #1: alphabetical chunks concentrated the LSH family into
  * shared JVMs and inflated the driver's round-close artifact 3-5x).
  * Pure logic — no SparkSession.
  */
class BenchPackingSpec extends AnyFunSuite {

  test("packChunks covers every query exactly once, capacity respected") {
    val names = (1 to 23).map(i => f"q$i%03d")
    val costs = names.map(n => n -> 1.0).toMap
    val chunks = Bench.packChunks(names, 8, costs)
    assert(chunks.size == 3)
    assert(chunks.forall(_.size <= 8))
    assert(chunks.flatten.sorted == names.sorted)
  }

  test("heavy name-adjacent family is spread across chunks, not stacked") {
    // model the real failure: q55..q69 alphabetically adjacent AND heavy
    val heavy = (55 to 69 by 3).map(i => s"q$i").toSeq   // 5 heavy queries
    val light = (1 to 19).map(i => f"q$i%02d")           // 19 light
    val names = (heavy ++ light).sorted
    val costs = (heavy.map(_ -> 10.0) ++ light.map(_ -> 1.0)).toMap
    val chunks = Bench.packChunks(names, 8, costs)
    assert(chunks.size == 3)
    // min-load packing must put at most ceil(5/3)=2 heavies per chunk
    val heavySet = heavy.toSet
    assert(chunks.forall(c => c.count(heavySet) <= 2),
      s"a chunk stacked >2 heavy queries: $chunks")
    // and chunk cost totals stay within 2x of each other
    val totals = chunks.map(_.map(costs).sum)
    assert(totals.max <= 2.0 * totals.min,
      s"unbalanced chunk totals: $totals")
  }

  test("unknown (new-this-round) queries get median cost, still packed") {
    val names = Seq("q01", "q02", "q03", "qNEW")
    val costs = Map("q01" -> 5.0, "q02" -> 1.0, "q03" -> 1.0)
    val chunks = Bench.packChunks(names, 2, costs)
    assert(chunks.flatten.sorted == names.sorted)
    assert(chunks.forall(_.size <= 2))
  }

  test("no history degrades to stride (adjacent names in different bins)") {
    val names = (1 to 16).map(i => f"q$i%02d")
    val chunks = Bench.packChunks(names, 8, Map.empty)
    assert(chunks.size == 2)
    assert(chunks.flatten.sorted == names.sorted)
    // stride: q01 and q02 must land in different chunks
    val c0 = chunks.find(_.contains("q01")).get
    assert(!c0.contains("q02"))
  }

  test("per-pass jitter changes chunk composition but keeps the invariants") {
    val names = (1 to 40).map(i => f"q$i%03d")
    val costs = names.zipWithIndex.map { case (n, i) => n -> (1.0 + i % 7) }.toMap
    val passes = (0 until 3).map(p => Bench.packChunks(names, 8, costs, p))
    // every pass is a full, capacity-respecting partition
    passes.foreach { chunks =>
      assert(chunks.flatten.sorted == names.sorted)
      assert(chunks.forall(_.size <= 8))
    }
    // pass 0 is jitter-free — identical to the historical packing
    assert(passes(0) == Bench.packChunks(names, 8, costs))
    // co-runner sets actually differ between passes (the whole point):
    // at least one query's chunk-mates change pass-over-pass
    def mates(chunks: Seq[Seq[String]]): Map[String, Set[String]] =
      chunks.flatMap(c => c.map(n => n -> (c.toSet - n))).toMap
    val m0 = mates(passes(0)); val m1 = mates(passes(1))
    assert(names.exists(n => m0(n) != m1(n)),
      "pass jitter produced identical compositions")
    // and the jitter is deterministic: same pass -> same packing
    assert(passes(1) == Bench.packChunks(names, 8, costs, 1))
  }

  test("stride fallback rotates with pass") {
    val names = (1 to 16).map(i => f"q$i%02d")
    val p0 = Bench.packChunks(names, 8, Map.empty, 0)
    val p1 = Bench.packChunks(names, 8, Map.empty, 1)
    p0.foreach(c => assert(c.size <= 8))
    assert(p0.flatten.sorted == names.sorted)
    assert(p1.flatten.sorted == names.sorted)
    assert(p0 != p1, "stride fallback ignored the pass rotation")
  }

  test("single chunk and empty input edge cases") {
    assert(Bench.packChunks(Nil, 8, Map.empty) == Seq.empty)
    val names = Seq("q01", "q02")
    assert(Bench.packChunks(names, 8, Map("q01" -> 1.0)) == Seq(names))
  }

  test("cpuPressure returns cumulative, monotone-or-unreadable counters") {
    val (s0, n0, u0) = Bench.cpuPressure()
    val (s1, n1, u1) = Bench.cpuPressure()
    // each field is either unreadable (-1 on both samples) or a
    // cumulative counter that never decreases between samples
    assert((s0 == -1L && s1 == -1L) || (s0 >= 0 && s1 >= s0))
    assert((n0 == -1L && n1 == -1L) || (n0 >= 0 && n1 >= n0))
    assert((u0 == -1L && u1 == -1L) || (u0 >= 0 && u1 >= u0))
    // this container exposes /proc/stat — steal must be readable here
    assert(s0 >= 0, "steal jiffies unreadable on this box")
  }

  test("historyCosts reads LAST full-suite line, tolerant of junk") {
    val tmp = java.nio.file.Files.createTempFile("bench-hist", ".jsonl")
    val lines = Seq(
      """{"metric":"total","value":3.0,"queries":{"q01":1.0,"q02":2.0},"sf":"x"}""",
      """not json at all""",
      """{"metric":"total","value":9.9,"queries":{"q01":4.5,"q03":5.4},"sf":"x"}"""
    )
    java.nio.file.Files.write(tmp, lines.mkString("\n").getBytes("UTF-8"))
    val costs = Bench.historyCosts(tmp)
    assert(costs == Map("q01" -> 4.5, "q03" -> 5.4))
    // absent file -> empty map, no throw
    assert(Bench.historyCosts(java.nio.file.Paths.get("/nonexistent/x.jsonl")).isEmpty)
  }
}
