package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scale-linearity probe for the distributed graph family (round-7
  * verdict #5): connectedComponents / pageRank / hits forced down their
  * DISTRIBUTED paths (driver fast paths disabled / out of range) on
  * synthetic graphs ABOVE the 2^18-edge driver threshold, at 1x and 10x
  * edges. The O(E)-per-round claim predicts: wall time ~10x (same round
  * count, 10x per-round shuffle volume) and an IDENTICAL Spark job count
  * at both scales (rounds are data-size-independent; jobs measure
  * rounds). Super-linear wall or a growing job count means a round
  * degenerated (lineage growth, a driver collect, a pair explosion).
  *
  * Deterministic pseudo-random graph: edge i connects
  * (xxhash64(i) mod n, xxhash64(i') mod n) — no RNG, reproducible across
  * runs/boxes. Results go to stdout; record them in BENCH_NOTES.md.
  *
  * Usage: SPARK_GRAFT_CPUS=8 sbt "runMain graft.MicroGraph"
  */
object MicroGraph {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = GraftSession.builder(master = s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    @volatile var jobs = 0
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = jobs += 1
    })

    // SPARK_GRAFT_MICROGRAPH_ONLY: comma-separated name substrings to
    // re-probe a single operator without paying the whole sweep
    val only = sys.env.get("SPARK_GRAFT_MICROGRAPH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    def enabled(name: String): Boolean =
      only.forall(_.exists(name.contains))

    def time(name: String)(body: => Long): Unit = if (enabled(name)) {
      // listener events are async: give the bus a beat to settle between
      // phases so job counts attribute to the right phase
      Thread.sleep(400)
      val j0 = jobs
      val t0 = System.nanoTime()
      val n = body
      val secs = (System.nanoTime() - t0) / 1e9
      Thread.sleep(400)
      println(f"[micrograph] $name%-44s $secs%7.2fs  jobs=${jobs - j0}%3d  (n=$n)")
    }

    /** nEdges pseudo-random edges over nEdges/8 nodes (avg degree ~16
      * after symmetrization) — same generator at every scale. */
    def randomEdges(nEdges: Long): DataFrame = {
      val nNodes = math.max(nEdges / 8, 2L)
      spark.range(nEdges).select(
        pmod(xxhash64(col("id")), lit(nNodes)).as("a"),
        pmod(xxhash64(col("id") * 2 + 1), lit(nNodes)).as("b"))
    }

    for (scale <- Seq(1L, 10L)) {
      val nEdges = 400000L * scale // 1x already > 2^18 = 262,144
      val e = CacheScope.register(randomEdges(nEdges))
      time(s"materialize edges ${scale}x ($nEdges)")(e.count())

      time(s"connectedComponents distributed ${scale}x") {
        operators.Graphs.connectedComponents(e, "a", "b",
          maxIter = 25, driverThreshold = 0L).count()
      }
      CacheScope.releaseAll()

      val e2 = CacheScope.register(randomEdges(nEdges))
      e2.count()
      val nodes = CacheScope.register(
        e2.select(col("a").as("id")).union(e2.select(col("b"))).distinct())
      time(s"pageRank 3 iters ${scale}x") {
        operators.Graphs.pageRank(nodes, "id", e2, "a", "b", iters = 3).count()
      }
      CacheScope.releaseAll()

      val e3 = CacheScope.register(randomEdges(nEdges))
      e3.count()
      time(s"hits 2 iters ${scale}x") {
        operators.Graphs.hits(e3, "a", "b", iters = 2).count()
      }
      CacheScope.releaseAll()

      val e4 = CacheScope.register(randomEdges(nEdges))
      e4.count()
      time(s"markovStationary distributed ${scale}x") {
        operators.Graphs.markovStationary(
          e4.withColumn("n", lit(1L)), "a", "b", "n", iters = 3,
          driverEdgeThreshold = 0L).count()
      }
      CacheScope.releaseAll()

      // Wedge-join family (Σdeg² per pass): constant avg degree at both
      // scales, so wedge volume — and wall — should scale ~linearly with
      // E, and job counts stay flat.
      val e5 = CacheScope.register(randomEdges(nEdges))
      e5.count()
      time(s"localClustering ${scale}x") {
        operators.Graphs.localClustering(e5, "a", "b").count()
      }
      CacheScope.releaseAll()

      val e6 = CacheScope.register(randomEdges(nEdges))
      e6.count()
      time(s"resourceAllocation top-50 ${scale}x") {
        operators.Graphs.resourceAllocation(e6, "a", "b", 50).count()
      }
      CacheScope.releaseAll()

      val e7 = CacheScope.register(randomEdges(nEdges))
      e7.count()
      time(s"kTruss k=3 distributed ${scale}x") {
        operators.Graphs.kTruss(e7, "a", "b", k = 3, maxRounds = 8,
          driverEdgeThreshold = 0L).count()
      }
      CacheScope.releaseAll()

      val e8 = CacheScope.register(randomEdges(nEdges))
      e8.count()
      time(s"adamicAdar top-50 ${scale}x") {
        operators.Graphs.adamicAdar(e8, "a", "b", 50).count()
      }
      CacheScope.releaseAll()

      // Degree-capped wedge pass (r9 verdict #3) on a SKEWED graph —
      // the uniform generator's max degree is ~46 at both scales (Σdeg²
      // scales exactly 10.0x, so a cap never binds there); the knob's
      // target is the widening hub tail. Quadratic inverse-CDF endpoint:
      // hub degree ~ E/√n grows with scale at constant avg degree, so
      // UNCAPPED wedge volume grows superlinearly in E while cap=64
      // bounds it at E·cap — the wall ratios demonstrate the contract.
      def skewedEdges(nE: Long): DataFrame = {
        val nNodes = math.max(nE / 8, 2L)
        spark.range(nE).select(
          pmod(xxhash64(col("id")), lit(nNodes)).as("a"),
          (pow(pmod(xxhash64(col("id") * 2 + 1), lit(1000000L))
              .cast("double") / lit(1e6), 2.0) * lit(nNodes.toDouble))
            .cast("long").as("b"))
      }
      val e8c = CacheScope.register(skewedEdges(nEdges))
      time(s"materialize skewed edges ${scale}x")(e8c.count())
      time(s"adamicAdar top-50 SKEWED uncapped ${scale}x") {
        operators.Graphs.adamicAdar(e8c, "a", "b", 50).count()
      }
      time(s"adamicAdar top-50 SKEWED cap=64 ${scale}x") {
        operators.Graphs.adamicAdar(e8c, "a", "b", 50, degreeCap = 64).count()
      }
      CacheScope.releaseAll()

      val e9 = CacheScope.register(randomEdges(nEdges))
      e9.count()
      time(s"assortativity ${scale}x") {
        operators.Graphs.assortativity(e9, "a", "b").count()
      }
      CacheScope.releaseAll()

      // Link-prediction suite shares adamicAdar's wedge-join shape:
      // Σ deg² candidate pairs, two degree joins, top-k — wall ~Σ deg².
      val e9b = CacheScope.register(randomEdges(nEdges))
      e9b.count()
      time(s"linkPredictionSuite top-50 ${scale}x") {
        operators.Graphs.linkPredictionSuite(e9b, "a", "b", 50).count()
      }
      CacheScope.releaseAll()


      // Bounded-horizon SSSP: one equi-join + min-aggregate per round,
      // rounds constant ⇒ wall ~E, jobs flat (localCheckpoint per round
      // adds a fixed job count independent of E).
      val e10 = CacheScope.register(
        randomEdges(nEdges).withColumn("w", pmod(xxhash64(col("a"),
          col("b")), lit(1000L)) + 1))
      e10.count()
      time(s"ssspBounded 4 rounds ${scale}x") {
        operators.Graphs.ssspBounded(e10, "a", "b", "w", rounds = 4).count()
      }
      CacheScope.releaseAll()
    }
    spark.stop()
  }
}
