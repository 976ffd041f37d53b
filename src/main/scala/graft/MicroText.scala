package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scale-linearity probe for the dedup/text family (round-10 verdict
  * #4 — the text-side MicroGraph): minhashNearDups / ngramJaccardPairs
  * (prefix-filtered) / substringDedup / sparseCosinePairs on a synthetic
  * corpus at 1x and 10x documents, with wall + Spark job counts, so the
  * documented cost bounds (Σdf, Σdf², band-bucket collisions) are
  * MEASURED every round instead of asserted.
  *
  * Deterministic corpus with controlled near-dup structure: docs come in
  * groups of 10; token 0 is per-doc unique ("u<id>"), tokens 1..29 are
  * the GROUP's tokens ("w" + base36(xxhash64(group*37+k)) — effectively
  * unique per (group, k), so every shared token has df = 10 at EVERY
  * scale). The predicted costs are therefore exactly linear in nDocs:
  *   - token df² work: (nDocs/10 · 29) distinct tokens × df² = 100
  *     → 290·nDocs collision pairs (sparseCosinePairs, substring grams);
  *   - near-dup pairs: C(10,2) · nDocs/10 = 4.5·nDocs confirmed pairs;
  *   - char-3-gram df GROWS with the corpus (base36 alphabet is finite),
  *     which is exactly why ngramJaccardPairs is probed through its
  *     LOSSLESS prefix filter (rare-first prefixes keep candidate volume
  *     bounded) — the unfiltered direct count is the documented
  *     anti-pattern at scale and is NOT probed.
  * Job counts should be scale-invariant (stage structure is data-size
  * independent); wall should grow ≤ ~linearly (fixed plan/JVM overhead
  * makes small-scale ratios land well under 10x).
  *
  * Results go to stdout; record them in BENCH_NOTES.md.
  * Usage: SPARK_GRAFT_CPUS=8 sbt "runMain graft.MicroText"
  */
object MicroText {
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

    val only = sys.env.get("SPARK_GRAFT_MICROTEXT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    def enabled(name: String): Boolean =
      only.forall(_.exists(name.contains))

    def time(name: String)(body: => Long): Unit = if (enabled(name)) {
      Thread.sleep(400) // let listener events settle between phases
      val j0 = jobs
      val t0 = System.nanoTime()
      val n = body
      val secs = (System.nanoTime() - t0) / 1e9
      Thread.sleep(400)
      println(f"[microtext] $name%-44s $secs%7.2fs  jobs=${jobs - j0}%3d  (n=$n)")
    }

    /** nDocs synthetic docs in groups of 10: 1 unique + 29 group tokens. */
    def corpus(nDocs: Long): DataFrame =
      spark.range(nDocs).select(col("id").as("doc_id"),
        concat(
          concat(lit("u"), col("id")),
          lit(" "),
          concat_ws(" ", transform(sequence(lit(1), lit(29)), k =>
            concat(lit("w"), conv(pmod(
              xxhash64((col("id") / 10).cast("long") * 37 + k.cast("long")),
              lit(100000000000L)).cast("string"), 10, 36)))))
          .as("text"))

    for (scale <- Seq(1L, 10L)) {
      val nDocs = 20000L * scale
      val c = CacheScope.register(corpus(nDocs))
      time(s"materialize corpus ${scale}x ($nDocs docs)")(c.count())

      time(s"minhashNearDups 64x16 jac>=0.8 ${scale}x") {
        operators.Dedup.minhashNearDups(c, "doc_id", "text",
          3, 64, 16, 0.8).count()
      }
      CacheScope.releaseAll()

      val c2 = CacheScope.register(corpus(nDocs)); c2.count()
      time(s"ngramJaccardPairs prefix t=0.8 ${scale}x") {
        operators.Dedup.ngramJaccardPairs(c2, "doc_id", "text",
          3, 0.8, prefixFilter = true).count()
      }
      CacheScope.releaseAll()

      val c3 = CacheScope.register(corpus(nDocs)); c3.count()
      time(s"substringDedup 8-gram df>1 ${scale}x") {
        // force the text REBUILD: a bare count() lets Catalyst prune the
        // per-doc (pos, token) re-assembly, measuring only the id grid
        operators.TextOps.substringDedup(c3, "doc_id", "text", 8,
            maxDocFreq = 1)
          .agg(sum(length(col("cleaned_text")))).collect()
        c3.count()
      }
      CacheScope.releaseAll()

      val c4 = CacheScope.register(corpus(nDocs)); c4.count()
      time(s"sparseCosinePairs dfCap=200 cos>=0.8 ${scale}x") {
        operators.TextOps.sparseCosinePairs(c4, "doc_id", "text",
          dfCap = 200, 0.8).count()
      }
      CacheScope.releaseAll()
    }
    spark.stop()
  }
}
