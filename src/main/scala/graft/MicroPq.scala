package graft

import org.apache.spark.sql.functions._

/** Focused PQ stage probe (dev tool): where does a WARM q90 rep spend its
  * time once the codebook is memoized? Mirrors the bench harness's rep
  * shape (fresh DataFrame per rep, CacheScope.releaseAll after) so the
  * numbers decompose the bench median, not an idealized path.
  */
object MicroPq {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(master = s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"[micropq] $name%-40s ${(System.nanoTime() - t0) / 1e9}%7.2fs  (n=$n)")
    }
    val emb = GraftSession.table(spark, sfDir, "embeddings")
    time("warmup: emb scan")(emb.count())
    // rep 1: pays codebook training (memoized afterwards)
    time("rep1 end-to-end (trains)") {
      graft.operators.Similarity.pqEncode(emb, "vec_id", "embedding", 8, 32, 64).count()
    }
    graft.CacheScope.releaseAll()
    // warm reps, decomposed
    (2 to 3).foreach { r =>
      var df: org.apache.spark.sql.DataFrame = null
      time(s"rep$r construct (memoized)") {
        df = graft.operators.Similarity.pqEncode(emb, "vec_id", "embedding", 8, 32, 64); 1L
      }
      time(s"rep$r plan (analyze+opt+codegen)") { df.queryExecution.executedPlan; 1L }
      time(s"rep$r encode scan (count)")(df.count())
      time(s"rep$r q90 shape (orderBy+noop write)") {
        df.withColumnRenamed("id", "vec_id").orderBy("vec_id", "subspace")
          .write.format("noop").mode("overwrite").save(); 1L
      }
      graft.CacheScope.releaseAll()
    }
    // is the cache materialize of the quantized base the cost?
    time("quantize+cache 32k vectors (fanOut)") {
      val q = graft.CacheScope.register(graft.Parallelism.fanOut(
        emb.select(col("vec_id").as("id"), col("embedding")))
        .select(col("id"), graft.operators.Similarity.quantized(col("embedding")).as("__qv")))
      q.count()
    }
    graft.CacheScope.releaseAll()
    spark.stop()
  }
}
