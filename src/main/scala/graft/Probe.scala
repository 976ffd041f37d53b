package graft

/** Plan auditor (not part of the library surface): prints formatted plans
  * for the plan-shape-critical queries so broadcast choices, pushed
  * filters, and scan schemas can be inspected. Usage:
  * `sbt "runMain graft.Probe [sfDir] [query...]"`.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q02_day_slice", "q03_region_revenue", "q04_top_customers",
        "q21_minhash_lsh", "q30_sql_api", "q54_decontamination")
    val spark = GraftSession.getOrCreate()
    names.foreach { n =>
      println(s"\n########## $n ##########")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    // scale-claim spot checks on physical plans
    def plan(n: String): String = SparkEntry.queries(n)(spark, sfDir)
      .queryExecution.executedPlan.toString
    println("\n[probe] q54 benchmark side broadcast (corpus never shuffled " +
      "for the probe): " + plan("q54_decontamination").contains("BroadcastHashJoin"))
    println("[probe] q03 dims broadcast: " +
      (plan("q03_region_revenue").split("BroadcastHashJoin").length - 1 >= 3))
    println("[probe] q02 filter pushed to scan: " +
      plan("q02_day_slice").contains("PushedFilters: [IsNotNull(o_orderdate), GreaterThanOrEqual"))
    // q250: the stored LSH index must scan pre-bucketed with ZERO
    // exchanges on its branches — the only hash exchanges in the probe
    // plan are the NEW batch's shingle aggregate and the candidate
    // distinct (plus the presentation range sort)
    // count DISTINCT exchange nodes: a subtree shared by two consumers
    // (e.g. the probe batch's shingle aggregate feeding both the band
    // join and the size join) prints once per parent in toString, but
    // it is ONE exchange — dedupe on plan_id
    val p250 = plan("q250_persisted_lsh_index")
    val h250 = "Exchange hashpartitioning[^\\n]*plan_id=(\\d+)".r
      .findAllMatchIn(p250).map(_.group(1)).toSet.size
    println("[probe] q250 index side shuffle-free (2 distinct hash " +
      "exchanges, both on the probe batch): " + (h250 == 2) + s" (count=$h250)")
    if (h250 != 2) p250.linesIterator
      .filter(_.contains("Exchange hashpartitioning"))
      .foreach(l => println("[probe]   " + l.trim.take(160)))
    // operator-level shuffle claims (probed without the driver-contract
    // final sort, and ignoring the fan-out's round-robin repartition —
    // the only legitimate exchange in a "shuffle-free" projection op)
    def dataShuffles(df: org.apache.spark.sql.DataFrame): Int = {
      val p = df.queryExecution.executedPlan.toString
      (p.split("Exchange hashpartitioning").length - 1) +
        (p.split("Exchange rangepartitioning").length - 1)
    }
    val docs = GraftSession.table(spark, sfDir, "documents")
    println("[probe] chunkTokens shuffle-free (projection+explode): " +
      (dataShuffles(graft.operators.TextOps.chunkTokens(
        docs, "doc_id", "text", 64, 48)) == 0))
    println("[probe] mixtureSample is a pure filter (no shuffle): " +
      (dataShuffles(graft.operators.Sampling.mixtureSample(docs, "doc_id",
        "source", Seq("src0" -> 1.0), 0.1, "mix1")) == 0))
    val embs = GraftSession.table(spark, sfDir, "embeddings")
    println("[probe] pqEncode corpus scan map-only (codebook as literals): " +
      (dataShuffles(graft.operators.Similarity.pqEncode(
        embs, "vec_id", "embedding", 8, 32, 64)) == 0))
    println("[probe] int8Quantize is a pure projection (no shuffle): " +
      (dataShuffles(graft.operators.Similarity.int8Quantize(
        embs, "vec_id", "embedding")) == 0))
    // skew utilities over real tables: salted orders-per-customer rollup
    // must equal the plain aggregate
    import org.apache.spark.sql.functions._
    val orders = GraftSession.table(spark, sfDir, "orders")
    val plain = orders.groupBy("o_custkey")
      .agg(count(lit(1)).as("n"), sum(col("o_totalprice")).as("rev"))
    val salted = graft.operators.Skew.saltedAggregate(orders, "o_custkey", 8,
      Map("rev" -> col("o_totalprice")))
    val diff = plain.as("p").join(salted.as("s"), col("p.o_custkey") === col("s.o_custkey"))
      .filter(col("p.n") =!= col("s.n") ||
        abs(col("p.rev") - col("s.rev")) > lit(1e-6)).count()
    println(s"\n[probe] saltedAggregate vs plain: mismatched keys = $diff " +
      s"(of ${plain.count()})")
    spark.stop()
  }
}
