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
        "q21_minhash_lsh", "q30_sql_api")
    val spark = GraftSession.getOrCreate()
    names.foreach { n =>
      println(s"\n########## $n ##########")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
