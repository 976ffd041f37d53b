package graft

/** Dump `.explain("formatted")` for the named queries to files (dev tool
  * for the optimization-round plan evidence: plans/r12/<q>_{before,after}.txt).
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  *   sbt "runMain graft.PlanDump <outDir> <suffix> <q1,q2,...>"
  *
  * Note: building some queries runs bounded driver jobs (trainers,
  * seed collects) — that is part of their plan-construction contract.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: PlanDump <outDir> <suffix> <q1,q2,...>")
    val Array(outDir, suffix, list) = args
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.getOrCreate()
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    list.split(",").map(_.trim).filter(_.nonEmpty).foreach { name =>
      val fn = SparkEntry.queries(name)
      try {
        val df = fn(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"), txt)
        println(s"[plandump] wrote ${name}_$suffix.txt")
      } catch {
        case e: Exception =>
          println(s"[plandump] $name FAILED: ${e.getMessage}")
      } finally graft.CacheScope.releaseAll()
    }
    spark.stop()
  }
}
