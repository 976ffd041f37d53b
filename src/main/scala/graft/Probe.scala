package graft

/** Scratch diagnostics main (not part of the library surface). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate()
    val ev = GraftSession.table(spark, "/root/testdata/sf0.001", "events")
    ev.printSchema()
    ev.show(3, truncate = false)
    val docs = GraftSession.table(spark, "/root/testdata/sf0.001", "documents")
    docs.printSchema()
    val emb = GraftSession.table(spark, "/root/testdata/sf0.001", "embeddings")
    emb.printSchema()
    val li = GraftSession.table(spark, "/root/testdata/sf0.001", "lineitem")
    li.printSchema()
    li.select("l_shipdate").show(2)
    spark.stop()
  }
}
