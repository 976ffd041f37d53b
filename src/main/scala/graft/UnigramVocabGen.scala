package graft

import org.apache.spark.sql.functions._

import graft.functions.UnigramTrainer

/** Dev tool: (re)learn the shipped unigram-LM piece table from the
  * sf0.001 documents corpus and write it to the source-tree resource the
  * engine loads (`src/main/resources/graft/unigram_pieces.tsv`).
  * Deterministic — re-running over the same corpus reproduces the file
  * byte-for-byte (integer Viterbi-EM; see [[graft.functions.UnigramTrainer]]).
  * Usage: sbt "runMain graft.UnigramVocabGen [targetVocab] [sfDir] [outPath]"
  */
object UnigramVocabGen {
  /** The corpus word relation both trainers and q361 share: lowercase
    * [a-z]+ runs, length-capped at 24 (the DP/oracle recursion bound).
    */
  def wordCounts(spark: org.apache.spark.sql.SparkSession,
      sfDir: String): org.apache.spark.sql.DataFrame =
    GraftSession.table(spark, sfDir, "documents")
      .select(explode(expr("regexp_extract_all(lower(text), '[a-z]+', 0)"))
        .as("w"))
      .filter(length(col("w")).between(1, 24))
      .groupBy("w").agg(count(lit(1)).as("n"))

  def main(args: Array[String]): Unit = {
    val targetVocab = args.headOption.map(_.toInt).getOrElse(400)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.001")
    val out = args.lift(2).getOrElse("src/main/resources/graft/unigram_pieces.tsv")
    val spark = GraftSession.builder(master = "local[8]").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val pieces = UnigramTrainer.learnDistributed(
      wordCounts(spark, sfDir), "w", "n", targetVocab)
    val outPath = java.nio.file.Paths.get(out)
    java.nio.file.Files.createDirectories(outPath.getParent)
    UnigramTrainer.save(pieces, outPath)
    println(s"[unigram] learned ${pieces.size} pieces -> $out")
    spark.stop()
  }
}
