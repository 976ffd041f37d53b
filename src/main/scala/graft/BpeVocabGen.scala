package graft

import org.apache.spark.sql.functions.col

import graft.functions.BpeTrainer

/** Dev tool: (re)learn the shipped BPE merge table from the sf0.001
  * documents corpus and write it to the source-tree resource the engine
  * loads (`src/main/resources/graft/bpe_merges.tsv`). Deterministic —
  * re-running over the same corpus reproduces the file byte-for-byte.
  * Usage: sbt "runMain graft.BpeVocabGen [numMerges] [sfDir] [outPath]"
  */
object BpeVocabGen {
  def main(args: Array[String]): Unit = {
    val numMerges = args.headOption.map(_.toInt).getOrElse(64)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.001")
    val out = args.lift(2).getOrElse("src/main/resources/graft/bpe_merges.tsv")
    val spark = GraftSession.builder(master = "local[8]").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val corpus = GraftSession.table(spark, sfDir, "documents").select(col("text"))
    // distributed trainer: the corpus never leaves the cluster (only pair
    // statistics do); spec-pinned equal to BpeTrainer.learn
    val merges = BpeTrainer.learnDistributed(corpus, "text", numMerges)
    val outPath = java.nio.file.Paths.get(out)
    java.nio.file.Files.createDirectories(outPath.getParent)
    BpeTrainer.save(merges, outPath)
    println(s"[bpe] learned ${merges.size} merges -> $out")
    spark.stop()
  }
}
