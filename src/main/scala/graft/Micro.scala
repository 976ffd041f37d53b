package graft

import org.apache.spark.sql.functions._

import graft.functions.{Hashing, TextFns}
import graft.operators.Dedup

/** Micro-benchmark main for hot-path stages (dev tool; not part of the
  * driver contract). Times each stage in isolation against
  * SPARK_GRAFT_SF_DIR so optimization work targets the real cost, not a
  * guess. Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.Micro"
  */
object Micro {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(master = s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = GraftSession.table(spark, sfDir, "documents")

    def time(name: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"[micro] $name%-34s ${(System.nanoTime() - t0) / 1e9}%7.2fs  (n=$n)")
    }

    // warm up scan + codegen
    time("warmup: docs scan")(docs.count())
    time("spark.range job overhead")(spark.range(1000000).count())
    time("docs.count again (warm)")(docs.count())
    time("docs id-only projection")(docs.select("doc_id").count())
    time("docs text materialize") {
      docs.select(length(col("text"))).agg(sum("length(text)")).count()
    }
    time("size(tokens) no explode") {
      docs.select(size(TextFns.tokens(col("text"))).as("n")).agg(sum("n")).count()
    }
    time("explode(split) no lower/trim") {
      docs.select(explode(split(col("text"), "\\s+"))).count()
    }
    time("tokens explode only") {
      docs.select(explode(TextFns.tokens(col("text")))).count()
    }
    time("tokens explode repartition(32)") {
      docs.repartition(32).select(explode(TextFns.tokens(col("text")))).count()
    }
    time("shingles explode only") {
      docs.select(explode(array_distinct(TextFns.shingles(col("text"), 3)))).count()
    }
    time("shingleSets (explode+md5 h60)") {
      Dedup.shingleSets(docs, "doc_id", "text", 3).count()
    }
    time("shingle explode + xxhash64") {
      docs.select(col("doc_id"),
        explode(array_distinct(TextFns.shingles(col("text"), 3))).as("__s"))
        .select(col("doc_id"), Hashing.hFast(col("__s"), 0)).count()
    }
    time("postings groupBy sh (df count)") {
      Dedup.shingleSets(docs, "doc_id", "text", 3)
        .groupBy("sh").count().count()
    }
    time("minhash sigs (64 fams) from postings") {
      Dedup.minhashSignatures(
        Dedup.shingleSets(docs, "doc_id", "text", 3), 64).count()
    }
    time("q20 direct pair join end-to-end") {
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5,
        maxShingleDf = 1000).count()
    }
    graft.CacheScope.releaseAll()
    time("q21 minhash end-to-end") {
      Dedup.minhashNearDups(docs, "doc_id", "text", 3, 64, 16, 0.8).count()
    }
    graft.CacheScope.releaseAll()
    // array-path stage breakdown (transform lambdas are interpreted, not
    // codegen'd — these isolate whether that costs more than the explode
    // form's extra shuffle)
    time("shingleArrays (transform h60)") {
      Dedup.shingleArrays(docs, "doc_id", "text", 3).count()
    }
    val arrCached = Dedup.shingleArrays(docs, "doc_id", "text", 3).cache()
    time("shingleArrays cache materialize")(arrCached.count())
    // reference ALL 64 signature columns: an s0-only aggregate lets
    // ColumnPruning drop the other 63 projections/aggregates, and the
    // timing would measure 1/64th of the hashing it claims to isolate.
    // Forced through xxhash64 + max, NOT a 64-way long addition — the
    // signatures span the full 64-bit range (array_min over xxhash64),
    // so `s0+…+s63` overflows with near-certainty and ANSI mode (Spark 4
    // default) turns that into ARITHMETIC_OVERFLOW mid-probe
    val allSigs = xxhash64((0 until 64).map(i => col(s"s$i")): _*)
    time("sigsArr (64 fams) from cached arr") {
      Dedup.minhashSignaturesArr(arrCached, 64)
        .agg(max(allSigs)).count()
    }
    val shCached = Dedup.shingleSets(docs, "doc_id", "text", 3).cache()
    time("postings cache materialize")(shCached.count())
    time("sigs (64 fams) from cached postings") {
      Dedup.minhashSignatures(shCached, 64).agg(max(allSigs)).count()
    }
    arrCached.unpersist(); shCached.unpersist()
    time("q21 minhash end-to-end (2nd run)") {
      Dedup.minhashNearDups(docs, "doc_id", "text", 3, 64, 16, 0.8).count()
    }
    graft.CacheScope.releaseAll()
    // scale linearity probe: a 10x corpus through the full MinHash
    // pipeline. Disjoint id ranges only prevent doc_id collisions — the
    // cloned TEXTS are identical, so every original near-dup pair
    // replicates ~100x (10x10 copy combinations) plus C(10,2) = 45
    // identical-copy pairs per doc: the TRUE pair count grows ~1000x
    // (measured 250,600 vs 256). That's the point: wall time should
    // track the 10x corpus (bucket-bounded candidates), NOT the 1000x
    // pair density — super-linear growth here means a stage degenerated
    // to pair enumeration
    val docs10 = (0 until 10).map { r =>
      docs.select((col("doc_id") + lit(r * 1000000L)).as("doc_id"), col("text"))
    }.reduce(_ unionByName _)
    time("minhash end-to-end on 10x corpus") {
      Dedup.minhashNearDups(docs10, "doc_id", "text", 3, 64, 16, 0.8).count()
    }
    graft.CacheScope.releaseAll()
    // containment probe: the direct inverted-index join costs Σ df² — on
    // the 10x clone corpus every shingle's df is 10x, so UNCAPPED cost
    // would be ~100x; the df cap is what keeps the op linear-ish at scale
    time("containment direct (1x)") {
      Dedup.containmentPairs(docs, "doc_id", "text", 3, 0.8).count()
    }
    graft.CacheScope.releaseAll()
    time("containment capped df=100 (10x corpus)") {
      Dedup.containmentPairs(docs10, "doc_id", "text", 3, 0.8,
        maxShingleDf = 100).count()
    }
    graft.CacheScope.releaseAll()
    // PQ stage breakdown (q90): where do the seconds go — the codebook
    // training collects (run eagerly at DataFrame CONSTRUCTION), the
    // driver-side plan work over ~256 codebook-literal argmin expressions
    // (analyze+optimize+codegen, paid per plan), or the encode scan
    // itself? At 100 TB only the scan grows; construction+plan are fixed.
    val emb = GraftSession.table(spark, sfDir, "embeddings")
    var pqDf: org.apache.spark.sql.DataFrame = null
    time("pq q90: construct (training jobs)") {
      pqDf = graft.operators.Similarity.pqEncode(emb, "vec_id", "embedding",
        8, 32, 64)
      1L
    }
    time("pq q90: plan (analyze+opt+codegen)") {
      pqDf.queryExecution.executedPlan
      1L
    }
    time("pq q90: execute encode scan")(pqDf.count())
    graft.CacheScope.releaseAll()
    time("pq q90: repeat end-to-end (warm)") {
      graft.operators.Similarity.pqEncode(emb, "vec_id", "embedding",
        8, 32, 64).count()
    }
    graft.CacheScope.releaseAll()
    spark.stop()
  }
}
