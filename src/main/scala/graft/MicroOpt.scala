package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{Hashing, TextFns}
import graft.operators.{Dedup, Graphs, Similarity}

/** Round-12 optimization stage probe (dev tool; not part of the driver
  * contract — the [[Micro]] precedent). Times the sub-stages of the
  * heaviest isolated queries (q156/q217, q317, q252, q219, q304, q363) so
  * the optimization work targets the measured cost, not a guess
  * (optimization guide §1).
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  *   sbt "runMain graft.MicroOpt"
  */
object MicroOpt {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(master = s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = GraftSession.table(spark, sfDir, "documents")
    val emb = GraftSession.table(spark, sfDir, "embeddings")

    def noop(df: DataFrame): Long = {
      df.write.format("noop").mode("overwrite").save(); 0L
    }
    def time(name: String)(body: => Long): Unit = {
      spark.sparkContext.setJobDescription(name)
      val t0 = System.nanoTime()
      val n = body
      println(f"[microopt] $name%-44s ${(System.nanoTime() - t0) / 1e9}%7.2fs  (n=$n)")
      spark.sparkContext.setJobDescription(null)
    }

    time("warmup: docs+emb scan")(docs.count() + emb.count())

    // ---- q156_jw_linkage decomposition --------------------------------
    {
      val sh0 = Dedup.shingleSets(docs, "doc_id", "text", 3)
      time("q156: shingleSets (explode+md5)")(sh0.count())
      val sh = graft.CacheScope.register(sh0)
      time("q156: postings cache materialize")(sh.count())
      val sizes = sh.groupBy("id").agg(count(lit(1)).as("sz"))
      val dfs = sh.groupBy("sh").agg(count(lit(1)).as("__df"))
      time("q156: dfs groupBy(sh)")(dfs.count())
      val prefix0 = sh.join(dfs, "sh").join(sizes, "id")
        .withColumn("__rnk", row_number().over(
          Window.partitionBy("id").orderBy(col("__df"), col("sh"))))
        .filter(col("__rnk") <= col("sz") - ceil(lit(0.5) * col("sz")) + 1)
        .select("id", "sh")
      time("q156: prefix relation (joins+window)")(prefix0.count())
      val prefix = graft.CacheScope.register(prefix0)
      time("q156: prefix cache materialize")(prefix.count())
      val cands = prefix.as("a").join(prefix.as("b"),
          col("a.sh") === col("b.sh") && col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
        .distinct()
      time("q156: candidate self-join+distinct")(cands.count())
      val candsC = graft.CacheScope.register(cands)
      time("q156: cands cache materialize")(candsC.count())
      // confirm via postings join (current form)
      val aSh = sh.select(col("id").as("id_a"), col("sh").as("__sh"))
      val bSh = sh.select(col("id").as("id_b"), col("sh").as("__sh"))
      val inter = candsC.join(aSh, "id_a").join(bSh, Seq("id_b", "__sh"))
        .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))
      val conf = inter
        .join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "size_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "size_b"), "id_b")
        .withColumn("jaccard",
          col("inter").cast("double") / (col("size_a") + col("size_b") - col("inter")))
        .filter(col("jaccard") >= 0.5)
      time("q156: confirm (postings join form)")(conf.count())
      // JW scoring over confirmed pairs
      val txt = docs.select(col("doc_id").as("__tid"),
        TextFns.normalized(col("text")).as("__t"))
      val jw = conf
        .join(txt.select(col("__tid").as("id_a"), col("__t").as("__ta")), "id_a")
        .join(txt.select(col("__tid").as("id_b"), col("__t").as("__tb")), "id_b")
        .withColumn("jw", call_function("jaro_winkler", col("__ta"), col("__tb")))
        .filter(col("jw") >= 0.9)
      time("q156: jw fetch+score")(jw.count())
      time("q156: end-to-end (operator)")(
        noop(Dedup.jaroWinklerLinkage(docs, "doc_id", "text", 3, 0.5, 0.9)
          .orderBy("id_a", "id_b")))
      graft.CacheScope.releaseAll()
      spark.catalog.clearCache()
    }

    // ---- q317_ivf_recall_curve decomposition --------------------------
    {
      val t0 = System.nanoTime()
      val cents = Similarity.ivfTrainDistributed(emb, "vec_id", "embedding",
        16, 5)
      println(f"[microopt] q317: ivfTrainDistributed(5 rounds)        ${(System.nanoTime() - t0) / 1e9}%7.2fs  (k=${cents.length})")
      val queries = emb.filter(col("vec_id") < 10)
      time("q317: knnExactAgg")(
        Similarity.knnExactAgg(emb, queries, "vec_id", "embedding", 5).count())
      for (np <- Seq(1, 16)) {
        time(s"q317: knnIvfWithCentroids(np=$np)")(
          Similarity.knnIvfWithCentroids(emb, queries, "vec_id", "embedding",
            5, np, cents).count())
      }
      time("q317: end-to-end (operator)")(
        noop(Similarity.ivfRecallCurve(emb, queries, "vec_id", "embedding",
          5, 16, Seq(1, 2, 4, 8, 16))))
      graft.CacheScope.releaseAll()
      spark.catalog.clearCache()
    }

    // ---- q219 / prefix-vs-direct at t=0.5 ------------------------------
    {
      time("q219: ngramJaccardPairs prefix t=0.5")(
        Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5,
          prefixFilter = true).count())
      graft.CacheScope.releaseAll(); spark.catalog.clearCache()
      time("q219: ngramJaccardPairs DIRECT t=0.5")(
        Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5,
          prefixFilter = false).count())
      graft.CacheScope.releaseAll(); spark.catalog.clearCache()
    }

    // ---- lshPairs (minhash) signature-stage forms ----------------------
    {
      val arr = Dedup.shingleArrays(docs, "doc_id", "text", 3).cache()
      time("lsh: shingleArrays materialize")(arr.count())
      val allSigs = xxhash64((0 until 64).map(i => col(s"s$i")): _*)
      time("lsh: sigsArr 64 fams (transform, current)")(
        Dedup.minhashSignaturesArr(arr, 64).agg(max(allSigs)).count())
      time("lsh: sigsArr 64 fams (2nd run, warm)")(
        Dedup.minhashSignaturesArr(arr, 64).agg(max(allSigs)).count())
      arr.unpersist()
      time("lsh: minhashNearDups end-to-end")(
        Dedup.minhashNearDups(docs, "doc_id", "text", 3, 64, 16, 0.8).count())
      graft.CacheScope.releaseAll(); spark.catalog.clearCache()
      time("q64: end-to-end CC over text+emb pairs") {
        val textPairs = graft.CacheScope.register(
          Dedup.minhashNearDups(docs, "doc_id", "text", 3, 64, 16, 0.8))
          .select("id_a", "id_b")
        val embPairs = Similarity.nearDupLshBanded(emb, "vec_id", "embedding",
            0.45, 6, 16, 64).select("id_a", "id_b")
        noop(Graphs.connectedComponents(textPairs.unionByName(embPairs),
          "id_a", "id_b"))
      }
      graft.CacheScope.releaseAll(); spark.catalog.clearCache()
      time("q64 leg: nearDupLshBanded(emb) alone")(
        Similarity.nearDupLshBanded(emb, "vec_id", "embedding",
          0.45, 6, 16, 64).count())
      graft.CacheScope.releaseAll(); spark.catalog.clearCache()
    }

    // ---- q252 band planner ---------------------------------------------
    time("q252: bandPlannerEmpirical end-to-end")(
      noop(Dedup.bandPlannerEmpirical(docs, "doc_id", "text", 3, 16, 0.8)))
    graft.CacheScope.releaseAll(); spark.catalog.clearCache()

    // ---- q363 hidden partitioning --------------------------------------
    {
      val ev = GraftSession.table(spark, sfDir, "events")
        .filter(col("ts").isNotNull)
        .select("event_id", "user_id", "ts")
      val tbl = s"${sys.props("java.io.tmpdir")}/graft_microopt_hidden/events"
      graft.operators.Warehouse.resetTable(tbl)
      val t0 = System.nanoTime()
      val g1 = graft.operators.Warehouse.publishHiddenPartitioned(spark, ev,
        tbl, graft.operators.Warehouse.TimeTransform("ts", "day"))
      println(f"[microopt] q363: publish day(ts)                      ${(System.nanoTime() - t0) / 1e9}%7.2fs")
      val t1 = System.nanoTime()
      val g2 = graft.operators.Warehouse.publishHiddenPartitioned(spark, ev,
        tbl, graft.operators.Warehouse.TimeTransform("ts", "hour"))
      println(f"[microopt] q363: publish hour(ts)                     ${(System.nanoTime() - t1) / 1e9}%7.2fs")
      val (lo, hi) = ("2024-01-10 06:00:00", "2024-01-12 18:00:00")
      time("q363: prune+read day gen") {
        graft.operators.Warehouse.hiddenRangePrune(tbl, g1, lo, hi)
        graft.operators.Warehouse.hiddenRangeRead(spark, tbl, lo, hi, Some(g1))
          .agg(count(lit(1))).count()
      }
      time("q363: prune+read hour gen") {
        graft.operators.Warehouse.hiddenRangePrune(tbl, g2, lo, hi)
        graft.operators.Warehouse.hiddenRangeRead(spark, tbl, lo, hi, Some(g2))
          .agg(count(lit(1))).count()
      }
    }

    spark.stop()
  }
}
