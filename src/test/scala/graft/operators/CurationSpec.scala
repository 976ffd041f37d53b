package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CurationSpec extends SparkSpec {

  test("curate assigns the first-failing-stage reason per document") {
    import spark.implicits._
    val docs = Seq(
      (0L, "one two three four five six seven eight nine ten", "en"), // kept
      (1L, "too short", "en"),                                         // quality
      (2L, "one two three four five six seven eight nine ten", "zh"), // language
      (3L, "ONE two three four five six seven eight nine ten", "en"), // exact dup of 0 (prefix-norm)
      (4L, "one two three four five six seven eight nine zzz", "en"), // near dup of 0
      (5L, "short and zh", "zh")                                       // quality wins over language
    ).toDF("doc_id", "text", "lang")
    val out = Curation.curate(docs, "doc_id", "text", "lang",
        minTokens = 5, allowedLangs = Seq("de", "en", "es", "fr"),
        fingerprintPrefix = 80, nearDupJac = 0.5)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(0L -> "kept", 1L -> "quality", 2L -> "language",
      3L -> "exact_dup", 4L -> "near_dup", 5L -> "quality"))
    val keptRows = Curation.kept(docs,
      Curation.curate(docs, "doc_id", "text", "lang", 5,
        Seq("de", "en", "es", "fr"), 80, 0.5), "doc_id")
    assert(keptRows.select("doc_id").collect().map(_.getLong(0)).toSeq == Seq(0L))
  }

  test("electSurvivors keeps the highest-scored member per cluster, ties to min id") {
    import spark.implicits._
    val clusters = Seq((10L, 10L), (11L, 10L), (12L, 10L), (20L, 20L), (21L, 20L))
      .toDF("id", "component")
    val scored = Seq((10L, 1.0), (11L, 3.0), (12L, 2.0), (20L, 5.0), (21L, 5.0))
      .toDF("doc_id", "score")
    val out = Curation.electSurvivors(clusters, scored, "doc_id", "score")
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(out == Map(10L -> false, 11L -> true, 12L -> false,
      20L -> true, 21L -> false))
  }

  test("clusterAwareSplit: near-dup clusters never straddle a split; " +
      "singletons split like plain hashSplit") {
    import spark.implicits._
    val shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = (
      // a 3-doc near-dup cluster (tiny tail edits keep jaccard >= 0.8)
      Seq((1L, shared), (2L, shared + " mu"), (3L, shared + " nu")) ++
      // singletons: unique vocabularies, no shared 3-grams
      (10L to 40L).map(i => (i, (0 until 12).map(j => s"u${i}w$j").mkString(" ")))
    ).toDF("doc_id", "text")
    val out = Curation.clusterAwareSplit(docs, "doc_id", "text",
        3, 64, 16, 0.8, "exp1",
        Seq("train" -> 0.90, "val" -> 0.05, "test" -> 0.05))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    // the cluster collapsed to component 1 and shares ONE split
    assert(Set(1L, 2L, 3L).map(out(_)._1) == Set(1L))
    assert(Set(1L, 2L, 3L).map(out(_)._2).size == 1,
      s"cluster straddles splits: ${Set(1L, 2L, 3L).map(out)}")
    // singletons are their own component and match hashSplit's assignment
    val single = Sampling.hashSplit(docs.filter($"doc_id" >= 10L), "doc_id",
        "exp1", Seq("train" -> 0.90, "val" -> 0.05, "test" -> 0.05))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    (10L to 40L).foreach { i =>
      assert(out(i)._1 == i, s"doc $i not its own component: ${out(i)}")
      assert(out(i)._2 == single(i),
        s"doc $i: cluster-aware ${out(i)._2} != hashSplit ${single(i)}")
    }
  }

  test("paretoFrontier2D matches the brute-force dominance definition, " +
      "keeps both members of an (x, y) tie, drops nulls, and is stable " +
      "across bucket widths and partitionings") {
    import spark.implicits._
    val rows: Seq[(Long, Option[Long], Option[Long])] = Seq(
      (1L, Some(10L), Some(100L)),  // dominated by 3 (both strictly)
      (2L, Some(10L), Some(300L)),  // frontier (nothing has x>=10,y>=300 both-strict)
      (3L, Some(50L), Some(200L)),  // frontier
      (4L, Some(50L), Some(200L)),  // exact tie with 3 — BOTH kept
      (5L, Some(50L), Some(150L)),  // same x as 3, lower y → dominated
      (6L, Some(300L), Some(50L)),  // frontier (max x)
      (7L, Some(299L), Some(50L)),  // dominated by 6 (x strict, y equal)
      (8L, None, Some(999L)),       // null x → dropped
      (9L, Some(999L), None)        // null y → dropped
    )
    val df = rows.toDF("id", "x", "y")
    def ids(width: Long, parts: Int) =
      Curation.paretoFrontier2D(df.repartition(parts), "x", "y", width)
        .select("id").collect().map(_.getLong(0)).toSet
    // brute force over the same definition
    val pts = rows.collect { case (id, Some(x), Some(y)) => (id, x, y) }
    val brute = pts.filterNot { case (_, x, y) =>
      pts.exists { case (_, ox, oy) =>
        ox >= x && oy >= y && (ox > x || oy > y) }
    }.map(_._1).toSet
    assert(brute == Set(2L, 3L, 4L, 6L))
    for (width <- Seq(1L, 7L, 64L, 1000L); parts <- Seq(1, 13)) {
      assert(ids(width, parts) == brute, s"width=$width parts=$parts")
    }
  }
}
