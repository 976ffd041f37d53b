package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.functions.TextFns
import graft.schema.Observation

/** Edge cases the 100 TB path will hit constantly: empty partitions/tables,
  * null text, documents shorter than the shingle width, empty strings.
  */
class EdgeCaseSpec extends SparkSpec {

  private def emptyDocs = {
    import spark.implicits._
    Seq.empty[(Long, String)].toDF("doc_id", "text")
  }

  test("dedup family on an empty table returns empty, not an error") {
    assert(Dedup.exactByFingerprint(emptyDocs, "doc_id",
      TextFns.fingerprint(col("text"))).count() == 0)
    assert(Dedup.ngramJaccardPairs(emptyDocs, "doc_id", "text", 3, 0.5).count() == 0)
    assert(Dedup.simhash(emptyDocs, "doc_id", "text").count() == 0)
  }

  test("round-5 text/dedup operators survive empty and degenerate input") {
    import spark.implicits._
    // empty corpus → empty output everywhere, no ANSI throws
    assert(Dedup.containmentPairs(emptyDocs, "doc_id", "text", 3, 0.5).count() == 0)
    assert(Dedup.editDistanceNearDups(emptyDocs, "doc_id", "text",
      3, 32, 8, 0.5, 1, 10).count() == 0)
    assert(TextOps.bigramLm(emptyDocs, "text", 1L).count() == 0)
    assert(TextOps.hashedBow(emptyDocs, "doc_id", "text", 64).count() == 0)
    assert(TextOps.unigramKl(emptyDocs, "doc_id", "text").count() == 0)
    // null text and sub-shingle docs: pair ops drop them, row ops keep
    // well-defined rows (split(null) → null token array → no explode rows)
    val degenerate = Seq((0L, null: String), (1L, ""), (2L, "one"))
      .toDF("doc_id", "text")
    assert(Dedup.containmentPairs(degenerate, "doc_id", "text", 3, 0.5).count() == 0)
    assert(TextOps.bigramLm(degenerate, "text", 1L).count() == 0)
    val bow = TextOps.hashedBow(degenerate, "doc_id", "text", 64)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("cnt")).toMap
    assert(!bow.contains(0L))        // null text contributes no tokens
    assert(bow(1L) == 1L && bow(2L) == 1L)  // "" and "one": one token each
  }

  test("null and too-short texts produce empty shingle sets, never nulls") {
    import spark.implicits._
    val docs = Seq((0L, null: String), (1L, ""), (2L, "one two"),
      (3L, "one two three")).toDF("doc_id", "text")
    val sh = docs.select(col("doc_id"), TextFns.shingles(col("text"), 3).as("sh"))
      .collect().map(r => r.getLong(0) ->
        Option(r.getSeq[String](1)).map(_.length)).toMap
    assert(sh(0L).contains(0))      // null text → EMPTY array (never null)
    assert(sh(1L).contains(0))      // empty string → no 3-grams
    assert(sh(2L).contains(0))      // 2 tokens < n
    assert(sh(3L).contains(1))
    // posting relation simply drops null/short docs
    assert(Dedup.shingleSets(docs, "doc_id", "text", 3)
      .select("id").distinct().count() == 1)
  }

  test("prepareHourly on an empty frame yields empty clean and rejected") {
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("station_id", StringType),
        StructField("timestamp", StringType))))
    val (clean, rejected) = Clean.prepareHourly(empty, Observation.schema)
    assert(clean.count() == 0 && rejected.count() == 0)
    assert(clean.columns.toSeq == Observation.schema.fields.map(_.name).toSeq)
  }

  test("knnExact with an empty query set returns empty") {
    import spark.implicits._
    val vecs = Seq((0L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    assert(Similarity.knnExact(vecs, vecs.filter(col("vec_id") < 0),
      "vec_id", "embedding", 3).count() == 0)
  }

  test("knnExactAgg matches knnExact exactly under zero vectors: null " +
      "cosines rank last but still fill the top-k when candidates are " +
      "scarce (the oracle's NULLS LAST semantics)") {
    import spark.implicits._
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.9f, 0.1f)),
      (2L, Array(0.0f, 0.0f)), // zero vector → null cosine
      (3L, Array(0.5f, 0.5f))).toDF("vec_id", "embedding")
    val q = vecs.filter(col("vec_id") === 0)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).sortBy(_._1)
    // k=3 over 3 candidates: the zero vector MUST appear, cos = null
    val agg = rows(Similarity.knnExactAgg(vecs, q, "vec_id", "embedding", 3))
    val win = rows(Similarity.knnExact(vecs, q, "vec_id", "embedding", 3))
    assert(agg.toSeq == win.toSeq)
    assert(agg.toMap.apply(2L).isEmpty) // null cosine preserved, not dropped
    // k=2: enough finite candidates, zero vector excluded by rank
    val agg2 = rows(Similarity.knnExactAgg(vecs, q, "vec_id", "embedding", 2))
    assert(agg2.toSeq ==
      rows(Similarity.knnExact(vecs, q, "vec_id", "embedding", 2)).toSeq)
    assert(!agg2.map(_._1).contains(2L))
  }

  test("nearDupExact single-element and empty corpora") {
    import spark.implicits._
    val one = Seq((7L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    assert(Similarity.nearDupExact(one, "vec_id", "embedding", 0.0).count() == 0)
    val none = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    assert(Similarity.nearDupExact(none, "vec_id", "embedding", 0.0).count() == 0)
  }

  test("quality features handle empty-ish text without division blowups") {
    import spark.implicits._
    val df = Seq((0L, ""), (1L, "   "), (2L, "x")).toDF("doc_id", "text")
    val rows = TextOps.qualityFeatures(df, "doc_id", "text").collect()
    assert(rows.length == 3) // no exceptions; ratios may be null for len 0
  }

  test("round-3 ops: null text rows drop out cleanly, never throw") {
    import spark.implicits._
    val df = Seq((0L, Option("a b c")), (1L, Option.empty[String]))
      .toDF("doc_id", "text")
    // null text → null token array → the explode/posexplode drops the row
    assert(TextOps.chunkTokens(df, "doc_id", "text", 2, 1)
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSeq == Seq(0L))
    assert(TextOps.repetitionSignals(df, "doc_id", "text", 2)
      .collect().map(_.getLong(0)).toSeq == Seq(0L))
    assert(TextOps.bigramLmScores(df, "doc_id", "text")
      .collect().map(_.getLong(0)).toSeq == Seq(0L))
  }

  test("mixtureSample: null ids and boundary rates filter deterministically") {
    import spark.implicits._
    val df = Seq((Option(1L), "g0"), (Option(2L), "g1"), (Option.empty[Long], "g0"))
      .toDF("id", "grp")
    // rate 0 drops its whole group; null id hashes to null → dropped
    val kept = Sampling.mixtureSample(df, "id", "grp",
        Seq("g1" -> 0.0), defaultRate = 1.0, salt = "s")
      .collect().map(_.getAs[Long]("id")).toSet
    assert(kept == Set(1L))
  }

  test("incrementalDedup with an empty corpus degrades to within-batch dedup") {
    import spark.implicits._
    import graft.functions.TextFns
    val empty = Seq.empty[String].toDF("text")
      .select(TextFns.fingerprint(col("text")).as("fingerprint"))
    val incoming = Seq((1L, "x"), (2L, "x"), (3L, "y")).toDF("doc_id", "text")
    val out = Dedup.incrementalDedup(incoming, empty, "doc_id",
        TextFns.fingerprint(col("text")))
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(out == Set(1L, 3L))
  }

  test("session-3 ops: null text, empty benchmark, and oversized sample " +
      "degrade cleanly, never throw") {
    import spark.implicits._
    val docs = Seq((1L, Option("alpha beta gamma delta")), (2L, None),
      (3L, Option("alpha beta gamma delta")))
      .toDF("doc_id", "text")
    // novelty: null text drops out; the two dups zero each other
    val nov = TextOps.ngramNovelty(docs, "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(nov == Map(1L -> 0.0, 3L -> 0.0))
    // fuzzy decontamination vs an EMPTY benchmark: nothing is flagged
    val noBench = docs.filter(lit(false))
    assert(Dedup.fuzzyDecontaminate(docs, noBench, "doc_id", "text",
      3, 64, 16, 0.8).isEmpty)
    // weighted sample with k > n: every VALID row sampled, ranks complete.
    // Null/zero/negative weights carry no sampling mass and are dropped —
    // a zero weight would otherwise make the key ±Inf/NaN, and NaN sorts
    // ABOVE all doubles descending, silently admitting the invalid row.
    val weighted = Seq((1L, Option(5L)), (2L, Option(9L)),
      (3L, Option.empty[Long]), (4L, Option(0L)), (5L, Option(-2L)))
      .toDF("id", "w")
    val ws = Sampling.weightedSample(weighted, "id", "w", 10, "e")
      .collect().map(r => r.getLong(0) -> r.getInt(r.fieldIndex("sample_rank"))).toMap
    assert(ws.keySet == Set(1L, 2L)) // invalid-weight rows excluded
    assert(ws.values.toSeq.sorted == Seq(1, 2))
  }

  test("round-4 ops: null text, zero vectors, and empty frames degrade " +
      "cleanly, never throw") {
    import spark.implicits._
    val docs = Seq((1L, Option("the of and a pqr stu vwx yz")), (2L, None),
      (3L, Option("")))
      .toDF("doc_id", "text")
    // gopherFilter: null/empty text fails rules, never divides by zero
    val gf = TextOps.gopherFilter(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(gf.keySet == Set(1L, 2L, 3L))
    assert(!gf(2L) && !gf(3L)) // degenerate docs never pass
    // repeatedSpanCoverage: null text → token base may drop the row (null
    // token array), but surviving rows carry exact counts
    val cov = TextOps.repeatedSpanCoverage(docs, "doc_id", "text", 3, 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(cov.getOrElse(1L, 0L) == 0L) // nothing repeated across docs
    // int8Quantize: the zero vector takes scale 0 and all-zero codes
    val zv = Seq((0L, Array(0.0f, 0.0f, 0.0f)), (1L, Array(1.0f, 0.0f, -0.5f)))
      .toDF("vec_id", "embedding")
    val iq = Similarity.int8Quantize(zv, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getSeq[Int](2).toList)).toMap
    assert(iq(0L) == ((0L, List(0, 0, 0))))
    assert(iq(1L)._2 == List(127, 0, -64)) // round-half-up(0.5*127) with sign
    // electSurvivors on an empty cluster set returns empty
    val noClusters = Seq.empty[(Long, Long)].toDF("id", "component")
    val scored = Seq((1L, 1.0)).toDF("doc_id", "s")
    assert(Curation.electSurvivors(noClusters, scored, "doc_id", "s").isEmpty)
  }

  test("profiling ops on empty frames: zero counts and null stats, no errors") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Double, Double)].toDF("id", "x", "y")
    val prof = Quality.profileTable(empty, Seq("id", "x"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(3), r.isNullAt(4))).toMap
    assert(prof == Map("id" -> ((0L, 0L, true)), "x" -> ((0L, 0L, true))))
    val corr = Quality.pearsonMatrix(empty, Seq("x", "y")).collect()
    assert(corr.length == 1 && corr(0).getAs[Long]("n") == 0L && corr(0).isNullAt(3))
    // NaN rows are excluded like nulls (pairwise-complete contract)
    val withNaN = Seq((1.0, 1.0), (2.0, 2.0), (Double.NaN, 3.0)).toDF("x", "y")
    val r = Quality.pearsonMatrix(withNaN, Seq("x", "y")).collect()(0)
    assert(r.getAs[Long]("n") == 2L && r.getAs[Double]("r") == 1.0)
  }

  test("round-7 metric operators survive degenerate input: single class, " +
      "empty tables, all-null keys") {
    import spark.implicits._
    // single-class AUC and KS: no division blowups, null doubles
    val mono = Seq((true, 1L), (true, 2L)).toDF("y", "s")
    val auc = Quality.rocAuc(mono, col("y"), col("s")).collect()(0)
    assert(auc.getAs[Long]("n_neg") == 0L && auc.isNullAt(3))
    val ks = Quality.ksTest(mono, col("y"), col("s")).collect()(0)
    assert(ks.getAs[Long]("n2") == 0L && ks.isNullAt(3))
    // empty inputs → empty (or empty-grid) outputs, never a throw
    val emptyLS = Seq.empty[(java.lang.Boolean, java.lang.Long)].toDF("y", "s")
    assert(Quality.rocAuc(emptyLS, col("y"), col("s"))
      .collect()(0).getAs[Long]("auc_num2") == 0L ||
      Quality.rocAuc(emptyLS, col("y"), col("s")).collect()(0).isNullAt(2))
    assert(Quality.calibrationBins(emptyLS, col("y"), col("s"), 10)
      .count() == 0)
    val emptyTs = Seq.empty[(java.sql.Timestamp, java.lang.Double)]
      .toDF("ts", "v")
    assert(Temporal.dailyCusum(emptyTs, "ts", "v").count() == 0)
    assert(Temporal.hourlyAcf(emptyTs.select(col("ts")), "ts", 3).count() == 0)
    assert(Temporal.kaplanMeier(
      Seq.empty[(java.lang.Long, java.lang.Boolean)].toDF("dur", "ev"),
      "dur", "ev").count() == 0)
    // keySkewReport with all-null keys → the filter leaves nothing and
    // the single aggregate row carries zero keys without dividing
    val nullKeys = Seq.empty[String].toDF("k")
    val skew = Quality.keySkewReport(nullKeys, col("k")).collect()(0)
    assert(skew.getAs[Long]("n_keys") == 0L)
  }
}
