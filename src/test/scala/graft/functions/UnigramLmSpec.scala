package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class UnigramLmSpec extends SparkSpec {

  private val toyPieces = Seq(
    // scores in micro-nats; higher (less negative) = more probable
    ("a", -3000000L), ("b", -3000000L), ("c", -3000000L),
    ("ab", -2000000L), ("bc", -2500000L), ("abc", -5500000L))

  test("Viterbi segmentation maximizes the score; tie-break pinned") {
    val t = UnigramTokenizer(toyPieces)
    // "abc": ab+c = -5.0, a+bc = -5.5, abc = -5.5, a+b+c = -9.0 → ab+c
    assert(t.segment("abc") == ((-5000000L, List("ab", "c"))))
    // "ab": ab (-2.0) beats a+b (-6.0)
    assert(t.segment("ab") == ((-2000000L, List("ab"))))
    // equal-score tie: "abc" with abc == a+bc at -5.5 — fewer pieces
    // wins, then the longer final piece (the encoded-key order)
    val t2 = UnigramTokenizer(Seq(("a", -1000000L), ("b", -1000000L),
      ("c", -1000000L), ("ab", -2000000L), ("c2", -1L), ("abc", -3000000L),
      ("bc", -2000000L)))
    // abc = -3.0 (1 piece), ab+c = -3.0 (2), a+bc = -3.0 (2), a+b+c -3.0 (3)
    assert(t2.segment("abc")._2 == List("abc"))
  }

  test("round trip: pieces concatenate back to the word, score is the sum") {
    val t = UnigramTokenizer(toyPieces)
    for (w <- Seq("abc", "aabbcc", "cab", "abcabc", "a")) {
      val (s, ps) = t.segment(w)
      assert(ps.mkString == w, s"round-trip failed for $w")
      assert(s == ps.map(toyPieces.toMap).sum)
    }
  }

  test("statsExpr (Column DP) matches the driver Viterbi on every word") {
    import spark.implicits._
    val t = UnigramTokenizer(toyPieces)
    val words = Seq("abc", "aabbcc", "cab", "abcabc", "a", "cccab")
    val got = words.toDF("w")
      .select(col("w"), t.statsExpr(col("w")).as("st"))
      .select(col("w"), col("st.s"), col("st.n"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    words.foreach { w =>
      val (s, ps) = t.segment(w)
      assert(got(w) == ((s, ps.size.toLong)), s"statsExpr diverged on $w")
    }
  }

  test("trainer: driver and distributed produce the identical piece table") {
    import spark.implicits._
    val corpus = Seq(
      ("thedata", 50L), ("thecat", 30L), ("catdata", 20L), ("thethe", 10L),
      ("data", 40L), ("cat", 25L), ("xyz", 1L))
    val viaDriver = UnigramTrainer.learn(corpus, targetVocab = 40)
    val viaCluster = UnigramTrainer.learnDistributed(
      corpus.toDF("w", "n"), "w", "n", targetVocab = 40)
    assert(viaDriver == viaCluster)
    // learned something beyond the alphabet, and frequent substrings won
    val multis = viaDriver.filter(_._1.length > 1).map(_._1)
    assert(multis.nonEmpty)
    assert(multis.exists(p => "thedata".contains(p)))
  }

  test("trainer: required a-z coverage survives even when unseen; " +
      "pruning respects the target vocabulary") {
    val pieces = UnigramTrainer.learn(Seq(("aba", 5L)), targetVocab = 30)
    val singles = pieces.filter(_._1.length == 1).map(_._1).toSet
    assert(('a' to 'z').forall(c => singles.contains(c.toString)))
    assert(pieces.size <= 30)
    // every piece carries a negative (log-prob) micro score
    assert(pieces.forall(_._2 < 0))
    // and the tokenizer built from it segments arbitrary [a-z]+ words
    val t = UnigramTokenizer(pieces)
    assert(t.segment("zebra")._2.mkString == "zebra")
  }

  test("shipped resource: loads, covers a-z, maxLen within the DP/oracle " +
      "bound, and EM counts reproduce (trainer determinism)") {
    val t = UnigramTokenizer.fromResource()
    assert(t.maxLen <= 4, "oracle recursion joins pieces up to length 4")
    assert(('a' to 'z').forall(c => t.covers(c.toString)))
    // the resource is the distributed trainer's output over sf0.001 —
    // segmenting any short word round-trips
    for (w <- Seq("data", "warehouse", "pipeline", "xz")) {
      assert(t.segment(w)._2.mkString == w)
    }
  }
}
