package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A unigram-LM (SentencePiece-class) subword tokenizer — the second
  * tokenizer family next to [[BpeTokenizer]] (round-11 verdict #4): a
  * piece VOCABULARY with log-probabilities, segmentation = the maximum-
  * likelihood piece sequence (Viterbi), training = EM over the corpus
  * with pruning to a target vocabulary.
  *
  * Engine-friendly by construction, like the BPE stack:
  *
  *   - scores are INTEGER micro-nats (round(ln(c/C)·1e6)), so every DP
  *     comparison is exact long arithmetic — no float drift between the
  *     driver trainer, the distributed trainer, the Spark Column form,
  *     and the DuckDB oracle replay;
  *   - the Viterbi argmax tie-break is pinned by ONE encoded key
  *     `score·2^20 − nPieces·2^8 + pieceLen` (score dominates, then
  *     fewer pieces, then the longer final piece): candidate keys are
  *     provably distinct (same (score,n) ⇒ len differs; Δscore ≥ 1 µ ⇒
  *     Δkey ≥ 2^20 − 6144 > 0), so "max key" is a total order every
  *     engine computes identically;
  *   - training is HARD EM (Viterbi counts, not forward-backward
  *     expectations): the E-step is integer, so driver ≡ distributed is
  *     bit-exact and spec-pinnable — the classic soft-EM refinement
  *     changes probabilities by < the pruning granularity at these
  *     vocab sizes while making exact replay impossible.
  *
  * Scale shape (the 100 TB contract): the corpus is reduced ONCE to a
  * (word, count) relation — the only thing the trainer ever iterates
  * over — and each EM round is map-side Viterbi over distinct words
  * with a broadcast piece table, shuffling only (piece, count) rows
  * bounded by the vocabulary, never text. The M-step runs on the
  * driver over that vocabulary-bounded grid (the
  * [[BpeTrainer.learnDistributed]] pattern).
  *
  * Reference anchor: the reference pipeline tokenizes only by
  * whitespace (src/data_processing/transformations.py splits payload
  * text); the tokenizer families here are the LLM-pipeline extension
  * surface SURVEY §2.11 maps.
  */
final case class UnigramTokenizer(pieces: Seq[(String, Long)]) {
  require(pieces.nonEmpty, "empty unigram vocabulary")
  require(pieces.map(_._1).distinct.size == pieces.size, "duplicate pieces")

  val maxLen: Int = pieces.map(_._1.length).max
  private val scoreOf: Map[String, Long] = pieces.toMap

  /** Single characters must cover the alphabet the words use, or a word
    * could be unsegmentable; [[UnigramTrainer]] guarantees it for a-z.
    */
  def covers(word: String): Boolean =
    word.forall(c => scoreOf.contains(c.toString))

  /** Driver-side Viterbi: (total score micro, piece list). The DP the
    * Column and SQL forms replay exactly (same key tie-break).
    */
  def segment(word: String): (Long, List[String]) = {
    val L = word.length
    require(L > 0 && covers(word), s"unsegmentable word: $word")
    val s = new Array[Long](L + 1)
    val n = new Array[Int](L + 1)
    val back = new Array[Int](L + 1) // winning piece length at position i
    var i = 1
    while (i <= L) {
      var bestKey = Long.MinValue
      var k = 1
      while (k <= math.min(maxLen, i)) {
        scoreOf.get(word.substring(i - k, i)) match {
          case Some(ps) =>
            val cs = s(i - k) + ps
            val cn = n(i - k) + 1
            val key = cs * 1048576L - cn * 256L + k
            if (key > bestKey) {
              bestKey = key; s(i) = cs; n(i) = cn; back(i) = k
            }
          case None => ()
        }
        k += 1
      }
      require(bestKey != Long.MinValue, s"no piece ends at $i in $word")
      i += 1
    }
    var out = List.empty[String]
    var p = L
    while (p > 0) { out = word.substring(p - back(p), p) :: out; p -= back(p) }
    (s(L), out)
  }

  /** Viterbi stats as ONE Column: struct(score_micro BIGINT, n_pieces
    * BIGINT) for a [a-z]+ word column. The DP array is folded with
    * `aggregate` over positions; piece scores come from a map literal;
    * the argmax uses the same encoded key as [[segment]]. All builtin
    * higher-order expressions — no UDF.
    */
  def statsExpr(word: Column): Column = {
    val scoreMap = map(pieces.sortBy(_._1)
      .flatMap { case (p, s) => Seq(lit(p), lit(s)) }: _*)
    val dp = aggregate(
      sequence(lit(1), length(word)),
      array(struct(lit(0L).as("s"), lit(0L).as("n"))),
      (acc: Column, i: Column) => {
        val cands = transform(sequence(lit(1), least(lit(maxLen), i)), k => {
          val prev = element_at(acc, i - k + 1)
          val ps = element_at(scoreMap, word.substr(i - k + 1, k))
          val cs = prev.getField("s") + ps
          val cn = prev.getField("n") + lit(1L)
          when(ps.isNotNull,
            struct(cs.as("s"), cn.as("n"),
              (cs * lit(1048576L) - cn * lit(256L) + k).as("key")))
        })
        val valid = filter(cands, c => c.isNotNull)
        val bestKey = array_max(transform(valid, _.getField("key")))
        val best = element_at(
          filter(valid, c => c.getField("key") === bestKey), 1)
        concat(acc, array(struct(best.getField("s").as("s"),
          best.getField("n").as("n"))))
      })
    element_at(dp, length(word) + 1)
  }

  /** The piece table as a DuckDB VALUES body: `('a',-123),( ... )` —
    * spliced into the q361 oracle so the SQL replay scores with the
    * SAME integers.
    */
  def piecesSqlValues: String =
    pieces.sortBy(_._1).map { case (p, s) =>
      "('" + p.replace("'", "''") + "'," + s + ")" }.mkString(",")
}

object UnigramTokenizer {
  /** Load `piece<TAB>scoreMicro` lines ([[UnigramTrainer.save]] format;
    * `graft/unigram_pieces.tsv` ships).
    */
  def fromResource(path: String = "graft/unigram_pieces.tsv"): UnigramTokenizer = {
    val in = getClass.getClassLoader.getResourceAsStream(path)
    require(in != null, s"missing resource $path")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try UnigramTokenizer(src.getLines().filter(_.nonEmpty).map { line =>
      val Array(p, s) = line.split('\t')
      (p, s.toLong)
    }.toList)
    finally src.close()
  }
}

/** Unigram-LM training: seed an over-complete substring vocabulary,
  * refine piece probabilities by hard (Viterbi) EM, prune to the target
  * size. [[learn]] is the driver-side reference; [[learnDistributed]]
  * runs the identical algorithm over a (word, count) DataFrame —
  * spec-pinned bit-equal.
  */
object UnigramTrainer {

  /** micro-nat log-prob of count c under total C (both exact longs). */
  private def scoreMicro(c: Long, tot: Long): Long =
    math.rint(math.log(c.toDouble / tot.toDouble) * 1e6).toLong

  /** The characters every vocabulary must contain whatever the corpus
    * shows (SentencePiece's character-coverage idea): q361's word
    * relation is [a-z]+, so a letter unseen at the TRAINING scale must
    * still be segmentable at a larger one — the sf0.001 corpus taught
    * round 12 this the hard way (no 'x', no 'z').
    */
  val RequiredChars: Seq[String] = ('a' to 'z').map(_.toString)

  /** Seed selection from raw substring counts: every single character
    * observed PLUS the required alphabet (floored at count 1), plus
    * multi-char substrings with count ≥ minCount, capped to the top
    * `seedCap` multis by (count desc, piece asc). Shared by both
    * trainers so selection can never diverge.
    */
  private def seedSelect(counts: Map[String, Long], minCount: Long,
      seedCap: Int): Map[String, Long] = {
    val singles = counts.filter(_._1.length == 1) ++
      RequiredChars.map(c => c -> math.max(counts.getOrElse(c, 0L), 1L))
    val multis = counts.filter { case (p, c) => p.length > 1 && c >= minCount }
      .toSeq.sortBy { case (p, c) => (-c, p) }.take(seedCap)
    singles ++ multis
  }

  /** M-step on the vocabulary-bounded count grid: multi-char pieces
    * vanish at count 0; single characters are floored at count 1 (they
    * must survive for coverage). Returns (counts', scores').
    */
  private def mStep(prev: Map[String, Long],
      viterbiCounts: Map[String, Long]): (Map[String, Long], Map[String, Long]) = {
    val counts = prev.keysIterator.flatMap { p =>
      val c = viterbiCounts.getOrElse(p, 0L)
      if (p.length == 1) Some(p -> math.max(c, 1L))
      else if (c > 0) Some(p -> c)
      else None
    }.toMap
    val tot = counts.valuesIterator.sum
    (counts, counts.map { case (p, c) => p -> scoreMicro(c, tot) })
  }

  /** Final pruning: all singles + the top (targetVocab − #singles)
    * multis by (count desc, piece asc), scores renormalized over the
    * kept set.
    */
  private def pruneTo(counts: Map[String, Long],
      targetVocab: Int): Seq[(String, Long)] = {
    val singles = counts.filter(_._1.length == 1)
    val keepMulti = counts.filter(_._1.length > 1)
      .toSeq.sortBy { case (p, c) => (-c, p) }
      .take(math.max(0, targetVocab - singles.size))
    val kept = singles.toSeq ++ keepMulti
    val tot = kept.map(_._2).sum
    kept.map { case (p, c) => p -> scoreMicro(c, tot) }.sortBy(_._1)
  }

  /** Substring counts of one word, occurrence-weighted: every start
    * position of every length 1..maxPieceLen, times the word's corpus
    * count. Shared counting for both trainers.
    */
  private def substrCountsInto(word: String, n: Long, maxPieceLen: Int,
      into: scala.collection.mutable.Map[String, Long]): Unit = {
    var i = 0
    while (i < word.length) {
      var k = 1
      while (k <= maxPieceLen && i + k <= word.length) {
        val p = word.substring(i, i + k)
        into(p) = into.getOrElse(p, 0L) + n
        k += 1
      }
      i += 1
    }
  }

  /** Driver-side reference trainer over a (word, count) list. Words must
    * be non-empty; training is deterministic (pure integer E-steps, one
    * pinned double→micro rounding per piece per M-step).
    */
  def learn(wordCounts: Seq[(String, Long)], targetVocab: Int,
      maxPieceLen: Int = 4, iters: Int = 2, minCount: Long = 2,
      seedCap: Int = 2000): Seq[(String, Long)] = {
    val raw = scala.collection.mutable.HashMap.empty[String, Long]
    wordCounts.foreach { case (w, n) =>
      substrCountsInto(w, n, maxPieceLen, raw) }
    var counts = seedSelect(raw.toMap, minCount, seedCap)
    var tot = counts.valuesIterator.sum
    var scores = counts.map { case (p, c) => p -> scoreMicro(c, tot) }
    (0 until iters).foreach { _ =>
      val tok = UnigramTokenizer(scores.toSeq)
      val vc = scala.collection.mutable.HashMap.empty[String, Long]
      wordCounts.foreach { case (w, n) =>
        tok.segment(w)._2.foreach(p => vc(p) = vc.getOrElse(p, 0L) + n)
      }
      val (c2, s2) = mStep(counts, vc.toMap)
      counts = c2; scores = s2
    }
    pruneTo(counts, targetVocab)
  }

  /** Distributed trainer — identical output to [[learn]] (shared seed
    * selection, M-step, pruning, and the same integer Viterbi; equality
    * is spec-pinned), but the corpus stays in the cluster:
    *
    *   1. substring seeding: `mapPartitions` over (word, count) rows
    *      accumulates a per-task piece→count hashmap (map-side
    *      combine), the shuffle carries only distinct (piece, count)
    *      rows, and ONLY the selected seed (≤ seedCap + alphabet)
    *      reaches the driver;
    *   2. each EM round broadcasts the current piece scores (a few KB),
    *      Viterbi-segments distinct words map-side, and shuffles
    *      (piece, count) rows bounded by the vocabulary — text never
    *      moves;
    *   3. the M-step and pruning run on the driver over that bounded
    *      grid.
    */
  def learnDistributed(words: DataFrame, wordCol: String, countCol: String,
      targetVocab: Int, maxPieceLen: Int = 4, iters: Int = 2,
      minCount: Long = 2, seedCap: Int = 2000): Seq[(String, Long)] = {
    import org.apache.spark.sql.Encoders
    val spark = words.sparkSession
    val wc = words.select(col(wordCol).cast("string").as("w"),
      col(countCol).cast("long").as("n")).na.drop()
    val tup = Encoders.tuple(Encoders.STRING, Encoders.scalaLong)
    val ds = wc.as(tup)
    // 1. seed: map-side substring counting, aggregate, select
    val rawSeed = ds.mapPartitions { it =>
        val m = scala.collection.mutable.HashMap.empty[String, Long]
        it.foreach { case (w, n) => substrCountsInto(w, n, maxPieceLen, m) }
        m.iterator
      }(tup).toDF("p", "c")
      .groupBy("p").agg(sum("c").as("c"))
      // the seed filter runs IN the cluster so the collect is bounded:
      // singles always, multis only at minCount — seedSelect then caps
      .filter(length(col("p")) === 1 || col("c") >= minCount)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    var counts = seedSelect(rawSeed, minCount, seedCap)
    var tot = counts.valuesIterator.sum
    var scores = counts.map { case (p, c) => p -> scoreMicro(c, tot) }
    (0 until iters).foreach { _ =>
      val bc = spark.sparkContext.broadcast(scores.toSeq)
      val vc = ds.mapPartitions { it =>
          val tok = UnigramTokenizer(bc.value)
          val m = scala.collection.mutable.HashMap.empty[String, Long]
          it.foreach { case (w, n) =>
            tok.segment(w)._2.foreach(p => m(p) = m.getOrElse(p, 0L) + n)
          }
          m.iterator
        }(tup).toDF("p", "c")
        .groupBy("p").agg(sum("c").as("c"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val (c2, s2) = mStep(counts, vc)
      counts = c2; scores = s2
    }
    pruneTo(counts, targetVocab)
  }

  /** Serialize in [[UnigramTokenizer.fromResource]]'s tsv format. */
  def save(pieces: Seq[(String, Long)], path: java.nio.file.Path): Unit = {
    val lines = pieces.map { case (p, s) => s"$p\t$s" }
    java.nio.file.Files.writeString(path, lines.mkString("\n") + "\n")
  }
}
