package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{Hashing, TextFns}

/** Document deduplication for training-data pipelines, from exact to fuzzy:
  *
  *   - exact:   normalize → md5 fingerprint → keep-one-per-fingerprint
  *   - n-gram:  exact Jaccard over word shingles via an inverted-index
  *              self-join (the standard distributed set-similarity join —
  *              no O(n²) pair enumeration; cost scales with shingle
  *              collision counts, not document pairs)
  *   - MinHash: k-permutation signatures + banded LSH bucket-join for
  *              candidate generation, exact-Jaccard confirmation after
  *   - SimHash: 60-bit token-weight signatures; near pairs (hamming ≤ d)
  *              found with a pigeonhole band join (exact for d < bands)
  *
  * Scale notes (100 TB): every path here is shuffle-on-key only — shingle
  * explosion shuffles on the shingle, LSH shuffles on (band, bucket), and no
  * stage ever materializes the document cross product. Ultra-frequent
  * shingles (boilerplate) are the one skew risk: cap them with `maxShingleDf`
  * which drops shingles appearing in more than that many documents from
  * candidate generation (a standard prefix-filtering relaxation; leave at
  * Int.MaxValue for oracle-exact semantics).
  */
object Dedup {

  /** Exact dedup: one survivor (lowest id) per normalized-text fingerprint.
    * Single shuffle on the 128-bit fingerprint; survivor choice is
    * deterministic (min id), unlike `dropDuplicates`.
    */
  def exactByFingerprint(docs: DataFrame, idCol: String,
      fingerprint: Column): DataFrame = {
    val fp = docs.withColumn("fingerprint", fingerprint)
    val w = Window.partitionBy(col("fingerprint")).orderBy(col(idCol))
    fp.withColumn("__rn", row_number().over(w))
      .withColumn("group_size", count(lit(1)).over(Window.partitionBy(col("fingerprint"))))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Distinct (id, shingle) pairs — the inverted-index relation every fuzzy
    * path builds on. One narrow explode, no shuffle yet.
    */
  def shingleSets(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    docs.select(col(idCol).as("id"),
        explode(array_distinct(TextFns.shingles(col(textCol), n))).as("sh"))

  /** Exact n-gram Jaccard similarity join: all document pairs with
    * `|A∩B| / |A∪B| >= minJac`, computed by grouping the inverted index on
    * the shingle (shuffle key = shingle, never the pair space).
    *
    * Returns (id_a, id_b, inter, size_a, size_b, jaccard), id_a < id_b.
    */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int, minJac: Double, maxShingleDf: Int = Int.MaxValue): DataFrame = {
    val sh = shingleSets(docs, idCol, textCol, n).cache()
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("sz"))
    val postings =
      if (maxShingleDf == Int.MaxValue) sh
      else {
        val df = sh.groupBy("sh").agg(count(lit(1)).as("__df"))
          .filter(col("__df") <= maxShingleDf).select("sh")
        sh.join(df, "sh") // drops boilerplate shingles from candidate gen
      }
    val inter = postings.as("a").join(postings.as("b"),
        col("a.sh") === col("b.sh") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "size_a"), "id_a")
      .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "size_b"), "id_b")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("size_a") + col("size_b") - col("inter")))
      .filter(col("jaccard") >= minJac)
      .select("id_a", "id_b", "inter", "size_a", "size_b", "jaccard")
  }

  /** MinHash signatures: k independent 60-bit hash families over the
    * distinct shingle set, one `min` aggregate per family — a single
    * shuffle on the document id, k columns `s0..s{k-1}`.
    *
    * `oracleHash=true` uses the md5-based cross-engine hash (replayable in
    * DuckDB); false uses xxHash64 (the 100 TB fast path — same structure,
    * ~10x cheaper hashing).
    */
  def minhashSignatures(shingles: DataFrame, k: Int, oracleHash: Boolean = true): DataFrame = {
    val aggs = (0 until k).map { i =>
      val h = if (oracleHash) Hashing.h60(col("sh"), i) else Hashing.hFast(col("sh"), i)
      min(h).as(s"s$i")
    }
    shingles.groupBy("id").agg(aggs.head, aggs.tail: _*)
  }

  /** LSH banding: signature → `bands` rows of (id, band, bucket) where the
    * bucket is a hash of `rowsPerBand` consecutive signature slots. Pairs
    * sharing any (band, bucket) are candidates. Shuffle key = (band,
    * bucket); a bucket with B docs emits B(B-1)/2 candidates, so bucket
    * skew — not data size — bounds the cost.
    */
  def lshCandidatePairs(sigs: DataFrame, k: Int, bands: Int): DataFrame = {
    require(k % bands == 0, s"k=$k not divisible by bands=$bands")
    val r = k / bands
    val bandCols = (0 until bands).map { b =>
      val slots = (b * r until (b + 1) * r).map(i => col(s"s$i"))
      struct(lit(b).as("band"), Hashing.h60(concat_ws(",", slots: _*)).as("bucket"))
    }
    val exploded = sigs.select(col("id"), explode(array(bandCols: _*)).as("bb"))
      .select(col("id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    exploded.as("a").join(exploded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
  }

  /** Full MinHash near-dup pipeline: shingle → sign → band → candidate →
    * exact-Jaccard confirm (so the output is a deterministic subset of
    * [[ngramJaccardPairs]]; LSH only prunes the search space).
    */
  def minhashNearDups(docs: DataFrame, idCol: String, textCol: String,
      n: Int, k: Int, bands: Int, minJac: Double,
      oracleHash: Boolean = true): DataFrame = {
    val sh = shingleSets(docs, idCol, textCol, n).cache()
    val cands = lshCandidatePairs(minhashSignatures(sh, k, oracleHash), k, bands)
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("sz"))
    // candidate-bounded exact confirm: gather each candidate pair's shingle
    // sets by id — cost scales with |candidates|, never with the full
    // inverted-index collision count
    val aSh = sh.select(col("id").as("id_a"), col("sh").as("__sh"))
    val bSh = sh.select(col("id").as("id_b"), col("sh").as("__sh"))
    val inter = cands.join(aSh, "id_a").join(bSh, Seq("id_b", "__sh"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "size_a"), "id_a")
      .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "size_b"), "id_b")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("size_a") + col("size_b") - col("inter")))
      .filter(col("jaccard") >= minJac)
      .select("id_a", "id_b", "jaccard")
  }

  /** 60-bit SimHash per document: bit j of the signature is set iff the
    * token-frequency-weighted sum of (+1 / -1) over bit j of each token's
    * h60 is non-negative. One explode + one 60-expression aggregate —
    * single shuffle on the document id.
    */
  def simhash(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(idCol).as("id"),
      explode(TextFns.tokens(col(textCol))).as("tok"))
    val h = Hashing.h60(col("tok"))
    val bitSums = (0 until 60).map { j =>
      sum(when(shiftright(h, j) % 2 === 1, 1).otherwise(-1)).as(s"b$j")
    }
    val summed = toks.groupBy("id").agg(bitSums.head, bitSums.tail: _*)
    val sig = (0 until 60).map { j =>
      when(col(s"b$j") >= 0, shiftleft(lit(1L), j)).otherwise(lit(0L))
    }.reduce(_ + _)
    summed.select(col("id"), sig.as("simhash"))
  }

  /** Near-dup pairs by SimHash hamming distance, via a pigeonhole band
    * join: the 60-bit signature splits into `bands` equal slices; two
    * signatures within hamming distance `maxDist < bands` must agree on at
    * least one slice, so joining on (slice index, slice value) finds ALL
    * such pairs — exact, not probabilistic — while shuffling on the band
    * value instead of enumerating pairs.
    */
  def simhashNearDups(sigs: DataFrame, maxDist: Int, bands: Int = 4): DataFrame = {
    require(maxDist < bands, "pigeonhole exactness needs maxDist < bands")
    val width = 60 / bands
    val mask = (1L << width) - 1
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        (shiftright(col("simhash"), b * width).bitwiseAND(lit(mask))).as("bucket"))
    }
    val exploded = sigs.select(col("id"), col("simhash"),
        explode(array(bandCols: _*)).as("bb"))
      .select(col("id"), col("simhash"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    exploded.as("a").join(exploded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
  }
}
