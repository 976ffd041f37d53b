package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{Hashing, TextFns}
import graft.operators.Dedup

/** STREAMING near-duplicate flagging against a static published corpus —
  * the "dedupe the crawl stream before it lands" operation (the batch
  * face is `Dedup.incrementalDedup` for exact dups and
  * `Dedup.minhashNearDups` for near-dups; this is the near-dup rule
  * applied to a live stream).
  *
  * Everything on the stream side is a PURE PROJECTION — the per-row
  * distinct-shingle-hash array, the k `array_min` MinHash signatures,
  * and the band/bucket structs — and the corpus lookups are
  * stream-static inner joins. The whole query is therefore APPEND-mode
  * legal with ZERO streaming state: no watermark, no state store,
  * nothing that grows over a week of uptime. At 100 TB the static sides
  * are warehouse tables (the banding relation is `bands` rows per corpus
  * doc; the array relation one row per doc), re-read per micro-batch and
  * joined on their natural keys.
  *
  * The price of statelessness, stated honestly: per-row shingle hashing
  * rides interpreted higher-order-function lambdas (the batch path's
  * explode+groupBy form is codegen'd but aggregates — Dedup
  * .shingleArrays' docstring has the 4× measurement), acceptable at
  * stream rates where a micro-batch is bounded. And candidate rows may
  * repeat when a pair collides in several bands — a row-level `distinct`
  * here would be streaming STATE, so dedupe in the sink's foreachBatch
  * (batch-local, bounded) if per-pair uniqueness matters.
  */
object StreamNearDup {

  /** Batch-built corpus index: the per-doc shingle-hash arrays
    * (id, shs, sz) and the LSH banding relation (id, band, bucket).
    * Persist both — they are ordinary warehouse tables at scale; each
    * micro-batch re-reads them as the static join side.
    */
  def corpusIndex(corpus: DataFrame, idCol: String, textCol: String,
      n: Int, k: Int, bands: Int): (DataFrame, DataFrame) = {
    val arr = Dedup.shingleArrays(corpus, idCol, textCol, n)
    (arr, Dedup.lshBands(Dedup.minhashSignaturesArr(arr, k), k, bands))
  }

  /** The streaming query fragment: incoming (idCol, textCol) rows →
    * (sid, corpus_id, jaccard) flag rows for every stream document whose
    * exact n-gram Jaccard against some corpus document clears `minJac`
    * (LSH prunes candidates; the confirm is exact, the
    * [[graft.operators.Dedup.minhashNearDups]] contract). Anti-join the
    * flags against the batch in the sink to drop near-dups, or land them
    * in an audit table.
    */
  def flagNearDups(stream: DataFrame, corpusArr: DataFrame,
      corpusBands: DataFrame, idCol: String, textCol: String,
      n: Int, k: Int, bands: Int, minJac: Double): DataFrame = {
    // per-row mirror of shingleSets→shingleArrays: distinct shingles,
    // the same 60-bit hash — kept as a projection so the plan stays
    // stateless (an explode+groupBy here would be a stream aggregation)
    val shs = transform(array_distinct(TextFns.shingles(col(textCol), n)),
      s => Hashing.h60(s))
    val sigs0 = stream.select(col(idCol).as("id"), shs.as("__shs"))
      .filter(size(col("__shs")) > 0)
    val sigs = (0 until k).foldLeft(sigs0) { (df, i) =>
      df.withColumn(s"s$i",
        array_min(transform(col("__shs"), x => Hashing.hFast(x, i))))
    }
    // the shared banding derivation, with the shingle array carried
    // through the explode (a post-hoc id join-back would be a
    // stream-stream join, which append mode cannot do without state)
    val streamBands = Dedup.lshBands(sigs, k, bands, carry = Seq("__shs"))
    streamBands
      .join(corpusBands.select(col("id").as("corpus_id"),
        col("band"), col("bucket")), Seq("band", "bucket"))
      .join(corpusArr.select(col("id").as("corpus_id"),
        col("shs").as("__cshs"), col("sz").as("__csz")), "corpus_id")
      .withColumn("inter", size(array_intersect(col("__shs"), col("__cshs"))))
      .withColumn("jaccard", col("inter").cast("double") /
        (size(col("__shs")) + col("__csz") - col("inter")))
      .filter(col("jaccard") >= minJac)
      .select(col("id").as("sid"), col("corpus_id"), col("jaccard"))
  }
}
