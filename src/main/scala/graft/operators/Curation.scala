package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** The composed training-data curation pipeline: quality filter →
  * language filter → exact dedup → near-dup removal, with a per-document
  * drop reason (first failing stage wins). This is the end-to-end shape a
  * corpus-cleaning job takes; every stage is one of the library's
  * operators, so the whole pipeline stays declarative and shuffles only
  * on fingerprints / shingle hashes.
  *
  * Near-dup removal keeps the LOWER doc id of every similar pair (the
  * deterministic greedy rule; a clique-exact variant would need connected
  * components). Candidate generation uses the LOSSLESS PPJoin prefix
  * filter (`prefixFilter = true`) — at curation thresholds (t >= ~0.7,
  * where this pipeline lives) it wins over the direct inverted-index
  * count, and unlike MinHash-LSH it provably finds every pair, so the
  * output is bit-identical to the exact join. `maxShingleDf` additionally
  * caps boilerplate-shingle fan-out (the Σdf² skew risk at 100 TB); the
  * default keeps exact semantics. For probabilistic-recall-is-fine
  * corpora, [[Dedup.minhashNearDups]] remains the drop-in alternative —
  * same output contract, banded-LSH candidates.
  */
object Curation {

  /** Returns (doc_id, status) for every input document, status ∈
    * {kept, quality, language, exact_dup, near_dup}.
    */
  def curate(docs: DataFrame, idCol: String, textCol: String, langCol: String,
      minTokens: Int, allowedLangs: Seq[String], fingerprintPrefix: Int,
      nearDupJac: Double, maxShingleDf: Int = Int.MaxValue): DataFrame = {
    val id = col(idCol)
    val staged = docs.select(id,
      (size(TextFns.tokens(col(textCol))) >= minTokens).as("__q_ok"),
      col(langCol).isin(allowedLangs: _*).as("__l_ok"),
      TextFns.prefixFingerprint(col(textCol), fingerprintPrefix).as("__fp"))
    val surv12 = staged.filter(col("__q_ok") && col("__l_ok"))
    val exactKept = surv12
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("__fp")).orderBy(id)))
      .filter(col("__rn") === 1)
      .select(id)
    val nearDrops = Dedup.ngramJaccardPairs(
        docs.join(exactKept, idCol), idCol, textCol, 3, nearDupJac,
        maxShingleDf = maxShingleDf, prefixFilter = true)
      .select(col("id_b").as(idCol)).distinct()
    staged
      .join(exactKept.withColumn("__exact_kept", lit(true)), Seq(idCol), "left")
      .join(nearDrops.withColumn("__near_drop", lit(true)), Seq(idCol), "left")
      .select(id, when(!col("__q_ok"), "quality")
        .when(!col("__l_ok"), "language")
        .when(col("__exact_kept").isNull, "exact_dup")
        .when(col("__near_drop").isNotNull, "near_dup")
        .otherwise("kept").as("status"))
  }

  /** The surviving documents (full rows) for a curate() run. */
  def kept(docs: DataFrame, statuses: DataFrame, idCol: String): DataFrame =
    docs.join(statuses.filter(col("status") === "kept").select(idCol), idCol)
}
