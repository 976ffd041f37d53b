package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** Embedding similarity search over an `array<float>` column.
  *
  *   - [[cosine]] / [[cosineExact]] — pairwise cosine as pure Catalyst
  *     expressions (`zip_with` + `aggregate`), no UDFs, codegen-friendly.
  *     The exact variant accumulates through DECIMAL so the result is
  *     independent of evaluation order and bit-reproducible in the DuckDB
  *     oracle; the double variant is the fast path.
  *   - [[knnExact]] — brute-force top-k: broadcast the (small) query set
  *     against the corpus, per-query window top-k. The corpus is scanned
  *     once, embarrassingly parallel — the right baseline at any scale
  *     where queries ≪ corpus.
  *   - [[knnLsh]] / [[nearDupLsh]] — random-hyperplane LSH: bucket by the
  *     sign pattern of `nPlanes` fixed pseudo-random hyperplanes (seeded
  *     from the cross-engine h60 so buckets are deterministic), join on the
  *     bucket, rank inside. This is the 100 TB path: candidate cost scales
  *     with bucket occupancy, not |corpus| × |queries|.
  */
object Similarity {

  /** Order-independent, cross-engine-exact cosine between float-array
    * columns, via integer quantization: each component is rounded to a
    * 1e-7 grid (beyond float precision), making every product an
    * integer-valued double ≤ 1e14 and every 64-term sum ≤ 6.4e15 < 2^53 —
    * all exact in IEEE double, so neither partitioning, fold order, nor
    * engine can perturb the result. Final division/sqrt are single scalar
    * IEEE ops (deterministic everywhere).
    */
  def cosineExact(a: Column, b: Column): Column = {
    def qdot(x: Column, y: Column): Column =
      aggregate(
        zip_with(x, y, (p, q) =>
          round(p.cast("double") * lit(1e7)) * round(q.cast("double") * lit(1e7))),
        lit(0.0), (acc, v) => acc + v)
    qdot(a, b) / sqrt(qdot(a, a) * qdot(b, b))
  }

  /** Fast double-accumulated cosine (bench path; last-ulp order-dependent). */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    dot(a, b) / sqrt(dot(a, a) * dot(b, b))
  }

  /** Brute-force exact cosine top-k: for each row of `queries` (small,
    * broadcast), the `k` nearest corpus rows (excluding self-matches on
    * `idCol`). Returns (query_id, id, cos) ranked by (cos desc, id).
    */
  def knnExact(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, exact: Boolean = true): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
    val cosF: (Column, Column) => Column = if (exact) cosineExact else cosine
    val scored = corpus.select(col(idCol).as("id"), col(vecCol).as("__cv"))
      .join(broadcast(q), col("query_id") =!= col("id"))
      .withColumn("cos", cosF(col("__qv"), col("__cv")))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("id"))
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select("query_id", "id", "cos")
  }

  /** Deterministic pseudo-random hyperplanes: coefficient (p, d) is derived
    * from h60(s"plane:p:d"), mapped to [-0.5, 0.5). Returned as a literal
    * array-of-arrays column so the dot products stay in codegen.
    */
  private def hyperplanes(nPlanes: Int, dim: Int): Seq[Seq[Double]] =
    (0 until nPlanes).map { p =>
      (0 until dim).map { d =>
        (Hashing.h60Local(s"plane:$p:$d") % 1000000L).toDouble / 1000000.0 - 0.5
      }
    }

  /** Sign-pattern LSH bucket id for a vector column. */
  def lshBucket(vec: Column, nPlanes: Int, dim: Int): Column = {
    val planes = hyperplanes(nPlanes, dim)
    val bits = planes.zipWithIndex.map { case (plane, p) =>
      val planeCol = array(plane.map(lit): _*)
      val dot = aggregate(zip_with(vec, planeCol, (v, c) => v.cast("double") * c),
        lit(0.0), (acc, x) => acc + x)
      when(dot >= 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Approximate top-k: candidates share the query's LSH bucket; rank by
    * exact cosine inside the bucket. Lower `nPlanes` → bigger buckets →
    * higher recall and higher cost. At 100 TB, bucket the corpus once
    * (write.partitionBy(bucket)) and prune at read time.
    */
  def knnLsh(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nPlanes: Int, dim: Int): DataFrame = {
    val bucket = lshBucket(col(vecCol), nPlanes, dim)
    val c = corpus.select(col(idCol).as("id"), col(vecCol).as("__cv"), bucket.as("__bkt"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"), bucket.as("__bkt"))
    val scored = c.join(broadcast(q), Seq("__bkt"))
      .filter(col("query_id") =!= col("id"))
      .withColumn("cos", cosineExact(col("__qv"), col("__cv")))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("id"))
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select("query_id", "id", "cos")
  }

  /** Exact embedding near-duplicate pairs: all (a, b), a < b, with cosine
    * ≥ minCos. Quadratic in corpus size — the correctness baseline. The
    * scale path is [[nearDupLsh]].
    */
  def nearDupExact(corpus: DataFrame, idCol: String, vecCol: String,
      minCos: Double): DataFrame = {
    val v = corpus.select(col(idCol).as("id"), col(vecCol).as("__v"))
    v.as("a").join(v.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        cosineExact(col("a.__v"), col("b.__v")).as("cos"))
      .filter(col("cos") >= minCos)
  }

  /** LSH-pruned near-duplicate pairs: only pairs sharing a bucket are
    * scored. Deterministic given the fixed hyperplanes; recall < 1 by
    * design (raise by lowering nPlanes or adding band rotations).
    */
  def nearDupLsh(corpus: DataFrame, idCol: String, vecCol: String,
      minCos: Double, nPlanes: Int, dim: Int): DataFrame = {
    val v = corpus.select(col(idCol).as("id"), col(vecCol).as("__v"),
      lshBucket(col(vecCol), nPlanes, dim).as("__bkt"))
    v.as("a").join(v.as("b"),
        col("a.__bkt") === col("b.__bkt") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        cosineExact(col("a.__v"), col("b.__v")).as("cos"))
      .filter(col("cos") >= minCos)
  }
}
