package graft.operators

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Plain-parquet warehouse maintenance (no Delta/Iceberg jars in this
  * environment — same operations, file-level): keyed merge/upsert,
  * small-file compaction, and atomic-swap publication.
  *
  * At 100 TB these jobs run per partition (e.g. per station or per day
  * directory), never whole-table; the swap pattern (write new → rename)
  * is atomic on HDFS-like filesystems and must become a metadata commit
  * on object stores (S3 rename is copy+delete) — which is exactly the
  * problem table formats solve; this module keeps the logic engine-side
  * and the layout plain parquet.
  */
object Warehouse {

  /** MERGE / upsert: combine the base table with an updates batch and
    * keep, per key, the greatest row by the `version` column list
    * (compared in order; updates win full ties). Pass enough version
    * columns to make the winner unique — e.g. (ts, event_id) — or ties
    * resolve arbitrarily. The reference's append-only sink + keep-last
    * dedup (D2/S7) expressed as a warehouse maintenance op: one shuffle
    * on the merge keys.
    */
  def mergeByKey(base: DataFrame, updates: DataFrame, keys: Seq[String],
      version: Seq[String]): DataFrame = {
    val tagged = base.withColumn("__src", lit(0))
      .unionByName(updates.withColumn("__src", lit(1)))
    Clean.dedupKeepLast(tagged, keys, version.map(col) :+ col("__src"))
      .drop("__src")
  }

  /** Compaction: rewrite a directory into ~`targetFiles` files (small-file
    * pathology from frequent micro-batch appends). Reads the CURRENT
    * snapshot, writes a new generation dir, atomically swaps.
    */
  def compact(spark: SparkSession, dir: String, targetFiles: Int): Long = {
    val df = spark.read.parquet(dir)
    val n = df.count()
    publish(spark, df.repartition(targetFiles), dir)
    n
  }

  /** Write `df` beside `dir` and atomically swap it into place (write to
    * `<dir>.next`, move old to `<dir>.old`, rename, drop old).
    */
  def publish(spark: SparkSession, df: DataFrame, dir: String): Unit = {
    val next = dir + ".next"
    val old = dir + ".old"
    df.write.mode("overwrite").parquet(next)
    val dirP = Paths.get(dir)
    if (Files.exists(dirP)) {
      Files.move(dirP, Paths.get(old), StandardCopyOption.ATOMIC_MOVE)
    }
    Files.move(Paths.get(next), dirP, StandardCopyOption.ATOMIC_MOVE)
    deleteRecursively(Paths.get(old))
  }

  /** A8-style snapshot check: rows in the directory. */
  def snapshotCount(spark: SparkSession, dir: String): Long =
    spark.read.parquet(dir).count()

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))
    }
}
