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
    *
    * LOCAL/HDFS-ONLY: directory rename is atomic there but copy+delete on
    * object stores — use [[publishVersioned]] for the store-agnostic path.
    * A crash between the two moves leaves no live dir; [[recoverSwap]]
    * (run first on every publish) detects that state and rolls the
    * surviving `.old` back, so readers only ever miss the table inside the
    * two-rename window itself, never across restarts.
    */
  def publish(spark: SparkSession, df: DataFrame, dir: String): Unit = {
    recoverSwap(dir)
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

  /** Roll back an interrupted [[publish]]: a missing live dir with a
    * surviving `.old` means the crash fell between the two renames —
    * restore the old generation (the `.next` data survives for forensics
    * until the retried publish overwrites it).
    */
  def recoverSwap(dir: String): Boolean = {
    val dirP = Paths.get(dir)
    val old = Paths.get(dir + ".old")
    if (!Files.exists(dirP) && Files.exists(old)) {
      Files.move(old, dirP, StandardCopyOption.ATOMIC_MOVE)
      true
    } else false
  }

  // ----- Versioned (manifest-pointer) tables --------------------------------
  //
  // Table-format-lite: each publish writes an immutable generation
  // directory `gen-NNNNNNNN/` under the table root and then atomically
  // flips a single `_MANIFEST` pointer file at it. Readers resolve the
  // manifest first, so
  //   - there is NO instant where the table path is missing (the
  //     rename-swap weakness),
  //   - in-flight queries keep reading the generation they resolved
  //     (snapshot isolation) until `vacuum` drops it,
  //   - on an object store the commit is a single-key PUT — the same
  //     primitive Delta/Iceberg metadata commits reduce to (single writer
  //     assumed; concurrent writers additionally need a conditional PUT).

  private val ManifestName = "_MANIFEST"

  /** The live generation name of a versioned table, if one was published. */
  def liveGeneration(table: String): Option[String] = {
    val m = Paths.get(table, ManifestName)
    if (Files.exists(m)) Some(Files.readString(m).trim).filter(_.nonEmpty)
    else None
  }

  /** Publish `df` as the next generation of `table`; returns the
    * generation name. A crash before the manifest flip leaves an orphan
    * generation dir (readers unaffected; the next publish skips past its
    * number and `vacuum` removes it).
    */
  def publishVersioned(spark: SparkSession, df: DataFrame, table: String): String = {
    Files.createDirectories(Paths.get(table))
    val gen = f"gen-${nextGenNumber(table)}%08d"
    df.write.mode("overwrite").parquet(s"$table/$gen")
    val tmp = Paths.get(table, ManifestName + ".tmp")
    Files.writeString(tmp, gen)
    Files.move(tmp, Paths.get(table, ManifestName),
      StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
    gen
  }

  /** The live snapshot of a versioned table. */
  def readVersioned(spark: SparkSession, table: String): DataFrame = {
    val gen = liveGeneration(table).getOrElse(
      sys.error(s"no published generation in $table"))
    spark.read.parquet(s"$table/$gen")
  }

  /** Drop every generation but the live one and the `keepHistory` most
    * recent before it (reader grace / time travel). Returns what was
    * deleted. Generations NEWER than the live pointer (orphans of a
    * publish that crashed before its manifest flip) are dropped
    * immediately; an orphan that later publishes leapfrogged simply ages
    * out as history.
    */
  def vacuum(table: String, keepHistory: Int = 1): Seq[String] = {
    val live = liveGeneration(table)
    val gens = listGenerations(table)
    val keep = (live.toSeq ++
      gens.filter(g => live.forall(g < _)).takeRight(keepHistory)).toSet
    val doomed = gens.filterNot(keep)
    doomed.foreach(g => deleteRecursively(Paths.get(table, g)))
    doomed
  }

  private def listGenerations(table: String): Seq[String] = {
    val root = Paths.get(table)
    if (!Files.exists(root)) Seq.empty
    else {
      val out = Seq.newBuilder[String]
      Files.list(root).forEach { p =>
        val n = p.getFileName.toString
        if (n.startsWith("gen-") && Files.isDirectory(p)) out += n
      }
      out.result().sorted
    }
  }

  private def nextGenNumber(table: String): Long = {
    val fromDirs = listGenerations(table)
      .map(_.stripPrefix("gen-").toLong)
    val fromManifest = liveGeneration(table)
      .map(_.stripPrefix("gen-").toLong)
    ((fromDirs ++ fromManifest) :+ 0L).max + 1
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
