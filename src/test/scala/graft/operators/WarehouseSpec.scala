package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class WarehouseSpec extends SparkSpec {

  test("mergeByKey: updates win by version, ties go to the updates side") {
    import spark.implicits._
    val base = Seq(("S1", 1L, 10.0), ("S2", 1L, 20.0), ("S3", 1L, 30.0))
      .toDF("station_id", "version", "temperature")
    val updates = Seq(("S1", 2L, 11.0),  // newer version → replaces
      ("S2", 1L, 99.0),                  // same version → updates side wins
      ("S4", 1L, 40.0))                  // new key → inserted
      .toDF("station_id", "version", "temperature")
    val merged = Warehouse.mergeByKey(base, updates, Seq("station_id"), Seq("version"))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(merged == Map("S1" -> 11.0, "S2" -> 99.0, "S3" -> 30.0, "S4" -> 40.0))
  }

  test("compact + publish: same rows, fewer files, old generation cleaned") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-wh-compact").toString + "/t"
    // simulate micro-batch small-file pathology: 8 appends of 5 rows
    (0 until 8).foreach { b =>
      (0 until 5).map(i => (b * 5 + i, s"v$b-$i")).toDF("id", "v")
        .repartition(2).write.mode("append").parquet(dir)
    }
    val filesBefore = new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(filesBefore >= 8)
    val n = Warehouse.compact(spark, dir, targetFiles = 2)
    assert(n == 40)
    val filesAfter = new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(filesAfter <= 2)
    assert(Warehouse.snapshotCount(spark, dir) == 40)
    assert(!new java.io.File(dir + ".old").exists())
    assert(!new java.io.File(dir + ".next").exists())
  }
}
