package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StreamPipeline

/** Runnable end-to-end demo of the streaming pipeline (the runtime surface
  * of graft.streaming): wire JSON through a MemoryStream source → parse →
  * per-key monotonic dedup (checkpointed state) → hourly keep-last prep →
  * parquet warehouse append, across two micro-batches with a replay and an
  * out-of-order record in the second. Prints the warehouse after each batch.
  *
  * Usage: sbt "runMain graft.StreamDemo"
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    implicit val spark = GraftSession.getOrCreate()
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val warehouse = Files.createTempDirectory("graft-demo-wh").toString
    val checkpoint = Files.createTempDirectory("graft-demo-ck").toString

    val mem = MemoryStream[String]
    val wire = mem.toDF().select(col("value"))

    def rec(st: String, ts: String, temp: Double) =
      s"""{"station_id":"$st","station_name":"demo $st","latitude":60.17,""" +
        s""""longitude":24.94,"elevation":19.0,"timestamp":"$ts","temperature":$temp,""" +
        s""""humidity":55.0,"wind_speed":4.0}"""

    def runBatch(label: String, batch: Seq[String]): Unit = {
      mem.addData(batch)
      StreamPipeline.writeHourly(wire, warehouse, checkpoint,
        Trigger.AvailableNow()).awaitTermination()
      println(s"=== warehouse after $label ===")
      spark.read.parquet(warehouse).orderBy("station_id", "timestamp")
        .show(20, truncate = false)
    }

    runBatch("batch 1 (two readings in one hour -> keep-last)", Seq(
      rec("101104", "2024-06-01T10:00:00Z", 12.4),
      rec("101104", "2024-06-01T10:10:00Z", 12.9),
      rec("100971", "2024-06-01T10:00:00Z", 11.8)))

    runBatch("batch 2 (replay + out-of-order dropped by watermark, new hour passes)", Seq(
      rec("101104", "2024-06-01T10:10:00Z", 99.0), // replay → dropped
      rec("101104", "2024-06-01T09:00:00Z", 99.0), // older → dropped
      rec("101104", "2024-06-01T11:00:00Z", 13.3))) // newer → appended

    println(s"rows persisted >= 3: " +
      StreamPipeline.verifyRowPersistence(spark, warehouse, 3))
    spark.stop()
  }
}
