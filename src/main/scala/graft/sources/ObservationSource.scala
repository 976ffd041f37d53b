package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

import graft.operators.Clean
import graft.schema.Observation

/** Batch observation sources (SURVEY.md §2.1 S1/S2).
  *
  * The reference's S1 is a per-station HTTP point lookup over a 6-station
  * whitelist (`/root/reference/src/data_processing/fmi_client.py:112-149`)
  * — a driver-side, tiny-cardinality fetch. In a distributed engine that
  * is modeled as a small in-memory Dataset ([[fromRecords]]), never a
  * parallelized scan: the data lives behind a rate-limited API and fits in
  * one task. S2 is the JSON fixture scan with an EXPLICIT schema — never
  * schema inference, which at 100 TB means a full extra pass and
  * non-deterministic typing.
  */
object ObservationSource {

  /** S2 — schema-given JSON scan, coerced to the warehouse schema
    * (`fmi_client.py:139-142`). Accepts JSONL or multiline arrays.
    */
  def fromJson(spark: SparkSession, path: String,
      multiLine: Boolean = false): DataFrame =
    Clean.coerceToSchema(
      spark.read.schema(Observation.wireSchema)
        .option("multiLine", multiLine.toString).json(path),
      Observation.schema)

  /** S1 — API fetch results as a typed lookup Dataset
    * (`fmi_client.py:112-130` per-station lookups; failed stations are
    * simply absent, matching the reference's drop-on-error).
    */
  def fromRecords(spark: SparkSession,
      records: Seq[Observation]): Dataset[Observation] = {
    import spark.implicits._
    spark.createDataset(records)
  }
}
