package graft.streaming

import graft.operators.Envelope
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** S1 — change-event stream sources. The reference's source side is a
  * Debezium binlog connector publishing JSON envelopes to Kafka
  * (reference: connectors/sources/mariadb/trading.json:4-20); the Spark
  * engine consumes any of three equivalent transports:
  *
  *  - Kafka: `kafka` format, value = JSON envelope (production path);
  *  - files: a directory of JSON/parquet envelope batches (replay,
  *    backfill, and air-gapped testing — used here, since this
  *    container has no Kafka);
  *  - MemoryStream (unit tests).
  *
  * All yield the same envelope DataFrame, so the downstream pipeline
  * (unwrap → SMT chain → merge) is transport-agnostic.
  */
object ChangeEventSource {

  /** JSON-envelope schema parser: value string → envelope columns
    * (the `schemas.enable` JSON converter analog, reference:
    * connectors/sources/mariadb/trading.json:68-71).
    */
  def parseJson(raw: DataFrame, rowSchema: StructType, valueCol: String = "value"): DataFrame = {
    val env = Envelope.schemaFor(rowSchema)
    raw.select(from_json(col(valueCol).cast("string"), env).as("e")).select("e.*")
  }

  /** File-based envelope stream over a directory of JSON batches. */
  def jsonDir(spark: SparkSession, dir: String, rowSchema: StructType,
      maxFilesPerTrigger: Int = 16): DataFrame =
    spark.readStream
      .schema(Envelope.schemaFor(rowSchema))
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(dir)

  /** Kafka envelope stream (production transport; requires the Kafka
    * connector jars on the cluster — config-compatible with the
    * reference's topics `<prefix>.<db>.<table>`).
    */
  def kafka(spark: SparkSession, bootstrap: String, topicPattern: String,
      rowSchema: StructType, startingOffsets: String = "earliest"): DataFrame =
    parseJson(
      spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribePattern", topicPattern) // P2 topic-regex subscribe
        .option("startingOffsets", startingOffsets) // T9 replay from earliest
        .load(),
      rowSchema)
}
