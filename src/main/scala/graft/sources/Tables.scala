package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table registry over a scale-factor directory
  * (/root/testdata/sf*). One parquet file per table; at 100 TB the same
  * call reads a partitioned parquet/iceberg directory — nothing else
  * changes because all downstream operators are declarative.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "region")
  /** events.ts is parquet TIMESTAMP(NANOS); Spark reads it as long under
    * `spark.sql.legacy.parquet.nanosAsLong` — convert to a micros
    * timestamp (integer division: ns epoch values overflow double
    * precision). DuckDB's `CAST(ts AS TIMESTAMP)` truncates identically.
    */
  /** All engine-facing timestamps are TIMESTAMP_NTZ (naive UTC wall
    * clock) — the same semantics DuckDB's TIMESTAMP has, so oracle
    * results compare bit-for-bit.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val df = apply(spark, dir, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")).cast("timestamp_ntz"))
      case _ => df
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "embeddings")
}
