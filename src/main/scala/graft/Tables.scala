package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided parquet lakehouse tables
  * (TESTDATA.md). One parquet file-set per table under `$dir/`.
  *
  * At 100 TB these would be partitioned/bucketed table roots; the
  * loader stays a plain `spark.read.parquet` so Catalyst gets full
  * pushdown/pruning into the scan.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** `events.parquet` has shipped with two `ts` encodings across
    * driver revisions: TIMESTAMP(NANOS) (which Spark's parquet reader
    * rejects — read nanos as long, integer-`div` to micros; a double
    * roundtrip would lose precision on int64 nanos) and plain
    * TIMESTAMP(MICROS) with isAdjustedToUTC=false (read as
    * TIMESTAMP_NTZ). Both normalize to TimestampType; every session
    * here pins `spark.sql.session.timeZone=UTC`, so the NTZ cast is
    * the same wall=instant mapping DuckDB's naive oracle uses. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampType => raw
      case _ => raw.withColumn("ts", col("ts").cast("timestamp"))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
