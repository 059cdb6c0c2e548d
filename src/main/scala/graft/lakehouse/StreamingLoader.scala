package graft.lakehouse

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Structured-Streaming incremental ingestion — the always-on form of
  * `IncrementalLoader`. The file source's checkpoint IS the load
  * registry: each CSV drop in `srcDir` is ingested exactly once into
  * the parquet table, across restarts. `Trigger.AvailableNow` drains
  * everything pending and stops — the scheduled-batch operating mode
  * of the reference's polling loop (`check_lakehouse.py:100-125`),
  * without the mtime race.
  */
object StreamingLoader {

  /** Start one drain-everything-available ingestion run. */
  def runAvailableNow(spark: SparkSession, srcDir: String, tableDir: String,
                      checkpointDir: String, schema: StructType): StreamingQuery =
    spark.readStream
      .schema(schema)
      .option("header", "true")
      .csv(srcDir)
      .writeStream
      .format("parquet")
      .option("path", tableDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
