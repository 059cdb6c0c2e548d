package graft.lakehouse

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic survey data — the reference's datagen
  * (`datagen.py:24-38,64-90`: airport passenger survey rows with id,
  * customer_type, travel_type, departure_delay, baggage_handling,
  * satisfaction), generated distributed from `spark.range` with
  * seeded hashes instead of a single-threaded `random.choice` loop.
  */
object SurveyGen {

  private def pick(h: org.apache.spark.sql.Column, values: Seq[String]) =
    values.zipWithIndex.foldLeft(lit(values.head)) { case (acc, (v, i)) =>
      when(pmod(h, lit(values.size)) === i, lit(v)).otherwise(acc)
    }

  /** `n` survey rows, fully determined by (seed, row index). */
  def generate(spark: SparkSession, n: Long, seed: Int = 42): DataFrame = {
    val h = (salt: Int) => abs(xxhash64(col("idx"), lit(seed), lit(salt)))
    spark.range(n).toDF("idx").select(
      (pmod(h(0), lit(129879L)) + 1).as("id"),
      pick(h(1), Seq("First-time", "Returning")).as("customer_type"),
      pick(h(2), Seq("Personal", "Business")).as("travel_type"),
      pmod(h(3), lit(1600L)).cast("int").as("departure_delay"),
      (pmod(h(4), lit(4L)) + 1).cast("int").as("baggage_handling"),
      pick(h(5), Seq("Neutral or Dissatisfied", "Satisfied")).as("satisfaction"))
  }

  /** Write one CSV "arrival" file (the unit the incremental loader
    * ingests; maps one `datagen_YYYYmmddHHMM.csv` drop). */
  def writeArrival(spark: SparkSession, dir: String, name: String,
                   n: Long, seed: Int): String = {
    val tmp = s"$dir/_tmp_$name"
    generate(spark, n, seed).coalesce(1)
      .write.option("header", "true").mode("overwrite").csv(tmp)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)
    val part = fs.listStatus(new org.apache.hadoop.fs.Path(tmp))
      .find(_.getPath.getName.startsWith("part-")).get.getPath
    val dest = new org.apache.hadoop.fs.Path(s"$dir/$name")
    fs.rename(part, dest)
    fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
    dest.toUri.getPath
  }

  val schema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType.fromDDL(
      "id BIGINT, customer_type STRING, travel_type STRING, " +
        "departure_delay INT, baggage_handling INT, satisfaction STRING")
}
