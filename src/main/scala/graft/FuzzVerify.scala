package graft

import org.apache.spark.sql.SparkSession

/** Standalone fuzz-dump driver: generate N random query shapes and
  * dump them in the Verify format, for `tools/check_parity.py` to
  * hash-compare against DuckDB.
  *
  *   sbt "runMain graft.FuzzVerify /root/testdata/sf0.01 /tmp/fz 200 42"
  *   python3 tools/check_parity.py /root/testdata/sf0.01 /tmp/fz
  */
object FuzzVerify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    val n = if (args.length > 2) args(2).toInt else 200
    val seed = if (args.length > 3) args(3).toLong
      else new java.util.Random().nextLong()
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println(s"[fuzz] seed=$seed n=$n sfDir=$sfDir")
    fuzz.QueryFuzz.dump(spark, sfDir, outDir, seed, n)
    spark.stop()
  }
}
