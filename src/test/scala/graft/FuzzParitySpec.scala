package graft

import scala.sys.process._

import org.apache.spark.sql.functions._

import graft.fuzz.QueryFuzz

/** Differential fuzzing against the DuckDB oracle (r10 verdict item
  * 2): N random query shapes (seeded, replayable) run through the SAME
  * machinery as the driver's correctness gate — `QueryFuzz.dump`
  * writes each shape's Spark result parquet + its oracle SQL in the
  * Verify format, and `tools/check_parity.py` hash-compares both
  * sides (row count, column names, order-insensitive value hash, with
  * the driver's exact pandas/pyarrow asymmetry).
  *
  * Seed policy follows the house ScalaCheck convention: a fresh seed
  * per run (logged; override with -Dgraft.sc.seed via forked
  * Test/javaOptions) — any mismatch it ever finds is a real
  * cross-engine bug to fix and pin, not a flake to rerun.
  */
class FuzzParitySpec extends SparkSpec {

  private val N = 220

  test(s"differential fuzz: $N seeded random shapes hash-match DuckDB") {
    val seed = sys.props.get("graft.sc.seed").map(_.toLong)
      .getOrElse(new java.util.Random().nextLong())
    val sf = "/root/testdata/sf0.01"
    val out = tmpDir("fuzzpar")
    info(s"[graft.sc.seed=$seed] dumping $N shapes to $out")
    QueryFuzz.dump(spark, sf, out, seed, N)
    val logBuf = new StringBuilder
    val code = Process(Seq("python3", "tools/check_parity.py", sf, out),
      new java.io.File(".")).!(ProcessLogger(
        l => { logBuf.append(l).append('\n') },
        l => { logBuf.append(l).append('\n') }))
    val log = logBuf.toString
    val failures = log.linesIterator
      .filter(l => l.startsWith("FAIL") || l.startsWith("ERR")).toSeq
    assert(code == 0 && failures.isEmpty,
      s"[graft.sc.seed=$seed] differential fuzz found mismatches:\n" +
        failures.mkString("\n"))
    val passes = log.linesIterator.count(_.startsWith("PASS"))
    assert(passes == N, s"[graft.sc.seed=$seed] expected $N PASS lines, " +
      s"got $passes:\n${log.takeRight(500)}")
  }

  test("fuzzer find, pinned: Spark ROLLUP on empty input omits the " +
      "grand-total row (seed 424242, shapes 61/218)") {
    import spark.implicits._
    // DuckDB / the SQL standard emit the () grouping-set row with
    // count 0 on empty input; Spark emits nothing — on BOTH the
    // DataFrame and SQL surfaces — while its plain global aggregate
    // does emit the 1 row. The fuzz grammar mirrors this with a
    // HAVING COUNT(*) > 0 guard on rollup oracles.
    val empty = Seq(("a", 1)).toDF("k", "v").filter(col("v") > 99)
    assert(empty.rollup(col("k")).agg(count(lit(1)).as("c"))
      .collect().isEmpty)
    empty.createOrReplaceTempView("fuzz_rollup_probe")
    assert(spark.sql(
      "SELECT k, count(*) FROM fuzz_rollup_probe GROUP BY ROLLUP(k)")
      .collect().isEmpty)
    assert(spark.sql("SELECT count(*) FROM fuzz_rollup_probe")
      .collect().length == 1)
    // and the guarded seed replays green end to end
    val sf = "/root/testdata/sf0.001"
    val shape61 = QueryFuzz.gen(spark, sf, 424242L, 61)
    assert(shape61.sql.contains("HAVING COUNT(*) > 0"))
  }

  test("three-way differential: the generated SQL also runs on SPARK " +
      "and matches the DataFrame plan row for row") {
    // the oracle SQL is ANSI enough for two engines: DuckDB (via
    // check_parity) AND Spark's own SQL surface. DataFrame ≡ spark.sql
    // closes the triangle — a mismatch here is a Spark-internal
    // DataFrame-vs-SQL divergence (the empty-ROLLUP find's class) or
    // a fuzzer SQL-rendering bug; either is worth a loud name.
    val sf = "/root/testdata/sf0.01"
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem").foreach { t =>
      spark.read.parquet(s"$sf/$t.parquet").createOrReplaceTempView(t)
    }
    val seed = sys.props.get("graft.sc.seed").map(_.toLong)
      .getOrElse(new java.util.Random().nextLong())
    info(s"[graft.sc.seed=$seed] 120 shapes through both Spark surfaces")
    (0 until 120).foreach { i =>
      val sh = QueryFuzz.gen(spark, sf, seed, i)
      val a = sh.df.collect().map(_.toString).sorted.toSeq
      val b = spark.sql(sh.sql).collect().map(_.toString).sorted.toSeq
      assert(a == b,
        s"[graft.sc.seed=$seed index=$i] DataFrame != spark.sql for:\n${sh.sql}")
    }
  }

  test("fuzz shapes are reproducible from (seed, index)") {
    val a = QueryFuzz.gen(spark, sfDir, seed = 12345L, index = 7)
    val b = QueryFuzz.gen(spark, sfDir, seed = 12345L, index = 7)
    assert(a.sql == b.sql)
    assert(a.df.collect().map(_.toString).sorted.toSeq ==
      b.df.collect().map(_.toString).sorted.toSeq)
    // different index -> (almost surely) different shape
    val c = QueryFuzz.gen(spark, sfDir, seed = 12345L, index = 8)
    assert(c.sql != a.sql)
  }
}
