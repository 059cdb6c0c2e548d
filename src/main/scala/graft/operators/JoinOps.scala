package graft.operators

import java.io.ByteArrayOutputStream
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.BinaryType

/** Join-optimization building blocks. */
object JoinOps {

  /** Anti-join with a Bloom pre-filter.
    *
    * A plain `left_anti` shuffles (or at best probes) EVERY left row.
    * Here the right side's keys are sketched into a Bloom filter
    * (`fpp` false-positive rate) evaluated through Spark's native
    * `BloomFilterMightContain` predicate — inside codegen, against a
    * broadcast-sized binary literal:
    *
    *  - bloom-NEGATIVE rows provably have no match → emitted directly,
    *    skipping the join entirely (at 100 TB that is most of the
    *    fact table skipping the shuffle);
    *  - bloom-positive rows (true matches + ~fpp false positives) and
    *    null-key rows go through the real anti-join, which removes
    *    the false positives.
    *
    * Output is exactly `left.join(right, leftKey === rightKey,
    * "left_anti")`. The left side is read twice (two branches of the
    * union) — a bargain against shuffling it once whenever the scan
    * is cheaper than the exchange, which is the normal case for
    * wide fact tables with selective exclusion sets.
    *
    * Pass `expectedNumItems` (an upper bound is fine — it only sizes
    * the filter) to skip the sizing `count()` and build the bloom in
    * a single pass over the right side. */
  def bloomAntiJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      fpp: Double = 0.01,
      expectedNumItems: Option[Long] = None): DataFrame = {
    val nItems = math.max(expectedNumItems.getOrElse(right.count()), 1L)
    val bf = right.stat.bloomFilter(rightKey, nItems, fpp)
    val bytes = { val bos = new ByteArrayOutputStream(); bf.writeTo(bos); bos.toByteArray }
    val might: Column = Bridge.column(BloomFilterMightContain(
      Literal.create(bytes, BinaryType),
      Bridge.expression(col(leftKey).cast("long"))))
    val anti = left.filter(col(leftKey).isNull || might)
      .join(right, col(leftKey) === col(rightKey), "left_anti")
    val definiteKeep = left.filter(col(leftKey).isNotNull && !might)
    anti.union(definiteKeep)
  }

  /** Banded range join: `left ⋈ right ON r ∈ [l + lower, l + upper]`
    * with NO equi key — the shape Spark can only plan as a
    * broadcast-nested-loop (every left row against every right row).
    * Banding recovers a hash join: with band width w = upper − lower,
    * a matching right value's bucket `floor(r/w)` can only be one of
    * the (two) buckets covering `[l+lower, l+upper]`, so the left
    * side explodes to those buckets, the join runs as an EQUI join on
    * the bucket id, and the exact range predicate filters inside the
    * join stage. Shuffle volume: ≤2× left + 1× right, vs the nested
    * loop's |left|·|right| comparisons. (The as-of join covers the
    * "latest earlier" case; this is the all-matches-in-window case —
    * funnels, attribution, co-occurrence.) Columns `lCol`/`rCol` must
    * be numeric (epoch seconds/micros for time). */
  def bandedRangeJoin(left: DataFrame, right: DataFrame,
      lCol: String, rCol: String, lower: Long, upper: Long): DataFrame = {
    require(upper > lower, s"empty band [$lower, $upper]")
    val w = upper - lower
    val l2 = left.withColumn("_lb", explode(sequence(
      floor((col(lCol) + lower).cast("double") / w).cast("long"),
      floor((col(lCol) + upper).cast("double") / w).cast("long"))))
    val r2 = right.withColumn("_rb",
      floor(col(rCol).cast("double") / w).cast("long"))
    l2.join(r2, col("_lb") === col("_rb") &&
        col(rCol) >= col(lCol) + lower && col(rCol) <= col(lCol) + upper)
      .drop("_lb", "_rb")
  }

  /** Salted equi-join for skewed keys.
    *
    * When one key carries a disproportionate share of `left`, the
    * plain shuffle sends that whole share to ONE reducer. Salting
    * splits it `salts` ways: each left row gets a uniform salt, the
    * (smaller) right side is replicated once per salt value, and the
    * join runs on (key, salt) — the hot key's rows now spread across
    * `salts` reducers. Inner-join semantics are unchanged (every left
    * row still meets every matching right row exactly once, under its
    * own salt). AQE's skew-join handles moderate skew adaptively;
    * explicit salting is for the pathological key that exceeds a
    * single executor even after AQE splits, at the cost of a
    * `salts`× replication of the right side. */
  def saltedJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String, salts: Int): DataFrame = {
    val salted = left.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts)).cast("int"))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated,
        salted(leftKey) === replicated(rightKey) &&
          salted("__salt") === replicated("__salt"))
      .drop("__salt")
  }
}
