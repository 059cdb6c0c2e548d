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
