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
    * wide fact tables with selective exclusion sets. */
  def bloomAntiJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      fpp: Double = 0.01): DataFrame = {
    val nItems = math.max(right.count(), 1L)
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
}
