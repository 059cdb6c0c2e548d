package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native codegen MinHash band signatures via one-permutation hashing
  * (Li/Owen/Zhang 2012): each shingle hash routes itself to slot
  * `gram mod numSlots`; the slot keeps the minimum; bands of
  * `bandSize` adjacent slots fold into one 64-bit signature
  * (xxhash64-chained over (slot, present?, min) so an empty slot is
  * unambiguous). Output: `numSlots/bandSize` band signatures.
  *
  * A band with NO present slot yields NULL (callers filter those
  * out): such bands carry zero distinguishing information, and a
  * shared constant signature would bucket every short document with
  * every other — a quadratic trap the row-per-present-slot
  * formulation avoided by construction.
  *
  * This makes the LSH signature build MAP-ONLY from the document
  * scan: the previous formulation exploded the shingle postings and
  * ran TWO groupBy shuffles ((doc,slot) minima, then (doc,band)
  * signatures) — fine while the postings sit in a local cache,
  * quadratically painful at 100 TB where they don't. Band-signature
  * VALUES differ from the old collect_list+hash formulation (any
  * consistent hash works — both sides of the bucket join use the
  * same function); the grouping information (per-band slot minima)
  * is identical, so candidate recall is unchanged and the exact
  * verify keeps the output equal to the exact operator (spec+oracle).
  */
case class MinHashBands(child: Expression, numSlots: Int, bandSize: Int)
  extends UnaryExpression {

  require(numSlots > 0 && bandSize > 0 && numSlots % bandSize == 0,
    s"numSlots ($numSlots) must be a positive multiple of bandSize ($bandSize)")

  private def numBands: Int = numSlots / bandSize

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "minhash_bands"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"minhash_bands requires array<bigint>, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val mins = new Array[Long](numSlots)
    val present = new Array[Boolean](numSlots)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val g = arr.getLong(i)
        val slot = (((g % numSlots) + numSlots) % numSlots).toInt
        if (!present(slot) || g < mins(slot)) { mins(slot) = g; present(slot) = true }
      }
      i += 1
    }
    val out = new Array[Any](numBands)
    var b = 0
    while (b < numBands) {
      var sig = 42L
      var any = false
      var j = 0
      while (j < bandSize) {
        val slot = b * bandSize + j
        sig = XXH64.hashLong(if (present(slot)) 1L else 0L,
          XXH64.hashLong(slot.toLong, sig))
        if (present(slot)) { sig = XXH64.hashLong(mins(slot), sig); any = true }
        j += 1
      }
      out(b) = if (any) java.lang.Long.valueOf(sig) else null
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val xxh = classOf[XXH64].getName
      val gad = classOf[GenericArrayData].getName
      val mins = ctx.freshName("mins")
      val present = ctx.freshName("present")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val g = ctx.freshName("g")
      val slot = ctx.freshName("slot")
      val b = ctx.freshName("b")
      val j = ctx.freshName("j")
      val sig = ctx.freshName("sig")
      val any = ctx.freshName("any")
      s"""
         |long[] $mins = new long[$numSlots];
         |boolean[] $present = new boolean[$numSlots];
         |for (int $i = 0; $i < $arr.numElements(); $i++) {
         |  if (!$arr.isNullAt($i)) {
         |    long $g = $arr.getLong($i);
         |    int $slot = (int) ((($g % $numSlots) + $numSlots) % $numSlots);
         |    if (!$present[$slot] || $g < $mins[$slot]) {
         |      $mins[$slot] = $g; $present[$slot] = true;
         |    }
         |  }
         |}
         |Object[] $out = new Object[$numBands];
         |for (int $b = 0; $b < $numBands; $b++) {
         |  long $sig = 42L;
         |  boolean $any = false;
         |  for (int $j = 0; $j < $bandSize; $j++) {
         |    int $slot = $b * $bandSize + $j;
         |    $sig = $xxh.hashLong($present[$slot] ? 1L : 0L,
         |      $xxh.hashLong((long) $slot, $sig));
         |    if ($present[$slot]) { $sig = $xxh.hashLong($mins[$slot], $sig); $any = true; }
         |  }
         |  $out[$b] = $any ? (Object) Long.valueOf($sig) : null;
         |}
         |${ev.value} = new $gad($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashBands =
    copy(child = newChild)
}
