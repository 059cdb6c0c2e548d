package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression: DISTINCT 64-bit word-trigram shingle
  * hashes of a tokenized document, in one generated loop.
  *
  * `trigram_hashes(words)` ≡ what the dedup pipeline previously
  * assembled from posexplode → xxhash64 per word → two `lead` windows
  * → re-hash → distinct → count-window: per-word xxhash64 (seed 42,
  * identical to the built-in), a rolling 3-word combine
  * (`xxhash64(h0, h1, h2)`'s seed-chained fold), and per-document
  * dedup. Emitting the distinct shingle array IN-ROW removes all
  * three shuffles (lead window, distinct, per-doc count) from the
  * near-dup pipeline's build phase — at 100 TB that is the difference
  * between a map-only scan and three full-data exchanges.
  */
case class TrigramHashes(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "trigram_hashes"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"trigram_hashes requires array<string>, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n < 3) return new GenericArrayData(Array.empty[Long])
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) {
      hs(i) = if (arr.isNullAt(i)) 42L
        else XXH64.hashUTF8String(arr.getUTF8String(i), 42L)
      i += 1
    }
    val seen = new java.util.HashSet[java.lang.Long]()
    val out = new Array[Long](n - 2)
    var m = 0
    i = 0
    while (i <= n - 3) {
      val g = XXH64.hashLong(hs(i + 2),
        XXH64.hashLong(hs(i + 1), XXH64.hashLong(hs(i), 42L)))
      if (seen.add(g)) { out(m) = g; m += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, m))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val xxh = classOf[XXH64].getName
      val gad = classOf[GenericArrayData].getName
      val n = ctx.freshName("n")
      val hs = ctx.freshName("hs")
      val seen = ctx.freshName("seen")
      val out = ctx.freshName("out")
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val g = ctx.freshName("g")
      s"""
         |int $n = $arr.numElements();
         |if ($n < 3) {
         |  ${ev.value} = new $gad(new long[0]);
         |} else {
         |  long[] $hs = new long[$n];
         |  for (int $i = 0; $i < $n; $i++) {
         |    $hs[$i] = $arr.isNullAt($i) ? 42L
         |      : $xxh.hashUTF8String($arr.getUTF8String($i), 42L);
         |  }
         |  java.util.HashSet<Long> $seen = new java.util.HashSet<Long>();
         |  long[] $out = new long[$n - 2];
         |  int $m = 0;
         |  for (int $i = 0; $i <= $n - 3; $i++) {
         |    long $g = $xxh.hashLong($hs[$i + 2],
         |      $xxh.hashLong($hs[$i + 1], $xxh.hashLong($hs[$i], 42L)));
         |    if ($seen.add($g)) { $out[$m++] = $g; }
         |  }
         |  ${ev.value} = new $gad(java.util.Arrays.copyOf($out, $m));
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): TrigramHashes =
    copy(child = newChild)
}
