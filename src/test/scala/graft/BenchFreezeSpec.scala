package graft

import org.scalatest.funsuite.AnyFunSuite

/** BENCH_FREEZE contract: closed-round artifacts (…_rNN.jsonl) are
  * write-once; scratch names stay overwritable (r9 judge finding 3 —
  * bench_queries_r08.jsonl was silently replaced by a post-close
  * re-run, blinding round-over-round regression diffs). */
class BenchFreezeSpec extends AnyFunSuite {

  test("existing _rNN.jsonl artifact refuses overwrite; scratch and " +
      "fresh round names pass") {
    val dir = java.nio.file.Files.createTempDirectory("benchfreeze")
    val frozen = dir.resolve("bench_queries_r09.jsonl")
    java.nio.file.Files.write(frozen, "x\n".getBytes("UTF-8"))
    val e = intercept[IllegalStateException] {
      Bench.assertNotFrozen(frozen.toString)
    }
    assert(e.getMessage.contains("write-once"), e.getMessage)
    // a NOT-yet-written round file is fine (that's how a round closes)
    Bench.assertNotFrozen(dir.resolve("bench_queries_r10.jsonl").toString)
    // scratch names never freeze, even when they exist
    val scratch = dir.resolve("bench_queries.jsonl")
    java.nio.file.Files.write(scratch, "x\n".getBytes("UTF-8"))
    Bench.assertNotFrozen(scratch.toString)
    // ab/final-style names without the _rNN suffix stay free too
    val ab = dir.resolve("r10_ab1.jsonl")
    java.nio.file.Files.write(ab, "x\n".getBytes("UTF-8"))
    Bench.assertNotFrozen(ab.toString)
  }
}
