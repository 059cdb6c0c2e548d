package graft

import java.util.concurrent.CyclicBarrier

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.lakehouse.{Automation, IncrementalLoader, LoadRegistry, SurveyGen, VersionedTable}

/** Round-9 registry-consistency model property: random interleavings
  * of the three ingestion actors — a LEASE-HOLDING daemon tick, a
  * lease-less OPTIMISTIC loader, and a BRANCH-GATED loader (stage →
  * publish-or-discard) — race the same source dir, table, and
  * registry. The in-memory model is just the multiset of dropped
  * rows: whatever the interleaving, every dropped file's rows must
  * land EXACTLY ONCE and the registry must carry exactly one `ok`
  * record per path. This is the AtomicPut/catalog property discipline
  * applied to the ingestion layer (round-8 made `LoadRegistry.record`
  * and the optimistic commit race-safe with targeted specs; this
  * drives the COMPOSITION). */
class RegistryConsistencySpec extends SparkSpec {

  private def check(p: Prop, cases: Int): Unit = {
    val seed = sys.props.get("graft.sc.seed").map(_.toLong)
      .getOrElse(new java.util.Random().nextLong())
    val res = SCTest.check(
      SCTest.Parameters.default
        .withMinSuccessfulTests(cases)
        .withMaxDiscardRatio(10f)
        .withInitialSeed(org.scalacheck.rng.Seed(seed)),
      p)
    assert(res.passed, s"[graft.sc.seed=$seed] ${res.status.toString}")
  }

  // one wave: which files drop before it, which actors race during it,
  // and what happens to a staged branch afterwards
  private case class Wave(drops: Seq[Int], actors: Seq[String],
      publishBranch: Boolean)

  private val genWave: Gen[Wave] = for {
    nDrops <- Gen.chooseNum(0, 2)
    drops <- Gen.listOfN(nDrops, Gen.chooseNum(5, 40))
    actors <- Gen.someOf("tick", "optimistic", "branch").map(_.toSeq)
      .suchThat(_.nonEmpty)
    publish <- Gen.oneOf(true, false)
  } yield Wave(drops, actors, publish)

  private val genCase: Gen[List[Wave]] =
    Gen.chooseNum(1, 3).flatMap(Gen.listOfN(_, genWave))

  test("property: tick + optimistic + branch-gated loaders interleaved " +
      "randomly -> every dropped row lands exactly once, registry ok " +
      "exactly once per path") {
    val prop = Prop.forAll(genCase) { waves =>
      val root = tmpDir("regprop")
      val src = s"$root/arrivals"; val tbl = s"$root/t"
      val reg = s"$root/reg"
      new java.io.File(src).mkdirs()
      // branch-gated loading runs on a VERSIONED table (createBranch
      // needs a committed base); run()/tick() are version-aware and
      // publish into the current version — seed an empty v0 so all
      // three actors compose on one layout
      VersionedTable.commit(spark, tbl, keepVersions = 10) { dir =>
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          SurveyGen.schema).coalesce(1).write.parquet(dir)
      }
      val cfg = Automation.Config(
        srcDir = src, tableDir = tbl, registryDir = reg,
        generate = false,
        lease = Some(Automation.LeaseConfig(s"$root/lease",
          ttlMs = 60000)))
      val daemon = new Automation(spark, cfg)
      var dropped = 0L
      var fileNo = 0
      waves.foreach { w =>
        w.drops.foreach { n =>
          fileNo += 1
          SurveyGen.writeArrival(spark, src, s"d$fileNo.csv", n,
            seed = fileNo)
          dropped += n
        }
        val barrier = new CyclicBarrier(w.actors.size)
        val errs =
          new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
        val threads = w.actors.map { a =>
          new Thread(() => {
            barrier.await()
            try a match {
              case "tick" => daemon.tick()
              case "optimistic" =>
                IncrementalLoader.run(spark, src, tbl, reg,
                  SurveyGen.schema, optimistic = true)
              case "branch" =>
                IncrementalLoader.runToBranch(spark, src, tbl, reg,
                  SurveyGen.schema)
            } catch { case e: Throwable => errs.add(e) }
          })
        }
        threads.foreach(_.start()); threads.foreach(_.join())
        assert(errs.isEmpty,
          s"actor crashed: ${Option(errs.peek()).map(_.toString)}")
        // a branch only exists once runToBranch saw fresh files
        if (w.actors.contains("branch") &&
            VersionedTable.branches(spark, tbl).contains("ingest")) {
          if (w.publishBranch) {
            // when a concurrent loader advanced main past the branch
            // base, publish REFUSES (loudly, by design — force would
            // erase main's commits); the documented recovery is
            // discard → the files return to the fresh pool and the
            // next pass reloads them
            try IncrementalLoader.publishStagedBranch(spark, tbl, reg)
            catch { case _: IllegalArgumentException =>
              IncrementalLoader.discardStagedBranch(spark, tbl, reg)
            }
          } else
            IncrementalLoader.discardStagedBranch(spark, tbl, reg)
        }
      }
      // serial catch-up: discarded-branch paths must reload; after this
      // EVERYTHING settles
      IncrementalLoader.run(spark, src, tbl, reg, SurveyGen.schema)
      val landed = VersionedTable.read(spark, tbl).count()
      val okPerPath = LoadRegistry.read(spark, reg)
        .filter(col("status") === LoadRegistry.StatusOk)
        .groupBy("path").count().collect().map(_.getLong(1))
      val exactlyOnce = okPerPath.forall(_ == 1L)
      if (landed != dropped || !exactlyOnce)
        println(s"VIOLATION: dropped=$dropped landed=$landed " +
          s"okPerPath=${okPerPath.toSeq} waves=$waves")
      landed == dropped && exactlyOnce
    }
    check(prop, cases = 8)
  }
}
