package graft.lakehouse

import java.util.concurrent.atomic.AtomicBoolean
import org.apache.spark.sql.SparkSession

/** The continuously-running automation daemon — the reference's two
  * long-lived processes folded into one schedulable loop:
  *
  *  - `datagen.py:129-133`: `schedule.every(1).minutes` → `make_data`
  *    (write a CSV drop) and `schedule.every(1).hours` → `delete_data`
  *    (retention on the drop dir);
  *  - `check_lakehouse.py:96-127`: `UpdateLakehouse.run` — an
  *    interval-polling thread that detects new files, loads them into
  *    the lakehouse, and records every attempt in the registry, with
  *    signal-driven clean shutdown.
  *
  * One [[Automation.tick]] = generate (optional) → detect+load
  * (registry-deduped, crash-idempotent [[IncrementalLoader]]) →
  * retention every `retainEvery` ticks. [[Automation.runLoop]] is the
  * daemon entry (interval sleep, stop flag, bounded tick count for
  * tests); `Automation.main` wires a SparkSession, a shutdown hook
  * (SIGTERM → finish the current tick, then exit), and a per-tick
  * report line.
  *
  * Scale posture: every tick's work is a distributed job over only
  * the NEW files (discovery is a metadata listing; the registry read
  * is a tiny parquet scan), so the daemon's steady-state cost is
  * independent of table size.
  */
class Automation(spark: SparkSession, cfg: Automation.Config) {

  private val stopRequested = new AtomicBoolean(false)
  private var ticks = 0L

  /** Stable identity for this daemon instance in lease contention. */
  private val daemonId =
    s"${java.net.InetAddress.getLocalHost.getHostName}-" +
      s"${java.lang.ProcessHandle.current().pid()}-" +
      java.util.UUID.randomUUID().toString.take(8)

  /** One scheduler cycle. Generate is first (mirroring the separate
    * datagen process) so a tick's own drop is picked up by its load
    * pass, like the reference's minute-aligned schedules.
    *
    * With `Config.lease` set, the whole cycle runs under a TTL writer
    * lease ([[Lease]]): a second daemon's concurrent tick SKIPS
    * (`leaseSkipped = true`, nothing written, no history row) instead
    * of tripping the commit protocol's loud conflict detection — both
    * daemons' loads still land exactly once, each under its own held
    * tick, because the registry dedups paths across holders. */
  def tick(): Automation.TickReport = {
    cfg.lease match {
      case None => tickHeld()
      case Some(l) =>
        val fs = org.apache.hadoop.fs.FileSystem.get(
          new java.net.URI(l.leaseDir),
          spark.sparkContext.hadoopConfiguration)
        val lp = new org.apache.hadoop.fs.Path(l.leaseDir, "_tick_lease")
        if (!Lease.acquire(fs, lp, daemonId, l.ttlMs)) {
          ticks += 1 // cadences stay wall-clock-aligned across skips
          Automation.TickReport(ticks, None,
            IncrementalLoader.LoadResult(Nil, Nil, Nil), Nil,
            leaseSkipped = true)
        } else try tickHeld() finally Lease.release(fs, lp, daemonId)
    }
  }

  private def tickHeld(): Automation.TickReport = {
    ticks += 1
    val tickStartNanos = System.nanoTime()
    val generated = if (cfg.generate) {
      val stamp = java.time.format.DateTimeFormatter
        .ofPattern("yyyyMMddHHmmss")
        .format(java.time.LocalDateTime.now(java.time.ZoneOffset.UTC))
      Some(SurveyGen.writeArrival(spark, cfg.srcDir,
        s"datagen_${stamp}_$ticks.csv", cfg.rowsPerDrop,
        seed = cfg.seedBase + ticks.toInt))
    } else None
    val load = cfg.branchGate match {
      // whole-LOAD gate: stage every fresh drop on one branch, audit
      // the UNION (cross-batch checks per-drop audits can't express —
      // tick-level row floors, reconciliation), publish once or
      // discard (released files retry next tick). Needs a VERSIONED
      // committed base — a flat (pre-versioning) table takes the
      // plain path below until it is migrated.
      case Some(checks)
          if VersionedTable.currentVersion(spark, cfg.tableDir).isDefined =>
        val r = IncrementalLoader.runToBranch(spark, cfg.srcDir,
          cfg.tableDir, cfg.registryDir, SurveyGen.schema)
        if (r.loaded.isEmpty) r
        else {
          val bad = DataQuality.violations(
            VersionedTable.readBranch(spark, cfg.tableDir, "ingest"),
            checks)
          if (bad.isEmpty) {
            IncrementalLoader.publishStagedBranch(spark, cfg.tableDir,
              cfg.registryDir, keepVersions = cfg.loadKeepVersions)
            r
          } else {
            // the whole load is held back: nothing published, nothing
            // folds downstream; files return to the pool (reported
            // as failed = transient, retried)
            val released = IncrementalLoader.discardStagedBranch(spark,
              cfg.tableDir, cfg.registryDir)
            r.copy(loaded = Nil, failed = r.failed ++ released)
          }
        }
      case _ =>
        IncrementalLoader.run(spark, cfg.srcDir, cfg.tableDir,
          cfg.registryDir, SurveyGen.schema,
          audit =
            if (cfg.auditChecks.isEmpty) None
            else Some(DataQuality.violations(_, cfg.auditChecks)),
          keepVersions = cfg.loadKeepVersions)
    }
    // fold ONLY the freshly loaded rows into the maintained views —
    // the dashboard the reference recomputes per refresh, maintained
    // incrementally (merge cost = touched keys / sketch size, never
    // table size)
    val freshRows =
      if (load.loaded.isEmpty ||
        (cfg.aggView.isEmpty && cfg.freqSketch.isEmpty &&
          cfg.quantView.isEmpty && cfg.setSketch.isEmpty)) None
      else {
        // delta tables keep each batch's file in its own version dir —
        // resolve through the manifest refs, not the current dir
        val isDelta = VersionedTable.currentVersion(spark, cfg.tableDir)
          .exists(v => VersionedTable.filesOf(spark, cfg.tableDir, v).nonEmpty)
        val paths =
          if (isDelta) {
            val refs = VersionedTable.currentFiles(spark, cfg.tableDir)
            load.loaded.flatMap(f => refs
              .find(_.endsWith(s"/${IncrementalLoader.publishedName(f)}"))
              .map(r => s"${cfg.tableDir}/$r"))
          } else {
            val live = VersionedTable.currentPath(spark, cfg.tableDir)
            load.loaded.map(f =>
              s"$live/${IncrementalLoader.publishedName(f)}")
          }
        Some(spark.read.parquet(paths: _*))
      }
    cfg.aggView.foreach { av => freshRows.foreach(f =>
      MaterializedAgg.update(spark, av.root, f, av.spec)) }
    cfg.freqSketch.foreach { fs => freshRows.foreach(f =>
      SketchView.update(spark, fs.root, f, fs.spec)) }
    cfg.quantView.foreach { qv => freshRows.foreach(f =>
      QuantileView.update(spark, qv.root, f, qv.spec)) }
    cfg.setSketch.foreach { ss => freshRows.foreach(f =>
      graft.operators.SetSketch.update(spark, ss.root, f, ss.spec)) }
    val vecLoad = cfg.vectorIndex.map(maintainIndex)
    val corpus = cfg.corpusDedup.map(maintainCorpus)
    val expired =
      if (ticks % cfg.retainEvery == 0)
        Maintenance.expireFiles(spark, cfg.srcDir, cfg.retentionDays)
      else Seq.empty
    // periodic small-file compaction: steady ingestion produces one
    // file per drop; the versioned rewrite keeps the table readable
    // throughout and migrates a flat table on first compaction
    val compacted =
      if (cfg.compactEvery > 0 && ticks % cfg.compactEvery == 0)
        cfg.compactSmallFileBytes match {
          // file-granular: pack only the small files, carry the rest
          // by reference — tick cost follows the fresh files, not the
          // table
          case Some(thresh) =>
            Some(Maintenance.compactSmallFiles(spark, cfg.tableDir,
              smallFileBytes = thresh,
              sortCol = cfg.compactClusterBy,
              statsCols = cfg.compactStatsCols,
              bloomCols = cfg.compactBloomCols,
              zorderCols = cfg.compactZOrder)._2)
          case None =>
            Some(Maintenance.compactVersioned(spark, cfg.tableDir,
              sortCol = cfg.compactClusterBy,
              statsCols =
                (cfg.compactClusterBy.toSeq ++ cfg.compactStatsCols).distinct,
              bloomCols = cfg.compactBloomCols,
              zorderCols = cfg.compactZOrder))
        }
      else None
    // scheduled orphan vacuum: crashed writers' leftovers (in-flight
    // dirs no manifest references) reclaimed once they outlive the
    // age threshold — the storage-hygiene twin of compaction
    val vacuumed =
      if (cfg.vacuumEvery > 0 && ticks % cfg.vacuumEvery == 0)
        VersionedTable.vacuum(spark, cfg.tableDir, cfg.vacuumAgeMs)
      else Seq.empty
    // scheduled ED resolution: CDC landings (upsertByKey) pile up
    // equality deletes; one scan converts them to positions so reads
    // stop paying the key-join
    val resolved =
      if (cfg.resolveDeletesEvery > 0 && ticks % cfg.resolveDeletesEvery == 0)
        Some(VersionedTable.resolveEqualityDeletes(spark, cfg.tableDir,
          statsCols = cfg.compactStatsCols,
          bloomCols = cfg.compactBloomCols))
      else None
    // CDC consumers AFTER maintenance: compaction/resolution commits
    // are net-empty diffs, so syncing here drains this tick's real
    // changes in one range instead of two
    val mirrored = cfg.mirror
      .filter(m => m.every <= 1 || ticks % m.every == 0)
      .flatMap(m => ChangeFeed.mirror(spark, cfg.tableDir, m.dstRoot,
        m.keyCols, m.keepVersions, evolveSchema = m.evolveSchema))
    val cdcSynced = cfg.cdcAgg
      .filter(c => c.every <= 1 || ticks % c.every == 0)
      .flatMap(c => CdcAggView.sync(spark, cfg.tableDir, c.viewRoot,
        c.spec, c.keepVersions))
    val report = Automation.TickReport(ticks, generated, load, expired,
      vecLoad, compacted, corpus, vacuumed, resolved, mirrored, cdcSynced)
    val wallMs = (System.nanoTime() - tickStartNanos) / 1000000L
    cfg.catalog match {
      // CROSS-ARTIFACT atomic tick: the corpus-table commit, the
      // retrieval-view state pin, the ANN-generation pin, and the
      // tick-history row publish under ONE catalog PUT. A crash
      // anywhere before the PUT leaves catalog readers on the ENTIRE
      // pre-tick snapshot (the artifact commits that did land are
      // invisible orphan history to them); the replayed tick's
      // idempotent re-run converges — its writes find the artifacts
      // already advanced, pin them, and the PUT publishes all of
      // them together.
      case Some(cat) =>
        val writes = Seq.newBuilder[Catalog.TableWrite]
        cfg.corpusDedup.foreach { cc =>
          if (corpusHasObjects(cc) ||
              VersionedTable.currentVersion(spark, cc.corpusDir).isDefined)
            writes += Catalog.TableWrite("corpus", cc.corpusDir,
              () => commitCorpusTable(cc))
          cc.retrievalDir
            .filter(rx => VersionedTable
              .currentVersion(spark, s"$rx/tot").isDefined)
            .foreach { rx =>
              // PIN: RetrievalView's commit point is its tot table —
              // folds already landed exactly-once above; the snapshot
              // records which state this tick published
              writes += Catalog.TableWrite("retrieval_tot", s"$rx/tot",
                () => VersionedTable.currentVersion(spark, s"$rx/tot").get)
            }
          cc.annIndexPath
            .filter(ix => graft.operators.VectorIndex.exists(spark, ix))
            .foreach { ix =>
              // PIN: the ANN index's atomic state is its generation;
              // snapshot readers search
              // VectorIndex.generationRoot(ix, pinned)
              writes += Catalog.TableWrite("ann", ix,
                () => graft.operators.VectorIndex.generation(spark, ix))
            }
        }
        cfg.historyDir.foreach { h =>
          writes += Catalog.TableWrite("ticks", h,
            () => Automation.recordTick(spark, h, report, wallMs,
              keepVersions = cat.keep))
        }
        val ws = writes.result()
        if (ws.nonEmpty) {
          Catalog.commitAll(spark, cat.catRoot, ws)
          Catalog.prune(spark, cat.catRoot, cat.keep)
        }
      case None =>
        // per-artifact commits (each individually crash-idempotent):
        // the corpus table advances over this tick's published
        // objects, then the tick-history row lands LAST so wall_ms
        // covers the whole tick's work
        cfg.corpusDedup.foreach { cc =>
          if (corpusHasObjects(cc)) commitCorpusTable(cc)
        }
        cfg.historyDir.foreach { h =>
          Automation.recordTick(spark, h, report, wallMs)
        }
    }
    report
  }

  /** Adopt batch objects published by the pre-`data/` layout (they
    * lived directly under `corpusDir/batch-*.parquet`): one atomic
    * rename each into `corpusDataDir`, so the versioned commit, the
    * model-retrain label reads, and the retrieval fold all see them
    * again after an upgrade — without this they silently vanish while
    * the near-dup history postings still claim their docs exist.
    * Idempotent across crashes: objects are immutable and tag-named
    * (same tag ⇒ same content by the publish protocol), so a replay
    * that finds the target already present just drops the leftover
    * source. */
  private def adoptLegacyCorpusObjects(
      cc: Automation.CorpusDedupConfig): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(cc.corpusDir),
      spark.sparkContext.hadoopConfiguration)
    val root = new org.apache.hadoop.fs.Path(cc.corpusDir)
    if (!fs.exists(root)) return
    val legacy = fs.listStatus(root).toSeq.map(_.getPath)
      .filter { p =>
        val n = p.getName
        n.startsWith("batch-") && n.endsWith(".parquet")
      }
    if (legacy.nonEmpty) {
      val dd = new org.apache.hadoop.fs.Path(cc.corpusDataDir)
      fs.mkdirs(dd)
      legacy.foreach { src =>
        val dst = new org.apache.hadoop.fs.Path(dd, src.getName)
        if (fs.exists(dst)) fs.delete(src, true)
        else {
          // Two adopters can both pass the !exists probe (unleased run
          // or a lease-TTL edge); rename arbitrates — the loser must
          // TREAT already-adopted as success (same tag ⇒ same content
          // by the publish protocol), not crash the tick.
          val renamed = try fs.rename(src, dst)
            catch { case _: java.io.IOException => false }
          if (!renamed) {
            require(fs.exists(dst),
              s"legacy corpus object adoption failed: $src -> $dst")
            if (fs.exists(src)) fs.delete(src, true)
          }
        }
      }
    }
  }

  /** Whether any published corpus batch objects exist yet. */
  private def corpusHasObjects(
      cc: Automation.CorpusDedupConfig): Boolean = {
    adoptLegacyCorpusObjects(cc)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(cc.corpusDir),
      spark.sparkContext.hadoopConfiguration)
    val d = new org.apache.hadoop.fs.Path(cc.corpusDataDir)
    fs.exists(d) && fs.listStatus(d)
      .exists(_.getPath.getName.endsWith(".parquet"))
  }

  /** Commit the corpus VersionedTable over the published batch
    * objects: carried refs = every immutable `data/batch-*.parquet`
    * object, no data copied (the manifest is the only write). The
    * object set is derived from the DATA DIR each time, so a replay
    * after any crash converges: objects a crashed tick published but
    * never referenced get picked up by the next commit; a tick that
    * published nothing new re-pins the current version. Returns the
    * version the catalog should pin. */
  private def commitCorpusTable(
      cc: Automation.CorpusDedupConfig): Long = {
    adoptLegacyCorpusObjects(cc)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(cc.corpusDir),
      spark.sparkContext.hadoopConfiguration)
    val d = new org.apache.hadoop.fs.Path(cc.corpusDataDir)
    val objs: Seq[String] =
      if (!fs.exists(d)) Nil
      else fs.listStatus(d).toSeq.map(_.getPath.getName)
        .filter(n => n.startsWith("batch-") && n.endsWith(".parquet"))
        .sorted.map(n => s"data/$n")
    val cur = VersionedTable.currentVersion(spark, cc.corpusDir)
    val have: Set[String] = cur
      .map(v => VersionedTable.filesAt(spark, cc.corpusDir, v).toSet)
      .getOrElse(Set.empty)
    if (cur.isDefined && objs.toSet == have) cur.get // nothing new: pin
    else VersionedTable.commitDelta(spark, cc.corpusDir, objs,
      keepVersions = cc.corpusKeepVersions)(_ => ())
  }

  /** Training-corpus curation: incremental-load document drops, then
    * run each freshly landed batch through exact dedup (within the
    * batch) and NEAR-dup dedup against the history postings table
    * ([[graft.operators.TextOps.nearDupAgainstHistory]] — the
    * crawl-vs-corpus shape), and append only the survivors to the
    * curated corpus PLUS their shingles to the history postings — so
    * the postings are maintained incrementally, never rebuilt, and
    * dedup cost each tick follows the batch, not the corpus.
    *
    * Exactly-once without a second registry: each raw ingest file is
    * processed into corpus/postings objects named by ITS OWN publish
    * tag (staged, single-object move, reused if a crashed attempt
    * already published them), and a `_done-<tag>` marker — created
    * LAST — records completion. Every crash window replays
    * idempotently: missing marker → reprocess, find the objects
    * already published, reuse, re-mark. Files process in sorted
    * order, so a later batch in the same tick dedups against an
    * earlier batch's just-published postings. */
  private def maintainCorpus(
      cc: Automation.CorpusDedupConfig): Automation.CorpusReport = {
    import org.apache.spark.sql.SaveMode
    import org.apache.spark.sql.functions.col
    adoptLegacyCorpusObjects(cc)
    val load = IncrementalLoader.run(spark, cc.srcDir, cc.rawTableDir,
      cc.registryDir, cc.schema, cc.format)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(cc.corpusDir), spark.sparkContext.hadoopConfiguration)
    val rawLive = VersionedTable.currentPath(spark, cc.rawTableDir)
    val rawDir = new org.apache.hadoop.fs.Path(rawLive)
    val doneDir = new org.apache.hadoop.fs.Path(s"${cc.corpusDir}/_done")
    fs.mkdirs(doneDir)
    val pending =
      if (!fs.exists(rawDir)) Seq.empty
      else fs.listStatus(rawDir).toSeq
        .map(_.getPath.getName)
        .filter(n => n.startsWith("ingest-") && n.endsWith(".parquet"))
        .filterNot { n =>
          val tag = n.stripPrefix("ingest-").stripSuffix(".snappy.parquet")
          fs.exists(new org.apache.hadoop.fs.Path(doneDir, s"done-$tag"))
        }
        .sorted
    var kept = 0L
    var dropped = 0L
    var annRemoved = 0L
    pending.foreach { name =>
      val tag = name.stripPrefix("ingest-").stripSuffix(".snappy.parquet")
      val raw = spark.read.parquet(s"$rawLive/$name")
      // model gate first, when configured: the classifier's broadcast-
      // join scoring is map-side-cheap and shrinks everything after
      val fresh = cc.modelGate.fold(raw) { case (mroot, minP) =>
        raw.join(graft.operators.QualityModel.score(spark, mroot, raw)
          .filter(col("quality_p") >= minP).select("doc_id"),
          Seq("doc_id"), "left_semi")
      }
      // exact dedup first (cheap fingerprint pass shrinks the
      // postings), then the greedy within-batch NEAR-dup drop — a
      // drop re-delivering the same page under two ids plus a
      // near-rewrite must land at most one survivor
      val batchDeduped = graft.operators.TextOps.dropNearDupsWithinBatch(
        graft.operators.CorpusPipeline.dedupExact(fresh), cc.t)
      val havePostings = fs.exists(
        new org.apache.hadoop.fs.Path(cc.postingsDir)) &&
        fs.listStatus(new org.apache.hadoop.fs.Path(cc.postingsDir))
          .exists(_.getPath.getName.endsWith(".parquet"))
      val survivors =
        if (!havePostings) batchDeduped
        else {
          // prefix ranking reads the maintained (gram, df) view — no
          // O(history) aggregate per batch. Folds below are
          // at-least-once (a crash replay may re-fold one batch): an
          // inflated df only perturbs the rarity heuristic, the
          // survivor set is decided by the exact verify.
          val dfView =
            if (VersionedTable.currentVersion(spark, cc.gramDfDir).isDefined)
              Some(MaterializedAgg
                .read(spark, cc.gramDfDir,
                  MaterializedAgg.Spec(Seq("gram"), Nil))
                .select(col("gram"), col("cnt").as("df")))
            else None
          graft.operators.TextOps.nearDupAgainstHistory(
            spark.read.parquet(cc.postingsDir), batchDeduped, cc.t, dfView)
        }
      val nFresh = raw.count()
      // optional DSIR stage: fold the batch's token counts into the
      // maintained importance model (DsirView — KBs at any corpus
      // size), then keep each survivor w.p. min(1, exp(logw)) via the
      // shared deterministic md5 threshold (q112's clipped importance
      // resampling). Fold-then-score, so the model always includes
      // the batch it scores (defined from the very first tick). The
      // fold is at-least-once like the (gram, df) view: a crash
      // replay re-folds one batch, which only perturbs FUTURE
      // batches' rates — this batch's published object already
      // exists and is reused, so the corpus itself stays exactly-once.
      val selected = cc.dsirTargetLang match {
        case None => survivors
        case Some(lang) =>
          import org.apache.spark.sql.functions.{coalesce, exp, least, lit, round}
          graft.operators.DsirView.update(spark, cc.dsirModelDir,
            survivors, lang)
          // an unfolded model (first batch tokenized entirely empty)
          // carries no information — neutral weights, don't crash the tick
          if (!graft.operators.DsirView.hasState(spark, cc.dsirModelDir))
            survivors
          else {
            val rates = graft.operators.DsirView
              .score(spark, cc.dsirModelDir, survivors)
              .select(col("doc_id"),
                least(lit(1.0), round(exp(col("dsir_logw")), 6)).as("rate"))
            // LEFT join: a survivor whose text tokenizes to zero tokens
            // gets no score row — importance resampling must not turn
            // into a hard filter on it; missing rate = 1.0 (logw 0, the
            // neutral weight), so the doc rides through deterministically
            survivors.join(rates, Seq("doc_id"), "left")
              .withColumn("rate", coalesce(col("rate"), lit(1.0)))
              .filter(graft.operators.TextOps
                .keepByRate(col("doc_id"), col("rate")))
              .drop("rate")
          }
      }
      // blob-fingerprint dedup LAST among the drop stages: perceptual
      // 64-bit fingerprints of the batch's media column, smaller-id
      // winner within the batch, bloom-anti-joined against the
      // maintained fingerprint history (the text stages' crawl-vs-
      // corpus shape on (doc_id, long) rows — re-uploads AND
      // re-encodes collide because the fp is over DECODED content)
      val curated = cc.blobDedup.fold(selected) { bc =>
        val fps = graft.operators.Multimodal
          .fingerprintBlobs(selected, bc.column, bc.modality)
        // within-batch: exact mode keeps the min-id per identical fp;
        // hamming mode drops every doc with a smaller-id neighbor
        // within maxHamming bits (banded join — same winner on exact
        // twins, plus the re-encoded 1–3-bit class)
        val winners =
          if (bc.maxHamming <= 0)
            fps.groupBy(col("bfp"))
              .agg(org.apache.spark.sql.functions.min(col("doc_id"))
                .as("doc_id"))
              .select("doc_id", "bfp")
          else {
            val losers = graft.operators.Multimodal
              .hammingNearDupPairs(fps, "doc_id", "bfp", bc.maxHamming)
              .select(col("b_id").as("doc_id")).distinct()
            fps.join(losers, Seq("doc_id"), "left_anti")
              .select("doc_id", "bfp")
          }
        val haveFps = fs.exists(
          new org.apache.hadoop.fs.Path(bc.fpDir)) &&
          fs.listStatus(new org.apache.hadoop.fs.Path(bc.fpDir))
            .exists(_.getPath.getName.endsWith(".parquet"))
        val keep =
          if (!haveFps) winners
          else if (bc.maxHamming <= 0)
            graft.operators.JoinOps.bloomAntiJoin(winners,
              spark.read.parquet(bc.fpDir)
                .select(col("bfp").as("bfp_hist")),
              "bfp", "bfp_hist")
          else winners.join(
            graft.operators.Multimodal.hammingHistoryMatches(winners,
              spark.read.parquet(bc.fpDir)
                .select(col("bfp").as("bfp_hist")),
              "bfp", "bfp_hist", bc.maxHamming),
            Seq("doc_id"), "left_anti")
        selected.join(keep.select("doc_id"), Seq("doc_id"), "left_semi")
      }
      val nKept = publishObject(fs, curated, cc.corpusDataDir, s"batch-$tag")
      // history postings cover the PUBLISHED set: near-dup history
      // must mirror what is actually in the corpus
      val survivorPostings =
        graft.operators.TextOps.historyPostings(curated)
      publishObject(fs, survivorPostings, cc.postingsDir, s"batch-$tag")
      // fingerprint history mirrors the corpus too: published
      // survivors' fps append per batch (crash replay reuses the
      // published object — at most one fp object per tag)
      cc.blobDedup.foreach { bc =>
        publishObject(fs, graft.operators.Multimodal.fingerprintBlobs(
          curated, bc.column, bc.modality), bc.fpDir, s"batch-$tag")
      }
      MaterializedAgg.update(spark, cc.gramDfDir,
        survivorPostings.select(col("gram")),
        MaterializedAgg.Spec(Seq("gram"), Nil))
      // ANN coupling: a document the curation stages dropped THIS
      // batch must vanish from the maintained vector index's search
      // results the same tick — tombstone its vector
      // (VectorIndex.remove: O(dropped) append, searches pre-filter
      // the broadcast tombstone set, no list partition touched). A
      // crash replay re-appends the same ids; reads and vacuum dedup
      // the tombstone set, so the replay stays idempotent. The index
      // rewrite itself happens on the annVacuumEvery cadence below.
      cc.annIndexPath.foreach { ix =>
        if (graft.operators.VectorIndex.exists(spark, ix)) {
          // diff against the PUBLISHED object, not the lazy `selected`
          // plan: the gram-df commit above may have GC'd the view
          // version that plan's prefix-ranking stage read, and the
          // published object is also what a crash replay actually kept.
          // Diff from the RAW batch: a model-gated doc is a curation
          // drop too — its vector must vanish like a dedup drop's
          val droppedIds = raw
            .select(col("doc_id").cast("long").as("vec_id")).distinct()
            .join(spark.read.parquet(s"${cc.corpusDataDir}/batch-$tag.parquet")
              .select(col("doc_id").cast("long").as("vec_id"))
              .distinct(), Seq("vec_id"), "left_anti")
          val nd = droppedIds.count()
          if (nd > 0) graft.operators.VectorIndex.remove(spark, ix, droppedIds)
          annRemoved += nd
        }
      }
      // retrieval coupling: fold the PUBLISHED batch into the
      // maintained BM25 index so the curated corpus is searchable the
      // tick it lands. RetrievalView's idempotency wants a MONOTONIC
      // batch id; the daemon assigns each tag a sequence id ONCE
      // (persisted under _seq before folding, single-writer), so a
      // crash replay folds under the SAME id and the view's
      // exactly-once protocol absorbs it.
      cc.retrievalDir.foreach { rx =>
        val rfs = org.apache.hadoop.fs.FileSystem.get(
          new java.net.URI(rx), spark.sparkContext.hadoopConfiguration)
        val seqDir = new org.apache.hadoop.fs.Path(s"$rx/_seq")
        rfs.mkdirs(seqDir)
        val tagFile = new org.apache.hadoop.fs.Path(seqDir, tag)
        def readSeq(): Long = {
          val in = rfs.open(tagFile)
          try scala.io.Source.fromInputStream(in, "UTF-8")
            .mkString.trim.toLong
          finally in.close()
        }
        val id =
          if (rfs.exists(tagFile)) readSeq()
          else {
            val next = rfs.listStatus(seqDir).length + 1L
            // atomic arbitration: a racing writer's value wins whole
            try {
              graft.util.AtomicPut.putIfAbsent(rfs, tagFile, next.toString)
              next
            } catch { case _: java.io.IOException => readSeq() }
          }
        // with a catalog configured, fold history is retained to the
        // catalog's keep so snapshot readers can searchAt pinned
        // retrieval versions (the keepVersions-trails-readers contract)
        RetrievalView.update(spark, rx,
          spark.read.parquet(s"${cc.corpusDataDir}/batch-$tag.parquet"), id,
          keepVersions = cfg.catalog.map(_.keep).getOrElse(1))
      }
      // marker LAST: its existence = this raw file fully processed;
      // atomic create-if-absent so a racing second daemon fails loudly
      graft.util.AtomicPut.putIfAbsent(fs,
        new org.apache.hadoop.fs.Path(doneDir, s"done-$tag"), "")

      kept += nKept
      dropped += nFresh - nKept
    }
    // scheduled tombstone materialization: rewrite only the affected
    // list partitions, then clear the set — the index-side twin of
    // scheduled compaction
    val annVacuumed = cc.annIndexPath match {
      case Some(ix) if cc.annVacuumEvery > 0 &&
          ticks % cc.annVacuumEvery == 0 &&
          graft.operators.VectorIndex.exists(spark, ix) =>
        graft.operators.VectorIndex.vacuumTombstones(spark, ix)
      case _ => 0L
    }
    // scheduled retrieval-index consolidation: the per-batch postings
    // objects merge into a range-sorted compact generation and the
    // superseded objects vacuum — search cost tracks data, not ticks.
    // With a catalog, the claim is CAPPED at the minimum retained
    // pin's fold point (the ANN generation floor's retrieval twin):
    // an uncapped claim would turn every retained snapshot's searchAt
    // into a loud refusal. The floor advances as prune retires old
    // snapshots, so consolidation trails retention, never starves.
    cc.retrievalDir.foreach { rx =>
      if (cc.retrievalCompactEvery > 0 &&
          ticks % cc.retrievalCompactEvery == 0) {
        val floor = cfg.catalog.flatMap(cat =>
          Catalog.minPinnedVersion(spark, cat.catRoot, s"$rx/tot")
            .map(v => VersionedTable
              .lastFoldedBatchAt(spark, s"$rx/tot", v).getOrElse(0L)))
        if (RetrievalView.compact(spark, rx, floor))
          RetrievalView.vacuumCompacted(spark, rx)
      }
    }
    // scheduled classifier re-fit: the weak-label slice is rebuilt
    // from what curation itself decided (positives = hash-lowest
    // sample of the CURATED corpus, negatives = raw docs curation
    // dropped), the model re-trains sample-bounded, and the flip is
    // ONE marker write — in-flight scoring keeps a consistent model
    // (score resolves its generation once). Runs AFTER this tick's
    // batches, so a tick's gate decisions all use one model.
    val modelGen: Option[Long] = cc.modelGate match {
      case Some((mroot, _)) if cc.modelRetrainEvery > 0 &&
          ticks % cc.modelRetrainEvery == 0 &&
          graft.operators.QualityModel.exists(spark, mroot) =>
        import org.apache.spark.sql.functions.{lit, xxhash64}
        val dataDir = new org.apache.hadoop.fs.Path(cc.corpusDataDir)
        val haveCorpus = fs.exists(dataDir) &&
          fs.listStatus(dataDir).exists(_.getPath.getName.endsWith(".parquet"))
        if (!haveCorpus) None
        else {
          def sampled(df: org.apache.spark.sql.DataFrame) = df
            .withColumn("h", xxhash64(col("doc_id")))
            .orderBy(col("h"), col("doc_id"))
            .limit(cc.modelRetrainSample).drop("h")
          val corpus = spark.read.parquet(cc.corpusDataDir)
            .select("doc_id", "text")
          val raw = spark.read.parquet(rawLive)
            .select("doc_id", "text")
          // negatives = everything curation rejected: model-gated,
          // deduped, decontaminated, resampled-out — the "not in the
          // trusted slice" class of the weak-label setup
          val neg = sampled(raw.join(corpus.select("doc_id"),
            Seq("doc_id"), "left_anti"))
          val pos = sampled(corpus)
          // both classes must be present to re-fit; otherwise defer
          // to a later tick (e.g. nothing dropped yet)
          if (neg.isEmpty || pos.isEmpty) None
          else {
            val labeled = pos.withColumn("label", lit(1.0))
              .unionByName(neg.withColumn("label", lit(0.0)))
            // vacuum BEFORE the flip: generations superseded at the
            // PREVIOUS retrain have had one full cadence of grace for
            // out-of-daemon scorers that resolved them mid-flip (the
            // vacuumGenerations contract); the generation this retrain
            // supersedes survives until the next retrain tick
            graft.operators.QualityModel.vacuumGenerations(spark, mroot)
            val g = graft.operators.QualityModel.retrain(spark, mroot,
              labeled)
            Some(g)
          }
        }
      case _ => None
    }
    Automation.CorpusReport(load, pending.size, kept, dropped,
      annRemoved, annVacuumed, modelGen)
  }

  /** Stage `df` and publish it as ONE parquet object `<name>.parquet`
    * under `dir` — the IncrementalLoader publish pattern (single-object
    * moves appear atomically everywhere; a crashed attempt's object is
    * reused, never duplicated). Returns the row count. */
  private def publishObject(fs: org.apache.hadoop.fs.FileSystem,
      df: org.apache.spark.sql.DataFrame, dir: String, name: String): Long = {
    import org.apache.spark.sql.SaveMode
    val target = new org.apache.hadoop.fs.Path(dir, s"$name.parquet")
    val stageDir = new org.apache.hadoop.fs.Path(s"$dir/_staging/$name")
    val n = df.count()
    if (!fs.exists(target)) {
      df.coalesce(1).write.mode(SaveMode.Overwrite).parquet(stageDir.toString)
      val part = fs.listStatus(stageDir)
        .find(_.getPath.getName.startsWith("part-"))
        .getOrElse(throw new IllegalStateException(s"no part under $stageDir"))
        .getPath
      require(fs.rename(part, target), s"publish $part -> $target failed")
      fs.delete(stageDir, true)
    }
    n
  }

  /** Embedding-table maintenance: incremental-load new vector drops,
    * then route exactly the freshly landed rows into the persisted IVF
    * index — `VectorIndex.add` assigns them to the EXISTING trained
    * centroids and appends only the touched list partitions, so index
    * upkeep costs O(new vectors), never a retrain or a rebuild. The
    * first tick with data bootstraps the index (trains centroids
    * once); every later tick appends. */
  private def maintainIndex(
      vc: Automation.VectorIndexConfig): IncrementalLoader.LoadResult = {
    val r = IncrementalLoader.run(spark, vc.srcDir, vc.tableDir,
      vc.registryDir, vc.schema, vc.format)
    if (r.loaded.nonEmpty) {
      // read back exactly the files this pass published
      val live = VersionedTable.currentPath(spark, vc.tableDir)
      val fresh = spark.read.parquet(
        r.loaded.map(f => s"$live/${IncrementalLoader.publishedName(f)}"): _*)
      if (!graft.operators.VectorIndex.exists(spark, vc.indexPath)) {
        // bootstrap trains the one-time centroid/codebook geometry —
        // from the WHOLE loaded table, not just this tick's drop, and
        // only once enough vectors have landed
        // (minBootstrapVectors): add() never retrains, so centroids
        // fitted to a 3-vector first drop would freeze a degenerate
        // geometry forever. Below the floor the build DEFERS — the
        // rows are safe in the table, and a later tick bootstraps
        // from all of them. The floor check reads the LOAD REGISTRY
        // (KB of metadata: every published file's recorded n_rows),
        // not the table — pre-bootstrap ticks would otherwise pay an
        // O(table) count scan each, for a number the loader already
        // wrote down.
        import org.apache.spark.sql.functions.{coalesce, col, lit, max, sum}
        val loadedRows = LoadRegistry.read(spark, vc.registryDir)
          .filter(col("status") === LoadRegistry.StatusOk)
          .groupBy("path").agg(max(col("n_rows")).as("n"))
          .agg(coalesce(sum(col("n")), lit(0L)).as("t"))
          .head().getLong(0)
        if (loadedRows >= math.max(1L, vc.minBootstrapVectors.toLong)) {
          val all = spark.read.parquet(live)
          vc.pq match {
            case None => graft.operators.VectorIndex.build(
              all, vc.indexPath, vc.k, vc.iters)
            case Some((m, ksub)) => graft.operators.VectorIndex.buildPQ(
              all, vc.indexPath, vc.k, m, ksub, vc.iters,
              residual = vc.pqResidual, packed = vc.pqPacked, opq = vc.pqOpq)
          }
        }
      }
      else {
        // dispatch on the layout the index ON DISK actually has, and
        // refuse a config that contradicts it — a daemon restarted
        // with pq toggled would otherwise crash mid-tick reading the
        // other layout's files
        val storedPq = graft.operators.VectorIndex.isPQ(spark, vc.indexPath)
        require(storedPq == vc.pq.isDefined,
          s"index at ${vc.indexPath} is ${if (storedPq) "PQ" else "raw"} " +
            s"but the config says ${if (vc.pq.isDefined) "PQ" else "raw"}; " +
            "rebuild the index or fix VectorIndexConfig.pq")
        if (storedPq) graft.operators.VectorIndex.addPQ(spark, vc.indexPath, fresh)
        else graft.operators.VectorIndex.add(spark, vc.indexPath, fresh)
      }
    }
    // scheduled list consolidation: per-tick adds fragment the
    // partitions; compaction keeps search cost tracking data, not
    // tick count (the ANN twin of retrievalCompactEvery)
    if (vc.compactListsEvery > 0 && ticks % vc.compactListsEvery == 0 &&
        graft.operators.VectorIndex.exists(spark, vc.indexPath))
      graft.operators.VectorIndex.compactLists(spark, vc.indexPath)
    // scheduled geometry refresh: re-fit centroids/codebooks on the
    // ids the index serves today (retrain semi-joins them against the
    // loaded table — vacuumed curation drops never resurrect) and
    // flip the new generation live with one marker write. The daemon
    // is the single maintenance writer; superseded generations vacuum
    // DOWN TO the catalog's retention floor — a retained snapshot may
    // pin an old generation for searchHybridAt serving, and deleting
    // it would break the pinned-reader contract the retrieval twin
    // keeps via keepVersions (without a catalog, only the live
    // generation survives, the original single-writer behavior).
    if (vc.retrainEvery > 0 && ticks % vc.retrainEvery == 0 &&
        graft.operators.VectorIndex.exists(spark, vc.indexPath)) {
      val table = spark.read.parquet(
        VersionedTable.currentPath(spark, vc.tableDir))
      graft.operators.VectorIndex.retrain(spark, vc.indexPath, table,
        (df, p) => vc.pq match {
          case None =>
            graft.operators.VectorIndex.build(df, p, vc.k, vc.iters)
          case Some((m, ksub)) =>
            graft.operators.VectorIndex.buildPQ(df, p, vc.k, m, ksub,
              vc.iters, residual = vc.pqResidual, packed = vc.pqPacked,
              opq = vc.pqOpq)
        })
      val keepFrom = cfg.catalog
        .flatMap(cat => Catalog.minPinnedVersion(spark, cat.catRoot,
          vc.indexPath))
        .getOrElse(Long.MaxValue)
      graft.operators.VectorIndex.vacuumGenerations(spark, vc.indexPath,
        keepFrom)
    }
    r
  }

  /** Interval poll loop (reference: `UpdateLakehouse.run`'s
    * `while not stop: work; sleep(interval)`). `maxTicks <= 0` runs
    * until [[stop]]; a stop request finishes the in-flight tick, so
    * shutdown never tears a load in half. Returns the tick reports. */
  def runLoop(intervalMillis: Long,
              maxTicks: Long = -1L,
              onTick: Automation.TickReport => Unit = _ => ()): Seq[Automation.TickReport] = {
    val out = scala.collection.mutable.ArrayBuffer[Automation.TickReport]()
    while (!stopRequested.get() && (maxTicks <= 0 || out.size < maxTicks)) {
      val r = tick()
      out += r
      onTick(r)
      val more = maxTicks <= 0 || out.size < maxTicks
      if (more && !stopRequested.get() && intervalMillis > 0) {
        try Thread.sleep(intervalMillis)
        catch { case _: InterruptedException => stopRequested.set(true) }
      }
    }
    out.toSeq
  }

  /** Request a clean shutdown: the loop exits after the current tick. */
  def stop(): Unit = stopRequested.set(true)
}

object Automation {

  final case class Config(
      srcDir: String,
      tableDir: String,
      registryDir: String,
      rowsPerDrop: Long = 500L,
      generate: Boolean = true,
      retentionDays: Int = 7,
      retainEvery: Int = 60,
      compactEvery: Int = 0, // 0 = no scheduled compaction
      vacuumEvery: Int = 0, // 0 = no scheduled orphan vacuum
      vacuumAgeMs: Long = 24L * 3600 * 1000, // orphan age threshold
      // range-cluster scheduled compactions on this column and record
      // its per-file min/max in the manifest — compaction doubles as
      // the data-skipping index refresh (readPruned plans from it)
      compactClusterBy: Option[String] = None,
      // TWO-dimensional cluster layout for scheduled compactions:
      // Morton-interleave these columns and range-cluster on the
      // z-value (Bucketing.zorderLayout), so the manifest carries
      // tight extents on BOTH — the countWhereAll / readPrunedWhere
      // box-query layout. Overrides compactClusterBy when set.
      compactZOrder: Option[(String, String)] = None,
      // extra columns whose per-file stats the compaction manifest
      // records beyond the cluster key — the multi-column skipping
      // index countWhereAll/readPrunedWhere consume (the cluster key
      // gets tight ranges from the sort; these ride along as-is)
      compactStatsCols: Seq[String] = Nil,
      // columns getting per-file bloom filters in the compaction
      // manifest — point-lookup pruning (prunedFilesEq) for
      // high-cardinality ids whose ranges overlap every file
      compactBloomCols: Seq[String] = Nil,
      // when set, scheduled compaction is FILE-GRANULAR: only files
      // below this size are packed (Maintenance.compactSmallFiles);
      // right-sized files carry by reference, so tick cost follows
      // the fresh ingestion, not the table
      compactSmallFileBytes: Option[Long] = None,
      // periodically convert accumulated equality deletes (deleteByKey
      // / upsertByKey CDC landings) into the positional vector — one
      // scan that takes the key-join off every subsequent read and
      // restores metadata-exact counts; scheduled compaction then
      // bounds how long any vector lives
      resolveDeletesEvery: Int = 0, // 0 = never
      // manifest retention for delta-table loads: CDC consumers
      // (mirror/cdcAgg, external ChangeFeed drains, the streaming
      // source) diff RETAINED versions, so this must exceed the
      // versions committed between two drains (loads land one commit
      // per file on delta tables) — a too-narrow window now fails
      // loudly at the consumer instead of partial-reading
      loadKeepVersions: Int = 1,
      // write-audit-publish gate on every load: batches violating any
      // check are QUARANTINED (registry-terminal, never retried,
      // never visible in the table) instead of published
      auditChecks: Seq[DataQuality.Check] = Nil,
      // whole-LOAD write–audit–publish: when set, each tick's fresh
      // drops stage onto ONE branch, these checks run against the
      // whole branch read (cross-batch — tick row floors,
      // reconciliation totals), and the tick publishes on pass /
      // discards on fail (released files retry next tick). A flat
      // (pre-versioning) table loads plainly until migrated.
      branchGate: Option[Seq[DataQuality.Check]] = None,
      seedBase: Int = 0,
      // when set, every completed tick appends ONE metrics row to a
      // versioned history table here (tick number, wall time, files
      // loaded/failed/quarantined, corpus keeps/drops, maintenance
      // counters) — the daemon's durable operations log, queryable as
      // SQL via the graft_ticks TVF. A month of minute-ticks is ~43k
      // rows: negligible storage, and trend queries (tick duration
      // drift, drop-rate spikes) run over it like any other table.
      historyDir: Option[String] = None,
      // when set, tick-end commits (corpus table, retrieval state pin,
      // ANN generation pin, tick-history row) flip under ONE atomic
      // catalog transaction — see [[CatalogConfig]]
      catalog: Option[CatalogConfig] = None,
      vectorIndex: Option[VectorIndexConfig] = None,
      aggView: Option[AggViewConfig] = None,
      freqSketch: Option[SketchViewConfig] = None,
      quantView: Option[QuantileViewConfig] = None,
      setSketch: Option[SetSketchConfig] = None,
      corpusDedup: Option[CorpusDedupConfig] = None,
      mirror: Option[MirrorConfig] = None,
      cdcAgg: Option[CdcAggConfig] = None,
      // multi-daemon cooperation: run each tick under a TTL writer
      // lease so a second daemon skips instead of conflicting
      lease: Option[LeaseConfig] = None)

  /** Tick-lease config: where the lease object lives and how long a
    * crashed holder blocks takeover. Size `ttlMs` at several multiples
    * of the longest observed tick. */
  final case class LeaseConfig(leaseDir: String,
      ttlMs: Long = 15L * 60 * 1000)

  /** Downstream-mirror maintenance: every `every` ticks, drain the
    * main table's CDC and apply the net changes to a keyed mirror at
    * `dstRoot` via [[ChangeFeed.mirror]] — O(changes) per sync, MoR
    * commits, position tracked in the mirror's own `_cdc` marker.
    * The table must be key-unique per `keyCols`. */
  final case class MirrorConfig(dstRoot: String, keyCols: Seq[String],
      every: Int = 1, keepVersions: Int = 1,
      evolveSchema: Boolean = false)

  /** Retraction-aggregate maintenance: every `every` ticks,
    * [[CdcAggView.sync]] the main table's CDC into the grouped
    * sums/counts view at `viewRoot` — updates and deletes retract
    * exactly (unlike the append-only [[AggViewConfig]] fold). */
  final case class CdcAggConfig(viewRoot: String,
      spec: MaterializedAgg.Spec, every: Int = 1, keepVersions: Int = 4)

  /** Materialized-view maintenance config: fold each tick's freshly
    * loaded rows into [[MaterializedAgg]] state at `root`. */
  final case class AggViewConfig(root: String, spec: MaterializedAgg.Spec)

  /** Frequency-sketch maintenance config: fold each tick's freshly
    * loaded rows into the [[SketchView]] count-min state at `root`. */
  final case class SketchViewConfig(root: String, spec: SketchView.Spec)

  /** Maintained-quantile config: fold each tick's freshly loaded rows
    * into the [[QuantileView]] DDSketch state at `root`. */
  final case class QuantileViewConfig(root: String, spec: QuantileView.Spec)

  /** Maintained set-sketch config: fold each tick's freshly loaded
    * rows into the per-segment KMV state at `root`
    * ([[graft.operators.SetSketch]]). */
  final case class SetSketchConfig(root: String,
      spec: graft.operators.SetSketch.ViewSpec)

  /** Embedding-pipeline config: where vector drops arrive, where the
    * loaded table and the persisted IVF index live. Drops are
    * JSON-lines by default (arrays don't fit CSV); `k`/`iters` only
    * apply to the one-time bootstrap training. */
  final case class VectorIndexConfig(
      srcDir: String,
      tableDir: String,
      registryDir: String,
      indexPath: String,
      schema: org.apache.spark.sql.types.StructType,
      format: String = "json",
      k: Int = 8,
      iters: Int = 3,
      // Some((m, ksub)) → maintain the PQ-compressed index instead:
      // inverted lists hold codes, incremental loads route+encode
      // against the bootstrap-trained models (VectorIndex.buildPQ)
      pq: Option[(Int, Int)] = None,
      // production storage tiers for the PQ index (ignored for raw):
      // residual codebooks, 4-bit packed lists, OPQ rotation — adds
      // dispatch off the on-disk markers, so these only shape the
      // one-time bootstrap build
      pqResidual: Boolean = false,
      pqPacked: Boolean = false,
      pqOpq: Boolean = false,
      // defer the one-time bootstrap build until this many vectors
      // have landed in the table — add() never retrains, so the
      // centroid geometry is only as good as the bootstrap sample.
      // Builds read the whole loaded table, so deferred rows are
      // included once the floor is met. 0 = build on first data.
      minBootstrapVectors: Int = 0,
      // every N ticks, consolidate fragmented inverted-list
      // partitions (VectorIndex.compactLists — per-tick adds leave
      // one object per touched centroid per batch; search pays a
      // task-per-file floor without this). 0 = never.
      compactListsEvery: Int = 0,
      // every N ticks, RE-FIT the index geometry on what the index
      // holds today and flip it live atomically
      // (VectorIndex.retrain + vacuumGenerations): add() routes
      // through frozen bootstrap centroids, so a drifting or growing
      // corpus slowly decays routing quality — the retrain tick is
      // the standing answer, using the same k/iters/pq knobs as the
      // bootstrap. 0 = never retrain.
      retrainEvery: Int = 0)

  /** Corpus-curation config: where document drops arrive (JSON-lines
    * by default: doc_id, text, lang, source), the raw landing table,
    * the curated corpus dir, and the incrementally-maintained history
    * postings dir the near-dup dedup probes. `t` is the trigram-Jaccard
    * threshold (≥ 0.5). */
  final case class CorpusDedupConfig(
      srcDir: String,
      rawTableDir: String,
      registryDir: String,
      corpusDir: String,
      postingsDir: String,
      schema: org.apache.spark.sql.types.StructType =
        org.apache.spark.sql.types.StructType.fromDDL(
          "doc_id BIGINT, text STRING, lang STRING, source STRING"),
      format: String = "json",
      t: Double = 0.5,
      dsirTargetLang: Option[String] = None,
      // when the corpus documents also live in a maintained
      // VectorIndex (vec_id = doc_id), curation drops tombstone their
      // vectors the SAME tick — searches stop returning them
      // immediately; annVacuumEvery schedules the partition rewrite
      // (0 = tombstones persist until an external vacuum)
      annIndexPath: Option[String] = None,
      annVacuumEvery: Int = 0,
      // when set, every PUBLISHED batch folds into a maintained BM25
      // index (RetrievalView) at this root the same tick — the
      // curated corpus is searchable as it lands
      // Some((modelRoot, minP)) → MODEL-BASED quality gate
      // ([[graft.operators.QualityModel]]): each raw batch drops docs
      // the trained classifier scores below minP BEFORE dedup; gated
      // docs count as curation drops (ANN tombstones included)
      modelGate: Option[(String, Double)] = None,
      retrievalDir: Option[String] = None,
      // every N ticks, consolidate the retrieval index's per-batch
      // objects into range-sorted compact generations and vacuum the
      // superseded ones (RetrievalView.compact) — keeps search linear
      // in data instead of fold count (0 = never)
      retrievalCompactEvery: Int = 0,
      // every N ticks, RE-FIT the modelGate classifier on the current
      // weak-label slice (positives = hash-lowest sample of the
      // curated corpus, negatives = raw docs curation dropped) and
      // flip it atomically (QualityModel.retrain) — the classifier
      // twin of VectorIndexConfig.retrainEvery: a model fitted to an
      // early crawl slice drifts as the corpus shifts (0 = never)
      modelRetrainEvery: Int = 0,
      // per-class hash-rank sample bound for the re-fit (model-sized
      // training by contract, never corpus-sized)
      modelRetrainSample: Int = 2000,
      // manifest retention of the versioned corpus table — must cover
      // the longest catalog-snapshot reader (a snapshot pins a corpus
      // VERSION; pruning it breaks that snapshot's reads)
      corpusKeepVersions: Int = 4,
      // when the ingest schema carries a BINARY media column, drop
      // blobs whose 64-bit PERCEPTUAL fingerprint (image dHash64 /
      // gain-invariant audio fp) matches a smaller-id twin in the
      // batch or the maintained fingerprint history — the image/audio
      // re-upload twin of the text near-dup stage (round 12 — r11
      // verdict item 6); survivors' fingerprints append to
      // `fpDir` per batch, incremental like the text postings
      blobDedup: Option[BlobDedupConfig] = None) {
    /** The incrementally-maintained (gram, df) view feeding the
      * near-dup prefix ranking — a [[MaterializedAgg]] root next to
      * the postings. */
    def gramDfDir: String = s"$postingsDir-df"
    /** The incrementally-maintained DSIR importance model
      * ([[graft.operators.DsirView]]) — present when
      * `dsirTargetLang` enables per-tick importance resampling. */
    def dsirModelDir: String = s"$postingsDir-dsir"
    /** Where the published batch objects live. `corpusDir` itself is
      * a [[VersionedTable]] whose delta manifests reference these
      * immutable objects — a plain dir read of `corpusDataDir` sees
      * every published object instantly; a catalog snapshot reads a
      * PINNED version through the manifest. */
    def corpusDataDir: String = s"$corpusDir/data"
  }

  /** Blob-dedup stage config: the binary `column` to fingerprint,
    * its `modality` ("image" | "audio" — picks dHash64 vs the audio
    * energy-delta fp), and the dir holding the maintained history of
    * published survivors' fingerprints. `maxHamming` > 0 (≤ 3) makes
    * the stage HAMMING-TOLERANT (round 13 — r12 verdict item 4): a
    * re-encoded/cropped re-upload that flips 1–3 fingerprint bits
    * still drops, via the 4×16-band pigeonhole joins
    * ([[graft.operators.Multimodal.hammingNearDupPairs]] within the
    * batch, [[graft.operators.Multimodal.hammingHistoryMatches]]
    * against the history); 0 keeps the exact-equality fast path
    * (groupBy + bloom anti-join). */
  final case class BlobDedupConfig(column: String, modality: String,
      fpDir: String, maxHamming: Int = 0) {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"maxHamming must be in [0,3] (4-band pigeonhole exactness), " +
        s"got $maxHamming")
  }

  /** Cross-artifact ATOMIC ticks: when set, each tick's corpus-table
    * commit, retrieval-view state, ANN-index generation, and
    * tick-history row publish under ONE [[Catalog.commitAll]] flip —
    * a reader joining corpus ↔ retrieval ↔ ANN through a
    * [[Catalog.Snapshot]] can never observe the corpus advanced while
    * the indexes lag (the gap the per-artifact single-object commits
    * leave open). `keep` bounds retained catalog versions. */
  final case class CatalogConfig(catRoot: String, keep: Int = 8)

  /** Per-tick corpus curation outcome. `kept`/`dropped` are this
    * tick's processed batches only (a crash-replayed batch whose
    * objects already exist reports its rows as already published).
    * `annRemoved` = vectors tombstoned in the linked index this tick;
    * `annVacuumed` = tombstones materialized by this tick's scheduled
    * vacuum. */
  final case class CorpusReport(load: IncrementalLoader.LoadResult,
      batches: Int, kept: Long, dropped: Long,
      annRemoved: Long = 0L, annVacuumed: Long = 0L,
      // Some(g) when this tick re-fit the quality classifier and
      // flipped generation g live (modelRetrainEvery cadence)
      modelGen: Option[Long] = None)

  final case class TickReport(
      tick: Long,
      generated: Option[String],
      load: IncrementalLoader.LoadResult,
      expired: Seq[String],
      vecLoad: Option[IncrementalLoader.LoadResult] = None,
      compacted: Option[Int] = None,
      corpus: Option[CorpusReport] = None,
      vacuumed: Seq[String] = Seq.empty,
      resolvedDeletes: Option[Long] = None,
      mirrored: Option[(Long, Long)] = None,
      cdcSynced: Option[(Long, Long)] = None,
      // true = another daemon held the tick lease; this cycle did
      // nothing (no loads, no maintenance, no history row)
      leaseSkipped: Boolean = false)

  /** One row of the persisted tick-history table (`Config.historyDir`)
    * — the flattened [[TickReport]] plus wall time and commit
    * timestamp. Absent optional stages record as NULL, so "did the
    * compaction tick fire" is a SQL IS NOT NULL, distinct from
    * "fired and touched 0 files". */
  final case class TickHistoryRow(
      tick: Long, ts: java.sql.Timestamp, wall_ms: Long,
      generated: Option[String],
      files_loaded: Int, files_skipped: Int, files_failed: Int,
      files_quarantined: Int, files_expired: Int,
      compacted: Option[Int], vec_loaded: Option[Int],
      corpus_batches: Option[Int], corpus_kept: Option[Long],
      corpus_dropped: Option[Long], ann_removed: Option[Long],
      ann_vacuumed: Option[Long], model_gen: Option[Long],
      orphans_vacuumed: Int, resolved_deletes: Option[Long],
      mirror_from: Option[Long], mirror_to: Option[Long],
      cdc_from: Option[Long], cdc_to: Option[Long])

  /** Append one [[TickHistoryRow]] for a completed tick to the
    * versioned history table at `dir` (created on first record). An
    * O(1-row) delta commit — the daemon's operations log costs one
    * tiny object + one manifest per tick regardless of table size.
    * Returns the committed history-table version (the catalog
    * transaction pins it). */
  def recordTick(spark: SparkSession, dir: String, r: TickReport,
      wallMs: Long, keepVersions: Int = 1): Long = {
    import spark.implicits._
    val row = TickHistoryRow(
      tick = r.tick,
      ts = new java.sql.Timestamp(System.currentTimeMillis()),
      wall_ms = wallMs,
      generated = r.generated,
      files_loaded = r.load.loaded.size,
      files_skipped = r.load.skipped.size,
      files_failed = r.load.failed.size,
      files_quarantined = r.load.quarantined.size,
      files_expired = r.expired.size,
      compacted = r.compacted,
      vec_loaded = r.vecLoad.map(_.loaded.size),
      corpus_batches = r.corpus.map(_.batches),
      corpus_kept = r.corpus.map(_.kept),
      corpus_dropped = r.corpus.map(_.dropped),
      ann_removed = r.corpus.map(_.annRemoved),
      ann_vacuumed = r.corpus.map(_.annVacuumed),
      model_gen = r.corpus.flatMap(_.modelGen),
      orphans_vacuumed = r.vacuumed.size,
      resolved_deletes = r.resolvedDeletes,
      mirror_from = r.mirrored.map(_._1), mirror_to = r.mirrored.map(_._2),
      cdc_from = r.cdcSynced.map(_._1), cdc_to = r.cdcSynced.map(_._2))
    val df = Seq(row).toDF().coalesce(1)
    if (VersionedTable.currentVersion(spark, dir).isEmpty)
      VersionedTable.initDelta(spark, dir, df, keepVersions)
    else
      VersionedTable.appendDelta(spark, dir, keepVersions) { stage =>
        df.write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(stage)
      }
  }

  /** `runMain graft.lakehouse.Automation <rootDir> [intervalSec]
    * [maxTicks]` — drops land in `<rootDir>/arrivals`, the lakehouse
    * table in `<rootDir>/survey`, the registry in
    * `<rootDir>/registry`. Ctrl-C / SIGTERM stops cleanly after the
    * in-flight tick. */
  def main(args: Array[String]): Unit = {
    val root = args.headOption.getOrElse("/tmp/graft_automation")
    val intervalSec = if (args.length > 1) args(1).toLong else 60L
    val maxTicks = if (args.length > 2) args(2).toLong else -1L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-automation")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(s"$root/arrivals").mkdirs()

    val auto = new Automation(spark, Config(
      srcDir = s"$root/arrivals",
      tableDir = s"$root/survey",
      registryDir = s"$root/registry"))
    Runtime.getRuntime.addShutdownHook(new Thread(() => auto.stop()))
    println(s"[automation] polling every ${intervalSec}s under $root " +
      "(Ctrl-C for clean shutdown)")
    auto.runLoop(intervalSec * 1000, maxTicks, r =>
      println(s"[automation] tick=${r.tick} generated=${r.generated.getOrElse("-")} " +
        s"loaded=${r.load.loaded.size} skipped=${r.load.skipped.size} " +
        s"failed=${r.load.failed.size} expired=${r.expired.size}"))
    spark.stop()
  }
}
