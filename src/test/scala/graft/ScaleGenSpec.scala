package graft

import org.apache.spark.sql.functions._

/** Contract of the scale-up datagen (ScaleGen): the soak's exponents
  * are only meaningful if the generated tables are drop-in
  * substitutes for the driver data (same schema through the Tables
  * loaders), deterministic (a re-generation times the same bytes),
  * and carry the planted structure the dedup/ANN queries need. */
class ScaleGenSpec extends SparkSpec {

  test("sizes ladder matches the driver testdata at sf0.1") {
    val sz = ScaleGen.sizes(0.1)
    assert(sz.lineitem == 600000L && sz.orders == 150000L &&
      sz.customer == 15000L && sz.part == 20000L &&
      sz.supplier == 1000L && sz.events == 100000L &&
      sz.documents == 5000L && sz.embeddings == 2000L)
  }

  test("every generated table reads through Tables with the same " +
      "schema as the driver data") {
    val dir = tmpDir("scalegen-schema")
    ScaleGen.writeAll(spark, 0.002, dir)
    Tables.all.foreach { t =>
      val gen = Tables.load(spark, dir, t)
      val real = Tables.load(spark, sfDir, t)
      // events normalizes through Tables.events on both sides
      val (g, r) =
        if (t == "events") (Tables.events(spark, dir),
          Tables.events(spark, sfDir))
        else (gen, real)
      assert(g.schema.map(f => (f.name, f.dataType)) ==
        r.schema.map(f => (f.name, f.dataType)),
        s"$t: ${g.schema.treeString} vs ${r.schema.treeString}")
    }
  }

  test("generation is deterministic: regenerating yields identical rows") {
    val d1 = tmpDir("scalegen-det1"); val d2 = tmpDir("scalegen-det2")
    ScaleGen.writeAll(spark, 0.002, d1)
    ScaleGen.writeAll(spark, 0.002, d2)
    Seq("lineitem", "documents", "embeddings").foreach { t =>
      val a = Tables.load(spark, d1, t)
      val b = Tables.load(spark, d2, t)
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty, t)
    }
  }

  test("embeddings are unit-norm with 0..9 labels; documents carry " +
      "the planted near-dup fraction and a corpus-scaled vocabulary") {
    val dir = tmpDir("scalegen-struct")
    ScaleGen.writeAll(spark, 0.01, dir)
    val emb = Tables.embeddings(spark, dir)
    val norms = emb.select(
      sqrt(aggregate(col("embedding"),
        lit(0.0), (a, x) => a + x * x)).as("n"))
      .agg(min("n"), max("n")).head
    assert(math.abs(norms.getDouble(0) - 1.0) < 1e-5 &&
      math.abs(norms.getDouble(1) - 1.0) < 1e-5)
    assert(emb.agg(min("label"), max("label")).head.toSeq ==
      Seq(0, 9))
    // ~5 % of docs are near-dups of a base doc: at mutation rate 1/20
    // most dup docs still shingle-match their parent above 0.5 — the
    // q31 pair set over the generated corpus must be non-degenerate
    // and roughly fraction-sized (not quadratic)
    val nDocs = Tables.documents(spark, dir).count()
    val pairs = SparkEntry.queries("q31_ngram_jaccard")(spark, dir).count()
    assert(pairs > nDocs / 100, s"only $pairs near-dup pairs for $nDocs docs")
    assert(pairs < nDocs, s"$pairs pairs for $nDocs docs — degenerate corpus")
    // Heaps-style vocabulary: distinct words grow with the corpus
    def vocabOf(d: String) = Tables.documents(spark, d)
      .select(explode(split(col("text"), " ")).as("w"))
      .agg(countDistinct(col("w"))).head.getLong(0)
    val small = tmpDir("scalegen-vocab-small")
    ScaleGen.writeAll(spark, 0.002, small)
    assert(vocabOf(dir) > vocabOf(small),
      "vocabulary must scale with the corpus (fixed vocab makes " +
        "shingle df grow linearly and the PPJoin candidate space " +
        "quadratically — a degenerate-data artifact)")
  }
}
