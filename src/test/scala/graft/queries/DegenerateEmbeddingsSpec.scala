package graft.queries

import graft.SparkTestSession
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** Zero-norm vectors (padding rows, failed feature extraction) must not
  * kill the similarity operators: under Spark 4's default ANSI mode a
  * cosine against a zero vector is a DIVIDE_BY_ZERO job-killer, the
  * embeddings analogue of DegenerateTextSpec's empty documents. A zero
  * embedding has no direction — the operators exclude it up front.
  */
class DegenerateEmbeddingsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private lazy val dir: String = {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-degen-emb").toString
    val rows = (0L until 12L).map { i =>
      val v: Seq[java.lang.Float] =
        if (i == 5L) Seq.fill(64)(java.lang.Float.valueOf(0f)) // zero vector
        else {
          val base = (1 to 64).map(j =>
            java.lang.Float.valueOf(math.sin(i * 64 + j).toFloat))
          // vec 6: one null element (failed feature extraction slot) —
          // dot products fold it as +0 on BOTH engines (Spark reads the
          // null slot as 0.0f; DuckDB's 'sum' skips the null term), so
          // the cosine family must keep it, never crash on it
          if (i == 6L) base.updated(20, null: java.lang.Float) else base
        }
      (i, v, s"label$i")
    }
    rows.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$d/embeddings.parquet")
    d
  }

  private val vecQueries = Seq(
    "q28_cosine_neardup", "q29_ann_topk", "q30_ann_lsh",
    "q35_ann_ivf", "q39_cosine_neardup_lsh", "q68_ann_ivf_staged",
    "q75_knn_graph", "q76_semantic_dedup", "q84_hard_negatives",
    "q91_ann_ivf_adc", "q95_ann_recall_audit", "q96_label_separation",
    "q101_cluster_balanced",
    // the zero vector (id 5, odd) arrives via the streamed sidecar leg,
    // the null-element vector (id 6, even) via the staged leg — both
    // must drop at encoding (the shared pqCodes guards), never crash
    "q173_adc_union_serve",
    // the takedown probe masks residue-1 ids on top of the same guards
    "q174_takedown_adc",
    // the feedback loop's round 1 drops the degenerate queries (the
    // q122 guards), so they never pull a q' either — absent, not a crash
    "q179_rocchio_ann")

  for (q <- vecQueries) test(s"$q survives a zero-norm embedding") {
    val rows = graft.SparkEntry.queries(q)(spark, dir).collect()
    // the zero vector must simply be absent from results, never a crash
    assert(!rows.exists(r =>
      r.schema.fieldNames.contains("vec_id") && r.getAs[Long]("vec_id") == 5L))
    spark.catalog.clearCache()
  }

  // ---- VERDICT r10 item 7: q67/q68 degenerate rows ----------------------

  private lazy val allZeroDir: String = {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-degen-allzero").toString
    (0L until 12L).map(i => (i, Seq.fill(64)(0f), s"label$i"))
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$d/embeddings.parquet")
    d
  }

  test("all-zero corpus: cosine family raises the documented contract error, never hangs") {
    // an all-zero corpus has no directions to quantize — kmeansCentroids
    // documents this as a contract error ("a contract error, not a
    // hang"); the failure must be THAT message, not a DIVIDE_BY_ZERO
    // kill or an empty-collection crash deep in a Lloyd step
    for (q <- Seq("q35_ann_ivf", "q68_ann_ivf_staged", "q76_semantic_dedup",
        "q91_ann_ivf_adc", "q95_ann_recall_audit", "q101_cluster_balanced")) {
      val e = intercept[IllegalArgumentException] {
        graft.SparkEntry.queries(q)(spark, allZeroDir).collect()
      }
      assert(e.getMessage.contains("non-zero sample vector"), s"$q: ${e.getMessage}")
      spark.catalog.clearCache()
    }
  }

  test("all-zero corpus: the L2/PQ family (q63, q65, q67, q73) still answers") {
    // L2 has no divide to guard: zero subvectors are legitimate training
    // points, every code resolves, and ADC distances are exactly 0
    val codes = graft.SparkEntry.queries("q65_pq_codes")(spark, allZeroDir).collect()
    assert(codes.length == 12 && codes.forall(_.getAs[Double]("err") == 0.0))
    val adc = graft.SparkEntry.queries("q67_ann_adc")(spark, allZeroDir).collect()
    assert(adc.nonEmpty && adc.forall(_.getAs[Double]("adc") == 0.0))
    for (q <- Seq("q63_quantize_int8", "q73_calibrated_int8")) {
      assert(graft.SparkEntry.queries(q)(spark, allZeroDir).collect().length == 12, q)
      spark.catalog.clearCache()
    }
  }

  test("tiny corpus: staged probe tolerates near-empty cells and stays q35-identical") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-degen-tiny").toString
    // 3 usable vectors + 1 zero vector: fewer vectors than cells or k —
    // the probe must answer with what exists, and staging must not
    // diverge from the compute path when probed cells are nearly empty
    val rows = (0L until 4L).map { i =>
      val v =
        if (i == 3L) Seq.fill(64)(0f)
        else (1 to 64).map(j => math.cos(i * 64 + j).toFloat)
      (i, v, s"label$i")
    }
    rows.toDF("vec_id", "embedding", "label").write.parquet(s"$d/embeddings.parquet")
    val compute = graft.SparkEntry.queries("q35_ann_ivf")(spark, d).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("cell"), r.getAs[Double]("cos")))
    val staged = graft.SparkEntry.queries("q68_ann_ivf_staged")(spark, d).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("cell"), r.getAs[Double]("cos")))
    assert(compute.nonEmpty && compute.length < 10,
      s"tiny corpus should answer with fewer than k rows, got ${compute.length}")
    assert(staged.toSeq == compute.toSeq,
      s"staged diverged on the tiny corpus:\n${staged.toSeq}\nvs\n${compute.toSeq}")
    spark.catalog.clearCache()
  }
}
