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
    "q75_knn_graph", "q76_semantic_dedup")

  for (q <- vecQueries) test(s"$q survives a zero-norm embedding") {
    val rows = graft.SparkEntry.queries(q)(spark, dir).collect()
    // the zero vector must simply be absent from results, never a crash
    assert(!rows.exists(r =>
      r.schema.fieldNames.contains("vec_id") && r.getAs[Long]("vec_id") == 5L))
    spark.catalog.clearCache()
  }
}
