package graft.queries

import graft.SparkTestSession
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** q115 per-source centroid similarity: co-directional sources read
  * cosine ~1, orthogonal sources read exactly 0 (an all-integer zero
  * dot), and a zero-norm source is excluded rather than dividing by
  * zero.
  */
class SourceCentroidSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def axis(j: Int, mag: Float): Seq[Float] =
    Seq.tabulate(64)(k => if (k == j) mag else 0f)

  private lazy val dir: String = {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-centroid").toString
    val docs = Seq(
      (0L, "a"), (1L, "a"), // source a: two docs along e0
      (2L, "b"),            // source b: e0 — same direction as a
      (3L, "c"),            // source c: e1 — orthogonal
      (4L, "z"))            // source z: zero vector — no direction
    docs.map { case (id, s) => (id, s"doc $id", "en", s) }
      .toDF("doc_id", "text", "lang", "source")
      .write.parquet(s"$d/documents.parquet")
    Seq(
      (0L, axis(0, 2f), "l0"), (1L, axis(0, 3f), "l1"),
      (2L, axis(0, 5f), "l2"), (3L, axis(1, 4f), "l3"),
      (4L, axis(0, 0f), "l4"))
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$d/embeddings.parquet")
    d
  }

  test("co-directional sources ~1, orthogonal exactly 0, zero-norm excluded") {
    val m = graft.SparkEntry.queries("q115_source_centroids")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    graft.Caches.release(spark)
    // z never appears (zero norm); the three directed pairs remain
    assert(m.keySet === Set(("a", "b"), ("a", "c"), ("b", "c")))
    assert(math.abs(m(("a", "b")) - 1.0) < 1e-12,
      s"same-direction centroids must read ~1: ${m(("a", "b"))}")
    // the dot is an exact integer zero, so the cosine is EXACTLY 0
    assert(m(("a", "c")) === 0.0)
    assert(m(("b", "c")) === 0.0)
  }

  test("a null embedding slot folds as absent on both engines, never a crash") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-centroid-null").toString
    Seq((0L, "p doc", "en", "p"), (1L, "q doc", "en", "q"))
      .toDF("doc_id", "text", "lang", "source")
      .write.parquet(s"$d/documents.parquet")
    // vec 0 carries a null slot in dim 1 (failed feature extraction):
    // the component drops from ITS centroid only — the q65/q106 skip
    // convention — leaving p purely along e0
    val v0: Seq[java.lang.Float] =
      Seq.tabulate(64)(k => if (k == 0) java.lang.Float.valueOf(2f)
        else if (k == 1) (null: java.lang.Float)
        else java.lang.Float.valueOf(0f))
    val v1: Seq[java.lang.Float] =
      Seq.tabulate(64)(k => java.lang.Float.valueOf(if (k == 0) 3f else 0f))
    Seq((0L, v0, "l0"), (1L, v1, "l1"))
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$d/embeddings.parquet")
    val m = graft.SparkEntry.queries("q115_source_centroids")(spark, d)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    graft.Caches.release(spark)
    assert(m.keySet === Set(("p", "q")))
    assert(math.abs(m(("p", "q")) - 1.0) < 1e-12, s"got $m")
  }
}
