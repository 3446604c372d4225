package graft.queries

import graft.{Caches, SparkEntry, SparkTestSession}
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** q128 embedding-health audit: the counts classify exactly (null
  * vector / null element / zero norm), unhealthy vectors stay OUT of
  * the quantile envelope, and the envelope itself lands on the exact
  * fixed-point squared norms (cell-aligned fixtures make the grid
  * floor a no-op, so the expected values are hand-computable).
  */
class EmbeddingHealthSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val NullF: java.lang.Float = null
  private def vf(xs: Float*): Seq[java.lang.Float] =
    xs.map(java.lang.Float.valueOf)

  test("q128 classifies degenerate vectors and envelopes healthy norms per source") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-ehealth").toString
    Seq((0L, "a0", "en", "A"), (1L, "a1", "en", "A"), (2L, "a2", "en", "A"),
        (10L, "b0", "en", "B"), (11L, "b1", "en", "B"),
        (12L, "b2", "en", "B"), (13L, "b3", "en", "B"))
      .toDF("doc_id", "text", "lang", "source")
      .write.parquet(s"$d/documents.parquet")
    // A: three healthy vectors with sq = 2·(0.5·2^20)² = 549755813888
    // (cell-aligned: 128·2^32 exactly), so q1 = med = q3 = that value.
    // B: one null vector, one null-element vector (both excluded from
    // the envelope), one zero vector (sq 0 — IS in the envelope), one
    // healthy at sq = 2·(0.25·2^20)² = 137438953472 (32·2^32): over
    // {0, 137438953472} the rank selections give q1 = med = 0,
    // q3 = 137438953472.
    val half = vf(0.5f, 0.5f)
    Seq((0L, half, "l"), (1L, half, "l"), (2L, half, "l"),
        (10L, null.asInstanceOf[Seq[java.lang.Float]], "l"),
        (11L, Seq(NullF, java.lang.Float.valueOf(0.1f)), "l"),
        (12L, vf(0f, 0f), "l"), (13L, vf(0.25f, 0.25f), "l"))
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$d/embeddings.parquet")
    val got = SparkEntry.queries("q128_embedding_health")(spark, d)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6), r.getLong(7)))).toMap
    Caches.release(spark)
    assert(got("A") === ((3L, 0L, 0L, 0L,
      549755813888L, 549755813888L, 549755813888L)), got("A"))
    assert(got("B") === ((4L, 1L, 1L, 1L,
      0L, 0L, 137438953472L)), got("B"))
  }

  test("q128 on an all-degenerate source reports null quantiles, never a crash") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-ehealth2").toString
    Seq((0L, "x", "en", "X"))
      .toDF("doc_id", "text", "lang", "source")
      .write.parquet(s"$d/documents.parquet")
    Seq((0L, null.asInstanceOf[Seq[java.lang.Float]], "l"))
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$d/embeddings.parquet")
    val rows = SparkEntry.queries("q128_embedding_health")(spark, d).collect()
    Caches.release(spark)
    assert(rows.length === 1)
    val r = rows.head
    assert(r.getString(0) === "X" && r.getLong(1) === 1L &&
      r.getLong(2) === 1L && r.isNullAt(5) && r.isNullAt(6) && r.isNullAt(7))
  }
}
