package graft.queries

import graft.SparkTestSession
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** LSH bucket-frequency caps (q22 shared-6-gram keys, q25 minhash band
  * keys): a corpus of hundreds of identical documents used to be a single
  * quadratic candidate bucket (~45k pairs from 300 docs); with the cap the
  * hot key is dropped entirely while rare-key near-dups still surface.
  */
class BucketCapSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("pathological corpus: hot buckets capped, rare-bucket pairs survive") {
    import spark.implicits._
    // 300 identical docs — every 6-gram/band key they produce is shared by
    // 300 > MaxBucketDocs/MaxBandDocs docs and must be dropped...
    val hot = (0 until 300).map(i =>
      (i.toLong, "the quick brown fox jumps over the lazy dog again and again"))
    // ...while this isolated duplicate pair keeps its (count=2) keys.
    val pairText = "curious owls ponder ancient manuscripts beneath silver moonlight tonight"
    val pair = Seq((1000L, pairText), (1001L, pairText))
    val dir = Files.createTempDirectory("graft-cap").toString
    (hot ++ pair).toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")

    val q22 = TextAnalysis.queries("q22_ngram_jaccard")(spark, dir).collect()
    assert(q22.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
      == Set((1000L, 1001L)))
    assert(q22.head.getAs[Double]("jaccard") == 1.0)

    val q25 = Similarity.queries("q25_minhash_lsh")(spark, dir).collect()
    assert(q25.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
      == Set((1000L, 1001L)))
    assert(q25.head.getAs[Long]("matches") == 12L) // identical minhash signatures

    val q27 = Similarity.queries("q27_simhash_pairs")(spark, dir).collect()
    assert(q27.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
      == Set((1000L, 1001L))) // identical simhash; hot cluster's bands capped
    assert(q27.head.getAs[Long]("hamming") == 0L)

    // q92: identical payloads = identical dHash — the 300-doc cluster's
    // every band key is hot and capped; the isolated pair survives
    val q92 = Multimodal.queries("q92_media_phash")(spark, dir).collect()
    assert(q92.map(r => (r.getAs[Long]("media_a"), r.getAs[Long]("media_b"))).toSet
      == Set((1000L, 1001L)))
    assert(q92.head.getAs[Long]("hamming") == 0L)

    spark.catalog.clearCache() // drop the queries' persisted intermediates
  }

  test("q116 reports the hot cluster's capped mass and conserves the corpus") {
    import spark.implicits._
    // the pathological fixture again: a 300-doc identical cluster (every
    // one of its band keys is over the cap in EVERY family) plus a
    // rare duplicate pair and the report must see both sides
    val hot = (0 until 300).map(i =>
      (i.toLong, "the quick brown fox jumps over the lazy dog again and again"))
    val pairText = "curious owls ponder ancient manuscripts beneath silver moonlight tonight"
    val pair = Seq((1000L, pairText), (1001L, pairText))
    val dir = Files.createTempDirectory("graft-caphealth").toString
    (hot ++ pair).toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val rows = Similarity.queries("q116_band_health")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6)))).toMap
    spark.catalog.clearCache()
    assert(rows.keySet === Set(0L, 1L, 2L, 3L)) // 4 families at 8-bit width
    rows.values.foreach { case (nBuckets, maxBucket, nCapped, docsCapped, nDocs) =>
      // each family sees every document exactly once
      assert(nDocs === 302L)
      // the identical cluster is THE hot bucket in every family
      assert(maxBucket === 300L)
      assert(nCapped === 1L && docsCapped === 300L)
      // the pair and the cluster occupy ≥ 2 distinct buckets
      assert(nBuckets >= 2L)
    }
  }

  test("caps leave real candidates at the bench corpus (sf0.1)") {
    // the q39 sizing lesson generalized: a cap plus too-coarse keys can
    // silently drop EVERY candidate at scale; each capped query must
    // still produce pairs on the largest corpus the bench runs
    val dir = "/root/testdata/sf0.1"
    val all = TextAnalysis.queries ++ Similarity.queries ++ Multimodal.queries
    for (q <- Seq("q22_ngram_jaccard", "q25_minhash_lsh", "q27_simhash_pairs",
        "q92_media_phash")) {
      assert(all(q)(spark, dir).count() > 0,
        s"$q: cap dropped every candidate at sf0.1")
      spark.catalog.clearCache()
    }
  }
}
