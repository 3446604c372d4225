package graft.multimodal

import graft.SparkTestSession
import graft.multimodal.Media.{DecodedMedia, MediaItem, StubCodec}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MediaSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("mediaTable schema: opaque binary payload + typed columns") {
    val m = Media.mediaTable(spark, dir)
    assert(m.schema("payload").dataType.typeName == "binary")
    assert(m.schema("kind").dataType.typeName == "string")
    val kinds = m.select("kind").distinct().as[String].collect().toSet
    assert(kinds == Set("image", "audio", "video"))
  }

  test("mapPartitions codec path agrees with the expression path row-for-row") {
    val m = Media.mediaTable(spark, dir)
    val typed = m.as[MediaItem]
    val viaCodec = Media.decodeWith(typed, StubCodec)
    val exprCols = Media.decodeCols(col("payload")).map { case (n, c) => c.as(n) }
    val viaExpr = m.select(col("media_id") +: col("kind") +: exprCols: _*)
      .as[DecodedMedia]
    val a = viaCodec.collect().sortBy(_.media_id)
    val b = viaExpr.collect().sortBy(_.media_id)
    assert(a.length == b.length && a.length > 0)
    a.zip(b).foreach { case (x, y) => assert(x == y) }
  }

  test("q92 phash: a near-identical image pair surfaces with tiny hamming") {
    // two 80-char payloads differing in ONE character at position 40:
    // pixel (4,4) of the 8x9 grid changes, which can flip at most the
    // two adjacent dHash comparisons in row 4 — hamming <= 2, well
    // under the <=8 cut. Decoys are structurally different payloads.
    val base = ("the quick brown fox jumps over the lazy dog while " +
      "seven wizards brew strong tea").take(80)
    val near = base.updated(40, 'x')
    val docs = Seq(
      (0L, base), (1L, near),
      (2L, "completely different content about mountain ranges and glacial valleys"),
      (3L, "yet another unrelated document describing maritime navigation routes"))
    val dir = java.nio.file.Files.createTempDirectory("graft-phash").toString
    docs.toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val rows = graft.queries.Multimodal.queries("q92_media_phash")(spark, dir)
      .collect()
      .map(r => (r.getAs[Long]("media_a"), r.getAs[Long]("media_b")) ->
        r.getAs[Long]("hamming")).toMap
    spark.catalog.clearCache()
    assert(rows.contains((0L, 1L)),
      s"planted near-identical pair not found; got ${rows.keySet}")
    assert(rows((0L, 1L)) <= 2L,
      s"one changed pixel flipped ${rows((0L, 1L))} dHash bits")
  }

  test("q131: same image + same text = dup; same image + diverged text = conflict") {
    // docs 0/1 share their first 72 chars — the ENTIRE pixel plane (the
    // dHash grid reads 72 cycled chars), so their media sketches are
    // identical — but the texts diverge into disjoint 19-word tails, so
    // the simhash pair is NOT a text near-dup: a caption conflict.
    // docs 10/11 are verbatim-identical records: media pair AND text
    // pair — a full duplicate, not a conflict.
    val head = ("the quick brown fox jumps over the lazy dog while " +
      "seven wizards brew strong tea").take(72)
    val tailA = " alpha beta gamma delta epsilon zeta eta theta iota kappa" +
      " lambda mu nu xi omicron pi rho sigma tau"
    val tailB = " one two three four five six seven eight nine ten eleven" +
      " twelve thirteen fourteen fifteen sixteen seventeen eighteen nineteen"
    val docs = Seq(
      (0L, head + tailA), (1L, head + tailB),
      (10L, "identical caption and identical image payload entirely"),
      (11L, "identical caption and identical image payload entirely"),
      (20L, "completely different content about mountain ranges and glacial valleys"))
    val dir = java.nio.file.Files.createTempDirectory("graft-conflict").toString
    docs.toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val rows = graft.queries.Multimodal.queries("q131_caption_conflicts")(spark, dir)
      .collect()
      .map(r => (r.getAs[Long]("media_a"), r.getAs[Long]("media_b")) ->
        ((r.getAs[Boolean]("text_dup"), r.getAs[Boolean]("conflict")))).toMap
    graft.Caches.release(spark)
    assert(rows.contains((0L, 1L)) && rows.contains((10L, 11L)),
      s"expected both planted media pairs; got ${rows.keySet}")
    assert(rows((0L, 1L)) === ((false, true)), s"diverged captions: $rows")
    assert(rows((10L, 11L)) === ((true, false)), s"full duplicate: $rows")
  }

  test("q111 clusters: the planted near-pair merges; decoys stay singletons") {
    // q92's fixture driven one step further: the near-identical pair
    // must land in ONE cluster labeled by its min id, every decoy in a
    // singleton labeled by itself — the q43 action on the media edges
    val base = ("the quick brown fox jumps over the lazy dog while " +
      "seven wizards brew strong tea").take(80)
    val near = base.updated(40, 'x')
    val docs = Seq(
      (0L, base), (1L, near),
      (2L, "completely different content about mountain ranges and glacial valleys"),
      (3L, "yet another unrelated document describing maritime navigation routes"))
    val dir = java.nio.file.Files.createTempDirectory("graft-phashcl").toString
    docs.toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val cl = graft.queries.Multimodal.queries("q111_media_clusters")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    graft.Caches.release(spark)
    assert(cl === Map(0L -> 0L, 1L -> 0L, 2L -> 2L, 3L -> 3L))
  }

  test("codec path preserves partitioning (no shuffle, one codec per task)") {
    val typed = Media.mediaTable(spark, dir).as[MediaItem]
    val decoded = Media.decodeWith(typed, StubCodec)
    assert(decoded.rdd.getNumPartitions == typed.rdd.getNumPartitions)
    // the physical plan is a narrow map — no Exchange above the scan
    val plan = decoded.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") || plan.indexOf("Exchange") >
      plan.indexOf("MapPartitions") || !plan.contains("MapPartitions"))
  }
}
