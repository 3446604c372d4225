package graft.streaming

import graft.SparkTestSession
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The servable accumulated IVF index ([[EmbedStream.processIvfBatch]] /
  * [[EmbedStream.ivfTopK]]): after folding the corpus in micro-batches,
  * an external query vector's probe serves byte-identically to the
  * staged batch serve (q68) — same frozen centroids, same cell argmax,
  * same exact cosine and cut — and the marker/compaction protocol holds.
  */
class IvfStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("accumulated IVF probe equals the staged q68 serve; redelivery no-ops; compaction is serve-invariant") {
    val idx = Files.createTempDirectory("graft-ivfidx").toString
    val cents = graft.queries.Similarity.kmeansCentroids(spark, dir)
    val e = graft.Tables(spark, dir, "embeddings")
    // the corpus arrives in three modulus micro-batches
    for (b <- 0 until 3)
      EmbedStream.processIvfBatch(spark,
        e.filter(pmod(col("vec_id"), lit(3)) === b), b.toLong, idx, cents)
    // the external query = vector 0's embedding, floats widened exactly
    val qv: Seq[Double] = e.filter(col("vec_id") === 0)
      .select("embedding").head.getSeq[Float](0).map(_.toDouble).toSeq
    def serve(): Seq[(Long, Long, Double)] =
      EmbedStream.ivfTopK(spark, idx, cents, qv).collect()
        .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("cell"),
          r.getAs[Double]("cos"))).toSeq
    val got = serve()
    val want = graft.SparkEntry.queries("q68_ann_ivf_staged")(spark, dir)
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("cell"),
        r.getAs[Double]("cos"))).toSeq
    spark.catalog.clearCache()
    assert(want.nonEmpty && got == want,
      s"accumulated probe diverged:\n got $got\nwant $want")
    // redelivered committed batch no-ops
    val rows = spark.read.parquet(idx).count()
    EmbedStream.processIvfBatch(spark,
      e.filter(pmod(col("vec_id"), lit(3)) === 1), 1L, idx, cents)
    assert(spark.read.parquet(idx).count() == rows)
    // compaction merges the epochs and the serve is unchanged
    assert(EmbedStream.compactIvfIndex(spark, idx, 2L) == 3)
    assert(BatchProtocol.epochIds(spark, idx) == Seq(-4L))
    assert(serve() == want, "compaction must not change a probe")
  }

  test("takedown: deleteVecs erases a vector from the probe; compaction purges physically, serve-invariant") {
    val idx = Files.createTempDirectory("graft-ivfdel").toString
    val cents = graft.queries.Similarity.kmeansCentroids(spark, dir)
    val e = graft.Tables(spark, dir, "embeddings")
    for (b <- 0 until 3)
      EmbedStream.processIvfBatch(spark,
        e.filter(pmod(col("vec_id"), lit(3)) === b), b.toLong, idx, cents)
    // query = vector 0's own embedding, so vec 0 is the cos=1 top hit —
    // its takedown must both drop the head AND backfill the cut
    val qv: Seq[Double] = e.filter(col("vec_id") === 0)
      .select("embedding").head.getSeq[Float](0).map(_.toDouble).toSeq
    def serve(p: String): Seq[(Long, Long, Double)] =
      EmbedStream.ivfTopK(spark, p, cents, qv).collect()
        .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("cell"),
          r.getAs[Double]("cos"))).toSeq
    assert(serve(idx).headOption.exists(_._1 == 0L),
      "fixture must rank the deleted vector first pre-takedown")
    EmbedStream.deleteVecs(spark, idx, Seq(0L), "t1")
    // rebuild-minus oracle: the same fold over the corpus without vec 0
    val oracleIdx = Files.createTempDirectory("graft-ivfdel-oracle").toString
    for (b <- 0 until 3)
      EmbedStream.processIvfBatch(spark,
        e.filter(col("vec_id") =!= 0)
          .filter(pmod(col("vec_id"), lit(3)) === b), b.toLong, oracleIdx, cents)
    val want = serve(oracleIdx)
    assert(want.nonEmpty && !want.exists(_._1 == 0L))
    assert(serve(idx) == want,
      s"masked probe diverged:\n got ${serve(idx)}\nwant $want")
    // purge: physical absence + serve invariance + consolidated requests
    assert(EmbedStream.compactIvfIndex(spark, idx, 2L) == 3)
    assert(spark.read.parquet(idx).filter(col("vec_id") === 0L).count() == 0,
      "compaction must purge the tombstoned vector's rows")
    assert(serve(idx) == want, "the purge must not change the probe")
  }

  test("a compaction crash's duplicate epochs never surface a vec_id twice; an epoch-less index serves a defined empty") {
    val idx = Files.createTempDirectory("graft-ivfdup").toString
    val cents = graft.queries.Similarity.kmeansCentroids(spark, dir)
    val e = graft.Tables(spark, dir, "embeddings")
    val qv: Seq[Double] = e.filter(col("vec_id") === 0)
      .select("embedding").head.getSeq[Float](0).map(_.toDouble).toSeq
    // an epoch-less root (ops probe before the first batch): a defined
    // empty with the contract schema, not a schema-inference error
    val empty = EmbedStream.ivfTopK(spark, idx, cents, qv)
    assert(empty.collect().isEmpty &&
      empty.columns.toSeq == Seq("vec_id", "cell", "cos"))
    for (b <- 0 until 2)
      EmbedStream.processIvfBatch(spark,
        e.filter(pmod(col("vec_id"), lit(2)) === b), b.toLong, idx, cents)
    def serve(): Seq[(Long, Long, Double)] =
      EmbedStream.ivfTopK(spark, idx, cents, qv).collect()
        .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("cell"),
          r.getAs[Double]("cos"))).toSeq
    val want = serve()
    // snapshot, compact, restore — the crash-between-rename-and-cleanup
    // state: each merged row duplicated beside its consolidated copy
    val src = java.nio.file.Paths.get(idx)
    val snap = Files.createTempDirectory("graft-ivfdup-snap")
    def copyTree(from: java.nio.file.Path, to: java.nio.file.Path): Unit = {
      val st = java.nio.file.Files.walk(from)
      try st.forEach { p =>
        val t = to.resolve(from.relativize(p))
        if (java.nio.file.Files.isDirectory(p)) java.nio.file.Files.createDirectories(t)
        else java.nio.file.Files.copy(p, t,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      } finally st.close()
    }
    Seq(0L, 1L).foreach(id => copyTree(src.resolve(s"batch_id=$id"),
      snap.resolve(s"batch_id=$id")))
    assert(EmbedStream.compactIvfIndex(spark, idx, 1L) == 2)
    Seq(0L, 1L).foreach(id => copyTree(snap.resolve(s"batch_id=$id"),
      src.resolve(s"batch_id=$id")))
    assert(BatchProtocol.epochIds(spark, idx).sorted == Seq(-3L, 0L, 1L))
    val got = serve()
    assert(got == want, s"duplicate epochs changed the probe: $got vs $want")
    assert(got.map(_._1).distinct.size == got.size,
      "no vec_id may surface twice through the crash window")
  }

  test("a zero-norm query vector serves a defined empty") {
    val idx = Files.createTempDirectory("graft-ivfidx0").toString
    val cents = graft.queries.Similarity.kmeansCentroids(spark, dir)
    EmbedStream.processIvfBatch(spark,
      graft.Tables(spark, dir, "embeddings").limit(20), 0L, idx, cents)
    val out = EmbedStream.ivfTopK(spark, idx, cents, Seq.fill(64)(0.0))
    assert(out.collect().isEmpty &&
      out.columns.toSeq == Seq("vec_id", "cell", "cos"))
  }
}
