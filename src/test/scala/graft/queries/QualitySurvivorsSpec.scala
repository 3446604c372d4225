package graft.queries

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** q105 — quality-aware survivor selection. Ground truth is computed
  * driver-side from the operator's own inputs (q43 labels × q18
  * qualities): per cluster, the kept doc must be the (quality DESC
  * NULLS LAST, doc_id ASC) argmax, sizes must tile the corpus, and the
  * pick must genuinely differ from q44's min-id somewhere (otherwise
  * the corpus doesn't exercise the ranking).
  */
class QualitySurvivorsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("q105 keeps each cluster's quality argmax; sizes tile the corpus") {
    val labels = graft.SparkEntry.queries("q43_neardup_clusters")(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id"))
    graft.Caches.release(spark)
    val quality = graft.SparkEntry.queries("q18_quality_score")(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        Option(r.get(5)).map(_.asInstanceOf[Double])).toMap
    val got = graft.SparkEntry.queries("q105_quality_survivors")(spark, dir)
      .collect().map(r => r.getAs[Long]("cluster_id") ->
        ((r.getAs[Long]("keep_id"), r.getAs[Long]("cluster_size"))))
      .toMap
    graft.Caches.release(spark)

    val byCluster = labels.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    assert(got.keySet === byCluster.keySet, "one row per cluster")
    assert(got.values.map(_._2).sum === labels.length.toLong,
      "sizes must tile the corpus")
    byCluster.foreach { case (cid, members) =>
      // argmax by (quality desc nulls last, doc_id asc)
      val want = members.minBy(id =>
        (quality(id).map(q => -q).getOrElse(Double.MaxValue), id))
      assert(got(cid)._1 === want,
        s"cluster $cid must keep its quality argmax $want, kept ${got(cid)._1}")
      assert(got(cid)._2 === members.size.toLong)
    }
    // the ranking must matter on this corpus: some multi-doc cluster's
    // quality pick differs from the min-id pick
    val differs = byCluster.exists { case (cid, members) =>
      members.size > 1 && got(cid)._1 != members.min
    }
    assert(differs, "no cluster separates quality-pick from min-id — inert test")
  }

  test("q105 on an all-unique corpus keeps every doc as its own survivor") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-qsurv").toString
    Seq((1L, "alpha bravo charlie delta echo foxtrot"),
        (2L, "golf hotel india juliet kilo lima"),
        (3L, "mike november oscar papa quebec romeo"))
      .toDF("doc_id", "text").write.parquet(s"$d/documents.parquet")
    val got = graft.SparkEntry.queries("q105_quality_survivors")(spark, d)
      .collect().map(r => (r.getAs[Long]("cluster_id"),
        r.getAs[Long]("keep_id"), r.getAs[Long]("cluster_size")))
      .sortBy(_._1)
    assert(got === Seq((1L, 1L, 1L), (2L, 2L, 1L), (3L, 3L, 1L)))
    graft.Caches.release(spark)
  }
}
