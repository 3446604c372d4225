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
