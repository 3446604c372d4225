package graft.queries

import graft.SparkTestSession
import graft.functions.TextFunctions
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** q110 semantic cross-split decontamination: a train vector identical in
  * direction to an eval vector is flagged with its cosine; train vectors
  * with no eval neighbor re-admit clean; eval vectors never appear in the
  * verdict table; a zero-norm train vector can only ever be clean (it is
  * outside the candidate machinery by the q28 guard).
  */
class SemanticDecontamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** q56's split rule, computed driver-side (portableHashLocal is the
    * same first-4-bytes-of-sha256 value bucketCol uses).
    */
  private def splitOf(id: Long): String = {
    val b = TextFunctions.portableHashLocal(id.toString) % 100
    if (b < 80) "train" else if (b < 90) "val" else "test"
  }

  private def axis(j: Int, mag: Float): Seq[Float] =
    Seq.tabulate(64)(k => if (k == j) mag else 0f)

  test("train vectors near an eval vector flag; isolated train vectors stay clean") {
    import spark.implicits._
    // pick concrete ids for each role from the hash-determined splits —
    // the operator derives splits itself, so the fixture must agree
    val ids = (0L until 60L)
    val trainIds = ids.filter(splitOf(_) == "train")
    val evalIds = ids.filter(splitOf(_) != "train")
    assert(trainIds.size >= 3 && evalIds.nonEmpty)
    val leakyTrain = trainIds(0) // same direction as the eval vector
    val cleanTrain = trainIds(1) // orthogonal — no eval neighbor
    val zeroTrain = trainIds(2)  // zero-norm — outside the machinery
    val evalVec = evalIds.head
    val rows = Seq(
      (leakyTrain, axis(0, 2f), "t-leak"),
      (cleanTrain, axis(1, 3f), "t-clean"),
      (zeroTrain, axis(0, 0f), "t-zero"),
      (evalVec, axis(0, 5f), "e-source"))
    val d = Files.createTempDirectory("graft-semdecon").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$d/embeddings.parquet")
    val out = graft.SparkEntry.queries("q110_semantic_decontam")(spark, d)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2)),
          r.getBoolean(3)))).toMap
    // the verdict table holds exactly the train vectors
    assert(out.keySet === Set(leakyTrain, cleanTrain, zeroTrain))
    // identical direction ⇒ same bucket in every band family ⇒ the pair
    // is seen, and cos = 1 exactly
    assert(out(leakyTrain) === ((1L, Some(1.0), true)))
    assert(out(cleanTrain) === ((0L, None, false)))
    assert(out(zeroTrain) === ((0L, None, false)))
    graft.Caches.release(spark)
  }

  test("train-train proximity alone never flags") {
    import spark.implicits._
    val ids = (0L until 60L)
    val trainIds = ids.filter(splitOf(_) == "train")
    val rows = Seq(
      (trainIds(0), axis(0, 2f), "a"),
      (trainIds(1), axis(0, 4f), "b")) // identical direction, both train
    val d = Files.createTempDirectory("graft-semdecon-tt").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$d/embeddings.parquet")
    val out = graft.SparkEntry.queries("q110_semantic_decontam")(spark, d)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(out === Map(trainIds(0) -> false, trainIds(1) -> false))
    graft.Caches.release(spark)
  }
}
