package graft.queries

import graft.{SparkEntry, SparkTestSession}
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** Numeric contract of the int8 quantizer (q63): values land in
  * [-127, 127] with the extremes REACHED (scale = max|x|/127 by
  * definition), round-half-up reconstruction error is bounded by
  * scale/2 per element, and the all-zero vector degenerates to scale 0
  * with an all-zero code instead of an ANSI divide-by-zero.
  */
class QuantizeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def vectors(rows: Seq[(Long, Seq[Float])]): String = {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-quant").toString
    rows.toDF("vec_id", "embedding").write.parquet(s"$d/embeddings.parquet")
    d
  }

  test("q63 codes span [-127, 127], reconstruct within scale/2, zero vector is defined") {
    val dir = vectors(Seq(
      (0L, Seq(1.0f, -0.5f, 0.25f, -1.0f)),  // symmetric extremes
      (1L, Seq(0.001f, 0.002f, 0.003f)),     // tiny magnitudes
      (2L, Seq(0f, 0f, 0f)),                 // zero vector: scale 0 path
      (3L, Seq(42f))))                       // single element → code 127
    val got = SparkEntry.queries("q63_quantize_int8")(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap

    // vector 0: scale = 1/127; codes floor(x*127 + .5) = 127, -63, 32, -127
    val (s0, sum0, min0, max0) = got(0L)
    assert(math.abs(s0 - 1.0 / 127.0) < 1e-15)
    assert((min0, max0) === ((-127L, 127L)), "extremes must be reached")
    assert(sum0 === (127L - 63L + 32L - 127L))

    // vector 2: the zero vector is a defined all-zero code, scale 0
    assert(got(2L) === ((0.0, 0L, 0L, 0L)))

    // vector 3: a lone element is its own max → code exactly 127
    assert(got(3L)._2 === 127L && got(3L)._3 === 127L)

    // reconstruction bound on the tiny-magnitude vector: each original
    // x must be within scale/2 of q·scale (round-half-up's guarantee)
    val (s1, _, min1, max1) = got(1L)
    assert(min1 >= -127L && max1 <= 127L)
    val xs = Seq(0.001f, 0.002f, 0.003f).map(_.toDouble)
    xs.foreach { x =>
      val q = math.floor(x / s1 + 0.5)
      assert(math.abs(x - q * s1) <= s1 / 2 + 1e-12, s"x=$x q=$q scale=$s1")
    }
  }

  test("q65 PQ: identical corpus quantizes exactly; zero and truncated vectors are defined") {
    val v64 = (1 to 64).map(j => math.sin(j).toFloat)
    val dir = vectors(
      (0L to 5L).map(i => (i, v64)) :+
        (6L, Seq.fill(64)(0f)) :+       // zero vector: VALID under L2 PQ
        (7L, Seq(1f, 2f, 3f)))          // truncated extraction → null codes
    val rows = SparkEntry.queries("q65_pq_codes")(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap

    // the sample is all-identical copies, so every codebook centroid IS
    // the vector's own subspace slice: codes tie to 0 and the
    // reconstruction error is EXACTLY zero (same-bits subtraction)
    (0L to 5L).foreach { i =>
      val r = rows(i)
      assert((1 to 4).forall(c => r.getLong(c) == 0L), s"vec $i codes: $r")
      assert(r.getDouble(5) == 0.0, s"identical corpus must reconstruct exactly: $r")
    }
    // the zero vector has no direction but a perfectly defined nearest
    // code — unlike the cosine operators, PQ must NOT drop it
    val zero = rows(6L)
    assert(!zero.isNullAt(1) && !zero.isNullAt(5))
    assert(zero.getDouble(5) > 0.0, "zero vector reconstructs imperfectly")
    // a non-64-dim vector yields null codes and err on BOTH engines
    // rather than a divergent partial distance
    val short = rows(7L)
    assert((1 to 5).forall(short.isNullAt), s"truncated vector must be all null: $short")
  }

  private def vectorsN(rows: Seq[(Long, Seq[java.lang.Float])]): String = {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-quant-null").toString
    rows.toDF("vec_id", "embedding").write.parquet(s"$d/embeddings.parquet")
    d
  }

  test("q65 null-element vector: the affected SUBSPACE nulls, the others code") {
    // DuckDB's list 'sum' skips nulls — an unguarded oracle would give
    // the vector a partial-sum distance and a real code while Spark's
    // SubspaceSqDists nulls the subspace; the guarded mirror poisons
    // the fold the same way (ADVICE r10)
    val v64: Seq[java.lang.Float] =
      (1 to 64).map(j => java.lang.Float.valueOf(math.sin(j).toFloat))
    val withNull = v64.updated(20, null: java.lang.Float) // dim 20 ∈ subspace 1
    val dir = vectorsN((0L to 5L).map(i => (i, v64)) :+ (10L -> withNull))
    // vec_id 10 IS on the modulus sample grid (10 % 5 == 0): the trainer
    // must SKIP it (it would otherwise read the null slot as 0.0f and
    // train on a vector the oracle's filtered psamp never sees)
    val rows = SparkEntry.queries("q65_pq_codes")(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    val nu = rows(10L)
    assert(!nu.isNullAt(1) && nu.getLong(1) == 0L, s"subspace 0 unaffected: $nu")
    assert(nu.isNullAt(2), s"the null element must null ITS subspace's code: $nu")
    assert(!nu.isNullAt(3) && !nu.isNullAt(4), s"later subspaces unaffected: $nu")
    assert(nu.isNullAt(5), "err must be null-poisoned by the incomplete subspace")
    // clean rows still quantize exactly against the identical-copy sample
    (0L to 5L).foreach(i => assert(rows(i).getDouble(5) == 0.0))
  }

  test("q67 null-element vectors: not in the ADC index; null-element query = empty") {
    val boxed: Seq[java.lang.Float] =
      (1 to 64).map(j => java.lang.Float.valueOf(math.cos(j).toFloat))
    val neg = boxed.map(x => java.lang.Float.valueOf(-x.floatValue))
    val withNull = boxed.updated(3, null: java.lang.Float)
    val dir = vectorsN(Seq(0L -> boxed, 5L -> neg, 7L -> withNull))
    val got = SparkEntry.queries("q67_ann_adc")(spark, dir).collect()
    // without the adc-not-null filter the codeless vector would SORT
    // FIRST (Spark asc = nulls first) while DuckDB sorts nulls last
    assert(got.nonEmpty && !got.map(_.getLong(0)).contains(7L),
      "a vector with a null element has no complete code word")
    // a null element in the QUERY vector = no query (the q29/q35 empty)
    val qNull = vectorsN(Seq(0L -> withNull, 5L -> boxed))
    assert(SparkEntry.queries("q67_ann_adc")(spark, qNull).collect().isEmpty)
  }

  test("q67 with a missing or truncated query vector answers empty, not a crash") {
    val v64 = (1 to 64).map(j => math.cos(j).toFloat)
    // no vec_id 0 at all (id 5 keeps the modulus sample non-empty)
    val noQuery = vectors(Seq((5L, v64), (6L, v64.map(-_))))
    assert(SparkEntry.queries("q67_ann_adc")(spark, noQuery).collect().isEmpty,
      "a probe with no query vector is an empty answer — the q29/q35 semantics")
    // vec_id 0 exists but is truncated: same empty answer
    val shortQuery = vectors(Seq((0L, Seq(1f, 2f)), (5L, v64)))
    assert(SparkEntry.queries("q67_ann_adc")(spark, shortQuery).collect().isEmpty)
  }

  test("q63 degenerate vectors: NaN element → null scale + zero codes; empty → all null") {
    // NaN = failed feature extraction (the case every cosine operator
    // guards): under Spark's NaN ordering `NaN > 0` is TRUE, so an
    // unguarded scale would flow NaN into floor — Spark would silently
    // emit zeros while the DuckDB mirror hard-fails casting floor(nan)
    // to BIGINT, killing the whole oracle query. The guard nulls the
    // scale, routing the vector to the defined zero-code path.
    val dir = vectors(Seq(
      (0L, Seq(Float.NaN, 1.0f)),
      (1L, Seq.empty[Float]),
      (2L, Seq(1.0f, -1.0f)))) // sane control row
    val rows = SparkEntry.queries("q63_quantize_int8")(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    val nan = rows(0L)
    assert(nan.isNullAt(1), "NaN vector must have null scale")
    assert((nan.getLong(2), nan.getLong(3), nan.getLong(4)) === ((0L, 0L, 0L)))
    val empty = rows(1L)
    // empty codes sum to NULL on both engines (DuckDB's list_aggregate
    // of an empty list is NULL; the Spark fold is guarded to match)
    assert(empty.isNullAt(1) && empty.isNullAt(2) &&
      empty.isNullAt(3) && empty.isNullAt(4))
    val sane = rows(2L)
    assert(!sane.isNullAt(1) && (sane.getLong(3), sane.getLong(4)) === ((-127L, 127L)))
  }

  test("q73 per-dim calibration: shared code space, extremes per dimension") {
    // per-DIM scales: dim0 absmax 1.0, dim1 absmax 1.0 → both 1/127;
    // unlike q63, vector 1's small values do NOT get their own scale —
    // codes are comparable across vectors (the point of calibration)
    val dir = vectors(Seq(
      (0L, Seq(1.0f, -0.5f)),
      (1L, Seq(0.5f, 0.25f)),
      (2L, Seq(-0.25f, -1.0f))))
    val got = SparkEntry.queries("q73_calibrated_int8")(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(0L) === ((127L - 63L, -63L, 127L)))
    assert(got(1L) === ((64L + 32L, 32L, 64L)))
    assert(got(2L) === ((-32L - 127L, -127L, -32L)))
  }

  test("q73 degenerate: NaN dim nulls that dim for EVERY vector; empty is defined") {
    // a NaN seen during calibration poisons its DIMENSION (scale null →
    // null codes → null-poisoned q_sum corpus-wide), not just its row —
    // the honest semantics for a shared quantizer: the dim is unusable
    val dir = vectors(Seq(
      (0L, Seq(Float.NaN, 1.0f)),
      (1L, Seq(1.0f, 2.0f)),
      (2L, Seq.empty[Float])))
    val rows = SparkEntry.queries("q73_calibrated_int8")(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    // dim1 scale = 2/127; codes: 1.0 → 64 (63.5+.5), 2.0 → 127
    val r0 = rows(0L)
    assert(r0.isNullAt(1), "q_sum must be null-poisoned by the NaN dim")
    assert((r0.getLong(2), r0.getLong(3)) === ((64L, 64L)))
    val r1 = rows(1L)
    assert(r1.isNullAt(1))
    assert((r1.getLong(2), r1.getLong(3)) === ((127L, 127L)))
    // empty embedding: all null, not a crash
    val r2 = rows(2L)
    assert(r2.isNullAt(1) && r2.isNullAt(2) && r2.isNullAt(3))
  }

  test("q73 assignment plan is shuffle-free (calibration baked as literals)") {
    val dir = vectors(Seq((0L, Seq(1.0f, 2.0f)), (1L, Seq(3.0f, 4.0f))))
    val df = SparkEntry.queries("q73_calibrated_int8")(spark, dir)
    df.collect() // finalize THIS QueryExecution under AQE
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p)
  }
}
