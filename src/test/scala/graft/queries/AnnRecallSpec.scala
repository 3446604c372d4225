package graft.queries

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Quality regression bounds for the approximate similarity operators
  * against their exact baselines on sf0.01 — hash-match proves each
  * matches ITS OWN oracle; these prove the approximations stay USEFUL
  * (a quantizer regression that tanked recall would otherwise pass
  * correctness silently).
  */
class AnnRecallSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.01"

  private def run(q: String) = graft.SparkEntry.queries(q)(spark, dir)

  test("q35 IVF (k-means, nprobe=2 of ~sqrt(n) cells) finds most of the exact top-10") {
    val exact = run("q29_ann_topk").collect().map(_.getAs[Long]("vec_id")).toSet
    val ivf = run("q35_ann_ivf").collect().map(_.getAs[Long]("vec_id")).toSet
    assert((ivf & exact).size >= 5, s"IVF recall collapsed: ${(ivf & exact).size}/10")
    spark.catalog.clearCache()
  }

  test("q30 single-band LSH ranks the query's own bucket sanely") {
    // single 6-plane family = deliberately low recall; the invariant is
    // that the query vector itself tops its bucket with cosine 1
    val rows = run("q30_ann_lsh").collect()
    val self = rows.find(_.getAs[Long]("vec_id") == 0L)
    assert(self.isDefined && math.abs(self.get.getAs[Double]("cos") - 1.0) < 1e-9)
  }

  test("q39 banded-LSH pairs are a subset of brute-force with recall >= 0.6") {
    val brute = run("q28_cosine_neardup").collect()
      .map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))).toSet
    val lsh = run("q39_cosine_neardup_lsh").collect()
      .map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))).toSet
    assert(lsh.subsetOf(brute), "LSH emitted a pair brute-force did not")
    assert(lsh.size.toDouble / brute.size >= 0.6,
      s"banded-LSH recall collapsed: ${lsh.size}/${brute.size}")
    spark.catalog.clearCache()
  }

  test("q25 minhash-LSH recalls >= 0.6 of the exact n-gram Jaccard pairs (q22)") {
    // the sketch-dedup usefulness bound: a banding regression that kept
    // hash-parity but stopped finding the exact-Jaccard near-dups would
    // otherwise pass correctness silently. (Measured 25/25 at sf0.01 —
    // the corpus's J>=0.2 pairs are all J>=0.8, where 3 bands of 4
    // minhashes have ~0.8+ collision probability.)
    val exact = run("q22_ngram_jaccard").collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val lsh = run("q25_minhash_lsh").collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(exact.nonEmpty, "exact-Jaccard truth set is empty — corpus changed?")
    assert((lsh & exact).size.toDouble / exact.size >= 0.6,
      s"minhash-LSH recall collapsed: ${(lsh & exact).size}/${exact.size}")
    spark.catalog.clearCache()
  }

  test("q27 finds EVERY hamming<=8 pair that shares an uncapped band (recall 1.0 on the cap contract)") {
    // q27's completeness is DETERMINISTIC, not probabilistic: banding is
    // exhaustive over the sketch, so the only pairs it may miss are those
    // whose every shared band key exceeds MaxBandDocs — the documented
    // skew-cap trade (a mass-duplicate cluster is deliberately not
    // enumerated as O(m²) pairs). Against raw hamming<=8 truth the sf0.01
    // corpus is degenerate — 66k of 125k pairs are within hamming 8, so
    // the cap drops whole clusters and raw recall is ~0.08 BY DESIGN; the
    // honest bound is exact-set equality against the cap-contract truth,
    // which pins every banding ingredient (shift, mask, width, cap, join).
    val sims = run("q26_simhash").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("simhash")))
    val w = Similarity.bandWidthFor(sims.length)
    val nb = 32 / w
    val mask = (1L << w) - 1
    def keys(h: Long): Seq[(Int, Long)] =
      (0 until nb).map(b => (b, (h >> (w * b)) & mask))
    val freq = sims.iterator.flatMap { case (_, h) => keys(h) }
      .toSeq.groupBy(identity).map { case (k, v) => k -> v.size }
    val truth = (for {
      i <- sims.indices.iterator
      j <- (i + 1) until sims.length
      (ida, ha) = sims(i)
      (idb, hb) = sims(j)
      if java.lang.Long.bitCount(ha ^ hb) <= 8
      if keys(ha).zip(keys(hb)).exists { case (ka, kb) =>
        ka == kb && freq(ka) <= Similarity.MaxBandDocs }
    } yield (math.min(ida, idb), math.max(ida, idb))).toSet
    val got = run("q27_simhash_pairs").collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(truth.nonEmpty, "cap-contract truth set is empty — corpus changed?")
    assert(got == truth,
      s"q27 emitted ${got.size} pairs vs ${truth.size} cap-contract truth " +
      s"(missed ${(truth -- got).size}, extra ${(got -- truth).size})")
    spark.catalog.clearCache()
  }

  test("q42 finds EVERY 64-bit hamming<=8 pair that shares an uncapped band") {
    // same deterministic cap-contract bound as q27, over the (lo, hi)
    // two-half fingerprint — pins the half-boundary band selection, the
    // seeded second hash, and the summed hamming
    import graft.functions.TextFunctions.{portableHash, tokens}
    import graft.functions.SketchFunctions.simHash32
    import org.apache.spark.sql.functions._
    val sims = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), array_distinct(tokens(col("text"))).as("dtk"))
      .select(col("doc_id"),
        simHash32(transform(col("dtk"), t => portableHash(t))).as("lo"),
        simHash32(transform(col("dtk"), t => portableHash(t, 1))).as("hi"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val w = Similarity.bandWidth64For(sims.length)
    val nb = 64 / w
    val nbLo = 32 / w
    val mask = (1L << w) - 1
    def keys(lo: Long, hi: Long): Seq[(Int, Long)] = (0 until nb).map { b =>
      (b, if (b < nbLo) (lo >> (w * b)) & mask
          else (hi >> (w * (b - nbLo))) & mask)
    }
    val freq = sims.iterator.flatMap { case (_, lo, hi) => keys(lo, hi) }
      .toSeq.groupBy(identity).map { case (k, v) => k -> v.size }
    val truth = (for {
      i <- sims.indices.iterator
      j <- (i + 1) until sims.length
      (ida, loa, hia) = sims(i)
      (idb, lob, hib) = sims(j)
      if java.lang.Long.bitCount(loa ^ lob) + java.lang.Long.bitCount(hia ^ hib) <= 8
      if keys(loa, hia).zip(keys(lob, hib)).exists { case (ka, kb) =>
        ka == kb && freq(ka) <= Similarity.MaxBandDocs }
    } yield (math.min(ida, idb), math.max(ida, idb))).toSet
    val got = run("q42_simhash64_pairs").collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(truth.nonEmpty, "cap-contract truth set is empty — corpus changed?")
    assert(got == truth,
      s"q42 emitted ${got.size} pairs vs ${truth.size} cap-contract truth " +
      s"(missed ${(truth -- got).size}, extra ${(got -- truth).size})")
    spark.catalog.clearCache()
  }

  test("q68 staged IVF answers exactly what the compute-side q35 answers") {
    // staging is physical, not semantic: same centroids, same assignment,
    // same probe arithmetic — the result sets must be IDENTICAL, bitwise
    val compute = run("q35_ann_ivf").collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("cell"), r.getAs[Double]("cos")))
    val staged = run("q68_ann_ivf_staged").collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("cell"), r.getAs[Double]("cos")))
    assert(staged.toSeq == compute.toSeq,
      s"staged probe diverged from compute probe:\n$staged\nvs\n$compute")
    spark.catalog.clearCache()
  }

  test("q67 ADC: query's ADC equals its q65 reconstruction error; recall vs exact L2 holds") {
    val adc = run("q67_ann_adc").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("adc")).toMap
    // exact identity, not an envelope: ADC of the query vector is the
    // distance to its OWN codes' reconstruction — q65's err, same folds
    val errs = run("q65_pq_codes").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("err")).toMap
    adc.get(0L).foreach(a =>
      assert(a == errs(0L), s"ADC(query)=$a must equal its PQ err=${errs(0L)}"))
    // usefulness bound vs the exact L2 top-10 (computed here from the
    // raw vectors): 4 subspaces × 16 codes is a coarse quantizer, but a
    // codebook regression that tanked recall must not pass silently
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
      .filter(_._2.length == 64)
    val q = vecs.find(_._1 == 0L).get._2
    def l2(a: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < 64) { val t = a(i) - q(i); s += t * t; i += 1 }
      s
    }
    val exact = vecs.map { case (id, v) => (id, l2(v)) }
      .sortBy { case (id, d) => (d, id) }.take(10).map(_._1).toSet
    val recall = (adc.keySet & exact).size
    assert(recall >= 3, s"ADC recall collapsed: $recall/10")
  }

  test("q91 composed IVF→ADC: agrees with full-corpus ADC on shared ids; recall holds") {
    val comp = run("q91_ann_ivf_adc").collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("cell"), r.getAs[Double]("adc")))
    assert(comp.nonEmpty, "composed probe returned nothing at sf0.01")
    // the probed-cell restriction changes WHICH vectors compete, never
    // their distances: any id in both top-10s must carry the SAME adc
    val full = run("q67_ann_adc").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("adc")).toMap
    comp.foreach { case (id, _, a) =>
      full.get(id).foreach(fa =>
        assert(fa == a, s"vec $id: composed adc $a != full-corpus adc $fa"))
    }
    // the query's own cell is always probed (its assigned cell IS its
    // top-affinity cell), so vec 0 competes; its ADC is its q65 err
    val errs = run("q65_pq_codes").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("err")).toMap
    comp.find(_._1 == 0L).foreach { case (_, _, a) =>
      assert(a == errs(0L), s"ADC(query)=$a must equal its PQ err=${errs(0L)}") }
    // usefulness floor vs exact L2 (nprobe=2 of ~sqrt(n) cells ON TOP of
    // the coarse 4x16 quantizer — the floor composes both truncations)
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
      .filter(_._2.length == 64)
    val q = vecs.find(_._1 == 0L).get._2
    def l2(a: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < 64) { val t = a(i) - q(i); s += t * t; i += 1 }
      s
    }
    val exact = vecs.map { case (id, v) => (id, l2(v)) }
      .sortBy { case (id, d) => (d, id) }.take(10).map(_._1).toSet
    val recall = (comp.map(_._1).toSet & exact).size
    assert(recall >= 3, s"composed IVF→ADC recall collapsed: $recall/10")
    spark.catalog.clearCache()
  }

  test("q122 batch serve reproduces q91's single-query answer for the shared query") {
    // qid 0 is in the modulus sample (0 % qmod == 0) and q91 serves
    // exactly that query — the batched plan must return the identical
    // ranked top-10 for it, and a full top-10 for every sampled query
    val single = run("q91_ann_ivf_adc").collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("adc"))).toSeq
    spark.catalog.clearCache()
    val batch = run("q122_ann_serve_batch").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    spark.catalog.clearCache()
    val q0 = batch.filter(_._1 == 0L).sortBy(_._2).map(r => (r._3, r._4)).toSeq
    assert(q0 === single, "batch row for qid 0 must equal the q91 serve")
    batch.groupBy(_._1).foreach { case (qid, rows) =>
      assert(rows.length === 10, s"query $qid incomplete top-10")
      assert(rows.map(_._2).sorted.toSeq === (1L to 10L), s"query $qid ranks")
    }
  }

  test("q95 audit rows agree with this spec's own q35 measurement for query 0") {
    val rows = run("q95_ann_recall_audit").collect()
      .map(r => r.getAs[Long]("query_id") ->
        ((r.getAs[Long]("n_exact"), r.getAs[Long]("n_ivf"),
          r.getAs[Long]("n_hit"), r.getAs[Double]("recall")))).toMap
    spark.catalog.clearCache()
    assert(rows.size >= 5, s"sample collapsed: ${rows.size} queries")
    rows.values.foreach { case (ne, ni, nh, rec) =>
      assert(ne == 10 && ni == 10, s"full top-10 on both sides at sf0.01: $ne/$ni")
      assert(nh >= 0 && nh <= 10 && rec == nh / 10.0)
    }
    // query 0 is the q35/q29 test pair's query — same probe, same truth,
    // so its audited recall must meet the same floor that test asserts
    assert(rows(0L)._4 >= 0.5, s"query-0 recall ${rows(0L)._4} below the q35 floor")
  }

  test("q96 planted clusters: intra pairs all close, inter never close") {
    import spark.implicits._
    // two direction-clusters (positive per-member scaling keeps every
    // hyperplane sign, so members share all band buckets): intra cos ~1,
    // cross cos ~0.02 — the audit must read 100% intra closeness and
    // zero inter closeness
    val base1 = (1 to 64).map(j => math.sin(j.toDouble).toFloat)
    val base2 = (1 to 64).map(j => math.cos(j.toDouble).toFloat)
    val rows =
      (0 until 3).map(i => (i.toLong,
        base1.map(x => x * (1f + 0.001f * i)), "a")) ++
      (3 until 6).map(i => (i.toLong,
        base2.map(x => x * (1f + 0.001f * (i - 3))), "b"))
    val d = java.nio.file.Files.createTempDirectory("graft-labelsep").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$d/embeddings.parquet")
    val m = graft.SparkEntry.queries("q96_label_separation")(spark, d)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    spark.catalog.clearCache()
    assert(m("a")._1 == 3 && m("a")._2 == 3, m)
    assert(m("b")._1 == 3 && m("b")._2 == 3, m)
    m.values.foreach { case (_, _, _, interClose) =>
      assert(interClose == 0L, m) }
  }

  test("q39 still yields candidates at the bench corpus (bucket sizing holds)") {
    // regression: with 4-plane families (16 buckets) every bucket exceeded
    // the 50-doc cap at sf0.1's 2000 vectors and q39 returned ZERO rows —
    // bucket count must keep typical occupancy under the cap at the
    // largest corpus the bench runs
    val n = graft.SparkEntry.queries("q39_cosine_neardup_lsh")(
      spark, "/root/testdata/sf0.1").count()
    assert(n > 0, "bucket cap dropped every candidate at sf0.1")
    spark.catalog.clearCache()
  }

  test("q75 band knob: per-family candidate recall measured at sf0.01 AND the 10x corpus") {
    // the recall knob is (NdFamilies, ndPlanesFor): each family is one
    // k-bit bucketing, and q75 sees a pair iff SOME uncapped family
    // collides. This measures — not asserts — each family's contribution
    // at both scales, so a sizing change that quietly gutted the union
    // recall (or let the cap eat whole families at 10×) shows up as a
    // measured floor, exactly the VERDICT r10 item-5 ask.
    import org.apache.spark.sql.functions._
    def familyHits(dir: String, truth: Set[(Long, Long)]): (Seq[Double], Double) = {
      val df = spark.read.parquet(s"$dir/embeddings.parquet")
      val k = Similarity.ndPlanesFor(df.count())
      val bands = df.select(col("vec_id"),
          posexplode(Similarity.famBuckets(k, col("embedding"))))
        .select(col("vec_id"), col("pos").as("fam"), col("col").as("bk"))
      // capped (fam, bucket) keys are few by construction — bounded collect
      val capped = bands.groupBy("fam", "bk").agg(count(lit(1)).as("kc"))
        .filter(col("kc") > Similarity.MaxVecBucket)
        .collect().map(r => (r.getAs[Int]("fam"), r.getAs[Long]("bk"))).toSet
      val ids = truth.flatMap(p => Seq(p._1, p._2))
      val keys = bands.filter(col("vec_id").isin(ids.toSeq.map(Long.box): _*))
        .collect()
        .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("fam")) -> r.getAs[Long]("bk"))
        .toMap
      val perFam = (0 until Similarity.NdFamilies).map { f =>
        truth.count { case (a, b) =>
          keys.get((a, f)).exists(ka => keys.get((b, f)).contains(ka)) &&
          !capped((f, keys((a, f))))
        }.toDouble / truth.size
      }
      val union = truth.count { case (a, b) =>
        (0 until Similarity.NdFamilies).exists { f =>
          keys.get((a, f)).exists(ka => keys.get((b, f)).contains(ka)) &&
          !capped((f, keys((a, f))))
        }
      }.toDouble / truth.size
      (perFam, union)
    }

    // scale 1: sf0.01, truth = exact brute-force top-3 edge set
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .collect().map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    val nrm = emb.view.mapValues(v => math.sqrt(dot(v, v))).toMap
    val ids = emb.keys.toSeq.filter(nrm(_) > 0).sorted
    val edges = ids.flatMap { i =>
      ids.filter(_ != i)
        .map(j => j -> dot(emb(i), emb(j)) / (nrm(i) * nrm(j)))
        .sortBy { case (j, c) => (-c, j) }.take(3)
        .map { case (j, _) => (math.min(i, j), math.max(i, j)) }
    }.toSet
    val (famSmall, unionSmall) = familyHits(dir, edges)
    info(f"sf0.01 exact-edge union recall ${unionSmall}%.3f; per-family " +
      f"min ${famSmall.min}%.3f mean ${famSmall.sum / famSmall.size}%.3f")
    // measured 0.66 union / ~0.08 per family (k=6, p^k per family) — the
    // floors are tripwires well under the measurement
    assert(unionSmall >= 0.5, f"union candidate recall collapsed: $unionSmall%.3f")
    assert(famSmall.sum / famSmall.size >= 0.02,
      "mean per-family recall collapsed at sf0.01")

    // scale 2: 10x corpus (20k vectors), truth = planted identical pairs;
    // identical vectors share EVERY family bucket, so each family's miss
    // rate here IS the cap erosion at scale
    val big = java.nio.file.Files.createTempDirectory("graft-knn-scale").toString
    ScaleCorpus.makeEmbeddings(spark, big, 20000)
    val planted = (0 until 20000 by 100).map(m => (m.toLong, (m + 1).toLong)).toSet
    val (famBig, unionBig) = familyHits(big, planted)
    info(f"20k planted-pair union recall ${unionBig}%.3f; per-family " +
      f"min ${famBig.min}%.3f mean ${famBig.sum / famBig.size}%.3f")
    assert(unionBig >= 0.9, f"planted-pair union recall at 10x: $unionBig%.3f")
    assert(famBig.sum / famBig.size >= 0.85,
      f"families lost too many planted pairs to the cap at 10x: mean ${famBig.sum / famBig.size}%.3f")
    assert(famBig.min >= 0.5,
      f"a family lost half its planted pairs to the cap at 10x: ${famBig.min}%.3f")
    spark.catalog.clearCache()
  }

  test("q75 KNN graph: mean recall@3 vs exact brute-force >= 0.5") {
    // the graph is approximate BY CONSTRUCTION (neighbors outside every
    // shared band are unseen); this floor is the regression tripwire —
    // measured 0.62 on this corpus. Exact top-3 is computed driver-side
    // over the collected corpus (bounded: the test table), with the
    // SAME left-to-right fold cosine as vec_dot.
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .collect().map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    val nrm = emb.view.mapValues(v => math.sqrt(dot(v, v))).toMap
    val ids = emb.keys.toSeq.filter(nrm(_) > 0).sorted
    val exact: Map[Long, Set[Long]] = ids.map { i =>
      i -> ids.filter(_ != i)
        .map(j => j -> dot(emb(i), emb(j)) / (nrm(i) * nrm(j)))
        .sortBy { case (j, c) => (-c, j) }.take(3).map(_._1).toSet
    }.toMap
    val got = run("q75_knn_graph").collect()
      .groupBy(_.getAs[Long]("vec_id")).view
      .mapValues(_.map(_.getAs[Long]("nbr")).toSet).toMap
    val recalls = ids.map(i =>
      (got.getOrElse(i, Set.empty) & exact(i)).size.toDouble / 3)
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.5, f"KNN-graph mean recall@3 collapsed: $mean%.3f")
    spark.catalog.clearCache()
  }
}
