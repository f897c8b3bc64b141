package graft

import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.similarity.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("cosine kernel: identical vectors -> 1, orthogonal -> 0") {
    val df = Seq(
      (1L, Seq(1.0f, 0.0f), Seq(1.0f, 0.0f)),
      (2L, Seq(1.0f, 0.0f), Seq(0.0f, 2.0f))
    ).toDF("id", "a", "b")
    val out = df
      .select(
        $"id",
        Similarity.cosine(Similarity.toDoubleArr($"a"), Similarity.toDoubleArr($"b")).as("cos")
      )
      .as[(Long, Double)]
      .collect()
      .toMap
    assert(math.abs(out(1L) - 1.0) < 1e-12)
    assert(out(2L) == 0.0)
  }

  test("bruteForceTopK returns k nearest excluding self, deterministic ties") {
    val corpus = Seq(
      (0L, Seq(1.0f, 0.0f)),
      (1L, Seq(0.9f, 0.1f)),
      (2L, Seq(0.0f, 1.0f)),
      (3L, Seq(-1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val out = Similarity
      .bruteForceTopK(corpus, "vec_id", "embedding", corpus.filter($"vec_id" === 0L), 2)
      .select("nbr_id")
      .as[Long]
      .collect()
      .toSet
    assert(out == Set(1L, 2L)) // nearest then orthogonal; -x excluded by k
  }

  test("hyperplanes are deterministic and bounded") {
    val a = Similarity.hyperplanes(4, 8)
    val b = Similarity.hyperplanes(4, 8)
    assert(a.flatten.toSeq == b.flatten.toSeq)
    assert(a.flatten.forall(v => v >= -1.0 && v < 1.0))
  }

  test("IVF ANN recall vs brute force is substantial on real embeddings") {
    val emb = Tables.embeddings(spark, sf0001)
    val queries = emb.filter($"vec_id" < 10)
    val brute = Similarity
      .bruteForceTopK(emb, "vec_id", "embedding", queries, 5)
      .select("query_id", "nbr_id")
      .as[(Long, Long)]
      .collect()
      .toSet
    val ivf = Similarity
      .ivfTopK(emb, "vec_id", "embedding", queries, 5, nCentroids = 16, nProbe = 6)
      .select("query_id", "nbr_id")
      .as[(Long, Long)]
      .collect()
      .toSet
    val recall = (brute & ivf).size.toDouble / brute.size
    assert(recall >= 0.4, s"recall $recall too low")
  }

  test("LSH ANN recall vs brute force is substantial on real embeddings") {
    val emb = Tables.embeddings(spark, sf0001)
    val queries = emb.filter($"vec_id" < 10)
    val brute = Similarity
      .bruteForceTopK(emb, "vec_id", "embedding", queries, 5)
      .select("query_id", "nbr_id")
      .as[(Long, Long)]
      .collect()
      .toSet
    val lsh = Similarity
      .lshTopK(emb, "vec_id", "embedding", queries, 5, bits = 4, tables = 6)
      .select("query_id", "nbr_id")
      .as[(Long, Long)]
      .collect()
      .toSet
    val recall = (brute & lsh).size.toDouble / brute.size
    assert(recall >= 0.4, s"recall $recall too low") // ANN trade-off; tuned in bench
  }

  test("k-means-fitted IVF: deterministic model, recall at least matches naive seeds") {
    val emb = Tables.embeddings(spark, sf0001)
    val m1 = Similarity.kmeansCentroids(emb, "vec_id", "embedding", k = 16)
    val m2 = Similarity.kmeansCentroids(emb, "vec_id", "embedding", k = 16)
    assert(m1.flatten.toSeq == m2.flatten.toSeq) // hash-ordered sample → stable model
    val queries = emb.filter($"vec_id" < 10)
    val brute = Similarity
      .bruteForceTopK(emb, "vec_id", "embedding", queries, 5)
      .select("query_id", "nbr_id").as[(Long, Long)].collect().toSet
    val fitted = Similarity
      .ivfTopK(emb, "vec_id", "embedding", queries, 5, nCentroids = 16, nProbe = 6, centroidModel = Some(m1))
      .select("query_id", "nbr_id").as[(Long, Long)].collect().toSet
    val recall = (brute & fitted).size.toDouble / brute.size
    assert(recall >= 0.4, s"fitted-IVF recall $recall")
  }

  test("int8 quantization: codes bounded, max component hits ±127, quantized ANN recall high") {
    val emb = Tables.embeddings(spark, sf0001)
    val qz = emb.select($"vec_id", Similarity.quantizeInt8($"embedding").as("qz"))
      .select($"vec_id", $"qz.scale".as("scale"), $"qz.q".as("q"))
    val rows = qz.limit(50).collect()
    rows.foreach { r =>
      val q = r.getSeq[Byte](2)
      assert(q.forall(b => b >= -127 && b <= 127))
      assert(q.map(b => math.abs(b.toInt)).max == 127) // the max|v| component saturates exactly
      assert(r.getDouble(1) > 0.0)
    }
    val queries = emb.filter($"vec_id" < 10)
    val brute = Similarity
      .bruteForceTopK(emb, "vec_id", "embedding", queries, 5)
      .select("query_id", "nbr_id").as[(Long, Long)].collect().toSet
    val quant = Similarity
      .quantizedTopK(emb, "vec_id", "embedding", queries, 5)
      .select("query_id", "nbr_id").as[(Long, Long)].collect().toSet
    val recall = (brute & quant).size.toDouble / brute.size
    assert(recall >= 0.8, s"int8 recall $recall — quantization noise should cost little at top-5")
  }

  test("lshNearDupPairs recall >= 95% of the exact d5 pairs (real embeddings, DEFAULT path)") {
    // no bits/tables passed: this rides the lshConfigFor-derived default
    // — the config a caller actually gets — so the recall bar certifies
    // the default sizing, not a hand-tuned pin
    val emb = Tables.embeddings(spark, sf001)
    val exact = Similarity
      .cosineNearDupPairs(emb, "vec_id", "embedding", 0.4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = Similarity
      .lshNearDupPairs(emb, "vec_id", "embedding", 0.4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty)
    // every LSH pair is exact-verified, so no false positives possible
    assert((lsh -- exact).isEmpty)
    val recall = (exact & lsh).size.toDouble / exact.size
    assert(recall >= 0.95, s"recall $recall below 0.95 (${exact.size} exact pairs)")
  }

  test("lshNearDupPairs high-similarity regime: wide bits still find planted near-dups") {
    // planted pairs at cosine ~0.99 among random noise — the production
    // regime where bits=12 buckets make the pair join sub-quadratic
    val rnd = new scala.util.Random(7)
    def vec(): Array[Float] = Array.fill(32)(rnd.nextGaussian().toFloat)
    def jitter(v: Array[Float]): Array[Float] = v.map(x => x + 0.02f * rnd.nextGaussian().toFloat)
    val base = (0 until 40).map(_ => vec())
    val rows = base.zipWithIndex.flatMap { case (v, i) =>
      Seq((i.toLong * 2, v.toSeq), (i.toLong * 2 + 1, jitter(v).toSeq))
    }
    val df = rows.toDF("vec_id", "embedding")
    val planted = (0 until 40).map(i => (i.toLong * 2, i.toLong * 2 + 1)).toSet
    val found = Similarity
      .lshNearDupPairs(df, "vec_id", "embedding", 0.9, bits = 12, tables = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val recall = (planted & found).size.toDouble / planted.size
    assert(recall >= 0.95, s"planted recall $recall")
  }

  test("lshConfigFor: occupancy bound, analytic recall guarantee, weak-threshold diagnostic") {
    def analyticRecall(bits: Int, tables: Int, threshold: Double): Double = {
      val p = 1.0 - math.acos(threshold) / math.Pi
      1.0 - math.pow(1.0 - math.pow(p, bits), tables)
    }
    // pinned production case from the scaladoc
    assert(Similarity.lshConfigFor(20000, 0.9) == (9, 9))
    // bound + guarantee over a (n, threshold) grid in the strong regime
    for {
      n <- Seq(1000L, 20000L, 1000000L, 100000000L)
      th <- Seq(0.7, 0.8, 0.9, 0.95)
    } {
      val (bits, tables) = Similarity.lshConfigFor(n, th)
      assert(n.toDouble / (1L << bits) <= 64.0 || bits >= 62, s"occupancy bound broken at n=$n th=$th")
      assert(analyticRecall(bits, tables, th) >= 0.9, s"recall guarantee broken at n=$n th=$th")
      // bits monotone in n (same threshold, doubled corpus never shrinks bits)
      assert(Similarity.lshConfigFor(n * 2, th)._1 >= bits)
    }
    // weak threshold: the table count explodes — the analytic signal
    // that sign-LSH cannot prune where there is no similarity gap
    assert(Similarity.lshConfigFor(20000, 0.4)._2 > 100)
    // ...and past the cap the condition fails LOUDLY instead of
    // returning a saturated Int.MaxValue table count (which a caller
    // feeding the result into lshNearDupPairs would turn into an absurd
    // plan): n=10^8 at threshold 0.4 wants ~36k tables
    val e = intercept[IllegalArgumentException](Similarity.lshConfigFor(100000000L, 0.4))
    assert(e.getMessage.contains("similarity gap"))
    // p^bits full underflow (the Int.MaxValue saturation case) also dies
    assert(intercept[IllegalArgumentException] {
      Similarity.lshConfigFor(1000000000000L, 0.05)
    }.getMessage.contains("similarity gap"))
  }

  test("default-path config: operators derive lshConfigFor's exact (bits, tables); half-pins rejected") {
    val emb = Tables.embeddings(spark, sf001)
    val n = emb.count()
    val (b, t) = Similarity.lshConfigFor(n, 0.9, targetRecall = 0.98)
    // derivation is referentially transparent: the default path emits
    // bit-identical pairs to an explicit pin at the derived config
    val viaDefault = Similarity
      .lshNearDupPairs(emb, "vec_id", "embedding", 0.9)
      .select("id_a", "id_b", "cos").as[(Long, Long, Double)].collect().toSet
    val viaExplicit = Similarity
      .lshNearDupPairs(emb, "vec_id", "embedding", 0.9, bits = b, tables = t)
      .select("id_a", "id_b", "cos").as[(Long, Long, Double)].collect().toSet
    assert(viaDefault == viaExplicit)
    // occupancy bound at the derived config — the property that keeps
    // the within-bucket join sub-quadratic as n grows
    assert(n.toDouble / (1L << b) <= 64.0)
    // one explicit knob without the other is a config nobody chose
    assert(intercept[IllegalArgumentException] {
      Similarity.lshNearDupPairs(emb, "vec_id", "embedding", 0.9, bits = 12)
    }.getMessage.contains("both"))
  }

  test("semDedupPairs: exact precision (subset of the O(n²) verifier), real recall, honest cell blocking") {
    val emb = Tables.embeddings(spark, sf0001)
    val model = Similarity.kmeansCentroids(emb, "vec_id", "embedding", k = 16)
    val exact = Similarity
      .cosineNearDupPairs(emb, "vec_id", "embedding", 0.4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val sem = Similarity
      .semDedupPairs(emb, "vec_id", "embedding", 0.4, nClusters = 16, centroidModel = Some(model))
    val semPairs = sem.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // never a false positive: clustering only RESTRICTS the candidate set
    assert(semPairs.subsetOf(exact), s"${(semPairs -- exact).size} pairs not in the exact verifier")
    // this corpus's planted near-dups sit in the 0.4–0.6 cosine band
    // (zero pairs above 0.6) — weakly-similar pairs straddle cell
    // boundaries, so k=16 recall is genuinely modest here; assert the
    // floor honestly rather than inventing a threshold the data lacks
    val recall = semPairs.size.toDouble / exact.size
    assert(recall >= 0.2, s"semdedup recall $recall vs exact ${exact.size}")
    val cells = sem.select("cell").distinct().count()
    assert(cells >= 2, "all pairs landed in one cell — blocking is doing nothing")
    // the recall/cost knob: coarser clustering (bigger cells) must
    // recover pairs that k=16 splits — and at k=1 the operator IS the
    // exact verifier (one cell = all pairs), the degenerate upper bound
    val semK4 = Similarity
      .semDedupPairs(emb, "vec_id", "embedding", 0.4, nClusters = 4,
        centroidModel = Some(Similarity.kmeansCentroids(emb, "vec_id", "embedding", k = 4)))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(semK4.subsetOf(exact))
    assert(semK4.size >= semPairs.size, s"k=4 recall ${semK4.size} below k=16 ${semPairs.size}")
    val semK1 = Similarity
      .semDedupPairs(emb, "vec_id", "embedding", 0.4, nClusters = 1,
        centroidModel = Some(Similarity.kmeansCentroids(emb, "vec_id", "embedding", k = 1)))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(semK1 == exact, "k=1 must degenerate to the exact O(n²) verifier")
  }

  test("semDedup default path: derives k from the corpus, bit-identical to an explicit pin at the derived config") {
    val emb = Tables.embeddings(spark, sf0001)
    val n = emb.count()
    val k = Similarity.semDedupConfigFor(n)
    // occupancy bound while under the cap — the property that keeps the
    // within-cell search linear-in-n as the corpus grows
    assert(n.toDouble / k <= 128.0)
    val viaDefault = Similarity
      .semDedupPairs(emb, "vec_id", "embedding", 0.4)
      .select("id_a", "id_b", "cos").as[(Long, Long, Double)].collect().toSet
    val viaExplicit = Similarity
      .semDedupPairs(emb, "vec_id", "embedding", 0.4, nClusters = k,
        centroidModel = Some(Similarity.kmeansCentroids(emb, "vec_id", "embedding", k)))
      .select("id_a", "id_b", "cos").as[(Long, Long, Double)].collect().toSet
    assert(viaDefault == viaExplicit)
    // the cap: past maxK*targetCell docs the derivation saturates
    assert(Similarity.semDedupConfigFor(10_000_000L) == 512)
    assert(Similarity.semDedupConfigFor(1L) == 1)
  }

  test("PQ: deterministic fit, codes in range, ADC recall substantial, augmented argmax == L2 argmin") {
    val emb = Tables.embeddings(spark, sf0001)
    val m1 = Similarity.pqSubCentroids(emb, "vec_id", "embedding")
    val m2 = Similarity.pqSubCentroids(emb, "vec_id", "embedding")
    assert(m1.flatten.flatten.toSeq == m2.flatten.flatten.toSeq) // hash-ordered sample → stable fit
    assert(m1.length == 8 && m1.forall(_.length == 16) && m1.flatten.forall(_.length == 8))
    val codes = Similarity.pqEncode(emb, "vec_id", "embedding", m1)
      .select($"id", $"code").as[(Long, Seq[Int])].collect()
    assert(codes.forall { case (_, c) => c.length == 8 && c.forall(x => x >= 0 && x < 16) })
    // augmented-dot argmax ≡ direct L2 argmin, checked exhaustively on a
    // handful of rows (the algebra: ‖x−c‖² = ‖x‖² − 2(x·c − ½‖c‖²))
    val byId = codes.toMap
    val raw = emb.filter($"vec_id" < 5)
      .select($"vec_id", Similarity.toDoubleArr($"embedding")).as[(Long, Seq[Double])].collect()
    raw.foreach { case (id, v) =>
      (0 until 8).foreach { s =>
        val sub = v.slice(s * 8, (s + 1) * 8)
        val want = (0 until 16).minBy { c =>
          val d2 = sub.zip(m1(s)(c)).map { case (a, b) => (a - b) * (a - b) }.sum
          (d2, -c) // ties → larger index
        }
        assert(byId(id)(s) == want, s"id=$id s=$s")
      }
    }
    // recall, honestly: this corpus is near-isotropic unit vectors in
    // dim 64 — distance concentration is PQ's worst case by
    // construction (probed: plain ADC top-5 ≈ 0.16 at m=8/ks=16 and
    // only 0.34 even at ks=128; real embeddings have low intrinsic
    // dimension and fare far better). Assert the plain-ADC floor, and
    // that the standard two-stage deployment (ADC shortlist → exact
    // re-rank) recovers most of the gap at 10% of full-vector reads.
    val queries = emb.filter($"vec_id" < 10)
    val brute = Similarity
      .bruteForceTopK(emb, "vec_id", "embedding", queries, 5)
      .select("query_id", "nbr_id").as[(Long, Long)].collect().toSet
    val pqr = Similarity
      .pqTopK(emb, "vec_id", "embedding", queries, 5, m1)
      .select("query_id", "nbr_id").as[(Long, Long)].collect().toSet
    assert((brute & pqr).size.toDouble / brute.size >= 0.1, "plain-ADC floor")
    val rr = Similarity
      .pqTopKReranked(emb, "vec_id", "embedding", queries, 5, m1, shortlist = 50)
      .select("query_id", "nbr_id").as[(Long, Long)].collect().toSet
    val rrRecall = (brute & rr).size.toDouble / brute.size
    assert(rrRecall >= 0.5, s"re-ranked recall $rrRecall")
    // the re-rank can only IMPROVE on plain ADC (exact scores over a
    // superset-quality shortlist)
    assert(rrRecall >= (brute & pqr).size.toDouble / brute.size)
  }

  test("NearestCell native: matches the struct-argmax formulation, larger cell wins ties, null contract") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import graft.expressions.NearestCell
    val emb = Tables.embeddings(spark, sf0001)
    val model = Similarity.kmeansCentroids(emb, "vec_id", "embedding", k = 7)
    // declarative twin built inline (the pre-native formulation)
    val structScores = array(model.zipWithIndex.map { case (cvec, i) =>
      struct(
        Similarity.dot(Similarity.toDoubleArr($"embedding"), array(cvec.map(lit): _*)).as("score"),
        lit(i).as("cell")
      )
    }: _*)
    val both = emb
      .select(
        $"vec_id",
        NearestCell.column(Similarity.toDoubleArr($"embedding"), model).as("native"),
        array_max(structScores).getField("cell").as("declarative")
      )
    assert(both.filter($"native" =!= $"declarative").isEmpty, "native and declarative assignments diverge")
    // tie-break: two IDENTICAL centroids -> the larger cell id wins,
    // exactly the lexicographic struct max (and the oracle's
    // ORDER BY score DESC, cell DESC)
    val dup = Array(Array(1.0, 0.0), Array(1.0, 0.0), Array(0.0, 1.0))
    val tied = Seq(Seq(2.0, 0.1)).toDF("v")
      .select(NearestCell.column($"v", dup).as("cell")).as[Int].head()
    assert(tied == 1)
    // null contract: dimension mismatch and null element both -> null
    val bad = Seq((1L, Seq(Option(1.0), Option(2.0), Option(3.0))), (2L, Seq(Option(1.0), None)))
      .toDF("id", "v")
      .select($"id", NearestCell.column($"v", dup).as("cell"))
      .collect()
    assert(bad.forall(_.isNullAt(1)))
  }

  test("semDedup retention: drops exactly the id_b side of confirmed pairs, payload columns intact") {
    val emb = Tables.embeddings(spark, sf0001)
    val model = Similarity.kmeansCentroids(emb, "vec_id", "embedding", k = 16)
    val dropped = Similarity
      .semDedupPairs(emb, "vec_id", "embedding", 0.4, nClusters = 16, centroidModel = Some(model))
      .select("id_b").as[Long].collect().toSet
    val kept = Similarity
      .semDedup(emb, "vec_id", "embedding", 0.4, nClusters = 16, centroidModel = Some(model))
    assert(kept.columns.toSeq == emb.columns.toSeq) // filter, not a projection
    val keptIds = kept.select("vec_id").as[Long].collect().toSet
    val allIds = emb.select("vec_id").as[Long].collect().toSet
    assert(keptIds == allIds -- dropped)
    assert(dropped.nonEmpty && keptIds.nonEmpty)
  }
}
