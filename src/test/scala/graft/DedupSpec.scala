package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup

class DedupSpec extends SparkSpec {
  import spark.implicits._

  val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again", 0L),
    (2L, "the quick brown fox jumps over the lazy dog again and again", 0L), // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy cat again and again", 0L), // near dup of 1
    (4L, "completely different content about spark query engines at scale", 0L),
    (5L, "tiny", 0L) // fewer tokens than the shingle width
  ).toDF("doc_id", "text", "pad")

  test("shingles yields empty set below n tokens (no descending-sequence bug)") {
    val out = docs
      .select(col("doc_id"), Dedup.shingles(col("text"), 3).as("sh"))
      .filter($"doc_id" === 5L)
      .select(size($"sh"))
      .as[Int]
      .head()
    assert(out == 0)
  }

  test("native ShingleHashes == sort_array(hashShingles(shingles)) on real docs") {
    import org.apache.spark.sql.functions._
    val real = graft.io.Tables.documents(spark, sf0001)
    val hof = real.select(
      $"doc_id",
      sort_array(Dedup.hashShingles(Dedup.shingles($"text", 3))).as("h")
    )
    val native = real.select($"doc_id", Dedup.sortedShingleHashes($"text", 3).as("h"))
    val mismatches = hof
      .join(native.withColumnRenamed("h", "h2"), "doc_id")
      .filter($"h" =!= $"h2")
      .count()
    assert(mismatches == 0)
  }

  test("native MinHashSignature == HOF xor-min formulation on real docs") {
    import org.apache.spark.sql.functions._
    implicit val s = spark
    val hashed = graft.io.Tables
      .documents(spark, sf0001)
      .select($"doc_id", Dedup.sortedShingleHashes($"text", 3).as("shh"))
      .filter(size($"shh") > 0)
    val mismatches = hashed
      .withColumn("a", Dedup.minhashSignature($"shh", 16))
      .withColumn("b", Dedup.minhashSignatureNative($"shh", 16))
      .filter($"a" =!= $"b")
      .count()
    assert(mismatches == 0)
  }

  test("graft_shingle_hashes width validation also covers the per-session registry path") {
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_shingle_hashes(array('a','b'), CAST(2 AS BIGINT))").collect()
    }
    assert(err.getMessage.contains("graft_shingle_hashes"), err.getMessage)
  }

  test("exactDuplicates groups identical normalized texts only") {
    val out = Dedup.exactDuplicates(docs, "doc_id", "text")
    val rows = out.select("doc_id", "keeper_id").as[(Long, Long)].collect().toSet
    assert(rows == Set((1L, 1L), (2L, 1L)))
  }

  test("minhashLshPairs finds exact and near dup, skips unrelated") {
    val pairs = Dedup
      .minhashLshPairs(docs, "doc_id", "text", n = 3, k = 16, bands = 8, threshold = 0.3)
      .select("id_a", "id_b", "jaccard")
      .as[(Long, Long, Double)]
      .collect()
      .map(p => (p._1, p._2) -> p._3)
      .toMap
    assert(pairs((1L, 2L)) == 1.0)
    assert(pairs.contains((1L, 3L)) && pairs((1L, 3L)) > 0.3)
    assert(!pairs.keySet.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("simhashPairs: identical texts hamming 0; near-dups small; unrelated pruned") {
    val pairs = Dedup
      .simhashPairs(docs, "doc_id", "text", maxHamming = 20)
      .select("id_a", "id_b", "hamming")
      .as[(Long, Long, Long)]
      .collect()
      .map(p => (p._1, p._2) -> p._3)
      .toMap
    assert(pairs((1L, 2L)) == 0L)
    assert(pairs.get((1L, 3L)).exists(_ <= 20L))
    assert(!pairs.contains((1L, 4L)) && !pairs.contains((2L, 4L)))
  }

  test("LSH candidates cover all exact-jaccard pairs on real corpus (recall=1 here)") {
    val docsReal = graft.io.Tables.documents(spark, sf0001)
    val exact = Dedup
      .ngramJaccardPairs(docsReal, "doc_id", "text", "n_chars", n = 3, threshold = 0.3)
      .select("id_a", "id_b")
      .as[(Long, Long)]
      .collect()
      .toSet
    val lsh = Dedup
      .minhashLshPairs(docsReal, "doc_id", "text", n = 3, k = 16, bands = 8, threshold = 0.3)
      .select("id_a", "id_b")
      .as[(Long, Long)]
      .collect()
      .toSet
    assert(exact.subsetOf(lsh), s"missed: ${exact -- lsh}")
  }

  test("decontaminate drops corpus docs near-identical to a benchmark doc, keeps the rest") {
    val benchmark = Seq((100L, "the quick brown fox jumps over the lazy dog again and again"))
      .toDF("doc_id", "text")
    // corpus doc 1 is an exact leak of the benchmark item, 3 a near-dup,
    // 4 unrelated
    val corpus = docs.select($"doc_id", $"text")
    val pairs = Dedup.crossLshPairs(corpus, benchmark, "doc_id", "text")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 100L)) && pairs.contains((2L, 100L)))
    assert(!pairs.exists(_._1 == 4L))

    val clean = Dedup.decontaminate(corpus, benchmark, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(!clean.contains(1L) && !clean.contains(2L)) // leaked docs removed
    assert(clean.contains(4L) && clean.contains(5L))   // unrelated + tiny kept
  }

  test("gopherQuality: repetition metrics and keep flag behave on planted docs") {
    val planted = Seq(
      (1L, ("spark engine " * 30).trim),                         // one bigram dominates
      (2L, (1 to 40).map(i => s"word$i").mkString(" ")),         // all-distinct, clean
      (3L, "short text only")                                    // under min words
    ).toDF("doc_id", "text")
    val out = graft.text.TextOps.gopherQuality(planted, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    val rep = out(1L)
    assert(rep.getAs[Double]("dup_word_frac") > 0.9)   // 2 distinct words in 60
    assert(rep.getAs[Double]("top_bigram_frac") > 0.5) // "engine spark"/"spark engine" dominate
    assert(!rep.getAs[Boolean]("keep_doc"))
    val clean = out(2L)
    assert(clean.getAs[Double]("dup_word_frac") == 0.0)
    assert(clean.getAs[Boolean]("keep_doc"))
    assert(!out(3L).getAs[Boolean]("keep_doc")) // too short
  }

  test("gopherQuality: 1-token doc yields zero bigrams, not a sequence(1,0) crash") {
    val edge = Seq(
      (1L, "solitary"),                                   // exactly one token
      (2L, (1 to 25).map(i => s"word$i").mkString(" "))   // healthy doc
    ).toDF("doc_id", "text")
    val out = graft.text.TextOps.gopherQuality(edge, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Long]("n_words") == 1L)
    assert(out(1L).getAs[Double]("top_bigram_frac") == 0.0)
    assert(!out(1L).getAs[Boolean]("keep_doc")) // under min words
    assert(out(2L).getAs[Boolean]("keep_doc"))
  }

  test("chunkTokens: NULL text yields NULL array (doc dropped by posexplode)") {
    import graft.text.TextOps
    val df = Seq((1L, "five tokens of real text"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = df
      .select($"doc_id", posexplode(TextOps.chunkTokens($"text", 40, 10)).as(Seq("idx", "chunk")))
      .as[(Long, Int, String)].collect()
    assert(out.map(_._1).toSet == Set(1L)) // no spurious empty chunk for doc 2
  }

  test("exactDuplicates: NULL texts form one dup group (null-safe join, window parity)") {
    val withNulls = Seq(
      (1L, "same text"), (2L, "same text"),
      (3L, null.asInstanceOf[String]), (4L, null.asInstanceOf[String]),
      (5L, "unique text")
    ).toDF("doc_id", "text")
    val rows = Dedup.exactDuplicates(withNulls, "doc_id", "text")
      .select("doc_id", "keeper_id").as[(Long, Long)].collect().toSet
    assert(rows == Set((1L, 1L), (2L, 1L), (3L, 3L), (4L, 3L)))
  }

  test("chunkTokens: overlap/stride invariants and short-doc passthrough") {
    import graft.text.TextOps
    val df = Seq(
      (1L, (1 to 100).map(i => s"t$i").mkString(" ")),
      (2L, "just five little tokens here")
    ).toDF("doc_id", "text")
    val out = df
      .select($"doc_id", posexplode(TextOps.chunkTokens($"text", 40, 10)).as(Seq("idx", "chunk")))
      .as[(Long, Int, String)].collect()
    val doc1 = out.filter(_._1 == 1L).sortBy(_._2).map(_._3.split(" "))
    assert(doc1.head.length == 40 && doc1.head.head == "t1")
    assert(doc1(1).head == "t31") // stride 30 = 40 - 10 overlap
    // consecutive chunks share exactly the 10-token overlap
    assert(doc1.head.takeRight(10).toSeq == doc1(1).take(10).toSeq)
    // every token appears in some chunk (full coverage)
    assert(doc1.flatten.toSet == (1 to 100).map(i => s"t$i").toSet)
    val doc2 = out.filter(_._1 == 2L)
    assert(doc2.length == 1 && doc2.head._3 == "just five little tokens here")
  }

  test("packIntoBins: bins are contiguous per shard and hold the budget before overflow") {
    import graft.text.TextOps
    val df = Seq(
      ("s1", 1L, 1000L), ("s1", 2L, 900L), ("s1", 3L, 300L), ("s1", 4L, 2000L),
      ("s2", 9L, 50L)
    ).toDF("source", "doc_id", "n_tokens")
    val out = TextOps.packIntoBins(df, "source", "doc_id", "n_tokens", budget = 2048)
      .select("source", "doc_id", "bin_id").as[(String, Long, Long)].collect()
      .map { case (s, d, b) => (s, d) -> b }.toMap
    // prefix-before sums: 0, 1000, 1900, 2200 → bins 0,0,0,1
    assert(out(("s1", 1L)) == 0 && out(("s1", 2L)) == 0 && out(("s1", 3L)) == 0)
    assert(out(("s1", 4L)) == 1)
    assert(out(("s2", 9L)) == 0) // shards pack independently
  }

  test("packFirstFitExact: straddling doc opens a NEW bin (no boundary overflow)") {
    import graft.text.TextOps
    val df = Seq(
      ("s1", 1L, 1000L), ("s1", 2L, 900L), ("s1", 3L, 300L), ("s1", 4L, 2000L),
      ("s2", 9L, 50L),
      ("s3", 5L, 5000L), ("s3", 6L, 10L) // oversized doc occupies a bin alone
    ).toDF("source", "doc_id", "n_tokens")
    val out = TextOps.packFirstFitExact(df, "source", "doc_id", "n_tokens", budget = 2048)
      .select("source", "doc_id", "bin_id").as[(String, Long, Long)].collect()
      .map { case (s, d, b) => (s, d) -> b }.toMap
    // fills: 1000 | +900=1900 ok | 1900+300>2048 → new bin | 300+2000>2048 → new bin
    assert(out(("s1", 1L)) == 0 && out(("s1", 2L)) == 0)
    assert(out(("s1", 3L)) == 1) // the prefix rule kept this in bin 0 (overflow)
    assert(out(("s1", 4L)) == 2)
    assert(out(("s2", 9L)) == 0)
    assert(out(("s3", 5L)) == 0 && out(("s3", 6L)) == 1) // oversized doc alone, next doc new bin
  }

  test("packFirstFitExact: boxed-primitive shard keys compare by VALUE (bins accumulate, never reset per row)") {
    import graft.text.TextOps
    // a bigint shard column reaches the kernel as boxed java.lang.Long
    // per row; if key-change detection used reference identity instead
    // of value equality, every row would open shard-state afresh and
    // the second doc would land in bin 0 instead of bin 1
    val df = Seq(
      (7L, 1L, 1500L), (7L, 2L, 1500L), (7L, 3L, 100L),
      (8L, 4L, 1500L), (8L, 5L, 1500L)
    ).toDF("shard", "doc_id", "n_tokens")
    val out = TextOps.packFirstFitExact(df, "shard", "doc_id", "n_tokens", budget = 2048)
      .select("shard", "doc_id", "bin_id").as[(Long, Long, Long)].collect()
      .map { case (s, d, b) => (s, d) -> b }.toMap
    assert(out((7L, 1L)) == 0 && out((7L, 2L)) == 1 && out((7L, 3L)) == 1)
    assert(out((8L, 4L)) == 0 && out((8L, 5L)) == 1)
  }

  test("packFirstFitExact invariants on real docs: no multi-doc bin over budget, never fewer bins than the prefix rule") {
    import graft.text.TextOps
    val docs = graft.io.Tables.documents(spark, sf001)
      .select($"doc_id", $"source", TextOps.tokenCount($"text").cast("long").as("n_tokens"))
    val ff = TextOps.packFirstFitExact(docs, "source", "doc_id", "n_tokens", budget = 2048)
    // every bin with >1 doc holds ≤ budget tokens (the exactness property
    // the prefix rule lacks); singleton bins may hold an oversized doc
    val overBudget = ff.groupBy("source", "bin_id")
      .agg(sum("n_tokens").as("fill"), count(lit(1)).as("n_docs"))
      .filter($"n_docs" > 1 && $"fill" > 2048)
      .count()
    assert(overBudget == 0)
    // bin ids are contiguous from 0 per shard
    val gaps = ff.groupBy("source")
      .agg(max("bin_id").as("max_bin"), countDistinct("bin_id").as("n_bins"))
      .filter($"n_bins" =!= $"max_bin" + 1)
      .count()
    assert(gaps == 0)
    // divergence bound: exact packing can only use MORE bins than the
    // overflowing prefix rule, never fewer
    val pf = TextOps.packIntoBins(docs, "source", "doc_id", "n_tokens", budget = 2048)
    val cmp = ff.groupBy("source").agg(countDistinct("bin_id").as("ff_bins"))
      .join(pf.groupBy("source").agg(countDistinct("bin_id").as("pf_bins")), "source")
      .filter($"ff_bins" < $"pf_bins")
      .count()
    assert(cmp == 0)
  }

  test("shuffleShards: seeded permutation is reproducible, balanced, contiguous per shard") {
    import graft.text.TextOps
    val docs = graft.io.Tables.documents(spark, sf001).select("doc_id", "source")
    val a = TextOps.shuffleShards(docs, "doc_id", seed = 42L, numShards = 8)
    val b = TextOps.shuffleShards(docs, "doc_id", seed = 42L, numShards = 8)
    assert(a.select("doc_id", "shard", "pos").collect().toSet ==
      b.select("doc_id", "shard", "pos").collect().toSet) // same seed → same permutation
    val c = TextOps.shuffleShards(docs, "doc_id", seed = 43L, numShards = 8)
    assert(a.select("doc_id", "shard", "pos").collect().toSet !=
      c.select("doc_id", "shard", "pos").collect().toSet) // new seed → new epoch order
    // every doc lands in exactly one shard; pos is 1..n within each shard
    assert(a.count() == docs.count())
    val badPos = a.groupBy("shard")
      .agg(count(lit(1)).as("n"), max("pos").as("mx"), min("pos").as("mn"))
      .filter($"mx" =!= $"n" || $"mn" =!= 1)
      .count()
    assert(badPos == 0)
    // md5 residues spread: no shard holds more than twice the fair share
    val n = docs.count()
    val maxShard = a.groupBy("shard").count().agg(max("count")).as[Long].head()
    assert(maxShard < 2 * n / 8, s"skewed shard: $maxShard of $n")
  }

  test("assignSplit: deterministic, exhaustive, proportions near 80/10/10") {
    import graft.text.TextOps
    val docs = graft.io.Tables.documents(spark, sf001).select("doc_id", "source")
    val s1 = TextOps.assignSplit(docs, "doc_id", seed = 7L)
    val s2 = TextOps.assignSplit(docs, "doc_id", seed = 7L)
    assert(s1.collect().toSet == s2.collect().toSet)
    val counts = s1.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.keySet.subsetOf(Set("train", "validation", "test")))
    val n = docs.count().toDouble
    assert(counts("train") / n > 0.7 && counts("train") / n < 0.9)
    assert(counts.getOrElse("validation", 0L) + counts.getOrElse("test", 0L) + counts("train") == n.toLong)
    // membership is stable under corpus growth: the sf0.001 assignment is
    // a sub-map of the sf0.01 assignment (pure function of (seed, id))
    val small = TextOps.assignSplit(
      graft.io.Tables.documents(spark, sf0001).select("doc_id"), "doc_id", seed = 7L)
      .as[(Long, String)].collect().toMap
    val bigMap = s1.select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(small.forall { case (id, sp) => bigMap.get(id).forall(_ == sp) })
  }

  test("assignSplitLeakageSafe: no near-dup pair straddles a split; singletons keep their x9 assignment") {
    import graft.text.TextOps
    val docs = graft.io.Tables.documents(spark, sf001)
    val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text", n = 3, k = 16, bands = 8, threshold = 0.3)
    val safe = TextOps
      .assignSplitLeakageSafe(docs.select($"doc_id", $"source"), "doc_id", pairs, seed = 7L)
    val splitOf = safe.select("doc_id", "split").as[(Long, String)].collect().toMap
    // THE contract: both sides of every near-dup pair land on the same
    // side — eval can never score against a near-copy of a train doc
    val ps = pairs.select("id_a", "id_b").as[(Long, Long)].collect()
    assert(ps.nonEmpty)
    ps.foreach { case (a, b) =>
      assert(splitOf(a) == splitOf(b), s"pair ($a,$b) straddles ${splitOf(a)}/${splitOf(b)}")
    }
    // exhaustive: every doc is assigned exactly once
    assert(splitOf.size == docs.count())
    // singleton docs (not in any pair) keep the per-doc x9 assignment
    // bit-for-bit — adopting the safe split only reshuffles the
    // clustered minority
    val paired = ps.flatMap { case (a, b) => Seq(a, b) }.toSet
    val x9 = TextOps
      .assignSplit(docs.select($"doc_id"), "doc_id", seed = 7L)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    splitOf.foreach { case (id, sp) =>
      if (!paired.contains(id)) assert(x9(id) == sp, s"singleton $id moved: x9=${x9(id)} safe=$sp")
    }
    // and the clustered minority is genuinely regrouped: at least one
    // doc's assignment differs from its per-doc x9 value (otherwise the
    // test corpus exercised nothing)
    assert(splitOf.exists { case (id, sp) => x9(id) != sp })
  }

  test("sampleTokenBudget: hard per-domain caps, prefix-closed admission, unbudgeted domains dropped") {
    import graft.text.TextOps
    val docs = graft.io.Tables.documents(spark, sf001)
    val base = docs.select($"doc_id", $"source", TextOps.tokenCount($"text").cast("long").as("n_tokens"))
    val budgets = Map("src0" -> 300L, "src1" -> 120L, "src2" -> 0L)
    val out = TextOps.sampleTokenBudget(base, "doc_id", "source", "n_tokens", budgets, seed = 7L)
    val rows = out.select("doc_id", "source", "n_tokens", "cum_tokens")
      .as[(Long, String, Option[Long], Long)].collect()
    // (1) only budgeted domains appear, and zero-budget admits nothing
    assert(rows.map(_._2).toSet.subsetOf(Set("src0", "src1")))
    // (2) the cap is HARD: per-domain admitted token sums fit the budget
    val sums = rows.groupBy(_._2).view.mapValues(_.map(_._3.getOrElse(0L)).sum).toMap
    sums.foreach { case (d, s) => assert(s <= budgets(d), s"$d admitted $s > ${budgets(d)}") }
    assert(rows.nonEmpty && sums.values.exists(_ > 0))
    // (3) admission is the PREFIX of the seeded-hash rank: recompute the
    // rank driver-side and check the admitted set is exactly the prefix
    // whose running sum fits
    val all = base.as[(Long, String, Option[Long])].collect()
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    budgets.filter(_._2 > 0).keys.foreach { d =>
      val ranked = all.filter(_._2 == d).sortBy { case (id, _, _) => (md5hex(s"7:$id"), id) }
      var cum = 0L
      val want = ranked.takeWhile { case (_, _, t) => cum += t.getOrElse(0L); cum <= budgets(d) }.map(_._1).toSet
      val got = rows.filter(_._2 == d).map(_._1).toSet
      assert(got == want, s"$d: admitted ${got.size}, expected prefix ${want.size}")
    }
    // (4) partitioning-independent
    val re = TextOps.sampleTokenBudget(base.repartition(17), "doc_id", "source", "n_tokens", budgets, seed = 7L)
      .select("doc_id").as[Long].collect().toSet
    assert(re == rows.map(_._1).toSet)
    // (5) the integer budget split is exact and conservative
    val b = TextOps.mixtureBudgets(Map("a" -> 1L, "b" -> 2L), 100L)
    assert(b == Map("a" -> 33L, "b" -> 66L))
  }

  test("sampleStratified: exact quotas, seeded determinism, partitioning-independent") {
    import graft.text.TextOps
    import graft.io.Tables
    val docs = Tables.documents(spark, sf0001).select($"doc_id", $"source")
    val a = TextOps.sampleStratified(docs, "doc_id", "source", quota = 7, seed = 13L)
      .as[(Long, String)].collect().toSet
    // every stratum contributes EXACTLY min(quota, stratum size)
    val sizes = docs.groupBy($"source").count().as[(String, Long)].collect().toMap
    val got = a.groupBy(_._2).view.mapValues(_.size).toMap
    sizes.foreach { case (s, n) => assert(got.getOrElse(s, 0) == math.min(7L, n), s"stratum $s") }
    // same seed + different partitioning → identical set; different seed → different set
    val b = TextOps.sampleStratified(docs.repartition(13), "doc_id", "source", quota = 7, seed = 13L)
      .as[(Long, String)].collect().toSet
    assert(a == b)
    val c = TextOps.sampleStratified(docs, "doc_id", "source", quota = 7, seed = 14L)
      .as[(Long, String)].collect().toSet
    assert(a != c)
  }

  test("sampleMixture: seeded reproducibility, proportions near weights, allowlist semantics") {
    import graft.text.TextOps
    val docsReal = graft.io.Tables.documents(spark, sf001)
    val sources = docsReal.select("source").distinct().as[String].collect().toSet
    val (wSrc, bSrc) = (sources.head, sources.tail.headOption.getOrElse(sources.head))
    val w2 = Map(wSrc -> 0.8, bSrc -> 0.2)
    val a = TextOps.sampleMixture(docsReal, "source", w2, seed = 7L).select("doc_id").as[Long].collect().toSet
    val b = TextOps.sampleMixture(docsReal, "source", w2, seed = 7L).select("doc_id").as[Long].collect().toSet
    assert(a == b) // same seed, same sample
    val counts = TextOps.sampleMixture(docsReal, "source", w2, seed = 7L)
      .groupBy("source").count().as[(String, Long)].collect().toMap
    val totals = docsReal.groupBy("source").count().as[(String, Long)].collect().toMap
    val fracW = counts.getOrElse(wSrc, 0L).toDouble / totals(wSrc)
    assert(math.abs(fracW - 0.8) < 0.15, s"got $fracW for weight 0.8")
    // sources not in the mixture are dropped
    val mixed = TextOps.sampleMixture(docsReal, "source", Map(wSrc -> 1.0), seed = 1L)
      .select("source").distinct().as[String].collect().toSet
    assert(mixed == Set(wSrc))
  }

  test("exactNgramDecontaminate flags literal n-gram leakage, counts hits vs distinct grams") {
    import graft.text.TextOps
    val bench = Seq((100L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "prefix words then alpha beta gamma delta epsilon quoted verbatim here"),
      (2L, "no overlap with the benchmark content at all in this document"),
      (3L, "alpha beta gamma appears alpha beta gamma twice in this one")
    ).toDF("doc_id", "text")
    val out = TextOps
      .exactNgramDecontaminate(corpus, bench, "doc_id", "text", n = 3)
      .as[(Long, Long, Long, Long, Double)]
      .collect()
      .map(r => r._1 -> r)
      .toMap
    // doc 2 shares no trigram with the benchmark → absent
    assert(out.keySet == Set(1L, 3L))
    // doc 1: 11 tokens → 9 windows; 3 distinct benchmark trigrams leak once each
    assert(out(1L) == ((1L, 9L, 3L, 3L, 3.0 / 9.0)))
    // doc 3: "alpha beta gamma" quoted TWICE → 2 hit windows but 1 distinct gram
    assert(out(3L) == ((3L, 9L, 2L, 1L, 2.0 / 9.0)))
    // minHits raises the reporting bar: only doc 1 reaches 3 hits
    val strict = TextOps
      .exactNgramDecontaminate(corpus, bench, "doc_id", "text", n = 3, minHits = 3L)
      .select("doc_id").as[Long].collect().toSet
    assert(strict == Set(1L))
    // a benchmark shorter than n contributes nothing (and nothing NPEs)
    val shortBench = Seq((200L, "just two")).toDF("doc_id", "text")
    assert(TextOps.exactNgramDecontaminate(corpus, shortBench, "doc_id", "text", n = 3).count() == 0L)
  }

  test("exactNgramDecontaminateBloom ≡ exactNgramDecontaminate (the sketch is result-invisible)") {
    import graft.text.TextOps
    // the x17 carrier's split on the REAL corpus: the strongest
    // equivalence surface we have (hundreds of docs, planted near-dups
    // giving genuine 13-gram leakage)
    val docs = graft.io.Tables.documents(spark, sf0001)
    val corpus = docs.filter($"doc_id" % 5 =!= 0)
    val bench = docs.filter($"doc_id" % 5 === 0)
    val exact = TextOps
      .exactNgramDecontaminate(corpus, bench, "doc_id", "text", n = 13)
      .as[(Long, Long, Long, Long, Double)].collect().toSet
    assert(exact.nonEmpty) // the comparison must compare something
    for (fpp <- Seq(0.01, 0.5)) { // a near-useless sketch changes nothing
      val bloomed = TextOps
        .exactNgramDecontaminateBloom(corpus, bench, "doc_id", "text", n = 13, fpp = fpp)
        .as[(Long, Long, Long, Long, Double)].collect().toSet
      assert(bloomed == exact, s"fpp=$fpp diverged")
    }
    // and the gate is really in the plan: the codegen'd
    // BloomFilterMightContain predicate sits on the corpus-span stream
    val plan = TextOps
      .exactNgramDecontaminateBloom(corpus, bench, "doc_id", "text", n = 13)
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), s"bloom probe missing from plan:\n$plan")
    // the bounded-lifetime form: same result, and its bench-gram
    // checkpoint blocks are gone once the action returns. Compare RDD
    // ID SETS, not counts: the ContextCleaner concurrently GC-collects
    // the earlier lazy calls' (documented) leaked checkpoints, so a
    // global count moves on its own — only NEW ids can come from this
    // call, and those must be released
    val idsBefore = spark.sparkContext.getPersistentRDDs.keySet
    val ran = TextOps
      .exactNgramDecontaminateBloomRun(corpus, bench, "doc_id", "text", n = 13) {
        _.as[(Long, Long, Long, Long, Double)].collect().toSet
      }
    assert(ran == exact)
    def leaked = spark.sparkContext.getPersistentRDDs.keySet -- idsBefore
    val deadline = System.currentTimeMillis + 15000
    while (leaked.nonEmpty && System.currentTimeMillis < deadline) Thread.sleep(100)
    assert(leaked.isEmpty, s"bloomRun leaked checkpoint RDDs past its action: $leaked")
  }

  test("frequentNgramsSketched ≡ frequentNgrams (the count-min gate is result-invisible)") {
    import graft.text.TextOps
    val docs = graft.io.Tables.documents(spark, sf0001)
    val exact = TextOps
      .frequentNgrams(docs, "doc_id", "text", n = 5, minDocs = 2L, topK = 50)
      .as[(String, Long, Long)].collect().toSeq
    assert(exact.nonEmpty)
    // tight eps (selective gate) AND a sloppy one (gate admits nearly
    // everything): over-admission can never change the result, only
    // the second pass's size
    for (eps <- Seq(1e-4, 0.5)) {
      val sketched = TextOps
        .frequentNgramsSketched(docs, "doc_id", "text", n = 5, minDocs = 2L, topK = 50, eps = eps)
        .as[(String, Long, Long)].collect().toSeq
      assert(sketched == exact, s"eps=$eps diverged")
    }
    // the DEFAULT path derives eps from the corpus's window count
    // (eps = 2/N clamped) — same result, knob-free
    val derived = TextOps
      .frequentNgramsSketched(docs, "doc_id", "text", n = 5, minDocs = 2L, topK = 50)
      .as[(String, Long, Long)].collect().toSeq
    assert(derived == exact, "derived-eps default diverged")
    // the gate is really in the plan, on the gram stream, codegen'd
    val plan = TextOps
      .frequentNgramsSketched(docs, "doc_id", "text", n = 5, minDocs = 2L, topK = 50)
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft_cms_at_least"), s"cms gate missing from plan:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"), s"expected TakeOrderedAndProject:\n$plan")
  }

  test("cmsEpsFor: eps tracks 2/N inside the clamps, width stays plan-shippable") {
    import graft.text.TextOps
    assert(TextOps.cmsEpsFor(10) == 1e-2, "tiny corpus clamps to maxEps")
    assert(TextOps.cmsEpsFor(100000) == 2.0 / 100000, "mid-band tracks 2/N exactly")
    assert(TextOps.cmsEpsFor(1000000000L) == 1e-5, "huge corpus clamps to minEps (bounded sketch)")
    // monotone non-increasing in N
    val es = Seq(1L, 100L, 10000L, 1000000L, 100000000L).map(TextOps.cmsEpsFor(_))
    assert(es == es.sorted.reverse, s"eps not monotone in corpus size: $es")
  }

  test("CmsAtLeast: threshold semantics over a known sketch; null key stays null") {
    import org.apache.spark.sql.functions.col
    // hand-built sketch: key 11 added 3x, key 22 once
    val cms = org.apache.spark.util.sketch.CountMinSketch.create(0.001, 0.99, 7)
    cms.addLong(11L, 3L)
    cms.addLong(22L, 1L)
    val bytes = cms.toByteArray
    def gate(bar: Long) = graft.expressions.Registration.parameterized(
      "graft_cms_gate_test",
      digestSource = s"spec:$bar",
      builder = es => graft.expressions.CmsAtLeast(bytes, bar, es.head),
      col("h"))(spark)
    val df = Seq(Some(11L), Some(22L), Some(33L), None).toDF("h")
    val out = df.select(col("h"), gate(2L).as("hot")).collect()
      .map(r => (
        if (r.isNullAt(0)) None else Some(r.getLong(0)),
        if (r.isNullAt(1)) None else Some(r.getBoolean(1)))).toSet
    assert(out == Set(
      (Some(11L), Some(true)),   // 3 >= 2
      (Some(22L), Some(false)),  // 1 < 2 (over-estimate-free at this load)
      (Some(33L), Some(false)),  // absent
      (None, None)))             // null child propagates null
  }

  test("frequentNgrams: exact counts, minDocs bar, total-order top-K cut") {
    import graft.text.TextOps
    val corpus = Seq(
      (1L, "a b c d"), // "a b c", "b c d"
      (2L, "a b c x"), // "a b c", "b c x"
      (3L, "a b c d"), // "a b c", "b c d"
      (5L, "m n o z"), // "m n o" ties (n_docs, n_occ) with "b c d" -> gram tiebreak
      (6L, "m n o w"),
      (7L, "k k k k k"), // "k k k" x3 occurrences but ONE doc -> minDocs drops it
      (8L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val out = TextOps
      .frequentNgrams(corpus, "doc_id", "text", n = 3, minDocs = 2L, topK = 10)
      .as[(String, Long, Long)].collect().toSeq
    assert(out == Seq(("a b c", 3L, 3L), ("b c d", 2L, 2L), ("m n o", 2L, 2L)))
    // topK truncates AFTER the deterministic order
    val top1 = TextOps
      .frequentNgrams(corpus, "doc_id", "text", n = 3, minDocs = 2L, topK = 1)
      .as[(String, Long, Long)].collect().toSeq
    assert(top1 == Seq(("a b c", 3L, 3L)))
    // the top-K executes as bounded per-partition heaps, not a global sort
    val plan = TextOps
      .frequentNgrams(corpus, "doc_id", "text", n = 3, minDocs = 2L, topK = 1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected TakeOrderedAndProject:\n$plan")
  }

  test("redactPii scrubs emails, urls and long digit runs; leaves prose alone") {
    val out = Seq(
      "contact me at jane.doe+x@corp.example.org or via https://Example.COM/a?b=1 and call 41555501234",
      "ordinary text with the number 42 and year 2026 kept",
      "see (https://x.com) and then https://y.com/path."
    ).toDF("text").select(graft.text.TextOps.redactPii($"text").as("t")).as[String].collect()
    assert(out(0) == "contact me at <EMAIL> or via <URL> and call <NUM>")
    assert(out(1) == "ordinary text with the number 42 and year 2026 kept")
    // trailing punctuation / closing brackets stay out of the placeholder
    assert(out(2) == "see (<URL>) and then <URL>.")
  }

  test("connectedComponents: chains, pairs, and a 20-node path all label to the component min") {
    val pairs = (
      Seq((1L, 2L), (2L, 3L)) ++        // triangle-free chain -> component 1, size 3
        Seq((10L, 11L)) ++              // isolated pair -> component 10, size 2
        (100L until 119L).map(i => (i, i + 1)) // 20-node path: needs pointer jumping, not 1-hop
    ).toDF("id_a", "id_b")
    // both paths of the size-adaptive dispatch must produce the labeling
    for (bound <- Seq(0L, 1L << 20)) {
      val out = graft.dedup.Dedup
        .connectedComponents(pairs, "id_a", "id_b", driverEdgeBound = bound)
        .as[(Long, Long, Long)]
        .collect()
        .map { case (id, comp, size) => id -> (comp, size) }
        .toMap
      assert(Seq(1L, 2L, 3L).forall(out(_) == (1L, 3L)), s"bound=$bound")
      assert(Seq(10L, 11L).forall(out(_) == (10L, 2L)), s"bound=$bound")
      assert((100L to 119L).forall(out(_) == (100L, 20L)), s"bound=$bound")
      assert(out.size == 3 + 2 + 20, s"bound=$bound") // nodes in no pair are absent
    }
  }

  test("connectedComponents: property vs driver union-find on seeded random graphs") {
    // reference implementation: plain weighted union-find
    def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      // min-id canonical labels: path-compress to the root, which is the
      // min because unions always point larger roots at smaller ones
      parent.keys.map(k => k -> find(k)).toMap
    }
    val rng = new scala.util.Random(99)
    for (trial <- 1 to 8) {
      val n = 5 + rng.nextInt(40)
      val m = 1 + rng.nextInt(60)
      val edges = Seq.fill(m)((rng.nextInt(n).toLong, rng.nextInt(n).toLong)).filter(e => e._1 != e._2)
      if (edges.nonEmpty) {
        val expected = unionFind(edges)
        // driverEdgeBound = 0 forces the DISTRIBUTED pointer-jumping
        // path — the whole point is comparing it against union-find
        // (the adaptive default would route these tiny graphs to the
        // driver and make the test self-comparing)
        val got = graft.dedup.Dedup
          .connectedComponents(edges.toDF("id_a", "id_b"), "id_a", "id_b", driverEdgeBound = 0L)
          .as[(Long, Long, Long)]
          .collect()
          .map { case (id, comp, _) => id -> comp }
          .toMap
        assert(got == expected, s"trial $trial (n=$n, m=${edges.size})")
      }
    }
  }

  test("connectedComponents: size-adaptive dispatch AT the driverEdgeBound boundary") {
    // a graph with a pointer-jumping-hard path plus separate clusters,
    // with a KNOWN exact edge count E: bound = E routes to the driver
    // union-find (edges ≤ bound), bound = E − 1 to the distributed
    // path — both must emit the identical labeling
    val edges =
      (0L until 15L).map(i => (i, i + 1)) ++ // 16-node path, E=15
        Seq((100L, 101L), (101L, 102L), (200L, 201L)) // E=18 total
    val e = edges.size.toLong
    val pairs = edges.toDF("id_a", "id_b")
    def labeling(bound: Long): Map[Long, (Long, Long)] =
      graft.dedup.Dedup
        .connectedComponents(pairs, "id_a", "id_b", driverEdgeBound = bound)
        .as[(Long, Long, Long)]
        .collect()
        .map { case (id, comp, size) => id -> (comp, size) }
        .toMap
    val atBound = labeling(e)      // driver path: edges == bound
    val belowBound = labeling(e - 1) // distributed path: edges > bound
    assert(atBound == belowBound)
    assert((0L to 15L).forall(atBound(_) == (0L, 16L)))
    assert(Seq(100L, 101L, 102L).forall(atBound(_) == (100L, 3L)))
    assert(Seq(200L, 201L).forall(atBound(_) == (200L, 2L)))
  }

  test("corpusFrequencyStats: hand-computed scores on a planted corpus; null text absent") {
    import graft.text.TextOps
    val docs = Seq(
      (1L, "the cat sat"),          // the:3, cat:2, sat:1
      (2L, "the cat ran"),          // ran:1
      (3L, "the zebra"),
      (4L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val out = TextOps.corpusFrequencyStats(docs, "doc_id", "text", minCount = 2L)
      .orderBy("doc_id")
      .as[(Long, Long, Double, Double)]
      .collect()
    // corpus_tokens = 8; counts: the=3 cat=2 sat=1 ran=1 zebra=1
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L)) // null-text doc absent
    val Array(d1, d2, d3) = out
    assert(d1._2 == 3 && d1._3 == (3.0 + 2 + 1) / (3.0 * 8) && d1._4 == 1.0 / 3)
    assert(d2._2 == 3 && d2._3 == (3.0 + 2 + 1) / (3.0 * 8) && d2._4 == 1.0 / 3)
    assert(d3._2 == 2 && d3._3 == (3.0 + 1) / (2.0 * 8) && d3._4 == 1.0 / 2)
  }

  test("dupSpanStats: hand-computed coverage on a planted corpus; short and null docs") {
    import graft.text.TextOps
    val docs = Seq(
      // docs 1 and 2 share the span "a b c" (1 window each of 3);
      // doc 1 has 3 windows total ("a b c", "b c d", "c d e"),
      // doc 2 has 2 ("z a b" does NOT match — windows are positional)
      (1L, "a b c d e"),
      (2L, "x a b c"),
      (3L, "p q"),                      // < n tokens: zero windows, kept
      (4L, null.asInstanceOf[String]),  // absent from output
      (5L, "a b c a b c a b c")         // self-repeating: every "a b c" dups docs 1/2
    ).toDF("doc_id", "text")
    val out = TextOps.dupSpanStats(docs, "doc_id", "text", n = 3, maxDupSpanFrac = 0.5)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Double, Boolean)]
      .collect()
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L, 5L)) // null-text doc absent
    val Array(d1, d2, d3, d5) = out
    // doc 1: windows {abc, bcd, cde}; only abc repeats corpus-wide → 1/3
    assert(d1 == ((1L, 3L, 1L, 1.0 / 3.0, true)))
    // doc 2: windows {xab, abc}; abc repeats → 1/2, NOT kept (frac < 0.5 is strict)
    assert(d2 == ((2L, 2L, 1L, 0.5, false)))
    // doc 3: too short for any window → fraction 0, kept
    assert(d3 == ((3L, 0L, 0L, 0.0, true)))
    // doc 5: windows {abc, bca, cab, abc, bca, cab, abc} — every window
    // occurs >1× (abc ×3 here + docs 1/2; bca/cab ×2 within the doc)
    assert(d5 == ((5L, 7L, 7L, 1.0, false)))
  }

  test("dedupSpansExact: first occurrence survives, later copies removed, text reconstructed") {
    import graft.text.TextOps
    val docs = Seq(
      (1L, "a b c d e"),   // windows: abc, bcd, cde — all FIRST occurrences (doc 1 is earliest)
      (2L, "x a b c y"),   // abc repeats doc 1 → removed: positions 2,3,4 covered
      (3L, "p q"),         // shorter than n: untouched
      (4L, null.asInstanceOf[String]),
      (5L, "a b c d e")    // full duplicate of doc 1 → every window removed → empty
    ).toDF("doc_id", "text")
    val out = TextOps.dedupSpansExact(docs, "doc_id", "text", n = 3)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)]
      .collect()
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L, 5L))
    val Array(d1, d2, d3, d5) = out
    // doc 1 holds every first occurrence: nothing removed
    assert(d1 == ((1L, 5L, 0L, "a b c d e")))
    // doc 2: "a b c" at position 2 repeats doc 1's first occurrence →
    // tokens 2..4 drop; "x a b" and "b c y" windows are unique
    assert(d2 == ((2L, 5L, 3L, "x y")))
    assert(d3 == ((3L, 2L, 0L, "p q")))
    // doc 5 repeats doc 1 wholesale: all three windows removed, covering
    // every token
    assert(d5 == ((5L, 5L, 5L, "")))
  }

  test("materializeSequences: in-order concatenation tokenizes back to the summed counts") {
    import graft.text.TextOps
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, "s1", "alpha beta gamma"),
      (2L, "s1", "delta"),
      (3L, "s1", "epsilon zeta"),
      (4L, "s2", "one two three four")
    ).toDF("doc_id", "source", "text")
      .select(col("doc_id"), col("source"),
        TextOps.normalize(col("text")).as("norm"),
        TextOps.tokenCount(col("text")).cast("long").as("n_tokens"))
    val packed = TextOps.packFirstFitExact(docs, "source", "doc_id", "n_tokens", budget = 4)
    val seqs = TextOps.materializeSequences(packed, "source", "bin_id", "doc_id", "norm", "n_tokens")
      .orderBy("source", "bin_id")
      .as[(String, Long, Long, Long, String)]
      .collect()
    // s1: [3][1] fit bin 0 (4 tokens), [2] opens bin 1; s2: one bin
    assert(seqs.toSeq == Seq(
      ("s1", 0L, 2L, 4L, "alpha beta gamma delta"),
      ("s1", 1L, 1L, 2L, "epsilon zeta"),
      ("s2", 0L, 1L, 4L, "one two three four")
    ))
    // the writer invariant: each sequence re-tokenizes to seq_tokens
    val reTok = TextOps.materializeSequences(packed, "source", "bin_id", "doc_id", "norm", "n_tokens")
      .filter(TextOps.tokenCount(col("seq_text")).cast("long") =!= col("seq_tokens"))
    assert(reTok.count() == 0)
  }

  test("span operators: empty and all-null corpora yield empty results, not errors") {
    import graft.text.TextOps
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val allNull = Seq((1L, null.asInstanceOf[String]), (2L, null.asInstanceOf[String])).toDF("doc_id", "text")
    for (df <- Seq(empty, allNull)) {
      assert(TextOps.dupSpanStats(df, "doc_id", "text", n = 3).count() == 0)
      assert(TextOps.dedupSpansExact(df, "doc_id", "text", n = 3).count() == 0)
    }
    val emptyPacked = TextOps.packFirstFitExact(
      Seq.empty[(Long, String, Long)].toDF("doc_id", "source", "n_tokens"),
      "source", "doc_id", "n_tokens", budget = 10)
    assert(TextOps.materializeSequences(emptyPacked, "source", "bin_id", "doc_id", "source", "n_tokens").count() == 0)
  }

  test("thresholded SortedJaccard: exact value at/above t, null below, never a wrong number") {
    import org.apache.spark.sql.functions.{call_function, lit}
    val fn = graft.expressions.SortedJaccard.FunctionName
    // random-ish sorted distinct hash sets across the similarity range
    val rng = new scala.util.Random(5)
    val rows = (0 until 200).map { i =>
      val base = Seq.fill(40)(rng.nextLong().abs % 10000).distinct.sorted
      val keep = base.take(rng.nextInt(base.length + 1))
      val other = (keep ++ Seq.fill(40)(rng.nextLong().abs % 10000)).distinct.sorted
      (i, base, other)
    }
    val df = rows.toDF("i", "a", "b")
    val both = df
      .select(
        $"i",
        call_function(fn, $"a", $"b").as("exact"),
        call_function(fn, $"a", $"b", lit(0.3)).as("thresholded")
      )
      .collect()
    both.foreach { r =>
      val exact = if (r.isNullAt(1)) None else Some(r.getDouble(1))
      val thr = if (r.isNullAt(2)) None else Some(r.getDouble(2))
      exact match {
        case Some(e) if e >= 0.3 => assert(thr.contains(e), s"row ${r.getInt(0)}: $thr != $exact")
        case _                   => assert(thr.isEmpty || thr == exact, s"row ${r.getInt(0)}: sub-threshold must be null or exact")
      }
    }
    // a non-literal / negative threshold is an analysis error, not an NPE
    intercept[Exception] {
      df.select(call_function(fn, $"a", $"b", lit(-0.5))).collect()
    }
    // a column threshold is not foldable -> analysis error too
    intercept[Exception] {
      df.select(call_function(fn, $"a", $"b", $"i")).collect()
    }
    // the SQL spelling of the threshold is DECIMAL(1,1), not DOUBLE —
    // foldable numeric constants must be accepted (the documented form)
    df.createOrReplaceTempView("sj_docs")
    val sqlRows = spark.sql(s"SELECT $fn(a, b, 0.3) AS t, $fn(a, b, CAST(0.3 AS DOUBLE)) AS c FROM sj_docs").collect()
    both.zip(sqlRows).foreach { case (viaLit, viaSql) =>
      assert(
        (viaLit.isNullAt(2) && viaSql.isNullAt(0)) || viaLit.getDouble(2) == viaSql.getDouble(0),
        "SQL decimal literal must behave exactly like lit(0.3)"
      )
      assert(
        (viaSql.isNullAt(0) && viaSql.isNullAt(1)) || viaSql.getDouble(0) == viaSql.getDouble(1),
        "CAST(0.3 AS DOUBLE) must behave exactly like the bare 0.3"
      )
    }
  }

  test("SortedJaccard: null-element guard fires only for containsNull arrays (skip is type-gated)") {
    import org.apache.spark.sql.functions.{call_function, lit, when, col, array}
    val fn = graft.expressions.SortedJaccard.FunctionName
    // arrays built via when(): element type is nullable (containsNull=true),
    // so the guarded null scan must still run and yield NULL for the row
    // with a null slot — the r13 optimization skips the scan ONLY when the
    // child's type proves containsNull=false (e.g. ShingleHashes output)
    val df = Seq((1, true), (2, false)).toDF("i", "poison")
      .select(
        col("i"),
        array(lit(1L), when(col("poison"), lit(null)).otherwise(lit(2L)), lit(3L)).as("a"),
        array(lit(1L), lit(2L), lit(3L)).as("b")
      )
    assert(df.schema("a").dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType].containsNull)
    val out = df.select(col("i"), call_function(fn, col("a"), col("b")).as("j")).orderBy("i").collect()
    assert(out(0).isNullAt(1), "null element must yield null jaccard")
    assert(out(1).getDouble(1) == 1.0)
  }

  test("thresholded SortedJaccard: EXACT-threshold pair survives the early exit (bound rounding)") {
    import org.apache.spark.sql.functions.{call_function, lit}
    val fn = graft.expressions.SortedJaccard.FunctionName
    // |A|=15 contained in |B|=100: jaccard = 15/100 = 0.15 exactly; the
    // unguarded bound t*(n+m)/(1+t) = 15.000000000000002 would prune it
    val a = (1L to 15L).toArray.toSeq
    val b = (1L to 100L).toArray.toSeq
    val r = Seq((a, b)).toDF("a", "b")
      .select(call_function(fn, $"a", $"b", lit(0.15)).as("j"))
      .head()
    assert(!r.isNullAt(0) && r.getDouble(0) == 0.15, "exact-threshold pair must not be pruned")
  }

  test("null array elements yield null from the native expressions, never garbage") {
    // containsNull=true arrays pass the type checks; a null slot must
    // poison the result (HOF parity), not read as 0
    val df = Seq(1).toDF("x").select(
      call_function("graft_dot",
        array(lit(1.0), lit(null).cast("double")), array(lit(1.0), lit(2.0))).as("dot"),
      call_function("graft_sorted_jaccard",
        array(lit(1L), lit(null).cast("long")), array(lit(1L), lit(2L))).as("jac"),
      call_function("graft_simhash60",
        array(lit(1L), lit(null).cast("long"))).as("sim")
    )
    val r = df.collect().head
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
    // and the all-non-null forms still evaluate
    val ok = Seq(1).toDF("x").select(
      call_function("graft_dot", array(lit(1.0), lit(2.0)), array(lit(3.0), lit(4.0))).as("dot")
    ).collect().head
    assert(ok.getDouble(0) == 11.0)
  }

  test("MarkerArgmax native lang-id == HOF formulation on real docs") {
    implicit val s = spark
    val docsReal = graft.io.Tables.documents(spark, sf0001)
    val both = docsReal.select(
      col("doc_id"),
      graft.text.TextOps.langIdHeuristic(col("text")).as("hof"),
      graft.text.TextOps.langIdHeuristicNative(col("text")).as("native")
    )
    assert(both.filter(col("hof") =!= col("native")).count() == 0)
    assert(both.count() > 0)
  }
}
