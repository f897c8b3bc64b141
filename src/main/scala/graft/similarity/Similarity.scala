package graft.similarity

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Relational

/** Similarity search over embedding columns (`Array[Float]`).
  *
  * Kernels are higher-order-function expressions with a *defined* fold
  * order (cast to double, zip-multiply, left-fold sum) so results are
  * bit-reproducible across engines — the DuckDB oracle evaluates the
  * identical fold.
  *
  * Scale shape: brute-force top-k broadcasts the (small) query set and
  * streams the corpus — one scan, no shuffle of the corpus, partial
  * top-k per partition via the window on (query, score). The LSH variant
  * prunes the corpus side to matching sign-buckets first: candidates
  * shrink by ~2^bits, and the final exact re-rank touches only
  * candidates. On 100 TB the bucketed corpus would be written
  * pre-partitioned by bucket so probes are partition-pruned scans.
  */
object Similarity {

  /** Defined-order dot product: the codegen'd native expression
    * ([[graft.expressions.DotProduct]], registered by `Sessions.local`),
    * bit-compatible with the HOF left fold and the DuckDB `list_reduce`
    * oracle. `dotHof` keeps the portable HOF formulation for sessions
    * without the registration.
    */
  def dot(a: Column, b: Column): Column =
    call_function(graft.expressions.DotProduct.FunctionName, a, b)

  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def toDoubleArr(a: Column): Column = transform(a, x => x.cast("double"))

  def norm(v: Column): Column = sqrt(dot(v, v))

  /** Cosine similarity with defined evaluation order:
    * dot / (sqrt(dot(a,a)) * sqrt(dot(b,b))). Prefer the precomputed-norm
    * pair form below in joins — norms belong on the vector, not the pair.
    */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Pair cosine with norms already materialized on each side: the join
    * evaluates ONE dot product per pair instead of three.
    */
  def cosinePre(a: Column, b: Column, normA: Column, normB: Column): Column =
    dot(a, b) / (normA * normB)

  /** Brute-force cosine top-k: for each query vector, the k nearest
    * corpus vectors (self excluded), deterministic tie-break on corpus id.
    */
  def bruteForceTopK(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      queries: DataFrame,
      k: Int
  ): DataFrame = {
    val c = corpus
      .select(col(idCol).as("nbr_id"), toDoubleArr(col(vecCol)).as("nbr_vec"))
      .withColumn("nbr_norm", norm(col("nbr_vec")))
    val q = queries
      .select(col(idCol).as("query_id"), toDoubleArr(col(vecCol)).as("q_vec"))
      .withColumn("q_norm", norm(col("q_vec")))
    val scored = c
      .join(broadcast(q), col("query_id") =!= col("nbr_id"))
      .withColumn("cos", cosinePre(col("q_vec"), col("nbr_vec"), col("q_norm"), col("nbr_norm")))
    Relational
      .topKPerGroup(scored, Seq("query_id"), Seq(col("cos").desc, col("nbr_id").asc), k)
      .select("query_id", "nbr_id", "cos")
  }

  /** Embedding-cosine near-duplicate pairs ≥ `threshold` (id_a < id_b).
    * Exact O(n²) — the verifier/baseline; LSH below is the scale path.
    */
  def cosineNearDupPairs(df: DataFrame, idCol: String, vecCol: String, threshold: Double): DataFrame = {
    val v = df
      .select(col(idCol).as("id"), toDoubleArr(col(vecCol)).as("v"))
      .withColumn("nrm", norm(col("v")))
    val a = v.select(col("id").as("id_a"), col("v").as("v_a"), col("nrm").as("n_a"))
    val b = v.select(col("id").as("id_b"), col("v").as("v_b"), col("nrm").as("n_b"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cos", cosinePre(col("v_a"), col("v_b"), col("n_a"), col("n_b")))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }

  /** SemDeDup-style semantic near-duplicate pairs (Abbas et al. 2023,
    * arXiv:2303.09540, public method): k-means-cluster the embedding
    * space with the IVF coarse quantizer, then search for pairs ONLY
    * within each cluster. This is the published answer to exact cosine
    * dedup's O(n²): clustering bounds the candidate set to
    * O(Σ|cell|²) ≈ O(n²/k), and because the candidate join is an
    * equi-join on `cell`, each cell's pairs build shuffle-local. At
    * 100 TB the corpus is written partitioned by cell
    * ([[writeIvfIndex]] — SemDeDup shares IVF's blocking step
    * verbatim) and pair generation becomes partition-local with zero
    * cross-cell traffic.
    *
    * Cell assignment is scan-local codegen (centroid literals, argmax
    * over dot products — [[cellAssignments]]); emitted cosines are
    * exact, so vs [[cosineNearDupPairs]] the only approximation is
    * MISSED cross-cell pairs (recall), never a false positive.
    * Pass a fitted [[kmeansCentroids]] model for real recall; the
    * id-fallback seeds keep the operator pure-relational for oracles.
    * Returns (id_a, id_b, cell, cos), id_a < id_b.
    */
  /** Cluster-count derivation for [[semDedupPairs]]'s DEFAULT path:
    * cells of bounded occupancy `targetCell` keep the within-cell pair
    * search at O(n · targetCell) TOTAL — linear in n — instead of the
    * O(n²/k) a pinned small k degrades to as the corpus grows (the
    * same scale trap [[lshConfigFor]] closes for sign-LSH, caught by
    * the same ScaleBench harness). k is capped at `maxK` because the
    * driver-side fit samples 2048 vectors ([[kmeansCentroids]]) — past
    * maxK·targetCell documents, occupancy grows linearly again and the
    * honest 100 TB recipe is hierarchical: these cells as the coarse
    * level, then [[lshNearDupPairs]] (auto-sized) WITHIN each cell.
    */
  def semDedupConfigFor(n: Long, targetCell: Int = 128, maxK: Int = 512): Int = {
    require(n > 0 && targetCell > 0 && maxK > 0, s"need positive n/targetCell/maxK, got $n/$targetCell/$maxK")
    math.max(1L, math.min((n + targetCell - 1) / targetCell, maxK.toLong)).toInt
  }

  def semDedupPairs(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      nClusters: Int = 0,
      centroidModel: Option[Array[Array[Double]]] = None
  ): DataFrame = {
    // default path: derive k from the live corpus count and FIT the
    // model — the operator a caller gets without knobs is the
    // scale-safe one; a quadratic small-k config now takes an explicit
    // pin (as the oracle query legitimately does)
    val (k, model) =
      if (nClusters > 0) (nClusters, centroidModel)
      else {
        val kk = semDedupConfigFor(math.max(1L, corpus.count()))
        (kk, Some(centroidModel.getOrElse(kmeansCentroids(corpus, idCol, vecCol, kk))))
      }
    val centroids = resolveCentroids(corpus, idCol, vecCol, k, model)
    val assigned = corpus
      .select(col(idCol).as("id"), toDoubleArr(col(vecCol)).as("v"))
      .withColumn("cell", nearestCellCol(col("v"), centroids))
      .withColumn("nrm", norm(col("v")))
    val a = assigned.select(col("cell"), col("id").as("id_a"), col("v").as("v_a"), col("nrm").as("n_a"))
    val b = assigned.select(col("cell"), col("id").as("id_b"), col("v").as("v_b"), col("nrm").as("n_b"))
    a.join(b, Seq("cell"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", cosinePre(col("v_a"), col("v_b"), col("n_a"), col("n_b")))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cell", "cos")
  }

  /** Bipartite [[semDedupPairs]] — SEMANTIC test-set decontamination:
    * benchmark items whose embedding is near-duplicate of a corpus
    * document. The text-Jaccard form ([[graft.dedup.Dedup.crossLshPairs]])
    * catches verbatim and near-verbatim leaks; this form catches the
    * PARAPHRASED leak — same meaning, different tokens — that no
    * shingle overlap can see. Both sides are assigned to the corpus's
    * k-means cells scan-locally; the benchmark side (tiny by
    * construction) broadcasts into a cell equi-join, so the corpus is
    * scanned once and never shuffles. Returns
    * (corpus_id, bench_id, cell, cos).
    */
  def crossSemDedupPairs(
      corpus: DataFrame,
      bench: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      nClusters: Int = 0,
      centroidModel: Option[Array[Array[Double]]] = None
  ): DataFrame = {
    val (k, model) =
      if (nClusters > 0) (nClusters, centroidModel)
      else {
        val kk = semDedupConfigFor(math.max(1L, corpus.count()))
        (kk, Some(centroidModel.getOrElse(kmeansCentroids(corpus, idCol, vecCol, kk))))
      }
    val centroids = resolveCentroids(corpus, idCol, vecCol, k, model)
    def assign(df: DataFrame, idAs: String, vAs: String, nAs: String) = df
      .select(col(idCol).as(idAs), toDoubleArr(col(vecCol)).as(vAs))
      .withColumn("cell", nearestCellCol(col(vAs), centroids))
      .withColumn(nAs, norm(col(vAs)))
    assign(corpus, "corpus_id", "v_c", "n_c")
      .join(broadcast(assign(bench, "bench_id", "v_b", "n_b")), Seq("cell"))
      .withColumn("cos", cosinePre(col("v_c"), col("v_b"), col("n_c"), col("n_b")))
      .filter(col("cos") >= threshold)
      .select("corpus_id", "bench_id", "cell", "cos")
  }

  /** The retention filter over [[semDedupPairs]]: keep the LOWEST id of
    * every near-duplicate pair (drop ids that appear as `id_b`) — the
    * deterministic per-pair policy, same keep-lowest convention as the
    * MinHash path. For group-accurate retention over transitive
    * duplicate chains, feed the pairs through
    * [[graft.dedup.Dedup.connectedComponents]] instead and keep each
    * component's minimum. The anti-join ships only the slim dropped-id
    * list — document payloads never shuffle.
    */
  def semDedup(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      nClusters: Int = 0,
      centroidModel: Option[Array[Array[Double]]] = None
  ): DataFrame = {
    val drops = semDedupPairs(corpus, idCol, vecCol, threshold, nClusters, centroidModel)
      .select(col("id_b").as(idCol))
      .distinct()
    corpus.join(drops, Seq(idCol), "left_anti")
  }

  /** Deterministic pseudo-random hyperplanes: `bits` planes × `dim`
    * components in [-1, 1), derived from a splitmix64-style counter hash
    * of (seed, plane, component). Pure Scala, reproducible everywhere.
    */
  def hyperplanes(bits: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] =
    Array.tabulate(bits) { p =>
      Array.tabulate(dim) { d =>
        var z = seed + 0x9e3779b97f4a7c15L * (p.toLong * dim + d + 1)
        z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
        z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
        z = z ^ (z >>> 31)
        (z >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0
      }
    }

  /** Sign-LSH bucket id: bit p set iff dot(v, plane_p) > 0. */
  def signBucket(vec: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.foldLeft(lit(0L)) { case (acc, (plane, p)) =>
      val planeCol = array(plane.map(lit): _*)
      acc.bitwiseOR(when(dot(vec, planeCol) > 0.0, lit(1L << p)).otherwise(lit(0L)))
    }

  /** Vector dimensionality inferred from the first non-null vector —
    * bounded model state (a single-row limit scan), never hard-coded.
    * An empty (or all-null) corpus returns 1: every downstream result
    * is empty regardless of the hyperplanes, so any positive dim is
    * correct and the caller still gets an empty DataFrame instead of a
    * `first()` crash.
    */
  def inferDim(df: DataFrame, vecCol: String): Int =
    df.select(size(col(vecCol)).as("d"))
      .filter(col("d").isNotNull)
      .limit(1)
      .collect()
      .headOption
      .map(_.getInt(0))
      .getOrElse(1)

  /** Analytic sign-LSH sizing — the ScaleBench d6 finding
    * operationalized: bucket count must GROW with the corpus or the
    * within-bucket candidate join grows Θ(n²/2^bits) (measured 28–77×
    * at ×10 data under the fixed small-corpus config). Picks the
    * smallest `bits` whose expected bucket occupancy n/2^bits stays ≤
    * `targetBucket` (candidates per table ≈ n·occupancy/2), then the
    * table count that reaches `targetRecall` for pairs at cosine ≥
    * `threshold`: recall = 1 − (1 − p^bits)^tables with
    * p = 1 − acos(threshold)/π.
    *
    * The returned table count is itself a diagnostic: at a weak
    * threshold (e.g. 0.4, p ≈ 0.63) the per-table hit rate p^bits
    * collapses as bits grow and `tables` explodes into the hundreds —
    * the analytic way of saying sign-LSH cannot prune where there is no
    * similarity gap. At a genuine near-dup threshold (0.9 → p ≈ 0.86)
    * the numbers stay practical: n=20k → (bits=9, tables=9),
    * recall ≈ 0.92.
    *
    * `maxTables` turns the no-similarity-gap condition into a LOUD
    * failure instead of an absurd plan: when the analytic table count
    * exceeds it (or p^bits underflows entirely, which previously
    * saturated to Int.MaxValue), the require names the regime and tells
    * the caller to pin explicit knobs. 4096 sits well above every
    * legitimate strong-regime config (n=10^8 at threshold 0.7 needs
    * ~1.1k tables) and well below the weak-regime explosion (n=10^8 at
    * 0.4 wants ~36k).
    */
  def lshConfigFor(
      n: Long,
      threshold: Double,
      targetBucket: Int = 64,
      targetRecall: Double = 0.9,
      maxTables: Int = 4096
  ): (Int, Int) = {
    require(n > 0 && targetBucket > 0, s"need positive corpus/bucket, got n=$n targetBucket=$targetBucket")
    require(threshold > -1.0 && threshold < 1.0, s"cosine threshold must be in (-1, 1), got $threshold")
    require(targetRecall > 0.0 && targetRecall < 1.0, s"targetRecall must be in (0, 1), got $targetRecall")
    val bits = math.max(1, math.ceil(math.log(n.toDouble / targetBucket) / math.log(2.0)).toInt)
    val p = 1.0 - math.acos(threshold) / math.Pi
    val pBits = math.pow(p, bits)
    val tablesD = math.max(1.0, math.ceil(math.log1p(-targetRecall) / math.log1p(-pBits)))
    require(
      java.lang.Double.isFinite(tablesD) && tablesD <= maxTables,
      f"sign-LSH cannot prune at threshold $threshold for n=$n: per-table hit rate p^bits = $pBits%.3g " +
        f"needs ${tablesD}%.3g tables to reach recall $targetRecall (cap $maxTables) — there is no " +
        "similarity gap to exploit at this threshold; use the exact verifier or pin explicit (bits, tables)"
    )
    (bits, tablesD.toInt)
  }

  /** Scale-safe embedding near-dup PAIRS via banded sign-LSH — the
    * embedding analog of [[graft.dedup.Dedup.minhashLshPairs]] and the
    * 100 TB path that replaces [[cosineNearDupPairs]] (the exact O(n²)
    * verifier, kept for test-scale ground truth only).
    *
    * Pipeline: per-vector sign buckets in `tables` independent
    * hyperplane tables (scan-local, codegen'd dot products) → slim
    * (table, bucket, id) rows shuffle for the self equi-join — vectors do
    * NOT ride the bucket shuffle — → distinct candidate pairs → exact
    * cosine verify ≥ `threshold` after re-acquiring vectors by id.
    *
    * Tuning: a pair at angle θ collides in one table with prob
    * p^bits, p = 1 − θ/π; recall = 1 − (1 − p^bits)^tables. BY DEFAULT
    * (bits/tables not passed, i.e. ≤ 0) the config is derived from the
    * corpus count and the threshold via [[lshConfigFor]] — occupancy
    * stays bounded as the corpus grows, so the measured-quadratic
    * small-config (ScaleBench's 28× d6 finding) can only happen by
    * explicit pin, which is exactly what the hash-pinned oracle queries
    * do (their hyperplane literals are baked for a fixed config). The
    * derivation costs one count() over the corpus — at parquet scale a
    * metadata-cheap job, negligible against the pair join it sizes. A
    * production near-dup pass at cosine ≥0.9 (p≈0.9) derives to bits
    * 10–16 / tables ~6–16 depending on n: bucket occupancy shrinks by
    * 2^bits, which is what keeps the within-bucket pair join
    * sub-quadratic at scale.
    */
  /** The seeded hyperplane family for a banded sign-LSH table set —
    * factored out so the DuckDB oracle can embed the SAME plane values
    * as SQL literals and recompute bucket assignment independently
    * (d6_buckets).
    */
  def tablePlanes(bits: Int, tables: Int, dim: Int, seed: Long): Array[Array[Array[Double]]] =
    Array.tabulate(tables)(t => hyperplanes(bits, dim, seed = seed + 1000L * t))

  /** Resolve an operator's (bits, tables): the caller's explicit pin
    * when BOTH are positive, else the [[lshConfigFor]] derivation from
    * the live corpus count — mixing one explicit knob with one derived
    * is rejected (the two only make sense as a pair; a half-pin would
    * silently run a config nobody chose).
    */
  private def derivedConfig(
      df: DataFrame,
      threshold: Double,
      bits: Int,
      tables: Int,
      targetRecall: Double
  ): (Int, Int) =
    if (bits > 0 && tables > 0) (bits, tables)
    else {
      require(bits <= 0 && tables <= 0, s"pass both bits and tables, or neither (got bits=$bits tables=$tables)")
      lshConfigFor(math.max(1L, df.count()), threshold, targetRecall = targetRecall)
    }

  /** The blocking step of [[lshNearDupPairs]] on its own: the slim
    * (tbl, bucket, id) bucket-assignment relation. Deterministic given
    * (bits, tables, seed, dim), so it is oracle-checkable — the one part
    * of the LSH pipeline that is pure relational algebra over the seeded
    * model, pinning the exact blocking the scale path performs.
    */
  def bucketAssignments(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      bits: Int,
      tables: Int,
      seed: Long,
      dim: Int
  ): DataFrame = {
    val planes = tablePlanes(bits, tables, dim, seed)
    def buckets(vec: Column): Column =
      array(planes.zipWithIndex.map { case (ps, t) =>
        struct(lit(t).as("tbl"), signBucket(vec, ps).as("bucket"))
      }: _*)
    df.select(col(idCol).as("id"), toDoubleArr(col(vecCol)).as("v"))
      .select(col("id"), explode(buckets(col("v"))).as("tb"))
      .select(col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket"), col("id"))
  }

  def lshNearDupPairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      bits: Int = 0,
      tables: Int = 0,
      seed: Long = 42L,
      targetRecall: Double = 0.98
  ): DataFrame = {
    // default path: derive the scale-safe config analytically. The 0.98
    // analytic recall target holds at EXACTLY the threshold; pairs above
    // it collide strictly more often, so measured recall sits higher
    // (the spec's 0.95 bar rides this path).
    val (bitsR, tablesR) = derivedConfig(df, threshold, bits, tables, targetRecall)
    val dim = inferDim(df, vecCol)
    val v = df
      .select(col(idCol).as("id"), toDoubleArr(col(vecCol)).as("v"))
      .withColumn("nrm", norm(col("v")))
    val slim = bucketAssignments(df, idCol, vecCol, bitsR, tablesR, seed, dim)
    val a = slim.select(col("tbl"), col("bucket"), col("id").as("id_a"))
    val b = slim.select(col("tbl"), col("bucket"), col("id").as("id_b"))
    val candidates = a
      .join(b, Seq("tbl", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .dropDuplicates("id_a", "id_b")
    candidates
      .join(v.select(col("id").as("id_a"), col("v").as("v_a"), col("nrm").as("n_a")), Seq("id_a"))
      .join(v.select(col("id").as("id_b"), col("v").as("v_b"), col("nrm").as("n_b")), Seq("id_b"))
      .withColumn("cos", cosinePre(col("v_a"), col("v_b"), col("n_a"), col("n_b")))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }

  /** Symmetric per-vector int8 quantization: scale = max|v_i| / 127,
    * q_i = floor(v_i/scale + 0.5) as TINYINT — the 4×-smaller storage
    * form a 100 TB embedding corpus actually ships (bandwidth and cache
    * footprint dominate ANN scans). `floor(x + 0.5)` rather than
    * `round` so Spark and the DuckDB oracle share one exactly-defined
    * rule. The scale rides along in the struct for dequantization;
    * cosine between quantized vectors doesn't need it (scales cancel).
    *
    * The scale binds through [[graft.functions.Functions.bindOnce]]:
    * referenced directly, CollapseProject would inline the `array_max`
    * scan into EVERY element's quantize lambda (O(d²) per row).
    */
  def quantizeInt8(vec: Column): Column = {
    val v = toDoubleArr(vec)
    graft.functions.Functions.bindOnce(array_max(transform(v, x => abs(x))) / 127.0) { s =>
      struct(
        s.as("scale"),
        transform(v, x => when(s === 0.0, lit(0)).otherwise(floor(x / s + 0.5)).cast("tinyint")).as("q")
      )
    }
  }

  /** Brute-force top-k over the QUANTIZED corpus: same shape as
    * [[bruteForceTopK]] (broadcast queries, one corpus scan) but the
    * scan reads int8 codes — the memory-bound regime where quantization
    * pays. Scores are exact cosines of the quantized vectors (scales
    * cancel), so the whole operator is SQL-expressible and
    * oracle-checkable; recall vs the float cosine is the quality trade.
    */
  def quantizedTopK(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      queries: DataFrame,
      k: Int
  ): DataFrame = {
    def prep(df: DataFrame, idAs: String, vecAs: String, normAs: String) =
      df.select(col(idCol).as(idAs), quantizeInt8(col(vecCol)).getField("q").as("q8"))
        .select(col(idAs), transform(col("q8"), x => x.cast("double")).as(vecAs))
        .withColumn(normAs, norm(col(vecAs)))
    val c = prep(corpus, "nbr_id", "nbr_q", "nbr_norm")
    val q = prep(queries, "query_id", "q_q", "q_norm")
    val scored = c
      .join(broadcast(q), col("query_id") =!= col("nbr_id"))
      .withColumn("qcos", cosinePre(col("q_q"), col("nbr_q"), col("q_norm"), col("nbr_norm")))
    Relational
      .topKPerGroup(scored, Seq("query_id"), Seq(col("qcos").desc, col("nbr_id").asc), k)
      .select("query_id", "nbr_id", "qcos")
  }

  /** Product-quantization sub-centroids (Jégou, Douze, Schmid 2011,
    * "Product quantization for nearest neighbor search" — public
    * method): the d-dim space splits into `m` subspaces of d/m dims;
    * each subspace gets its own EUCLIDEAN k-means codebook of `ks`
    * sub-centroids, fit driver-side on the same bounded hash-ordered
    * sample discipline as [[kmeansCentroids]]. A vector's code is then
    * m small integers (m=8, ks=16 → 8 nibbles ≈ 8 bytes vs 512 for
    * raw float64×64) — the memory-bound regime where a 100 TB corpus's
    * candidate scan fits in RAM. Returns model(s)(c) = sub-centroid c
    * of subspace s.
    */
  def pqSubCentroids(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      m: Int = 8,
      ks: Int = 16,
      iters: Int = 5,
      sampleSize: Int = 2048
  ): Array[Array[Array[Double]]] = {
    val sample: Array[Array[Double]] = corpus
      .select(col(idCol).as("id"), toDoubleArr(col(vecCol)).as("v"))
      .orderBy(xxhash64(col("id").cast("string")), col("id"))
      .limit(sampleSize)
      .collect()
      .map(_.getSeq[Double](1).toArray)
    require(sample.length >= ks, s"sample ${sample.length} smaller than ks=$ks")
    val dim = sample.head.length
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val sub = dim / m
    Array.tabulate(m) { s =>
      val pts = sample.map(v => java.util.Arrays.copyOfRange(v, s * sub, (s + 1) * sub))
      var cents = pts.take(ks).map(_.clone())
      var it = 0
      while (it < iters) {
        val sums = Array.fill(ks)(new Array[Double](sub))
        val counts = new Array[Int](ks)
        pts.foreach { p =>
          // argmin L2², ties → larger index (<= under ascending c),
          // mirroring the encode path's augmented-dot argmax tie rule
          var best = Double.PositiveInfinity; var bc = 0; var c = 0
          while (c < ks) {
            var d2 = 0.0; var i = 0
            while (i < sub) { val t = p(i) - cents(c)(i); d2 += t * t; i += 1 }
            if (d2 <= best) { best = d2; bc = c }
            c += 1
          }
          var i = 0
          while (i < sub) { sums(bc)(i) += p(i); i += 1 }
          counts(bc) += 1
        }
        cents = Array.tabulate(ks) { c =>
          if (counts(c) == 0) cents(c)
          else { val u = new Array[Double](sub); var i = 0; while (i < sub) { u(i) = sums(c)(i) / counts(c); i += 1 }; u }
        }
        it += 1
      }
      cents
    }
  }

  /** The PQ codebook AUGMENTED for dot-argmax encoding: sub-centroid c
    * becomes [c…, −½‖c‖²], so that for x extended with a trailing 1.0,
    * dot([x,1], [c,b]) = x·c − ½‖c‖² — whose argmax over c equals the
    * L2 argmin (‖x−c‖² = ‖x‖² − 2(x·c − ½‖c‖²), ties agree since equal
    * distance ⟺ equal augmented dot). This is what lets encoding run
    * through the same native fused-argmax expression as IVF cell
    * assignment, and what the oracle renders as literals.
    */
  def pqAugmented(model: Array[Array[Array[Double]]]): Array[Array[Array[Double]]] =
    model.map(_.map { c =>
      var sq = 0.0; var i = 0
      while (i < c.length) { sq += c(i) * c(i); i += 1 }
      c :+ (-0.5 * sq)
    })

  /** PQ encoding: (id, code) where code(s) = nearest sub-centroid of
    * subspace s — m native argmaxes per row, scan-local, no shuffle.
    */
  def pqEncode(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      model: Array[Array[Array[Double]]]
  ): DataFrame = {
    val aug = pqAugmented(model)
    val m = model.length
    val sub = model.head.head.length
    implicit val spark: SparkSession = org.apache.spark.sql.SparkSession.active
    val v = toDoubleArr(col(vecCol))
    val codes = (0 until m).map { s =>
      graft.expressions.NearestCell.column(
        concat(slice(v, s * sub + 1, sub), array(lit(1.0))),
        aug(s)
      )
    }
    df.select(col(idCol).as("id"), array(codes: _*).as("code"))
  }

  /** ADC approximate squared distance of a query vector to a coded
    * candidate: Σ_s ‖q_s − cent(s, code_s)‖², sub-centroids looked up
    * from the constant-folded codebook literal (sliced back out of the
    * SAME augmented arrays the oracle renders — one model, two
    * readers), folded left from 0.0 exactly like the oracle's
    * `list_prepend(0.0, …)` `list_reduce`.
    */
  private def pqAdistCol(qv: Column, code: Column, model: Array[Array[Array[Double]]]): Column = {
    val aug = pqAugmented(model)
    val m = model.length
    val sub = model.head.head.length
    def centLit(s: Int): Column =
      array(aug(s).map(c => array(c.take(sub).map(lit): _*)): _*)
    val dists = (0 until m).map { s =>
      val qs = slice(qv, s * sub + 1, sub)
      val cs = element_at(centLit(s), element_at(code, s + 1) + 1)
      (dot(qs, qs) - lit(2.0) * dot(qs, cs)) + dot(cs, cs)
    }
    (lit(0.0) +: dists).reduce(_ + _)
  }

  /** PQ ANN top-k by asymmetric distance (ADC): the corpus is scanned
    * as CODES ONLY (the memory-bound 100 TB regime PQ exists for);
    * each query computes its approximate distance to a candidate as
    * Σ_s ‖q_s − cent(s, code_s)‖², sub-centroids looked up from the
    * literal codebook (constant-folded; the dots are native). Exact in
    * the quantized space, approximate in the original — recall vs the
    * float cosine is the quality trade, [[quantizedTopK]]'s int8 path
    * trades less memory for less error, PQ trades 64× compression.
    * Deterministic tie-break (adist asc, nbr_id asc).
    */
  def pqTopK(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      queries: DataFrame,
      k: Int,
      model: Array[Array[Array[Double]]]
  ): DataFrame = {
    val enc = pqEncode(corpus, idCol, vecCol, model).select(col("id").as("nbr_id"), col("code"))
    val q = queries.select(col(idCol).as("query_id"), toDoubleArr(col(vecCol)).as("qv"))
    val scored = enc
      .join(broadcast(q), col("query_id") =!= col("nbr_id"))
      .withColumn("adist", pqAdistCol(col("qv"), col("code"), model))
    Relational
      .topKPerGroup(scored, Seq("query_id"), Seq(col("adist").asc, col("nbr_id").asc), k)
      .select("query_id", "nbr_id", "adist")
  }

  /** PQ as a FILTER: ADC shortlists `shortlist` candidates per query
    * from the codes-only scan, then only those rows' full vectors are
    * fetched for an exact cosine re-rank to top-k — the standard
    * two-stage PQ deployment. On a corpus with low intrinsic
    * dimensionality the shortlist is nearly free recall; on an
    * isotropic corpus (distance concentration — this test corpus by
    * construction) it is what makes PQ usable at all: plain ADC top-5
    * recall measured 0.16 here, the re-ranked form recovers most of
    * the gap at `shortlist`/n of the full-vector reads.
    */
  def pqTopKReranked(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      queries: DataFrame,
      k: Int,
      model: Array[Array[Array[Double]]],
      shortlist: Int = 50
  ): DataFrame = {
    require(shortlist >= k, s"shortlist $shortlist must cover k=$k")
    val cand = pqTopK(corpus, idCol, vecCol, queries, shortlist, model)
      .select(col("query_id"), col("nbr_id"))
    val vecs = corpus.select(col(idCol).as("nbr_id"), toDoubleArr(col(vecCol)).as("nbr_vec"))
      .withColumn("nbr_norm", norm(col("nbr_vec")))
    val qv = queries.select(col(idCol).as("query_id"), toDoubleArr(col(vecCol)).as("q_vec"))
      .withColumn("q_norm", norm(col("q_vec")))
    val scored = cand
      .join(vecs, Seq("nbr_id"))
      .join(broadcast(qv), Seq("query_id"))
      .withColumn("cos", cosinePre(col("q_vec"), col("nbr_vec"), col("q_norm"), col("nbr_norm")))
    Relational
      .topKPerGroup(scored, Seq("query_id"), Seq(col("cos").desc, col("nbr_id").asc), k)
      .select("query_id", "nbr_id", "cos")
  }

  /** Spherical k-means over a BOUNDED deterministic sample, fit
    * driver-side: the sample (≤ `sampleSize` rows, hash-ordered so it is
    * stable across runs and partitionings) and the model (k × dim
    * doubles) are model state, not data — the collect is bounded by
    * construction. Assignment is by dot product against UNIT-normalized
    * centroids (raw-dot assignment would be dominated by whichever
    * centroid has the largest norm and collapse clusters); the update
    * is the assigned mean, re-normalized. Returned centroids are unit
    * vectors, so [[ivfTopK]]'s dot-product cell assignment becomes an
    * argmax over cosines. Empty clusters keep their previous direction.
    */
  def kmeansCentroids(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int = 5,
      sampleSize: Int = 2048
  ): Array[Array[Double]] = {
    val sample: Array[Array[Double]] = corpus
      .select(col(idCol).as("id"), toDoubleArr(col(vecCol)).as("v"))
      .orderBy(xxhash64(col("id").cast("string")), col("id"))
      .limit(sampleSize)
      .collect()
      .map(_.getSeq[Double](1).toArray)
    require(sample.length >= k, s"sample ${sample.length} smaller than k=$k")
    val dim = sample.head.length
    def unit(v: Array[Double]): Array[Double] = {
      var n2 = 0.0; var i = 0
      while (i < dim) { n2 += v(i) * v(i); i += 1 }
      val n = math.sqrt(n2)
      if (n == 0.0) v else { val u = new Array[Double](dim); i = 0; while (i < dim) { u(i) = v(i) / n; i += 1 }; u }
    }
    var cents = sample.take(k).map(v => unit(v.clone()))
    var it = 0
    while (it < iters) {
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Int](k)
      sample.foreach { v =>
        var best = 0; var bestDot = Double.NegativeInfinity
        var c = 0
        while (c < k) {
          var d = 0.0; var i = 0
          while (i < dim) { d += v(i) * cents(c)(i); i += 1 }
          if (d > bestDot) { bestDot = d; best = c }
          c += 1
        }
        var i = 0
        while (i < dim) { sums(best)(i) += v(i); i += 1 }
        counts(best) += 1
      }
      cents = Array.tabulate(k) { c =>
        if (counts(c) == 0) cents(c) else unit(sums(c))
      }
      it += 1
    }
    cents
  }

  /** IVF-style approximate top-k: a coarse quantizer assigns every
    * corpus vector to its nearest centroid (scan-local argmax over
    * `centroids` dot products — codegen'd, no shuffle); each query
    * probes its `nProbe` nearest centroid cells and exactly re-ranks
    * only those cells' vectors.
    *
    * Centroids are pluggable model state: pass a fitted model
    * ([[kmeansCentroids]]) via `centroidModel`, or let the lowest-id
    * corpus vectors serve as deterministic seeds; either way they are
    * bounded (nCentroids × dim doubles) and inlined as literals so cell
    * assignment runs inside whole-stage codegen. At 100 TB the
    * cell-assigned corpus would be written partitioned by `cell` so each
    * probe is a partition-pruned scan.
    */
  /** Resolve the IVF centroid set: a fitted model when provided, else
    * the deterministic fallback (first `nCentroids` corpus vectors by
    * id) — the fallback is pure relational algebra over the corpus, so
    * cell assignment under it is DuckDB-oracle-checkable (n3_cells).
    */
  def resolveCentroids(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      nCentroids: Int,
      centroidModel: Option[Array[Array[Double]]]
  ): Array[(Int, Array[Double])] = centroidModel match {
    case Some(m) =>
      require(m.length == nCentroids, s"centroidModel has ${m.length} cells but nCentroids=$nCentroids")
      m.zipWithIndex.map { case (c, i) => i -> c }
    case None =>
      corpus
        .select(col(idCol).cast("long").as("id"), toDoubleArr(col(vecCol)).as("v"))
        .orderBy("id")
        .limit(nCentroids)
        .collect()
        .zipWithIndex
        .map { case (r, i) => i -> r.getSeq[Double](1).toArray }
  }

  /** (dot, cellId) structs for every centroid; struct max/sort orders by
    * dot first, then cell id (ties → larger cell).
    */
  private def cellScoresCol(vec: Column, centroids: Array[(Int, Array[Double])]): Column =
    array(centroids.map { case (cid, cvec) =>
      struct(dot(vec, array(cvec.map(lit): _*)).as("score"), lit(cid).as("cell"))
    }: _*)

  /** Nearest-cell ASSIGNMENT via the native fused argmax
    * ([[graft.expressions.NearestCell]]) — bit-identical to
    * `array_max(cellScoresCol(...)).cell` but O(k·d) per row in one
    * compiled loop instead of an O(k·d)-node expression tree (which
    * falls out of codegen and runs interpreted at the auto-derived k —
    * measured 16.8 s vs sub-second for n=20k, k=157). The struct form
    * stays for PROBE sides that need the full sorted score list.
    */
  private def nearestCellCol(vec: Column, centroids: Array[(Int, Array[Double])]): Column = {
    centroids.zipWithIndex.foreach { case ((cid, _), i) =>
      require(cid == i, s"non-ordinal centroid id $cid at index $i")
    }
    graft.expressions.NearestCell.column(vec, centroids.map(_._2))(org.apache.spark.sql.SparkSession.active)
  }

  /** The IVF BLOCKING step on its own: nearest-centroid cell per corpus
    * vector. With the id-fallback centroid set this is deterministic
    * pure-relational and hash-pinnable; [[ivfTopK]] runs the same
    * machinery with the fitted model.
    */
  def cellAssignments(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      nCentroids: Int,
      centroidModel: Option[Array[Array[Double]]] = None
  ): DataFrame = {
    val centroids = resolveCentroids(corpus, idCol, vecCol, nCentroids, centroidModel)
    corpus
      .select(col(idCol).as("id"), toDoubleArr(col(vecCol)).as("v"))
      .withColumn("cell", nearestCellCol(col("v"), centroids))
      .select("id", "cell")
  }

  def ivfTopK(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      queries: DataFrame,
      k: Int,
      nCentroids: Int = 16,
      nProbe: Int = 4,
      centroidModel: Option[Array[Array[Double]]] = None
  ): DataFrame = {
    val centroids = resolveCentroids(corpus, idCol, vecCol, nCentroids, centroidModel)
    def cellScores(vec: Column): Column = cellScoresCol(vec, centroids)
    val assignedCorpus = corpus
      .select(col(idCol).as("nbr_id"), toDoubleArr(col(vecCol)).as("nbr_vec"))
      .withColumn("cell", nearestCellCol(col("nbr_vec"), centroids))
    val probes = queries
      .select(col(idCol).as("query_id"), toDoubleArr(col(vecCol)).as("q_vec"))
      .withColumn(
        "cell",
        explode(
          slice(
            transform(reverse(array_sort(cellScores(col("q_vec")))), s => s.getField("cell")),
            1,
            nProbe
          )
        )
      )
    val scored = assignedCorpus
      .join(broadcast(probes), Seq("cell"))
      .filter(col("query_id") =!= col("nbr_id"))
      .withColumn("cos", cosine(col("q_vec"), col("nbr_vec")))
    Relational
      .topKPerGroup(scored, Seq("query_id"), Seq(col("cos").desc, col("nbr_id").asc), k)
      .select("query_id", "nbr_id", "cos")
  }

  /** Materialize the IVF index [[ivfTopK]] describes for 100 TB: the
    * corpus written PARTITIONED BY its nearest-centroid cell, with the
    * centroid model as an underscore-prefixed sidecar inside the same
    * root (partition discovery ignores `_`-prefixed paths, so the index
    * root stays a single self-describing artifact). A probe then reads
    * only its cells' directories — see [[ivfTopKIndexed]].
    */
  def writeIvfIndex(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      path: String,
      nCentroids: Int = 16,
      centroidModel: Option[Array[Array[Double]]] = None
  ): Unit = {
    val centroids = resolveCentroids(corpus, idCol, vecCol, nCentroids, centroidModel)
    corpus
      .select(col(idCol).as("id"), toDoubleArr(col(vecCol)).as("v"))
      .withColumn("cell", nearestCellCol(col("v"), centroids))
      .write
      .mode("overwrite")
      .partitionBy("cell")
      .parquet(path)
    val spark = corpus.sparkSession
    import spark.implicits._
    centroids.toSeq
      .map { case (c, v) => (c, v.toSeq) }
      .toDF("cell", "cvec")
      .coalesce(1)
      .write
      .mode("overwrite")
      .parquet(s"$path/_centroids")
  }

  /** The index's centroid model, read back from the sidecar — bounded
    * model state (nCentroids × dim doubles), same class of collect as
    * [[resolveCentroids]]'s fallback.
    */
  def readIvfCentroids(spark: SparkSession, path: String): Array[(Int, Array[Double])] =
    spark.read
      .parquet(s"$path/_centroids")
      .collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray)
      .sortBy(_._1)

  /** `batch` rendered into the index's geometry — (`id`, `v`, `cell`,
    * `nrm`) under the FROZEN sidecar model — the ONE cell-assignment
    * job every index-facing stage of an ingest gate shares (replay
    * guard, probe, append; the [[graft.dedup.Dedup.batchSignatures]]
    * precedent). Because the model is frozen, assignment is a pure
    * function of the vector: a replayed row lands in the same cell its
    * prior append did, which is what lets the guard and probe prune
    * their index reads to the batch's touched cell directories.
    */
  def assignedBatch(
      spark: SparkSession,
      path: String,
      batch: DataFrame,
      idCol: String,
      vecCol: String
  ): DataFrame = {
    val centroids = readIvfCentroids(spark, path)
    batch
      .select(col(idCol).as("id"), toDoubleArr(col(vecCol)).as("v"))
      .withColumn("cell", nearestCellCol(col("v"), centroids))
      .withColumn("nrm", norm(col("v")))
  }

  /** IVF top-k against a [[writeIvfIndex]] artifact — the partition-
    * pruned form of [[ivfTopK]]: the distinct probed cells (a bounded
    * model-state collect, ≤ |queries| × nProbe ints — ANN probes a
    * bounded query set by construction) are rendered as an `isin`
    * LITERAL into the scan filter, so Catalyst prunes the non-probed
    * cell directories at PLANNING time and the job never lists, opens,
    * or decodes them. At 1000 executors over 100 TB this is the
    * difference between a full-corpus scan per probe batch and reading
    * nProbe/nCentroids of the data; IvfIndexSpec pins both the pruning
    * (selectedPartitions < nCentroids) and result-equality with the
    * unindexed [[ivfTopK]] under the same model.
    */
  def ivfTopKIndexed(
      spark: SparkSession,
      path: String,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nProbe: Int = 4
  ): DataFrame = {
    val centroids = readIvfCentroids(spark, path)
    val probes = queries
      .select(col(idCol).as("query_id"), toDoubleArr(col(vecCol)).as("q_vec"))
      .withColumn(
        "cell",
        explode(
          slice(
            transform(reverse(array_sort(cellScoresCol(col("q_vec"), centroids))), s => s.getField("cell")),
            1,
            nProbe
          )
        )
      )
    val probedCells = probes.select("cell").distinct().collect().map(_.getInt(0)).sorted
    val indexed = spark.read.parquet(path).filter(col("cell").isin(probedCells.toSeq: _*))
    val scored = indexed
      .select(col("id").as("nbr_id"), col("v").as("nbr_vec"), col("cell"))
      .join(broadcast(probes), Seq("cell"))
      .filter(col("query_id") =!= col("nbr_id"))
      .withColumn("cos", cosine(col("q_vec"), col("nbr_vec")))
    graft.ops.Relational
      .topKPerGroup(scored, Seq("query_id"), Seq(col("cos").desc, col("nbr_id").asc), k)
      .select("query_id", "nbr_id", "cos")
  }

  /** Multi-table sign-LSH approximate top-k (classic OR-amplification):
    * `tables` independent hash tables of `bits` hyperplane sign bits
    * each; a corpus vector is a candidate iff it shares a bucket with the
    * query in ANY table; candidates are exactly re-ranked by cosine.
    *
    * Recall ≈ 1 − (1 − p^bits)^tables where p = 1 − θ/π per bit — tune
    * (bits, tables) to the corpus's similarity regime, or let the
    * DEFAULT path derive them from the corpus count via [[lshConfigFor]]
    * (bits/tables not passed): top-k has no threshold, so the sizing
    * anchors on `expectedCos`, the similarity level at which the
    * analytic recall target is honored — neighbors nearer than that are
    * found strictly more often, farther ones less (lower `expectedCos`
    * buys wider recall with more tables). Candidates arrive
    * via an equi-join on (table, bucket) — shuffle-free here because the
    * query side broadcasts; at 100 TB the corpus would be written
    * bucket-partitioned so each probe is a pruned scan, and duplicate
    * candidates from multiple tables collapse with dropDuplicates before
    * the (expensive) exact re-rank.
    */
  def lshTopK(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      queries: DataFrame,
      k: Int,
      bits: Int = 0,
      tables: Int = 0,
      seed: Long = 42L,
      expectedCos: Double = 0.8
  ): DataFrame = {
    val (bitsR, tablesR) = derivedConfig(corpus, expectedCos, bits, tables, targetRecall = 0.95)
    val dim = inferDim(corpus, vecCol)
    // single-definition plane family (shared with bucketAssignments and
    // the n2 oracle's SQL literals) — an inline re-derivation here would
    // silently desynchronize the query from its oracle on any edit
    val planes = tablePlanes(bitsR, tablesR, dim, seed)
    def buckets(vec: Column): Column =
      array(planes.zipWithIndex.map { case (ps, t) =>
        struct(lit(t).as("tbl"), signBucket(vec, ps).as("bucket"))
      }: _*)
    val c = corpus
      .select(col(idCol).as("nbr_id"), toDoubleArr(col(vecCol)).as("nbr_vec"))
      .withColumn("nbr_norm", norm(col("nbr_vec")))
      .select(col("nbr_id"), col("nbr_vec"), col("nbr_norm"), explode(buckets(col("nbr_vec"))).as("tb"))
      .select(col("nbr_id"), col("nbr_vec"), col("nbr_norm"), col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket"))
    val q = queries
      .select(col(idCol).as("query_id"), toDoubleArr(col(vecCol)).as("q_vec"))
      .withColumn("q_norm", norm(col("q_vec")))
      .select(col("query_id"), col("q_vec"), col("q_norm"), explode(buckets(col("q_vec"))).as("tb"))
      .select(col("query_id"), col("q_vec"), col("q_norm"), col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket"))
    val candidates = c
      .join(broadcast(q), Seq("tbl", "bucket"))
      .filter(col("query_id") =!= col("nbr_id"))
      .dropDuplicates("query_id", "nbr_id")
    // norms ride each side from BEFORE the explode: one dot per surviving
    // candidate pair instead of three
    val scored = candidates
      .withColumn("cos", cosinePre(col("q_vec"), col("nbr_vec"), col("q_norm"), col("nbr_norm")))
    Relational
      .topKPerGroup(scored, Seq("query_id"), Seq(col("cos").desc, col("nbr_id").asc), k)
      .select("query_id", "nbr_id", "cos")
  }

  /** Materialize the bucket-partitioned LSH index [[lshTopK]] describes
    * for 100 TB: each table's bucketed copy of the corpus written
    * PARTITIONED BY (tbl, bucket), with the (bits, tables, seed, dim)
    * config as an in-root `_config` sidecar — the hyperplane family is a
    * pure function of the config ([[tablePlanes]]), so the sidecar fully
    * reconstructs the model at probe time. Storage is ×`tables` (the
    * classic multi-table LSH trade: each table IS an index); where that
    * is too dear, the slim variant — partition only (tbl, bucket, id)
    * and re-acquire vectors from an id-bucketed base corpus
    * ([[graft.io.Bucketing]]) — trades the replication for one
    * co-located join per probe batch.
    */
  def writeLshIndex(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      path: String,
      bits: Int = 0,
      tables: Int = 0,
      seed: Long = 42L,
      expectedCos: Double = 0.8
  ): Unit = {
    val (bitsR, tablesR) = derivedConfig(corpus, expectedCos, bits, tables, targetRecall = 0.95)
    val dim = inferDim(corpus, vecCol)
    val v = corpus
      .select(col(idCol).as("id"), toDoubleArr(col(vecCol)).as("v"))
      .withColumn("nrm", norm(col("v")))
    bucketAssignments(corpus, idCol, vecCol, bitsR, tablesR, seed, dim)
      .join(v, Seq("id"))
      .write
      .mode("overwrite")
      .partitionBy("tbl", "bucket")
      .parquet(path)
    val spark = corpus.sparkSession
    import spark.implicits._
    Seq((bitsR, tablesR, seed, dim))
      .toDF("bits", "tables", "seed", "dim")
      .coalesce(1)
      .write
      .mode("overwrite")
      .parquet(s"$path/_config")
  }

  /** Sign-LSH top-k against a [[writeLshIndex]] artifact — the
    * partition-pruned form of [[lshTopK]]: queries bucket through the
    * sidecar-reconstructed plane family, and the probed (tbl, bucket)
    * set (bounded: ≤ |queries| × tables pairs) becomes a literal
    * disjunction over the partition columns, so only the probed bucket
    * directories are listed and decoded. Semantics are pinned identical
    * to the unindexed operator by LshIndexSpec.
    */
  def lshTopKIndexed(
      spark: SparkSession,
      path: String,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int
  ): DataFrame = {
    val cfg = spark.read.parquet(s"$path/_config").collect().head
    val (bits, tables, seed, dim) = (cfg.getInt(0), cfg.getInt(1), cfg.getLong(2), cfg.getInt(3))
    val planes = tablePlanes(bits, tables, dim, seed)
    def buckets(vec: Column): Column =
      array(planes.zipWithIndex.map { case (ps, t) =>
        struct(lit(t).as("tbl"), signBucket(vec, ps).as("bucket"))
      }: _*)
    val q = queries
      .select(col(idCol).as("query_id"), toDoubleArr(col(vecCol)).as("q_vec"))
      .withColumn("q_norm", norm(col("q_vec")))
      .select(col("query_id"), col("q_vec"), col("q_norm"), explode(buckets(col("q_vec"))).as("tb"))
      .select(col("query_id"), col("q_vec"), col("q_norm"), col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket"))
    // bounded model-state collect (≤ |queries| × tables pairs) rendered
    // as partition-column literals — planning-time pruning, like
    // ivfTopKIndexed's isin
    val probed = q.select("tbl", "bucket").distinct().collect().map(r => (r.getInt(0), r.getLong(1)))
    require(probed.nonEmpty, "no probe buckets — empty query set?")
    val pruneP = probed
      .map { case (t, b) => col("tbl") === t && col("bucket") === b }
      .reduce(_ || _)
    val candidates = spark.read
      .parquet(path)
      .filter(pruneP)
      .select(col("id").as("nbr_id"), col("v").as("nbr_vec"), col("nrm").as("nbr_norm"), col("tbl"), col("bucket"))
      .join(broadcast(q), Seq("tbl", "bucket"))
      .filter(col("query_id") =!= col("nbr_id"))
      .dropDuplicates("query_id", "nbr_id")
    val scored = candidates
      .withColumn("cos", cosinePre(col("q_vec"), col("nbr_vec"), col("q_norm"), col("nbr_norm")))
    Relational
      .topKPerGroup(scored, Seq("query_id"), Seq(col("cos").desc, col("nbr_id").asc), k)
      .select("query_id", "nbr_id", "cos")
  }

  // --- Index appends: the embedding corpus grows too -----------------
  //
  // Same motivation as `Dedup.appendToMinhashIndex`: an increment must
  // not re-pay the full index build. Both appends assign ONLY the batch
  // under the index's own recorded model (the centroid sidecar / the
  // plane family reconstructed from `_config`), so an appended index is
  // bit-identical to one rebuilt from scratch with the same model — the
  // append can never drift the assignment scheme, and the specs pin
  // indexed-after-append ≡ unindexed-over-the-union.

  /** Dynamic-partition append of `batch` into a [[writeIvfIndex]]
    * artifact: cells assigned under the INDEX's centroid sidecar (never
    * refit — a refit would strand existing rows in stale cells).
    * Centroid drift under heavy growth is real but a rebuild decision,
    * not an append decision; the model is in the sidecar, so a periodic
    * refit-and-rewrite is a plain [[writeIvfIndex]] call.
    */
  def appendToIvfIndex(
      spark: SparkSession,
      path: String,
      batch: DataFrame,
      idCol: String,
      vecCol: String
  ): Unit = {
    // writer invariant: resolve any interrupted compaction leaf swap
    // before writing — an append recreating a mid-swap cell dir would
    // make the next recovery GC the complete hidden tmp still holding
    // that cell's pre-crash rows ([[graft.io.Compaction.recoverLeaf]])
    graft.io.Compaction.recoverPartitioned(spark, path)
    appendToIvfIndexPre(assignedBatch(spark, path, batch, idCol, vecCol), path)
  }

  /** [[appendToIvfIndex]] for a batch ALREADY in index geometry
    * ([[assignedBatch]] columns) — the ingest gate appends the rows it
    * assigned for the probe instead of re-running the assignment.
    * Contract: the CALLER owns crash recovery
    * ([[graft.streaming.SemDedupIngest.start]] recovers before its
    * first batch and each maintenance walk recovers again).
    */
  def appendToIvfIndexPre(assigned: DataFrame, path: String): Unit =
    assigned
      .select(col("id"), col("v"), col("cell"))
      .write
      .mode("append")
      .partitionBy("cell")
      .parquet(path)

  /** Semantic near-dup pairs a batch introduces against a
    * [[writeIvfIndex]] corpus — the SemDeDup rule applied
    * INCREMENTALLY (the embedding-space analog of
    * [[graft.dedup.Dedup.incrementalLshPairs]]): every
    * (id_a < id_b, cos ≥ threshold) pair with at least one side in
    * `batch`, both sides in the SAME cell under the index's frozen
    * sidecar model — batch×corpus pairs plus batch-internal pairs.
    * Equals [[semDedupPairs]] over corpus ∪ batch (same pinned model)
    * restricted to pairs touching the batch, because cell assignment
    * is per-vector and the within-cell restriction is pairwise
    * (SemDedupIngestSpec pins the equivalence).
    *
    * Scale shape: the batch's assigned vectors BROADCAST into a
    * cell-partition-pruned index scan — only the batch's touched cell
    * DIRECTORIES are listed/read (`isin` literal over a bounded
    * collect of ≤ |batch| cell ids, the [[ivfTopKIndexed]] move) and
    * the corpus side never shuffles. Caller contract: ids unique
    * across corpus ∪ batch.
    */
  def incrementalSemPairs(
      spark: SparkSession,
      path: String,
      batch: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double
  ): DataFrame = {
    val b = assignedBatch(spark, path, batch, idCol, vecCol)
    // bounded model-state collect: the batch's touched cells (≤ batch
    // rows, ≤ nCentroids) render as an isin literal so Catalyst prunes
    // untouched cell directories at planning time
    val touched = b.select("cell").distinct().collect().map(_.getInt(0)).sorted
    incrementalSemPairsPre(spark, path, b, touched, threshold)
  }

  /** [[incrementalSemPairs]] over an already-assigned batch
    * ([[assignedBatch]] geometry) and a pre-collected touched-cell set —
    * the gate-sharing form ([[graft.streaming.SemDedupIngest]] computes
    * the assignment ONCE and reuses it for guard, probe, and append
    * instead of re-assigning per stage). `touched` may be a superset of
    * `b`'s live cells (e.g. collected before a guard filtered `b`):
    * extra cells only widen the pruned corpus read; the cell equi-join
    * drops their rows.
    */
  def incrementalSemPairsPre(
      spark: SparkSession,
      path: String,
      b: DataFrame,
      touched: Seq[Int],
      threshold: Double
  ): DataFrame = {
    val corpus = spark.read
      .parquet(path)
      .filter(col("cell").isin(touched.toSeq: _*))
      .select(col("cell"), col("id").as("id_x"), col("v").as("v_x"))
      .withColumn("n_x", norm(col("v_x")))
    val bSlim = b.select(col("cell"), col("id").as("id_y"), col("v").as("v_y"), col("nrm").as("n_y"))
    val cross = corpus
      .join(broadcast(bSlim), Seq("cell"))
      .withColumn("cos", cosinePre(col("v_x"), col("v_y"), col("n_x"), col("n_y")))
      .filter(col("cos") >= threshold)
      .select(least(col("id_x"), col("id_y")).as("id_a"), greatest(col("id_x"), col("id_y")).as("id_b"), col("cell"), col("cos"))
    val intra = b
      .select(col("cell"), col("id").as("id_a"), col("v").as("v_a"), col("nrm").as("n_a"))
      .join(bSlim.withColumnRenamed("id_y", "id_b").withColumnRenamed("v_y", "v_b").withColumnRenamed("n_y", "n_b"), Seq("cell"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", cosinePre(col("v_a"), col("v_b"), col("n_a"), col("n_b")))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cell", "cos")
    cross.unionByName(intra)
  }

  /** IVF-PQ index — the composition that IS large-scale ANN serving
    * (the IVFADC layout of Jégou et al. 2011, FAISS's workhorse), as a
    * lake artifact: the cell-partitioned corpus of [[writeIvfIndex]]
    * with PQ codes stored ALONGSIDE the full vectors, plus two frozen
    * sidecars (`_centroids` coarse model, `_codebook` raw PQ model). A
    * probe then stacks all three prunings:
    * planning-time PARTITION pruning (only nProbe cells' directories),
    * COLUMN pruning for the ADC stage (codes read, full vectors not),
    * and ROW pruning for the re-rank (only the ADC shortlist's vectors
    * are ever scored exactly). At 100 TB: read nProbe/nCentroids of
    * the directories × ~8 B/row for stage one, then shortlist×queries
    * full vectors — nothing else.
    */
  def writeIvfPqIndex(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      path: String,
      nCentroids: Int = 16,
      m: Int = 8,
      ks: Int = 16,
      centroidModel: Option[Array[Array[Double]]] = None,
      pqModel: Option[Array[Array[Array[Double]]]] = None
  ): Unit = {
    val centroids = resolveCentroids(corpus, idCol, vecCol, nCentroids, centroidModel)
    val pq = pqModel.getOrElse(pqSubCentroids(corpus, idCol, vecCol, m, ks))
    val aug = pqAugmented(pq)
    val sub = pq.head.head.length
    implicit val spark: SparkSession = corpus.sparkSession
    import spark.implicits._
    val codes = (0 until pq.length).map { s =>
      graft.expressions.NearestCell.column(
        concat(slice(col("v"), s * sub + 1, sub), array(lit(1.0))),
        aug(s)
      )
    }
    corpus
      .select(col(idCol).as("id"), toDoubleArr(col(vecCol)).as("v"))
      .withColumn("code", array(codes: _*))
      .withColumn("cell", nearestCellCol(col("v"), centroids))
      .write
      .mode("overwrite")
      .partitionBy("cell")
      .parquet(path)
    centroids.toSeq
      .map { case (c, cv) => (c, cv.toSeq) }
      .toDF("cell", "cvec")
      .coalesce(1)
      .write
      .mode("overwrite")
      .parquet(s"$path/_centroids")
    // RAW sub-centroids in the sidecar; augmentation is recomputed on
    // read (pure deterministic double arithmetic → identical bias)
    (for { s <- pq.indices; c <- pq(s).indices } yield (s, c, pq(s)(c).toSeq))
      .toDF("s", "c", "cvec")
      .coalesce(1)
      .write
      .mode("overwrite")
      .parquet(s"$path/_codebook")
  }

  /** The PQ codebook read back from the `_codebook` sidecar — bounded
    * model state (m × ks × d/m doubles).
    */
  def readPqCodebook(spark: SparkSession, path: String): Array[Array[Array[Double]]] = {
    val rows = spark.read
      .parquet(s"$path/_codebook")
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray))
    val m = rows.map(_._1).max + 1
    val ks = rows.map(_._2).max + 1
    val out = Array.ofDim[Array[Double]](m, ks)
    rows.foreach { case (s, c, v) => out(s)(c) = v }
    require(out.forall(_.forall(_ != null)), "codebook sidecar has holes")
    out
  }

  /** Two-stage probe of a [[writeIvfPqIndex]] artifact: partition-pruned
    * cells → ADC over codes only → exact cosine re-rank of the
    * shortlist. At nProbe = nCentroids and shortlist ≥ corpus size this
    * degenerates to exactly [[pqTopKReranked]] under the same model —
    * the spec's equality pin.
    */
  def ivfPqTopKIndexed(
      spark: SparkSession,
      path: String,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nProbe: Int = 4,
      shortlist: Int = 50
  ): DataFrame = {
    require(shortlist >= k, s"shortlist $shortlist must cover k=$k")
    val centroids = readIvfCentroids(spark, path)
    val pq = readPqCodebook(spark, path)
    val probes = queries
      .select(col(idCol).as("query_id"), toDoubleArr(col(vecCol)).as("q_vec"))
      .withColumn(
        "cell",
        explode(
          slice(
            transform(reverse(array_sort(cellScoresCol(col("q_vec"), centroids))), s => s.getField("cell")),
            1,
            nProbe
          )
        )
      )
    val probedCells = probes.select("cell").distinct().collect().map(_.getInt(0)).sorted
    def pruned = spark.read.parquet(path).filter(col("cell").isin(probedCells.toSeq: _*))
    // stage 1 (ADC): codes only — column pruning keeps `v` unread
    val scored = pruned
      .select(col("id").as("nbr_id"), col("code"), col("cell"))
      .join(broadcast(probes), Seq("cell"))
      .filter(col("query_id") =!= col("nbr_id"))
      .withColumn("adist", pqAdistCol(col("q_vec"), col("code"), pq))
    val cand = Relational
      .topKPerGroup(scored, Seq("query_id"), Seq(col("adist").asc, col("nbr_id").asc), shortlist)
      .select("query_id", "nbr_id")
    // stage 2 (re-rank): only the shortlist's full vectors are scored
    val vecs = pruned
      .select(col("id").as("nbr_id"), col("v").as("nbr_vec"))
      .withColumn("nbr_norm", norm(col("nbr_vec")))
    val qv = queries
      .select(col(idCol).as("query_id"), toDoubleArr(col(vecCol)).as("q_vec"))
      .withColumn("q_norm", norm(col("q_vec")))
    val exact = cand
      .join(vecs, Seq("nbr_id"))
      .join(broadcast(qv), Seq("query_id"))
      .withColumn("cos", cosinePre(col("q_vec"), col("nbr_vec"), col("q_norm"), col("nbr_norm")))
    Relational
      .topKPerGroup(exact, Seq("query_id"), Seq(col("cos").desc, col("nbr_id").asc), k)
      .select("query_id", "nbr_id", "cos")
  }

  /** Dynamic-partition append of `batch` into a [[writeLshIndex]]
    * artifact: buckets assigned under the plane family reconstructed
    * from the `_config` sidecar (bits, tables, seed, dim are the whole
    * model — the append is deterministic and config-drift-proof).
    */
  def appendToLshIndex(
      spark: SparkSession,
      path: String,
      batch: DataFrame,
      idCol: String,
      vecCol: String
  ): Unit = {
    // writer invariant: resolve interrupted leaf swaps before writing
    // (see appendToIvfIndex's note)
    graft.io.Compaction.recoverPartitioned(spark, path)
    val cfg = spark.read.parquet(s"$path/_config").collect().head
    val (bits, tables, seed, dim) = (cfg.getInt(0), cfg.getInt(1), cfg.getLong(2), cfg.getInt(3))
    val v = batch
      .select(col(idCol).as("id"), toDoubleArr(col(vecCol)).as("v"))
      .withColumn("nrm", norm(col("v")))
    bucketAssignments(batch, idCol, vecCol, bits, tables, seed, dim)
      .join(v, Seq("id"))
      .write
      .mode("append")
      .partitionBy("tbl", "bucket")
      .parquet(path)
  }
}
