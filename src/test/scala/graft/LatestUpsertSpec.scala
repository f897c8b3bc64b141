package graft

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.io.{LatestUpsert, Tables}

/** The incremental latest-value sink (SURVEY S5 at lake scale): merge
  * semantics, replay/order idempotence, and the two pruning claims —
  * the existing-table READ plans only touched bucket directories, and
  * the REWRITE leaves untouched bucket directories physically alone.
  */
class LatestUpsertSpec extends SparkSpec {
  import spark.implicits._

  private def events: DataFrame =
    Tables
      .events(spark, sf0001)
      .select("user_id", "event_id", "ts_us", "event_type", "value")

  private def oneShotLatest(ev: DataFrame): Set[Row5] =
    graft.ops.Relational
      .latestPerKey(ev, Seq("user_id"), "ts_us", "event_id")
      .select("user_id", "event_id", "ts_us", "event_type", "value")
      .as[Row5]
      .collect()
      .toSet

  private type Row5 = (Long, Long, Long, String, Double)

  private def readSet(root: String): Set[Row5] =
    LatestUpsert
      .read(spark, root)
      .select("user_id", "event_id", "ts_us", "event_type", "value")
      .as[Row5]
      .collect()
      .toSet

  private def freshRoot(): String =
    Files.createTempDirectory("latestupsert").toString + "/t"

  test("empty seed is rejected loudly (a zero-row partitioned write has no readable footers)") {
    val err = intercept[IllegalArgumentException] {
      LatestUpsert.init(
        spark, freshRoot(), events.limit(0),
        keyCols = Seq("user_id"), orderCols = Seq("ts_us", "event_id"))
    }
    assert(err.getMessage.contains("bootstrap with the first batch"))
  }

  test("seed + two merges ≡ one-shot latest-per-key over all events") {
    val ev = events
    val root = freshRoot()
    LatestUpsert.init(
      spark, root, ev.filter($"event_id" % 3 === 0),
      keyCols = Seq("user_id"), orderCols = Seq("ts_us", "event_id"), buckets = 16)
    LatestUpsert.upsert(spark, root, ev.filter($"event_id" % 3 === 1))
    LatestUpsert.upsert(spark, root, ev.filter($"event_id" % 3 === 2))
    assert(readSet(root) == oneShotLatest(ev))
  }

  test("merge is replay-idempotent and batch-order-invariant") {
    val ev = events
    val (r1, r2) = (freshRoot(), freshRoot())
    for (r <- Seq(r1, r2))
      LatestUpsert.init(
        spark, r, ev.filter($"event_id" % 3 === 0),
        keyCols = Seq("user_id"), orderCols = Seq("ts_us", "event_id"), buckets = 16)
    val (b1, b2) = (ev.filter($"event_id" % 3 === 1), ev.filter($"event_id" % 3 === 2))
    // r1: 1 then 2, then REPLAY 2; r2: 2 then 1
    LatestUpsert.upsert(spark, r1, b1)
    LatestUpsert.upsert(spark, r1, b2)
    val afterBoth = readSet(r1)
    LatestUpsert.upsert(spark, r1, b2) // replay: max is idempotent
    assert(readSet(r1) == afterBoth)
    LatestUpsert.upsert(spark, r2, b2)
    LatestUpsert.upsert(spark, r2, b1)
    assert(readSet(r2) == afterBoth)
  }

  test("merge READ prunes to touched buckets; REWRITE leaves other dirs untouched") {
    val ev = events
    val root = freshRoot()
    LatestUpsert.init(
      spark, root, ev,
      keyCols = Seq("user_id"), orderCols = Seq("ts_us", "event_id"), buckets = 16)
    val allBuckets = fileScans(spark.read.parquet(s"$root/latest"))
      .head.selectedPartitions.partitionCount
    assert(allBuckets > 4, s"seed fills only $allBuckets buckets — pruning unprovable")

    // a one-user batch touches exactly one bucket
    val oneUser = ev.orderBy("user_id").limit(1).select("user_id").as[Long].head()
    val batch = ev.filter($"user_id" === oneUser)
    val Some((merged, touched)) = LatestUpsert.mergedForBatch(spark, root, batch)
    assert(touched.size == 1)
    val scans = fileScans(merged).filter(_.metadata.getOrElse("Location", "").contains("latestupsert"))
    assert(scans.nonEmpty, "no scan over the latest table found")
    scans.foreach { s =>
      assert(
        s.metadata.getOrElse("PartitionFilters", "").contains("kb"),
        s"no kb partition filter: ${s.metadata.getOrElse("PartitionFilters", "")}")
      assert(
        s.selectedPartitions.partitionCount <= 1,
        s"merge read ${s.selectedPartitions.partitionCount} buckets for a 1-bucket batch")
    }

    // physical stability: files OUTSIDE the touched bucket dir are the
    // same paths with the same sizes after the rewrite
    def snapshot(): Map[String, Long] = {
      val base = Paths.get(s"$root/latest")
      val walk = Files.walk(base)
      try walk
        .filter(p => p.toString.endsWith(".parquet"))
        .toArray
        .map { case p: Path => p.toString -> Files.size(p) }
        .toMap
      finally walk.close()
    }
    val touchedDir = s"kb=${touched.head}"
    val before = snapshot().filterNot(_._1.contains(touchedDir))
    LatestUpsert.upsert(spark, root, batch)
    val after = snapshot().filterNot(_._1.contains(touchedDir))
    assert(after == before, "bucket swap rewrote untouched bucket directories")
    // and the table still answers correctly
    assert(readSet(root) == oneShotLatest(ev))
  }

  test("property: ANY seeded random partition into batches, in ANY order, converges to one-shot latest") {
    val ev = events.localCheckpoint()
    val expected = oneShotLatest(ev)
    for (seed <- Seq(1, 2, 3)) {
      val rnd = new scala.util.Random(seed)
      val k = 2 + rnd.nextInt(4) // 2..5 batches (+ seed slice)
      // seeded random batch assignment per event id, as a column rule so
      // the split is reproducible inside Spark
      val assign = pmod(xxhash64($"event_id" + lit(seed.toLong)), lit((k + 1).toLong)).cast("int")
      val tagged = ev.withColumn("b", assign)
      val root = freshRoot()
      LatestUpsert.init(
        spark, root, tagged.filter($"b" === 0).drop("b"),
        keyCols = Seq("user_id"), orderCols = Seq("ts_us", "event_id"), buckets = 16)
      val order = rnd.shuffle((1 to k).toList)
      order.foreach(b => LatestUpsert.upsert(spark, root, tagged.filter($"b" === b).drop("b")))
      assert(readSet(root) == expected, s"seed=$seed k=$k order=$order diverged from one-shot latest")
    }
  }

  test("batch with drifted key/order column type fails loudly (bucket-assignment corruption guard)") {
    val ev = events
    val root = freshRoot()
    LatestUpsert.init(
      spark, root, ev.filter($"event_id" % 3 === 0),
      keyCols = Seq("user_id"), orderCols = Seq("ts_us", "event_id"), buckets = 16)
    // INT user_id hashes to a different xxhash64 than the seed's BIGINT
    // for the same key value — must be rejected, not merged
    val drifted = ev.withColumn("user_id", $"user_id".cast("int"))
    val err = intercept[IllegalArgumentException] {
      LatestUpsert.upsert(spark, root, drifted)
    }
    assert(err.getMessage.contains("type drift"), err.getMessage)
    // missing pinned column is equally loud
    val missing = intercept[IllegalArgumentException] {
      LatestUpsert.upsert(spark, root, ev.drop("ts_us"))
    }
    assert(missing.getMessage.contains("missing pinned column"), missing.getMessage)
    // the artifact is untouched by the rejected batches
    assert(readSet(root) == oneShotLatest(ev.filter($"event_id" % 3 === 0)))
  }

  test("crash BEFORE the commit marker: half-written stage is discarded, next upsert is clean") {
    val ev = events
    val root = freshRoot()
    LatestUpsert.init(
      spark, root, ev.filter($"event_id" % 3 === 0),
      keyCols = Seq("user_id"), orderCols = Seq("ts_us", "event_id"), buckets = 16)
    // simulate a crash mid-stage-write: stage remnants, NO marker
    ev.limit(7).withColumn("kb", lit(3))
      .write.mode("overwrite").partitionBy("kb").parquet(s"$root/_stage")
    // marker absent → read serves the intact table
    assert(readSet(root) == oneShotLatest(ev.filter($"event_id" % 3 === 0)))
    // next upsert discards the garbage stage and commits normally
    LatestUpsert.upsert(spark, root, ev.filter($"event_id" % 3 === 1))
    LatestUpsert.upsert(spark, root, ev.filter($"event_id" % 3 === 2))
    assert(readSet(root) == oneShotLatest(ev))
    assert(!Files.exists(Paths.get(s"$root/_stage")), "garbage stage not cleaned")
  }

  test("crash MID-SWAP (marker present, bucket moved aside): read fails loudly, recover rolls forward") {
    val ev = events
    val root = freshRoot()
    LatestUpsert.init(
      spark, root, ev.filter($"event_id" % 3 === 0),
      keyCols = Seq("user_id"), orderCols = Seq("ts_us", "event_id"), buckets = 16)
    val batch = ev.filter($"event_id" % 3 === 1)
    // reconstruct the exact pre-crash state upsert produces: complete
    // stage + published marker, then the worst mid-state — one touched
    // bucket renamed aside (its current dir GONE) with the staged dir
    // not yet swapped in
    val Some((merged, touched)) = LatestUpsert.mergedForBatch(spark, root, batch)
    val m = merged.localCheckpoint()
    m.write.mode("overwrite").partitionBy("kb").parquet(s"$root/_stage")
    m.unpersist(blocking = false)
    Files.writeString(Paths.get(s"$root/_commit"), touched.mkString(","))
    val b0 = touched.head
    val cur = Paths.get(s"$root/latest/kb=$b0")
    assert(Files.exists(cur), "test premise: the touched bucket must exist in the seed")
    Files.createDirectories(Paths.get(s"$root/_oldgen"))
    Files.move(cur, Paths.get(s"$root/_oldgen/kb=$b0"))
    // an unfinished commit must NOT be silently readable
    val err = intercept[IllegalArgumentException](LatestUpsert.read(spark, root))
    assert(err.getMessage.contains("unfinished commit"), err.getMessage)
    // roll forward: every key that lived in the moved-aside bucket is
    // preserved, and the end state is exactly seed+batch
    LatestUpsert.recover(spark, root)
    assert(readSet(root) == oneShotLatest(ev.filter($"event_id" % 3 <= 1)))
    for (d <- Seq("_stage", "_oldgen", "_commit"))
      assert(!Files.exists(Paths.get(s"$root/$d")), s"$d not cleaned after recovery")
    // and the interrupted batch can be replayed on top — idempotent
    LatestUpsert.upsert(spark, root, batch)
    assert(readSet(root) == oneShotLatest(ev.filter($"event_id" % 3 <= 1)))
  }

  test("exhaustive crash-point sweep: interruption after ANY k of n bucket swaps recovers to seed+batch") {
    val ev = events
    val batch = ev.filter($"event_id" % 3 === 1)
    val expected = oneShotLatest(ev.filter($"event_id" % 3 <= 1))
    // stage the commit once on a template root to learn the touched set
    val template = freshRoot()
    LatestUpsert.init(
      spark, template, ev.filter($"event_id" % 3 === 0),
      keyCols = Seq("user_id"), orderCols = Seq("ts_us", "event_id"), buckets = 8)
    val Some((_, touchedAll)) = LatestUpsert.mergedForBatch(spark, template, batch)
    val n = touchedAll.size
    assert(n >= 3, s"test premise: want >= 3 touched buckets, got $n")
    for (k <- 0 to n) { // crash after k completed swaps (k = n: crash before cleanup)
      val root = freshRoot()
      LatestUpsert.init(
        spark, root, ev.filter($"event_id" % 3 === 0),
        keyCols = Seq("user_id"), orderCols = Seq("ts_us", "event_id"), buckets = 8)
      val Some((merged, touched)) = LatestUpsert.mergedForBatch(spark, root, batch)
      val m = merged.localCheckpoint()
      m.write.mode("overwrite").partitionBy("kb").parquet(s"$root/_stage")
      Checkpoints.release(m)
      Files.writeString(Paths.get(s"$root/_commit"), touched.mkString(","))
      // perform the first k swaps exactly as commitBuckets would
      Files.createDirectories(Paths.get(s"$root/_oldgen"))
      touched.take(k).foreach { b =>
        val cur = Paths.get(s"$root/latest/kb=$b")
        if (Files.exists(cur)) Files.move(cur, Paths.get(s"$root/_oldgen/kb=$b"))
        Files.move(Paths.get(s"$root/_stage/kb=$b"), cur)
      }
      LatestUpsert.recover(spark, root)
      assert(readSet(root) == expected, s"crash after $k/$n swaps diverged")
      for (d <- Seq("_stage", "_oldgen", "_commit"))
        assert(!Files.exists(Paths.get(s"$root/$d")), s"$d left behind at k=$k")
    }
  }

  test("streaming foreachBatch maintenance ≡ sequential upserts") {
    val ev = events
    val root = freshRoot()
    LatestUpsert.init(
      spark, root, ev.filter($"event_id" % 3 === 0),
      keyCols = Seq("user_id"), orderCols = Seq("ts_us", "event_id"), buckets = 16)
    val src = Files.createTempDirectory("latestsrc").toString
    val chk = Files.createTempDirectory("latestchk").toString
    ev.filter($"event_id" % 3 === 1).write.mode("append").parquet(src)
    val stream = spark.readStream.schema(ev.schema).parquet(src)
    val q = LatestUpsert.start(stream, root, chk)
    q.processAllAvailable()
    ev.filter($"event_id" % 3 === 2).write.mode("append").parquet(src)
    q.processAllAvailable()
    q.stop()
    assert(readSet(root) == oneShotLatest(ev))
  }
}
