package graft.scratch

import org.apache.spark.sql.functions._
import graft.Sessions
import graft.similarity.Similarity

/** Scratch diagnostic (not a spec): cell-occupancy distribution of the
  * semDedup default path on the ScaleBench ×10 corpus.
  */
object CellOccupancyProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(32)
    import spark.implicits._
    for (dir <- Seq("/root/testdata/sf0.1", "/tmp/graft_scale10")) {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val n = emb.count()
      val k = Similarity.semDedupConfigFor(n)
      val model = Similarity.kmeansCentroids(emb, "vec_id", "embedding", k)
      val occ = Similarity
        .cellAssignments(emb, "vec_id", "embedding", k, Some(model))
        .groupBy("cell").count()
        .agg(
          count(lit(1)).as("nonempty_cells"),
          max("count").as("max_occ"),
          expr("percentile(count, 0.5)").as("p50"),
          expr("percentile(count, 0.9)").as("p90"),
          sum(col("count") * col("count")).as("sum_sq")
        )
        .head()
      println(s"PROBE dir=$dir n=$n k=$k nonempty=${occ.get(0)} max=${occ.get(1)} p50=${occ.get(2)} p90=${occ.get(3)} pairbound=${occ.getLong(4) / 2}")
      def t[A](label: String)(f: => A): A = {
        val t0 = System.nanoTime(); val r = f
        println(f"PROBE   $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
      }
      val model2 = t("fit")(Similarity.kmeansCentroids(emb, "vec_id", "embedding", k))
      t("assign-count")(Similarity.cellAssignments(emb, "vec_id", "embedding", k, Some(model2)).write.format("noop").mode("overwrite").save())
      t("pairs")(Similarity.semDedupPairs(emb, "vec_id", "embedding", 0.4, nClusters = k, centroidModel = Some(model2)).write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
