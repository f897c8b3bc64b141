package graft.scratch

import graft.Sessions
import graft.io.Tables
import graft.similarity.Similarity

/** Scratch diagnostic: PQ ADC recall vs codebook size on sf0.001. */
object PqRecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(32)
    import spark.implicits._
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val queries = emb.filter($"vec_id" < 10)
    val brute = Similarity
      .bruteForceTopK(emb, "vec_id", "embedding", queries, 5)
      .select("query_id", "nbr_id").as[(Long, Long)].collect().toSet
    val model = Similarity.pqSubCentroids(emb, "vec_id", "embedding")
    for (short <- Seq(25, 50, 100)) {
      val rr = Similarity
        .pqTopKReranked(emb, "vec_id", "embedding", queries, 5, model, shortlist = short)
        .select("query_id", "nbr_id").as[(Long, Long)].collect().toSet
      println(f"PROBE shortlist=$short recall=${(brute & rr).size.toDouble / brute.size}%.2f")
    }
    spark.stop()
  }
}
