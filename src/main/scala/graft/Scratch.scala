package graft

import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.ops._

// scratch experiment runner — not part of the library, deleted before commit
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val t = Tables(spark, dir)
    val v = t.embeddings.select(col("vec_id").as("id"), col("embedding").as("vec"))

    // ---- embed near-dup LSH recall vs brute at threshold 0.40 ----
    val truth = Similarity.cosineNearDupPairs(v, 0.40)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    println(s"embed truth pairs: ${truth.size}")
    for ((np, nt) <- Seq((8, 4), (4, 8), (4, 12), (3, 8), (3, 12), (4, 16))) {
      val got = Similarity.cosineNearDupPairsLSH(v, 0.40, dim = 64, nPlanes = np, nTables = nt)
        .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val rec = if (truth.isEmpty) 1.0 else (got & truth).size.toDouble / truth.size
      println(f"embed_lsh planes=$np tables=$nt -> ${got.size} pairs, recall=$rec%.3f")
    }

    // ---- knn LSH recall@5 vs brute ----
    val probes = v.filter(col("id") < 10)
    val brute = Similarity.bruteForceTopK(v, probes, k = 5)
      .select("query_id", "nbr_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    println(s"knn brute pairs: ${brute.size}")
    for ((np, nt) <- Seq((8, 8), (8, 16), (6, 8), (6, 16), (4, 8), (4, 16), (3, 12))) {
      val lsh = Similarity.lshTopK(v, probes, dim = 64, nPlanes = np, k = 5, nTables = nt)
        .select("query_id", "nbr_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      println(f"knn_lsh planes=$np tables=$nt -> ${lsh.size} rows, recall=${(lsh & brute).size.toDouble / brute.size}%.3f")
    }

    // ---- minhash vs ngram at equal threshold ----
    val ng = Dedup.ngramJaccardPairs(t.documents, col("doc_id"), col("text"), 3, 0.6)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val mh = Dedup.minhashDedup(t.documents, col("doc_id"), col("text"), 3, 64, 16, 0.6)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    println(s"ngram=${ng.size} minhash=${mh.size} subset=${mh.subsetOf(ng)} " +
      f"recall=${if (ng.isEmpty) 1.0 else (mh & ng).size.toDouble / ng.size}%.3f")

    // ---- simhash banding vs brute hamming<=3 ----
    val sh = Dedup.simhashDocs(t.documents, col("doc_id"), col("text"))
    val bandedPairs = Dedup.simhashPairs(t.documents, col("doc_id"), col("text"), 3)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brutePairs = sh.as("l").join(sh.as("r"), col("l.doc_id") < col("r.doc_id"))
      .filter(bit_count(col("l.sh").bitwiseXOR(col("r.sh"))) <= 3)
      .select(col("l.doc_id"), col("r.doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    println(s"simhash banded=${bandedPairs.size} brute=${brutePairs.size} equal=${bandedPairs == brutePairs}")

    spark.stop()
  }
}
