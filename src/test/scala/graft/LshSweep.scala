package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.{AnnLsh, Knn}

/** Parameter sweep for the LSH forest: mean recall@10 and probed mass
  * on the sf0.01 worst-case (uniform) embeddings over the same 5
  * queries AnnSpec pins. Run: sbt "Test/runMain graft.LshSweep" */
object LshSweep {
  def main(args: Array[String]): Unit = {
    val spark = SparkSpec.session
    val e = Tables.embeddings(spark, "/root/testdata/sf0.01").cache()
    e.count()
    val k = 10
    val qids = 1L to 5L
    val exact = qids.map { qid =>
      val qv = e.filter(col("vec_id") === qid).select(col("embedding").as("qvec"))
      qid -> Knn.knn(e, "embedding", qv, k, Knn.Cosine, "vec_id")
        .select("vec_id").collect().map(_.getLong(0)).toSet
    }.toMap
    for ((bits, nt) <- Seq((9, 120), (9, 150), (9, 180), (10, 200), (10, 260), (10, 320))) {
      val stats = qids.map { qid =>
        val qv = e.filter(col("vec_id") === qid).select(col("embedding").as("qvec"))
        val approx = AnnLsh.knnForest(e, "embedding", qv, k, nt, bits, 64, Knn.Cosine, "vec_id")
          .select("vec_id").collect().map(_.getLong(0)).toSet
        val rec = approx.intersect(exact(qid)).size.toDouble / k
        val mass = AnnLsh.percentSearchedForest(e, "embedding", qv, nt, bits, 64)
        (rec, mass)
      }
      val mr = stats.map(_._1).sum / stats.size
      val mm = stats.map(_._2).sum / stats.size
      println(f"bits=$bits%2d tables=$nt%3d  recall@10=$mr%.3f  pctSearched=$mm%.1f")
    }
    spark.stop()
  }
}
