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
    // (bits, tables, probes): probes > 1 = query-directed multiprobe
    val combos =
      if (args.nonEmpty) args.toSeq.map { a =>
        val Array(b, t, p) = a.split(",").map(_.trim.toInt); (b, t, p) }
      else Seq((8, 100, 1), (9, 60, 2), (10, 60, 2), (10, 80, 2),
        (11, 80, 2), (11, 100, 2), (10, 40, 3), (11, 60, 3), (12, 80, 3))
    for ((bits, nt, probes) <- combos) {
      val stats = qids.map { qid =>
        val qv = e.filter(col("vec_id") === qid).select(col("embedding").as("qvec"))
        val approx = AnnLsh.knnForest(e, "embedding", qv, k, nt, bits, 64,
            Knn.Cosine, "vec_id", probes)
          .select("vec_id").collect().map(_.getLong(0)).toSet
        val rec = approx.intersect(exact(qid)).size.toDouble / k
        val mass = AnnLsh.percentSearchedForest(e, "embedding", qv, nt, bits, 64, probes)
        (rec, mass)
      }
      val mr = stats.map(_._1).sum / stats.size
      val mm = stats.map(_._2).sum / stats.size
      println(f"bits=$bits%2d tables=$nt%3d probes=$probes%d  recall@10=$mr%.3f  pctSearched=$mm%.1f")
    }
    spark.stop()
  }
}
