package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic text embedding.
  *
  * The reference generates embeddings by calling an external Ollama
  * server (embedding.go:24-104) — unavailable offline, so this is the
  * documented stub: a hashed bag-of-words ("feature hashing")
  * embedder. It is deterministic, engine-independent (md5-based), and
  * exercises the same downstream plumbing (vector columns, kNN,
  * near-dup search) as a real model would.
  *
  * Scale posture: one explode + one groupBy per corpus — linear work,
  * single shuffle keyed by (id, bucket), no driver involvement.
  */
object Embed {

  /** Sparse representation: (idCol, bucket, weight) with L2-normalized
    * weights per document. */
  def embedSparse(df: DataFrame, textCol: String, idCol: String, dim: Int): DataFrame = {
    val bucketed = df
      .select(col(idCol), explode(Dedup.words(col(textCol))).as("t"))
      .groupBy(col(idCol), (Dedup.hash64(col("t")) % dim).as("bucket"))
      .agg(count(lit(1)).as("c"))
    val norms = bucketed.groupBy(col(idCol))
      .agg(sqrt(sum(col("c") * col("c"))).as("nrm"))
    bucketed.join(norms, idCol)
      .select(col(idCol), col("bucket"), (col("c") / col("nrm")).as("weight"))
  }

  /** Dense representation: (idCol, embedding array<double>[dim]). */
  def embedDense(df: DataFrame, textCol: String, idCol: String, dim: Int): DataFrame =
    embedSparse(df, textCol, idCol, dim)
      .groupBy(col(idCol))
      .agg(collect_list(struct(col("bucket"), col("weight"))).as("bw"))
      .select(col(idCol),
        transform(sequence(lit(0), lit(dim - 1)), i =>
          coalesce(
            element_at(map_from_entries(col("bw")), i.cast("long")),
            lit(0.0))).as("embedding"))
}
