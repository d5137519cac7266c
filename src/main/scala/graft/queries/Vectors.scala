package graft.queries

import graft.Tables
import graft.ops.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over `embeddings` (SURVEY.md §2e). */
object Vectors {

  /** Exact cosine top-10 for 8 query vectors — the correctness baseline
    * (oracled against DuckDB double arithmetic; cosine rounded to 6 dp
    * to absorb summation-order ulps).
    */
  def annBruteForce(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = Tables.embeddings(s, dir)
    Similarity.bruteForceTopK(
      emb.filter($"vec_id" < 8), emb, "embedding", "vec_id", k = 10)
      .select($"query_id", $"rank", $"neighbor_id", round($"cosine", 6).as("cosine"))
      .orderBy($"query_id", $"rank")
  }

  /** IVF approximate top-10: data-adaptive coarse quantizer (seeded
    * k-means-lite) with nprobe cells per query — the inverted-file
    * scale path; recall vs brute force asserted in specs.
    */
  def annIvf(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = Tables.embeddings(s, dir)
    val centroids = Similarity.trainIvfCentroids(emb, "embedding", k = 16, iters = 2)
    Similarity.ivfTopK(
      emb.filter($"vec_id" < 8), emb, "embedding", "vec_id", k = 10,
      centroids, nprobe = 4)
      .select($"query_id", $"rank", $"neighbor_id", round($"cosine", 6).as("cosine"))
      .orderBy($"query_id", $"rank")
  }

  /** LSH-bucketed approximate top-10 — the 100 TB path; recall vs the
    * brute force baseline is asserted in specs.
    */
  def annLsh(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = Tables.embeddings(s, dir)
    Similarity.lshTopK(
      emb.filter($"vec_id" < 8), emb, "embedding", "vec_id", k = 10,
      planes = 5, tables = 8)
      .select($"query_id", $"rank", $"neighbor_id", round($"cosine", 6).as("cosine"))
      .orderBy($"query_id", $"rank")
  }
}
