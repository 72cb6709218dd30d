package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.Similarity

/** Approximate-nearest-neighbor queries over the `embeddings` table:
  * brute-force cosine top-k as the exact baseline, sign-bucket LSH as the
  * scale path (see [[graft.ops.Similarity]] for the distribution design).
  * Query set = every vec_id % 100 == 0 (deterministic, scales with SF).
  */
object SimilarityOps {

  type Q = (SparkSession, String) => DataFrame

  private def corpus(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))

  private def querySet(s: SparkSession, d: String): DataFrame =
    corpus(s, d).filter(col("vec_id") % 100 === 0)

  /** Brute-force cosine top-10 per query (ranked on rounded cosine with
    * neighbor-id tie-break for cross-engine determinism).
    */
  def knnBrute: Q = (s, d) =>
    Similarity.bruteForceKnn(corpus(s, d), querySet(s, d),
        "vec_id", "embedding", k = 10)
      .orderBy(col("query_id"), col("rank"))

  val knnBruteSql: String = {
    val dotQC = Similarity.dotSql("q.v", "c.v", 64)
    val dotVV = Similarity.dotSql("v", "v", 64)
    s"""WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |n AS (SELECT vec_id, v, sqrt($dotVV) AS nrm FROM base),
      |scored AS (SELECT q.vec_id AS query_id, c.vec_id AS nbr_id,
      |    round($dotQC / (q.nrm * c.nrm), 6) AS cos_sim
      |  FROM n q JOIN n c ON q.vec_id % 100 = 0 AND c.vec_id <> q.vec_id),
      |r AS (SELECT *, row_number() OVER
      |    (PARTITION BY query_id ORDER BY cos_sim DESC, nbr_id ASC) AS rank
      |  FROM scored)
      |SELECT query_id, nbr_id, CAST(rank AS INTEGER) AS rank, cos_sim
      |FROM r WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin
  }

  /** LSH-bucketed approximate top-3: 4 sign-bits → 16 buckets, each query
    * probes only its own bucket (~1/16 of the corpus).
    */
  def knnLsh: Q = (s, d) =>
    Similarity.lshKnn(corpus(s, d), querySet(s, d),
        "vec_id", "embedding", k = 3, bits = 4)
      .orderBy(col("query_id"), col("rank"))

  val knnLshSql: String = {
    val dotQC = Similarity.dotSql("q.v", "c.v", 64)
    val dotVV = Similarity.dotSql("v", "v", 64)
    val bucket = Similarity.signBucketSql("v", 4)
    s"""WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |n AS (SELECT vec_id, v, sqrt($dotVV) AS nrm, $bucket AS bucket FROM base),
      |scored AS (SELECT q.vec_id AS query_id, c.vec_id AS nbr_id,
      |    round($dotQC / (q.nrm * c.nrm), 6) AS cos_sim
      |  FROM n q JOIN n c ON q.bucket = c.bucket AND q.vec_id % 100 = 0
      |    AND c.vec_id <> q.vec_id),
      |r AS (SELECT *, row_number() OVER
      |    (PARTITION BY query_id ORDER BY cos_sim DESC, nbr_id ASC) AS rank
      |  FROM scored)
      |SELECT query_id, nbr_id, CAST(rank AS INTEGER) AS rank, cos_sim
      |FROM r WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin
  }

  /** IVF-flat nprobe=1: centroids = vec_id % 100 == 7, queries probe only
    * their assigned cluster (see Similarity.ivfKnn).
    */
  def knnIvf: Q = (s, d) =>
    Similarity.ivfKnn(corpus(s, d), querySet(s, d),
        corpus(s, d).filter(col("vec_id") % 100 === 7),
        "vec_id", "embedding", k = 3)
      .orderBy(col("query_id"), col("rank"))

  val knnIvfSql: String = {
    val dotVC = Similarity.dotSql("x.v", "c.v", 64)
    val dotQN = Similarity.dotSql("q.v", "n.v", 64)
    val dotVV = Similarity.dotSql("v", "v", 64)
    s"""WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v,
      |    sqrt($dotVV) AS nrm FROM embeddings),
      |cents AS (SELECT vec_id AS cent_id, v, nrm FROM base WHERE vec_id % 100 = 7),
      |assigned AS (
      |  SELECT * FROM (
      |    SELECT x.vec_id, x.v, x.nrm, c.cent_id AS cluster_id,
      |      row_number() OVER (PARTITION BY x.vec_id
      |        ORDER BY round($dotVC / (x.nrm * c.nrm), 6) DESC, c.cent_id ASC) AS crank
      |    FROM base x CROSS JOIN (SELECT cent_id, v, nrm FROM cents) c)
      |  WHERE crank = 1),
      |scored AS (SELECT q.vec_id AS query_id, n.vec_id AS nbr_id,
      |    round($dotQN / (q.nrm * n.nrm), 6) AS cos_sim
      |  FROM assigned q JOIN assigned n ON q.cluster_id = n.cluster_id
      |    AND q.vec_id % 100 = 0 AND n.vec_id <> q.vec_id),
      |r AS (SELECT *, row_number() OVER
      |    (PARTITION BY query_id ORDER BY cos_sim DESC, nbr_id ASC) AS rank
      |  FROM scored)
      |SELECT query_id, nbr_id, CAST(rank AS INTEGER) AS rank, cos_sim
      |FROM r WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin
  }

  val queries: Map[String, Q] = Map(
    "q_knn_brute" -> knnBrute,
    "q_knn_lsh" -> knnLsh,
    "q_knn_ivf" -> knnIvf,
  )

  val oracles: Map[String, String] = Map(
    "q_knn_brute" -> knnBruteSql,
    "q_knn_lsh" -> knnLshSql,
    "q_knn_ivf" -> knnIvfSql,
  )
}
