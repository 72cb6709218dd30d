package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f)),  // near 0
    (2L, Array(0.0f, 1.0f, 0.0f)),  // orthogonal to 0
    (3L, Array(-1.0f, 0.0f, 0.0f)), // opposite of 0
  ).toDF("vec_id", "embedding")

  test("brute-force knn ranks by cosine with deterministic tie-break") {
    val out = Similarity.bruteForceKnn(
        vecs, vecs.filter($"vec_id" === 0), "vec_id", "embedding", k = 3)
      .select("nbr_id", "rank", "cos_sim").as[(Long, Int, Double)].collect()
      .sortBy(_._2)
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L))
    assert(out.head._3 > 0.99)
    assert(out.last._3 == -1.0)
  }

  test("sign-bucket LSH probes only the matching bucket") {
    val out = Similarity.lshKnn(
        vecs, vecs.filter($"vec_id" === 0), "vec_id", "embedding", k = 3, bits = 3)
      .select("nbr_id").as[Long].collect().toSet
    // vec 0 bucket: signs(1,0,0 >= 0) = 111b = 7; vec 1 same; vec 2 (0,1,0) same
    // (zeros count as non-negative); vec 3 (-1,0,0) differs -> excluded
    assert(out.contains(1L))
    assert(!out.contains(3L))
  }

  test("embedding near-dups finds only the close pair") {
    val out = Similarity.embeddingNearDups(vecs, "vec_id", "embedding",
        blockCols = Seq.empty, minCos = 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(out == Set((0L, 1L)))
  }
}
