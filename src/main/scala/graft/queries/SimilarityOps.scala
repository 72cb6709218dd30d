package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.Similarity

/** Approximate-nearest-neighbor queries over the `embeddings` table:
  * brute-force cosine top-k as the exact baseline, sign-bucket LSH as the
  * scale path (see [[graft.ops.Similarity]] for the distribution design).
  * Query set = every vec_id % 100 == 0 below [[SimilarityOps.ParamCap]].
  */
object SimilarityOps {

  type Q = (SparkSession, String) => DataFrame

  /** Id ceiling for every MODEL-PARAMETER row set — the query batch, the
    * IVF coarse centroids, and the PQ codebook sample. Without it these
    * `% k` filters grow linearly with the corpus, which silently turns the
    * ANN family quadratic (corpus × corpus/k) at scale; a codebook or
    * query batch is O(1) in corpus size by design. 2000 = the full
    * vec_id range at sf0.1, so every gate SF up to 0.1 is unchanged and
    * larger SFs hold the parameter sets fixed while the corpus grows.
    */
  private val ParamCap = 2000L

  private def corpus(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))

  private def querySet(s: SparkSession, d: String): DataFrame =
    corpus(s, d).filter(col("vec_id") % 100 === 0 && col("vec_id") < ParamCap)

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
      |  FROM n q JOIN n c ON q.vec_id % 100 = 0 AND q.vec_id < 2000 AND c.vec_id <> q.vec_id),
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
      |  FROM n q JOIN n c ON q.bucket = c.bucket AND q.vec_id % 100 = 0 AND q.vec_id < 2000
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
        corpus(s, d).filter(col("vec_id") % 100 === 7 && col("vec_id") < ParamCap),
        "vec_id", "embedding", k = 3)
      .orderBy(col("query_id"), col("rank"))

  val knnIvfSql: String = {
    val dotVC = Similarity.dotSql("x.v", "c.v", 64)
    val dotQN = Similarity.dotSql("q.v", "n.v", 64)
    val dotVV = Similarity.dotSql("v", "v", 64)
    s"""WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v,
      |    sqrt($dotVV) AS nrm FROM embeddings),
      |cents AS (SELECT vec_id AS cent_id, v, nrm FROM base WHERE vec_id % 100 = 7 AND vec_id < 2000),
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
      |    AND q.vec_id % 100 = 0 AND q.vec_id < 2000 AND n.vec_id <> q.vec_id),
      |r AS (SELECT *, row_number() OVER
      |    (PARTITION BY query_id ORDER BY cos_sim DESC, nbr_id ASC) AS rank
      |  FROM scored)
      |SELECT query_id, nbr_id, CAST(rank AS INTEGER) AS rank, cos_sim
      |FROM r WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin
  }

  /** Product-quantization top-3: 8 subspaces × sampled codebook
    * (vec_id % 50 == 3), asymmetric-distance scoring from per-query
    * partial-dot tables (see [[Similarity.pqKnn]]).
    */
  def knnPq: Q = (s, d) =>
    Similarity.pqKnn(corpus(s, d), querySet(s, d),
        corpus(s, d).filter(col("vec_id") % 50 === 3 && col("vec_id") < ParamCap),
        "vec_id", "embedding", k = 3)
      .orderBy(col("query_id"), col("rank"))

  val knnPqSql: String = {
    val dxx = Similarity.dotSql("s.xv", "s.xv", 8)
    val dxc = Similarity.dotSql("s.xv", "c.cv", 8)
    val dcc = Similarity.dotSql("c.cv", "c.cv", 8)
    val dqc = Similarity.dotSql("q.xv", "c.cv", 8)
    val ms = (0 until 8).mkString("[", ",", "]")
    val fixedSum = (0 until 8).map(i =>
      s"coalesce(max(CASE WHEN p.m = $i THEN p.p END), 0.0)").mkString(" + ")
    s"""WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |subs AS (SELECT vec_id, m, v[m*8+1 : m*8+8] AS xv
      |  FROM base CROSS JOIN (SELECT unnest($ms) AS m)),
      |cb AS (SELECT vec_id AS cent_id, m, xv AS cv FROM subs WHERE vec_id % 50 = 3 AND vec_id < 2000),
      |codes AS (SELECT vec_id, m, code FROM (
      |  SELECT s.vec_id, s.m, c.cent_id AS code,
      |    row_number() OVER (PARTITION BY s.vec_id, s.m
      |      ORDER BY round($dxx - 2.0 * $dxc + $dcc, 6) ASC, c.cent_id ASC) AS rn
      |  FROM subs s JOIN cb c ON s.m = c.m) WHERE rn = 1),
      |partials AS (SELECT q.vec_id AS query_id, q.m, c.cent_id AS code, $dqc AS p
      |  FROM subs q JOIN cb c ON q.m = c.m WHERE q.vec_id % 100 = 0 AND q.vec_id < 2000),
      |scored AS (SELECT p.query_id, s.vec_id,
      |    round($fixedSum, 6) AS approx_dot
      |  FROM codes s JOIN partials p ON s.m = p.m AND s.code = p.code
      |  WHERE s.vec_id <> p.query_id
      |  GROUP BY p.query_id, s.vec_id),
      |r AS (SELECT *, row_number() OVER
      |    (PARTITION BY query_id ORDER BY approx_dot DESC, vec_id ASC) AS rank
      |  FROM scored)
      |SELECT query_id, vec_id AS nbr_id, CAST(rank AS INTEGER) AS rank, approx_dot
      |FROM r WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin
  }

  /** IVF-PQ top-3: coarse cells from sampled centroids (vec_id % 100 == 7),
    * shared residual codebooks from sampled rows (vec_id % 50 == 3),
    * asymmetric scoring dot(q,c_cell) + Σ ADC partials — the FAISS
    * IndexIVFPQ shape (see [[Similarity.ivfPqKnn]]); the oracle rebuilds
    * the same two-level quantization in SQL.
    */
  def knnIvfPq: Q = (s, d) =>
    Similarity.ivfPqKnn(corpus(s, d), querySet(s, d),
        corpus(s, d).filter(col("vec_id") % 100 === 7 && col("vec_id") < ParamCap),
        corpus(s, d).filter(col("vec_id") % 50 === 3 && col("vec_id") < ParamCap),
        "vec_id", "embedding", k = 3)
      .orderBy(col("query_id"), col("rank"))

  val knnIvfPqSql: String = {
    val dotVC = Similarity.dotSql("x.v", "c.cellv", 64)
    val dxx = Similarity.dotSql("s.xv", "s.xv", 8)
    val dxc = Similarity.dotSql("s.xv", "c.cv", 8)
    val dcc = Similarity.dotSql("c.cv", "c.cv", 8)
    val dqc = Similarity.dotSql("q.qv", "c.cv", 8)
    val pcDot = Similarity.dotSql("a.v", "a.cellv", 64)
    val ms = (0 until 8).mkString("[", ",", "]")
    val fixedSum = (0 until 8).map(i =>
      s"coalesce(max(CASE WHEN p.m = $i THEN p.p END), 0.0)").mkString(" + ")
    s"""WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v,
      |    sqrt(${Similarity.dotSql("v", "v", 64)}) AS nrm FROM embeddings),
      |cents AS (SELECT vec_id AS cell_id, v AS cellv, nrm AS celln FROM base
      |  WHERE vec_id % 100 = 7 AND vec_id < 2000),
      |asg AS (SELECT vec_id, v, cluster_id, cellv FROM (
      |    SELECT x.vec_id, x.v, c.cell_id AS cluster_id, c.cellv,
      |      row_number() OVER (PARTITION BY x.vec_id
      |        ORDER BY round($dotVC / (x.nrm * c.celln), 6) DESC, c.cell_id ASC) AS crank
      |    FROM base x CROSS JOIN cents c)
      |  WHERE crank = 1),
      |rsubs AS (SELECT vec_id, cluster_id, m,
      |    list_transform(range(1, 9), i -> v[m*8+i] - cellv[m*8+i]) AS xv
      |  FROM asg CROSS JOIN (SELECT unnest($ms) AS m)),
      |cb AS (SELECT vec_id AS cent_id, m, xv AS cv FROM rsubs
      |  WHERE vec_id % 50 = 3 AND vec_id < 2000),
      |codes AS (SELECT vec_id, cluster_id, m, code FROM (
      |    SELECT s.vec_id, s.cluster_id, s.m, c.cent_id AS code,
      |      row_number() OVER (PARTITION BY s.vec_id, s.m
      |        ORDER BY round($dxx - 2.0 * $dxc + $dcc, 6) ASC, c.cent_id ASC) AS rn
      |    FROM rsubs s JOIN cb c ON s.m = c.m) WHERE rn = 1),
      |qcell AS (SELECT a.vec_id AS query_id, a.cluster_id, $pcDot AS pc
      |  FROM asg a WHERE a.vec_id % 100 = 0 AND a.vec_id < 2000),
      |qsubs AS (SELECT vec_id, m, v[m*8+1 : m*8+8] AS qv FROM base
      |    CROSS JOIN (SELECT unnest($ms) AS m)
      |  WHERE vec_id % 100 = 0 AND vec_id < 2000),
      |partials AS (SELECT q.vec_id AS query_id, q.m, c.cent_id AS code, $dqc AS p
      |  FROM qsubs q JOIN cb c ON q.m = c.m),
      |scored AS (SELECT qc.query_id, s.vec_id,
      |    round(max(qc.pc) + $fixedSum, 6) AS approx_dot
      |  FROM codes s
      |  JOIN qcell qc ON s.cluster_id = qc.cluster_id AND s.vec_id <> qc.query_id
      |  JOIN partials p ON p.query_id = qc.query_id AND p.m = s.m AND p.code = s.code
      |  GROUP BY qc.query_id, s.vec_id),
      |r AS (SELECT *, row_number() OVER
      |    (PARTITION BY query_id ORDER BY approx_dot DESC, vec_id ASC) AS rank
      |  FROM scored)
      |SELECT query_id, vec_id AS nbr_id, CAST(rank AS INTEGER) AS rank, approx_dot
      |FROM r WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin
  }

  /** One Lloyd's assignment + recompute step in EXACT integer arithmetic —
    * the oracle-gatable twin of [[graft.ops.Similarity.kmeansCentroids]]
    * (whose float means are deterministic per engine but not bit-portable
    * across engines). Components scale to integer micros, similarity is
    * the raw integer dot product (exact, associative → argmax can never
    * flip with partition order), and the recomputed centroid is a
    * floor-mean per dimension. Output: per-cluster size, member-id sum,
    * and the new centroid's component checksum — enough to pin the entire
    * assignment AND the recompute bit-exactly.
    *
    * Scale: centroids broadcast (k rows); assignment rides the scan;
    * recompute is posexplode → (cluster, dim) partial agg → per-cluster
    * rollup — two shuffles total, both on tiny keys, same as the float
    * path.
    */
  def kmeansStep: Q = (s, d) => {
    val k = 4
    val emb = Tables.embeddings(s, d).select(col("vec_id"),
      transform(col("embedding"), x => round(x * 1e6).cast("long")).as("v"))
    val cents = emb.filter(col("vec_id") < k)
      .select(col("vec_id").as("cent_id"), col("v").as("cv"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id")).orderBy(col("dp").desc, col("cent_id").asc)
    val assigned = emb.crossJoin(broadcast(cents))
      .withColumn("dp", aggregate(zip_with(col("v"), col("cv"), _ * _),
        lit(0L), _ + _))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("cent_id"), col("vec_id"), col("v"))
    val sizes = assigned.groupBy(col("cent_id"))
      .agg(count(lit(1)).as("n_points"), sum(col("vec_id")).as("sum_ids"))
    val checksum = assigned
      .select(col("cent_id"), posexplode(col("v")))
      .groupBy(col("cent_id"), col("pos"))
      .agg(sum(col("col")).as("sm"), count(lit(1)).as("n"))
      .groupBy(col("cent_id"))
      .agg(sum(floor(col("sm").cast("double") / col("n")).cast("long"))
        .as("centroid_checksum"))
    sizes.join(checksum, "cent_id").orderBy(col("cent_id"))
  }

  val kmeansStepSql: String =
    """WITH emb AS (SELECT vec_id,
      |    list_transform(embedding,
      |      x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS v
      |  FROM embeddings),
      |cents AS (SELECT vec_id AS cent_id, v AS cv FROM emb WHERE vec_id < 4),
      |dots AS (SELECT e.vec_id, c.cent_id,
      |    list_sum(list_transform(generate_series(1, len(e.v)),
      |      i -> e.v[i] * c.cv[i])) AS dp
      |  FROM emb e CROSS JOIN cents c),
      |best AS (SELECT vec_id, cent_id FROM (
      |    SELECT vec_id, cent_id, row_number() OVER (PARTITION BY vec_id
      |      ORDER BY dp DESC, cent_id) AS rn FROM dots) WHERE rn = 1),
      |asg AS (SELECT b.cent_id, e.vec_id, e.v FROM best b JOIN emb e USING (vec_id)),
      |sizes AS (SELECT cent_id, count(*) AS n_points,
      |    CAST(sum(vec_id) AS BIGINT) AS sum_ids FROM asg GROUP BY 1),
      |ex AS (SELECT cent_id, unnest(generate_series(1, len(v))) AS dim,
      |    unnest(v) AS val FROM asg),
      |perdim AS (SELECT cent_id, dim, CAST(sum(val) AS BIGINT) AS sm,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM ex GROUP BY 1, 2),
      |chk AS (SELECT cent_id,
      |    CAST(sum(CAST(floor(CAST(sm AS DOUBLE) / n) AS BIGINT)) AS BIGINT)
      |      AS centroid_checksum
      |  FROM perdim GROUP BY 1)
      |SELECT cent_id, n_points, sum_ids, centroid_checksum
      |FROM sizes JOIN chk USING (cent_id) ORDER BY cent_id""".stripMargin

  // ------------------------------------------------ hybrid retrieval (RRF)

  private val RrfK = 60
  private val RrfDepth = 100
  private val RrfTop = 20

  /** Hybrid retrieval: reciprocal-rank fusion (Cormack et al. 2009) of a
    * LEXICAL ranking (BM25 over the fixed query terms, [[TextOps.bm25]])
    * and a DENSE ranking (cosine of corpus vectors against query vector 0
    * — documents and embeddings are id-aligned). Each list contributes
    * `1e6 div (60 + rank)` micro-points for its top-100; absent → 0. The
    * RAG-stack shape: two retrievers that fail differently, fused without
    * score calibration because RRF only consumes RANKS.
    *
    * SCALE: each ranking is its own top-k (the per-list depth bounds
    * everything downstream); the fusion full-joins two ≤100-row lists —
    * driver-trivial regardless of corpus size. Fused scores are integer
    * micro-units (ranks are integers, so the fusion is exact) with doc_id
    * tie-break at the cut. The global rank window runs over the ALREADY
    * top-k'd lists, never the corpus.
    */
  def hybridRrf: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    // top-k FIRST (TakeOrderedAndProject — distributed heads, no global
    // sort), then the rank window runs over ≤ RrfDepth rows instead of
    // the whole scored corpus
    val lex = TextOps.bm25(s, d)
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(RrfDepth)
      .withColumn("lex_rank", row_number().over(
        Window.orderBy(col("bm25").desc, col("doc_id"))))
      .select(col("doc_id"), col("lex_rank"))
    val dense = Similarity.bruteForceKnn(corpus(s, d),
        querySet(s, d).filter(col("vec_id") === 0),
        "vec_id", "embedding", k = RrfDepth)
      .select(col("nbr_id").as("doc_id"), col("rank").as("dense_rank"))
    lex.join(dense, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        coalesce(col("lex_rank"), lit(0)).cast("int").as("lex_rank"),
        coalesce(col("dense_rank"), lit(0)).cast("int").as("dense_rank"),
        (coalesce(expr(s"1000000 div ($RrfK + lex_rank)"), lit(0L)) +
          coalesce(expr(s"1000000 div ($RrfK + dense_rank)"), lit(0L)))
          .as("rrf_micro"))
      .orderBy(col("rrf_micro").desc, col("doc_id")).limit(RrfTop)
  }

  val hybridRrfSql: String = {
    val dotQC = Similarity.dotSql("q.v", "c.v", 64)
    val dotVV = Similarity.dotSql("v", "v", 64)
    s"""WITH bm AS (SELECT * FROM (${TextOps.bm25Sql.replace("\n", "\n      |  ")}) bmq),
      |lexr AS (SELECT doc_id, lex_rank FROM
      |  (SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS lex_rank
      |   FROM bm) WHERE lex_rank <= $RrfDepth),
      |base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |n AS (SELECT vec_id, v, sqrt($dotVV) AS nrm FROM base),
      |scored AS (SELECT c.vec_id AS nbr_id,
      |    round($dotQC / (q.nrm * c.nrm), 6) AS cos_sim
      |  FROM n q JOIN n c ON q.vec_id = 0 AND c.vec_id <> 0),
      |denser AS (SELECT doc_id, dense_rank FROM
      |  (SELECT nbr_id AS doc_id, row_number() OVER
      |     (ORDER BY cos_sim DESC, nbr_id) AS dense_rank FROM scored)
      |  WHERE dense_rank <= $RrfDepth),
      |f AS (SELECT coalesce(l.doc_id, r.doc_id) AS doc_id,
      |    coalesce(l.lex_rank, 0) AS lex_rank,
      |    coalesce(r.dense_rank, 0) AS dense_rank,
      |    coalesce(1000000 // ($RrfK + l.lex_rank), 0) +
      |      coalesce(1000000 // ($RrfK + r.dense_rank), 0) AS rrf
      |  FROM lexr l FULL JOIN denser r ON l.doc_id = r.doc_id)
      |SELECT doc_id, CAST(lex_rank AS INTEGER) AS lex_rank,
      |  CAST(dense_rank AS INTEGER) AS dense_rank,
      |  CAST(rrf AS BIGINT) AS rrf_micro
      |FROM f ORDER BY rrf_micro DESC, doc_id LIMIT $RrfTop""".stripMargin
  }

  // ---------------------------------------------------- eval metrics sweep

  private val EvalThresholds = Seq(-0.2, -0.1, 0.0, 0.1, 0.2)

  /** The evaluation half of a training pipeline: a threshold sweep of
    * binary-classification metrics (confusion counts, precision, recall,
    * F1) over a deterministic scored set — scores are the rounded cosine
    * of each corpus vector against query vector 0, ground truth is the
    * label's parity. Metrics are INTEGER MICRO-UNITS derived with `div`
    * (`f1 = 2·tp·10⁶ div (2·tp + fp + fn)` — the algebraic form that
    * never divides by a rounded intermediate), so the whole sweep is
    * bit-stable and oracle-checkable.
    *
    * SCALE: one pass over the scored set with a 5-way threshold fan-out
    * (explode of a constant array — map-side), then one
    * partial-aggregated shuffle keyed by threshold. Score computation is
    * the codegen'd `graft_dot`; nothing corpus-sized is ever shuffled
    * unaggregated.
    */
  def evalMetrics: Q = (s, d) => {
    val q0 = Similarity.withNorm(
        Tables.embeddings(s, d).filter(col("vec_id") === 0), "embedding")
      .select(col("v").as("qv"), col("nrm").as("qn"))
    val scored = Similarity.withNorm(
        Tables.embeddings(s, d).filter(col("vec_id") =!= 0), "embedding")
      .crossJoin(broadcast(q0))
      .select(col("vec_id"), (col("label") % 2 === 1).as("is_pos"),
        round(Similarity.cosine(col("v"), col("qv"), col("nrm"), col("qn")), 6)
          .as("score"))
    scored
      .select(col("is_pos"), col("score"),
        explode(array(EvalThresholds.map(lit): _*)).as("threshold"))
      .groupBy(col("threshold"))
      .agg(
        sum(when(col("score") >= col("threshold") && col("is_pos"), 1L)
          .otherwise(0L)).as("tp"),
        sum(when(col("score") >= col("threshold") && !col("is_pos"), 1L)
          .otherwise(0L)).as("fp"),
        sum(when(col("score") < col("threshold") && col("is_pos"), 1L)
          .otherwise(0L)).as("fn"))
      .select(col("threshold"), col("tp"), col("fp"), col("fn"),
        expr("(tp * 1000000) div (tp + fp)").as("precision_micro"),
        expr("(tp * 1000000) div (tp + fn)").as("recall_micro"),
        expr("(2 * tp * 1000000) div (2 * tp + fp + fn)").as("f1_micro"))
      .orderBy(col("threshold"))
  }

  val evalMetricsSql: String = {
    val dotQC = Similarity.dotSql("c.v", "q.v", 64)
    val dotVV = Similarity.dotSql("v", "v", 64)
    val ts = EvalThresholds.mkString("[", ", ", "]")
    s"""WITH base AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
      |n AS (SELECT vec_id, label, v, sqrt($dotVV) AS nrm FROM base),
      |q AS (SELECT v, nrm FROM n WHERE vec_id = 0),
      |scored AS (SELECT c.vec_id, c.label % 2 = 1 AS is_pos,
      |    round($dotQC / (c.nrm * q.nrm), 6) AS score
      |  FROM n c CROSS JOIN q WHERE c.vec_id <> 0),
      |fan AS (SELECT is_pos, score, unnest($ts::DOUBLE[]) AS threshold FROM scored),
      |agg AS (SELECT threshold,
      |    sum(CASE WHEN score >= threshold AND is_pos THEN 1 ELSE 0 END) AS tp,
      |    sum(CASE WHEN score >= threshold AND NOT is_pos THEN 1 ELSE 0 END) AS fp,
      |    sum(CASE WHEN score < threshold AND is_pos THEN 1 ELSE 0 END) AS fn
      |  FROM fan GROUP BY threshold)
      |SELECT threshold, CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
      |  CAST(fn AS BIGINT) AS fn,
      |  CAST((tp * 1000000) // (tp + fp) AS BIGINT) AS precision_micro,
      |  CAST((tp * 1000000) // (tp + fn) AS BIGINT) AS recall_micro,
      |  CAST((2 * tp * 1000000) // (2 * tp + fp + fn) AS BIGINT) AS f1_micro
      |FROM agg ORDER BY threshold""".stripMargin
  }

  /** Exact ROC-AUC by the Mann–Whitney rank statistic, tie-corrected with
    * integer midranks: for a tie group starting at rank r with c members,
    * `2·midrank = 2r + c − 1` (doubling keeps the .5 midranks integral),
    * and `auc_micro = (Σ2midrank_pos − n_pos(n_pos+1)) · 10⁶ div
    * (2·n_pos·n_neg)` — every intermediate an exact long, so the AUC is
    * bit-stable and hash-gated. Same deterministic scored set as
    * [[evalMetrics]].
    *
    * SCALE: the rank statistic is computed from the per-score GROUPED
    * form, not a row-level window — scores aggregate first (map-side
    * combine), then one cumulative window runs over DISTINCT rounded
    * scores (≤ 4·10⁶ values for 6-dp cosines, vs billions of rows). For
    * a tie group of n rows with p positives starting after `cum_before`
    * rows, every positive contributes `2·midrank = 2·cum_before + n + 1`
    * — identical integers to the row-level `2r + c − 1`, so the oracle
    * (which keeps the row-level window) hash-matches exactly.
    */
  def evalAuc: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val q0 = Similarity.withNorm(
        Tables.embeddings(s, d).filter(col("vec_id") === 0), "embedding")
      .select(col("v").as("qv"), col("nrm").as("qn"))
    val scored = Similarity.withNorm(
        Tables.embeddings(s, d).filter(col("vec_id") =!= 0), "embedding")
      .crossJoin(broadcast(q0))
      .select((col("label") % 2 === 1).as("is_pos"),
        round(Similarity.cosine(col("v"), col("qv"), col("nrm"), col("qn")), 6)
          .as("score"))
    val grouped = scored.groupBy(col("score"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("is_pos"), 1L).otherwise(0L)).as("p"))
    val wS = Window.orderBy(col("score").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grouped.withColumn("cum_n", sum(col("n")).over(wS))
      .agg(
        sum(col("p")).as("n_pos"),
        sum(col("n") - col("p")).as("n_neg"),
        sum(col("p") * (lit(2L) * (col("cum_n") - col("n")) + col("n") + 1L))
          .as("sum_2midrank_pos"))
      .select(col("n_pos"), col("n_neg"), col("sum_2midrank_pos"),
        expr("((sum_2midrank_pos - n_pos * (n_pos + 1)) * 1000000) " +
          "div (2 * n_pos * n_neg)").as("auc_micro"))
  }

  val evalAucSql: String = {
    val dotQC = Similarity.dotSql("c.v", "q.v", 64)
    val dotVV = Similarity.dotSql("v", "v", 64)
    s"""WITH base AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
      |n AS (SELECT vec_id, label, v, sqrt($dotVV) AS nrm FROM base),
      |q AS (SELECT v, nrm FROM n WHERE vec_id = 0),
      |scored AS (SELECT c.label % 2 = 1 AS is_pos,
      |    round($dotQC / (c.nrm * q.nrm), 6) AS score
      |  FROM n c CROSS JOIN q WHERE c.vec_id <> 0),
      |ranked AS (SELECT is_pos,
      |    rank() OVER (ORDER BY score) AS r,
      |    count(*) OVER (PARTITION BY score) AS c
      |  FROM scored),
      |agg AS (SELECT
      |    sum(CASE WHEN is_pos THEN 1 ELSE 0 END) AS n_pos,
      |    sum(CASE WHEN is_pos THEN 0 ELSE 1 END) AS n_neg,
      |    sum(CASE WHEN is_pos THEN 2 * r + c - 1 ELSE 0 END) AS sum_2midrank_pos
      |  FROM ranked)
      |SELECT CAST(n_pos AS BIGINT) AS n_pos, CAST(n_neg AS BIGINT) AS n_neg,
      |  CAST(sum_2midrank_pos AS BIGINT) AS sum_2midrank_pos,
      |  CAST(((sum_2midrank_pos - n_pos * (n_pos + 1)) * 1000000)
      |    // (2 * n_pos * n_neg) AS BIGINT) AS auc_micro
      |FROM agg""".stripMargin
  }

  /** The calibration check next to [[evalMetrics]]'s discrimination and
    * [[evalAuc]]'s ranking: scores binned into fixed 0.1-wide buckets
    * (`floor(score·10)` — integer bin ids, no boundary ambiguity), per
    * bin the count, the exact mean score in micro-units (sum of
    * per-row micro-rounded scores div n — order-free), and the positive
    * rate in micro-units. A well-calibrated scorer shows pos_rate ≈
    * mean score per bin; the drift table IS the reliability diagram.
    *
    * SCALE: one partial-aggregated shuffle on ≤ ~20 bin keys.
    */
  def evalCalibration: Q = (s, d) => {
    val q0 = Similarity.withNorm(
        Tables.embeddings(s, d).filter(col("vec_id") === 0), "embedding")
      .select(col("v").as("qv"), col("nrm").as("qn"))
    Similarity.withNorm(
        Tables.embeddings(s, d).filter(col("vec_id") =!= 0), "embedding")
      .crossJoin(broadcast(q0))
      .select((col("label") % 2 === 1).as("is_pos"),
        round(Similarity.cosine(col("v"), col("qv"), col("nrm"), col("qn")), 6)
          .as("score"))
      .select(floor(col("score") * 10).cast("long").as("bin"),
        round(col("score") * 1000000).cast("long").as("score_micro"),
        col("is_pos"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        expr("sum(score_micro) div count(1)").as("mean_score_micro"),
        expr("(sum(CASE WHEN is_pos THEN 1 ELSE 0 END) * 1000000) div count(1)")
          .as("pos_rate_micro"))
      .orderBy(col("bin"))
  }

  val evalCalibrationSql: String = {
    val dotQC = Similarity.dotSql("c.v", "q.v", 64)
    val dotVV = Similarity.dotSql("v", "v", 64)
    s"""WITH base AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
      |n AS (SELECT vec_id, label, v, sqrt($dotVV) AS nrm FROM base),
      |q AS (SELECT v, nrm FROM n WHERE vec_id = 0),
      |scored AS (SELECT c.label % 2 = 1 AS is_pos,
      |    round($dotQC / (c.nrm * q.nrm), 6) AS score
      |  FROM n c CROSS JOIN q WHERE c.vec_id <> 0),
      |b AS (SELECT CAST(floor(score * 10) AS BIGINT) AS bin,
      |    CAST(round(score * 1000000) AS BIGINT) AS score_micro, is_pos
      |  FROM scored)
      |SELECT bin, count(*) AS n,
      |  CAST(sum(score_micro) // count(*) AS BIGINT) AS mean_score_micro,
      |  CAST(sum(CASE WHEN is_pos THEN 1 ELSE 0 END) * 1000000 // count(*) AS BIGINT)
      |    AS pos_rate_micro
      |FROM b GROUP BY bin ORDER BY bin""".stripMargin
  }

  /** NDCG@10 of the dense retriever for query vector 0 — the standard
    * graded-relevance ranking metric, completing the retrieval stack
    * (BM25, cosine ANN, RRF fusion → and now its evaluation). Relevance
    * is the integer grade `max(0, 3 − |label(doc) − label(query)|)`;
    * each position's discounted gain is micro-rounded BEFORE summation
    * (`round(rel·10⁶ / log2(pos+1))` — per-term rounding is the same
    * order-free discipline as the LM/entropy kernels, and positions are
    * a fixed 1..10 so the float log is rounded once per term, never
    * accumulated), IDCG re-ranks the same 10 grades descending, and
    * `ndcg_micro = dcg·10⁶ div idcg` stays integer.
    *
    * SCALE: the ranking is [[Similarity.bruteForceKnn]]'s top-k (heap
    * top-k per query, corpus never sorted); the metric itself touches 10
    * rows.
    */
  def evalNdcg: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val top = Similarity.bruteForceKnn(corpus(s, d),
        querySet(s, d).filter(col("vec_id") === 0),
        "vec_id", "embedding", k = 10)
      .select(col("nbr_id"), col("rank"))
    val labels = Tables.embeddings(s, d).select(col("vec_id"), col("label"))
    val graded = top.join(labels, col("nbr_id") === col("vec_id"))
      .select(col("rank"),
        greatest(lit(0), lit(3) - abs(col("label") - lit(2))).as("rel"))
    val terms = graded
      .withColumn("gain_micro",
        round(col("rel") * 1000000.0 / log2(col("rank") + 1)).cast("long"))
      .withColumn("irank",
        row_number().over(Window.orderBy(col("rel").desc, col("rank").asc)))
      .withColumn("ideal_micro",
        round(col("rel") * 1000000.0 / log2(col("irank") + 1)).cast("long"))
    terms.agg(sum(col("gain_micro")).as("dcg_micro"),
        sum(col("ideal_micro")).as("idcg_micro"))
      .select(col("dcg_micro"), col("idcg_micro"),
        expr("(dcg_micro * 1000000) div idcg_micro").as("ndcg_micro"))
  }

  val evalNdcgSql: String = {
    val dotQC = Similarity.dotSql("q.v", "c.v", 64)
    val dotVV = Similarity.dotSql("v", "v", 64)
    s"""WITH base AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
      |n AS (SELECT vec_id, label, v, sqrt($dotVV) AS nrm FROM base),
      |scored AS (SELECT c.vec_id AS nbr_id, c.label,
      |    round($dotQC / (q.nrm * c.nrm), 6) AS cos_sim
      |  FROM n q JOIN n c ON q.vec_id = 0 AND c.vec_id <> 0),
      |top AS (SELECT * FROM (SELECT nbr_id, label, row_number() OVER
      |    (ORDER BY cos_sim DESC, nbr_id ASC) AS rank FROM scored)
      |  WHERE rank <= 10),
      |graded AS (SELECT rank, greatest(0, 3 - abs(label - 2)) AS rel FROM top),
      |terms AS (SELECT rank, rel,
      |    CAST(round(rel * 1000000.0 / log2(rank + 1)) AS BIGINT) AS gain_micro,
      |    row_number() OVER (ORDER BY rel DESC, rank ASC) AS irank
      |  FROM graded),
      |terms2 AS (SELECT *,
      |    CAST(round(rel * 1000000.0 / log2(irank + 1)) AS BIGINT) AS ideal_micro
      |  FROM terms),
      |agg AS (SELECT CAST(sum(gain_micro) AS BIGINT) AS dcg_micro,
      |    CAST(sum(ideal_micro) AS BIGINT) AS idcg_micro FROM terms2)
      |SELECT dcg_micro, idcg_micro,
      |  CAST((dcg_micro * 1000000) // idcg_micro AS BIGINT) AS ndcg_micro
      |FROM agg""".stripMargin
  }

  /** INT8 symmetric quantization of the embedding column — the standard
    * 4× compression before vectors go to an index or a feature store:
    * per-vector scale = max |component|, code_i = round(v_i / scale·127).
    * Gated columns are exact integers (code sum) plus micro-floored scale
    * and L1 reconstruction error, computed with IDENTICAL left-fold
    * element order on both engines so the doubles agree bitwise before
    * flooring. Pure projection — no shuffle; at 100 TB this runs
    * scan-side and writes 1/4 the bytes downstream.
    */
  def embedQuantize: Q = (s, d) => {
    val v = transform(col("embedding"), x => x.cast("double"))
    val scale = greatest(array_max(transform(v, x => abs(x))), lit(1e-12))
    val codes = transform(v, x => round(x / col("_scale") * 127))
    val err = aggregate(v, lit(0.0d),
      (acc, x) => acc + abs(x - round(x / col("_scale") * 127) * col("_scale") / 127.0))
    Tables.embeddings(s, d)
      .withColumn("_scale", scale)
      .select(col("vec_id"),
        floor(col("_scale") * 1000000 + 0.5).cast("long").as("scale_micro"),
        aggregate(codes, lit(0.0d), (acc, c) => acc + c)
          .cast("long").as("code_sum"),
        floor(err * 1000000 + 0.5).cast("long").as("l1_err_micro"))
      .orderBy(col("vec_id"))
  }

  val embedQuantizeSql: String =
    """WITH v AS (SELECT vec_id,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings),
      |s AS (SELECT vec_id, v,
      |    greatest(list_max(list_transform(v, x -> abs(x))), 1e-12) AS scale
      |  FROM v)
      |SELECT vec_id,
      |  CAST(floor(scale * 1000000 + 0.5) AS BIGINT) AS scale_micro,
      |  CAST(list_sum(list_transform(v, x -> round(x / scale * 127))) AS BIGINT) AS code_sum,
      |  CAST(floor(list_sum(list_transform(v,
      |    x -> abs(x - round(x / scale * 127) * scale / 127.0))) * 1000000 + 0.5) AS BIGINT)
      |    AS l1_err_micro
      |FROM s ORDER BY vec_id""".stripMargin

  /** Hard-negative mining over the near-dup-augmented corpus (the
    * q_dedup_embedding fixture: embeddings ∪ perturbed copies of
    * vec_id % 9 == 0): per anchor, the 5 most-similar vectors with
    * rounded cosine BELOW 0.85 — near-duplicates are screened out as
    * likely unlabeled positives (see [[Similarity.hardNegatives]]).
    */
  def hardNegativesQ: Q = (s, d) => {
    val base = Tables.embeddings(s, d)
      .select(col("vec_id"), Similarity.asDouble(col("embedding")).as("v"))
    val perturbed = base.filter(col("vec_id") % 9 === 0)
      .select((col("vec_id") + 100000).as("vec_id"),
        concat(array(element_at(col("v"), 1) + lit(0.5)),
          slice(col("v"), 2, 63)).as("v"))
    val corpus = base.unionByName(perturbed)
    val anchors = corpus.filter(col("vec_id") % 100 === 0 && col("vec_id") < ParamCap)
    Similarity.hardNegatives(corpus, anchors, "vec_id", "v", k = 5, maxSim = 0.85)
      .orderBy(col("query_id"), col("rank"))
  }

  val hardNegativesSql: String = {
    val dotQC = Similarity.dotSql("q.v", "c.v", 64)
    val dotVV = Similarity.dotSql("v", "v", 64)
    s"""WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |corpus AS (
      |  SELECT vec_id, v FROM base
      |  UNION ALL
      |  SELECT vec_id + 100000, [v[1] + 0.5] || v[2:64] FROM base WHERE vec_id % 9 = 0),
      |n AS (SELECT vec_id, v, sqrt($dotVV) AS nrm FROM corpus),
      |scored AS (SELECT q.vec_id AS query_id, c.vec_id AS nbr_id,
      |    round($dotQC / (q.nrm * c.nrm), 6) AS cos_sim
      |  FROM n q JOIN n c ON q.vec_id % 100 = 0 AND q.vec_id < 2000 AND c.vec_id <> q.vec_id),
      |neg AS (SELECT * FROM scored WHERE cos_sim < 0.85),
      |r AS (SELECT *, row_number() OVER
      |    (PARTITION BY query_id ORDER BY cos_sim DESC, nbr_id ASC) AS rank
      |  FROM neg)
      |SELECT query_id, nbr_id, CAST(rank AS INTEGER) AS rank, cos_sim
      |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin
  }

  val queries: Map[String, Q] = Map(
    "q_embed_quantize" -> embedQuantize,
    "q_eval_ndcg" -> evalNdcg,
    "q_eval_calibration" -> evalCalibration,
    "q_eval_auc" -> evalAuc,
    "q_eval_metrics" -> evalMetrics,
    "q_hybrid_rrf" -> hybridRrf,
    "q_knn_brute" -> knnBrute,
    "q_knn_lsh" -> knnLsh,
    "q_knn_ivf" -> knnIvf,
    "q_knn_pq" -> knnPq,
    "q_knn_ivfpq" -> knnIvfPq,
    "q_kmeans_step" -> kmeansStep,
    "q_hard_negatives" -> hardNegativesQ,
  )

  val oracles: Map[String, String] = Map(
    "q_embed_quantize" -> embedQuantizeSql,
    "q_eval_ndcg" -> evalNdcgSql,
    "q_eval_calibration" -> evalCalibrationSql,
    "q_eval_auc" -> evalAucSql,
    "q_eval_metrics" -> evalMetricsSql,
    "q_hybrid_rrf" -> hybridRrfSql,
    "q_knn_brute" -> knnBruteSql,
    "q_knn_lsh" -> knnLshSql,
    "q_knn_ivf" -> knnIvfSql,
    "q_knn_pq" -> knnPqSql,
    "q_knn_ivfpq" -> knnIvfPqSql,
    "q_kmeans_step" -> kmeansStepSql,
    "q_hard_negatives" -> hardNegativesSql,
  )
}
