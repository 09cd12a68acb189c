package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed linear algebra over the embedding corpus — the PCA /
  * top-principal-component pass a pipeline runs to monitor embedding
  * collapse, pick projection axes, or whiten features before indexing.
  *
  * The operator is power iteration on the (centered) covariance of the
  * 64-dim embeddings, in exact integer arithmetic end-to-end — the q136
  * discipline (distributed statistics, fixed-size driver-side model)
  * applied to eigenvector estimation:
  *
  *   1. quantize   q = round(x · 2^20)              (q87/q42b contract)
  *   2. moments    S_i = Σ q_i ; Sxx_ij = Σ q_i·q_j (i ≤ j)
  *   3. center     m_i = S_i div n;  C_ij = (Sxx_ij − n·m_i·m_j) div 2^30
  *   4. iterate    w = C·v ; v ← w div max(max|w| div 2^20, 1)   ×48
  *   5. rayleigh   λ = Σ(v_i·w_i div 2^20) div max(Σ(v_i² div 2^20), 1)
  *   6. project    p = Σ q_j·v_j per row, aggregated per label
  *
  * Why this is the scale-correct shape: the ONLY data-sized work is two
  * map-side-combined aggregations over the corpus (the per-dim sums and
  * the upper-triangle outer-product sums — the pair explode fans each
  * row to D(D+1)/2 = 2 080 products, but partial aggregation collapses
  * them to 2 080 longs per partition before the shuffle) plus one
  * projection scan; what reaches the driver is n + 64 + 2 080 longs —
  * a fixed-size model-state read (q136's sanctioned collect), identical
  * at 500 vectors and 5·10^9. The O(D²) iteration math is driver-side
  * because it is O(D²), not O(N): 48 matvecs on a 64×64 integer matrix.
  * The learned axis returns to the executors as 64 literals inside one
  * codegen'd zip_with/aggregate fold — the corpus never shuffles.
  *
  * Every step is order- and partition-invariant integer math (sums of
  * products, truncating `div`), so the DuckDB oracle replays the
  * quantization, centering, all 48 unrolled iterations, the Rayleigh
  * quotient, AND every per-row projection bit-for-bit.
  *
  * Overflow headroom (documented like q87): |q| ≤ 2^20 so q_i·q_j ≤
  * 2^40 and the Sxx sums hold ~2^22 rows; the per-label projection sum
  * (|p| ≤ 64·2^20·2^20 = 2^46) holds ~2^16 rows per label at the
  * worst-case bound — but real projections sit near |p| ≈ 2^37 (vector
  * components ~0.15), giving ~2^25 rows; past that, switch the final
  * mean to DECIMAL(38,0) sums (q01b trade-off) without touching the
  * iteration. The BINDING term, though, is the Rayleigh products
  * v(i)·w(i) inside the iteration: the covariance entries g ≈
  * Sxx/CovScale grow LINEARLY with n, so |w| ≈ 64·|g|·2^20 does too —
  * measured max |v·w| ≈ 5·10^16 at n = 2 000 on the real fixture,
  * crossing 2^63 at n ≈ 3.7·10^5 vectors (far below the Sxx bound).
  * The dial: CovScale ∝ n (e.g. 2^30 · n/2^11) keeps g — and every
  * downstream product — n-INDEPENDENT with identical semantics; the
  * constant form here pins the fixture replay, a production deployment
  * sets it from the row count it already reads for the means.
  * Convergence: the iteration count is a dial sized to the
  * corpus's eigengap (see the Iters comment); correctness is exact
  * replay, and the spec pins ≥0.95 alignment against a converged
  * double-precision reference on the real fixture corpus.
  */
object LinAlg {

  private val D = 64
  private val Q = 1048576L          // 2^20 — quantization scale
  private val CovScale = 1073741824L // 2^30 — covariance pre-scale
  // 48 iterations: the fixture corpus is near-isotropic (λ2/λ1 ≈ 0.93
  // measured at sf0.001), so ~43 steps separate the top axis 20×;
  // each step is a 64×64 integer matvec on the DRIVER (microseconds)
  // and three 64-row CTEs in the oracle — iteration count is a free
  // dial here, unlike a distributed pass. LinAlgSpec pins ≥0.95
  // alignment against a converged double-precision reference.
  private[queries] val Iters = 48

  /** Integer power iteration (step 4–5 above). Package-private so the
    * spec can drive it on hand-built matrices. Returns (axis, λ) where
    * λ is the Rayleigh quotient of the LAST iterate pair (v, C·v). */
  private[queries] def powerIterate(
      g: Array[Array[Long]], iters: Int): (Array[Long], Long) = {
    val d = g.length
    var v = Array.fill(d)(Q)
    var lambda = 0L
    for (_ <- 1 to iters) {
      val w = Array.tabulate(d) { i =>
        var s = 0L; var j = 0
        while (j < d) { s += g(i)(j) * v(j); j += 1 }
        s
      }
      var num = 0L; var den = 0L
      for (i <- 0 until d) {
        num += (v(i) * w(i)) / Q
        den += (v(i) * v(i)) / Q
      }
      lambda = num / math.max(den, 1L)
      val dd = math.max(w.map(math.abs).max / Q, 1L)
      v = w.map(_ / dd)
    }
    (v, lambda)
  }

  private def pca(s: SparkSession, d: String): DataFrame = {
    val qz = Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"), expr(
        "transform(embedding, x -> cast(round(cast(x as double) * 1048576, 0) as bigint))"
      ).as("qv"))
      .persist()
    try {
      val n = qz.count()
      require(n > 0, "q141 needs a non-empty embeddings table")
      // per-dim sums → truncated integer means (64 longs to the driver)
      val mu = qz.select(posexplode(col("qv")).as(Seq("i", "x")))
        .groupBy("i").agg(sum(col("x")).as("sx"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val m = Array.tabulate(D)(i => mu(i) / n)
      // upper-triangle second-moment sums: one map-side-combined agg,
      // 2 080 longs to the driver
      val sxx = qz
        .select(col("qv"), posexplode(col("qv")).as(Seq("i", "xi")))
        .select(col("i"), col("xi"), posexplode(col("qv")).as(Seq("j", "xj")))
        .where(col("j") >= col("i"))
        .groupBy("i", "j").agg(sum(expr("xi * xj")).as("sxx"))
        .collect()
      val g = Array.ofDim[Long](D, D)
      for (r <- sxx) {
        val i = r.getInt(0); val j = r.getInt(1)
        val c = (r.getLong(2) - n * m(i) * m(j)) / CovScale
        g(i)(j) = c
        g(j)(i) = c
      }
      val (v, lambda) = powerIterate(g, Iters)
      // the axis rides back as 64 literals in one codegen'd fold; the
      // corpus is scanned once more and never shuffles
      val vArr = v.mkString("array(", "L, ", "L)")
      qz.select(col("label"), expr(
          s"aggregate(zip_with(qv, $vArr, (a, b) -> a * b), 0L, (acc, x) -> acc + x)"
        ).as("p"))
        .groupBy("label")
        .agg(count(lit(1)).as("n_vecs"),
          expr("sum(p) div count(1)").as("mean_proj"),
          min(col("p")).as("min_proj"), max(col("p")).as("max_proj"))
        .withColumn("lambda_scaled", lit(lambda))
        .orderBy(col("label"))
    } finally { qz.unpersist(); () }
  }

  // ------------------------------------------------------------ q141
  // (see object scaladoc) The oracle replays the whole chain: exact
  // integer moments, truncated centering, all unrolled power-iteration
  // steps, the Rayleigh quotient, and every per-row projection.
  // MATERIALIZED is load-bearing: DuckDB inlines plain CTEs at every
  // reference, and d_r references w_r twice — 48 chained iterations
  // would otherwise expand the expression tree exponentially (observed
  // as a file-handle explosion re-opening the parquet per expansion).
  // Same fix as q125's unrolled greedy (a$i AS MATERIALIZED).
  private def sqlIter(r: Int): String = {
    val prev = if (r == 1) "v0" else s"v${r - 1}"
    s"""w$r AS MATERIALIZED (
       |  SELECT gf.i, CAST(SUM(gf.g * v.v) AS BIGINT) AS w
       |  FROM gf JOIN $prev v ON v.j = gf.j GROUP BY gf.i),
       |d$r AS (SELECT greatest(MAX(abs(w)) // 1048576, 1) AS d FROM w$r),
       |v$r AS MATERIALIZED (
       |  SELECT i AS j, w // (SELECT d FROM d$r) AS v FROM w$r)"""
      .stripMargin
  }

  private val q141 = QueryDef.of(
    (s, d) => pca(s, d),
    s"""WITH qz AS (
       |  SELECT vec_id, label, list_transform(embedding,
       |    x -> CAST(round(CAST(x AS DOUBLE) * 1048576, 0) AS BIGINT)) AS qv
       |  FROM embeddings),
       |nn AS (SELECT COUNT(*) AS n FROM qz),
       |ex AS (
       |  SELECT vec_id, CAST(unnest(range(0, len(qv))) AS INT) AS i,
       |    unnest(qv) AS x
       |  FROM qz),
       |mu AS (
       |  SELECT i, CAST(SUM(x) AS BIGINT) // (SELECT n FROM nn) AS m
       |  FROM ex GROUP BY i),
       |sxx AS (
       |  SELECT a.i AS i, b.i AS j, CAST(SUM(a.x * b.x) AS BIGINT) AS sxx
       |  FROM ex a JOIN ex b ON a.vec_id = b.vec_id AND b.i >= a.i
       |  GROUP BY 1, 2),
       |cov AS (
       |  SELECT s.i, s.j,
       |    (s.sxx - (SELECT n FROM nn) * ma.m * mb.m) // 1073741824 AS g
       |  FROM sxx s
       |  JOIN mu ma ON ma.i = s.i
       |  JOIN mu mb ON mb.i = s.j),
       |gf AS MATERIALIZED (
       |  SELECT i, j, g FROM cov
       |  UNION ALL
       |  SELECT j AS i, i AS j, g FROM cov WHERE i <> j),
       |v0 AS (SELECT i AS j, CAST(1048576 AS BIGINT) AS v FROM mu),
       |${(1 to Iters).map(sqlIter).mkString(",\n")},
       |lam AS (SELECT
       |  (SELECT CAST(SUM((v.v * w.w) // 1048576) AS BIGINT)
       |     FROM v${Iters - 1} v JOIN w$Iters w ON w.i = v.j)
       |  // greatest((SELECT CAST(SUM((v * v) // 1048576) AS BIGINT)
       |               FROM v${Iters - 1}), 1) AS lambda),
       |proj AS (
       |  SELECT e.vec_id, CAST(SUM(e.x * v.v) AS BIGINT) AS p
       |  FROM ex e JOIN v$Iters v ON v.j = e.i GROUP BY e.vec_id)
       |SELECT q.label, COUNT(*) AS n_vecs,
       |  CAST(SUM(p.p) AS BIGINT) // COUNT(*) AS mean_proj,
       |  MIN(p.p) AS min_proj, MAX(p.p) AS max_proj,
       |  (SELECT lambda FROM lam) AS lambda_scaled
       |FROM qz q JOIN proj p ON p.vec_id = q.vec_id
       |GROUP BY q.label
       |ORDER BY q.label""".stripMargin)

  val defs: Map[String, QueryDef] = Map(
    "q141_pca_power" -> q141)
}
