package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Clustering
import Tables._

/** Driver-checked corpus-analytics queries: the embedding-space
  * statistics a training-data pipeline runs beside dedup/sampling —
  * clustering for topic bucketing and coverage audits, second-moment
  * structure for whitening.
  *
  * The family's point is that ITERATIVE float algorithms are
  * hash-oracled here, not rows-only: every accumulation is fixed-point
  * (exact integers, add-order free) and every carried float is rounded
  * once per iteration, so DuckDB can replay the unrolled loop
  * bit-for-bit. See [[graft.operators.Clustering]] for the contract.
  */
object AnalyticsQueries {

  private val K = 4
  private val Iters = 2
  private val Dim = 64 // fixture embedding dim (all sf dirs share the generator)

  /** q135: distributed Lloyd's k-means (k=4, 2 rounds, seeded from
    * vec_ids 0..3). One narrow-map assign + one partial-agg shuffle
    * per round; report = (cluster, n_vecs, inertia_fp, pos, centroid). */
  def kmeans(spark: SparkSession, dir: String): DataFrame =
    Clustering.kmeansReport(spread(t(spark, dir, "embeddings")), K, Iters)
      .orderBy(col("cluster"), col("pos"))

  // ----------------------------------------------------------- oracles

  /** Fixed-point squared-L2 — mirrors Clustering.distFp term-for-term
    * (cast to double, subtract, square, ×10⁸, round, long, sum). */
  private def distSql(x: String, c: String): String =
    s"list_sum(list_transform(range(1, len($x)+1), i -> " +
      s"CAST(ROUND((CAST($x[i] AS DOUBLE) - $c[i]) * (CAST($x[i] AS DOUBLE) - $c[i]) * 100000000.0) AS BIGINT)))"

  /** Per-(cluster, dim) fixed-point component sums over an assignment
    * CTE `a(vec_id, cl)` — the Clustering.update shape. */
  private def sumsSql(a: String): String =
    s"""SELECT $a.cl, t.i, count(*) AS n,
       |   CAST(SUM(CAST(ROUND(CAST(e.x[t.i] AS DOUBLE) * 1000000.0) AS BIGINT)) AS BIGINT) AS fp
       | FROM $a JOIN e USING (vec_id) CROSS JOIN range(1, ${Dim + 1}) AS t(i)
       | GROUP BY 1, 2""".stripMargin

  val oracles: Map[String, String] = Map(
    "q135_kmeans" ->
      s"""WITH e AS (SELECT vec_id, embedding AS x FROM embeddings),
         |c0 AS (SELECT CAST(vec_id AS INT) AS cl,
         |              list_transform(x, v -> CAST(v AS DOUBLE)) AS c
         |       FROM e WHERE vec_id < $K),
         |d1 AS (SELECT e.vec_id, c0.cl, ${distSql("e.x", "c0.c")} AS d
         |       FROM e CROSS JOIN c0),
         |a1 AS (SELECT vec_id, cl FROM
         |        (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cl) AS rn FROM d1)
         |       WHERE rn = 1),
         |s1 AS (${sumsSql("a1")}),
         |c1 AS (SELECT cl, list(ROUND(fp / (n * 1000000.0), 6) ORDER BY i) AS c FROM s1 GROUP BY cl),
         |d2 AS (SELECT e.vec_id, c1.cl, ${distSql("e.x", "c1.c")} AS d
         |       FROM e CROSS JOIN c1),
         |a2 AS (SELECT vec_id, cl, d FROM
         |        (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cl) AS rn FROM d2)
         |       WHERE rn = 1),
         |i2 AS (SELECT cl, count(*) AS n, CAST(SUM(d) AS BIGINT) AS inertia_fp FROM a2 GROUP BY cl),
         |s2 AS (${sumsSql("a2")})
         |SELECT s2.cl AS cluster, i2.n AS n_vecs, i2.inertia_fp,
         |       CAST(s2.i AS INT) AS pos, ROUND(s2.fp / (i2.n * 1000000.0), 6) AS centroid
         |FROM s2 JOIN i2 USING (cl)
         |ORDER BY cluster, pos""".stripMargin
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q135_kmeans" -> (kmeans _)
  )
}
