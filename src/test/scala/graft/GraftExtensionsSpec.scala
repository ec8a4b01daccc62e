package graft

import org.apache.spark.sql.Row

/** The SQL registration path: graft functions must be callable from
  * spark.sql(...) strings once registered. */
class GraftExtensionsSpec extends SparkSpec {

  test("graft_l2 / graft_squared_l2 / graft_dot / graft_topk_pairs via SQL") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT graft_squared_l2(array(1.0F, 2.0F), array(1.0F, 4.0F)) AS l2sq,
        |       graft_l2(array(3.0F, 0.0F), array(0.0F, 4.0F)) AS l2,
        |       graft_dot(array(1.0F, 2.0F), array(3.0F, 4.0F)) AS dot""".stripMargin)
      .head()
    assert(r.getDouble(0) == 4.0)
    assert(r.getDouble(1) == 5.0)
    assert(r.getDouble(2) == 11.0)
    val agg = spark.sql(
      """SELECT g, graft_topk_pairs(d, id, 2) AS tk FROM VALUES
        |  (1, 0.5D, 10L), (1, 0.1D, 11L), (1, 0.9D, 12L), (2, 3.0D, 1L)
        |  AS t(g, d, id) GROUP BY g ORDER BY g""".stripMargin).collect()
    val g1 = agg(0).getSeq[Row](1)
    assert(g1.map(r2 => (r2.getDouble(0), r2.getLong(1))) == Seq((0.1, 11L), (0.5, 10L)))
    val g2 = agg(1).getSeq[Row](1)
    assert(g2.map(r2 => (r2.getDouble(0), r2.getLong(1))) == Seq((3.0, 1L)))
  }

  test("graft_co_moment via SQL matches the column API") {
    GraftExtensions.register(spark)
    val sql = spark.sql(
      """SELECT graft_co_moment(v, 2) AS m FROM VALUES
        |  (array(1.0F, -2.0F)), (array(0.5F, 0.25F)) AS t(v)""".stripMargin)
      .head().getSeq[Long](0)
    def fp(x: Double) = math.floor(x * 1e6 + 0.5).toLong
    assert(sql == Seq(2L,
      fp(1.0) + fp(0.5), fp(-2.0) + fp(0.25),
      fp(1.0) + fp(0.25), fp(-2.0) + fp(0.125), fp(4.0) + fp(0.0625)))
    val err = intercept[Exception] {
      spark.sql("SELECT graft_co_moment(v, v) FROM VALUES (array(1.0F)) AS t(v)")
    }
    assert(err.getMessage.contains("integer literal"))
  }

test("graft_kll_quantiles via SQL: exact below capacity, literal guards") {
    GraftExtensions.register(spark)
    val est = spark.sql(
      """SELECT graft_kll_quantiles(CAST(x AS DOUBLE), array(0.25D, 0.5D, 1.0D), 256) AS q
        |FROM range(1, 101) AS t(x)""".stripMargin)
      .head().getSeq[Double](0)
    assert(est == Seq(25.0, 50.0, 100.0))
    val err = intercept[Exception] {
      spark.sql("SELECT graft_kll_quantiles(CAST(id AS DOUBLE), array(0.5D), id) FROM range(3)")
    }
    assert(err.getMessage.contains("integer literal"))
  }

  test("graft_pq_adc via SQL: m byte-indexed LUT lookups") {
    GraftExtensions.register(spark)
    // m=2 subspaces, k=4: codes [1, 3] pick lut[0*4+1]=0.5 and lut[1*4+3]=2.0
    val r = spark.sql(
      """SELECT graft_pq_adc(
        |  array(CAST(1 AS TINYINT), CAST(3 AS TINYINT)),
        |  array(0.0F, 0.5F, 1.0F, 1.5F, 0.25F, 0.75F, 1.25F, 2.0F),
        |  4) AS d""".stripMargin).head()
    assert(math.abs(r.getDouble(0) - 2.5) < 1e-9)
  }

  test("graft_cosine_sim / graft_cosine_dist via SQL, zero-norm -> 0.0 similarity") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT graft_cosine_sim(array(1.0F, 0.0F), array(1.0F, 0.0F)) AS self,
        |       graft_cosine_sim(array(1.0F, 0.0F), array(0.0F, 1.0F)) AS ortho,
        |       graft_cosine_sim(array(0.0F, 0.0F), array(1.0F, 0.0F)) AS zero,
        |       graft_cosine_dist(array(1.0F, 0.0F), array(-1.0F, 0.0F)) AS opposite""".stripMargin)
      .head()
    assert(r.getDouble(0) == 1.0)
    assert(r.getDouble(1) == 0.0)
    assert(r.getDouble(2) == 0.0) // zero-norm contract (matches Metric.Cosine)
    assert(r.getDouble(3) == 2.0)
  }

  test("graft_term_hash / graft_term_hash2 via SQL match the column API (native kernel)") {
    GraftExtensions.register(spark)
    val ss = spark
    import ss.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq("the", "café", "日本語", "").toDF("s")
    df.createOrReplaceTempView("terms")
    val viaSql = spark.sql(
      "SELECT s, graft_term_hash(s) AS h1, graft_term_hash2(s) AS h2 FROM terms")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val viaCol = df.select(col("s"),
        graft.operators.TextAnalysis.termHash(col("s")),
        graft.operators.TextAnalysis.termHash2(col("s")))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(viaSql == viaCol)
    // hand-computable anchor: "ab" -> 97*31 + 98 = 3105
    assert(spark.sql("SELECT graft_term_hash('ab')").head().getLong(0) == 3105L)
  }

  test("graft_set_contains via SQL: O(1) frozen-set membership == array_contains") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT graft_set_contains('beta', array('alpha','beta','gamma')) AS hit,
        |       graft_set_contains('delta', array('alpha','beta','gamma')) AS miss,
        |       graft_set_contains(CAST(NULL AS STRING), array('a')) AS nul""".stripMargin)
      .head()
    assert(r.getBoolean(0) && !r.getBoolean(1) && r.isNullAt(2))
    // parity with array_contains over a shared column input
    val both = spark.sql(
      """SELECT t.s, graft_set_contains(t.s, array('x','y')) AS a,
        |       array_contains(array('x','y'), t.s) AS b
        |FROM VALUES ('x'), ('y'), ('z') AS t(s)""".stripMargin).collect()
    assert(both.forall(row => row.getBoolean(1) == row.getBoolean(2)))
  }

  test("graft_normalize_unicode via SQL: default NFC, explicit form, literal-only form arg") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT graft_normalize_unicode('cafe\u0301') AS nfc_default, " +
        "graft_normalize_unicode('\ufb01le', 'NFKC') AS nfkc").head()
    assert(r.getString(0) == "caf\u00e9")
    assert(r.getString(1) == "file")
    val ex = intercept[Exception] {
      spark.sql("SELECT graft_normalize_unicode('x', lower('NFC'))").collect()
    }
    assert(ex.getMessage.contains("literal"))
  }
}
