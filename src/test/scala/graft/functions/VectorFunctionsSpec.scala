package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The native codegen kernels and the bounded-heap top-k aggregate
  * must be BIT-IDENTICAL to the HOF / window formulations — the DuckDB
  * oracle contract depends on it. */
class VectorFunctionsSpec extends SparkSpec {

  private def embeddings = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
    .select(col("vec_id").as("id"), col("embedding").as("vec"))

  test("native SquaredL2/Dot kernels are bit-identical to the HOF formulation") {
    val q = embeddings.filter(col("id") < 5)
      .select(col("id").as("qid"), col("vec").as("qvec"))
    val pairs = embeddings.crossJoin(broadcast(q))
    val diff = pairs.select(
        VectorFunctions.squaredEuclidean(col("qvec"), col("vec")).as("native_l2"),
        VectorFunctions.squaredEuclideanHof(col("qvec"), col("vec")).as("hof_l2"),
        VectorFunctions.dot(col("qvec"), col("vec")).as("native_dot"),
        VectorFunctions.dotHof(col("qvec"), col("vec")).as("hof_dot"))
      .filter(col("native_l2") =!= col("hof_l2") || col("native_dot") =!= col("hof_dot"))
    assert(diff.count() == 0)
  }

  test("Int8AdcSquaredL2 kernel is bit-identical to the interpreted HOF it replaced") {
    import org.apache.spark.sql.graft.{ColumnBridge => CB}
    val scales = graft.operators.Similarity.int8Scales(
      embeddings.withColumnRenamed("vec", "embedding"))
    val t = scales.map(_ / 127.0)
    val tArr = array(t.map(lit): _*)
    val dim = scales.length
    val q = embeddings.filter(col("id") < 5)
      .select(col("id").as("qid"), col("vec").as("qvec"))
    val pairs = embeddings
      .select(col("id"),
        graft.operators.Similarity.int8Codes(col("vec"), scales).as("codes"))
      .crossJoin(broadcast(q))
    val hof = aggregate(sequence(lit(1), lit(dim)), lit(0.0), (acc, i) => {
      val d = element_at(col("qvec"), i).cast("double") -
        element_at(col("codes"), i) * element_at(tArr, i)
      acc + d * d
    })
    val native = CB.column(graft.functions.expressions.Int8AdcSquaredL2(
      CB.expression(col("qvec")), CB.expression(col("codes")), t.toArray))
    val diff = pairs.select(native.as("n"), hof.as("h")).filter(col("n") =!= col("h"))
    assert(diff.count() == 0)
    // dimension mismatch errors instead of truncating
    val bad = pairs.select(CB.column(graft.functions.expressions.Int8AdcSquaredL2(
      CB.expression(slice(col("qvec"), 1, 3)), CB.expression(col("codes")), t.toArray)))
    val e = intercept[Exception] { bad.collect() }
    assert(e.getMessage != null)
  }

  test("topKPairs aggregate matches window row_number top-k exactly") {
    val q = embeddings.filter(col("id") < 7)
      .select(col("id").as("qid"), col("vec").as("qvec"))
    val scored = embeddings.crossJoin(broadcast(q))
      .select(col("qid"), col("id").as("nid"),
        VectorFunctions.euclidean(col("qvec"), col("vec")).as("dist"))
      .cache()
    val k = 12
    val viaAgg = scored.groupBy(col("qid"))
      .agg(VectorFunctions.topKPairs(col("dist"), col("nid"), k).as("tk"))
      .select(col("qid"), posexplode(col("tk")).as(Seq("pos", "p")))
      .select(col("qid"), col("p.id").as("nid"), col("p.dist").as("dist"),
        (col("pos") + 1).as("rnk"))
    val w = Window.partitionBy(col("qid")).orderBy(col("dist"), col("nid"))
    val viaWindow = scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
      .select(col("qid"), col("nid"), col("dist"), col("rnk").cast("long").as("rnk"))
    assert(viaAgg.exceptAll(viaWindow).count() == 0)
    assert(viaWindow.exceptAll(viaAgg).count() == 0)
    assert(viaAgg.count() == 7L * k)
  }

  test("topKPairs handles groups smaller than k and merge across partitions") {
    val ss = spark
    import ss.implicits._
    val df = Seq((1L, 0.5, 10L), (1L, 0.5, 9L), (1L, 0.1, 11L), (2L, 3.0, 1L))
      .toDF("g", "dist", "id").repartition(8)
    val res = df.groupBy(col("g"))
      .agg(VectorFunctions.topKPairs(col("dist"), col("id"), 2).as("tk"))
      .orderBy(col("g")).collect()
    val g1 = res(0).getSeq[org.apache.spark.sql.Row](1)
    assert(g1.map(r => (r.getDouble(0), r.getLong(1))) == Seq((0.1, 11L), (0.5, 9L)))
    val g2 = res(1).getSeq[org.apache.spark.sql.Row](1)
    assert(g2.map(r => (r.getDouble(0), r.getLong(1))) == Seq((3.0, 1L)))
  }

  test("topKPairsDistinct dedups repeated (dist, id) pairs across partitions") {
    val ss = spark
    import ss.implicits._
    // same candidate arrives from many frontier nodes: plain top-k
    // would fill the heap with copies; distinct keeps one per id
    val df = Seq.tabulate(40)(i => (1L, (i % 4) * 1.0, (i % 4).toLong + 100L))
      .toDF("g", "dist", "id").repartition(8)
    val res = df.groupBy(col("g"))
      .agg(VectorFunctions.topKPairsDistinct(col("dist"), col("id"), 3).as("tk"))
      .select(explode(col("tk")).as("p")).select(col("p.dist"), col("p.id")).collect()
    assert(res.map(r => (r.getDouble(0), r.getLong(1))).toSeq ==
      Seq((0.0, 100L), (1.0, 101L), (2.0, 102L)))
  }

  test("distance kernels error on dimension mismatch instead of truncating") {
    val ss = spark
    import ss.implicits._
    val df = Seq((Array(1f, 2f, 3f), Array(1f, 2f))).toDF("a", "b")
    def messageChain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).map(e => String.valueOf(e.getMessage)).toSeq
    val e1 = intercept[Throwable] {
      df.select(VectorFunctions.squaredEuclidean(col("a"), col("b"))).collect()
    }
    assert(messageChain(e1).exists(_.contains("dimension mismatch")))
    val e2 = intercept[Throwable] {
      df.select(VectorFunctions.dot(col("a"), col("b"))).collect()
    }
    assert(messageChain(e2).exists(_.contains("dimension mismatch")))
  }

  test("topKPairs coerces FLOAT dist / INT id at analysis time (no runtime CCE)") {
    val ss = spark
    import ss.implicits._
    val df = Seq((1, 1.5f, 10), (1, 0.5f, 20)).toDF("g", "d", "i")
    val out = df.groupBy(col("g"))
      .agg(VectorFunctions.topKPairs(col("d"), col("i"), 1).as("tk"))
      .select(explode(col("tk")).as("p"))
      .select(col("p.dist"), col("p.id")).collect()
    assert(out.length == 1)
    assert(out(0).getDouble(0) == 0.5 && out(0).getLong(1) == 20L)
  }
}
