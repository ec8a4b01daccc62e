package graft.functions

import graft.SparkSpec
import graft.functions.expressions.DeflateUtil
import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** DEFLATE compressibility signal: semantic ordering (repetitive <<
  * prose << random), determinism, bounds, and the SQL surface. The
  * byte counts themselves are a JVM-zlib contract, not cross-engine —
  * which is why q159 is rows-only. */
class CompressSpec extends SparkSpec {

  private val ss = spark
  import ss.implicits._

  private def sz(s: String): Int = DeflateUtil.size(UTF8String.fromString(s))

  test("repetitive text compresses far below prose, prose below random") {
    val repetitive = "spam spam spam spam " * 50
    val prose = "the quick brown fox jumps over the lazy dog and then " +
      "wanders through a field of late summer barley toward the river " * 8
    val rnd = new scala.util.Random(7)
    val noise = (0 until 800).map(_ => (rnd.nextInt(94) + 33).toChar).mkString
    def ratio(s: String) = sz(s).toDouble / s.getBytes("UTF-8").length
    assert(ratio(repetitive) < 0.1, s"repetitive ratio ${ratio(repetitive)}")
    assert(ratio(prose) > ratio(repetitive) && ratio(prose) < 0.7)
    assert(ratio(noise) > 0.8, s"noise ratio ${ratio(noise)}")
  }

  test("deterministic across calls and threads; positive and bounded") {
    val s = "abcabcabc some text 12345"
    val first = sz(s)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val parallel = Await.result(
      Future.sequence((0 until 64).map(_ => Future(sz(s)))), 30.seconds).toSet
    assert(parallel == Set(first))
    // deflate of n bytes is > 0 and < n + small framing overhead
    assert(first > 0 && first <= s.getBytes("UTF-8").length + 11)
  }

  test("column + SQL surface: null safe, matches direct kernel calls") {
    graft.GraftExtensions.register(spark)
    val df = Seq(Some("aaaaaaaaaaaaaaaaaaaa"), Some("xq9!k"), None).toDF("t")
    val viaCol = df.select(TextAnalysis.deflateSize(col("t"))).collect()
    assert(viaCol(0).getInt(0) == sz("aaaaaaaaaaaaaaaaaaaa"))
    assert(viaCol(1).getInt(0) == sz("xq9!k"))
    assert(viaCol(2).isNullAt(0))
    df.createOrReplaceTempView("cmp_t")
    val viaSql = spark.sql("SELECT graft_deflate_size(t) FROM cmp_t").collect()
    assert(viaSql.map(r => if (r.isNullAt(0)) -1 else r.getInt(0)).toSeq ==
      viaCol.map(r => if (r.isNullAt(0)) -1 else r.getInt(0)).toSeq)
  }
}
