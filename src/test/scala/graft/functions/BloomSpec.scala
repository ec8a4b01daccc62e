package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

import graft.SparkSpec
import graft.functions.expressions.BloomBuffer
import graft.operators.Dedup

/** Bloom membership sketch ([[SketchFunctions.bloomAgg]] /
  * [[SketchFunctions.bloomContains]]) and the pruned joins built on it
  * ([[Dedup.bloomPrunedSemiJoin]] / [[Dedup.bloomPrunedAntiJoin]]):
  * the no-false-negative contract, the sized fp band, OR-merge
  * partition invariance, exact join parity (fp rescued), null-key
  * anti-join semantics, and the SQL surface. */
class BloomSpec extends SparkSpec {

  private val ss = spark
  import ss.implicits._

  private def buildFilter(keys: Seq[String], fpp: Double, parts: Int = 4): Array[Byte] = {
    val bits = BloomBuffer.optimalNumBits(keys.size.toLong, fpp)
    val k = BloomBuffer.optimalNumHashes(keys.size.toLong, bits)
    keys.toDF("s").repartition(parts)
      .agg(SketchFunctions.bloomAgg(col("s"), bits, k)).head.getAs[Array[Byte]](0)
  }

  test("no false negatives: every inserted key probes true") {
    val keys = (0 until 2000).map(i => s"url-$i")
    val bytes = buildFilter(keys, fpp = 0.01)
    val misses = keys.toDF("s")
      .filter(!SketchFunctions.bloomContains(lit(bytes), col("s"))).count()
    assert(misses == 0L)
  }

  test("false-positive rate stays near the sized fpp") {
    val keys = (0 until 2000).map(i => s"member-$i")
    val bytes = buildFilter(keys, fpp = 0.03)
    val probes = (0 until 20000).map(i => s"outsider-$i")
    val fp = probes.toDF("s")
      .filter(SketchFunctions.bloomContains(lit(bytes), col("s"))).count()
    val rate = fp.toDouble / probes.size
    assert(rate < 0.09, s"fp rate $rate vs sized 0.03") // 3x head-room
  }

  test("build is partition-invariant and duplicate-insensitive (OR merge)") {
    val keys = (0 until 3000).map(i => s"k-$i")
    val one = buildFilter(keys, fpp = 0.01, parts = 1)
    val many = buildFilter(keys, fpp = 0.01, parts = 13)
    val dup = buildFilter(keys ++ keys ++ keys.take(500), fpp = 0.01, parts = 7)
    assert(java.util.Arrays.equals(one, many))
    // same value set at the same sizing n: duplicates set the same bits
    val bitsSame = BloomBuffer.optimalNumBits(keys.size.toLong, 0.01)
    val kSame = BloomBuffer.optimalNumHashes(keys.size.toLong, bitsSame)
    val dupSameShape = (keys ++ keys).toDF("s").repartition(5)
      .agg(SketchFunctions.bloomAgg(col("s"), bitsSame, kSame)).head.getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(one, dupSameShape))
    assert(dup.length >= one.length) // larger n sizes a larger filter
  }

  test("bloomPrunedSemiJoin == plain semi join (false positives removed)") {
    val corpus = (1L to 5000L).map(i => (i, s"key-${i % 700}")).toDF("id", "h")
    val block = (0 until 50).map(i => s"key-${i * 7}").toDF("h")
    // fpp 0.5: tiny filter, false positives guaranteed to occur —
    // the exact-confirm stage must remove every one of them
    val pruned = Dedup.bloomPrunedSemiJoin(corpus, block, "h", fpp = 0.5)
      .select("id").collect().map(_.getLong(0)).sorted
    val plain = corpus.join(block, Seq("h"), "left_semi")
      .select("id").collect().map(_.getLong(0)).sorted
    assert(pruned.toSeq == plain.toSeq && plain.nonEmpty)
  }

  test("bloomPrunedAntiJoin == plain anti join; null keys ride the clean leg") {
    val corpus = ((1L to 4000L).map(i => (i, s"key-${i % 900}")) ++
      Seq((9001L, null: String), (9002L, null: String)))
      .toDF("id", "h")
    val block = (0 until 80).map(i => s"key-${i * 11}").toDF("h")
    val pruned = Dedup.bloomPrunedAntiJoin(corpus, block, "h", fpp = 0.5)
      .select("id").collect().map(_.getLong(0)).sorted
    val plain = corpus.join(block, Seq("h"), "left_anti")
      .select("id").collect().map(_.getLong(0)).sorted
    assert(pruned.toSeq == plain.toSeq)
    assert(pruned.contains(9001L) && pruned.contains(9002L)) // nulls kept
  }

  test("empty blocklist: semi empty, anti returns the whole corpus") {
    val corpus = (1L to 100L).map(i => (i, s"k-$i")).toDF("id", "h")
    val block = Seq.empty[String].toDF("h")
    assert(Dedup.bloomPrunedSemiJoin(corpus, block, "h").count() == 0L)
    assert(Dedup.bloomPrunedAntiJoin(corpus, block, "h").count() == 100L)
  }

  test("semi-join plan: probe filters the scan BEFORE the join; build is partial-agg") {
    // parquet-backed corpus: over a LocalRelation the optimizer folds
    // the probe into the scan, which hides the filter it should assert
    val dir = tmpDir("bloom-plan")
    (1L to 8000L).map(i => (i, s"key-${i % 997}")).toDF("id", "h")
      .write.mode("overwrite").parquet(s"$dir/corpus")
    val corpus = spark.read.parquet(s"$dir/corpus")
    val block = (0 until 200).map(i => s"key-$i").toDF("h")
    val out = Dedup.bloomPrunedSemiJoin(corpus, block, "h", fpp = 0.01)
    out.collect()
    // the probe expression must appear in the executed plan's filters
    val hasProbe = collectPlanNodes(out) {
      case f: org.apache.spark.sql.execution.FilterExec
          if f.condition.exists(_.isInstanceOf[
            graft.functions.expressions.BloomMightContain]) => f
    }
    assert(hasProbe.nonEmpty, "bloom probe should be a scan-side FilterExec")
    // the build side aggregate plans with a partial stage (map-side OR)
    val build = (0 until 5000).map(i => s"b-$i").toDF("s").repartition(6)
      .agg(SketchFunctions.bloomAgg(col("s"), 65536, 7))
    build.head
    val partials = collectPlanNodes(build) {
      case a: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec
          if a.aggregateExpressions.exists(_.mode ==
            org.apache.spark.sql.catalyst.expressions.aggregate.Partial) => a
    }
    assert(partials.nonEmpty, "bloom build should partial-aggregate map-side")
  }

  test("SQL surface: graft_bloom_agg + graft_bloom_contains round-trip") {
    graft.GraftExtensions.register(spark)
    (0 until 500).map(i => s"t-$i").toDF("s").createOrReplaceTempView("bloom_in")
    val bytes = spark.sql("SELECT graft_bloom_agg(s, 8192, 7) FROM bloom_in")
      .head.getAs[Array[Byte]](0)
    spark.sql("SELECT 1").selectExpr("1").createOrReplaceTempView("dual_x")
    val probe = Seq("t-17", "definitely-not-there-xyzzy").toDF("s")
    probe.createOrReplaceTempView("bloom_probe")
    val rows = spark.sql(
      s"SELECT s, graft_bloom_contains(unhex('${bytes.map("%02x".format(_)).mkString}'), s) AS hit " +
        "FROM bloom_probe ORDER BY s").collect()
    val hit = rows.map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(hit("t-17")) // no false negatives
  }

  test("non-foldable filter column is rejected at analysis time") {
    val df = Seq(("a", Array[Byte](1, 2))).toDF("s", "f")
    val ex = intercept[Exception] {
      df.select(SketchFunctions.bloomContains(col("f"), col("s"))).collect()
    }
    assert(ex.getMessage.contains("foldable"), s"unexpected: ${ex.getMessage}")
  }
}
