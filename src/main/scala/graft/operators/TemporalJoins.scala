package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark lacks as built-ins: as-of join and
  * point-in-interval join. Both are implemented in the shape that
  * survives 100 TB — a bounded number of equi-shuffles, never a
  * quadratic range join.
  *
  * (The reference engine has no temporal operators; these belong to the
  * north-star pipeline surface in BASELINE.json — event/feature
  * alignment for training-data assembly.)
  */
object TemporalJoins {

  /** As-of join: for every left row, attach the payload of the single
    * most recent right row with `right.ts <= left.ts` within the same
    * key (NULLs when no prior right row exists).
    *
    * Implementation is the union + single-window pass, NOT a range
    * join: tag both sides, sort each key partition by (ts, side) with
    * right rows first on ties (<= semantics), and carry the latest
    * right payload forward with last(ignoreNulls). One shuffle on the
    * key and an O(n log n) partition sort — hot keys degrade
    * log-linearly, where the naive `left.ts >= right.ts` join form
    * explodes quadratically.
    *
    * Right rows must be unique per (key, ts) — pre-aggregate to pick a
    * deterministic winner first (the window's tie order among equal
    * right rows is otherwise unspecified).
    *
    * @param left      point-in-time rows; all columns are preserved
    * @param right     versioned rows to look up
    * @param key       equi-join column name present on both sides
    * @param leftTs    left ordering column (numeric, e.g. epoch millis)
    * @param rightTs   right ordering column, same unit
    * @param payload   right columns to carry; emitted as `asof_<name>`
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    require(!payload.contains(key), "payload must not repeat the key")
    // __t/__side/__p are internal layout names; a caller column with
    // one of these names would silently alias into the window pass
    val reserved = Set("__t", "__side", "__p")
    val collisions = (leftCols ++ right.columns).filter(reserved.contains).distinct
    require(collisions.isEmpty,
      s"asofJoin reserves column names ${reserved.mkString(", ")}; " +
        s"rename input column(s) ${collisions.mkString(", ")}")
    // ts columns must be integral: the cross-side ordering runs on
    // cast-to-long values, and a silent cast from timestamp (seconds!)
    // or double would TRUNCATE sub-unit ordering and mis-match rows.
    // Callers convert timestamps explicitly (e.g. epoch millis/micros).
    locally {
      import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType}
      val integral: Set[DataType] = Set(ByteType, ShortType, IntegerType, LongType)
      Seq(left.schema(leftTs).dataType -> leftTs, right.schema(rightTs).dataType -> rightTs)
        .foreach { case (dt, name) =>
          require(integral.contains(dt),
            s"asofJoin ts column '$name' must be integral (epoch units), got ${dt.simpleString}")
        }
    }
    val leftTsType = left.schema(leftTs).dataType
    val leftTypes = leftCols.map(c => c -> left.schema(c).dataType).toMap
    // the payload is carried as ONE struct, not per-column last()s: a
    // NULL field in the newest right row must stay NULL (per-column
    // ignoreNulls would backfill it from an OLDER row — a torn row
    // mixing values that never co-existed). The struct itself is
    // non-null exactly when a right row exists.
    val payloadStructType = org.apache.spark.sql.types.StructType(
      payload.map(c => org.apache.spark.sql.types.StructField(c, right.schema(c).dataType)))
    // common layout: key, __t, __side, <left cols minus key/ts>, __p
    val carriedLeft = leftCols.filterNot(c => c == key || c == leftTs)
    val lU = left.select(
      (col(key) +: col(leftTs).cast("long").as("__t") +: lit(1).as("__side") +:
        carriedLeft.map(col)) :+
        lit(null).cast(payloadStructType).as("__p"): _*)
    val rU = right.select(
      (col(key) +: col(rightTs).cast("long").as("__t") +: lit(0).as("__side") +:
        carriedLeft.map(c => lit(null).cast(leftTypes(c)).as(c))) :+
        struct(payload.map(col): _*).as("__p"): _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = lU.unionByName(rU)
      .select((col(key) +: col("__t") +: col("__side") +: carriedLeft.map(col)) :+
        last(col("__p"), ignoreNulls = true).over(w).as("__p"): _*)
    // restore the caller's ts type — __t was coerced to long for the
    // cross-side ordering, but the output column is the caller's
    carried.filter(col("__side") === 1)
      .select((col(key) +: col("__t").cast(leftTsType).as(leftTs) +: carriedLeft.map(col)) ++
        payload.map(c => col(s"__p.$c").as(s"asof_$c")): _*)
  }

  /** Point-in-interval join: pairs every point row with every interval
    * row of the same key whose [start, end] range contains the point.
    *
    * Implementation is bucket expansion: each interval explodes to the
    * time buckets it covers (bounded when `bucketWidth` ~ the typical
    * interval length), each point maps to exactly one bucket, and the
    * pairing becomes an equi-join on (key, bucket) + an exact range
    * filter. A point's bucket is covered at most once per interval, so
    * no post-join dedup is needed. This is the standard scalable form:
    * shuffle volume is O(points + intervals · buckets_per_interval),
    * while a raw BETWEEN theta-join degenerates to per-key cross
    * products.
    *
    * @param points      rows with a `pointTs` instant (numeric)
    * @param intervals   rows with [`startTs`, `endTs`] inclusive bounds
    * @param key         equi-join column name present on both sides
    * @param bucketWidth bucket size in the ts unit; choose close to the
    *                    typical interval length (expansion factor =
    *                    len/bucketWidth + 1)
    */
  /** Exact floor-division in LONG arithmetic: `floor(col/width)` via
    * doubles silently mis-buckets magnitudes above 2^53 (epoch nanos),
    * which would DROP matches at the equi-join — the same trap the
    * engine's epoch-ms helpers avoid with integer `div`. pmod is
    * always non-negative, so this is floor (not truncate) for any
    * sign. */
  private def floorDivCol(c: org.apache.spark.sql.Column, w: Long) = {
    val l = c.cast("long")
    ((l - pmod(l, lit(w))).cast("decimal(38,0)") / w).cast("long")
  }

  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      key: String,
      pointTs: String,
      startTs: String,
      endTs: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val iv = intervals.withColumn("__b",
      explode(sequence(
        floorDivCol(col(startTs), bucketWidth),
        floorDivCol(col(endTs), bucketWidth))))
    val pt = points.withColumn("__b", floorDivCol(col(pointTs), bucketWidth))
    pt.join(iv, Seq(key, "__b"))
      .filter(col(pointTs).between(col(startTs), col(endTs)))
      .drop("__b")
  }
}
