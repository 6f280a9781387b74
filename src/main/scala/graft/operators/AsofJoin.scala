package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, NumericType, TimestampType}

/** Backward as-of join: for each left row, the most recent right row with
  * the same key and `rightTime <= leftTime` — the time-series operator Spark
  * lacks natively (SURVEY §2.4 mapped it as a custom-operator candidate).
  *
  * Physical shape: the union trick — tag both sides, union, one shuffle by
  * key, one window sort by (time, side-tag), and `last(..., ignoreNulls)`
  * carries the latest right payload forward onto left rows. This is
  * O(n log n) per key with a single exchange for BOTH inputs, instead of the
  * range-join explosion (`left.t >= right.t` theta join) that a naive plan
  * produces — the difference between a merge pass and an O(n·m) blowup at
  * 100 TB.
  */
object AsofJoin {

  private def requireSortable(df: DataFrame, c: String, role: String): Unit =
    df.schema(c).dataType match {
      case _: NumericType | TimestampType => ()
      case other: DataType => throw new IllegalArgumentException(
        s"asof $role column '$c' must be numeric or timestamp, got " +
          s"${other.simpleString} (a lossy cast would silently corrupt the join)")
    }

  /** `rightCols` are carried onto each left row; right must be unique per
    * (key, time) — pre-aggregate it otherwise (ties on time are ambiguous in
    * every as-of engine). Inner semantics: left rows with no prior right row
    * are dropped. The right payload moves as ONE struct, so a matched left
    * row gets a consistent snapshot of a single right row even when payload
    * columns contain nulls.
    */
  def asof(left: DataFrame, right: DataFrame, leftKey: String,
      rightKey: String, leftTime: String, rightTime: String,
      rightCols: Seq[String]): DataFrame = {
    requireSortable(left, leftKey, "left key")
    requireSortable(right, rightKey, "right key")
    requireSortable(left, leftTime, "left time")
    requireSortable(right, rightTime, "right time")
    val leftCols = left.columns.toSeq
    val payloadType = org.apache.spark.sql.types.StructType(
      rightCols.map(c => right.schema(c)))
    val lTagged = left
      .withColumn("_t", col(leftTime).cast("long"))
      .withColumn("_src", lit(1))
      .select((leftCols.map(col) ++ Seq(
        lit(null).cast(payloadType).as("_payload"),
        col(leftKey).cast("long").as("_k"), col("_t"), col("_src"))): _*)
    val rTagged = right
      .withColumn("_t", col(rightTime).cast("long"))
      .withColumn("_src", lit(0))
      .select((leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++ Seq(
        struct(rightCols.map(col): _*).as("_payload"),
        col(rightKey).cast("long").as("_k"), col("_t"), col("_src"))): _*)
    // right rows sort before left rows at equal time => "<=" semantics
    val w = Window.partitionBy("_k").orderBy(col("_t"), col("_src"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lTagged.unionByName(rTagged)
      .withColumn("_payload", last(col("_payload"), ignoreNulls = true).over(w))
      .where(col("_src") === 1 && col("_payload").isNotNull)
      .select(leftCols.map(col) ++
        rightCols.map(c => col(s"_payload.$c").as(c)): _*)
  }
}
