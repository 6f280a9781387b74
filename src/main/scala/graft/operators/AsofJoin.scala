package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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

  /** `rightCols` are carried onto each left row; right must be unique per
    * (key, time) — pre-aggregate it otherwise (ties on time are ambiguous in
    * every as-of engine). Inner semantics: left rows with no prior right row
    * are dropped.
    */
  def asof(left: DataFrame, right: DataFrame, leftKey: String,
      rightKey: String, leftTime: String, rightTime: String,
      rightCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val lTagged = left
      .withColumn("_t", col(leftTime).cast("long"))
      .withColumn("_src", lit(1))
      .select((leftCols.map(col) ++
        rightCols.map(c => lit(null).cast(right.schema(c).dataType).as(c)) ++
        Seq(col(leftKey).cast("long").as("_k"), col("_t"), col("_src"))): _*)
    val rTagged = right
      .withColumn("_t", col(rightTime).cast("long"))
      .withColumn("_src", lit(0))
      .select((leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightCols.map(col) ++
        Seq(col(rightKey).cast("long").as("_k"), col("_t"), col("_src"))): _*)
    // right rows sort before left rows at equal time => "<=" semantics
    val w = Window.partitionBy("_k").orderBy(col("_t"), col("_src"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightCols.foldLeft(lTagged.unionByName(rTagged)) {
      case (df, c) => df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    carried.where(col("_src") === 1 && col(rightCols.head).isNotNull)
      .select((leftCols ++ rightCols).map(col): _*)
  }
}
