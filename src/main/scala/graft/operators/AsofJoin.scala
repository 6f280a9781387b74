package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, NumericType, TimestampType}

/** As-of join in all three directions (the `merge_asof` surface): for each
  * left row, the right row with the same key and
  *  - `backward`: the most recent right time `<=` left time (default);
  *  - `forward`: the earliest right time `>=` left time;
  *  - `nearest`: whichever of the two is closer in time (exact tie →
  *    backward, the deterministic canonical choice).
  * The time-series operator Spark lacks natively (SURVEY §2.4 mapped it as
  * a custom-operator candidate).
  *
  * Physical shape: the union trick — tag both sides, union, one shuffle by
  * key, one window sort by (time, side-tag), and `last(..., ignoreNulls)`
  * (resp. `first` over the following frame) carries the right payload onto
  * left rows. This is O(n log n) per key with a single exchange for BOTH
  * inputs, instead of the range-join explosion (`left.t >= right.t` theta
  * join) that a naive plan produces — the difference between a merge pass
  * and an O(n·m) blowup at 100 TB. `nearest` runs both window frames over
  * the SAME exchange (only the sort differs), so it still shuffles each
  * input exactly once.
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
    * every as-of engine). Inner semantics: left rows with no matching right
    * row in the chosen direction are dropped. The right payload moves as ONE
    * struct, so a matched left row gets a consistent snapshot of a single
    * right row even when payload columns contain nulls.
    *
    * `tolerance` (merge_asof parity — verdict r11 #6): maximum allowed
    * |left time − matched right time| in the time column's long units
    * (seconds for timestamps); a match beyond it counts as NO match. An
    * unbounded backward match is wrong for most attribution jobs (an event
    * "caused by" a promotion three years prior), which is why
    * q_funnel_steps hand-rolled its own 24 h bound before the operator
    * owned one. For `nearest`, the bound gates EACH direction before the
    * closer-of-the-two choice (pandas semantics: an out-of-tolerance
    * backward candidate loses to an in-tolerance forward one). Same plan
    * shape — the gate is a scalar predicate over the already-carried
    * `_rt`, no extra exchange. */
  def asof(left: DataFrame, right: DataFrame, leftKey: String,
      rightKey: String, leftTime: String, rightTime: String,
      rightCols: Seq[String], direction: String = "backward",
      tolerance: Option[Long] = None): DataFrame = {
    require(Seq("backward", "forward", "nearest").contains(direction),
      s"asof direction must be backward|forward|nearest, got '$direction'")
    require(tolerance.forall(_ >= 0L),
      s"asof tolerance must be >= 0, got ${tolerance.get}")
    requireSortable(left, leftKey, "left key")
    requireSortable(right, rightKey, "right key")
    requireSortable(left, leftTime, "left time")
    requireSortable(right, rightTime, "right time")
    val leftCols = left.columns.toSeq
    // the matched right TIME rides inside the payload struct so `nearest`
    // can compare distances without a second lookup
    val payloadType = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("_rt",
        org.apache.spark.sql.types.LongType) +: rightCols.map(c => right.schema(c)))
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
        struct(col(rightTime).cast("long").as("_rt") +: rightCols.map(col): _*)
          .as("_payload"),
        col(rightKey).cast("long").as("_k"), col("_t"), col("_src"))): _*)
    // backward frame: right rows sort BEFORE left at equal time => "<=";
    // forward frame: right rows sort AFTER left at equal time => ">="
    val wB = Window.partitionBy("_k").orderBy(col("_t"), col("_src"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy("_k").orderBy(col("_t"), col("_src").desc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val unioned = lTagged.unionByName(rTagged)
    // the tolerance gates: a candidate farther than tol in its direction
    // becomes null, exactly as if no right row existed there — applied to
    // the WINDOW RESULT, which is valid because the windowed candidate is
    // the closest one in its direction (any other is farther still)
    def gateB(c: Column): Column =
      tolerance.fold(c)(t => when(col("_t") - c.getField("_rt") <= t, c))
    def gateF(c: Column): Column =
      tolerance.fold(c)(t => when(c.getField("_rt") - col("_t") <= t, c))
    val withPick: DataFrame = direction match {
      case "backward" =>
        unioned.withColumn("_pick",
          gateB(last(col("_payload"), ignoreNulls = true).over(wB)))
      case "forward" =>
        unioned.withColumn("_pick",
          gateF(first(col("_payload"), ignoreNulls = true).over(wF)))
      case "nearest" =>
        val pb = gateB(last(col("_payload"), ignoreNulls = true).over(wB))
        val pf = gateF(first(col("_payload"), ignoreNulls = true).over(wF))
        unioned
          .withColumn("_pb", pb).withColumn("_pf", pf)
          .withColumn("_pick",
            when(col("_pf").isNull, col("_pb"))
              .when(col("_pb").isNull, col("_pf"))
              .when(col("_t") - col("_pb._rt") <= col("_pf._rt") - col("_t"),
                col("_pb"))
              .otherwise(col("_pf")))
    }
    withPick
      .where(col("_src") === 1 && col("_pick").isNotNull)
      .select(leftCols.map(col) ++
        rightCols.map(c => col(s"_pick.$c").as(c)): _*)
  }
}
