package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators: backward as-of join and banded time-range
  * join. Spark has no native operator for either; the naive spellings
  * (a range-predicate join, or `max(ts) where ts <= t` per row) plan as
  * broadcast-nested-loop / per-row subqueries and die at scale. Both
  * operators here reduce to ONE hash exchange plus scan-local work, so
  * they survive a 1000-executor corpus.
  *
  * Time columns must be NON-NEGATIVE INTEGRAL epochs (convert
  * timestamps with `unix_millis` first): tolerance/window arithmetic is
  * integer, and a raw TIMESTAMP cast to long would silently become
  * epoch-seconds.
  */
object TemporalJoins {

  /** Backward as-of join: each left row picks up the value columns of
    * the latest right row with the same key and `right.ts <= left.ts`
    * (inclusive), or nulls if none (or none within `toleranceMs`).
    *
    * REQUIREMENT: the right side must be unique per (key, ts) — with
    * two right rows at the same instant "the latest" is ill-defined;
    * pre-aggregate (as q68 does) to make it total. Left duplicates are
    * fine.
    *
    * Implementation is the union-tag trick, not a join: tag left rows
    * side=1 and right rows side=0, union, and carry
    * `last(right_payload, ignoreNulls)` over a window partitioned by
    * key, ordered by (ts, side) — right-before-left at equal ts gives
    * the inclusive bound. One shuffle on the key (what any sort-merge
    * join would pay) and a partition-local sort; no range predicate
    * ever reaches the optimizer, so there is no nested-loop risk. The
    * same shape is the standard scale answer in kdb/Flink lore; at
    * 1000 executors the only pressure point is key skew, which AQE
    * splits like any other exchange.
    */
  def asofBackward(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      toleranceMs: Option[Long] = None): DataFrame =
    asof(left, right, keyCols, tsCol, toleranceMs, forward = false)

  /** Forward as-of join: each left row picks up the value columns of
    * the EARLIEST right row with the same key and `right.ts >= left.ts`
    * (inclusive), or nulls if none (or none within `toleranceMs`) —
    * the "next event after" direction (e.g. first purchase after a
    * click). Same uniqueness requirement and union-tag plan shape as
    * [[asofBackward]], mirrored: the carried column is
    * `first(payload)` over the FOLLOWING window frame, with right
    * rows sorting after left rows at equal ts so the inclusive bound
    * holds.
    */
  def asofForward(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      toleranceMs: Option[Long] = None): DataFrame =
    asof(left, right, keyCols, tsCol, toleranceMs, forward = true)

  private def asof(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      toleranceMs: Option[Long],
      forward: Boolean): DataFrame = {
    val rightVals = right.columns.filterNot(c => keyCols.contains(c) || c == tsCol)
    require(rightVals.nonEmpty, "right side has no value columns")
    val clash = rightVals.toSet.intersect(left.columns.toSet)
    require(clash.isEmpty, s"right value columns collide with left: $clash")

    // Left/right sort order at equal ts decides inclusivity: backward
    // carries last(...) up to the current row, so the right row must
    // sort BEFORE the left one; forward carries first(...) from the
    // current row on, so it must sort AFTER.
    val (lSide, rSide) = if (forward) (0, 1) else (1, 0)

    // carried payload: right ts (for tolerance) + right value columns
    val rPayload = struct(col(tsCol).cast("long").as("_rt") +: rightVals.map(col): _*)
    val rPayloadType = right.select(rPayload.as("_r")).schema("_r").dataType

    val lTagged = left.select(
      keyCols.map(col) ++ Seq(
        col(tsCol).cast("long").as("_t"), lit(lSide).as("_side"),
        struct(left.columns.map(col): _*).as("_l"),
        lit(null).cast(rPayloadType).as("_r")): _*)
    val rTagged = right.select(
      keyCols.map(col) ++ Seq(
        col(tsCol).cast("long").as("_t"), lit(rSide).as("_side"),
        lit(null).cast(lTagged.schema("_l").dataType).as("_l"),
        rPayload.as("_r")): _*)

    val ordered = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col("_t").asc, col("_side").asc)
    val carried =
      if (forward)
        first(col("_r"), ignoreNulls = true)
          .over(ordered.rowsBetween(Window.currentRow, Window.unboundedFollowing))
      else
        last(col("_r"), ignoreNulls = true)
          .over(ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow))

    val dist =
      if (forward) carried("_rt") - col("_t") else col("_t") - carried("_rt")
    val inReach = toleranceMs match {
      case Some(tol) => carried.isNotNull && dist <= tol
      case None      => carried.isNotNull
    }
    lTagged.unionByName(rTagged)
      .withColumn("_c", when(inReach, carried))
      .filter(col("_side") === lSide)
      .select(col("_l.*") +: rightVals.map(v => col("_c")(v).as(v)): _*)
  }

  /** Banded time-range join: all (left, right) pairs with equal keys
    * and |left.ts − right.ts| ≤ `windowMs`.
    *
    * A plain `abs(l.ts - r.ts) <= w` join predicate gives Spark a
    * non-equi condition: sort-merge on the key alone (every pair per
    * key compared — quadratic in hot keys) or nested-loop without one.
    * Banding restores an equi-join: each right row lands in time
    * bucket floor(ts/w); each left row is replicated to its own bucket
    * ±1 (any right row within w is in one of those three). The join is
    * then hash on (key, bucket) — 3× left replication buys a plan that
    * partitions by time as well as key, so a hot key's pairs are
    * spread across buckets instead of serialized through one task.
    * Each qualifying pair matches in exactly one bucket (the right
    * row's own), so no post-join dedup is needed.
    */
  def bandedTimeJoin(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTsCol: String,
      rightTsCol: String,
      windowMs: Long): DataFrame = {
    require(windowMs > 0, s"windowMs=$windowMs")
    val clash = left.columns.toSet.intersect(right.columns.toSet) -- keyCols
    require(clash.isEmpty,
      s"non-key columns present on both sides (rename first): $clash")
    val lb = (col(leftTsCol).cast("long") / lit(windowMs)).cast("long")
    val lBanded = left.withColumn("_b",
      explode(array(lb - 1, lb, lb + 1)))
    val rBanded = right.withColumn("_b",
      (col(rightTsCol).cast("long") / lit(windowMs)).cast("long"))
    lBanded
      .join(rBanded, keyCols :+ "_b")
      .filter(abs(col(leftTsCol).cast("long") - col(rightTsCol).cast("long"))
        <= windowMs)
      .drop("_b")
  }
}
