package graft.windows

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.collection.mutable.ArrayBuffer

/** XQuery-3.0-style tumbling/sliding windows (the reference's `window`
  * clause: start/end predicates over (prev, current, next, position),
  * `only` to drop windows left open at stream end).
  *
  * Cited semantics (reference `pythonql/Executor.py:496-638`):
  *   - an item where the start predicate fires opens a window —
  *     always for `sliding`, only-if-none-open for `tumbling`;
  *   - every open window accumulates every item (including the one it
  *     opened on);
  *   - each open window closes when the end predicate (evaluated with
  *     that window's start bindings and the current item's bindings)
  *     fires; the closing item is included;
  *   - at stream end, still-open windows are emitted unless
  *     `onlyEnd`.
  *
  * Spark has no built-in for this (its Window is frame-based, its
  * streaming windows time-based), so this is a custom operator:
  * shuffle once on the partition keys, sort within partitions by
  * (keys, order), then a single forward pass per partition carrying
  * only the open-window state. Nothing else materializes: memory is
  * O(open windows), not O(group), and the pass pipelines with
  * upstream/downstream stages. Window contents are emitted as an
  * array<struct> column for downstream explode/aggregation.
  */
object XQueryWindows {

  /** One item's view during the pass: the row, its 0-based position in
    * its key group, and its neighbors (None at the edges).
    */
  final case class Item(row: Row, index: Long, prev: Option[Row], next: Option[Row])

  /** @param start   open a window at this item?
    * @param end     close the window opened at `s`, at item `e`? (the
    *                closing item is part of the window)
    * @param tumbling open only when no window is open
    * @param onlyEnd  drop windows still open at end-of-group
    * @param allowSinglePartition keyless windows force ALL rows through
    *                one task (the semantics are inherently sequential
    *                over the whole stream) — a deliberate scale hazard
    *                that callers must opt into explicitly; with keys the
    *                pass parallelizes per key group
    */
  def windows(
      df: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[String],
      start: Item => Boolean,
      end: (Item, Item) => Boolean,
      tumbling: Boolean = false,
      onlyEnd: Boolean = false,
      allowSinglePartition: Boolean = false): DataFrame = {
    require(keyCols.nonEmpty || allowSinglePartition,
      "keyless XQuery windows serialize the whole stream into one task; " +
        "pass keyCols, or allowSinglePartition=true for small bounded inputs")

    val inSchema = df.schema
    val outSchema = StructType(
      keyCols.map(k => inSchema(k)) ++ Seq(
        StructField("s_idx", LongType, nullable = false),
        StructField("e_idx", LongType, nullable = false),
        StructField("window", ArrayType(inSchema, containsNull = false))))
    val keyIdx = keyCols.map(inSchema.fieldIndex)
    val shuffled =
      if (keyCols.isEmpty) df.coalesce(1).sortWithinPartitions(orderCols.map(col): _*)
      else df.repartition(keyCols.map(col): _*)
        .sortWithinPartitions((keyCols ++ orderCols).map(col): _*)

    val out = shuffled.mapPartitions { it =>
      new Iterator[Row] {
        private val in = it.buffered
        private var curKey: Seq[Any] = null
        private var index = -1L
        private var prev: Option[Row] = None
        private final class Open(val sIdx: Long, val sItem: Item) {
          val items = new ArrayBuffer[Row]()
        }
        private var open = List.empty[Open]
        private val pending = new ArrayBuffer[Row]()

        private def keyOf(r: Row): Seq[Any] = keyIdx.map(r.get)
        private def emit(o: Open, eIdx: Long): Row =
          Row.fromSeq(keyIdx.map(o.sItem.row.get) ++
            Seq(o.sIdx, eIdx, o.items.toSeq))

        private def flushGroup(): Unit = {
          if (!onlyEnd) open.reverse.foreach(o => pending += emit(o, index))
          open = Nil; index = -1L; prev = None
        }

        private def step(): Unit = {
          val row = in.next()
          val k = keyOf(row)
          if (curKey == null) curKey = k
          else if (k != curKey) { flushGroup(); curKey = k }
          index += 1
          val next = if (in.hasNext && keyOf(in.head) == curKey)
            Some(in.head) else None
          val item = Item(row, index, prev, next)
          val opens = start(item) && (!tumbling || open.isEmpty)
          if (opens) open = new Open(index, item) :: open
          open.foreach(_.items += row)
          val (closing, staying) = open.partition(o => end(o.sItem, item))
          closing.reverse.foreach(o => pending += emit(o, index))
          open = staying
          prev = Some(row)
        }

        def hasNext: Boolean = {
          while (pending.isEmpty && in.hasNext) step()
          if (pending.isEmpty && !in.hasNext && curKey != null) {
            flushGroup(); curKey = null
          }
          pending.nonEmpty
        }
        def next(): Row = { val r = pending.remove(0); r }
      }
    }(Encoders.row(outSchema))
    out
  }
}
