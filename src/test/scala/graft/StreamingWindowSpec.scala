package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamWindows
import graft.windows.XQueryWindows

/** Streaming XQuery windows: state survives micro-batch boundaries,
  * and the closed-window set matches the batch operator run on the
  * same data (modulo the documented streaming deltas: only-end, no
  * next lookahead).
  */
case class Ev(user: String, seq: Long, v: Int)
case class EvT(user: String, seq: Long, ts: java.sql.Timestamp, v: Int)

object StreamingWindowSpecFns {
  // sliding windows: open when v is even, close at index span >= 2
  def startP(e: Ev, prev: Option[Ev], idx: Long): Boolean = e.v % 2 == 0
  def endP(s: (Ev, Long), c: (Ev, Long)): Boolean = c._2 - s._2 >= 2
  def keyOf(e: Ev): String = e.user
  def orderOf(e: Ev): Long = e.seq

  def startT(e: EvT, prev: Option[EvT], idx: Long): Boolean = e.v % 2 == 0
  def endT(s: (EvT, Long), c: (EvT, Long)): Boolean = c._2 - s._2 >= 2
  def keyT(e: EvT): String = e.user
  def orderT(e: EvT): Long = e.seq
  def etT(e: EvT): Long = e.ts.getTime
}

class StreamingWindowSpec extends SparkSpec {
  import spark.implicits._
  import StreamingWindowSpecFns._

  private val batch1 = Seq(Ev("u1", 0, 2), Ev("u1", 1, 3), Ev("u2", 0, 4))
  private val batch2 = Seq(Ev("u1", 2, 5), Ev("u1", 3, 6), Ev("u2", 1, 1),
    Ev("u2", 2, 7))

  test("windows opened in one batch close in a later one; equals batch run") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[Ev]
    val out = StreamWindows.xqueryWindows[String, Ev](
      ms.toDS(), keyOf, orderOf, startP, endP)
    val q = out.writeStream.format("memory").queryName("xw")
      .outputMode("append").start()
    try {
      ms.addData(batch1: _*)
      q.processAllAvailable()
      val afterB1 = spark.table("xw").count()
      assert(afterB1 == 0) // no window has spanned 3 items yet

      ms.addData(batch2: _*)
      q.processAllAvailable()
      val got = spark.table("xw")
        .select(col("key"), col("s_idx"), col("e_idx"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .toSet
      // u1: opened at idx 0 (v=2) in batch 1, closed at idx 2 (batch 2);
      //     opened at idx 3 (v=6) stays open. u2: opened at idx 0 (v=4),
      //     closed at idx 2.
      assert(got == Set(("u1", 0L, 2L), ("u2", 0L, 2L)))

      // parity with the batch operator (streaming ≡ only-end batch run)
      val all = (batch1 ++ batch2).toDF()
      val batchRes = XQueryWindows.windows(all, Seq("user"), Seq("seq"),
        it => it.row.getAs[Int]("v") % 2 == 0,
        (s, e) => e.index - s.index >= 2, onlyEnd = true)
        .select(col("user"), col("s_idx"), col("e_idx"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .toSet
      assert(got == batchRes)
    } finally q.stop()
  }

  test("abandoned open window is evicted after the event-time TTL " +
      "(state does not grow forever)") {
    implicit val sqlCtx = spark.sqlContext
    def t(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val ms = MemoryStream[EvT]
    val out = StreamWindows.xqueryWindows[String, EvT](
      ms.toDS().withWatermark("ts", "5 seconds"), keyT, orderT, startT, endT,
      evictAfter = Some(10000L), eventTimeOf = etT)
    val q = out.writeStream.format("memory").queryName("xw_evict")
      .outputMode("append").start()
    try {
      // u1 opens a window (v=2) that never closes in this batch
      ms.addData(EvT("u1", 0, t(0), 2), EvT("u1", 1, t(1), 3))
      q.processAllAvailable()
      // u2 traffic advances the watermark far past u1's TTL …
      ms.addData(EvT("u2", 0, t(120), 1))
      q.processAllAvailable()
      // … and the next batch processes u1's event-time timeout
      ms.addData(EvT("u2", 1, t(121), 1))
      q.processAllAvailable()
      // u1 reappears with the event that WOULD have closed the window
      // (fresh timestamp, index span >= 2 if state had survived)
      ms.addData(EvT("u1", 2, t(122), 5))
      q.processAllAvailable()
      val u1Rows = spark.table("xw_evict").where(col("key") === "u1").count()
      assert(u1Rows == 0,
        "evicted window was emitted — state survived past the TTL")
    } finally q.stop()
  }

  test("without eviction the same sequence closes the window " +
      "(control for the TTL test)") {
    implicit val sqlCtx = spark.sqlContext
    def t(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val ms = MemoryStream[EvT]
    val out = StreamWindows.xqueryWindows[String, EvT](
      ms.toDS(), keyT, orderT, startT, endT)
    val q = out.writeStream.format("memory").queryName("xw_noevict")
      .outputMode("append").start()
    try {
      ms.addData(EvT("u1", 0, t(0), 2), EvT("u1", 1, t(1), 3))
      q.processAllAvailable()
      ms.addData(EvT("u2", 0, t(120), 1))
      q.processAllAvailable()
      ms.addData(EvT("u1", 2, t(122), 5))
      q.processAllAvailable()
      val u1 = spark.table("xw_noevict").where(col("key") === "u1")
        .select(col("s_idx"), col("e_idx")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(u1 == Set((0L, 2L)))
    } finally q.stop()
  }
}
