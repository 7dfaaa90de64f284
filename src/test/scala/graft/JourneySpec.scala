package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.dsl.Query

/** Port of the reference's customer-journey scenario suite
  * (`tests/cust_journey_scenario_tests.py:1-153` over
  * `tests/cust_journey_data.py`): 5 event-analytics scenarios with the
  * reference's asserted outputs, expressed through the DSL. The
  * per-journey nested subqueries become joins/group-bys; `issued[-1]`
  * becomes max_by over the journey sequence number.
  */
class JourneySpec extends SparkSpec {
  import spark.implicits._

  // (client_id, seq, event_name, date, amount, loan_id, state)
  private val J: Seq[(Long, Int, String, String, Option[Double], Option[Long], Option[String])] = Seq(
    (1L, 0, "open", "2015-01-16", None, None, Some("TX")),
    (1L, 1, "deposit", "2015-02-10", Some(250.0), None, None),
    (1L, 2, "deposit", "2015-02-17", Some(320.0), None, None),
    (1L, 3, "withdraw", "2015-02-23", Some(500.0), None, None),
    (1L, 4, "loan_req", "2015-02-26", Some(3000.0), None, None),
    (1L, 5, "loan_issued", "2015-03-01", Some(3000.0), Some(1L), None),
    (1L, 6, "loan_paid", "2015-09-01", Some(3270.0), Some(1L), None),

    (2L, 0, "open", "2016-02-01", None, None, Some("CA")),
    (2L, 1, "deposit", "2016-02-01", Some(300.0), None, None),
    (2L, 2, "deposit", "2016-03-05", Some(1500.0), None, None),
    (2L, 3, "deposit", "2016-04-01", Some(700.0), None, None),
    (2L, 4, "withdraw", "2016-05-01", Some(330.0), None, None),
    (2L, 5, "withdraw", "2016-06-01", Some(2200.0), None, None),
    (2L, 6, "close", "2016-06-15", None, None, None),

    (3L, 0, "open", "2015-12-10", None, None, Some("TX")),
    (3L, 1, "loan_req", "2015-12-11", Some(1000.0), None, None),
    (3L, 2, "deposit", "2016-01-01", Some(300.0), None, None),
    (3L, 3, "deposit", "2016-01-13", Some(500.0), None, None),
    (3L, 4, "withdraw", "2016-01-18", Some(600.0), None, None),
    (3L, 5, "withdraw", "2016-01-20", Some(100.0), None, None),
    (3L, 6, "deposit", "2016-02-02", Some(700.0), None, None),
    (3L, 7, "withdraw", "2016-02-15", Some(300.0), None, None),
    (3L, 8, "loan_req", "2016-02-18", Some(1000.0), None, None),
    (3L, 9, "close", "2016-03-01", None, None, None),

    (4L, 0, "open", "2015-12-01", None, None, Some("TX")),
    (4L, 1, "deposit", "2016-03-05", Some(300.0), None, None),
    (4L, 2, "loan_req", "2016-03-10", Some(1000.0), None, None),
    (4L, 3, "loan_issued", "2016-03-15", Some(1000.0), Some(1L), None),

    (5L, 0, "open", "2015-11-13", None, None, Some("CA")),
    (5L, 1, "deposit", "2015-11-15", Some(500.0), None, None),
    (5L, 2, "withdraw", "2015-11-18", Some(300.0), None, None),
    (5L, 3, "deposit", "2015-11-28", Some(500.0), None, None),
    (5L, 4, "loan_req", "2015-11-29", Some(1500.0), None, None),
    (5L, 5, "loan_issued", "2015-12-02", Some(1500.0), Some(1L), None),
    (5L, 6, "deposit", "2016-01-05", Some(200.0), None, None),
    (5L, 7, "withdraw", "2016-02-05", Some(100.0), None, None),
    (5L, 8, "reminder", "2016-03-03", None, Some(1L), None),
    (5L, 9, "reminder", "2016-03-13", None, Some(1L), None),
    (5L, 10, "reminder", "2016-03-23", None, Some(1L), None),
    (5L, 11, "reminder", "2016-04-03", None, Some(1L), None),
    (5L, 12, "loan_paid", "2016-04-05", Some(1620.0), Some(1L), None),
    (5L, 13, "close", "2016-04-05", None, None, None),

    (6L, 0, "open", "2016-01-01", None, None, Some("CA")),
    (6L, 1, "deposit", "2016-01-05", Some(300.0), None, None),
    (6L, 2, "loan_req", "2016-01-08", Some(2500.0), None, None),
    (6L, 3, "loan_issued", "2016-01-12", Some(2500.0), Some(1L), None),
    (6L, 4, "deposit", "2016-02-10", Some(300.0), None, None),
    (6L, 5, "reminder", "2016-03-13", None, Some(1L), None),
    (6L, 6, "reminder", "2016-03-23", None, Some(1L), None),
    (6L, 7, "reminder", "2016-04-03", None, Some(1L), None),
    (6L, 8, "loan_paid", "2016-04-07", Some(2650.0), Some(1L), None),

    (7L, 0, "open", "2015-10-11", None, None, Some("CA")),
    (7L, 1, "deposit", "2015-10-13", Some(500.0), None, None),
    (7L, 2, "withdraw", "2015-10-17", Some(200.0), None, None),
    (7L, 3, "deposit", "2015-11-01", Some(400.0), None, None),
    (7L, 4, "loan_req", "2016-01-01", Some(5000.0), None, None),
    (7L, 5, "loan_issued", "2016-01-03", Some(4000.0), Some(1L), None),
    (7L, 6, "deposit", "2016-02-02", Some(400.0), None, None),
    (7L, 7, "withdraw", "2016-02-20", Some(500.0), None, None),
    (7L, 8, "reminder", "2016-03-04", None, Some(1L), None),
    (7L, 9, "reminder", "2016-03-24", None, Some(1L), None),
    (7L, 10, "reminder", "2016-04-04", None, Some(1L), None),
    (7L, 11, "reminder", "2016-04-24", None, Some(1L), None),
    (7L, 12, "close", "2016-05-01", None, None, None))

  private def ev: DataFrame = J
    .toDF("client_id", "seq", "event_name", "date", "amount", "loan_id", "state")
    .withColumn("date", to_date(col("date")))

  private def opens = ev.filter(col("event_name") === "open")
    .select(col("client_id"), col("state"))

  test("scenario 1: loan default rate by state") {
    // last issued loan per client (issued[-1] → max_by over seq)
    val lastIssued = Query.forIn("e", ev)
      .where(col("e.event_name") === "loan_issued")
      .groupByAgg(Seq("client_id" -> col("e.client_id")),
        Seq("loan_id" -> expr("max_by(e.loan_id, e.seq)")))
      .toDF
    val res = Query.forIn("li", lastIssued)
      .forIn("o", opens)
      .where(col("li.client_id") === col("o.client_id"))
      .forInOuter("p", ev.filter(col("event_name") === "loan_paid"))(
        col("li.client_id") === col("p.client_id") &&
          col("li.loan_id") === col("p.loan_id"))
      .let("default", when(col("p").isNull, 1).otherwise(0))
      .groupByAgg(Seq("state" -> col("o.state")),
        Seq("custs_with_loans" -> count(lit(1)),
          "default_rate" -> (sum(col("default")) / count(lit(1)))))
      .orderBy(col("state"))
      .toDF.collect()
    assert(res.map(_.getString(0)).toSeq == Seq("CA", "TX"))
    assert(res.map(_.getLong(1)).toSeq == Seq(3L, 2L))
    assert(math.abs(res(0).getDouble(2) - 1.0 / 3) < 1e-9)
    assert(res(1).getDouble(2) == 0.5)
  }

  test("scenario 2: balances by state (balance > 300)") {
    val res = Query.forIn("e", ev)
      .let("signed", when(col("e.event_name") === "deposit", col("e.amount"))
        .when(col("e.event_name") === "withdraw", -col("e.amount"))
        .otherwise(lit(0.0)))
      .groupByAgg(Seq("client_id" -> col("e.client_id")),
        Seq("balance" -> sum(col("signed"))))
      .where(col("balance") > 300)
      .toDF
    val byState = Query.forIn("b", res).forIn("o", opens)
      .where(col("b.client_id") === col("o.client_id"))
      .groupByAgg(Seq("state" -> col("o.state")),
        Seq("n_customers" -> count(lit(1))))
      .orderBy(col("state"))
      .toDF.collect()
    assert(byState.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("CA", 3L), ("TX", 1L)))
  }

  test("scenario 3: churn funnel — closed and refused within 30 days") {
    val closes = ev.filter(col("event_name") === "close")
      .select(col("client_id"), col("date").as("close_date"))
    val nClosed = closes.count()
    val lastReq = Query.forIn("e", ev)
      .where(col("e.event_name") === "loan_req")
      .groupByAgg(Seq("client_id" -> col("e.client_id")),
        Seq("req_date" -> expr("max_by(e.date, e.seq)")))
      .toDF
    val refused = Query.forIn("c", closes)
      .forIn("r", lastReq)
      .where(col("c.client_id") === col("r.client_id") &&
        datediff(col("c.close_date"), col("r.req_date")) < 30)
      .notExistsIn("i", ev.filter(col("event_name") === "loan_issued"))(
        col("c.client_id") === col("i.client_id") &&
          col("i.date") > col("r.req_date"))
      .toDF
    assert(refused.count().toDouble / nClosed == 0.25)
  }

  test("scenario 4: reminder-frequency detection via self-join") {
    val closedIds = ev.filter(col("event_name") === "close")
      .select(col("client_id"))
    val nClosed = closedIds.count()
    val reminders = ev.filter(col("event_name") === "reminder")
      .select(col("client_id"), col("seq"), col("date"))
    val tooMany = Query.forIn("c", closedIds)
      .existsIn("rr",
        reminders.as("r1").join(reminders.as("r2"),
          col("r1.client_id") === col("r2.client_id") &&
            col("r1.seq") =!= col("r2.seq") &&
            abs(datediff(col("r1.date"), col("r2.date"))) < 30)
          .select(col("r1.client_id").as("rcid")))(
        col("c.client_id") === col("rr.rcid"))
      .toDF
    assert(tooMany.count().toDouble / nClosed == 0.5)
  }

  test("scenario 5: monthly burn rate with generated month ranges") {
    val span = Query.forIn("e", ev)
      .groupByAgg(Seq("client_id" -> col("e.client_id")),
        Seq("first_date" -> min(col("e.date")),
          "last_date" -> max(col("e.date"))))
      .toDF
    // months m (as first-of-month) with last_day(m) > first AND m < last
    // (the reference's partial-month boundary conditions)
    val months = Query.forIn("s", span)
      .forIn("m", expr(
        "sequence(trunc(s.first_date, 'MM'), trunc(s.last_date, 'MM'), interval 1 month)"))
      .where(last_day(col("m")) > col("s.first_date") &&
        col("m") < col("s.last_date"))
      .toDF.select(col("s.client_id").as("client_id"), col("m"))
    val withdrawals = ev.filter(col("event_name") === "withdraw")
      .select(col("client_id").as("wcid"),
        trunc(col("date"), "MM").as("wm"), col("amount"))
    val burn = months
      .join(withdrawals,
        col("client_id") === col("wcid") && col("m") === col("wm"),
        "left_outer")
      .groupBy(col("client_id"), col("m"))
      .agg(coalesce(sum(col("amount")), lit(0.0)).as("ws"))
      .groupBy(col("client_id")).agg(avg(col("ws")).as("burn_rate"))
    val overall = burn.agg(avg(col("burn_rate"))).head.getDouble(0)
    assert(overall > 152 && overall < 153, s"mean burn rate $overall")
  }
}
