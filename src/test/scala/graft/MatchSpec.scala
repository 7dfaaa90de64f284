package graft

import org.apache.spark.sql.functions._
import graft.dsl.{MatchPattern => MP, Query}

/** Port of the reference's `tests/match_clause_test.py:1-55` (exact and
  * non-exact match over nested person dicts, with binding + where
  * condition + nested pattern + whole-object `as z`).
  */
class MatchSpec extends SparkSpec {
  import spark.implicits._

  private val people = Seq(
    """{"first":"daniela","last":"f","age":45,"zip_code":{"number":123}}""",
    """{"first":"daniela","last":"k","age":50,"zip_code":{"number":999}}""",
    """{"first":"daniela","last":"j","age":50,"extra_field":true,"zip_code":{"number":999}}""",
    """{"first":"john","last":"wayne","age":50,"extra_field":true,"zip_code":{"number":999}}""",
    """{"first":"daniela","last":"s","age":55,"zip_code":{"number":999,"extra_field":true}}""")

  private val pat = MP.Pat(
    Seq(
      MP.field("last").as("x"),
      MP.field("first").is("daniela"),
      MP.field("age").as("y").where(col("y").cast("int") > 40),
      MP.field("zip_code").obj(MP.Pat(Seq(MP.field("number").as("w"))))),
    bindParentTo = Some("z"))

  test("match exact: extra keys reject at every level (ref match_clause_test.py:31-41)") {
    val res = Query.forIn("p", people.toDF("doc"))
      .matchIn(array(col("p.doc")), pat, exact = true)
      .orderBy(col("x"))
      .select("x" -> col("x"), "y" -> col("y"), "w" -> col("w"), "z" -> col("z"))
      .collect()
    assert(res.length == 2)
    assert(res(0).getAs[String]("y") == "45") // res[0]['age'] == 45
    assert(res.map(_.getAs[String]("x")).toSeq == Seq("f", "k"))
  }

  test("match non-exact: 4 danielas survive (ref match_clause_test.py:44-55)") {
    val res = Query.forIn("p", people.toDF("doc"))
      .matchRow(col("p.doc"), pat)
      .orderBy(col("x"))
      .select("x" -> col("x"), "y" -> col("y"), "z" -> col("z"))
      .collect()
    assert(res.length == 4)
    assert(res(3).getAs[String]("y") == "55") // res[3]['age'] == 55
    // parent binding carries the whole object
    assert(res(0).getAs[String]("z").contains(""""number":123"""))
  }

  test("single-parse plan: one match_pattern generator, zero " +
      "get_json_object / json_object_keys") {
    val q = Query.forIn("p", people.toDF("doc"))
      .matchRow(col("p.doc"), pat)
      .select("x" -> col("x"), "y" -> col("y"), "w" -> col("w"), "z" -> col("z"))
    val plan = q.queryExecution.optimizedPlan.toString
    assert(!plan.contains("get_json_object") &&
      !plan.contains("json_object_keys"),
      s"per-field re-parse in plan:\n$plan")
    assert("match_pattern".r.findAllIn(plan).length == 1,
      s"expected exactly one generator:\n$plan")
  }

  test("duplicate binding names are rejected at compile") {
    val dup = MP.Pat(Seq(MP.field("first").as("x"), MP.field("last").as("x")))
    intercept[IllegalArgumentException] {
      Query.forIn("p", people.toDF("doc")).matchRow(col("p.doc"), dup)
    }
  }

  test("missing pattern key rejects (age where over unbound would never fire)") {
    val patPhone = MP.Pat(Seq(MP.field("phone").as("ph")))
    val res = Query.forIn("p", people.toDF("doc"))
      .matchRow(col("p.doc"), patPhone)
      .toDF.collect()
    assert(res.isEmpty)
  }
}
