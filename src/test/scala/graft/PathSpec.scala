package graft

import org.apache.spark.sql.functions._
import graft.functions.PathFunctions._

/** Port of the reference's tutorial q8 (`tests/tutorial_tests.py:77-85`)
  * plus wildcard and chaining cases for the path-step expressions.
  */
class PathSpec extends SparkSpec {
  import spark.implicits._

  private val db =
    """[{"region": [{"box": [1,2], "label":"lake"},
                    {"box": {"box": [2,3]}},
                    {"region": {"box":[1,2], "label":"lake"}},
                    {"region": {"circle": [0.5,0.5,45], "label":"pond"}}]},
        {"region": {"box": [1,2], "label":"lake"}}]"""

  private def one(c: org.apache.spark.sql.Column): Seq[String] =
    Seq(db).toDF("doc").select(c.as("r")).head.getSeq[String](0)

  test("child path chaining: db ./ region ./ region = 2 (tutorial q8)") {
    val r = one(childPath(childPath(pathSeq(col("doc")), "region"), "region"))
    assert(r.length == 2)
    assert(r.forall(_.contains("\"label\"")))
  }

  test("descendant path: db .// box = 5 (tutorial q8)") {
    val r = one(descPath(pathSeq(col("doc")), "box"))
    assert(r.length == 5)
  }

  test("child wildcard `_` yields all values") {
    val r = Seq("""{"a":1,"b":"x","c":{"d":2}}""").toDF("doc")
      .select(childPath(pathSeq(col("doc")), "_").as("r"))
      .head.getSeq[String](0)
    assert(r == Seq("1", "x", """{"d":2}"""))
  }

  test("scalars and non-JSON elements yield no children") {
    val r = Seq("""["plain", 42, {"k":7}]""").toDF("doc")
      .select(childPath(pathSeq(col("doc")), "k").as("r"))
      .head.getSeq[String](0)
    assert(r == Seq("7"))
  }

  test("descendant descends through matched values") {
    val r = Seq("""{"box":{"box":[2,3]}}""").toDF("doc")
      .select(descPath(pathSeq(col("doc")), "box").as("r"))
      .head.getSeq[String](0)
    assert(r == Seq("""{"box":[2,3]}""", "[2,3]"))
  }

  test("SQL surface via GraftExtensions (json_child_path/json_desc_path)") {
    val n = spark.sql(
      s"""SELECT size(json_desc_path(array('${db.replace("\n", " ")}'), 'box')) AS n""")
      .head.getInt(0)
    assert(n == 5)
  }

  test("variant SQL surface: single-parse chain agrees with the " +
      "string route (multiset)") {
    val doc = db.replace("\n", " ")
    val vs = spark.sql(
      s"""SELECT variant_render_seq(
            variant_desc_path(array(try_parse_json('$doc')), 'box')) AS r""")
      .head.getSeq[String](0)
    val ss = spark.sql(
      s"""SELECT json_desc_path(array('$doc'), 'box') AS r""")
      .head.getSeq[String](0)
    assert(vs.length == 5 && vs.sorted == ss.sorted)
  }
}
