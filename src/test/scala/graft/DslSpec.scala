package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.dsl.Query

/** Ports of the reference tutorial queries q1–q7, q9, q10
  * (`tests/tutorial_tests.py:1-102`) through the FLWOR DSL, with the
  * reference's asserted outputs. (q8 paths → PathSpec; q11–q13
  * windows → WindowSpec; match → MatchSpec.)
  */
class DslSpec extends SparkSpec {
  import spark.implicits._

  private def range1(n: Int) = (1 until n).toDF("v")

  test("q1: filtered cross of two for-clauses") {
    val res = Query.forIn("x", range1(8)).forIn("y", range1(7))
      .where(col("x.v") % 2 === 0 && col("y.v") % 2 =!= 0 &&
        col("x.v") > col("y.v"))
      .orderBy(col("x.v"), col("y.v"))
      .select("x" -> col("x.v"), "y" -> col("y.v"))
      .collect()
    assert(res(0) == Row(2, 1))
  }

  test("q2: group by with aggregate over the nested list") {
    val res = Query.forIn("x", range1(8)).forIn("y", range1(7))
      .where(col("x.v") % 2 === 0 && col("y.v") % 2 =!= 0 &&
        col("x.v") > col("y.v"))
      .groupBy("x" -> col("x.v"))
      .let("sum", aggregate(transform(col("y"), _.getField("v")),
        lit(0), (a, b) => a + b))
      .orderBy(col("x"))
      .select("x" -> col("x"), "sum" -> col("sum"))
      .collect()
    assert(res(0) == Row(2, 1))
  }

  test("q3: let after group, where-as-having") {
    val res = Query.forIn("x", range1(8)).forIn("y", range1(7))
      .where(col("x.v") % 2 === 0 && col("y.v") % 2 =!= 0 &&
        col("x.v") > col("y.v"))
      .groupBy("x" -> col("x.v"))
      .let("sum_y", aggregate(transform(col("y"), _.getField("v")),
        lit(0), (a, b) => a + b))
      .where(col("sum_y") % 2 =!= 0)
      .orderBy(col("x"))
      .select("x" -> col("x"), "sum_y" -> col("sum_y"))
      .collect()
    assert(res(0) == Row(2, 1))
    assert(res(1) == Row(6, 9))
  }

  test("q4: outer() idiom — empty subquery binds None (forInOuter)") {
    val ys = range1(10).withColumnRenamed("v", "y")
    val res = Query.forIn("x", range1(10))
      .forInOuter("yy", ys)(col("x.v") % 2 === 0 && col("x.v") > col("yy.y"))
      .orderBy(col("x.v"), col("yy.y"))
      .select("x" -> col("x.v"), "y" -> col("yy.y"))
      .collect()
    // ref: res[3] == (4,1); res[6] == (5, None)
    assert(res(3) == Row(4, 1))
    assert(res(6).getInt(0) == 5 && res(6).isNullAt(1))
  }

  test("q5: group-by auto-nests non-key vars into lists") {
    val res = Query.forIn("x", range1(5)).forIn("y", range1(5))
      .where(col("x.v") > col("y.v"))
      .groupBy("x" -> col("x.v"))
      .let("ys", sort_array(transform(col("y"), _.getField("v"))))
      .orderBy(col("x"))
      .select("x" -> col("x"), "ys" -> col("ys"))
      .collect()
    assert(res(2).getInt(0) == 4 && res(2).getSeq[Int](1) == Seq(1, 2, 3))
  }

  test("q6: expression group key with alias + order by") {
    val res = Query.forIn("x", range1(5)).forIn("y", range1(5))
      .where(col("x.v") > col("y.v"))
      .groupBy("x_squared" -> (col("x.v") * col("x.v")))
      .let("ys", sort_array(transform(col("y"), _.getField("v"))))
      .orderBy(col("x_squared"))
      .select("x_squared" -> col("x_squared"), "y" -> col("ys"))
      .collect()
    assert(res(2).getInt(0) == 16 && res(2).getSeq[Int](1) == Seq(1, 2, 3))
    assert(res(1).getInt(0) == 9 && res(1).getSeq[Int](1) == Seq(1, 2))
  }

  test("q7: multi-key order by asc/desc") {
    val res = Query.forIn("x", range1(5)).forIn("y", range1(5))
      .where(col("x.v") > col("y.v"))
      .orderBy(abs(col("x.v") - col("y.v")).asc, col("y.v").desc)
      .select("x" -> col("x.v"), "y" -> col("y.v"))
      .collect()
    assert(res(0) == Row(4, 3))
    assert(res(1) == Row(3, 2))
  }

  test("q9: try-except dirty-data cleaning (try int(x) except 0)") {
    // ref data: [15, 25, None, 80, 34, "34", "twenty", [12], 54, 12]
    // sum of try int(item) except 0 == 254 ([12] fails the cast too)
    val data = Seq("15", "25", null, "80", "34", "34", "twenty", "[12]",
      "54", "12").toDF("item")
    val res = Query.forIn("d", data)
      .let("num", coalesce(expr("try_cast(d.item AS BIGINT)"), lit(0L)))
      .groupByAgg(Nil, Seq("total" -> sum(col("num"))))
      .toDF.head.getLong(0)
    assert(res == 254L)
  }

  test("q10: nested subquery result per outer tuple") {
    val res = Query.forIn("i", Seq(1, 3, 5).toDF("v"))
      .let("sequence", transform(sequence(col("i.v"), col("i.v") + 4),
        k => struct(k.as("item"))))
      .orderBy(col("i.v"))
      .select("sequence_start" -> col("i.v"), "sequence" -> col("sequence"))
      .collect()
    assert(res(1).getInt(0) == 3 && res(1).getSeq[Row](1).length == 5)
  }

  test("container terminals: selectDistinct, selectKV, selectValue") {
    val df = Seq((1, "a"), (1, "a"), (2, "b")).toDF("k", "s")
    assert(Query.forIn("t", df)
      .selectDistinct("k" -> col("t.k"), "s" -> col("t.s")).count() == 2)
    val kv = Query.forIn("t", df).groupByAgg(
      Seq("k" -> col("t.k")), Seq("n" -> count(lit(1))))
      .selectKV(col("k"), col("n"))
    assert(kv.columns.toSeq == Seq("key", "value"))
    assert(Query.forIn("t", df).selectValue(col("t.k") + 1).columns.toSeq ==
      Seq("value"))
  }

  test("count clause: 0-based positions under explicit order") {
    val df = Seq(("a", 3), ("a", 1), ("b", 2)).toDF("g", "v")
    val res = Query.forIn("t", df)
      .count("pos", order = Seq(col("t.v")), partitionBy = Seq(col("t.g")))
      .orderBy(col("t.g"), col("pos"))
      .select("g" -> col("t.g"), "v" -> col("t.v"), "pos" -> col("pos"))
      .collect()
    assert(res.toSeq == Seq(Row("a", 1, 0L), Row("a", 3, 1L), Row("b", 2, 0L)))
  }

  test("groupByCube emits all 2^k grouping sets") {
    val df = Seq(("a", "x", 1L), ("a", "y", 2L), ("b", "x", 3L))
      .toDF("g1", "g2", "v")
    val res = Query.forIn("t", df)
      .groupByCube(Seq("g1" -> col("t.g1"), "g2" -> col("t.g2")),
        Seq("s" -> sum(col("t.v"))))
      .toDF.collect()
    // 3 (g1,g2) + 2 (g1) + 2 (g2) + 1 grand total
    assert(res.length == 8)
    assert(res.find(r => r.isNullAt(0) && r.isNullAt(1)).get.getLong(2) == 6L)
  }

  test("multi-variable unpack: for (a, b) in seq of structs / arrays " +
      "(ref Executor.py:174-186)") {
    val df = Seq((1, Seq(("x", 10), ("y", 20)))).toDF("id", "pairs")
    val res = Query.forIn("t", df)
      .forIn(Seq("k", "v"), col("t.pairs"))
      .orderBy(col("k"))
      .select("k" -> col("k"), "v" -> col("v"))
      .collect()
    assert(res.toSeq == Seq(Row("x", 10), Row("y", 20)))

    // array elements unpack by index; missing index binds NULL
    val arr = Seq((1, Seq(Seq("a", "b"), Seq("c")))).toDF("id", "xs")
    val res2 = Query.forIn("t", arr)
      .forIn(Seq("first", "second"), col("t.xs"))
      .orderBy(col("first"))
      .select("first" -> col("first"), "second" -> col("second"))
      .collect()
    assert(res2.toSeq == Seq(Row("a", "b"), Row("c", null)))

    // struct arity is enforced like Python tuple unpack
    intercept[IllegalArgumentException] {
      Query.forIn("t", df).forIn(Seq("k", "v", "extra"), col("t.pairs"))
    }
  }

  test("multi-variable let: let (x, y) = e evaluates the tuple once " +
      "(ref Executor.py:208-218)") {
    val df = Seq((3, 4)).toDF("a", "b")
    val res = Query.forIn("t", df)
      .let(Seq("hi", "lo"), struct(greatest(col("t.a"), col("t.b")),
        least(col("t.a"), col("t.b"))))
      .select("hi" -> col("hi"), "lo" -> col("lo"))
      .collect()
    assert(res.toSeq == Seq(Row(4, 3)))
  }

  test("multi-variable for over a 2-column relation binds columns " +
      "positionally") {
    val pairs = Seq(("x", 1), ("y", 2)).toDF("c1", "c2")
    val res = Query().forIn(Seq("name", "num"), pairs)
      .where(col("num") > 1)
      .select("name" -> col("name"), "num" -> col("num"))
      .collect()
    assert(res.toSeq == Seq(Row("y", 2)))
    intercept[IllegalArgumentException] {
      Query().forIn(Seq("only_one"), pairs)
    }
  }
}
