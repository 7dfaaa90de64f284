package graft

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.dsl.{MatchPattern => MP, Query}

/** Differential fuzz test for the match compiler: an independent
  * matcher written directly from the reference semantics
  * (`Executor.py:316-388` — key existence, string-const equality,
  * bindings, nested descent, exact key-set check at every level) is
  * compared against the compiled Spark predicate over
  * ScalaCheck-generated nested JSON documents.
  */
class MatchFuzzSpec extends SparkSpec {
  import spark.implicits._

  private val mapper = new ObjectMapper()

  /** get_json_object-style scalar rendering (must mirror
    * MatchPattern's binding values).
    */
  private def render(n: JsonNode): String =
    if (n == null || n.isNull) null
    else if (n.isTextual) n.textValue()
    else n.toString

  /** Reference matcher: Some(bindings) iff the pattern matches. */
  private def refMatch(p: MP.Pat, v: JsonNode,
      exact: Boolean): Option[Map[String, String]] = {
    if (v == null || !v.isObject) return None
    var binds = Map.empty[String, String]
    for (f <- p.fields) {
      if (!v.has(f.key)) return None
      val value = v.get(f.key)
      f.const.foreach { c => if (render(value) != c) return None }
      f.bindTo.foreach { n => binds += n -> render(value) }
      f.nested.foreach { np =>
        refMatch(np, value, exact) match {
          case Some(nb) => binds ++= nb
          case None => return None
        }
      }
    }
    if (exact) {
      val heads = p.fields.map(_.key).toSet
      val it = v.fieldNames()
      while (it.hasNext) if (!heads.contains(it.next())) return None
    }
    p.bindParentTo.foreach(n => binds += n -> render(v))
    Some(binds)
  }

  /** Random nested docs over a tiny key/value alphabet (depth ≤ 3). */
  private def docGen: Gen[String] = {
    val keys = Gen.oneOf("a", "b", "c", "zip", "name")
    def scalar: Gen[String] = Gen.oneOf(
      Gen.chooseNum(0, 5).map(_.toString),
      Gen.oneOf("\"x\"", "\"daniela\"", "\"y\""),
      Gen.const("null"))
    def obj(depth: Int): Gen[String] = for {
      n <- Gen.chooseNum(0, 4)
      ks <- Gen.listOfN(n, keys).map(_.distinct)
      vs <- Gen.sequence[List[String], String](
        ks.map(_ => if (depth >= 2) scalar
        else Gen.frequency(3 -> scalar, 1 -> obj(depth + 1))))
    } yield ks.zip(vs).map { case (k, v) => s""""$k":$v""" }
      .mkString("{", ",", "}")
    obj(0)
  }

  private def docs(n: Int): Seq[String] =
    (0 until n).flatMap(i => docGen.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val patterns: Seq[(String, MP.Pat, Boolean)] = Seq(
    ("existence+bind", MP.Pat(Seq(
      MP.field("a").as("x"), MP.field("b").as("y"))), false),
    ("const", MP.Pat(Seq(
      MP.field("name").is("daniela"), MP.field("a").as("x"))), false),
    ("nested", MP.Pat(Seq(
      MP.field("zip").obj(MP.Pat(Seq(MP.field("a").as("w")))))), false),
    ("exact-two-keys", MP.Pat(Seq(
      MP.field("a").as("x"), MP.field("b").as("y"))), true),
    ("parent-bind", MP.Pat(Seq(MP.field("c").as("x")),
      bindParentTo = Some("z")), false),
    // exact threads through the recursion: nested level must ALSO
    // have no extra keys
    ("exact-nested", MP.Pat(Seq(
      MP.field("zip").obj(MP.Pat(Seq(MP.field("a").as("w")))),
      MP.field("b").as("y"))), true))

  test("variant route ≡ string route on 60 random docs × 6 patterns " +
      "(modulo key-sorted container rendering)") {
    val corpus = docs(60)
    val df = corpus.zipWithIndex.toDF("doc", "i")
    for ((label, pat, exact) <- patterns) {
      val bindNames = {
        def names(p: MP.Pat): Seq[String] =
          p.fields.flatMap(f => f.bindTo.toSeq ++
            f.nested.toSeq.flatMap(names)) ++ p.bindParentTo.toSeq
        names(pat)
      }
      def run(q: Query): Map[Int, Map[String, String]] =
        q.toDF
          .select(col("d.i").as("i") +: bindNames.map(col): _*)
          .collect()
          .map(r => r.getInt(0) ->
            bindNames.zipWithIndex.map { case (n, ix) =>
              n -> r.getString(ix + 1) }.toMap)
          .toMap
      val viaString = run(Query.forIn("d", df)
        .matchRow(col("d.doc"), pat, exact))
      val viaVariant = run(Query.forIn("d", df)
        .matchRow(try_parse_json(col("d.doc")), pat, exact))
      assert(viaVariant.keySet == viaString.keySet,
        s"[$label] matched-doc sets differ: " +
          s"variant=${viaVariant.keySet.toSeq.sorted} " +
          s"string=${viaString.keySet.toSeq.sorted}")
      for ((i, sb) <- viaString; (n, sv) <- sb) {
        val vv = viaVariant(i)(n)
        // container binds render key-sorted on the variant route —
        // compare semantically (ObjectNode.equals is order-insensitive)
        val same =
          if (sv == vv) true
          else if (sv == null || vv == null) false
          else if (sv.startsWith("{") || sv.startsWith("["))
            try mapper.readTree(sv) == mapper.readTree(vv)
            catch { case _: Exception => false }
          else false
        assert(same, s"[$label] binding $n differs for doc $i: " +
          s"variant=$vv string=$sv doc=${corpus(i)}")
      }
    }
  }

  test("compiled match ≡ reference matcher on 60 random docs × 6 patterns") {
    val corpus = docs(60)
    val df = corpus.zipWithIndex.toDF("doc", "i")
    for ((label, pat, exact) <- patterns) {
      val bindNames = {
        def names(p: MP.Pat): Seq[String] =
          p.fields.flatMap(f => f.bindTo.toSeq ++
            f.nested.toSeq.flatMap(names)) ++ p.bindParentTo.toSeq
        names(pat)
      }
      val got = Query.forIn("d", df)
        .matchRow(col("d.doc"), pat, exact)
        .toDF
        .select(col("d.i").as("i") +: bindNames.map(col): _*)
        .collect()
        .map(r => r.getInt(0) ->
          bindNames.zipWithIndex.map { case (n, ix) => n -> r.getString(ix + 1) }.toMap)
        .toMap
      val expected = corpus.zipWithIndex.flatMap { case (doc, i) =>
        refMatch(pat, mapper.readTree(doc), exact).map(b => i -> b)
      }.toMap
      assert(got.keySet == expected.keySet,
        s"[$label] matched-doc sets differ: spark=${got.keySet.toSeq.sorted} " +
          s"ref=${expected.keySet.toSeq.sorted}")
      for ((i, b) <- expected)
        assert(got(i) == b, s"[$label] bindings differ for doc $i: " +
          s"spark=${got(i)} ref=$b doc=${corpus(i)}")
    }
  }
}
