package graft

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.PathFunctions._

/** Differential fuzz for the path-step expressions: independent
  * test-side implementations of the documented semantics (child:
  * recursive list flatten then map values, `_` wildcard; descendant:
  * document-order DFS descending through matches — the reference
  * leaves descendant order unspecified, ours is the declared
  * refinement) compared against the compiled expressions over
  * generated JSON with arrays, objects, scalars and nulls.
  */
class PathFuzzSpec extends SparkSpec {
  import spark.implicits._

  private val mapper = new ObjectMapper()

  private def render(n: JsonNode): String =
    if (n.isNull) null
    else if (n.isTextual) n.textValue()
    else n.toString

  private def childRef(values: Seq[JsonNode], key: String): Seq[String] = {
    def flat(n: JsonNode): Seq[JsonNode] =
      if (n.isArray) n.elements().asScala.toSeq.flatMap(flat) else Seq(n)
    values.flatMap(flat).flatMap { el =>
      if (!el.isObject) Nil
      else if (key == "_") el.properties().asScala.toSeq.map(e => render(e.getValue))
      else if (el.has(key)) Seq(render(el.get(key)))
      else Nil
    }
  }

  private def descRef(values: Seq[JsonNode], key: String): Seq[String] = {
    def walk(n: JsonNode): Seq[String] =
      if (n.isArray) n.elements().asScala.toSeq.flatMap(walk)
      else if (n.isObject)
        n.properties().asScala.toSeq.flatMap { e =>
          val hit = if (key == "_" || e.getKey == key) Seq(render(e.getValue)) else Nil
          hit ++ walk(e.getValue)
        }
      else Nil
    values.flatMap(walk)
  }

  private def docGen: Gen[String] = {
    val keys = Gen.oneOf("a", "b", "box", "region")
    def scalar: Gen[String] = Gen.oneOf(
      Gen.chooseNum(0, 9).map(_.toString),
      Gen.oneOf("\"lake\"", "\"pond\""), Gen.const("null"))
    def value(depth: Int): Gen[String] =
      if (depth >= 2) scalar
      else Gen.frequency(3 -> scalar, 2 -> obj(depth + 1), 2 -> arr(depth + 1))
    def arr(depth: Int): Gen[String] = for {
      n <- Gen.chooseNum(0, 3)
      vs <- Gen.listOfN(n, value(depth))
    } yield vs.mkString("[", ",", "]")
    def obj(depth: Int): Gen[String] = for {
      n <- Gen.chooseNum(0, 3)
      ks <- Gen.listOfN(n, keys).map(_.distinct)
      vs <- Gen.sequence[List[String], String](ks.map(_ => value(depth)))
    } yield ks.zip(vs).map { case (k, v) => s""""$k":$v""" }
      .mkString("{", ",", "}")
    Gen.oneOf(obj(0), arr(0))
  }

  private def docs(n: Int): Seq[String] =
    (0 until n).flatMap(i => docGen.apply(Gen.Parameters.default, Seed(100L + i)))

  test("childPath/descPath ≡ reference semantics on 80 random docs") {
    val corpus = docs(80)
    val df = corpus.zipWithIndex.toDF("doc", "i")
    for (key <- Seq("box", "region", "_")) {
      val rows = df.select(col("i"),
        childPath(pathSeq(col("doc")), key).as("c"),
        descPath(pathSeq(col("doc")), key).as("d"),
        childPath(childPath(pathSeq(col("doc")), "region"), key).as("c2"))
        .collect()
      for (r <- rows) {
        val i = r.getInt(0)
        val node = mapper.readTree(corpus(i))
        val ctx = s"key=$key doc=${corpus(i)}"
        assert(r.getSeq[String](1) == childRef(Seq(node), key), s"child: $ctx")
        assert(r.getSeq[String](2) == descRef(Seq(node), key), s"desc: $ctx")
        // mirror the engine: null / non-JSON scalar elements have no
        // children and are skipped at the next step
        val step1 = childRef(Seq(node), "region")
          .flatMap(s => Option(s).flatMap(v =>
            scala.util.Try(mapper.readTree(v)).toOption))
        assert(r.getSeq[String](3) == childRef(step1, key), s"chain: $ctx")
      }
    }
  }
}
