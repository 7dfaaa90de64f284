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

  // ---- variant-route reference: same semantics, but object fields
  // iterate in KEY-SORTED order (the Variant binary format stores
  // them sorted — the route's declared order contract) and container
  // values render with sorted keys for the same reason.
  private def sortNode(n: JsonNode): JsonNode = n match {
    case o if o.isObject =>
      val out = mapper.createObjectNode()
      o.properties().asScala.toSeq.sortBy(_.getKey)
        .foreach(e => out.set[JsonNode](e.getKey, sortNode(e.getValue)))
      out
    case a if a.isArray =>
      val out = mapper.createArrayNode()
      a.elements().asScala.foreach(e => out.add(sortNode(e)))
      out
    case other => other
  }
  private def renderV(n: JsonNode): String = render(sortNode(n))

  private def childVRef(values: Seq[JsonNode], key: String): Seq[JsonNode] = {
    def flat(n: JsonNode): Seq[JsonNode] =
      if (n.isArray) n.elements().asScala.toSeq.flatMap(flat) else Seq(n)
    values.flatMap(flat).flatMap { el =>
      if (!el.isObject) Nil
      else if (key == "_")
        el.properties().asScala.toSeq.sortBy(_.getKey).map(_.getValue)
      else if (el.has(key)) Seq(el.get(key))
      else Nil
    }
  }

  private def descVRef(values: Seq[JsonNode], key: String): Seq[JsonNode] = {
    def walk(n: JsonNode): Seq[JsonNode] =
      if (n.isArray) n.elements().asScala.toSeq.flatMap(walk)
      else if (n.isObject)
        n.properties().asScala.toSeq.sortBy(_.getKey).flatMap { e =>
          val hit = if (key == "_" || e.getKey == key) Seq(e.getValue) else Nil
          hit ++ walk(e.getValue)
        }
      else Nil
    values.flatMap(walk)
  }

  test("variant route ≡ key-sorted reference semantics; multiset-equal " +
      "to the string route") {
    val corpus = docs(80)
    val df = corpus.zipWithIndex.toDF("doc", "i")
    for (key <- Seq("box", "region", "_")) {
      val rows = df.select(col("i"),
        pathText(childPathV(pathSeqV(col("doc")), key)).as("c"),
        pathText(descPathV(pathSeqV(col("doc")), key)).as("d"),
        pathText(childPathV(childPathV(pathSeqV(col("doc")), "region"), key))
          .as("c2"),
        childPath(pathSeq(col("doc")), key).as("cs"),
        descPath(pathSeq(col("doc")), key).as("ds"))
        .collect()
      for (r <- rows) {
        val i = r.getInt(0)
        val node = mapper.readTree(corpus(i))
        val ctx = s"key=$key doc=${corpus(i)}"
        assert(r.getSeq[String](1) == childVRef(Seq(node), key).map(renderV),
          s"variant child: $ctx")
        assert(r.getSeq[String](2) == descVRef(Seq(node), key).map(renderV),
          s"variant desc: $ctx")
        assert(r.getSeq[String](3) ==
          childVRef(childVRef(Seq(node), "region"), key).map(renderV),
          s"variant chain: $ctx")
        // the two routes agree as multisets (order contracts differ
        // only in object-field iteration; scalar renderings coincide
        // on this alphabet, containers modulo key order)
        def canon(s: String): String = String.valueOf(
          Option(s).map(v => scala.util.Try(
            renderV(mapper.readTree(v))).getOrElse(v)).orNull)
        assert(r.getSeq[String](1).map(canon).sorted ==
          r.getSeq[String](4).map(canon).sorted, s"route child multiset: $ctx")
        assert(r.getSeq[String](2).map(canon).sorted ==
          r.getSeq[String](5).map(canon).sorted, s"route desc multiset: $ctx")
      }
    }
  }

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
