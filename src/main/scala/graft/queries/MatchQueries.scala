package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.dsl.{MatchPattern => MP, Query}

/** `match` clause battery (SURVEY §2.1 #10; reference
  * `Executor.py:316-388`, `tests/match_clause_test.py`).
  *
  * The person-like nested JSON docs are constructed deterministically
  * from customer ⋈ nation INSIDE the query (to_json drops null fields,
  * so `phone` exists only for non-negative balances — giving the
  * key-existence and `exact` semantics something real to reject).
  * The DuckDB oracle computes the expected result relationally, which
  * checks the match compiler end-to-end: construction → pattern
  * predicate → extractions.
  */
object MatchQueries {

  /** customer ⋈ nation → one JSON doc per person:
    * {"name","segment","acctbal","vip"?, "nation":{"name","key"}}
    * ("vip" exists only when acctbal >= 5000)
    */
  private def persons(s: org.apache.spark.sql.SparkSession, dir: String) =
    Query.forIn("c", Tables.load(s, dir, "customer"))
      .forIn("nat", Tables.load(s, dir, "nation"), hint = "broadcast")
      .where(col("c.c_nationkey") === col("nat.n_nationkey"))
      .let("doc", to_json(struct(
        col("c.c_name").as("name"),
        col("c.c_mktsegment").as("segment"),
        col("c.c_acctbal").as("acctbal"),
        when(col("c.c_acctbal") >= 5000, lit("yes")).as("vip"),
        struct(col("nat.n_name").as("name"),
          col("nat.n_nationkey").as("key")).as("nation"))))
      .toDF.select(col("doc"))

  val defs: Seq[QueryDef] = Seq(

    // ---- q32: match with const / bind / where / nested / parent-as ----
    // match { "name": as nm, "segment": "BUILDING",
    //         "acctbal": as bal where bal < 7500,
    //         "vip": as v,
    //         "nation": { "name": as nat } as znat } in persons
    // Key-existence does real work: docs with acctbal < 5000 have no
    // "vip" key and are rejected even though bal < 7500 holds.
    QueryDef(
      "q32_match",
      (s, dir) => {
        Query.forIn("p", persons(s, dir))
          .matchRow(col("p.doc"), MP.Pat(Seq(
            MP.field("name").as("nm"),
            MP.field("segment").is("BUILDING"),
            MP.field("acctbal").as("bal").where(col("bal").cast("double") < 7500),
            MP.field("vip").as("v"),
            MP.field("nation").obj(MP.Pat(
              Seq(MP.field("name").as("nat")),
              bindParentTo = Some("znat"))))))
          .orderBy(col("nm"))
          .select("nm" -> col("nm"), "bal" -> col("bal").cast("double"),
            "v" -> col("v"), "nat" -> col("nat"), "znat" -> col("znat"))
      },
      Some("""
        SELECT c_name AS nm, c_acctbal AS bal, 'yes' AS v, n_name AS nat,
               '{"name":"' || n_name || '","key":' || n_nationkey || '}' AS znat
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        WHERE c_mktsegment = 'BUILDING' AND c_acctbal < 7500 AND c_acctbal >= 5000
        ORDER BY nm""")),

    // ---- q33: match EXACT (extra keys reject, at every level) ----
    // Pattern heads omit "vip" → only docs WITHOUT a vip key
    // (acctbal < 5000) survive; the nested pattern must name BOTH
    // nation keys or exact would reject every doc.
    QueryDef(
      "q33_match_exact",
      (s, dir) => {
        Query.forIn("p", persons(s, dir))
          .matchRow(col("p.doc"), MP.Pat(Seq(
            MP.field("name").as("nm"),
            MP.field("segment").is("AUTOMOBILE"),
            MP.field("acctbal").as("bal"),
            MP.field("nation").obj(MP.Pat(Seq(
              MP.field("name").as("nat"),
              MP.field("key").as("nkey")))))), exact = true)
          .orderBy(col("nm"))
          .select("nm" -> col("nm"), "bal" -> col("bal").cast("double"),
            "nat" -> col("nat"), "nkey" -> col("nkey").cast("long"))
      },
      Some("""
        SELECT c_name AS nm, c_acctbal AS bal, n_name AS nat,
               CAST(n_nationkey AS BIGINT) AS nkey
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        WHERE c_mktsegment = 'AUTOMOBILE' AND c_acctbal < 5000
        ORDER BY nm""")),

    // ---- q57: match over VARIANT (Spark 4 dynamic-type route) ----
    // Same pattern shape as q32, but the corpus is stored as Variant
    // (try_parse_json) and the matcher navigates the binary encoding
    // directly — no JSON text is rendered or re-parsed per field.
    // Observable delta vs the string route, pinned by the oracle: the
    // whole-object binding `znat` renders in KEY-SORTED order
    // ("key" before "name"), because the Variant format stores object
    // fields sorted and document order no longer exists after parse.
    QueryDef(
      "q57_match_variant",
      (s, dir) => {
        Query.forIn("p", persons(s, dir))
          .let("vdoc", try_parse_json(col("p.doc")))
          .matchRow(col("vdoc"), MP.Pat(Seq(
            MP.field("name").as("nm"),
            MP.field("segment").is("BUILDING"),
            MP.field("acctbal").as("bal").where(col("bal").cast("double") < 7500),
            MP.field("vip").as("v"),
            MP.field("nation").obj(MP.Pat(
              Seq(MP.field("name").as("nat")),
              bindParentTo = Some("znat"))))))
          .orderBy(col("nm"))
          .select("nm" -> col("nm"), "bal" -> col("bal").cast("double"),
            "v" -> col("v"), "nat" -> col("nat"), "znat" -> col("znat"))
      },
      Some("""
        SELECT c_name AS nm, c_acctbal AS bal, 'yes' AS v, n_name AS nat,
               '{"key":' || n_nationkey || ',"name":"' || n_name || '"}' AS znat
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        WHERE c_mktsegment = 'BUILDING' AND c_acctbal < 7500 AND c_acctbal >= 5000
        ORDER BY nm"""))
  )
}
