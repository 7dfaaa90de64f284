package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.dsl.Query

/** q39: nested result construction — the reference's subquery-builds-
  * nested-JSON pattern (tutorial q10, `tests/tutorial_tests.py:96-102`):
  * per outer tuple, an inner query's result embeds as a JSON array of
  * objects. Spark-first shape: group-by auto-nesting (the DSL's
  * reference semantics) + to_json over the sorted struct list — one
  * shuffle, no re-entrant subquery execution per tuple.
  */
object NestedQueries {

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q39_nested_json",
      (s, dir) => {
        Query.forIn("c", Tables.load(s, dir, "customer"))
          .forIn("nat", Tables.load(s, dir, "nation"), hint = "broadcast")
          .where(col("c.c_nationkey") === col("nat.n_nationkey") &&
            col("c.c_acctbal") > 9000)
          .groupBy("n_name" -> col("nat.n_name"))
          .let("members", to_json(sort_array(transform(col("c"), x =>
            struct(x.getField("c_custkey").as("custkey"),
              x.getField("c_name").as("name"))))))
          .let("n_members", size(col("c")).cast("long"))
          .orderBy(col("n_name"))
          .select("n_name" -> col("n_name"), "members" -> col("members"),
            "n_members" -> col("n_members"))
      },
      Some("""
        SELECT n_name,
               '[' || array_to_string(
                 list(json_object('custkey', c_custkey, 'name', c_name)::VARCHAR
                      ORDER BY c_custkey), ',') || ']' AS members,
               COUNT(*) AS n_members
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        WHERE c_acctbal > 9000
        GROUP BY n_name
        ORDER BY n_name"""))
  )
}
