package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator demo: a Spark query plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle.
  * Column names/aliases MUST match between `fn` output and `oracle` —
  * the driver sorts columns by name before hashing.
  *
  * `inBench = false` keeps a query in the correctness registry but
  * out of the timed bench sweep — for deliberate O(n²) oracle anchors
  * (q41) whose point is exactness, not throughput.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    inBench: Boolean = true)

object QueryDef {
  /** Registry assembled by SparkEntry from each module's `defs`. */
  def toMaps(all: Seq[QueryDef])
      : (Map[String, (SparkSession, String) => DataFrame], Map[String, String]) = {
    val qs = all.map(d => d.name -> d.fn).toMap
    val os = all.flatMap(d => d.oracle.map(d.name -> _)).toMap
    (qs, os)
  }

  /** Names excluded from the timed bench sweep. */
  def benchExempt(all: Seq[QueryDef]): Set[String] =
    all.filterNot(_.inBench).map(_.name).toSet
}
