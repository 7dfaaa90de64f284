package graft

import org.apache.spark.sql.functions._

/** File-format source round-trips (the reference reads files/objects
  * via to_df/wrap_df — pythonql `pandas_lib.py`): the engine's access
  * paths for CSV and JSON preserve values against the parquet
  * original.
  */
class SourcesSpec extends SparkSpec {

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.select(col("n_nationkey").cast("long"), col("n_name"),
      col("n_regionkey").cast("long"))
      .orderBy(col("n_nationkey"))
      .collect().map(_.toString).toSeq

  test("CSV and JSON round-trips match the parquet source") {
    val nation = Tables.load(spark, sf0001, "nation")
    val base = new java.io.File("target/sources-test").getAbsolutePath

    nation.write.mode("overwrite").option("header", "true")
      .csv(s"$base/nation_csv")
    val csv = spark.read.option("header", "true")
      .option("inferSchema", "true").csv(s"$base/nation_csv")
    assert(canon(csv) == canon(nation))

    nation.write.mode("overwrite").json(s"$base/nation_json")
    val json = spark.read.json(s"$base/nation_json")
    assert(canon(json) == canon(nation))
  }
}
