package graft.sources

import java.io.File

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** RDBMS source (SURVEY §2.1 #14). The reference hand-rolls SQL
  * generation + pushdown for PostgreSQL/MySQL
  * (`sources/postgresql.py:437-610`); on Spark the same capability is
  * `spark.read.jdbc`, where the DataSource pushes filters and column
  * pruning into the generated SQL (PushedFilters in the scan plan —
  * asserted in JdbcSpec).
  *
  * The demo engine is embedded Derby (in Spark's classpath, zero
  * network); the access path is identical for any JDBC database —
  * swap the URL/driver.
  */
object JdbcSource {
  private val driver = "org.apache.derby.jdbc.EmbeddedDriver"

  /** Local Derby database under target/ (never outside the repo). */
  def derbyUrl(name: String): String = {
    System.setProperty("derby.stream.error.file",
      new File("target/derby.log").getAbsolutePath)
    val path = new File(s"target/derby/$name").getAbsolutePath
    s"jdbc:derby:$path;create=true"
  }

  def write(df: DataFrame, url: String, table: String): Unit =
    df.write.mode("overwrite").format("jdbc")
      .option("url", url).option("dbtable", table)
      .option("driver", driver).save()

  def read(spark: SparkSession, url: String, table: String): DataFrame =
    spark.read.format("jdbc")
      .option("url", url).option("dbtable", table)
      .option("driver", driver).load()

  /** Round-trip a DataFrame through the RDBMS and read it back with a
    * filter — the q37 shape: predicate + projection run INSIDE the
    * database (at scale: only matching rows cross the wire).
    */
  def roundTrip(spark: SparkSession, src: DataFrame, table: String): DataFrame = {
    val url = derbyUrl("graftdb")
    write(src, url, table)
    read(spark, url, table)
  }
}
