package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Physical-layout helpers for the 100 TB story: co-located joins via
  * bucketing. Two tables bucketed (and sorted) on the same key join
  * with NO exchange and NO sort — the shuffle is paid once at write
  * time instead of per query (LayoutSpec asserts the plan). At scale
  * this is the difference between re-shuffling the fact table on
  * every join and never shuffling it at all.
  */
object Layout {

  /** Write `df` bucketed+sorted by `keys` as a catalog table.
    * Idempotent across JVMs: a fresh in-memory catalog can't see a
    * previous run's managed table, so the stale location is removed
    * explicitly before the write.
    */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String],
      numBuckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir") + "/" + table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode("overwrite")
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
