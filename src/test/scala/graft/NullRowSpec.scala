package graft

import org.apache.spark.sql.functions._

/** Dirty-row robustness: real crawls contain NULL text, empty text,
  * whitespace-only text, and NULL class columns — the advisor flagged
  * NULL-semantics divergences twice (q85's NOT IN, q88's USING join),
  * so this spec runs the ENTIRE query registry against a corpus
  * seeded with exactly those rows and requires every query to
  * complete (dirty rows may be filtered or carried, but never crash
  * an operator or poison a whole stage).
  */
class NullRowSpec extends SparkSpec {

  private lazy val nullyDir: String = {
    val dir = new java.io.File("target/nully_sf").getAbsolutePath
    Tables.names.foreach { t =>
      val base = Tables.load(spark, sf0001, t)
      val out =
        if (t != "documents") base
        else {
          val dirty = spark.createDataFrame(
            spark.sparkContext.parallelize(Seq(
              org.apache.spark.sql.Row(900001L, null, "en", "srcX", 0L),
              org.apache.spark.sql.Row(900002L, "", "en", "srcX", 0L),
              org.apache.spark.sql.Row(900003L, "   ", null, "srcX", 3L),
              org.apache.spark.sql.Row(900004L, "plain clean text row",
                null, null, 20L))),
            base.schema)
          base.unionByName(dirty)
        }
      out.write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  test("every registered query completes on a corpus seeded with " +
      "NULL/empty/whitespace text and NULL lang/source rows") {
    val failures = scala.collection.mutable.ListBuffer[String]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try fn(spark, nullyDir).count()
      catch { case e: Throwable =>
        failures += s"$name: ${e.getClass.getSimpleName} ${e.getMessage}"
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
