package graft

/** Mirrors the driver's t1 smoke gate: run SparkEntry.entry on sf0.001
  * and print the row count (must be > 0).
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = Tables.localSession("graft-smoke", cores = 8)
    val df = SparkEntry.entry(spark)
    val n = df.count()
    df.show(5, truncate = false)
    println(s"[smoke] entry rows=$n")
    spark.stop()
  }
}
