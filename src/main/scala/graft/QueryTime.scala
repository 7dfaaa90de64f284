package graft
import org.apache.spark.sql.SparkSession

/** Time individual registered queries (PlanDump's timing sibling):
  * `runMain graft.QueryTime q63_repetition_filter q67_boilerplate`.
  * Same session config and noop-sink forcing as Bench, one untimed
  * warmup per query, N timed repeats (SPARK_GRAFT_REPS, default 3).
  */
object QueryTime {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Metrics.register(spark)
    def force(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    args.foreach { name =>
      force(name) // warmup
      val times = (1 to reps).map(_ => force(name))
      println(f"[qtime] $name%-28s min=${times.min}%.2f med=${times.sorted.apply(reps / 2)}%.2f max=${times.max}%.2f")
    }
    spark.stop()
  }
}
