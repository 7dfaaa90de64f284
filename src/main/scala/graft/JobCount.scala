package graft

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Per-query scheduling-cost profile (the r15 optimization round's
  * measurement tool, guide §1): for each named registered query —
  * or every benched query with no args — run once untimed (warm
  * caches/codegen), then once timed while counting Spark jobs,
  * stages and tasks via a listener. At sf0.1 the tables are tiny, so
  * wall-clock is dominated by driver round-trips (job submissions,
  * AQE stage materializations) — jobs/stages ARE the cost model, and
  * they are also what a 100 TB run pays as synchronization barriers.
  * Output: one `[jobcount]` line per query, sortable.
  */
object JobCount {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.cleaner.periodicGC.interval", "30s")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Metrics.register(spark)

    val jobs = new LongAdder
    val stages = new LongAdder
    val tasks = new LongAdder
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.add(1)
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages.add(1)
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = tasks.add(1)
    })

    val names =
      if (args.nonEmpty) args.toSeq
      else SparkEntry.queries.keys.toSeq
        .filterNot(SparkEntry.benchExempt).sorted
    def force(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    names.foreach { name =>
      force(name) // warm
      // listener events are async: settle before snapshotting
      org.apache.spark.GraftListenerBridge.waitUntilEmpty(spark.sparkContext)
      val (j0, s0, t0) = (jobs.sum, stages.sum, tasks.sum)
      val sec = force(name)
      org.apache.spark.GraftListenerBridge.waitUntilEmpty(spark.sparkContext)
      println(f"[jobcount] $name%-28s sec=$sec%7.3f jobs=${jobs.sum - j0}%3d " +
        f"stages=${stages.sum - s0}%3d tasks=${tasks.sum - t0}%5d")
    }
    spark.stop()
  }
}
