package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated TPC-H-ish parquet tables
  * (TESTDATA.md). Schemas are discovered at load; callers must not
  * hand-declare them (FIXTURES.md §8).
  *
  * At 100 TB these would be partitioned/bucketed catalog tables; the
  * loader keeps the access path behind one function so a catalog swap
  * (`spark.table`) is a one-line change.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // events.ts is TIMESTAMP(NANOS), which Spark 4 rejects by default;
  // sessions must set spark.sql.legacy.parquet.nanosAsLong=true ONCE at
  // build time (localSession / Verify / Bench / test fixture do), so it
  // reads as nanos-since-epoch long (callers derive ms via
  // `ts DIV 1000000` — integer-exact, matches DuckDB epoch_ms).
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Convenience bundle of all tables at a scale-factor dir. */
  final case class Tpch(spark: SparkSession, dir: String) {
    def region: DataFrame     = load(spark, dir, "region")
    def nation: DataFrame     = load(spark, dir, "nation")
    def customer: DataFrame   = load(spark, dir, "customer")
    def supplier: DataFrame   = load(spark, dir, "supplier")
    def part: DataFrame       = load(spark, dir, "part")
    def orders: DataFrame     = load(spark, dir, "orders")
    def lineitem: DataFrame   = load(spark, dir, "lineitem")
    def events: DataFrame     = load(spark, dir, "events")
    def documents: DataFrame  = load(spark, dir, "documents")
    def embeddings: DataFrame = load(spark, dir, "embeddings")
  }

  def apply(spark: SparkSession, dir: String): Tpch = Tpch(spark, dir)

  /** Local session tuned per the builder contract: shuffle partitions
    * sized to cores (not 200), AQE on for runtime re-planning (skew
    * joins, partition coalescing) — the settings that transfer to a
    * real cluster.
    */
  def localSession(appName: String, cores: Int = 32): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Metrics.register(spark)
    spark
  }
}
