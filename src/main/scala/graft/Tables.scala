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

  // events.ts contract for callers: nanos-since-epoch LONG (callers
  // derive ms via `ts DIV 1000000` — integer-exact, matches DuckDB
  // epoch_ms). The driver's parquet has shipped it two ways across
  // rounds — TIMESTAMP(NANOS) (read as long via
  // spark.sql.legacy.parquet.nanosAsLong=true, which every session
  // sets) and TIMESTAMP(MICROS) (read as TIMESTAMP_NTZ under Spark 4's
  // inferTimestampNTZ default) — so the loader normalizes BY TYPE at
  // load instead of letting 20 call sites care. The NTZ→long path is
  // integer-exact too: sessions run in UTC, so unix_micros of the
  // wall-clock cast is the same instant DuckDB's epoch_ms reads from
  // the naive timestamp.
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") normalizeEventsTs(df) else df
  }

  private def normalizeEventsTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    df.schema.find(_.name == "ts").map(_.dataType) match {
      case Some(LongType) | None => df
      case Some(TimestampType) | Some(TimestampNTZType) =>
        df.withColumn("ts",
          unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
      case Some(other) =>
        throw new IllegalStateException(
          s"events.ts has unsupported parquet type $other")
    }
  }

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
