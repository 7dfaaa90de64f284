package graft
import org.apache.spark.sql.SparkSession
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = Tables.localSession("plandump", 8)
    // override with SPARK_GRAFT_SF_DIR to read plans at another scale
    // (e.g. sf0.1, where the narrow-scan widening engages)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.001")
    for (n <- args) {
      println(s"===== $n =====")
      // _rawscan:<table>: dump a bare filter+project over the loaded
      // table — verifies pushdown/pruning through the narrow-scan
      // widening without any query on top
      if (n.startsWith("_rawscan:")) {
        import org.apache.spark.sql.functions.col
        Tables.load(spark, dir, n.stripPrefix("_rawscan:"))
          .filter(col("lang") === "en").select("doc_id", "lang")
          .explain("formatted")
      } else SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
