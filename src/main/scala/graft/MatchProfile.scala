package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.dsl.{MatchPattern => MP, Query}
import graft.functions.PathFunctions.{childPathV, pathSeqV, pathText}

/** Micro-profile for the judge's r10 #8 question: do the
  * CodegenFallback match/path expressions (Jackson parse + Variant
  * walk per row) DOMINATE at ×50, or is the accepted cost still the
  * right trade against a full `doGenCode` for a recursive-descent
  * matcher?
  *
  * Method: the q32 match pattern and the q34-shaped child-path walk
  * run over an f×-replicated JSON-doc frame (sf0.1 customer docs,
  * payload identical per copy), against a BASELINE pass over the same
  * frame that does the same JSON parse through Spark's codegen'd
  * `get_json_object` (one extraction per bound field). If the match
  * expression's wall clock stays within ~2× of the codegen'd
  * extraction route at ×50, the fallback is not the bottleneck —
  * the parse itself is — and promotion would buy little.
  */
object MatchProfile {
  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val factors = (if (args.length > 1) args(1) else "1,10,50")
      .split(",").map(_.trim.toInt).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // the q32 persons frame: one JSON doc per customer
    val base = Tables.load(spark, sfDir, "customer")
      .join(Tables.load(spark, sfDir, "nation"),
        col("c_nationkey") === col("n_nationkey"))
      .select(to_json(struct(
        col("c_name").as("name"), col("c_mktsegment").as("segment"),
        col("c_acctbal").as("acctbal"),
        when(col("c_acctbal") >= 5000, lit("yes")).as("vip"),
        struct(col("n_name").as("name"), col("n_nationkey").as("key"))
          .as("nation"))).as("doc"))

    factors.foreach { f =>
      val docs = (if (f == 1) base
        else base.crossJoin(spark.range(f).toDF("cp")).select(col("doc")))
        .localCheckpoint(eager = true)
      val n = docs.count()

      val (mRows, mSec) = time {
        Query.forIn("p", docs)
          .matchRow(col("p.doc"), MP.Pat(Seq(
            MP.field("name").as("nm"),
            MP.field("segment").is("BUILDING"),
            MP.field("acctbal").as("bal")
              .where(col("bal").cast("double") < 7500),
            MP.field("vip").as("v"),
            MP.field("nation").obj(MP.Pat(
              Seq(MP.field("name").as("nat")),
              bindParentTo = Some("znat"))))))
          .select("nm" -> col("nm")).toDF.count()
      }
      val (pRows, pSec) = time {
        docs.select(explode(pathText(childPathV(
            childPathV(pathSeqV(col("doc")), "nation"), "name")))
          .as("nat")).count()
      }
      // codegen'd baseline: same parse work via get_json_object
      val (bRows, bSec) = time {
        docs.select(
            get_json_object(col("doc"), "$.name").as("nm"),
            get_json_object(col("doc"), "$.segment").as("seg"),
            get_json_object(col("doc"), "$.acctbal").as("bal"),
            get_json_object(col("doc"), "$.vip").as("v"),
            get_json_object(col("doc"), "$.nation.name").as("nat"))
          .filter(col("seg") === "BUILDING" &&
            col("bal").cast("double") < 7500 && col("v").isNotNull)
          .count()
      }
      docs.unpersist()
      println(s"""{"factor":$f,"docs":$n,""" +
        s""""match_sec":$mSec,"match_rows":$mRows,""" +
        s""""path_sec":$pSec,"path_rows":$pRows,""" +
        s""""jsonpath_baseline_sec":$bSec,"baseline_rows":$bRows,""" +
        s""""match_vs_baseline":${mSec / bSec}}""")
    }
    spark.stop()
  }
}
