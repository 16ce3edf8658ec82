package graft.spark

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Plan-shape assertions — the ".explain and iterate" discipline frozen
  * into tests: pruning reaches the scan, small sides broadcast, native
  * expressions stay out of UDF nodes. */
class PlanSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("q_html_extract prunes unused columns at the parquet scan") {
    val df = graft.SparkEntry.queries("q_html_extract")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    // documents has (doc_id, text, lang, source, n_chars); n_chars unused
    assert(plan.contains("ReadSchema"))
    assert(!plan.contains("n_chars"), s"n_chars not pruned:\n$plan")
  }

  test("filter pushdown reaches the scan") {
    val df = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("doc_id") > 100)
      .select("doc_id", "source")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(doc_id), GreaterThan(doc_id,100)]"),
      s"filter not pushed:\n$plan")
  }

  test("ANN brute-force broadcasts the query side") {
    val df = graft.SparkEntry.queries("q_ann_self")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"query side not broadcast:\n$plan")
  }

  test("native html expressions appear as plain expressions, not UDFs") {
    val df = graft.SparkEntry.queries("q_html_entities")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("parse_html_text"))
    assert(!plan.contains("ScalaUDF"), s"UDF leaked into hot path:\n$plan")
  }

  test("salted repartition produces the configured partition count") {
    import spark.implicits._
    val cfg = Pipeline.Config(partitions = 6, giantBuckets = 2)
    val input = CorpusGen.inputDs(spark, 100, parallelism = 4).toDF()
    val out = Pipeline.saltedRepartition(input, cfg)
    assert(out.rdd.getNumPartitions == 8)
  }
}
