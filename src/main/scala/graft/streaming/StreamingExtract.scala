package graft.streaming

import graft.spark.{DocRow, MetricsRow, Pipeline}
import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Structured-Streaming front end for the extraction pipeline.
  *
  * The reference has no cross-document streaming (its "chunk parsing",
  * myhtml.c:309-355, is intra-document incremental IO — SURVEY §1.3), so
  * this is the Spark-native growth path: new parquet files landing in a
  * directory are discovered by the file source, run through the SAME
  * per-row kernel, and committed exactly-once per input file via the
  * streaming checkpoint — an alternative resumability story to the
  * batch pipeline's committed-batch markers (north_rule).
  */
object StreamingExtract {

  val docSchema = Encoders.product[DocRow].schema

  /** Continuous mode: follow `inputDir` forever (micro-batches). */
  def start(spark: SparkSession, inputDir: String, outDir: String,
            checkpointDir: String, cfg: Pipeline.Config = Pipeline.Config(),
            availableNowOnly: Boolean = false): StreamingQuery = {
    import spark.implicits._
    val stream = spark.readStream
      .schema(docSchema)
      .option("maxFilesPerTrigger", "64")
      .parquet(inputDir)

    val writer = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // same salted repartition + kernel as the batch pipeline;
        // per-micro-batch metrics appended next to the output
        val acc = new org.apache.spark.util.CollectionAccumulator[MetricsRow]
        batch.sparkSession.sparkContext.register(acc, s"graft.stream.$batchId")
        val salted = Pipeline.saltedRepartition(batch, cfg).as[DocRow]
        Pipeline.extractDataset(salted, cfg, batchId.toInt, acc)
          .write.mode("append").parquet(s"$outDir/data")
        val rows = scala.jdk.CollectionConverters.ListHasAsScala(acc.value).asScala.toSeq
        if (rows.nonEmpty)
          batch.sparkSession.createDataset(rows)
            .write.mode("append").parquet(s"$outDir/metrics")
        ()
      }
    (if (availableNowOnly) writer.trigger(Trigger.AvailableNow()) else writer)
      .start()
  }

  /** Drain whatever is in `inputDir` right now and stop (used by tests
    * and backfills). */
  def drain(spark: SparkSession, inputDir: String, outDir: String,
            checkpointDir: String, cfg: Pipeline.Config = Pipeline.Config()): Unit = {
    val q = start(spark, inputDir, outDir, checkpointDir, cfg, availableNowOnly = true)
    q.awaitTermination()
  }
}
