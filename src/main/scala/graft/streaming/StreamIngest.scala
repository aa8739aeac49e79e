package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Structured-Streaming ingestion: the Spark-native generalization of the
  * reference's "wait for today's file, then load it" loop
  * (process_orders.py:23-28 + shared.py:3-25). A file-source stream
  * subsumes the sensor (S1), the normalize step (S2 — the stamp column),
  * and the staging load (S3): new CSVs landing in `inDir` flow to
  * parquet `outDir` exactly once, checkpointed.
  *
  * The reference is a daily batch system (docs/guides.md:16), so this is
  * the optional continuous path (SURVEY.md §7.5); the default pipeline
  * stays batch. `Trigger.AvailableNow` drains everything currently in
  * the directory then stops — which is precisely "process today's file"
  * run on a schedule, but with exactly-once bookkeeping instead of a
  * sensor.
  */
object StreamIngest {

  /** Open the stream: CSV files matching `inDir` glob, explicit schema,
    * `processed_time` = each file's ingestion wall-clock replaced by a
    * fixed batch stamp for determinism. */
  def readCsvStream(spark: SparkSession, inDir: String, schema: StructType,
                    batchTs: String): DataFrame =
    spark.readStream
      .option("header", "true")
      .schema(schema)
      .csv(inDir)
      .withColumn("processed_time", to_timestamp(lit(batchTs)))

  /** Drain-available-and-stop into parquet with checkpointing: each file
    * is ingested exactly once across invocations. */
  def drainToParquet(df: DataFrame, outDir: String, checkpointDir: String): StreamingQuery =
    df.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
