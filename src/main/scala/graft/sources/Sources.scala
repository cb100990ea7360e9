package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source connectors (SURVEY §2.1). Dozer's `Connector` trait does
  * snapshot-then-CDC per table (dozer-ingestion/connector/src/lib.rs:
  * 55-112); on Spark the same contract is `spark.read` (snapshot) and
  * `spark.readStream` (continuous) over the same location, with
  * checkpointing standing in for `OpIdentifier` resume tokens.
  *
  * Kafka/Debezium and JDBC-CDC connectors are config-level additions
  * (format("kafka") etc.) — the object-store connectors (parquet/CSV,
  * dozer-ingestion/object-store) and push sources are covered here.
  */
object Sources {

  /** Batch snapshot of a parquet/csv/json table directory. */
  def snapshot(spark: SparkSession, path: String, format: String = "parquet",
      options: Map[String, String] = Map.empty): DataFrame =
    spark.read.format(format).options(options).load(path)

  /** File stream: picks up new files in `path` — the object-store
    * connector's tailing mode. Schema must be supplied (streaming
    * sources cannot infer).
    */
  def fileStream(spark: SparkSession, path: String, schema: StructType,
      format: String = "parquet", maxFilesPerTrigger: Int = 16): DataFrame =
    spark.readStream.format(format)
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .load(path)

  /** Rate source for load testing (the gRPC push-source stand-in). */
  def rate(spark: SparkSession, rowsPerSecond: Int): DataFrame =
    spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond).load()

  /** A CDC file stream: change-log rows with _op/_seq columns (see
    * graft.cdc.ChangeModel) arriving as files — the Debezium-topic
    * shape without a broker.
    */
  def cdcFileStream(spark: SparkSession, path: String, schema: StructType)
      : DataFrame = {
    require(schema.fieldNames.contains(graft.cdc.ChangeModel.OpCol) &&
      schema.fieldNames.contains(graft.cdc.ChangeModel.SeqCol),
      s"CDC stream schema needs ${graft.cdc.ChangeModel.OpCol}/${graft.cdc.ChangeModel.SeqCol}")
    fileStream(spark, path, schema)
  }
}
