package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** File-source ingestion with an explicit corrupt-record channel —
  * the file-side analogue of the JDBC scans in [[Tables]]: at 100 TB a
  * single malformed row must neither kill the job (FAILFAST) nor
  * silently vanish (DROPMALFORMED); it lands in a quarantine column
  * the pipeline routes to a dead-letter sink.
  */
object Files {

  val CorruptCol = "_corrupt_record"

  private def withCorrupt(schema: StructType): StructType =
    if (schema.fieldNames.contains(CorruptCol)) schema
    else StructType(schema.fields :+ StructField(CorruptCol, StringType))

  /** Schema-enforced CSV read: PERMISSIVE parsing with malformed rows
    * captured whole in [[CorruptCol]]. The explicit schema keeps the
    * read single-pass (schema inference scans the data twice and is
    * banned at scale).
    */
  def csv(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true, delimiter: String = ","): DataFrame =
    spark.read
      .schema(withCorrupt(schema))
      .option("header", header.toString)
      .option("delimiter", delimiter)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .csv(path)

  /** Schema-enforced JSON-lines read, same corrupt-record contract. */
  def jsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(withCorrupt(schema))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)

  /** Split an ingested frame into (clean, quarantined). Clean rows
    * drop the corrupt column; quarantined rows keep the raw record for
    * the dead-letter sink. Two filters over one scan — map-side only.
    *
    * Spark guardrail worth knowing: a query whose referenced columns
    * are ONLY the corrupt column (e.g. `bad.select(CorruptCol)` or a
    * bare `bad.count()`) is rejected on raw CSV/JSON scans
    * (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — keep at least one data
    * column in the projection, or persist the parsed frame first.
    */
  def quarantine(df: DataFrame): (DataFrame, DataFrame) = {
    require(df.columns.contains(CorruptCol),
      s"quarantine expects a frame read via Files (missing $CorruptCol)")
    (df.filter(col(CorruptCol).isNull).drop(CorruptCol),
      df.filter(col(CorruptCol).isNotNull))
  }
}
