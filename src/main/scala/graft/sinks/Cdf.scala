package graft.sinks

import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Change-data-feed vocabulary shared by the table formats (public
  * protocol: delta.io PROTOCOL.md "Change Data Files" + delta-spark's
  * CDF column contract; Iceberg's changelog-scan equivalent derives the
  * same row shape from manifest diffs).
  *
  * A change row is a table row plus `_change_type` ∈
  * {`insert`, `delete`, `update_preimage`, `update_postimage`}; batch
  * change reads additionally stamp `_commit_version` and
  * `_commit_timestamp`. Update pairs carry the SAME key in both images,
  * so a downstream retraction consumer treats `delete`/`update_preimage`
  * as retracts and `insert`/`update_postimage` as appends — exactly the
  * engine's `_updating_meta` stream shape
  * ([[graft.streaming.Debezium]]; reference semantics:
  * crates/arroyo-types/src/lib.rs:233-276 Debezium updating streams).
  */
object Cdf {

  /** delta-spark's CDF column names (public contract). */
  val changeTypeCol = "_change_type"
  val commitVersionCol = "_commit_version"
  val commitTimestampCol = "_commit_timestamp"

  /** The delta table property that turns the feed on (public name). */
  val enableProp = "delta.enableChangeDataFeed"

  /** Directory DML verbs write change files under (protocol name). */
  val changeDataDir = "_change_data"

  def isEnabled(configuration: Map[String, String]): Boolean =
    configuration.get(enableProp).exists(_.equalsIgnoreCase("true"))

  /** Table schema + `_change_type`. */
  def changeSchema(schema: StructType): StructType =
    StructType(schema.fields :+
      StructField(changeTypeCol, StringType, nullable = true))
}
