package graft.sinks

import org.apache.spark.sql.types.StructType

/** Append-time schema resolution shared by the Delta and Iceberg logs.
  *
  * Before r10 a Delta append whose DataFrame schema drifted from the
  * table silently REPLACED the table's metaData — a column dropped by an
  * upstream refactor would quietly narrow a 100 TB table. Now drift is
  * an error unless the writer opts into `mergeSchema`, and even then
  * only the append-only evolution both formats define is allowed:
  *
  *   - columns shared with the table must keep their exact type
  *   - columns only in the DataFrame are APPENDED to the table schema,
  *     forced nullable (old files simply lack them → read as null)
  *   - columns only in the table stay (the new files lack them → null);
  *     order and existing positions never change, which is what keeps
  *     Iceberg's position-derived field ids stable across evolution
  */
private[graft] object SchemaEvolution {

  /** The TABLE schema this append commits under, or throw. */
  def resolve(tableSchema: StructType, dfSchema: StructType,
      mergeSchema: Boolean, what: String): StructType = {
    val tableByName = tableSchema.fields.map(f => f.name -> f).toMap
    val dfByName = dfSchema.fields.map(f => f.name -> f).toMap
    val clashes = dfSchema.fields.toSeq
      .flatMap(f => tableByName.get(f.name).map(t => (f, t)))
      .filter { case (f, t) => f.dataType != t.dataType }
    if (clashes.nonEmpty) throw new IllegalArgumentException(
      s"$what: column type drift on append: " + clashes.map { case (f, t) =>
        s"${f.name} is ${t.dataType.simpleString} in the table but " +
          s"${f.dataType.simpleString} in the batch" }.mkString("; ") +
        " (schema evolution never changes an existing column's type)")
    val dfOnly = dfSchema.fields.toSeq.filterNot(f => tableByName.contains(f.name))
    val tableOnly = tableSchema.fields.toSeq.filterNot(f => dfByName.contains(f.name))
    if (dfOnly.isEmpty && tableOnly.isEmpty) tableSchema
    else if (!mergeSchema) throw new IllegalArgumentException(
      s"$what: batch schema drifts from the table " +
        (if (dfOnly.nonEmpty) s"(new columns: ${dfOnly.map(_.name).mkString(", ")}) " else "") +
        (if (tableOnly.nonEmpty) s"(missing columns: ${tableOnly.map(_.name).mkString(", ")}) " else "") +
        "— set merge_schema=true to evolve the table (new columns append " +
        "as nullable; missing ones read as null), or fix the writer")
    else StructType(tableSchema.fields ++ dfOnly.map(_.copy(nullable = true)))
  }
}
