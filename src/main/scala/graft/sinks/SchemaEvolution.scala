package graft.sinks

import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}

/** Append-time schema resolution shared by the Delta and Iceberg logs.
  *
  * Before r10 a Delta append whose DataFrame schema drifted from the
  * table silently REPLACED the table's metaData — a column dropped by an
  * upstream refactor would quietly narrow a 100 TB table. Now drift is
  * an error unless the writer opts into `mergeSchema`, and even then
  * only the append-only evolution both formats define is allowed:
  *
  *   - columns shared with the table must keep their exact type
  *   - a column differing from a table column ONLY IN CASE is an error:
  *     Spark analysis is case-insensitive by default, so evolving `ID`
  *     next to `id` would make every later read ambiguous
  *   - columns only in the DataFrame are APPENDED to the table schema,
  *     forced nullable (old files simply lack them → read as null)
  *   - columns only in the table stay (the new files lack them → null);
  *     order and existing positions never change, which is what keeps
  *     Iceberg's position-derived field ids stable across evolution
  */
private[graft] object SchemaEvolution {

  /** Structural compatibility for drift detection, oriented BATCH →
    * TABLE. Field METADATA is a write-shape detail (a mapped table's
    * columnMapping metadata lives only on the table side), and nested
    * nullability relaxes in one direction only (r17): a non-null batch
    * field — e.g. a struct built from literals — appends fine into a
    * table field declared nullable, but a NULLABLE batch field into a
    * REQUIRED table field is refused, because no row-level null check
    * runs at append time and a null landing in an iceberg
    * `"required": true` / delta non-nullable column is a silent
    * constraint violation for every conformant reader. Field NAMES and
    * primitive types still compare exactly.
    */
  private def sameShape(batch: DataType, table: DataType): Boolean =
    (batch, table) match {
      case (x: StructType, y: StructType) =>
        x.length == y.length && x.fields.zip(y.fields).forall { case (f, g) =>
          f.name == g.name && (g.nullable || !f.nullable) &&
            sameShape(f.dataType, g.dataType) }
      case (x: ArrayType, y: ArrayType) =>
        (y.containsNull || !x.containsNull) &&
          sameShape(x.elementType, y.elementType)
      case (x: MapType, y: MapType) =>
        (y.valueContainsNull || !x.valueContainsNull) &&
          sameShape(x.keyType, y.keyType) && sameShape(x.valueType, y.valueType)
      case _ => batch == table
    }

  /** The shared-column checks every evolution path runs: exact-type
    * match on same-named columns, no case-variant collisions. Returns
    * the DataFrame-only fields (genuinely new columns).
    */
  private def checkShared(tableSchema: StructType, dfSchema: StructType,
      what: String) = {
    val tableByName = tableSchema.fields.map(f => f.name -> f).toMap
    val tableByLower = tableSchema.fields.map(f => f.name.toLowerCase -> f).toMap
    // top-level nullability is NOT checked here: every file-sourced
    // DataFrame is declared nullable, so a declared-only refusal would
    // break the ordinary read-transform-append flow — instead
    // [[withRequiredGuards]] adds a ROW-LEVEL null check at write time
    // (delta-spark's invariant behavior, iceberg-java's required-field
    // write check). Nested fields keep the declared one-way refusal in
    // [[sameShape]] — no guard can be spliced below a struct cheaply,
    // and nested batches are built explicitly.
    val clashes = dfSchema.fields.toSeq
      .flatMap(f => tableByName.get(f.name).map(t => (f, t)))
      .filter { case (f, t) => !sameShape(f.dataType, t.dataType) }
    if (clashes.nonEmpty) throw new IllegalArgumentException(
      s"$what: column type drift on append: " + clashes.map { case (f, t) =>
        s"${f.name} is ${t.dataType.simpleString} in the table but " +
          s"${f.dataType.simpleString} in the batch" +
          // simpleString hides nullability, so a nullability-only clash
          // would otherwise print two identical types
          (if (f.dataType.simpleString == t.dataType.simpleString)
             " (nullability: a nullable batch field cannot append into a " +
               "required table field)"
           else "") }.mkString("; ") +
        " (schema evolution never changes an existing column's type)")
    val caseVariants = dfSchema.fields.toSeq
      .filterNot(f => tableByName.contains(f.name))
      .flatMap(f => tableByLower.get(f.name.toLowerCase).map(t => (f, t)))
    if (caseVariants.nonEmpty) throw new IllegalArgumentException(
      s"$what: " + caseVariants.map { case (f, t) =>
        s"batch column ${f.name} differs only in case from table column " +
          s"${t.name}" }.mkString("; ") +
        " (Spark analysis is case-insensitive — evolving both would make " +
        "every later read ambiguous; rename the batch column)")
    dfSchema.fields.toSeq.filterNot(f => tableByName.contains(f.name))
  }

  /** The TABLE schema this append commits under, or throw. */
  def resolve(tableSchema: StructType, dfSchema: StructType,
      mergeSchema: Boolean, what: String): StructType = {
    val dfOnly = checkShared(tableSchema, dfSchema, what)
    val dfByName = dfSchema.fields.map(f => f.name -> f).toMap
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

  /** Row-level required-column guard (r17): for every batch column
    * DECLARED nullable that lands in a table column declared REQUIRED,
    * wrap the value so the WRITE JOB fails on the first actual null
    * instead of silently landing it — the delta-spark invariant /
    * iceberg-java required-field behavior. Zero extra pass (the guard
    * rides the write projection, codegen'd); columns with matching
    * declarations pass through untouched.
    */
  def withRequiredGuards(df: org.apache.spark.sql.DataFrame,
      tableSchema: StructType): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{col, lit, raise_error, when}
    val tableByName = tableSchema.fields.map(f => f.name -> f).toMap
    val guarded = df.schema.fields.filter(f =>
      f.nullable && tableByName.get(f.name).exists(!_.nullable))
    if (guarded.isEmpty) df
    else guarded.foldLeft(df) { (d, f) =>
      d.withColumn(f.name, when(col(s"`${f.name}`").isNull,
        raise_error(lit(s"required column ${f.name} received a NULL on " +
          "append (the table declares it non-nullable); fix the writer " +
          "or relax the column")))
        .otherwise(col(s"`${f.name}`")))
    }
  }

  /** Upsert-batch variant: a MERGE source may legitimately carry a
    * SUBSET of the table's columns (update just those), so table-only
    * columns are never an error here — but shared-column type drift and
    * case collisions still are, and batch-only columns still need the
    * `mergeSchema` opt-in. Returns the columns to append.
    */
  def resolveNewColumns(tableSchema: StructType, dfSchema: StructType,
      mergeSchema: Boolean, what: String): Seq[(String, DataType)] = {
    val dfOnly = checkShared(tableSchema, dfSchema, what)
    if (dfOnly.nonEmpty && !mergeSchema) throw new IllegalArgumentException(
      s"$what: batch carries columns the table lacks: " +
        dfOnly.map(_.name).mkString(", ") +
        " — set merge_schema=true to evolve the table (new columns append " +
        "as nullable), or fix the writer")
    dfOnly.map(f => f.name -> f.dataType)
  }
}
