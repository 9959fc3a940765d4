package graft.sinks

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.UUID
import scala.jdk.CollectionConverters._

/** The ONE plan → touch-detect → scratch-write → empty-part-drop →
  * conflict-retry cycle behind copy-on-write DELETE/UPDATE/MERGE on both
  * table formats. Before r11 [[DeltaLog]] and [[IcebergLog]] each carried
  * a ~75-line private copy of this cycle and they had already drifted in
  * small unforced ways; every future DML fix had to be made twice or it
  * silently applied to one format. The conflict and rewrite semantics
  * now live HERE, parameterized over the three things a format actually
  * owns — snapshot/plan, stats harvest, and the atomic commit
  * ([[Format]]) — so a fix or feature (the r11 change feed, for one)
  * lands once.
  *
  * Cycle semantics (unchanged from r10, now shared):
  *   1. plan: stats-pruned candidate files, judged driver-side against
  *      metadata only (`scanFilter`)
  *   2. touch-detect: which candidates really hold a matching row —
  *      parquet row-group pushdown keeps the scan cheap; files are keyed
  *      by URI-decoded absolute path (input_file_name returns a
  *      percent-encoded `file:` URI), and the file column is captured
  *      BEFORE `matcher` runs (a MERGE matcher joins against the source
  *      frame, where input_file_name would be ambiguous)
  *   3. rewrite: `transform` maps the touched files' rows to their
  *      replacements (it may union in brand-new rows — MERGE's inserts);
  *      parts whose every row was deleted rewrite to zero rows and are
  *      dropped instead of committing row-less files
  *   4. commit: ONE atomic remove+add version guarded against both
  *      conflict classes (ConcurrentDeleteRead: a touched file was
  *      concurrently removed; ConcurrentAppend: a concurrently-added
  *      file MAY hold matching rows — `conflictPred=None` means any
  *      concurrent add conflicts). A loss cleans up the placed files and
  *      re-plans from the fresh snapshot, up to 5 rounds.
  */
private[sinks] object DmlRewrite {

  /** One candidate file of the planning snapshot: the absolute path
    * (what input_file_name reports, URI-decoded) plus the format's
    * removal token (delta: log-relative path; iceberg: manifest
    * absolute path) and on-disk size (rewrite output sizing).
    */
  final case class Cand(absPath: String, token: String, size: Long)

  /** One planning round's snapshot view. `conflictBase` = every live
    * file at plan time; anything live at commit time that is NOT in it
    * is a potential ConcurrentAppend conflict the commit must judge.
    */
  final case class Plan(schema: StructType, partitionColumns: Seq[String],
      candidates: Seq[Cand], conflictBase: Set[String])

  /** Format adapter: `A` = the format's per-added-file metadata,
    * `V` = its committed-version type.
    */
  trait Format[A, V] {
    def table: String
    /** Fresh snapshot + stats-pruned candidates (metadata-only). */
    def plan(scanFilter: Option[String]): Plan
    /** basePath for hive partition-column recovery on file reads. */
    def basePath: String
    /** Directory rewritten parts land in, preserving hive subdirs
      * (delta: the table root; iceberg: `table/data`).
      */
    def dataRoot: Path
    def scratchPrefix: String
    /** Stats-harvest one placed file: (added-file metadata, record
      * count — Long.MaxValue when unknown, so unknown NEVER drops a
      * part as empty).
      */
    def harvest(dest: Path, plan: Plan): (A, Long)
    /** Remove a placed file after a lost commit race. */
    def deletePlaced(a: A): Unit
    /** The atomic remove+add commit, guarded by both conflict classes
      * against `plan.conflictBase`; None = lost, the cycle re-plans.
      * `changes` = this verb's change rows (schema + `_change_type`),
      * present only when the table records a change feed — the delta
      * adapter writes them as `_change_data/` files + `cdc` actions in
      * the SAME commit; iceberg derives its changelog from manifests
      * and ignores them.
      */
    def commit(plan: Plan, added: Seq[A], touchedTokens: Seq[String],
        conflictPred: Option[String], changes: Option[DataFrame]): Option[V]
    /** Whether this table records a change feed (gates the `changes`
      * computation so non-CDF tables pay nothing).
      */
    def changeFeedEnabled: Boolean = false
    /** Format hook over the rewrite output right before the scratch
      * write — iceberg stamps its parquet field ids here; delta keeps
      * the identity except on column-mapped tables (physical-shape
      * projection).
      */
    def stampOutput(df: DataFrame, plan: Plan): DataFrame = df
    /** Partition columns AS WRITTEN in the rewrite output — differs
      * from the plan's logical names on delta column-mapped tables,
      * where hive dirs (and so partitionValues keys) are physical.
      */
    def writePartitionColumns(plan: Plan): Seq[String] = plan.partitionColumns
    /** Extra columns `readFiles` attaches that must SURVIVE past the
      * schema projection into `transform` and the written output —
      * iceberg's v3 row-lineage materialization (`_row_id`,
      * `_last_updated_sequence_number`) rides here (r16). `transform`
      * must emit them (pass-through, bump-to-null, or null for
      * inserted rows); empty (the default) keeps the legacy shape.
      */
    def carryFields: Seq[org.apache.spark.sql.types.StructField] = Seq.empty
    /** Read `paths` as this format's LIVE rows (hive partition recovery
      * via `basePath`); `fileCol` additionally captures each row's
      * source file as an absolute path/URI that
      * [[DeltaLog.decodeFileUri]] maps back to the plan's absolute
      * path. Default: a plain parquet scan. A format with merge-on-read
      * deletes overrides it so a copy-on-write rewrite can never
      * resurrect position-deleted rows.
      */
    def readFiles(spark: SparkSession, schema: StructType, paths: Seq[String],
        fileCol: Option[String]): DataFrame = {
      val df0 = spark.read.schema(schema).option("basePath", basePath)
        .parquet(paths: _*)
      fileCol.map(c => df0.withColumn(c,
        org.apache.spark.sql.functions.input_file_name())).getOrElse(df0)
    }
  }

  /** Run the cycle. `matcher` narrows candidate rows to matching ones
    * (its input-file set is the rewrite set); `touchDetect=false` skips
    * the matching scan entirely — nothing is rewritten, `transform`
    * output lands as pure adds (the insert-only MERGE fast path).
    * `transform(touched, candidates, schema)` maps the touched files'
    * rows to their replacements; the candidate frame is for anti-join
    * uses that must see every possibly-matching row without rewriting
    * them. `changes(touched, candidates, schema)` computes the verb's
    * change rows (insert-only paths derive them from the candidate
    * frame, since nothing was touched).
    */
  def run[A, V](spark: SparkSession, fmt: Format[A, V],
      scanFilter: Option[String], conflictPred: Option[String],
      matcher: DataFrame => DataFrame,
      commitWhenUntouched: Boolean = false,
      touchDetect: Boolean = true,
      changes: Option[(DataFrame, DataFrame, StructType) => DataFrame] = None)
      (transform: (DataFrame, DataFrame, StructType) => DataFrame): Option[V] = {
    import org.apache.spark.sql.functions.{col, lit}
    var round = 0
    while (round < 5) {
      round += 1
      val plan = fmt.plan(scanFilter)
      val candidates = plan.candidates
      if (candidates.isEmpty && !commitWhenUntouched) return None
      val byAbs = candidates.map(c => c.absPath -> c).toMap
      val carry = fmt.carryFields
      val emptyDf = spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
        StructType(plan.schema.fields ++ carry))
      val schemaCols =
        (plan.schema.fieldNames ++ carry.map(_.name)).map(col).toIndexedSeq
      val fileCol = "__graft_input_file"
      val candDf0 =
        if (candidates.isEmpty) emptyDf.withColumn(fileCol, lit(""))
        else fmt.readFiles(spark, plan.schema, candidates.map(_.absPath),
          Some(fileCol))
      val touched: Seq[Cand] =
        if (!touchDetect) Seq.empty
        else matcher(candDf0).select(col(fileCol)).distinct().collect()
          .map { r =>
            // a format's readFiles override may emit the LITERAL path
            // (not a percent-encoded URI): try it raw first —
            // decodeFileUri on a literal hive dir like p=a%20b would
            // percent-decode it into a path that exists nowhere
            val v = r.getString(0)
            byAbs.getOrElse(v, byAbs(DeltaLog.decodeFileUri(v)))
          }
          .sortBy(_.token).toSeq
      if (touched.isEmpty && !commitWhenUntouched) return None
      val touchedDf =
        if (touched.isEmpty) emptyDf
        else fmt.readFiles(spark, plan.schema, touched.map(_.absPath), None)
          .select(schemaCols: _*)
      val candDf = candDf0.select(schemaCols: _*)
      val out = fmt.stampOutput(transform(touchedDf, candDf, plan.schema), plan)
      val scratch = Paths.get(fmt.table, s"${fmt.scratchPrefix}${UUID.randomUUID()}")
      val targetBytes = 128L * 1024 * 1024
      val nOut = math.max(1, (touched.map(_.size).sum / targetBytes).toInt + 1)
      val w = out.coalesce(nOut).write.mode("overwrite")
      val wpc = fmt.writePartitionColumns(plan)
      (if (wpc.nonEmpty) w.partitionBy(wpc: _*) else w)
        .parquet(scratch.toString)
      val parts = walkDir(scratch)
        .filter(p => Files.isRegularFile(p) &&
          p.getFileName.toString.endsWith(".parquet"))
        .map(p => (scratch.relativize(p).toString, p)).sortBy(_._1)
      // link + stats-harvest per part on the shared pool (a full-table
      // UPDATE rewrites every file; serial footer opens would dominate).
      // Each file lands under a FRESH UUID NAME: one Spark job reuses its
      // part names across partition dirs, and unique names are the
      // invariant merge-on-read position deletes key on
      val added = graft.sources.SpoolLink.parMap(parts) { case (rel, p) =>
        val destDir = Option(Paths.get(rel).getParent)
          .map(d => fmt.dataRoot.resolve(d)).getOrElse(fmt.dataRoot)
        val dest = destDir.resolve(s"part-${UUID.randomUUID()}.parquet")
        Files.createDirectories(dest.getParent)
        try Files.createLink(dest, p)
        catch { case _: UnsupportedOperationException =>
          Files.move(p, dest, StandardCopyOption.ATOMIC_MOVE) }
        val (meta, records) = fmt.harvest(dest, plan)
        // a file whose every row matched a DELETE rewrites to zero rows —
        // drop the empty part instead of committing a row-less add
        if (records > 0) Some(meta) else { Files.deleteIfExists(dest); None }
      }.flatten
      walkDir(scratch).reverse.foreach(Files.deleteIfExists(_))
      if (touched.isEmpty && added.isEmpty) return None // true no-op
      val changeDf = if (fmt.changeFeedEnabled)
        changes.map(f => f(touchedDf, candDf, plan.schema)) else None
      val committed = fmt.commit(plan, added, touched.map(_.token),
        conflictPred, changeDf)
      committed match {
        case Some(_) => return committed
        case None => added.foreach(fmt.deletePlaced)
      }
    }
    sys.error(s"${fmt.table}: DML lost 5 concurrent-write races; giving up")
  }

  private def walkDir(p: Path): Seq[Path] = {
    val s = Files.walk(p)
    try s.iterator().asScala.toSeq finally s.close()
  }
}
