package graft.exec

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.parser.{ChParser, ChStatement}
import graft.types.BqlType

/** The `run_commands` analog (reference dispatcher:
  * crates/runtime/src/mgmt.rs:984-1057): accepts ClickHouse-dialect
  * statements, routes commands to Spark catalog operations / parquet writes,
  * and passes SELECTs through to Spark SQL.
  *
  * Storage model (vs the reference's mmap CoPa part store,
  * crates/meta/src/store/parts.rs:17-46): managed parquet tables in the
  * Spark warehouse. `PARTITION BY expr` (bql.pest:49-51) becomes a generated
  * `__ptk` column written through `partitionBy` — Catalyst codegen computes
  * the expression (the reference needs a cranelift JIT for this,
  * mgmt.rs:408-469; Spark gets it for free) and the parquet directory layout
  * gives partition pruning. Declared column order is preserved on SELECT *
  * because `__ptk` is appended last.
  *
  * At 100 TB this layout is the standard Spark warehouse shape: writes are
  * append-only parquet per partition directory, reads prune directories then
  * row groups; no single-writer bottleneck beyond the catalog commit.
  */
class GraftSession(val spark: SparkSession,
                   skipRestore: Boolean = false) {
  import ChStatement._

  // Register EVERY function pack before the catalog replay below: a
  // persisted materialized view's SELECT may call vec_dot / ngram_* /
  // bloom_* — restore must never depend on which query entry happened to
  // register a pack ad hoc earlier in the process.
  graft.functions.GraftFunctions.registerAll(spark)

  // Partition-prune derivation (the reference's one custom rewrite,
  // parse.rs:539-893) as a Catalyst optimizer rule.
  if (!spark.experimental.extraOptimizations
      .exists(_.isInstanceOf[graft.plans.PartitionPruneDerivation]))
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+
        graft.plans.PartitionPruneDerivation(spark)

  // Fixed-zone civil-field collapse (toYear/date_part('year') as integer
  // arithmetic) — idempotent alongside the Sessions.build registration for
  // sessions constructed elsewhere (e.g. a bare SparkSession handed in).
  if (!spark.experimental.extraOptimizations
      .exists(_.isInstanceOf[graft.plans.CivilFieldRewrite]))
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+
        graft.plans.CivilFieldRewrite(spark)

  // Monotone civil-predicate unwrap (toYear(d)=1995 → raw d range for
  // PushedFilters + __ptk pruning) — after CivilFieldRewrite by list order.
  if (!spark.experimental.extraOptimizations
      .exists(_.isInstanceOf[graft.plans.CivilPredicateUnwrap]))
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+
        graft.plans.CivilPredicateUnwrap(spark)

  // CH projection routing: matching aggregates over a table with ADD
  // PROJECTION metadata re-aggregate the hidden pre-aggregated table.
  if (!spark.experimental.extraOptimizations
      .exists(_.isInstanceOf[graft.plans.ProjectionRoute]))
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+
        graft.plans.ProjectionRoute(spark)

  /** Hidden partition-key column name (not shown by DESC; reference keeps
    * the ptk entirely out of the table schema, crates/meta/src/types.rs:55-63).
    */
  val PtkCol = "__ptk"

  // Reference boot: `system` and `default` databases pre-created
  // (mgmt.rs:233-267); Spark's catalog ships `default`, so only `system`
  // needs creating. Existence-gated: the DDL command itself costs ~8 ms
  // of parse/command execution per construction on a warm JVM.
  if (!spark.catalog.databaseExists("system"))
    spark.sql("CREATE DATABASE IF NOT EXISTS `system`"): Unit

  /** Key prefix for this SparkSession in the JVM-wide restore registries. */
  private def sessionKey(name: String): String =
    System.identityHashCode(spark).toString + "/" + name

  /** Restore failures, surfaced as `system.restore_errors` (db, table,
    * kind, error). `restoreCatalog` is fault-isolated — one poisoned entry
    * must not kill boot — but a silently missing table/MV is worse than a
    * loud one: a client must be able to SEE a partially-restored catalog
    * (VERDICT r13 #7; the reference's sled store surfaces this as a boot
    * error, crates/meta/src/store/sys.rs:624-642).
    */
  private val restoreErrorRows =
    scala.collection.mutable.ArrayBuffer.empty[(String, String, String, String)]

  // distinguishes THIS engine session's instance-scoped temp views from
  // a sibling GraftSession sharing the same SparkSession
  private val instanceTag =
    java.lang.Integer.toHexString(System.identityHashCode(this))

  def restoreErrors: Seq[(String, String, String, String)] = restoreErrorRows.toSeq

  /** Adopt another session's boot-restore failures — wire servers restore
    * once at SERVER construction and hand each per-connection session
    * (skipRestore=true) that outcome, so `system.restore_errors` still
    * answers "what failed at boot" on every connection.
    */
  private[graft] def adoptRestoreErrors(
      es: Seq[(String, String, String, String)]): Unit =
    restoreErrorRows ++= es.filterNot(restoreErrorRows.contains): Unit

  /** Plain (non-materialized) views: name → (database, stored SELECT in
    * CH dialect, full create script). CH stores the QUERY, not data, and
    * substitutes it on every read — here each view lives as a Spark
    * temporary view over the rewritten SELECT, re-registered fresh by
    * [[refreshReferencedViews]] before any query that mentions it (a
    * captured analyzed plan would pin the source's file listing; fresh
    * registration re-resolves the relation, so reads always see current
    * data). v1 scope: views resolve by bare name (Spark temp views are
    * session-scoped and unqualified); the declared database routes only
    * the metaFile used for restart replay.
    */
  private val viewDefs =
    scala.collection.mutable.LinkedHashMap.empty[String, (String, String, String)]

  /** Dictionaries: name → definition. The loaded state is a BROADCAST
    * hash (key-string → attr values) behind a per-dictionary SQL
    * function `__graft_dict_<name>` — CH's execution model exactly (an
    * in-memory hash replicated to every node), which is why dictGet
    * never shuffles: it's a map-side lookup inside whatever plan the
    * query already has. Loaded at CREATE (validating eagerly, like CH)
    * and refreshed only by SYSTEM RELOAD DICTIONARY — the LIFETIME
    * clause is accepted and ignored, staleness-until-reload documented.
    */
  /** CH temporary tables — session-scoped, database-less, engine-less.
    * Backed by an in-memory DataFrame re-registered as a temp view on
    * every insert (checkpointed so lineage never stacks); they die with
    * the session, shadow catalog names (Spark temp-view precedence, CH's
    * rule), and on a shared SparkSession two GraftSessions share the
    * namespace (HTTP sessions get their own SparkSession, so CH's
    * per-session isolation holds where it matters).
    */
  private val tempTables = scala.collection.mutable.LinkedHashMap
    .empty[String, (ChStatement.CreateTable, DataFrame)]
  private def tempDef(db: Option[String],
                      name: String): Option[ChStatement.CreateTable] =
    if (db.isEmpty) tempTables.get(name).map(_._1) else None

  private val dictDefs =
    scala.collection.mutable.LinkedHashMap.empty[String, CreateDictionary]
  private val dictBroadcasts = scala.collection.mutable.Map.empty[
    String, org.apache.spark.broadcast.Broadcast[
      java.util.HashMap[String, Array[String]]]]
  /** Dictionaries whose source exceeds the broadcast guard: dictGet over
    * them degrades to a correlated scalar subquery — Catalyst rewrites it
    * into an aggregated equi-JOIN against the source (ClickHouse's
    * `direct` layout semantics) instead of erroring (VERDICT r15 #6).
    */
  private val dictJoinMode = scala.collection.mutable.Set.empty[String]

  private def recordRestoreError(db: String, table: String, kind: String,
                                 e: Throwable): Unit = {
    restoreErrorRows += ((db, table, kind,
      Option(e.getMessage).getOrElse(e.getClass.getName)))
    System.err.println(s"[graft] $kind $db.$table failed to restore: ${e.getMessage}")
  }

  // Catalog persistence (the reference persists tables in sled,
  // crates/meta/src/store/sys.rs:624-642): every CREATE TABLE records its
  // CH create script under <warehouse>/_graft_meta/<db>/<table>.sql and
  // the table itself is created WITH an explicit LOCATION, so a fresh
  // process against the same warehouse replays the scripts and reattaches
  // the surviving parquet data — SHOW CREATE / DESC / INSERT / SELECT all
  // work after a restart. Wire servers pass skipRestore=true for their
  // PER-CONNECTION sessions: the host session already restored this
  // JVM's shared catalog, and re-scanning the meta root per accept put
  // 2-3 s of metastore round-trips on every connect (PERF.md r19).
  if (!skipRestore) restoreCatalog()

  private def warehousePath: java.nio.file.Path = {
    val w = spark.conf.get("spark.sql.warehouse.dir")
    val uri = new java.net.URI(w)
    java.nio.file.Paths.get(
      if (uri.getScheme != null) uri.getPath else w)
  }

  private def metaRoot: java.nio.file.Path = warehousePath.resolve("_graft_meta")

  private def metaFile(db: String, table: String): java.nio.file.Path =
    metaRoot.resolve(db).resolve(s"$table.sql")

  private def rmTree(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles).getOrElse(Array.empty).foreach(rmTree)
    f.delete(): Unit
  }

  /** Replay recorded create scripts for tables the (in-memory) catalog has
    * forgotten but whose data survives in the warehouse.
    */
  private def restoreCatalog(): Unit = {
    val root = metaRoot.toFile
    if (!root.exists) return
    // plain views replay LAST and across all databases at once (a view
    // may read tables or other views; nested views converge by fixpoint)
    val pendingViews = scala.collection.mutable.ArrayBuffer
      .empty[(String, String, CreateView, String)]
    for (dbDir <- Option(root.listFiles).getOrElse(Array.empty[java.io.File])
         if dbDir.isDirectory) {
      val db = dbDir.getName
      if (!spark.catalog.databaseExists(db))
        spark.sql(s"CREATE DATABASE IF NOT EXISTS `$db`")
      val metaFiles =
        Option(dbDir.listFiles).getOrElse(Array.empty[java.io.File]).toSeq
          .filter(_.getName.endsWith(".sql"))
      // Tables the catalog still knows (persistent metastore across a JVM
      // restart) skip replay below — but CREATE is the only thing that
      // populates the JVM-wide Nested registry, so seed it here from the
      // recorded graft.nested prop or `SELECT n.a` / `ARRAY JOIN n`
      // silently stop rewriting after such a restart (ADVICE r18). The
      // script-text gate keeps this pass free of catalog round-trips for
      // the overwhelmingly common Nested-free tables.
      // direct catalog existence check: the public Catalog API re-parses
      // the identifier per call (~2 ms warm), and this scan makes one
      // call per recorded script per construction
      def tableKnown(table: String): Boolean =
        spark.sessionState.catalog.tableExists(
          org.apache.spark.sql.catalyst.TableIdentifier(table, Some(db)))
      for (f <- metaFiles; table = f.getName.stripSuffix(".sql")
           if metaScript(f).text.toLowerCase(java.util.Locale.ROOT)
             .contains("nested(")
           if tableKnown(table))
        scala.util.Try {
          val fams = nestedFamilies(Some(db), table)
          if (fams.nonEmpty)
            GraftSession.nestedRegistry.putIfAbsent((db, table), fams): Unit
        }: Unit
      val scripts =
        for (f <- metaFiles;
             table = f.getName.stripSuffix(".sql")
             if !tableKnown(table);
             ms = metaScript(f);
             stmt <- ms.stmt)
          yield (table, stmt, ms.text)
      // plain tables first: a materialized view's schema derivation reads
      // its source table, which may be restoring in the same pass
      scripts.foreach {
        case (table, ct: CreateTable, _) =>
          scala.util.Try {
            // restart replay reattaches existing data — never re-run a CTAS insert
            createTable(ct.copy(db = Some(db), ifNotExists = true), runCtasInsert = false)
            // reload surviving partition directories into the catalog
            if (ct.partitionBy.isDefined)
              spark.sql(s"ALTER TABLE `$db`.`$table` RECOVER PARTITIONS")
          }.failed.foreach(e => recordRestoreError(db, table, "table", e))
        case _ => ()
      }
      scripts.foreach {
        case (table, mv: CreateMaterializedView, text) =>
          // reattach the view's surviving storage; never re-backfill.
          // Fault-isolated: a view whose source vanished must not kill
          // session boot (the registerAll discipline).
          // Warm-JVM adopt for TO-form views (their name never backs a
          // table, so the tableExists gate above can't skip them): when
          // the wrapper temp view is still registered from this exact
          // script and the target still carries this view's subscription
          // props, the replay would be a byte-identical no-op — skip the
          // per-construction SELECT re-analysis + catalog prop write.
          val adoptedTo = mv.to.exists { case (_, target) =>
            Option(GraftSession.viewMemos.get(sessionKey(mv.name)))
              .contains(text) &&
              spark.sessionState.catalog.getTempView(mv.name).isDefined &&
              tableProp(Some(db), target, "graft.mv.via").contains(mv.name)
          }
          if (adoptedTo) {
            val target = mv.to.get._2
            viewDefs(mv.name) =
              (db, s"SELECT * FROM `$db`.`$target`", mv.createScript)
          } else scala.util.Try {
            createMaterializedView(
              mv.copy(db = Some(db), ifNotExists = true, populate = false))
            if (mv.partitionBy.isDefined)
              spark.sql(s"ALTER TABLE `$db`.`$table` RECOVER PARTITIONS")
          }.failed.foreach(e =>
            recordRestoreError(db, table, "materialized view", e))
        case (table, apx: AlterProjection, _) if apx.op == "add" =>
          // a projection's hidden table replays from its recorded ALTER
          // script: re-add the parent props and REATTACH the hidden
          // storage (populate=false — its data survived on disk). The
          // script's FROM is unqualified, so resolve it in ITS database —
          // restoring with current=default left the hidden orphaned and a
          // later ADD PROJECTION mounted its stale files.
          scala.util.Try {
            val prevDb = spark.catalog.currentDatabase
            spark.catalog.setCurrentDatabase(db)
            try addProjection(db, apx.name, apx.projName, apx.selectSql.get,
              populate = false)
            finally spark.catalog.setCurrentDatabase(prevDb)
          }.failed.foreach(e => recordRestoreError(db, table, "projection", e))
        case (table, cv: CreateView, text) =>
          pendingViews += ((db, table, cv, text))
        case (nm, cd: CreateDictionary, text) =>
          // dictionaries load after this database's tables (their source
          // snapshot); a vanished source surfaces, never kills boot.
          // Warm-JVM adopt: when the recorded script is byte-identical to
          // what this SparkSession last LOADED under this name, the loaded
          // state (broadcast hash / join-mode verdict, and the bound
          // lookup UDF) is still live — re-collecting the source per
          // construction was a full Spark job each time. CH dictionaries
          // are server-global and stale-until-reload; this IS that model.
          Option(GraftSession.dictMemos.get(sessionKey(nm)))
            .filter(_.script == text) match {
            case Some(m) =>
              dictDefs(nm) = m.cd
              if (m.joinMode) dictJoinMode += nm
              m.bc.foreach(b => dictBroadcasts(nm) = b)
            case None =>
              scala.util.Try(
                createDictionary(cd.copy(db = Some(db), ifNotExists = true)))
                .failed.foreach(e =>
                  recordRestoreError(db, nm, "dictionary", e))
          }
        case _ => () // damaged meta entry: leave the files alone
      }
    }
    // Warm-JVM adopt for plain views: the temp view is still registered
    // from this exact script text — repopulate the instance registry
    // without the per-view re-analysis (refreshReferencedViews re-resolves
    // it before any read regardless).
    val (adopted, toReplay) = pendingViews.partition {
      case (_, name, _, text) =>
        Option(GraftSession.viewMemos.get(sessionKey(name))).contains(text) &&
          spark.sessionState.catalog.getTempView(name).isDefined
    }
    adopted.foreach { case (db, name, cv, _) =>
      viewDefs(name) = (db, cv.selectSql, cv.createScript)
    }
    // nested views restore in dependency order by fixpoint: each round
    // registers every view whose sources now resolve; a round with no
    // progress stops, and the stragglers surface in system.restore_errors
    var remaining = toReplay.toList
    var progressed = true
    while (remaining.nonEmpty && progressed) {
      val (ok, bad) = remaining.partition { case (db, _, cv, _) =>
        scala.util.Try(
          createView(cv.copy(db = Some(db), orReplace = true,
            ifNotExists = false))).isSuccess
      }
      progressed = ok.nonEmpty
      remaining = bad
    }
    remaining.foreach { case (db, table, cv, _) =>
      scala.util.Try(createView(cv.copy(db = Some(db), orReplace = true,
          ifNotExists = false)))
        .failed.foreach(e => recordRestoreError(db, table, "view", e))
    }
  }

  /** Cached read+parse of one recorded meta script, keyed by
    * (path, mtime, size) — a warm JVM re-scans the whole meta root per
    * GraftSession construction, and the bytes rarely change.
    */
  private def metaScript(f: java.io.File): GraftSession.MetaScript = {
    val key = f.getAbsolutePath
    val (mt, sz) = (f.lastModified, f.length)
    val cached = GraftSession.metaScriptCache.get(key)
    if (cached != null && cached.mtime == mt && cached.size == sz) cached
    else {
      val text = scala.util.Try(
        java.nio.file.Files.readString(f.toPath)).getOrElse("")
      val ms = GraftSession.MetaScript(mt, sz, text,
        ChParser.parse(text).toOption)
      GraftSession.metaScriptCache.put(key, ms)
      ms
    }
  }

  def sql(statement: String): DataFrame = sql(statement, "")

  /** Run one or more ';'-separated statements (cmd_list, bql.pest:8),
    * returning the last result; `payload` feeds INSERT ... FORMAT CSV when
    * the data is not inline (the wire protocol streams it in the
    * reference, mgmt.rs:724-730).
    */
  def sql(statement: String, payload: String): DataFrame = {
    val parts = ChParser.splitStatements(statement).getOrElse(Seq(statement))
    require(parts.nonEmpty, "empty statement")
    // processlist registration: the statement runs (and, for a SELECT,
    // later streams) under a job group named by its query id, so
    // KILL QUERY can cancel it from another thread
    finishQuery()
    val tid = Thread.currentThread().getId
    val qid = java.util.UUID.randomUUID.toString.substring(0, 8)
    spark.sparkContext.setJobGroup(qid, statement.take(256),
      interruptOnCancel = true)
    GraftSession.processes.put(qid,
      GraftSession.ProcEntry(qid, statement, System.currentTimeMillis, tid))
    GraftSession.currentByThread.put(tid, qid)
    var anySelect = false
    try {
      val res = parts.map { part =>
        ChParser.parse(part) match {
          case Left(err) => throw new IllegalArgumentException(s"parse error: $err")
          case Right(stmt) =>
            // CH plain-view semantics: reads substitute the stored query at
            // query time — re-resolve any mentioned view before running
            // (no-op when no views are defined; CreateView refreshes its own
            // dependency closure itself)
            stmt match {
              case _: CreateView => ()
              case _ => refreshReferencedViews(part)
            }
            // any statement that can change a table's shape, engine,
            // constraints, partitioning, temp status or MV subscriptions
            // invalidates the cached wire-ingest fast-path verdicts
            // (reads and plain inserts change none of those facts)
            stmt match {
              case _: Select | _: InsertValues | _: InsertSelect |
                   _: InsertFormat | _: InsertFile | _: InsertRemote => ()
              case _ =>
                GraftSession.directRecipes.clear()
                GraftSession.mvSubs.clear()
            }
            anySelect ||= stmt.isInstanceOf[Select]
            run(stmt, payload)
        }
      }.last
      // everything but a SELECT executed eagerly — retire it now. A
      // SELECT's jobs run when the caller consumes the DataFrame (same
      // thread, same job group): it stays listed until the thread's next
      // statement or an explicit finishQuery() from a wire handler.
      if (!anySelect) finishQuery()
      res
    } catch { case t: Throwable => finishQuery(); throw t }
  }

  /** Retire this thread's current processlist entry and job group (wire
    * handlers call it once a SELECT has fully streamed).
    */
  def finishQuery(): Unit = {
    val tid = Thread.currentThread().getId
    Option(GraftSession.currentByThread.remove(tid))
      .flatMap(q => Option(GraftSession.processes.remove(q)))
      .foreach { e =>
        val now = System.currentTimeMillis
        GraftSession.queryLog.addFirst(GraftSession.LogEntry(
          e.qid, e.query, e.startMs, (now - e.startMs) / 1000.0))
        while (GraftSession.queryLog.size > GraftSession.QueryLogCap)
          GraftSession.queryLog.pollLast()
      }
    spark.sparkContext.clearJobGroup()
  }

  /** Run a blank-line-separated script (sql_test_runner.rs:50-95 analog),
    * returning the last statement's result.
    */
  def script(text: String): DataFrame =
    ChParser.splitScript(text).map(sql(_)).lastOption
      .getOrElse(spark.emptyDataFrame)

  private def run(stmt: ChStatement, payload: String): DataFrame = stmt match {
    case CreateDatabase(name, ine) =>
      spark.sql(s"CREATE DATABASE ${if (ine) "IF NOT EXISTS " else ""}`$name`")
    case DropDatabase(name, ie) =>
      // External-location tables leave files behind on CASCADE; remove the
      // db's warehouse dir and its recorded create scripts (the reference
      // deletes data files with the meta, mgmt.rs:802-854).
      val r = spark.sql(s"DROP DATABASE ${if (ie) "IF EXISTS " else ""}`$name` CASCADE")
      rmTree(warehousePath.resolve(s"$name.db").toFile)
      rmTree(metaRoot.resolve(name).toFile)
      r
    case UseDb(name) =>
      spark.catalog.setCurrentDatabase(name); emptyOk
    case ShowDatabases =>
      spark.sql("SHOW DATABASES").select(col("namespace").as("name"))
    case ShowTables(db, like, neg) =>
      val base = db.fold(spark.sql("SHOW TABLES"))(d => spark.sql(s"SHOW TABLES IN `$d`"))
      val named = base.filter(!col("tableName").startsWith("graft_tmp_") &&
          !col("tableName").startsWith("__proj_"))
        .select(col("tableName").as("name"))
      like.fold(named) { pat =>
        val m = col("name").like(pat)
        named.filter(if (neg) !m else m)
      }
    case ct: CreateTable if ct.temporary => createTempTable(ct)
    case ct: CreateTable => createTable(ct)
    case mv: CreateMaterializedView => createMaterializedView(mv)
    case RenameTable(renames) =>
      renames.foreach { case ((fdbOpt, from), (tdbOpt, to)) =>
        val rdb = fdbOpt.getOrElse(spark.catalog.currentDatabase)
        require(tdbOpt.forall(_ == rdb),
          "RENAME TABLE across databases is not supported")
        spark.sql(s"ALTER TABLE `$rdb`.`$from` RENAME TO `$rdb`.`$to`")
        // graft tables carry an explicit LOCATION, so Spark's rename keeps
        // the OLD path — restart replay would then recreate the table at
        // defaultTablePath(<to>), an empty dir, silently losing the data.
        // Move the storage to the new default path and repoint the catalog.
        moveToDefaultLocation(rdb, to)
        // move + re-record the replay script under the new name (the
        // normalized DDL, like CTAS — SHOW CREATE follows the rename)
        java.nio.file.Files.deleteIfExists(metaFile(rdb, from))
        recordNormalizedScript(rdb, to)
        // the table's own projections: stored SELECTs must follow the
        // rename (rebuild/materialize would otherwise read the old name);
        // their hidden tables' graft.mv.src is fixed by the MV loop below
        projectionsOf(rdb, to).foreach { case (p, hidden, sel) =>
          val newSel = ChParser.firstFromTable(sel) match {
            case Some((_, s0, s1)) =>
              sel.substring(0, s0) + to + " " + sel.substring(s1)
            case None => sel
          }
          spark.sql(s"ALTER TABLE `$rdb`.`$to` SET TBLPROPERTIES (" +
            s"'graft.proj.$p.select'='${newSel.replace("'", "''")}')")
          // the HIDDEN table and its replay script must follow too:
          // restart would otherwise replay `ALTER TABLE <old> ADD
          // PROJECTION` against a name that no longer exists, silently
          // losing the projection and orphaning the hidden storage
          val newHidden = projTableName(to, p)
          if (hidden != newHidden) {
            spark.sql(s"ALTER TABLE `$rdb`.`$hidden` RENAME TO `$rdb`.`$newHidden`")
            moveToDefaultLocation(rdb, newHidden)
            java.nio.file.Files.deleteIfExists(metaFile(rdb, hidden))
            spark.sql(s"ALTER TABLE `$rdb`.`$to` SET TBLPROPERTIES (" +
              s"'graft.proj.$p.table'='$newHidden')")
          }
          // newSel keeps its FROM <to>, which addProjection accepts verbatim
          val newScript = s"ALTER TABLE $to ADD PROJECTION $p ($newSel)"
          java.nio.file.Files.createDirectories(metaFile(rdb, newHidden).getParent)
          java.nio.file.Files.writeString(metaFile(rdb, newHidden), newScript): Unit
        }
        // downstream materialized views keep receiving inserts: their
        // source tag follows the rename (the recorded MV script keeps
        // its original text — CH also shows the creation-time DDL)
        val cat = spark.sessionState.catalog
        cat.listTables(rdb).foreach { tid =>
          scala.util.Try(cat.getTableMetadata(tid)).toOption.foreach { m =>
            (m.properties.get("graft.mv.src"), m.properties.get("graft.mv.select")) match {
              case (Some(src), Some(sel)) if src == s"$rdb.$from" =>
                val newSel = ChParser.firstFromTable(sel) match {
                  case Some((_, s0, s1)) =>
                    sel.substring(0, s0) + to + " " + sel.substring(s1)
                  case None => sel
                }
                spark.sql(s"ALTER TABLE `$rdb`.`${tid.table}` SET TBLPROPERTIES (" +
                  s"'graft.mv.src'='${s"$rdb.$to".replace("'", "''")}', " +
                  s"'graft.mv.select'='${newSel.replace("'", "''")}')")
              case _ => ()
            }
          }
        }
      }
      emptyOk
    case a: AlterAddColumn =>
      require(!a.col.tpe.chName.contains("Nested("),
        s"ALTER TABLE ADD COLUMN: Nested(...) is only supported in " +
          "CREATE TABLE; add the flattened `name.field Array(T)` columns")
      val rdb = a.db.getOrElse(spark.catalog.currentDatabase)
      // a dotted name extends an EXISTING Nested family: `ADD COLUMN
      // n.c Array(T)` joins family n (and its equal-length CHECK) — CH's
      // nested-extension form. A dotted name with no family is rejected
      // rather than silently creating an orphan member.
      val famOpt: Option[(String, Seq[String])] =
        if (!a.col.name.contains(".")) None
        else {
          val fam = a.col.name.substring(0, a.col.name.lastIndexOf('.'))
          val fams = nestedFamilies(a.db, a.name)
          require(fams.contains(fam),
            s"ADD COLUMN ${a.col.name}: no Nested family `$fam` on " +
              s"${a.name} (declare the family in CREATE TABLE first)")
          require(a.col.tpe.isInstanceOf[BqlType.Arr],
            s"ADD COLUMN ${a.col.name}: a Nested member must be an " +
              s"Array type, got ${a.col.tpe.chName}")
          Some(fam -> fams(fam))
        }
      val exists = spark.table(fullName(a.db, a.name)).schema
        .fieldNames.contains(a.col.name)
      if (exists && a.ifNotExists) emptyOk
      else {
        require(!exists, s"column ${a.col.name} already exists in ${a.name}")
        spark.sql(s"ALTER TABLE `$rdb`.`${a.name}` ADD COLUMNS " +
          s"(`${a.col.name}` ${a.col.tpe.sparkType.sql})")
        // record the declared CH type (+ DEFAULT) and refresh the script.
        // Pre-existing rows read NULL for the new column (parquet schema
        // evolution); CH computes the default on read — divergence noted.
        val typesProp = tableProp(Some(rdb), a.name, "graft.ch.types")
          .map(_ + "").getOrElse("") +
          s"${a.col.name}${a.col.tpe.chName}"
        val defProp = a.col.default.map { d =>
          val prev = tableProp(Some(rdb), a.name, "graft.defaults")
            .map(_ + "").getOrElse("")
          s", 'graft.defaults'='${(prev + s"${a.col.name}$d").replace("'", "''")}'"
        }.getOrElse("")
        spark.sql(s"ALTER TABLE `$rdb`.`${a.name}` SET TBLPROPERTIES (" +
          s"'graft.ch.types'='${typesProp.replace("'", "''")}'$defProp)")
        famOpt.foreach { case (fam, members) =>
          writeNestedFamilies(a.db, a.name,
            nestedFamilies(a.db, a.name)
              .updated(fam, members :+ a.col.name))
        }
        recordNormalizedScript(rdb, a.name)
        emptyOk
      }
    case DropTable(db, name, _) if tempDef(db, name).isDefined =>
      tempTables.remove(name)
      spark.catalog.dropTempView(name)
      emptyOk
    case TruncateTable(db, name, _) if tempDef(db, name).isDefined =>
      val ct = tempTables(name)._1
      val empty = spark.createDataFrame(
        java.util.Collections.emptyList[Row](), tempSchema(ct))
      tempTables(name) = (ct, empty)
      empty.createOrReplaceTempView(name)
      emptyOk
    case DescTable(db, name) if tempDef(db, name).isDefined =>
      val rows = tempTables(name)._1.cols.map(c => Row(c.name, c.tpe.chName))
      spark.createDataFrame(rows.asJava,
        StructType(Seq(StructField("name", StringType),
          StructField("type", StringType))))
    case ShowCreateTable(db, name) if tempDef(db, name).isDefined =>
      spark.createDataFrame(
        Seq(Row(tempTables(name)._1.createScript)).asJava,
        StructType(Seq(StructField("statement", StringType))))
    case ExistsTable(db, name) if tempDef(db, name).isDefined =>
      spark.createDataFrame(Seq(Row(1)).asJava,
        StructType(Seq(StructField("result", IntegerType))))
    case DropTable(db, name, ie) if viewDefs.contains(name) &&
        !spark.sessionState.catalog.tableExists(
          org.apache.spark.sql.catalyst.TableIdentifier(
            name, Some(db.getOrElse(spark.catalog.currentDatabase)))) =>
      // CH accepts DROP TABLE on a view (views are tables in its catalog)
      dropView(db, name, ie)
    case DropTable(db, name, ie) =>
      val rdb = db.getOrElse(spark.catalog.currentDatabase)
      // a parent's hidden projection tables die with it
      if (spark.catalog.tableExists(s"$rdb.$name"))
        projectionsOf(rdb, name).foreach { case (_, hidden, _) =>
          run(DropTable(Some(rdb), hidden, ifExists = true), "")
        }
      val loc =
        if (spark.catalog.tableExists(s"$rdb.$name")) Some(tableLocation(rdb, name))
        else None
      val r = spark.sql(s"DROP TABLE ${if (ie) "IF EXISTS " else ""}${fullName(db, name)}")
      // DROP removes data in the reference (mgmt.rs:802-854); external
      // tables need the file delete done here.
      loc.foreach(p => rmTree(p.toFile))
      java.nio.file.Files.deleteIfExists(metaFile(rdb, name))
      r
    case TruncateTable(_, name, _) if viewDefs.contains(name) =>
      throw new IllegalArgumentException(
        s"TRUNCATE: $name is a view — views store no data (ClickHouse " +
          "rejects TRUNCATE on plain views too)")
    case TruncateTable(db, name, ie) if ie &&
        !spark.sessionState.catalog.tableExists(
          org.apache.spark.sql.catalyst.TableIdentifier(name,
            Some(db.getOrElse(spark.catalog.currentDatabase)))) =>
      emptyOk
    case TruncateTable(db, name, _) =>
      // Spark disallows TRUNCATE on external-location tables; the
      // reference's semantics are "drop data, keep meta" (mgmt.rs:856-905)
      // — replay the recorded create script around a full drop.
      val rdb = db.getOrElse(spark.catalog.currentDatabase)
      tableProp(db, name, "graft.create_script")
        .flatMap(s => ChParser.parse(s).toOption) match {
        case Some(ct: CreateTable) =>
          // projections survive TRUNCATE (CH keeps them, empty) — capture
          // their definitions before the drop takes the hidden tables too
          val projs = projectionsOf(rdb, name)
          run(DropTable(db, name, ifExists = false), "")
          // truncate = schema only: replay the script without the CTAS data
          createTable(ct.copy(db = Some(rdb), ifNotExists = false), runCtasInsert = false)
          projs.foreach { case (p, _, sel) =>
            addProjection(rdb, name, p, sel, populate = true): Unit
          }
          emptyOk
        case Some(mv: CreateMaterializedView) =>
          run(DropTable(db, name, ifExists = false), "")
          // truncate = schema only: recreate the view, never backfill
          createMaterializedView(
            mv.copy(db = Some(rdb), ifNotExists = false, populate = false))
        case _ => spark.sql(s"TRUNCATE TABLE ${fullName(db, name)}")
      }
    case ShowCreateTable(_, name) if viewDefs.contains(name) =>
      spark.createDataFrame(
        Seq(Row(viewDefs(name)._3)).asJava,
        StructType(Seq(StructField("statement", StringType))))
    case ShowCreateTable(db, name) =>
      val script = tableProp(db, name, "graft.create_script")
        .getOrElse(sys.error(s"no create script recorded for ${fullName(db, name)}"))
      spark.createDataFrame(
        Seq(Row(script)).asJava,
        StructType(Seq(StructField("statement", StringType))))
    case ExistsTable(db, name) =>
      val yes = spark.catalog.tableExists(fullName(db, name).replace("`", ""))
      spark.createDataFrame(
        Seq(Row(if (yes) 1 else 0)).asJava,
        StructType(Seq(StructField("result", IntegerType))))
    case DescSelect(sel) =>
      // schema-only analysis — nothing executes
      val rows = spark.sql(rewriteSelect(sel)).schema.fields.toSeq.map(f =>
        Row(f.name, BqlType.fromSpark(f.dataType, f.nullable).chName))
      spark.createDataFrame(rows.asJava,
        StructType(Seq(StructField("name", StringType),
          StructField("type", StringType))))
    case ShowColumns(db, name) =>
      run(DescTable(db, name), "")
    case DescTable(_, name) if viewDefs.contains(name) =>
      val rows = spark.table(s"`$name`").schema.fields.toSeq.map { f =>
        Row(f.name, BqlType.fromSpark(f.dataType, f.nullable).chName)
      }
      spark.createDataFrame(rows.asJava,
        StructType(Seq(StructField("name", StringType), StructField("type", StringType))))
    case DescTable(db, name) =>
      // Reference DESC wraps nullable columns in Nullable(...) and hides
      // nothing else (mgmt.rs:532-629); __ptk is internal metadata here.
      val types = chTypes(db, name)
      val rows = spark.table(fullName(db, name)).schema.fields.toSeq
        .filter(_.name != PtkCol)
        .map { f =>
          val ch = types.get(f.name)
            .getOrElse(BqlType.fromSpark(f.dataType, f.nullable).chName)
          Row(f.name, ch)
        }
      spark.createDataFrame(rows.asJava,
        StructType(Seq(StructField("name", StringType), StructField("type", StringType))))
    case OptimizeTable(db, name, fin, part, dedup, dedupBy) =>
      optimizeTable(db, name, fin, part, dedup, dedupBy)
      // TTL expiry / FINAL merge / DEDUPLICATE change the stored rows the
      // projections aggregated — rebuild (no-op for tables without any)
      rebuildProjectionsOf(db, name)
      emptyOk
    case ShowDictionaries =>
      val rows = dictDefs.values.toSeq.map(d =>
        Row(d.name, d.source, d.key))
      spark.createDataFrame(rows.asJava, StructType(Seq(
        StructField("name", StringType), StructField("source", StringType),
        StructField("key", StringType))))
    case m: AlterMutate =>
      mutateTable(m); rebuildProjectionsOf(m.db, m.name); emptyOk
    case ac: AlterClearColumn =>
      // CLEAR COLUMN = a partition-scoped UPDATE to the declared
      // DEFAULT (else CH type-zero, else NULL); only that partition's
      // files rewrite (the mutation machinery's file-locating scan)
      val tpe = chTypes(ac.db, ac.name).get(ac.col)
        .flatMap(t => BqlType.parse(t).toOption)
        .getOrElse(throw new IllegalArgumentException(
          s"CLEAR COLUMN: no column ${ac.col} in ${ac.name}"))
      val dflt = defaults(ac.db, ac.name).get(ac.col).getOrElse {
        def zeroOf(t: BqlType): String = t match {
          case BqlType.Nullable(_) => "NULL"
          case BqlType.Str | _: BqlType.FixedString |
               _: BqlType.LowCardinality => "''"
          case BqlType.Date | BqlType.Date32 => "'1970-01-01'"
          case BqlType.DateTime(_) | _: BqlType.DateTime64 =>
            "'1970-01-01 00:00:00'"
          case _ => "0"
        }
        zeroOf(tpe)
      }
      mutateTable(AlterMutate(ac.db, ac.name,
        Seq(ac.col -> s"CAST($dflt AS ${tpe.sparkType.sql})"),
        "1 = 1", Some(ac.partition)))
      rebuildProjectionsOf(ac.db, ac.name)
      emptyOk
    case cv: CreateView => createView(cv)
    case DropView(db, name, ie) => dropView(db, name, ie)
    case cd: CreateDictionary => createDictionary(cd)
    case DropDictionary(db, name, ie) => dropDictionary(db, name, ie)
    case ReloadDictionary(_, name) =>
      require(dictDefs.contains(name),
        s"SYSTEM RELOAD DICTIONARY: no dictionary $name")
      loadDictionary(name); emptyOk
    case ReloadDictionaries =>
      dictDefs.keys.toSeq.foreach(loadDictionary); emptyOk
    case ap: AlterPartition =>
      alterPartition(ap); rebuildProjectionsOf(ap.db, ap.name); emptyOk
    case a: AlterDropColumn => alterDropColumn(a); emptyOk
    case a: AlterRenameColumn => alterRenameColumn(a); emptyOk
    case a: AlterModifyColumn => alterModifyColumn(a); emptyOk
    case a: AlterTtl => alterTtl(a); emptyOk
    case ap: AlterProjection => alterProjection(ap)
    case ai: AlterIndex => alterIndex(ai)
    case ac: AlterConstraint => alterConstraint(ac); emptyOk
    case ShowProcesslist => processesDf
    case KillQuery(qid) =>
      val e = GraftSession.processes.remove(qid)
      if (e != null) {
        GraftSession.currentByThread.remove(e.threadId, qid)
        spark.sparkContext.cancelJobGroup(qid)
      }
      spark.createDataFrame(
        Seq(Row(qid, if (e != null) 1 else 0)).asJava,
        StructType(Seq(StructField("query_id", StringType),
          StructField("killed", IntegerType))))
    case DetachTable(db, name) =>
      val rdb = db.getOrElse(spark.catalog.currentDatabase)
      require(spark.sessionState.catalog.tableExists(
          org.apache.spark.sql.catalyst.TableIdentifier(name, Some(rdb))),
        s"DETACH TABLE: no table $rdb.$name")
      // the catalog forgets the table; data stays (external location) and
      // the replay script is renamed aside — boot restore must NOT
      // resurrect a detached table (CH's detached state persists)
      spark.sql(s"DROP TABLE ${fullName(db, name)}"): Unit
      val mf = metaFile(rdb, name)
      if (java.nio.file.Files.exists(mf))
        java.nio.file.Files.move(mf,
          mf.resolveSibling(s"$name.sql.detached"),
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      emptyOk
    case AttachTable(db, name) =>
      val rdb = db.getOrElse(spark.catalog.currentDatabase)
      require(!spark.sessionState.catalog.tableExists(
          org.apache.spark.sql.catalyst.TableIdentifier(name, Some(rdb))),
        s"ATTACH TABLE: $rdb.$name already exists")
      val mf = metaFile(rdb, name)
      val dm = mf.resolveSibling(s"$name.sql.detached")
      require(java.nio.file.Files.exists(dm),
        s"ATTACH TABLE: no detached table $rdb.$name")
      java.nio.file.Files.move(dm, mf)
      ChParser.parse(java.nio.file.Files.readString(mf)) match {
        case Right(ct: CreateTable) =>
          createTable(ct.copy(db = Some(rdb), ifNotExists = false),
            runCtasInsert = false)
          if (ct.partitionBy.isDefined)
            spark.sql(s"ALTER TABLE `$rdb`.`$name` RECOVER PARTITIONS"): Unit
        case Right(mv: CreateMaterializedView) =>
          createMaterializedView(
            mv.copy(db = Some(rdb), ifNotExists = false, populate = false)): Unit
        case other => throw new IllegalArgumentException(
          s"ATTACH TABLE: unreadable replay script for $rdb.$name: $other")
      }
      emptyOk
    case ExchangeTables(dbA, a, dbB, b) =>
      val rdb = dbA.getOrElse(spark.catalog.currentDatabase)
      require(dbB.forall(_ == rdb) && dbA.forall(_ == rdb),
        "EXCHANGE TABLES across databases is not supported")
      // three renames; the existing rename path moves scripts and MV
      // subscriptions with each table, so both follow the DATA
      val tmp = "graft_tmp_xchg_" +
        java.util.UUID.randomUUID.toString.replace("-", "")
      run(RenameTable(Seq(((Some(rdb), a), (Some(rdb), tmp)))), "")
      run(RenameTable(Seq(((Some(rdb), b), (Some(rdb), a)))), "")
      run(RenameTable(Seq(((Some(rdb), tmp), (Some(rdb), b)))), "")
      emptyOk
    case iv: InsertValues => insertValues(iv)
    case is: InsertSelect => insertSelect(is)
    case f: InsertFormat => insertFormat(f, payload)
    case Explain(sel, kind) =>
      val text = kind match {
        case "ast" =>
          // the parsed statement's shape — CH's AST dump analog
          ChParser.parse(sel) match {
            case Right(st) => st.toString
            case Left(e) => s"parse error: $e"
          }
        case "syntax" =>
          // the fully-rewritten SQL the dialect layer hands to Spark —
          // exactly what CH's EXPLAIN SYNTAX shows (ITS rewritten query)
          rewriteSelect(sel)
        case "pipeline" =>
          spark.sql(rewriteSelect(sel)).queryExecution.explainString(
            org.apache.spark.sql.execution.CodegenMode)
        case _ =>
          spark.sql(rewriteSelect(sel)).queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
      }
      spark.createDataFrame(
        text.split("\n").toSeq.map(Row(_)).asJava,
        StructType(Seq(StructField("plan", StringType))))
    case ir: InsertRemote => insertRemote(ir)
    case fi: InsertFile => insertFile(fi)
    case Select(raw) => runSelect(raw)
  }

  /** SELECT passthrough. The hidden partition key is storage metadata in
    * the reference (never a column, crates/meta/src/types.rs:55-63), so a
    * `SELECT *` over a partitioned table must not leak it.
    */
  private def runSelect(raw: String): DataFrame =
    ChParser.splitIntoOutfile(raw) match {
      case Some(p) => writeOutfile(p)
      case None =>
        val df = spark.sql(rewriteSelect(raw))
        if (df.columns.contains(PtkCol)) df.drop(PtkCol) else df
    }

  /** ClickHouse `SELECT … INTO OUTFILE 'path' [FORMAT f]`: run the inner
    * SELECT and export ONE file at the given path (CH's outfile is a
    * single client-side file by definition — the coalesce is the clause's
    * own semantics, not a plan habit; distributed exports go through
    * INSERT INTO table / remote()). Refuses to overwrite, like CH.
    * Returns a one-row summary (path, rows, format).
    */
  /** Release the executor-storage blocks a `localCheckpoint(eager=true)`
    * pinned, once every consumer of the checkpointed plan has run: the
    * ContextCleaner only reclaims them when the RDD is GC'd, so a
    * long-lived session doing many MV-fed inserts (or outfile exports)
    * accumulates storage memory between GC cycles (ADVICE r11). The
    * checkpointed Dataset's analyzed plan is a LogicalRDD leaf over the
    * persisted RDD — unpersist exactly that.
    */
  private def releaseCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.collectLeaves().foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }

  private def writeOutfile(p: ChParser.IntoOutfileParts): DataFrame = {
    val df0 = spark.sql(rewriteSelect(p.core))
    val df1 = if (df0.columns.contains(PtkCol)) df0.drop(PtkCol) else df0
    val target = java.nio.file.Paths.get(p.path)
    require(!java.nio.file.Files.exists(target),
      s"INTO OUTFILE target exists: ${p.path} (ClickHouse refuses to overwrite)")
    val fmt = p.format.getOrElse("CSV")
    val tmp = java.nio.file.Files.createTempDirectory("graft_outfile")
    // pin the result once: counting and then re-running the plan for the
    // write would let a nondeterministic SELECT report a row count that
    // does not match the exported file
    val df = df1.localCheckpoint(eager = true)
    val rows = df.count()
    val (writer, ext) = fmt.toUpperCase(java.util.Locale.ROOT) match {
      case "CSV" =>
        (df.coalesce(1).write.option("header", "false"), "csv")
      case "CSVWITHNAMES" =>
        (df.coalesce(1).write.option("header", "true"), "csv")
      case "TSV" | "TABSEPARATED" =>
        (df.coalesce(1).write.option("header", "false").option("sep", "\t"), "csv")
      case "JSONEACHROW" =>
        (df.coalesce(1).write, "json")
      case "PARQUET" =>
        (df.coalesce(1).write, "parquet")
      case other => throw new IllegalArgumentException(
        s"INTO OUTFILE format not supported: $other")
    }
    ext match {
      case "csv" => writer.mode("overwrite").csv(tmp.toString)
      case "json" => writer.mode("overwrite").json(tmp.toString)
      case "parquet" => writer.mode("overwrite").parquet(tmp.toString)
    }
    val listing = java.nio.file.Files.list(tmp)
    val part =
      try listing.iterator().asScala
        .find(_.getFileName.toString.startsWith("part-"))
        .getOrElse(sys.error("no output part file written"))
      finally listing.close()
    Option(target.getParent).foreach(java.nio.file.Files.createDirectories(_))
    java.nio.file.Files.move(part, target)
    rmTree(tmp.toFile)
    releaseCheckpoint(df)
    spark.createDataFrame(
      Seq(Row(p.path, rows, fmt)).asJava,
      StructType(Seq(StructField("path", StringType),
        StructField("rows", LongType), StructField("format", StringType))))
  }

  private def jdbcReader(url: String, table: String,
                         auth: Option[(String, String)]) = {
    val r = spark.read.format("jdbc")
      .option("url", url).option("dbtable", table)
    auth.fold(r) { case (u, w) => r.option("user", u).option("password", w) }
  }

  /** Federated read over the ClickHouse-native protocol (`ch://h1[:p1],h2…`
    * addresses) — the reference's actual remote() transport
    * (crates/runtime/src/read.rs:151-228), as a DataSource V2 scan
    * ([[graft.sources.ChNativeSource]]): one executor task per shard
    * address streams that shard's blocks, and Catalyst pushes column
    * pruning + translatable WHERE predicates to the remote server as SQL
    * (the reference's query-localization analog, engine/src/remote.rs) —
    * a selective query over a large remote moves matching rows, not the
    * table.
    */
  private def chRemoteDf(url: String, table: String,
                         auth: Option[(String, String)]): DataFrame = {
    val r = spark.read.format("chnative")
      .option("url", url).option("table", table)
    auth.fold(r) { case (u, p) => r.option("user", u).option("password", p) }
      .load()
  }

  /** SELECT-passthrough rewrites, driven by the tokenizer (r2 used raw-text
    * regexes, which also fired inside string literals and comments — the
    * same shallow-scan trap the reference's own parser has):
    *   - `numbers(N)` (parsed-but-unwired in the reference, bql.pest:349-353)
    *     → Spark `range(N)` aliased to CH's `number` column;
    *   - `remote('url', 'table'[, 'user', 'pwd'])` (reference fans out over
    *     the wire, crates/runtime/src/read.rs:151-228) → for `ch://`
    *     addresses a native-protocol shard fan-out ([[chRemoteDf]]), else a
    *     JDBC scan; either registered as a temp view. Views are registered
    *     BEFORE splicing
    *     (no side effects inside a replacement callback) and the view name
    *     is an MD5 of url|table|user|pwd — collision-resistant, so two
    *     calls differing only in credentials (or any other arg) can never
    *     silently share a view the way a 32-bit hashCode could.
    */
  private def rewriteSelect(sqlIn: String): String =
    rewriteAsofJoin(spliceTableFns(rewriteWithFill(
      rewriteLimitTies(rewriteLimitBy(rewriteWithTotals(
        rewritePrewhere(rewriteArrayJoin(rewriteInTable(rewriteDistinctOnStep(
          rewriteSample(rewriteFinal(spliceSystemViews(
            rewriteDictFns(ChParser.rewriteAnyJoin(
              ChParser.rewriteQueryTails(ChParser.rewriteQuantiles(
                ChParser.rewriteArrayLiterals(
                  ChParser.rewriteScalarWith(
                    rewriteNestedRefs(sqlIn))))))))))))))))))))

  /** CH SQL says `n.a`; the flattened Nested storage column is literally
    * named "n.a", which Spark only resolves backticked. Innermost rewrite
    * (runs before anything that ANALYZES subquery text). No registered
    * nested families → identity, zero tokenization cost. Scoped two ways
    * (ADVICE r18): only families of tables the statement actually
    * MENTIONS contribute members, and a family name the statement
    * defines itself (table alias, CTE, subquery alias) never rewrites —
    * `SELECT tag.name FROM t AS tag` stays a qualified column ref even
    * when some other table declares a Nested family `tag`.
    */
  private def rewriteNestedRefs(sql: String): String = {
    if (GraftSession.nestedRegistry.isEmpty) return sql
    import scala.jdk.CollectionConverters._
    val lower = (s: String) => s.toLowerCase(java.util.Locale.ROOT)
    val idents = ChParser.tokenizedIdents(sql).map(lower).toSet
    val referenced = GraftSession.nestedRegistry.asScala.collect {
      case ((_, t), fams) if idents.contains(lower(t)) => fams
    }
    if (referenced.isEmpty) return sql
    val shadowed = ChParser.definedNames(sql)
    val members = referenced.iterator.flatMap(_.collect {
      case (fam, ms) if !shadowed.contains(lower(fam)) => ms
    }).flatten.toSet
    if (members.isEmpty) sql else ChParser.backquoteDotted(sql, members)
  }

  /** ClickHouse `[LEFT] ASOF JOIN` — the SQL door onto
    * [[graft.operators.AsofJoin]] (a01's single-shuffle union+window
    * shape; VERDICT r15 #2). `l la ASOF JOIN r ra ON la.k = ra.k AND
    * la.t >= ra.t` splices into `FROM <asof-view> la`, where the view is
    * the operator's output (left columns + right payload columns), and
    * every `ra.` qualifier in the rest of the statement is re-pointed at
    * `la` — the flattened view carries each output column once, so both
    * qualifiers denote the same relation. Plain `ASOF JOIN` is INNER
    * (unmatched left rows drop, CH semantics); `LEFT ASOF JOIN` keeps
    * them with null payloads. `>` is the strict form. An ASOF token in an
    * unsupported shape throws — never falls through to Spark, where it
    * would silently parse as a table alias.
    */
  private def rewriteAsofJoin(sql: String): String =
    ChParser.splitAsofJoin(sql) match {
      case None => sql
      case Some(Left(why)) =>
        throw new IllegalArgumentException(s"ASOF JOIN: $why")
      case Some(Right(p)) =>
        def fail(why: String): Nothing =
          throw new IllegalArgumentException(s"ASOF JOIN: $why")
        def load(t: String): DataFrame = {
          val df = spark.table(t)
          if (df.columns.contains(PtkCol)) df.drop(PtkCol) else df
        }
        val ldf = load(p.leftTable)
        val rdf = load(p.rightTable)
        // classify each ON ref to a side: by alias, else by unique column
        def isLeft(r: ChParser.ARef): Boolean = r.qual match {
          case Some(q) if q.equalsIgnoreCase(p.leftAlias) => true
          case Some(q) if q.equalsIgnoreCase(p.rightAlias) => false
          case Some(q) => fail(s"unknown qualifier '$q' in ON clause")
          case None =>
            val inL = ldf.columns.exists(_.equalsIgnoreCase(r.col))
            val inR = rdf.columns.exists(_.equalsIgnoreCase(r.col))
            if (inL == inR) fail(s"ambiguous bare column '${r.col}' in ON " +
              "clause — qualify it")
            inL
        }
        // normalize each conjunct to (leftCol, op, rightCol)
        val norm = p.conds.map { case (a, o, b) =>
          (isLeft(a), isLeft(b)) match {
            case (true, false) => (a.col, o, b.col)
            case (false, true) =>
              val flipped = o match {
                case ">" => "<" case "<" => ">"
                case ">=" => "<=" case "<=" => ">=" case eq => eq
              }
              (b.col, flipped, a.col)
            case _ => fail("each ON condition must compare a left column " +
              "with a right column")
          }
        }
        val equi = norm.collect { case (l, "=", r) => (l, r) }
        val ineqs = norm.filter(_._2 != "=")
        if (equi.isEmpty) fail("at least one equality condition is required")
        if (ineqs.size != 1)
          fail(s"exactly ONE inequality is required, got ${ineqs.size}")
        val (lt, iop, rt) = ineqs.head
        // >= / > = backward (latest right at-or-before the left time);
        // <= / < = forward (earliest right at-or-after) — all four CH forms
        val forward = iop == "<=" || iop == "<"
        val strict = iop == ">" || iop == "<"
        // synthetic single-key struct supports multi-column equi keys
        val KeyCol = "__asof_k"; val MatchCol = "__asof_m"
        val lk = ldf.withColumn(KeyCol,
          struct(equi.map(c => col(s"`${c._1}`")): _*))
        val keyCols = equi.map(_._2)
        val payload0 = rdf.columns.filterNot(c => keyCols.contains(c)).toSeq
        val collide = payload0.toSet.intersect(ldf.columns.toSet)
        // the right TIME column may collide (both sides often name it the
        // same); the ON clause pins its value, so it drops from the output.
        // Any other collision would silently shadow — error loudly.
        if ((collide - rt).nonEmpty)
          fail(s"right columns ${(collide - rt).mkString(", ")} collide " +
            "with left columns — alias them apart in a subquery")
        val payload = payload0.filterNot(c => c == rt && collide(rt))
        val rk = rdf.withColumn(KeyCol,
            struct(equi.map(c => col(s"`${c._2}`")): _*))
          .withColumn(MatchCol, lit(1))
        val joined = graft.operators.AsofJoin.backward(
          lk, rk, KeyCol, lt, rt, payload :+ MatchCol,
          strict = strict, forward = forward)
        val out = (if (p.leftOuter) joined
                   else joined.filter(col(MatchCol).isNotNull))
          .drop(MatchCol, KeyCol)
        val view = s"graft_asof_${java.security.MessageDigest.getInstance("MD5")
          .digest(sql.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(16)}"
        out.createOrReplaceTempView(view)
        val spliced =
          ChParser.renameQualifier(sql.substring(0, p.fromStart),
            p.rightAlias, p.leftAlias) +
          s"$view AS `${p.leftAlias}` " +
          ChParser.renameQualifier(sql.substring(p.onEnd),
            p.rightAlias, p.leftAlias)
        rewriteAsofJoin(spliced) // a second ASOF JOIN would now be leftmost
    }

  /** ClickHouse `FROM t FINAL` over a merging-engine table
    * (Replacing/SummingMergeTree): splice in the merged-state view from
    * [[mergedViewSelect]]. A FINAL that cannot be honored — non-merging
    * engine, no sorting key, a view/missing table, or FINAL on a JOIN
    * side — throws: falling through would let `final` parse as a legal
    * Spark alias and return un-merged rows with no error (ADVICE r15 #1;
    * ClickHouse either merges or rejects here too).
    */
  private def rewriteFinal(sql: String): String =
    ChParser.splitFinal(sql) match {
      case None =>
        ChParser.findJoinSideFinal(sql).foreach { t =>
          throw new IllegalArgumentException(
            s"FINAL on a JOIN-side table ($t) is not supported — read " +
              "the merged state through a subquery: JOIN (SELECT ... FROM " +
              s"$t FINAL) instead")
        }
        sql
      case Some(p) =>
        val rdb = p.db.getOrElse(spark.catalog.currentDatabase)
        val meta = scala.util.Try(
          spark.sessionState.catalog.getTableMetadata(
            org.apache.spark.sql.catalyst.TableIdentifier(p.table, Some(rdb))))
          .toOption
        val engine = meta.flatMap(_.properties.get("graft.engine"))
        val pks = meta.flatMap(_.properties.get("graft.pks"))
          .map(_.split("").filter(_.nonEmpty).toSeq).getOrElse(Nil)
        def fail(why: String): Nothing = throw new IllegalArgumentException(
          s"FINAL: table ${p.table} $why — FINAL is only defined for " +
            "MergeTree merging engines with a sorting key")
        if (meta.isEmpty) fail("is not a catalog table (a view or temp " +
          "relation cannot be read FINAL)")
        if (!engine.exists(isMergingEngine))
          fail(s"has engine ${engine.getOrElse("<none>")}")
        if (pks.isEmpty) fail("has no ORDER BY/PRIMARY KEY sorting key")
        mergedViewSelect(meta.get, rdb, p.table, withPtk = false)
          .map(sel => sql.substring(0, p.from) + s"($sel) ${p.table} " +
            sql.substring(p.to))
          .getOrElse(fail("has no merged-state view"))
    }

  private def isMergingEngine(e: String): Boolean =
    e.equalsIgnoreCase("ReplacingMergeTree") ||
      e.equalsIgnoreCase("SummingMergeTree") ||
      e.equalsIgnoreCase("CollapsingMergeTree") ||
      e.equalsIgnoreCase("VersionedCollapsingMergeTree") ||
      e.equalsIgnoreCase("AggregatingMergeTree")

  /** The merged-state SELECT for a MergeTree-family table — what a fully
    * merged part would contain, per engine:
    *  - ReplacingMergeTree[(ver)]: one row per sorting key, max version
    *    winning (full-row max as tie-break / no-ver rule).
    *  - SummingMergeTree[(cols…)]: one row per sorting key with the
    *    summable (numeric non-key, or the declared list) columns SUMMED
    *    and cast back to their declared types; other columns take their
    *    MIN (deterministic where CH keeps an arbitrary one); rows whose
    *    every summed column totals zero are dropped (CH's documented
    *    delete-on-all-zero rule; NULL sums count as zero).
    *  - CollapsingMergeTree(sign): per sorting key, +1 "state" rows and
    *    -1 "cancel" rows annihilate pairwise. One row survives iff
    *    sum(sign) ≠ 0 — a state row when positive, a cancel row when
    *    negative — picked by full-row max among that sign (DETERMINISTIC
    *    where CH's "last state / first cancel" depends on physical merge
    *    order, which parquet blocks don't define).
    *  - VersionedCollapsingMergeTree(sign, version): pairs cancel only
    *    within the same version, so `version` joins the grouping key
    *    (CH appends it to the sorting key implicitly) and leftover
    *    MULTIPLICITY is preserved: |sum(sign)| copies of the
    *    representative row survive, exactly as an order-independent CH
    *    merge leaves them.
    * All are partition-scoped: `__ptk` joins the grouping key, because
    * real MergeTree merges never cross partitions. `withPtk` keeps the
    * partition column in the output (the physical-merge writer needs it;
    * the FINAL view hides it). One hash aggregate either way — map-side
    * partial combine, a single shuffle on (sorting key, partition).
    */
  private def mergedViewSelect(meta: org.apache.spark.sql.catalyst.catalog.CatalogTable,
      rdb: String, table: String, withPtk: Boolean): Option[String] = {
    val engine = meta.properties.getOrElse("graft.engine", "")
    val pks = meta.properties.get("graft.pks")
      .map(_.split("").filter(_.nonEmpty).toSeq).getOrElse(Nil)
    if (pks.isEmpty) return None
    val schema = meta.schema
    val dataCols = schema.fieldNames.filterNot(_ == PtkCol).toSeq
    val partitioned = schema.fieldNames.contains(PtkCol)
    val args = meta.properties.get("graft.engine_args")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)
    def q(c: String) = s"`$c`"
    val grp = (pks ++ (if (partitioned) Seq(PtkCol) else Nil))
      .map(q).mkString(", ")
    val ptkOut = if (withPtk && partitioned) s", ${q(PtkCol)}" else ""
    val from = fullName(Some(rdb), table)
    if (engine.equalsIgnoreCase("ReplacingMergeTree")) {
      val ver = args.headOption.filter(dataCols.contains)
      val ordCols = ver.toSeq ++ dataCols.filterNot(c => ver.contains(c))
      Some("SELECT __r.*" + (if (ptkOut.nonEmpty) s"$ptkOut" else "") +
        " FROM (SELECT " +
        (if (ptkOut.nonEmpty) s"${q(PtkCol)}, " else "") +
        s"max_by(struct(${dataCols.map(q).mkString(", ")}), " +
        s"struct(${ordCols.map(q).mkString(", ")})) AS __r " +
        s"FROM $from GROUP BY $grp) __graft_final")
    } else if (engine.equalsIgnoreCase("SummingMergeTree")) {
      def numeric(f: org.apache.spark.sql.types.StructField) = f.dataType match {
        case _: org.apache.spark.sql.types.NumericType => true
        case _ => false
      }
      val fields = schema.fields.filter(f => dataCols.contains(f.name))
      val summed = fields.filter(f => !pks.contains(f.name) && numeric(f) &&
        (args.isEmpty || args.contains(f.name))).map(_.name).toSet
      val sel = fields.map { f =>
        if (pks.contains(f.name)) q(f.name)
        else if (summed(f.name))
          s"CAST(sum(${q(f.name)}) AS ${f.dataType.sql}) AS ${q(f.name)}"
        else s"min(${q(f.name)}) AS ${q(f.name)}"
      }.mkString(", ")
      // CH's delete-on-all-zero rule applies only when something is
      // summed; a no-summable-column table still merges to one row per
      // key (min-deterministic where CH keeps an arbitrary one)
      val having = if (summed.isEmpty) ""
      else " HAVING " + summed.toSeq.sorted
        .map(c => s"coalesce(sum(${q(c)}), 0) <> 0").mkString(" OR ")
      Some(s"SELECT $sel$ptkOut FROM $from GROUP BY $grp$having")
    } else if (engine.equalsIgnoreCase("AggregatingMergeTree")) {
      // SimpleAggregateFunction(f, T) columns merge with f per sorting
      // key; plain columns keep "any" value in CH — min() here, the same
      // deterministic stand-in SummingMergeTree uses (pinned divergence).
      // any/anyLast map to min/max: deterministic, idempotent under
      // re-merge, and within CH's "any one of the values" contract.
      val declared = chTypes(Some(rdb), table)
      def mergeFn(c: String): String =
        declared.get(c).flatMap(t => graft.types.BqlType.parse(t).toOption)
          .collect { case s: graft.types.BqlType.SimpleAggFn => s.func }
          .map {
            case "sum" => "sum"
            case "min" | "any" => "min"
            case "max" | "anyLast" => "max"
            case "groupBitAnd" => "bit_and"
            case "groupBitOr" => "bit_or"
            case "groupBitXor" => "bit_xor"
          }.getOrElse("min")
      // Full AggregateFunction(f, T) states merge STATE -> STATE (the
      // FINAL row still holds a state, read with fMerge — CH contract):
      // sum/min/max/count fold with their own function, avg adds the
      // (s, c) components, uniqExact unions the sorted distinct arrays.
      def stateMergeSql(c: String, fn: String, sqlType: String): String = fn match {
        case "sum" | "sumIf" => s"CAST(sum(${q(c)}) AS $sqlType) AS ${q(c)}"
        case "count" | "countIf" =>
          s"CAST(sum(${q(c)}) AS $sqlType) AS ${q(c)}"
        case "min" => s"CAST(min(${q(c)}) AS $sqlType) AS ${q(c)}"
        case "max" => s"CAST(max(${q(c)}) AS $sqlType) AS ${q(c)}"
        // argMax/argMin states are struct(o, a) with the ordering value
        // FIRST — lexicographic max/min over the struct IS the merge
        case "argMax" => s"CAST(max(${q(c)}) AS $sqlType) AS ${q(c)}"
        case "argMin" => s"CAST(min(${q(c)}) AS $sqlType) AS ${q(c)}"
        case "avg" =>
          s"CAST(named_struct('s', sum(${q(c)}.s), 'c', sum(${q(c)}.c)) " +
            s"AS $sqlType) AS ${q(c)}"
        case "avgWeighted" =>
          s"CAST(named_struct('s', sum(${q(c)}.s), 'w', sum(${q(c)}.w)) " +
            s"AS $sqlType) AS ${q(c)}"
        case "uniqExact" =>
          s"CAST(array_sort(array_distinct(flatten(collect_list(${q(c)})))) " +
            s"AS $sqlType) AS ${q(c)}"
        case "uniq" => s"hll_union_agg(${q(c)}) AS ${q(c)}"
        case "quantileTDigest" =>
          s"CAST(tdigest_state_merge_agg(${q(c)}) AS $sqlType) AS ${q(c)}"
        case pf if pf.startsWith("topK(") && pf.endsWith(")") =>
          val k = pf.stripPrefix("topK(").stripSuffix(")").trim
          s"CAST(topKStateMerge(${q(c)}, $k) AS $sqlType) AS ${q(c)}"
      }
      def aggFnOf(c: String): Option[String] =
        declared.get(c).flatMap(t => graft.types.BqlType.parse(t).toOption)
          .collect { case a: graft.types.BqlType.AggFn => a.func }
      val fields = schema.fields.filter(f => dataCols.contains(f.name))
      val sel = fields.map { f =>
        if (pks.contains(f.name)) q(f.name)
        else aggFnOf(f.name) match {
          case Some(fn) => stateMergeSql(f.name, fn, f.dataType.sql)
          case None =>
            s"CAST(${mergeFn(f.name)}(${q(f.name)}) AS ${f.dataType.sql}) " +
              s"AS ${q(f.name)}"
        }
      }.mkString(", ")
      Some(s"SELECT $sel$ptkOut FROM $from GROUP BY $grp")
    } else if (engine.equalsIgnoreCase("CollapsingMergeTree") ||
        engine.equalsIgnoreCase("VersionedCollapsingMergeTree")) {
      val versioned = engine.equalsIgnoreCase("VersionedCollapsingMergeTree")
      val sign = args.headOption.filter(dataCols.contains)
      val ver = if (versioned)
        args.drop(1).headOption.filter(dataCols.contains) else None
      if (sign.isEmpty || (versioned && ver.isEmpty)) None
      else {
        val sg = q(sign.get)
        val structAll = s"struct(${dataCols.map(q).mkString(", ")})"
        // the surviving sign's full-row max; both aggregates are cheap
        // (one struct comparison each) and evaluated in the same pass
        val rep = s"CASE WHEN sum($sg) >= 1 " +
          s"THEN max_by($structAll, $structAll) FILTER (WHERE $sg = 1) " +
          s"ELSE max_by($structAll, $structAll) FILTER (WHERE $sg = -1) " +
          "END AS __r"
        val vgrp = (pks ++ ver.filterNot(pks.contains).toSeq ++
          (if (partitioned) Seq(PtkCol) else Nil)).map(q).mkString(", ")
        if (!versioned)
          Some(s"SELECT __r.*$ptkOut FROM (SELECT " +
            (if (ptkOut.nonEmpty) s"${q(PtkCol)}, " else "") +
            s"$rep, sum($sg) AS __s FROM $from GROUP BY $vgrp) " +
            "__graft_final WHERE __s <> 0")
        else
          // sequence() needs a non-empty range even on the to-be-dropped
          // __n = 0 groups; greatest(…, 1) feeds them one phantom row
          // that the WHERE then removes
          Some(s"SELECT __r.*$ptkOut FROM (SELECT " +
            (if (ptkOut.nonEmpty) s"${q(PtkCol)}, " else "") +
            s"$rep, abs(sum($sg)) AS __n FROM $from GROUP BY $vgrp) " +
            "__graft_final " +
            "LATERAL VIEW explode(sequence(1, greatest(__n, 1))) " +
            "__graft_rep AS __i WHERE __n > 0")
      }
    } else None
  }

  /** ClickHouse `FROM t SAMPLE f [OFFSET o]` (0 < f < 1, 0 ≤ o < 1): a
    * DETERMINISTIC subset by Knuth multiplicative hash of the table's
    * sampling key — the declared `SAMPLE BY` column when the table has
    * one (CH requires it to be part of the primary key; graft records it
    * as the sample_by setting so it survives restarts), else the PK's
    * first column (the l47 split uses the identical hash, so
    * cross-engine bit-equality is already proven). Repeatable by design:
    * the same fraction always selects the same rows, `SAMPLE 0.1` nests
    * inside `SAMPLE 0.5` (same hash, smaller cut), and `OFFSET o` shifts
    * the hash window so `SAMPLE 0.5` / `SAMPLE 0.5 OFFSET 0.5` PARTITION
    * the table — CH's documented contract for splitting work across
    * readers. The row-count form `SAMPLE n` (n ≥ 1) and tables without a
    * sampling key fall through unrewritten, so Spark surfaces a parse
    * error instead of a silently-wrong full scan. 100 TB: the filter is
    * one map-side predicate evaluated inside the scan's codegen stage
    * (the hash expr itself is not a parquet PushedFilter — it is compute,
    * not a column bound — but it cuts rows before any shuffle, so the
    * whole query pipeline downstream sees only the sampled fraction);
    * no shuffle, no extra pass.
    */
  private def rewriteSample(sql: String): String =
    ChParser.splitSample(sql) match {
      case None => sql
      case Some(p) =>
        val f = scala.util.Try(p.num.toDouble).getOrElse(-1.0)
        if (!(f > 0 && f < 1)) sql
        else {
          val rdb = p.db.getOrElse(spark.catalog.currentDatabase)
          val meta = scala.util.Try(
            spark.sessionState.catalog.getTableMetadata(
              org.apache.spark.sql.catalyst.TableIdentifier(p.table, Some(rdb))))
            .toOption
          val pkHead = meta.flatMap(_.properties.get("graft.pks"))
            .flatMap(_.split("").find(_.nonEmpty))
          // the declared SAMPLE BY key wins; the PK head is the fallback
          val key = meta.flatMap(_.properties.get("graft.setting.sample_by"))
            .orElse(pkHead)
          // OFFSET must leave the whole window inside [0, 1]; anything
          // else (negative, o+f > 1, unparseable) falls through so Spark
          // errors loudly on the unrewritten SAMPLE token.
          val o = p.offset.flatMap(s => scala.util.Try(s.toDouble).toOption)
            .getOrElse(0.0)
          if (p.offset.nonEmpty && !(o >= 0 && o + f <= 1.0 + 1e-12)) sql
          else key match {
            case None => sql
            case Some(k) =>
              val lo = math.floor(o * 4294967296d).toLong
              val hi = math.min(4294967296L,
                math.floor((o + f) * 4294967296d).toLong)
              // sign- and overflow-safe Knuth cut: fold the key into
              // [0, 2^31) first, so the 2654435761 multiply peaks at
              // ~5.7e18 (inside Int64 even under ANSI) and signed keys
              // hash non-negative — the identical expression text runs
              // in the DuckDB oracle (d16/d16b), so the cut is
              // bit-equal cross-engine for the full Int64 key domain.
              val h = s"(((((`$k` % 2147483648) + 2147483648) " +
                s"% 2147483648) * 2654435761) % 4294967296)"
              val pred =
                if (lo == 0) s"$h < $hi" else s"$h >= $lo AND $h < $hi"
              val sub = s"(SELECT * FROM ${fullName(Some(rdb), p.table)} " +
                s"WHERE $pred) ${p.table}"
              sql.substring(0, p.from) + sub + " " + sql.substring(p.to)
          }
        }
    }

  private def spliceTableFns(sql: String): String = {
    val remotes = ChParser.tableFnCalls(sql, "remote")
      .filter(c => c._3.length == 2 || c._3.length == 4)
    val numbers = ChParser.tableFnCalls(sql, "numbers")
      .filter(c => c._3.length == 1 && c._3.head.nonEmpty && c._3.head.forall(_.isDigit))
    val files = ChParser.tableFnCalls(sql, "file")
      .filter(c => c._3.length == 2 || c._3.length == 3)
    val merges = ChParser.tableFnCalls(sql, "merge").filter(_._3.length == 2)
    val gens = ChParser.tableFnCalls(sql, "generateRandom")
      .filter(c => c._3.nonEmpty && c._3.length <= 4)
    if (remotes.isEmpty && numbers.isEmpty && files.isEmpty &&
        merges.isEmpty && gens.isEmpty)
      return sql
    // CH's virtual `_table` never shows up in `SELECT *` — only include
    // it when the statement actually names it as an IDENTIFIER (the token
    // inside a string literal or comment is not a reference; ADVICE r17)
    val wantsTable = ChParser.hasIdent(sql, "_table")
    val splices = remotes.map { case (from, to, args) =>
      val auth = if (args.length == 4) Some((args(2), args(3))) else None
      val view = s"graft_remote_${java.security.MessageDigest.getInstance("MD5")
        .digest(args.mkString("|").getBytes("UTF-8")).map("%02x".format(_)).mkString}"
      val df =
        if (args(0).startsWith("ch://")) chRemoteDf(args(0), args(1), auth)
        else jdbcReader(args(0), args(1), auth).load()
      df.createOrReplaceTempView(view)
      (from, to, view)
    } ++ numbers.map { case (from, to, args) =>
      (from, to, s"(SELECT id AS number FROM range(${args.head}))")
    } ++ files.map { case (from, to, args) =>
      val view = s"graft_file_${java.security.MessageDigest.getInstance("MD5")
        .digest(args.mkString("|").getBytes("UTF-8")).map("%02x".format(_)).mkString}"
      fileDf(args(0), args(1), args.lift(2)).createOrReplaceTempView(view)
      (from, to, view)
    } ++ merges.map { case (from, to, args) =>
      (from, to, mergeSubquery(args(0), args(1), wantsTable))
    } ++ gens.map { case (from, to, args) =>
      (from, to, generateRandomSubquery(args))
    }
    splices.sortBy(-_._1).foldLeft(sql) { case (acc, (from, to, text)) =>
      acc.substring(0, from) + text + acc.substring(to)
    }
  }

  /** CH `file('rel/path', 'Format'[, 'structure'])` — read a file under
    * the confined data root (CH's user_files_path; here the
    * `spark.graft.fileRoot` conf, default /tmp/graft_user_files). Path
    * traversal out of the root is rejected. Formats: CSV (headerless,
    * columns c1..cn like CH), CSVWithNames, TSV/TabSeparated[WithNames],
    * JSONEachRow, Parquet. The optional structure is CH DDL
    * (`'a Int64, b String'`) parsed through [[graft.types.BqlType]].
    */
  private def fileDf(rel: String, format: String,
                     structure: Option[String]): DataFrame = {
    val root = java.nio.file.Paths.get(
      spark.conf.getOption("spark.graft.fileRoot")
        .getOrElse("/tmp/graft_user_files")).toAbsolutePath.normalize
    val p = root.resolve(rel).normalize
    require(p.startsWith(root),
      s"file(): path escapes the data root $root: $rel")
    require(java.nio.file.Files.exists(p),
      s"file(): no such file under the data root $root: $rel")
    val schema = structure.map { st =>
      org.apache.spark.sql.types.StructType(
        graft.types.BqlType.splitTopLevel(st).map { colDef =>
          val t = colDef.trim
          val sp = t.indexWhere(_.isWhitespace)
          require(sp > 0, s"file(): bad structure entry '$t'")
          val (n, ty) = (t.substring(0, sp), t.substring(sp).trim)
          val bt = graft.types.BqlType.parse(ty).fold(
            e => throw new IllegalArgumentException(s"file(): $e"), identity)
          org.apache.spark.sql.types.StructField(n, bt.sparkType)
        })
    }
    def reader = schema.fold(spark.read)(spark.read.schema)
    val df = format.trim.toLowerCase(java.util.Locale.ROOT) match {
      case "csv" =>
        val r = reader.option("header", "false")
        if (schema.isDefined) r.csv(p.toString)
        else r.option("inferSchema", "true").csv(p.toString)
      case "csvwithnames" =>
        val r = reader.option("header", "true")
        if (schema.isDefined) r.csv(p.toString)
        else r.option("inferSchema", "true").csv(p.toString)
      case "tsv" | "tabseparated" =>
        val r = reader.option("header", "false").option("sep", "\t")
        if (schema.isDefined) r.csv(p.toString)
        else r.option("inferSchema", "true").csv(p.toString)
      case "tsvwithnames" | "tabseparatedwithnames" =>
        val r = reader.option("header", "true").option("sep", "\t")
        if (schema.isDefined) r.csv(p.toString)
        else r.option("inferSchema", "true").csv(p.toString)
      case "jsoneachrow" => reader.json(p.toString)
      case "parquet" => reader.parquet(p.toString)
      case other => throw new IllegalArgumentException(
        s"file(): unsupported format $other (supported: CSV[WithNames], " +
          "TSV/TabSeparated[WithNames], JSONEachRow, Parquet)")
    }
    // headerless text without a declared structure: CH names columns c1..cn
    val fmt = format.trim.toLowerCase(java.util.Locale.ROOT)
    if (schema.isEmpty && (fmt == "csv" || fmt == "tsv" || fmt == "tabseparated"))
      df.toDF(df.columns.indices.map(i => s"c${i + 1}"): _*)
    else df
  }

  /** CH `generateRandom('structure'[, seed[, max_string_length
    * [, max_array_length]]])` — deterministic synthetic rows (VERDICT r17
    * task #6). Every value derives from `xxhash64(row-id, seed, column,
    * …)`, so two runs with the same seed agree EXACTLY (CH's own
    * generator is also seed-deterministic; the value streams differ
    * across engines, which is why the oracle gates bounds + determinism,
    * not values). Spliced as a subquery over Spark's `range` — a lazy,
    * codegen'd source: `LIMIT n` prunes it, nothing materializes beyond
    * what the query reads. CH streams unbounded rows; here the stream
    * caps at 2^20 rows per call (documented divergence — CH users always
    * bound it with LIMIT anyway).
    */
  private def generateRandomSubquery(args: Seq[String]): String = {
    val seed = args.lift(1).map(_.trim).filter(_.nonEmpty)
      .map(_.toLong).getOrElse(0L)
    val maxStr = args.lift(2).map(_.trim.toInt).getOrElse(32)
    val maxArr = args.lift(3).map(_.trim.toInt).getOrElse(8)
    require(maxStr >= 1 && maxArr >= 0, "generateRandom: bad max lengths")
    val fields = graft.types.BqlType.splitTopLevel(args(0)).map { colDef =>
      val t = colDef.trim
      val sp = t.indexWhere(_.isWhitespace)
      require(sp > 0, s"generateRandom: bad structure entry '$t'")
      val (n, ty) = (t.substring(0, sp), t.substring(sp).trim)
      val bt = graft.types.BqlType.parse(ty).fold(
        e => throw new IllegalArgumentException(s"generateRandom: $e"),
        identity)
      (n, bt)
    }
    import graft.types.BqlType
    // one SQL expression per column, fully deterministic in (id, seed, i);
    // depth suffixes the transform lambda variable so Array(Array(T))
    // inner elements hash the OUTER index too (a reused name would make
    // every outer element's inner array identical — ADVICE r18)
    def gen(h: String, salt: String, t: BqlType, depth: Int = 0): String = t match {
      case BqlType.Nullable(inner) =>
        s"CASE WHEN pmod(xxhash64($h, 97), 10) = 0 THEN NULL " +
          s"ELSE ${gen(h, salt, inner, depth)} END"
      case BqlType.LowCardinality(inner) =>
        // low-cardinality by construction: a 16-value domain
        gen(s"pmod($h, 16)", salt, inner, depth)
      case BqlType.Int8 => s"CAST(pmod($h, 256) - 128 AS TINYINT)"
      case BqlType.Int16 => s"CAST(pmod($h, 65536) - 32768 AS SMALLINT)"
      case BqlType.Int32 =>
        s"CAST(pmod($h, 4294967296) - 2147483648 AS INT)"
      case BqlType.Int64 => s"xxhash64($h, 11)"
      case BqlType.UInt8 => s"CAST(pmod($h, 256) AS SMALLINT)"
      case BqlType.UInt16 => s"CAST(pmod($h, 65536) AS INT)"
      case BqlType.UInt32 => s"CAST(pmod($h, 4294967296) AS BIGINT)"
      case BqlType.UInt64 =>
        s"CAST(pmod(xxhash64($h, 11), 9223372036854775807) AS DECIMAL(20,0))"
      case BqlType.Float32 =>
        s"CAST(pmod($h, 1000000000) / 1000000000.0 AS FLOAT)"
      case BqlType.Float64 =>
        s"CAST(pmod($h, 1000000000) AS DOUBLE) / 1000000000.0"
      case BqlType.Decimal(p, s2) =>
        val digits = math.min(p, 15)
        s"CAST(pmod($h, ${"1" + "0" * digits}) / ${"1" + "0" * s2}.0 " +
          s"AS DECIMAL($p, $s2))"
      case BqlType.Str =>
        s"substring(md5(CAST(xxhash64($h, 5) AS STRING)), 1, " +
          s"CAST(1 + pmod($h, $maxStr) AS INT))"
      case BqlType.FixedString(n) =>
        s"rpad(md5(CAST(xxhash64($h, 5) AS STRING)), $n, 'x')"
      case BqlType.Date =>
        s"date_add(DATE '1970-01-01', CAST(pmod($h, 65536) AS INT))"
      case BqlType.Date32 =>
        s"date_add(DATE '1970-01-01', CAST(pmod($h, 65536) AS INT))"
      case BqlType.DateTime(_) =>
        s"timestamp_seconds(pmod($h, 4294967296))"
      case BqlType.DateTime64(p, _) =>
        s"timestamp_micros(pmod(xxhash64($h, 11), 4294967296000000))"
      case BqlType.Uuid =>
        val m = s"md5(CAST(xxhash64($h, 13) AS STRING))"
        s"concat(substring($m, 1, 8), '-', substring($m, 9, 4), '-', " +
          s"substring($m, 13, 4), '-', substring($m, 17, 4), '-', " +
          s"substring($m, 21, 12))"
      case e: BqlType.Enum =>
        val names = e.entries.map(x => s"'${x._1.replace("'", "''")}'")
        s"element_at(array(${names.mkString(", ")}), " +
          s"CAST(1 + pmod($h, ${e.entries.size}) AS INT))"
      case BqlType.Arr(inner) =>
        // generate maxArr candidates, slice to the per-row length (a
        // direct sequence(1, len) would go DESCENDING for len 0)
        val v = s"__gj$depth"
        val elem = gen(s"xxhash64($h, $v)", salt, inner, depth + 1)
        s"slice(transform(sequence(1, ${math.max(maxArr, 1)}), " +
          s"$v -> $elem), 1, CAST(pmod(xxhash64($h, 3), ${maxArr + 1}) AS INT))"
      case other => throw new IllegalArgumentException(
        s"generateRandom: unsupported type ${other.chName} " +
          "(scalars, Nullable, LowCardinality, Enum and Array(...) of " +
          "them are supported)")
    }
    val cols = fields.zipWithIndex.map { case ((n, t), i) =>
      s"${gen(s"xxhash64(id, ${seed}L, $i)", s"$i", t)} AS `$n`"
    }
    s"(SELECT ${cols.mkString(", ")} FROM range(1048576))"
  }

  /** CH `merge('db', 'regexp')` — UNION ALL over every catalog table in
    * `db` whose name matches the (unanchored, CH/re2-style) pattern, with
    * the virtual `_table` column naming each row's source when the query
    * asks for it. Matching happens AT QUERY TIME against the live catalog
    * (a view over merge() picks up tables created after the view — CH's
    * contract), and the column list comes from the first match so the
    * branches align positionally; a matching table missing one of those
    * columns fails analysis loudly. 100 TB: this is pure plan splicing —
    * each branch keeps its own pushdown/pruning; no extra shuffle beyond
    * whatever the outer query does.
    */
  private def mergeSubquery(db: String, pattern: String,
                            withTableCol: Boolean): String = {
    val cat = spark.sessionState.catalog
    require(cat.databaseExists(db), s"merge(): no database $db")
    val re = java.util.regex.Pattern.compile(pattern)
    // listTables includes session TEMP VIEWS regardless of the db arg;
    // merge() is a CATALOG-table union (CH contract), so keep only names
    // the external catalog actually owns
    val tables = cat.listTables(db).map(_.table)
      .filterNot(t => t.startsWith("__proj_") || t.startsWith("graft_tmp_"))
      .filter(t => re.matcher(t).find())
      // merge() unions only TABLES (CH contract): tableExists is true for
      // persistent catalog VIEWs too, so filter by table type (ADVICE r17)
      .filter(t => scala.util.Try(
        spark.sharedState.externalCatalog.getTable(db, t).tableType)
        .toOption.exists(tt =>
          tt == org.apache.spark.sql.catalyst.catalog.CatalogTableType.MANAGED ||
          tt == org.apache.spark.sql.catalyst.catalog.CatalogTableType.EXTERNAL))
      .sorted
    require(tables.nonEmpty, s"merge(): no tables in $db match '$pattern'")
    val cols = spark.table(s"`$db`.`${tables.head}`").schema.fieldNames
      .filterNot(_ == PtkCol).toSeq
    val colSql = cols.map(c => s"`$c`").mkString(", ")
    val branches = tables.map { t =>
      val tcol = if (withTableCol) s"'${t.replace("'", "''")}' AS _table, " else ""
      s"SELECT $tcol$colSql FROM `$db`.`$t`"
    }
    s"(${branches.mkString(" UNION ALL ")})"
  }

  /** ClickHouse `LIMIT [m,]n BY exprs` — the per-group LIMIT clause —
    * rewritten to the Spark-native two-phase form: a `row_number()` window
    * partitioned by the BY expressions (ordered by the statement's own
    * ORDER BY, as CH defines the clause) filtered to rows m+1..m+n, with
    * the outer ORDER BY / LIMIT re-applied on top. One shuffle on the BY
    * keys — the same cost CH pays — and Catalyst's WindowGroupLimit
    * pushes the per-group cap below the sort at scale.
    *
    * Scope: top-level clause of a single SELECT (set operations are left
    * untouched — the clause scope would be ambiguous); the outer ORDER BY
    * must reference selected columns, the subquery form's one restriction.
    */
  private def rewriteLimitBy(sql: String): String =
    ChParser.splitLimitBy(sql) match {
      case None => sql
      case Some(p) =>
        // without ORDER BY, CH's pick is arbitrary; partition exprs are a
        // deterministic stand-in ordering (constant within each group)
        val ord = p.orderBy.getOrElse(p.by)
        val lo = p.offset + 1
        val hi = p.offset + p.n
        s"SELECT * EXCEPT (__graft_rn) FROM (" +
          s"SELECT *, row_number() OVER (PARTITION BY ${p.by} ORDER BY $ord) AS __graft_rn " +
          s"FROM (${p.core}) __graft_lb) __graft_lbq " +
          s"WHERE __graft_rn BETWEEN $lo AND $hi" +
          p.orderBy.map(o => s" ORDER BY $o").getOrElse("") +
          p.outer.map(k => s" LIMIT $k").getOrElse("")
    }

  /** ClickHouse `system.tables` / `system.columns` introspection: the
    * references splice to temp views REFRESHED from the live catalog at
    * query time, so a client's `SELECT name FROM system.tables` always
    * sees the current state (the reference pre-creates the `system`
    * database; CH fills it with virtual tables the same way).
    */
  private def spliceSystemViews(sql: String): String = {
    val hits = ChParser.qualifiedRefs(sql, "system",
      Set("tables", "columns", "restore_errors", "parts", "detached_parts",
        "databases", "processes", "query_log", "dictionaries", "functions"))
    if (hits.isEmpty) return sql
    val cat = spark.sessionState.catalog
    def userTables: Seq[(String, org.apache.spark.sql.catalyst.TableIdentifier,
        org.apache.spark.sql.catalyst.catalog.CatalogTable)] =
      cat.listDatabases().flatMap { db =>
        cat.listTables(db).flatMap { tid =>
          scala.util.Try(cat.getTableMetadata(tid)).toOption
            .filterNot(_ => tid.table.startsWith("graft_tmp_") ||
              tid.table.startsWith("__graft"))
            .map(m => (db, tid, m))
        }
      }
    if (hits.exists(_._1 == "tables")) {
      val rows = userTables.map { case (db, tid, m) =>
        Row(db, tid.table, m.properties.getOrElse("graft.engine", "BaseStorage"))
      }
      spark.createDataFrame(rows.asJava, StructType(Seq(
          StructField("database", StringType), StructField("name", StringType),
          StructField("engine", StringType))))
        .createOrReplaceTempView("__graft_system_tables")
    }
    if (hits.exists(_._1 == "functions")) {
      // the registered function surface (CH's system.functions): every
      // name in this session's FunctionRegistry, the CH packs flagged
      val chNames = graft.functions.GraftFunctions.registeredNames
      val rows: Seq[Row] = spark.sessionState.functionRegistry.listFunction()
        .map(_.funcName).distinct.sorted.map(n =>
          Row(n, if (chNames.contains(
            n.toLowerCase(java.util.Locale.ROOT))) 1 else 0)).toSeq
      spark.createDataFrame(rows.asJava, StructType(Seq(
          StructField("name", StringType),
          StructField("is_ch_pack", IntegerType))))
        .createOrReplaceTempView("__graft_system_functions")
    }
    if (hits.exists(_._1 == "columns")) {
      val rows = userTables.flatMap { case (db, tid, m) =>
        val declared = m.properties.get("graft.ch.types").map {
          _.split("").filter(_.nonEmpty).map { kv =>
            val Array(k, v) = kv.split("", 2); k -> v
          }.toMap
        }.getOrElse(Map.empty[String, String])
        m.schema.fields.toSeq.filter(_.name != PtkCol).zipWithIndex.map {
          case (f, i) =>
            val ch = declared.getOrElse(f.name,
              BqlType.fromSpark(f.dataType, f.nullable).chName)
            Row(db, tid.table, f.name, ch, (i + 1).toLong)
        }
      }
      spark.createDataFrame(rows.asJava, StructType(Seq(
          StructField("database", StringType), StructField("table", StringType),
          StructField("name", StringType), StructField("type", StringType),
          StructField("position", LongType))))
        .createOrReplaceTempView("__graft_system_columns")
    }
    if (hits.exists(h => h._1 == "parts" || h._1 == "detached_parts")) {
      // CH's parts metadata comes from its part store; ours comes from
      // the same source of truth the scanner uses — the table directory
      // plus each file's parquet footer (row count read from metadata,
      // never data pages). Partition id is the `__ptk=` value, or "all"
      // for unpartitioned tables, matching CH's naming.
      val hconf = spark.sessionState.newHadoopConf()
      def footerRows(p: java.nio.file.Path): Long =
        scala.util.Try {
          val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
            new org.apache.hadoop.fs.Path(p.toUri), hconf)
          val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
          try r.getRecordCount finally r.close()
        }.getOrElse(-1L)
      def partsOf(db: String, table: String, root: java.nio.file.Path,
                  detached: Boolean): Seq[Row] = {
        if (!java.nio.file.Files.isDirectory(root)) return Nil
        val walk = java.nio.file.Files.walk(root)
        try walk.iterator.asScala.filter { p =>
          java.nio.file.Files.isRegularFile(p) &&
            p.getFileName.toString.endsWith(".parquet") &&
            !isHiddenPath(root.relativize(p))
        }.map { p =>
          val rel = root.relativize(p)
          val part = rel.iterator.asScala.map(_.toString)
            .find(_.startsWith(s"$PtkCol="))
            .map(s => unescapePartValue(s.stripPrefix(s"$PtkCol=")))
            .getOrElse("all")
          if (detached)
            Row(db, table, part, p.getFileName.toString,
              java.nio.file.Files.size(p))
          else
            Row(db, table, part, p.getFileName.toString, footerRows(p),
              java.nio.file.Files.size(p), 1)
        }.toVector
        finally walk.close()
      }
      val located = userTables.flatMap { case (db, tid, m) =>
        scala.util.Try(java.nio.file.Paths.get(m.location.getPath)).toOption
          .map(loc => (db, tid.table, loc))
      }
      if (hits.exists(_._1 == "parts")) {
        val rows = located.flatMap { case (db, t, loc) =>
          // live parts only: everything under _graft_detached is hidden
          partsOf(db, t, loc, detached = false)
        }
        spark.createDataFrame(rows.asJava, StructType(Seq(
            StructField("database", StringType), StructField("table", StringType),
            StructField("partition", StringType), StructField("name", StringType),
            StructField("rows", LongType), StructField("bytes_on_disk", LongType),
            StructField("active", IntegerType))))
          .createOrReplaceTempView("__graft_system_parts")
      }
      if (hits.exists(_._1 == "detached_parts")) {
        val rows = located.flatMap { case (db, t, loc) =>
          partsOf(db, t, loc.resolve("_graft_detached"), detached = true)
        }
        spark.createDataFrame(rows.asJava, StructType(Seq(
            StructField("database", StringType), StructField("table", StringType),
            StructField("partition", StringType), StructField("name", StringType),
            StructField("bytes_on_disk", LongType))))
          .createOrReplaceTempView("__graft_system_detached_parts")
      }
    }
    if (hits.exists(_._1 == "databases")) {
      val rows = spark.catalog.listDatabases().collect().toSeq
        .map(d => Row(d.name))
      spark.createDataFrame(rows.asJava, StructType(Seq(
          StructField("name", StringType))))
        .createOrReplaceTempView("__graft_system_databases")
    }
    if (hits.exists(_._1 == "processes")) {
      processesDf.createOrReplaceTempView("__graft_system_processes")
    }
    if (hits.exists(_._1 == "dictionaries")) {
      val rows = dictDefs.values.toSeq.map(d => Row(d.name, d.source, d.key))
      spark.createDataFrame(rows.asJava, StructType(Seq(
          StructField("name", StringType), StructField("source", StringType),
          StructField("key", StringType))))
        .createOrReplaceTempView("__graft_system_dictionaries")
    }
    if (hits.exists(_._1 == "query_log")) {
      import scala.jdk.CollectionConverters._
      val rows = GraftSession.queryLog.iterator.asScala.toSeq.map { e =>
        Row(e.qid, e.query, new java.sql.Timestamp(e.startMs), e.durSec)
      }
      spark.createDataFrame(rows.asJava, StructType(Seq(
          StructField("query_id", StringType), StructField("query", StringType),
          StructField("event_time", org.apache.spark.sql.types.TimestampType),
          StructField("duration", DoubleType))))
        .createOrReplaceTempView("__graft_system_query_log")
    }
    if (hits.exists(_._1 == "restore_errors")) {
      val rows = restoreErrorRows.toSeq.map { case (db, t, kind, err) =>
        Row(db, t, kind, err)
      }
      // restore_errors is per-GraftSession INSTANCE state (what failed at
      // THIS session's boot), but temp views are SparkSession-scoped —
      // an unsuffixed name would let two engine sessions sharing one
      // SparkSession overwrite each other's boot errors. tables/columns
      // need no suffix: they re-read the shared live catalog either way.
      spark.createDataFrame(rows.asJava, StructType(Seq(
          StructField("database", StringType), StructField("table", StringType),
          StructField("kind", StringType), StructField("error", StringType))))
        .createOrReplaceTempView(s"__graft_system_restore_errors_$instanceTag")
    }
    hits.sortBy(-_._2).foldLeft(sql) { case (acc, (which, from, to)) =>
      val view = if (which == "restore_errors")
        s"__graft_system_restore_errors_$instanceTag"
      else s"__graft_system_$which"
      acc.substring(0, from) + view + " " + acc.substring(to)
    }
  }

  /** ClickHouse `SELECT DISTINCT ON (keys) …` → the LIMIT 1 BY form (the
    * identical first-row-per-group contract), which the LIMIT BY
    * rewriter downstream turns into the windowed plan.
    */
  private def rewriteDistinctOnStep(sql: String): String =
    ChParser.rewriteDistinctOn(sql).getOrElse(sql)

  /** ClickHouse table-set membership `x [GLOBAL] [NOT] IN t` → the ANSI
    * subquery form `IN (SELECT * FROM t)`. GLOBAL is CH's
    * ship-the-set-everywhere distribution hint — on Spark the optimizer
    * already chooses broadcast vs shuffle for the semi-join, so the hint
    * drops.
    */
  private def rewriteInTable(sql: String): String = {
    val hits = ChParser.inTableRefs(sql)
    if (hits.isEmpty) sql
    else hits.sortBy(-_._2).foldLeft(sql) { case (acc, (t, from, to)) =>
      acc.substring(0, from) + s"IN (SELECT * FROM $t) " + acc.substring(to)
    }
  }

  /** ClickHouse `[LEFT] ARRAY JOIN arr [AS a][, …]` — per-element row
    * expansion, the CH idiom Spark spells LATERAL VIEW explode. The
    * rewrite is the Spark-native generator form:
    *
    *   - each item pre-projects under a generated name, multiple items
    *     zip POSITIONALLY via `arrays_zip` (CH zips too — it does NOT
    *     produce a Cartesian product);
    *   - the element columns surface under the item aliases; a BARE
    *     un-aliased column is REPLACED in scope by its element (CH
    *     semantics), via `* EXCEPT` on the wrapped source;
    *   - LEFT ARRAY JOIN → `LATERAL VIEW OUTER`: empty arrays keep their
    *     row with NULL elements (ANSI NULL, vs CH's type defaults — the
    *     same documented divergence as WITH TOTALS / WITH FILL keys).
    *
    * Unequal zip lengths NULL-pad (arrays_zip) where CH errors — a
    * deliberate superset. WHERE in the tail filters AFTER expansion,
    * exactly CH's clause order. 100 TB: explode is a per-row generator
    * inside whole-stage codegen — no shuffle, no state; row count scales
    * with array cardinality exactly like the data it models.
    */
  private def rewriteArrayJoin(sql: String): String =
    ChParser.splitArrayJoin(sql) match {
      case None => sql
      case Some(p) =>
        // Source schema (analysis only, nothing executes) — needed to
        // (a) mirror CH's replace-in-scope semantics when a non-bare
        // `AS alias` collides with a source column (the original column
        // joins the EXCEPT list, the exploded value takes the name), and
        // (b) avoid an invalid empty `* EXCEPT` when the excluded set
        // covers EVERY source column (single-column source, bare item).
        val srcCols = scala.util.Try(
          spark.sql(s"SELECT * FROM ${p.src}").schema.fieldNames.toSeq)
          .getOrElse(Seq.empty[String])
        // `ARRAY JOIN n` where n is a Nested FAMILY (not a column itself)
        // expands to zipping every flattened member — CH's nested
        // interplay: downstream `n.a` means the member's ELEMENT. The
        // members are already parallel equal-length arrays (enforced at
        // insert), so the positional zip is exact.
        val items = p.items.flatMap { it =>
          val fam = it.expr + "."
          if (it.bare && !srcCols.exists(_.equalsIgnoreCase(it.expr)) &&
              srcCols.exists(_.startsWith(fam)))
            srcCols.filter(_.startsWith(fam)).map(m =>
              ChParser.ArrayJoinItem(s"`$m`", m, bare = true))
          else Seq(it)
        }
        val names = items.indices.map(i => s"__graft_aj$i")
        val preProj = items.zip(names)
          .map { case (it, n) => s"(${it.expr}) AS $n" }.mkString(", ")
        val shadowed = items.filter(_.bare).map(_.alias) ++
          items.filterNot(_.bare).map(_.alias)
            .filter(a => srcCols.exists(_.equalsIgnoreCase(a)))
        val excepts = (names ++ Seq("__graft_ajz") ++
          shadowed.map(s => s"`$s`")).mkString(", ")
        val (gen, aliasProj) =
          if (items.length == 1)
            (s"explode(${names.head})",
              s"__graft_ajz AS `${items.head.alias}`")
          else
            (s"explode(arrays_zip(${names.mkString(", ")}))",
              items.zip(names).map { case (it, n) =>
                s"__graft_ajz.$n AS `${it.alias}`"
              }.mkString(", "))
        val starGone = srcCols.nonEmpty &&
          srcCols.forall(c => shadowed.exists(_.equalsIgnoreCase(c)))
        val proj =
          if (starGone) aliasProj
          else s"* EXCEPT ($excepts), $aliasProj"
        val outer = if (p.left) "OUTER " else ""
        s"${p.prefix}SELECT ${p.sel} FROM (" +
          s"SELECT $proj " +
          s"FROM (SELECT *, $preProj FROM ${p.src}) __graft_ajb " +
          s"LATERAL VIEW $outer$gen __graft_ajt AS __graft_ajz" +
          s") __graft_aj ${p.tail}"
    }

  /** ClickHouse PREWHERE — semantically WHERE, physically "filter on few
    * columns before reading the rest". The rewrite folds it into WHERE
    * with AND; on Spark the physical half is automatic (parquet predicate
    * pushdown + column pruning read filter columns first by design — the
    * plan shows the predicate in PushedFilters), so the rewrite IS the
    * optimization CH asks for.
    */
  private def rewritePrewhere(sql: String): String =
    ChParser.splitPrewhere(sql) match {
      case None => sql
      case Some(p) => p.whereExpr match {
        case Some(w) =>
          s"${p.pre}WHERE (${p.pw}) AND ($w) ${p.tail}"
        case None =>
          s"${p.pre}WHERE ${p.pw} ${p.tail}"
      }
    }

  /** ClickHouse `ORDER BY col WITH FILL [FROM a] [TO b] [STEP s]` — gap
    * filling: generate the full key grid (FROM/TO literals, or the data's
    * own min/max when absent; TO is EXCLUSIVE like CH) and left-join the
    * result onto it. Filled rows carry NULL in the other columns (ANSI;
    * CH uses type defaults — the same documented divergence as WITH
    * TOTALS keys). The grid is one explode of a sequence — rows scale
    * with the key range, never with the input; the join is a broadcast
    * of whichever side is small.
    */
  private def rewriteWithFill(sql: String): String =
    ChParser.splitWithFill(sql) match {
      case None => sql
      case Some(p) =>
        val lo = p.from.map(_.toString)
          .getOrElse(s"(SELECT min(${p.col}) FROM __graft_fill_src)")
        val hi = p.to.map(t => (t - 1).toString)
          .getOrElse(s"(SELECT max(${p.col}) FROM __graft_fill_src)")
        // CH keeps the query's own select-list order; a bare USING join
        // would move the fill key to position 0. Analyze the core once
        // (schema only, nothing executes) and project the source's
        // column order, coalescing the key from the grid on filled rows.
        // Analysis errors PROPAGATE (ADVICE r11): the outer query would
        // fail on the same core anyway, and a swallowed failure here
        // would silently fall back to the USING-join shape that moves
        // the fill key to column 0 — the exact bug this projection
        // fixes. The schema-only analysis executes nothing.
        val srcCols = spark.sql(spliceTableFns(p.core)).columns.toSeq
        p.interpolate.foreach { ic =>
          require(srcCols.exists(_.equalsIgnoreCase(ic)),
            s"INTERPOLATE: $ic is not a column of the query")
          require(!ic.equalsIgnoreCase(p.col),
            "INTERPOLATE: the fill key fills itself, it cannot interpolate")
        }
        // INTERPOLATE (c) carries the last REAL row's value onto filled
        // rows — a running last(ignoreNulls) window ordered by the fill
        // key. Real rows keep their own value (including real NULLs).
        // Single-partition window: a WITH FILL result is an ordered
        // materialized grid (CH streams it sequentially too).
        def interpProj(c: String): String =
          s"CASE WHEN __graft_fill_src.`${p.col}` IS NULL THEN " +
            s"last(__graft_fill_src.`$c`, true) OVER (ORDER BY " +
            s"__graft_fill_grid.`${p.col}` ROWS BETWEEN UNBOUNDED " +
            s"PRECEDING AND CURRENT ROW) ELSE __graft_fill_src.`$c` END " +
            s"AS `$c`"
        if (srcCols.exists(_.equalsIgnoreCase(p.col))) {
          val proj = srcCols.map { c =>
            if (c.equalsIgnoreCase(p.col))
              s"coalesce(__graft_fill_src.`$c`, __graft_fill_grid.`${p.col}`) AS `$c`"
            else if (p.interpolate.exists(_.equalsIgnoreCase(c)))
              interpProj(c)
            else s"__graft_fill_src.`$c`"
          }.mkString(", ")
          s"WITH __graft_fill_src AS (${p.core}), " +
            s"__graft_fill_grid AS (SELECT explode(sequence(" +
            s"CAST($lo AS BIGINT), CAST($hi AS BIGINT), ${p.step})) AS ${p.col}) " +
            s"SELECT $proj FROM __graft_fill_grid " +
            s"LEFT JOIN __graft_fill_src " +
            s"ON __graft_fill_src.`${p.col}` = __graft_fill_grid.`${p.col}` " +
            s"ORDER BY `${p.col}`"
        } else {
          require(p.interpolate.isEmpty,
            "INTERPOLATE requires the fill key in the select list")
          s"WITH __graft_fill_src AS (${p.core}), " +
            s"__graft_fill_grid AS (SELECT explode(sequence(" +
            s"CAST($lo AS BIGINT), CAST($hi AS BIGINT), ${p.step})) AS ${p.col}) " +
            s"SELECT * FROM __graft_fill_grid " +
            s"LEFT JOIN __graft_fill_src USING (${p.col}) ORDER BY ${p.col}"
        }
    }

  /** `LIMIT n WITH TIES` (ClickHouse / SQL-standard FETCH FIRST … WITH
    * TIES): the first n rows of the ORDER BY plus every row tied with the
    * n-th — exactly the rows whose rank() ≤ n, which is how it rewrites.
    * The empty-partition rank window is NOT a single-node sort at scale:
    * Catalyst's WindowGroupLimit rule pushes the rank ≤ n cap below the
    * exchange (each map task keeps its own top-n+ties), the same shape
    * Spark gives TakeOrderedAndProject.
    */
  private def rewriteLimitTies(sql: String): String =
    ChParser.splitLimitTies(sql) match {
      case None => sql
      case Some(p) =>
        s"SELECT * EXCEPT (__graft_rk) FROM (" +
          s"SELECT *, rank() OVER (ORDER BY ${p.orderBy}) AS __graft_rk " +
          s"FROM (${p.core}) __graft_lt) __graft_ltq " +
          s"WHERE __graft_rk <= ${p.n} ORDER BY ${p.orderBy}"
    }

  /** ClickHouse `GROUP BY … WITH TOTALS` — rewritten to
    * `GROUP BY GROUPING SETS ((exprs), ())`, which computes the per-group
    * rows AND the grand-total row in ONE aggregation pass (Catalyst
    * expands grouping sets map-side — no second scan, no union). The
    * totals row carries NULL group keys (Spark/ANSI grouping-sets
    * convention; CH emits type-default keys — 0/'' — a documented
    * divergence callers can coalesce over). HAVING/ORDER BY/LIMIT after
    * the modifier are preserved untouched.
    */
  private def rewriteWithTotals(sql: String): String =
    ChParser.splitWithTotals(sql) match {
      case None => sql
      case Some(p) =>
        s"${p.pre}GROUP BY GROUPING SETS ((${p.groupExprs}), ())${p.tail}"
    }

  /** INSERT INTO FUNCTION file('rel/path', 'Format') SELECT … — the write
    * side of the `file()` table function: renders the SELECT under the
    * same confined data root, ONE file at the exact relative path (CH's
    * contract — the path names a file, not a dataset directory; coalesce
    * is correct here because file() exports are operator-sized extracts,
    * not fact tables). Appends if the file exists (CH's default).
    */
  private def insertFile(fi: ChStatement.InsertFile): DataFrame = {
    val root = java.nio.file.Paths.get(
      spark.conf.getOption("spark.graft.fileRoot")
        .getOrElse("/tmp/graft_user_files")).toAbsolutePath.normalize
    val target = root.resolve(fi.path).normalize
    require(target.startsWith(root),
      s"file(): path escapes the data root $root: ${fi.path}")
    java.nio.file.Files.createDirectories(target.getParent)
    val df = spark.sql(rewriteSelect(fi.selectSql)).coalesce(1)
    val tmp = java.nio.file.Files.createTempDirectory("graft_file_out")
    val fmt = fi.format.trim.toLowerCase(java.util.Locale.ROOT)
    val w = df.write.mode("overwrite")
    val (writer, ext) = fmt match {
      case "csv" => (w.option("header", "false"), "csv")
      case "csvwithnames" => (w.option("header", "true"), "csv")
      case "tsv" | "tabseparated" =>
        (w.option("header", "false").option("sep", "\t"), "csv")
      case "tsvwithnames" | "tabseparatedwithnames" =>
        (w.option("header", "true").option("sep", "\t"), "csv")
      case "jsoneachrow" => (w, "json")
      case "parquet" => (w, "parquet")
      case other => throw new IllegalArgumentException(
        s"INSERT INTO FUNCTION file: unsupported format $other")
    }
    ext match {
      case "csv" => writer.csv(tmp.toString)
      case "json" => writer.json(tmp.toString)
      case "parquet" => writer.parquet(tmp.toString)
    }
    val listing = java.nio.file.Files.list(tmp)
    val produced =
      try {
        val it = listing.iterator()
        Iterator.continually(it).takeWhile(_.hasNext).map(_.next())
          .find(_.getFileName.toString.startsWith("part-"))
          .getOrElse(
            throw new IllegalStateException("file(): no output part"))
      } finally listing.close()
    if (java.nio.file.Files.exists(target)) {
      // append mode for text formats, CH's behavior on an existing file.
      // Parquet cannot append to a single file — reject rather than the
      // silent overwrite CH would never do (ADVICE r17).
      require(ext != "parquet",
        s"INSERT INTO FUNCTION file: $target exists and Parquet files " +
          "cannot be appended to; remove the file or use a new path")
      val withHeader = fmt.endsWith("withnames")
      val out = java.nio.file.Files.newOutputStream(target,
        java.nio.file.StandardOpenOption.APPEND)
      try {
        if (withHeader) {
          // the appended part re-emits the header row — strip it so the
          // target stays one header + rows (re-reading with header=true
          // must not see a mid-file header as data; ADVICE r17)
          val bytes = java.nio.file.Files.readAllBytes(produced)
          val nl = bytes.indexOf('\n'.toByte)
          if (nl >= 0) out.write(bytes, nl + 1, bytes.length - nl - 1)
        } else
          java.nio.file.Files.copy(produced, out): Unit
      } finally out.close()
    } else
      java.nio.file.Files.move(produced, target,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    rmTree(tmp.toFile)
    emptyOk
  }

  /** INSERT INTO FUNCTION remote(...) — append rows to a remote table:
    * `ch://` addresses stream native client blocks over the wire, exactly
    * the reference's path (mgmt.rs:744-770); any other URL appends over
    * JDBC (same contract, Spark-native transport).
    */
  private def insertRemote(ir: ChStatement.InsertRemote): DataFrame = {
    val isCh = ir.url.startsWith("ch://")
    def targetSchema: StructType =
      if (isCh) {
        import graft.server.ChNativeClient
        val addrs = ChNativeClient.parseAddrs(ir.url)
        val (user, pwd) = ir.auth.getOrElse(("default", ""))
        ChNativeClient.withClient(addrs.head._1, addrs.head._2, user, pwd)(
          _.schemaOf(s"SELECT * FROM ${ir.table} WHERE 1=0"))
      } else jdbcReader(ir.url, ir.table, ir.auth).load().schema
    val src: DataFrame = (ir.values, ir.selectSql) match {
      case (Some(rows), _) =>
        // cast raw literals to the remote table's schema, positionally
        val target = targetSchema
        val arity = rows.headOption.map(_.length).getOrElse(0)
        require(arity == target.fields.length,
          s"remote INSERT arity $arity != remote table arity ${target.fields.length}")
        val fields = (0 until arity).map(i => StructField(s"_c$i", StringType))
        val raw = spark.createDataFrame(
          rows.map(r => Row(r.map(_.map(stripQuotes).orNull): _*)).asJava,
          StructType(fields))
        raw.select(target.fields.zipWithIndex.map { case (f, i) =>
          col(s"_c$i").cast(f.dataType).as(f.name)
        }.toIndexedSeq: _*)
      case (None, Some(sel)) => spark.sql(rewriteSelect(sel))
      case _ => throw new IllegalArgumentException("remote INSERT needs VALUES or SELECT")
    }
    if (isCh) {
      import graft.server.ChNativeClient
      val addrs = ChNativeClient.parseAddrs(ir.url)
      val (user, pwd) = ir.auth.getOrElse(("default", ""))
      val table = ir.table
      val schema = src.schema // captured by value: the closure must not drag the DataFrame in
      // executor-side streaming append, partitions round-robined across
      // shard addresses (the reference writes whole blocks to its pool's
      // connections the same way); each partition streams its rows as
      // native Data blocks without driver-side collection
      src.rdd.foreachPartition { rows =>
        if (rows.hasNext) {
          val pid = Option(org.apache.spark.TaskContext.get())
            .map(_.partitionId()).getOrElse(0)
          val (host, port) = addrs(pid % addrs.length)
          ChNativeClient.withClient(host, port, user, pwd)(
            _.insertStream(s"INSERT INTO $table FORMAT Native", schema, rows))
        }
      }
    } else {
      val w = src.write.format("jdbc").mode("append")
        .option("url", ir.url).option("dbtable", ir.table)
      ir.auth.fold(w) { case (u, p) => w.option("user", u).option("password", p) }
        .save()
    }
    emptyOk
  }

  private def emptyOk: DataFrame = spark.emptyDataFrame

  /** The running-statement registry as rows (SHOW PROCESSLIST and
    * system.processes share it).
    */
  private def processesDf: DataFrame = {
    import scala.jdk.CollectionConverters._
    val now = System.currentTimeMillis
    val rows = GraftSession.processes.values.asScala.toSeq
      .sortBy(_.startMs).map { e =>
        Row(e.qid, e.query, (now - e.startMs) / 1000.0, e.threadId)
      }
    spark.createDataFrame(rows.asJava, StructType(Seq(
      StructField("query_id", StringType), StructField("query", StringType),
      StructField("elapsed", DoubleType), StructField("thread_id", LongType))))
  }

  private def fullName(db: Option[String], name: String): String =
    db.fold(s"`$name`")(d => s"`$d`.`$name`")

  private def tableProp(db: Option[String], name: String, key: String): Option[String] = {
    val ident = spark.sessionState.sqlParser.parseMultipartIdentifier(
      db.map(d => s"`$d`.`$name`").getOrElse(s"`$name`"))
    val cat = spark.sessionState.catalog
    val tid = org.apache.spark.sql.catalyst.TableIdentifier(
      ident.last, if (ident.length > 1) Some(ident(ident.length - 2)) else None)
    val meta = cat.getTableMetadata(tid)
    meta.properties.get(key)
  }

  /** Declared CH types per column, recorded at CREATE time. */
  private def chTypes(db: Option[String], name: String): Map[String, String] =
    tableProp(db, name, "graft.ch.types").map {
      _.split("\u0001").filter(_.nonEmpty).map { kv =>
        val Array(k, v) = kv.split("\u0002", 2)
        k -> v
      }.toMap
    }.getOrElse(Map.empty)

  private def isNullable(t: BqlType): Boolean = t match {
    case BqlType.Nullable(_) => true
    case _ => false
  }

  private def tableLocation(db: String, name: String): java.nio.file.Path = {
    val meta = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(name, Some(db)))
    java.nio.file.Paths.get(meta.location.getPath)
  }

  /** Spark's own inverse of its partition-dir escaping — a hand-rolled
    * copy here would have to stay bit-for-bit in sync with the writer (and
    * an earlier one already diverged: it threw NumberFormatException on a
    * bare '%' that Spark's helper passes through).
    */
  private def unescapePartValue(s: String): String =
    org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.unescapePathName(s)

  /** The directory name Spark writes for a null/empty partition value. */
  private def defaultPartDir: String =
    s"$PtkCol=" + org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.DEFAULT_PARTITION_NAME

  /** Spark's data-file listing rule: a path is data only if NO component is
    * hidden — starts with '.' or with '_' (partition dirs like `__ptk=...`
    * are exempt via the '=' test). Without this, leftovers under
    * `_temporary/` from a crashed write would be swept into a compaction.
    */
  private def isHiddenPath(rel: java.nio.file.Path): Boolean = {
    import scala.jdk.CollectionConverters._
    rel.iterator.asScala.exists { seg =>
      val n = seg.toString
      n.startsWith(".") || (n.startsWith("_") && !n.contains("="))
    }
  }

  /** OPTIMIZE TABLE = small-file compaction. The reference's OPTIMIZE is a
    * part-store flush stub (mgmt.rs:923-941, parts.rs:453-455); here every
    * INSERT statement commits its own file set, so a 100 TB ingest stream
    * accumulates per-statement small files whose open/footer cost comes to
    * dominate scans. Rewrite each over-fragmented partition directory into
    * ~`graft.optimize.targetFileBytes` files (default 128 MB, the
    * maxPartitionBytes-aligned scan unit):
    *
    *   - only directories with more files than their byte size warrants
    *     are rewritten — OPTIMIZE on a compact table is a no-op;
    *   - oversized partitions split across ceil(bytes/target) files via a
    *     per-row salt (no single giant file per partition: a file is the
    *     scan-parallelism unit on a cluster);
    *   - crash-safe without a lock on readers, via an INTENT marker with
    *     ATTRIBUTABLE output and a commit witness. The intent
    *     (`_graft_intent`, published atomically BEFORE the compaction
    *     write) records a unique job tag, the originals to retire, and
    *     their total footer row count. The job writes into a hidden
    *     staging directory (`_graft_stage-<tag>`, invisible to readers),
    *     then publishes each staged file into its table directory under a
    *     tag-prefixed name. Replay therefore touches ONLY files provably
    *     from the crashed job — staged files plus tag-prefixed files —
    *     and a file committed by anyone else (an INSERT landing between
    *     the intent publish and the replay) is invisible to the decision
    *     and can never be deleted (ADVICE r7 high). The witness: every
    *     compacted part holds ≥1 row, so a job that died before its
    *     Spark write committed counts SHORT of the expected total ⇒ roll
    *     its own output back, originals untouched; a full count proves
    *     the write committed ⇒ roll forward (finish the publish moves and
    *     the retirement, idempotently). Every crash instant is covered:
    *     before the intent publish nothing has happened (a stale `.tmp`
    *     is discarded); between publish and commit the replay rolls back;
    *     between commit and the retirement deletes (the window a
    *     post-commit retire marker cannot cover — VERDICT r6) the replay
    *     completes them. A plain EXCEPTION (disk full, interrupted job)
    *     before the publish moves finish takes the same rollback inline —
    *     own output deleted, intent withdrawn, rethrow — so a lingering
    *     intent only ever means a process crash (ADVICE r7 medium); after
    *     that point failures roll FORWARD via the intent. Readers may see
    *     duplicates only between commit and retirement, and that window
    *     is bounded, never compounded;
    *   - bucketed tables (CLUSTERED BY) keep their co-located-join layout
    *     and are left alone — their file count is fixed by the bucket
    *     spec, not by insert history.
    *
    * Local-FS file listing here; on a real cluster the identical walk goes
    * through the Hadoop FileSystem API.
    */
  private def optimizeTable(db: Option[String], name: String,
      fin: Boolean = false, partition: Option[String] = None,
      dedup: Boolean = false, dedupBy: Option[Seq[String]] = None): Unit = {
    val rdb = db.getOrElse(spark.catalog.currentDatabase)
    val full = fullName(db, name)
    val meta = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(name, Some(rdb)))
    if (meta.bucketSpec.isDefined) { spark.catalog.refreshTable(full); return }
    // TTL applies at merge time (CH's model): expire rows FIRST — as a
    // mutation, so only files containing an expired row are rewritten —
    // then compact the survivors. A non-TRUE (NULL) expiry check keeps
    // the row, like CH's handling of NULL TTL values.
    meta.properties.get("graft.setting.ttl").foreach { ttl =>
      mutateTable(AlterMutate(db, name, Nil, s"($ttl) <= now()", partition))
    }
    val loc = tableLocation(rdb, name)
    val lock = GraftSession.tableWriteLocks
      .computeIfAbsent(s"$rdb.$name", _ => new Object)
    lock.synchronized {
      val target = spark.conf.getOption("graft.optimize.targetFileBytes")
        .map(_.toLong).getOrElse(128L * 1024 * 1024)
      import scala.jdk.CollectionConverters._
      // Replay an interrupted predecessor first (see scaladoc). A stale
      // .tmp is a crash before the atomic publish — no write started,
      // discard it.
      val intent = loc.resolve("_graft_intent")
      java.nio.file.Files.deleteIfExists(loc.resolve("_graft_intent.tmp"))
      if (java.nio.file.Files.exists(intent)) replayIntent(loc, intent, full)
      // OPTIMIZE ... PARTITION v: only that partition's directory is
      // listed, rewritten and (under FINAL) merged — the rest of the
      // table is untouched bytes, CH's partition-scoped merge
      val scopeDir = partition.map(v => loc.resolve(s"$PtkCol=" +
        org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
          .escapePathName(v)))
      val walkRoot = scopeDir.getOrElse(loc)
      val dataFiles =
        if (!java.nio.file.Files.isDirectory(walkRoot)) Vector.empty
        else {
          val walk = java.nio.file.Files.walk(walkRoot)
          try walk.iterator.asScala.filter(p =>
            java.nio.file.Files.isRegularFile(p) &&
              p.getFileName.toString.endsWith(".parquet") &&
              !isHiddenPath(loc.relativize(p))).toVector
          finally walk.close()
        }
      def filesNeeded(fs: Seq[java.nio.file.Path]): Int = math.max(1,
        math.ceil(fs.map(java.nio.file.Files.size(_)).sum.toDouble / target).toInt)
      // OPTIMIZE ... FINAL on a ReplacingMergeTree: the merge itself —
      // physically rewrite the table as its deduplicated view (same
      // per-key max-version selection as the FROM ... FINAL rewrite,
      // partition-scoped like a real MergeTree merge). Reuses the
      // intent/replay protocol with ONE change: the commit witness is the
      // PLANNED deduplicated row count (computed up front), not the
      // retired files' count — a crash mid-write counts short and rolls
      // back to the originals; a complete write counts exactly and
      // commits. Non-merging engines ignore FINAL (plain compaction).
      val mergedSel =
        if (fin && meta.properties.get("graft.engine").exists(isMergingEngine))
          mergedViewSelect(meta, rdb, name, withPtk = true)
        else None
      if (mergedSel.isDefined) {
        if (dataFiles.isEmpty) { spark.catalog.refreshTable(full); return }
        val partitioned =
          spark.table(full).schema.fieldNames.contains(PtkCol)
        // partition-scoped FINAL merges (and retires) ONLY that
        // partition's rows — writing the full merged table while
        // retiring one directory would duplicate everything else
        val merged = partition.foldLeft(spark.sql(mergedSel.get))(
          (df, v) => df.where(col(s"`$PtkCol`") === lit(v)))
        stagedReplace(loc, full, partitioned, merged,
          dataFiles, "optf-", filesNeeded(dataFiles))
        return
      }
      // OPTIMIZE ... DEDUPLICATE: CH's exact-duplicate-row removal at
      // merge time — a full distinct over the scoped files, through the
      // same crash-safe staged replace (identical rows share their
      // partition key, so the partitioned layout is preserved)
      if (dedup) {
        if (dataFiles.isEmpty) { spark.catalog.refreshTable(full); return }
        val schema = spark.table(full).schema
        val partitioned = schema.fieldNames.contains(PtkCol)
        val src = spark.read.schema(schema)
          .option("basePath", loc.toString)
          .parquet(dataFiles.map(_.toString): _*)
        // DEDUPLICATE BY cols: duplicates are judged on the listed
        // columns only; CH keeps an arbitrary row of each group — the
        // deterministic stand-in here is the full-row MAX (field-order
        // lexicographic, the same pinned divergence ReplacingMergeTree's
        // no-version merge uses). The partition key joins the grouping
        // implicitly: MergeTree merges never cross partitions.
        val deduped = dedupBy match {
          case None => src.distinct()
          case Some(by) =>
            val all = schema.fieldNames.toSeq
            by.foreach(c => require(all.exists(_.equalsIgnoreCase(c)),
              s"DEDUPLICATE BY: no column $c in $name"))
            val keys = by ++
              (if (partitioned && !by.exists(_.equalsIgnoreCase(PtkCol)))
                Seq(PtkCol) else Nil)
            src.groupBy(keys.map(c => col(s"`$c`")): _*)
              .agg(max(struct(all.map(c => col(s"`$c`")): _*))
                .as("__graft_rep"))
              .select(all.map(c => col(s"__graft_rep.`$c`").as(c)): _*)
        }
        stagedReplace(loc, full, partitioned, deduped,
          dataFiles, "optd-", filesNeeded(dataFiles))
        return
      }
      val needs = dataFiles.groupBy(_.getParent)
        .filter { case (_, fs) => fs.size > filesNeeded(fs) }
      if (needs.isEmpty) { spark.catalog.refreshTable(full); return }
      // Publish the intent BEFORE the compaction write: the job tag (the
      // output-attribution key), the originals to retire, and their
      // footer row count (the commit witness). Atomic (temp +
      // ATOMIC_MOVE) so a torn marker can never half-replay.
      val retired = needs.values.flatten.toSeq
      val tag = "opt-" + java.util.UUID.randomUUID.toString
      val staging = loc.resolve(s"_graft_stage-$tag")
      val intentTmp = loc.resolve("_graft_intent.tmp")
      java.nio.file.Files.write(intentTmp,
        (tag +: retired.map(parquetRowCount).sum.toString +:
          retired.map(p => loc.relativize(p).toString)).asJava)
      java.nio.file.Files.move(intentTmp, intent,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      try {
        val schema = spark.table(full).schema
        val partitioned = schema.fieldNames.contains(PtkCol)
        val outCols = schema.fieldNames.map(f => col(s"`$f`")).toSeq
        failpoint("write")
        if (partitioned) {
          // one job over all fragmented dirs: read them with the table's
          // basePath so __ptk survives, broadcast each dir's target file
          // count, salt rows into that many write groups, and shuffle on
          // (__ptk, salt) so each group becomes one output file
          val nfRows = needs.toSeq.map { case (dir, fs) =>
            val dn = dir.getFileName.toString
            // the Hive default dir (__ptk=__HIVE_DEFAULT_PARTITION__)
            // holds the NULL partition value: reading with basePath
            // yields __ptk = NULL there, so its per-dir file count must
            // join back null-safely (<=>) — a string-equality join would
            // match zero rows and the "compaction" would silently drop
            // the partition
            Row(if (dn == defaultPartDir) null
                else unescapePartValue(dn.stripPrefix(s"$PtkCol=")),
              filesNeeded(fs))
          }
          val nfDf = spark.createDataFrame(nfRows.asJava, StructType(Seq(
            StructField("__nfptk", StringType), StructField("__nf", IntegerType))))
          val src = spark.read.schema(schema)
            .option("basePath", loc.toString)
            .parquet(needs.keys.map(_.toString).toSeq: _*)
          // partitionBy writes the same __ptk=… layout (and Hive default
          // dir) as the table itself, so staged relative paths map 1:1
          // onto table directories
          val joined = src
            .join(broadcast(nfDf), col(s"`$PtkCol`") <=> col("__nfptk"))
            .withColumn("__salt", pmod(monotonically_increasing_id(), col("__nf")))
            .repartition(col(s"`$PtkCol`"), col("__salt"))
            .select(outCols: _*)
          sortedRuns(meta, joined, withPtk = true)
            .write.options(bloomWriteOpts(meta)).partitionBy(PtkCol)
            .mode("overwrite").parquet(staging.toString)
        } else {
          val nf = filesNeeded(needs.values.flatten.toSeq)
          val compacted = spark.read.schema(schema).parquet(loc.toString)
            .repartition(nf)
            .select(outCols: _*)
          sortedRuns(meta, compacted, withPtk = false)
            .write.options(bloomWriteOpts(meta))
            .mode("overwrite").parquet(staging.toString)
        }
        // the staged files are committed (Spark's own job commit);
        // publish them into the table under tag-prefixed names
        stagedDataFiles(staging).foreach(publishStaged(loc, staging, tag, _))
      } catch {
        case t: Throwable =>
          // no original has been touched yet, so deleting this job's own
          // (tag-attributed) output and withdrawing the intent restores
          // the exact pre-OPTIMIZE state — a lingering intent only ever
          // means a process crash (ADVICE r7 medium)
          taggedFiles(retired.map(_.getParent).distinct, tag)
            .foreach(p => java.nio.file.Files.deleteIfExists(p))
          deleteRecursively(staging)
          java.nio.file.Files.deleteIfExists(intent)
          spark.catalog.refreshTable(full)
          throw t
      }
      // from here the job is committed and failures roll FORWARD: the
      // retirement is idempotent, and if anything below dies the next
      // OPTIMIZE's replay (full witness count ⇒ committed) finishes it
      failpoint("retire")
      retired.foreach(p => java.nio.file.Files.deleteIfExists(p))
      deleteRecursively(staging)
      java.nio.file.Files.delete(intent)
      spark.catalog.refreshTable(full)
    }
  }

  /** ClickHouse partition DDL — `ALTER TABLE t DROP|DETACH|ATTACH
    * PARTITION v`. Partitions are `__ptk=<v>` directories, so all three
    * are METADATA-SCALE operations: a drop deletes one directory, a
    * detach renames it under `_graft_detached/` (hidden from scans by the
    * underscore rule, exactly CH's `detached/` contract), an attach
    * renames it back — no data is read or rewritten regardless of table
    * size, which is the whole point of partition-level retention at
    * 100 TB (CH docs, sql-reference/statements/alter/partition). The
    * directory rename is a same-filesystem atomic move; the catalog's
    * partition entry is dropped/recovered to match.
    */
  private def alterPartition(a: AlterPartition): Unit = {
    val rdb = a.db.getOrElse(spark.catalog.currentDatabase)
    val full = fullName(a.db, a.name)
    require(spark.table(full).schema.fieldNames.contains(PtkCol),
      s"ALTER ... PARTITION: table ${a.name} is not partitioned")
    val loc = tableLocation(rdb, a.name)
    val dirName = s"$PtkCol=" + org.apache.spark.sql.catalyst.catalog
      .ExternalCatalogUtils.escapePathName(a.value)
    val live = loc.resolve(dirName)
    val detachedRoot = loc.resolve("_graft_detached")
    val detached = detachedRoot.resolve(dirName)
    val lock = GraftSession.tableWriteLocks
      .computeIfAbsent(s"$rdb.${a.name}", _ => new Object)
    lock.synchronized {
      java.nio.file.Files.deleteIfExists(loc.resolve("_graft_intent.tmp"))
      val intent = loc.resolve("_graft_intent")
      if (java.nio.file.Files.exists(intent)) replayIntent(loc, intent, full)
      def dropCatalogEntry(): Unit =
        spark.sql(s"ALTER TABLE $full DROP IF EXISTS PARTITION " +
          s"(`$PtkCol`='${a.value.replace("'", "''")}')"): Unit
      a.op match {
        case "drop" =>
          // CH drops a missing partition silently; so do we
          if (java.nio.file.Files.exists(live)) rmTree(live.toFile)
          dropCatalogEntry()
        case "detach" =>
          if (java.nio.file.Files.exists(live)) {
            require(!java.nio.file.Files.exists(detached),
              s"DETACH: a detached partition ${a.value} already exists " +
                s"for ${a.name} (ATTACH or remove it first)")
            java.nio.file.Files.createDirectories(detachedRoot)
            java.nio.file.Files.move(live, detached)
          }
          dropCatalogEntry()
        case "attach" =>
          require(java.nio.file.Files.exists(detached),
            s"ATTACH: no detached partition ${a.value} for ${a.name}")
          require(!java.nio.file.Files.exists(live),
            s"ATTACH: partition ${a.value} already present in ${a.name}")
          java.nio.file.Files.move(detached, live)
          spark.sql(s"ALTER TABLE $full RECOVER PARTITIONS")
        case other => throw new IllegalArgumentException(
          s"ALTER ... PARTITION: unknown op $other")
      }
      spark.catalog.refreshTable(full)
    }
  }

  // ---- column DDL -----------------------------------------------------

  private def propMap(meta: org.apache.spark.sql.catalyst.catalog.CatalogTable,
                      prop: String): Map[String, String] =
    meta.properties.get(prop).map {
      _.split("").filter(_.nonEmpty).map { kv =>
        val Array(k, v) = kv.split("", 2); k -> v
      }.toMap
    }.getOrElse(Map.empty)

  private def setProps(full: String, kvs: (String, String)*): Unit =
    spark.sql(s"ALTER TABLE $full SET TBLPROPERTIES (" + kvs.map {
      case (k, v) => s"'$k'='${v.replace("'", "''")}'"
    }.mkString(", ") + ")"): Unit

  private def encodePropMap(m: Map[String, String]): String =
    m.map { case (k, v) => k + "" + v }.mkString("")

  /** Shared preamble for column DDL: resolve (db, full, meta), and reject
    * touching sorting-key columns or columns the PARTITION BY expression
    * reads — CH forbids both (key layout and partition routing would
    * silently change under existing parts).
    */
  private def columnDdlChecks(db: Option[String], name: String,
      col: String, op: String): (String, String,
      org.apache.spark.sql.catalyst.catalog.CatalogTable) = {
    val rdb = db.getOrElse(spark.catalog.currentDatabase)
    val full = fullName(db, name)
    val meta = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(name, Some(rdb)))
    val pks = meta.properties.get("graft.pks")
      .map(_.split("").filter(_.nonEmpty).toSet).getOrElse(Set.empty)
    require(!pks.contains(col),
      s"$op: cannot alter sorting-key column $col (ClickHouse forbids it)")
    require(!meta.properties.get("graft.ptk.expr").exists(e =>
        ("\\b" + java.util.regex.Pattern.quote(col) + "\\b").r
          .findFirstIn(e).isDefined),
      s"$op: the PARTITION BY expression depends on $col")
    // engine arguments (Collapsing sign, Replacing/VersionedCollapsing
    // version, Summing column list) and the SAMPLE BY key are structural:
    // altering them would silently degrade FINAL/dedup/SAMPLE semantics
    // (ADVICE r15 #2; ClickHouse rejects these ALTERs)
    val engineArgs = meta.properties.get("graft.engine_args")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .getOrElse(Set.empty)
    require(!engineArgs.contains(col),
      s"$op: $col is an engine argument of " +
        s"${meta.properties.getOrElse("graft.engine", "the engine")} " +
        "(ClickHouse forbids altering it)")
    require(!meta.properties.get("graft.setting.sample_by").contains(col),
      s"$op: $col is the SAMPLE BY key (ClickHouse forbids altering it)")
    // a column referenced by a CHECK constraint: dropping/renaming it
    // would poison every subsequent INSERT's guard expression
    meta.properties.get("graft.checks").foreach { enc =>
      enc.split("\u0001").filter(_.nonEmpty).foreach { kv =>
        val Array(k, v) = kv.split("\u0002", 2)
        val refs = graft.parser.ChParser.tokenizedIdents(v)
        require(!refs.exists(_.equalsIgnoreCase(col)),
          s"$op: $col is referenced by CHECK constraint $k")
      }
    }
    // a column a projection aggregates or groups by: altering it would
    // silently desynchronize the routed results (CH rejects these ALTERs
    // until the projection is dropped)
    projectionsOf(rdb, name).foreach { case (p, _, sel) =>
      val refs = graft.parser.ChParser.tokenizedIdents(sel)
      require(!refs.exists(_.equalsIgnoreCase(col)),
        s"$op: $col is used by projection $p \u2014 DROP PROJECTION $p first")
    }
    (rdb, full, meta)
  }

  /** Decoded `graft.nested` prop: family -> flattened member names. */
  private def nestedFamilies(db: Option[String],
                             name: String): Map[String, Seq[String]] =
    tableProp(db, name, "graft.nested").map {
      _.split("\u0001").filter(_.nonEmpty).map { kv =>
        val Array(k, v) = kv.split("\u0002", 2)
        k -> v.split(",").filter(_.nonEmpty).toSeq
      }.toMap
    }.getOrElse(Map.empty)

  /** Rewrite a table's Nested-family metadata after an ALTER: the
    * `graft.nested` prop, the implicit `__nested_*` equal-length CHECKs
    * (regenerated from the new member lists), and the JVM registry.
    */
  private def writeNestedFamilies(db: Option[String], name: String,
                                  fams: Map[String, Seq[String]]): Unit = {
    val rdb = db.getOrElse(spark.catalog.currentDatabase)
    val full = fullName(db, name)
    val meta = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(name, Some(rdb)))
    val live = fams.filter(_._2.nonEmpty)
    val checks = propMap(meta, "graft.checks")
      .filterNot(_._1.startsWith("__nested_")) ++
      live.collect { case (f, ms) if ms.size >= 2 =>
        s"__nested_$f" -> ms.tail.map(m =>
          s"size(`${ms.head}`) = size(`$m`)").mkString(" AND ")
      }
    setProps(full,
      "graft.nested" -> live.map { case (f, ms) =>
        s"$f\u0002${ms.mkString(",")}" }.mkString("\u0001"),
      "graft.checks" -> encodePropMap(checks))
    GraftSession.nestedRegistry.put((rdb, name), live)
    spark.catalog.refreshTable(full)
  }

  /** `ALTER TABLE t DROP COLUMN c` — metadata-NOW: the catalog schema
    * loses the field and every subsequent scan prunes it (the bytes on
    * disk are never read again); the next OPTIMIZE rewrites files against
    * the current schema and drops the bytes physically. That deferred
    * physical reclamation is exactly CH's model (column files drop at
    * merge time). Caveat carried with it: ADD COLUMN with a previously
    * dropped name before an OPTIMIZE re-exposes the stale bytes — run
    * OPTIMIZE between, as CH users must wait for the merge.
    */
  private def alterDropColumn(a: AlterDropColumn): Unit = {
    val rdb0 = a.db.getOrElse(spark.catalog.currentDatabase)
    val fams = nestedFamilies(a.db, a.name)
    // `DROP COLUMN n` where n is a Nested FAMILY drops every member (CH
    // semantics). The implicit equal-length CHECK goes first — the
    // column-DDL guards rightly refuse to drop a check-referenced column.
    fams.get(a.col) match {
      case Some(members) =>
        writeNestedFamilies(a.db, a.name, fams - a.col)
        members.foreach(m => alterDropColumn(a.copy(col = m)))
        return
      case None => ()
    }
    // dropping a single MEMBER shrinks its family first (and with it the
    // regenerated CHECK), so the guards see the post-drop constraint set
    fams.find(_._2.contains(a.col)).foreach { case (f, ms) =>
      writeNestedFamilies(a.db, a.name,
        fams.updated(f, ms.filterNot(_ == a.col)))
    }
    val exists = spark.table(fullName(a.db, a.name)).schema
      .fieldNames.contains(a.col)
    if (!exists && a.ifExists) return
    require(exists, s"DROP COLUMN: no column ${a.col} in ${a.name}")
    val (rdb, full, meta) = columnDdlChecks(a.db, a.name, a.col, "DROP COLUMN")
    val dataFields = meta.schema.fields.filter(f =>
      f.name != PtkCol && f.name != a.col)
    require(dataFields.nonEmpty,
      s"DROP COLUMN: cannot drop the only column of ${a.name}")
    spark.sharedState.externalCatalog.alterTableDataSchema(
      rdb, a.name,
      StructType(dataFields.toIndexedSeq))
    setProps(full,
      "graft.ch.types" -> encodePropMap(propMap(meta, "graft.ch.types") - a.col),
      "graft.defaults" -> encodePropMap(propMap(meta, "graft.defaults") - a.col),
      "graft.notnull" -> meta.properties.get("graft.notnull")
        .map(_.split("").filter(n => n.nonEmpty && n != a.col)
          .mkString("")).getOrElse(""))
    spark.catalog.refreshTable(full)
    recordNormalizedScript(rdb, a.name)
  }

  /** `ALTER TABLE t RENAME COLUMN a TO b`. Parquet resolves columns by
    * NAME, so unlike CH (whose per-column files just get renamed) this
    * must rewrite the data — done once, distributed, through the same
    * crash-safe staged-replace protocol as OPTIMIZE; the catalog schema
    * and declared-type/default/notnull props follow. The honest cost is
    * one linear pass; the alternative — a name-mapping layer consulted by
    * every scan forever — taxes the 100 TB read path to spare a rare DDL.
    */
  private def alterRenameColumn(a: AlterRenameColumn): Unit = {
    // renaming a Nested member (or onto a member/family name) would
    // desynchronize the family metadata and its equal-length CHECK —
    // reject, like the other structural-column guards
    val famsR = nestedFamilies(a.db, a.name)
    require(!famsR.valuesIterator.exists(_.contains(a.from)) &&
        !famsR.contains(a.from),
      s"RENAME COLUMN: ${a.from} belongs to a Nested family " +
        "(DROP the member or the family instead)")
    require(!a.to.contains("."),
      s"RENAME COLUMN: cannot rename onto a Nested member name ${a.to}")
    val (rdb, full, meta) = columnDdlChecks(a.db, a.name, a.from, "RENAME COLUMN")
    val schema = spark.table(full).schema
    require(schema.fieldNames.contains(a.from),
      s"RENAME COLUMN: no column ${a.from} in ${a.name}")
    require(!schema.fieldNames.contains(a.to),
      s"RENAME COLUMN: column ${a.to} already exists in ${a.name}")
    rewriteTableFiles(rdb, a.name, full, meta, df =>
      df.select(schema.fields.toSeq.map { f =>
        if (f.name == a.from) col(s"`${f.name}`").as(a.to)
        else col(s"`${f.name}`")
      }: _*), "ren-")
    val dataFields = meta.schema.fields.filter(_.name != PtkCol).map { f =>
      if (f.name == a.from) f.copy(name = a.to) else f
    }
    spark.sharedState.externalCatalog.alterTableDataSchema(
      rdb, a.name,
      StructType(dataFields.toIndexedSeq))
    def renKey(m: Map[String, String]): Map[String, String] =
      m.map { case (k, v) => (if (k == a.from) a.to else k) -> v }
    setProps(full,
      "graft.ch.types" -> encodePropMap(renKey(propMap(meta, "graft.ch.types"))),
      "graft.defaults" -> encodePropMap(renKey(propMap(meta, "graft.defaults"))),
      "graft.notnull" -> meta.properties.get("graft.notnull")
        .map(_.split("").filter(_.nonEmpty)
          .map(n => if (n == a.from) a.to else n)
          .mkString("")).getOrElse(""))
    spark.catalog.refreshTable(full)
    recordNormalizedScript(rdb, a.name)
  }

  /** `ALTER TABLE t MODIFY COLUMN c Type` — a type conversion rewrites
    * the data through the staged-replace protocol (CH's MODIFY is a
    * mutation that rewrites parts the same way), with the value converted
    * by CAST semantics. Nullability follows the declared type: Nullable(T)
    * makes the column nullable, a bare T marks it required.
    */
  private def alterModifyColumn(a: AlterModifyColumn): Unit = {
    val (rdb, full, meta) = columnDdlChecks(a.db, a.name, a.col, "MODIFY COLUMN")
    val schema = spark.table(full).schema
    require(schema.fieldNames.contains(a.col),
      s"MODIFY COLUMN: no column ${a.col} in ${a.name}")
    val newNullable = a.tpe.isInstanceOf[graft.types.BqlType.Nullable]
    rewriteTableFiles(rdb, a.name, full, meta, df =>
      df.select(schema.fields.toSeq.map { f =>
        if (f.name == a.col) col(s"`${f.name}`").cast(a.tpe.sparkType).as(f.name)
        else col(s"`${f.name}`")
      }: _*), "mod-")
    val dataFields = meta.schema.fields.filter(_.name != PtkCol).map { f =>
      if (f.name == a.col)
        f.copy(dataType = a.tpe.sparkType, nullable = newNullable)
      else f
    }
    spark.sharedState.externalCatalog.alterTableDataSchema(
      rdb, a.name,
      StructType(dataFields.toIndexedSeq))
    setProps(full, "graft.ch.types" -> encodePropMap(
      propMap(meta, "graft.ch.types") + (a.col -> a.tpe.chName)))
    spark.catalog.refreshTable(full)
    recordNormalizedScript(rdb, a.name)
  }

  /** `ALTER TABLE t MODIFY TTL expr` / `REMOVE TTL`: record (or clear)
    * the expiry expression; rows actually expire at the next OPTIMIZE —
    * CH's merge-time TTL model. The expression is validated against the
    * table NOW (CH errors at ALTER time too).
    */
  private def alterTtl(a: AlterTtl): Unit = {
    val rdb = a.db.getOrElse(spark.catalog.currentDatabase)
    val full = fullName(a.db, a.name)
    a.ttl match {
      case Some(e) =>
        // must analyze as a timestamp-comparable expression over the table
        spark.table(full).select(expr(e).cast(TimestampType))
          .queryExecution.analyzed: Unit
        setProps(full, "graft.setting.ttl" -> e)
      case None =>
        spark.sql(s"ALTER TABLE $full UNSET TBLPROPERTIES IF EXISTS " +
          "('graft.setting.ttl')"): Unit
    }
    recordNormalizedScript(rdb, a.name)
  }

  /** Rewrite EVERY data file of a table through `project`, under the
    * table write lock and the intent/replay protocol. Used by the column
    * DDL that genuinely must touch data (rename/modify).
    */
  private def rewriteTableFiles(rdb: String, name: String, full: String,
      meta: org.apache.spark.sql.catalyst.catalog.CatalogTable,
      project: DataFrame => DataFrame, tagPrefix: String): Unit = {
    import scala.jdk.CollectionConverters._
    val schema = spark.table(full).schema
    val partitioned = schema.fieldNames.contains(PtkCol)
    val loc = tableLocation(rdb, name)
    val lock = GraftSession.tableWriteLocks
      .computeIfAbsent(s"$rdb.$name", _ => new Object)
    lock.synchronized {
      java.nio.file.Files.deleteIfExists(loc.resolve("_graft_intent.tmp"))
      val intent = loc.resolve("_graft_intent")
      if (java.nio.file.Files.exists(intent)) replayIntent(loc, intent, full)
      val walk = java.nio.file.Files.walk(loc)
      val dataFiles =
        try walk.iterator.asScala.filter(p =>
          java.nio.file.Files.isRegularFile(p) &&
            p.getFileName.toString.endsWith(".parquet") &&
            !isHiddenPath(loc.relativize(p))).toVector
        finally walk.close()
      if (dataFiles.isEmpty) { spark.catalog.refreshTable(full); return }
      val src = spark.read.schema(schema)
        .option("basePath", loc.toString)
        .parquet(dataFiles.map(_.toString): _*)
      val projected = project(src)
      val withPtk =
        if (partitioned && !projected.columns.contains(PtkCol))
          projected.withColumn(PtkCol, src(s"`$PtkCol`"))
        else projected
      val target = spark.conf.getOption("graft.optimize.targetFileBytes")
        .map(_.toLong).getOrElse(128L * 1024 * 1024)
      val nf = math.max(1, math.ceil(dataFiles
        .map(java.nio.file.Files.size(_)).sum.toDouble / target).toInt)
      stagedReplace(loc, full, partitioned, withPtk, dataFiles, tagPrefix, nf)
    }
  }

  /** Crash-safe staged rewrite under the intent/replay protocol: replace
    * `retired` (under `loc`) with the rows of `df`, written into a
    * staging dir, tag-published into the table's partition layout, and
    * only then retired. The commit witness in the intent is the PLANNED
    * output row count (computed up front): a crash mid-write counts
    * short on replay and rolls back to the originals; a complete write
    * counts exactly and commits. Shared by OPTIMIZE ... FINAL (retires
    * every file) and mutations (retires only the affected files).
    */
  /** Declared bloom-filter write options for DIRECT parquet writes of a
    * graft table's data — paths that bypass the catalog relation
    * (OPTIMIZE compaction/FINAL/DEDUPLICATE, mutations) must re-apply
    * them or the filters the insert path wrote silently vanish at the
    * first rewrite.
    */
  private def bloomWriteOpts(
      meta: org.apache.spark.sql.catalyst.catalog.CatalogTable): Map[String, String] =
    meta.properties.get("graft.bloom").toSeq
      .flatMap(_.split(",").filter(_.nonEmpty))
      .map(c => s"parquet.bloom.filter.enabled#$c" -> "true").toMap

  /** Sorted-run discipline for the same direct writes: parts stay sorted
    * by the sorting key (partition dir first when present), like CH
    * merges keep parts sorted.
    */
  private def sortedRuns(
      meta: org.apache.spark.sql.catalyst.catalog.CatalogTable,
      df: DataFrame, withPtk: Boolean): DataFrame = {
    val pks = meta.properties.get("graft.pks")
      .map(_.split("").filter(_.nonEmpty).toSeq).getOrElse(Nil)
      .filter(df.columns.contains)
    if (pks.isEmpty) df
    else df.sortWithinPartitions(
      ((if (withPtk && df.columns.contains(PtkCol)) Seq(PtkCol) else Nil)
        ++ pks).map(c => col(s"`$c`")): _*)
  }

  private def stagedReplace(loc: java.nio.file.Path, full: String,
      partitioned: Boolean, df: DataFrame,
      retired: Seq[java.nio.file.Path], tagPrefix: String,
      nFiles: Int): Unit = {
    import scala.jdk.CollectionConverters._
    val expected = df.count()
    val intent = loc.resolve("_graft_intent")
    val tag = tagPrefix + java.util.UUID.randomUUID.toString
    val staging = loc.resolve(s"_graft_stage-$tag")
    val intentTmp = loc.resolve("_graft_intent.tmp")
    java.nio.file.Files.write(intentTmp,
      (tag +: expected.toString +:
        retired.map(p => loc.relativize(p).toString)).asJava)
    java.nio.file.Files.move(intentTmp, intent,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    try {
      failpoint("write")
      // rewrites must keep the table's part physics: sorted runs on the
      // sorting key (CH merges keep parts sorted) and declared bloom
      // filters — this direct parquet write bypasses the catalog
      // relation, so both must be re-applied here or OPTIMIZE/mutations
      // silently degrade the layout the insert path built
      val meta2 = {
        val parts = full.replace("`", "").split("\\.", 2)
        val (d, t) =
          if (parts.length == 2) (parts(0), parts(1))
          else (spark.sessionState.catalog.getCurrentDatabase, parts(0))
        spark.sessionState.catalog.getTableMetadata(
          org.apache.spark.sql.catalyst.TableIdentifier(t, Some(d)))
      }
      val base = if (partitioned)
        df.repartition(math.max(nFiles, 1), col(s"`$PtkCol`"))
      else df.repartition(math.max(nFiles, 1))
      val sorted = sortedRuns(meta2, base, withPtk = partitioned)
      val w = if (partitioned) sorted.write.partitionBy(PtkCol)
              else sorted.write
      w.options(bloomWriteOpts(meta2)).mode("overwrite")
        .parquet(staging.toString)
      stagedDataFiles(staging).foreach(publishStaged(loc, staging, tag, _))
    } catch {
      case t: Throwable =>
        taggedFiles(retired.map(_.getParent).distinct, tag)
          .foreach(p => java.nio.file.Files.deleteIfExists(p))
        deleteRecursively(staging)
        java.nio.file.Files.deleteIfExists(intent)
        spark.catalog.refreshTable(full)
        throw t
    }
    failpoint("retire")
    retired.foreach(p => java.nio.file.Files.deleteIfExists(p))
    deleteRecursively(staging)
    java.nio.file.Files.delete(intent)
    spark.catalog.refreshTable(full)
  }

  /** A ClickHouse mutation — `ALTER TABLE t DELETE WHERE` / `ALTER TABLE
    * t UPDATE … WHERE` / `DELETE FROM t WHERE`. Rewrites ONLY the files
    * that contain a matching row (found by filtering on
    * `_metadata.file_path` — one pushdown-pruned scan), so a selective
    * mutation over a 100 TB table rewrites the touched fraction, not the
    * table; everything else is untouched bytes. Assignment RHSs evaluate
    * against the PRE-mutation row (simultaneous semantics: `UPDATE a = b,
    * b = a` swaps), a non-TRUE (false or NULL) condition leaves the row
    * alone, and updated values cast back to the column's declared type.
    * CH's restrictions carried: sorting-key/PK columns and columns the
    * PARTITION BY expression reads cannot be updated (a partition-key
    * update would move rows across partition dirs). Crash-safe via the
    * same intent/replay protocol as OPTIMIZE (planned-count witness).
    */
  private def mutateTable(m: AlterMutate): Unit = {
    val rdb = m.db.getOrElse(spark.catalog.currentDatabase)
    val full = fullName(m.db, m.name)
    val meta = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(m.name, Some(rdb)))
    val schema = spark.table(full).schema
    val partitioned = schema.fieldNames.contains(PtkCol)
    val pks = meta.properties.get("graft.pks")
      .map(_.split("").filter(_.nonEmpty).toSet).getOrElse(Set.empty)
    val ptkExpr = meta.properties.get("graft.ptk.expr")
    m.sets.foreach { case (c, _) =>
      require(schema.fieldNames.contains(c) && c != PtkCol,
        s"UPDATE: unknown column $c in ${m.name}")
      require(!pks.contains(c),
        s"UPDATE: cannot update sorting-key column $c (ClickHouse forbids " +
          "mutating the primary/sorting key)")
      require(!ptkExpr.exists(e =>
          s"\\b${java.util.regex.Pattern.quote(c)}\\b".r
            .findFirstIn(e).isDefined),
        s"UPDATE: cannot update $c — the PARTITION BY expression depends " +
          "on it and rows cannot move between partitions")
    }
    val loc = tableLocation(rdb, m.name)
    val lock = GraftSession.tableWriteLocks
      .computeIfAbsent(s"$rdb.${m.name}", _ => new Object)
    lock.synchronized {
      java.nio.file.Files.deleteIfExists(loc.resolve("_graft_intent.tmp"))
      val intent = loc.resolve("_graft_intent")
      if (java.nio.file.Files.exists(intent)) replayIntent(loc, intent, full)
      val cond = coalesce(expr(m.where), lit(false))
      // IN PARTITION scopes the file-locating scan (partition-pruned: it
      // reads one directory, not the table) AND the rewrite set
      require(m.partition.isEmpty || partitioned,
        s"IN PARTITION: table ${m.name} is not partitioned")
      val scan = m.partition.foldLeft(spark.table(full))(
        (df, v) => df.where(col(s"`$PtkCol`") === lit(v)))
      val affected = scan.where(cond)
        .select(col("_metadata.file_path")).distinct()
        .collect().map(_.getString(0)).toVector.sorted
      if (affected.isEmpty) { spark.catalog.refreshTable(full); return }
      val src = spark.read.schema(schema)
        .option("basePath", loc.toString).parquet(affected: _*)
      val rewritten =
        if (m.sets.isEmpty) src.where(!cond)
        else {
          val byName = m.sets.toMap
          src.select(schema.fields.toSeq.map { f =>
            byName.get(f.name) match {
              case Some(rhs) => when(cond, expr(rhs).cast(f.dataType))
                .otherwise(col(s"`${f.name}`")).as(f.name)
              case None => col(s"`${f.name}`")
            }
          }: _*)
        }
      val retired = affected.map(u =>
        java.nio.file.Paths.get(new java.net.URI(u).getPath))
      val target = spark.conf.getOption("graft.optimize.targetFileBytes")
        .map(_.toLong).getOrElse(128L * 1024 * 1024)
      val nf = math.max(1, math.ceil(retired
        .map(java.nio.file.Files.size(_)).sum.toDouble / target).toInt)
      stagedReplace(loc, full, partitioned, rewritten, retired, "mut-", nf)
    }
  }

  /** Replay an interrupted predecessor's intent. Only files attributable
    * to the crashed job — its staging directory plus tag-prefixed files
    * in the table directories — are ever touched; a file committed by
    * anyone else (e.g. an INSERT landing between the intent publish and
    * this replay) is invisible to the decision and never deleted
    * (ADVICE r7 high). Witness: a job that died before its Spark write
    * committed counts SHORT of the expected total ⇒ delete its own
    * output; a full count proves commit ⇒ finish the publish moves and
    * the retirement. Idempotent — a replay that itself crashes re-replays.
    */
  private def replayIntent(loc: java.nio.file.Path, intent: java.nio.file.Path,
      full: String): Unit = {
    import scala.jdk.CollectionConverters._
    val lines = java.nio.file.Files.readAllLines(intent).asScala
      .filter(_.nonEmpty).toVector
    val tag = lines.head
    val expected = lines(1).toLong
    val originals = lines.drop(2).map(loc.resolve(_))
    val staging = loc.resolve(s"_graft_stage-$tag")
    val staged = stagedDataFiles(staging)
    val moved = taggedFiles(originals.map(_.getParent).distinct, tag)
    if ((staged ++ moved).map(parquetRowCount).sum >= expected) {
      staged.foreach(publishStaged(loc, staging, tag, _))
      originals.foreach(p => java.nio.file.Files.deleteIfExists(p))
    } else {
      moved.foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
    deleteRecursively(staging)
    java.nio.file.Files.delete(intent)
    spark.catalog.refreshTable(full)
  }

  /** Committed data files under a compaction staging dir (skips Spark's
    * own `_SUCCESS`/`_temporary`). Empty when no write committed.
    */
  private def stagedDataFiles(staging: java.nio.file.Path): Vector[java.nio.file.Path] =
    if (!java.nio.file.Files.isDirectory(staging)) Vector.empty
    else {
      import scala.jdk.CollectionConverters._
      val w = java.nio.file.Files.walk(staging)
      try w.iterator.asScala.filter(p =>
        java.nio.file.Files.isRegularFile(p) &&
          p.getFileName.toString.endsWith(".parquet") &&
          !isHiddenPath(staging.relativize(p))).toVector
      finally w.close()
    }

  /** Move one staged file into its table directory under a tag-prefixed
    * name — the prefix is what makes compaction output attributable on
    * replay. Staged relative paths (`__ptk=…/part-…`) map 1:1 onto table
    * directories because the staging write used the same partition layout.
    */
  private def publishStaged(loc: java.nio.file.Path, staging: java.nio.file.Path,
      tag: String, p: java.nio.file.Path): Unit = {
    val dest = loc.resolve(staging.relativize(p).toString).getParent
      .resolve(s"$tag-${p.getFileName}")
    java.nio.file.Files.createDirectories(dest.getParent)
    java.nio.file.Files.move(p, dest)
  }

  /** The tag-attributed (this-job-only) parquet files in the given table
    * directories. */
  private def taggedFiles(dirs: Seq[java.nio.file.Path],
      tag: String): Vector[java.nio.file.Path] = {
    import scala.jdk.CollectionConverters._
    dirs.filter(java.nio.file.Files.isDirectory(_)).flatMap { d =>
      val s = java.nio.file.Files.list(d)
      try s.iterator.asScala.filter { p =>
        val n = p.getFileName.toString
        n.startsWith(s"$tag-") && n.endsWith(".parquet")
      }.toVector
      finally s.close()
    }.toVector
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit =
    if (java.nio.file.Files.exists(p)) {
      val w = java.nio.file.Files.walk(p)
      try w.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(f => java.nio.file.Files.deleteIfExists(f))
      finally w.close()
    }

  /** Test-only fault injection: setting `graft.optimize.failpoint` to a
    * site name makes that site throw, simulating a mid-compaction
    * failure (disk full, interrupted job) without killing the process.
    */
  private def failpoint(site: String): Unit =
    if (spark.conf.getOption("graft.optimize.failpoint").contains(site))
      throw new RuntimeException(s"graft.optimize.failpoint: $site")

  /** Row count of one parquet file from its footer — metadata only, no
    * data read; the OPTIMIZE intent's commit witness.
    */
  private def parquetRowCount(p: java.nio.file.Path): Long = {
    import scala.jdk.CollectionConverters._
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(p.toUri),
        spark.sessionState.newHadoopConf()))
    try r.getRowGroups.asScala.map(_.getRowCount).sum finally r.close()
  }

  private def createTable(ct0: CreateTable,
                          runCtasInsert: Boolean = true): DataFrame = {
    // CTAS: derive the column list from the SELECT's analyzed schema,
    // create the (possibly partitioned/bucketed) table as usual, then
    // run the insert through the normal INSERT...SELECT path — the data
    // lands through the same partitioned-write machinery. TRUNCATE's
    // script replay passes runCtasInsert=false: schema only, no data
    // (truncate semantics); and IF NOT EXISTS on an existing table skips
    // the insert too, like CH.
    // CH `CREATE TABLE t2 AS t1` (a BARE table name after AS, not a
    // SELECT): clone t1's STRUCTURE — columns, engine, partitioning,
    // settings — with no data (CH docs, statements/create/table). The
    // clone replays t1's recorded script under the new name.
    ct0.asSelect.map(_.trim)
        .filter(s => ct0.cols.isEmpty &&
          s.matches("[A-Za-z_][A-Za-z0-9_]*(\\.[A-Za-z_][A-Za-z0-9_]*)?")) match {
      case Some(srcName) =>
        val (sdb, st) = srcName.split("\\.", 2) match {
          case Array(d, t) => (Some(d), t)
          case Array(t) => (None, t)
        }
        val script = tableProp(sdb, st, "graft.create_script").getOrElse(
          throw new IllegalArgumentException(
            s"CREATE TABLE ... AS $srcName: the source has no recorded " +
              "engine script (structure clone needs an engine table; " +
              "use AS SELECT * FROM ... to copy data)"))
        val src = ChParser.parse(script) match {
          case Right(c: CreateTable) => c
          case other => throw new IllegalArgumentException(
            s"CREATE TABLE ... AS $srcName: unreplayable source script: $other")
        }
        val created = createTable(src.copy(db = ct0.db, name = ct0.name,
          ifNotExists = ct0.ifNotExists, asSelect = None),
          runCtasInsert = false)
        recordNormalizedScript(
          ct0.db.getOrElse(spark.catalog.currentDatabase), ct0.name)
        return created
      case None => ()
    }
    val ct = ct0.asSelect match {
      case Some(sel) if ct0.cols.isEmpty =>
        val schema = spark.sql(rewriteSelect(sel)).schema
        val cols = schema.fields.toSeq.map(f => ChStatement.ColDef(
          f.name, BqlType.fromSpark(f.dataType, f.nullable),
          primaryKey = false, notNull = !f.nullable, default = None))
        // record a NORMALIZED plain-DDL script (CH's SHOW CREATE also
        // expands CTAS columns): replaying the raw CTAS text on restart
        // would re-derive the schema from a source that may not be
        // registered in the restoring session
        val colsDdl = cols.map(c => s"`${c.name}` ${c.tpe.chName}").mkString(", ")
        val norm = s"CREATE TABLE ${ct0.name}($colsDdl)" +
          ct0.engine.map(e => s" ENGINE=$e" + (if (ct0.engineArgs.nonEmpty)
            ct0.engineArgs.mkString("(", ", ", ")") else "")).getOrElse("") +
          ct0.partitionBy.map(e => s" PARTITION BY $e").getOrElse("") +
          (if (ct0.settings.isEmpty) ""
           else " SETTINGS " + ct0.settings.map { case (k, v) => s"$k=$v" }
             .mkString(", "))
        ct0.copy(cols = cols, createScript = norm)
      case _ => ct0
    }
    val preExisting = ct0.ifNotExists &&
      spark.catalog.tableExists(fullName(ct0.db, ct0.name).replace("`", ""))
    val created = createTableInner(ct)
    if (runCtasInsert && !preExisting)
      ct.asSelect.foreach(sel =>
        insertSelect(InsertSelect(ct.db, ct.name, None, sel)))
    // inline `PROJECTION p (SELECT …)` clauses desugar onto the ALTER ADD
    // machinery; at restore (runCtasInsert=false) the hidden storage is
    // reattached, never re-populated (addProjection is idempotent, so the
    // hidden table's own replay script arriving later is a no-op)
    if (!preExisting)
      ct.projections.foreach { case (pn, body) =>
        addProjection(ct.db.getOrElse(spark.catalog.currentDatabase),
          ct.name, pn, body, populate = runCtasInsert): Unit
      }
    created
  }

  private def createTableInner(ct0: CreateTable): DataFrame = {
    // `Nested(a T, b U)` flattens into parallel arrays `n.a Array(T)`,
    // `n.b Array(U)` — CH's flatten_nested=1 storage, physically. The
    // flattened columns carry an implicit equal-length CHECK per family
    // (CH errors on ragged nested inserts); the ORIGINAL script is what
    // SHOW CREATE replays, so the Nested form round-trips while DESC
    // shows the flattened columns, exactly like ClickHouse.
    val nestedFams = scala.collection.mutable.LinkedHashMap
      .empty[String, Seq[String]]
    val ct =
      if (!ct0.cols.exists(_.tpe.chName.contains("Nested("))) ct0
      else {
        val colNames = ct0.cols.map(_.name).toSet
        val fams = nestedFams
        val cols = ct0.cols.flatMap { c =>
          c.tpe match {
            case BqlType.Nested(fields) =>
              require(c.default.isEmpty && !c.primaryKey,
                s"Nested column ${c.name}: DEFAULT/PRIMARY KEY not supported")
              val members = fields.map { case (fn, ft) =>
                val m = s"${c.name}.$fn"
                require(!colNames.contains(m),
                  s"Nested member $m collides with a declared column")
                ChStatement.ColDef(m, BqlType.Arr(ft), primaryKey = false,
                  notNull = false, default = None)
              }
              fams(c.name) = members.map(_.name)
              members
            case t =>
              // Nested only flattens at top level; Array(Nested(...)) has
              // no CH storage meaning — reject rather than store a shape
              // DESC/INSERT can't honor
              require(!t.chName.contains("Nested("),
                s"column ${c.name}: Nested is only supported as a " +
                  s"top-level column type, got ${t.chName}")
              Seq(c)
          }
        }
        val lenChecks = fams.toSeq.collect {
          case (fam, members) if members.size >= 2 =>
            val h = members.head
            s"__nested_$fam" -> members.tail.map(m =>
              s"size(`$h`) = size(`$m`)").mkString(" AND ")
        }
        val rdb0 = ct0.db.getOrElse(spark.catalog.currentDatabase)
        GraftSession.nestedRegistry.put((rdb0, ct0.name), fams.toMap)
        ct0.copy(cols = cols, checks = ct0.checks ++ lenChecks)
      }
    // family -> members, recorded so SELECT-side `n.a` references and
    // ARRAY JOIN family expansion survive session restarts (the registry
    // reloads lazily from this prop — nestedMemberNames)
    val nestedProp =
      if (nestedFams.isEmpty) Nil
      else Seq("graft.nested" -> nestedFams.map { case (f, ms) =>
        s"$f\u0002${ms.mkString(",")}" }.mkString("\u0001"))
    val full = fullName(ct.db, ct.name)
    // Collapsing engines are unusable without a valid sign (and, for the
    // versioned form, version) column — fail at CREATE, not at first
    // FINAL, where a silent fall-through would read un-collapsed rows
    ct.engine.filter(e => e.equalsIgnoreCase("CollapsingMergeTree") ||
        e.equalsIgnoreCase("VersionedCollapsingMergeTree")).foreach { e =>
      val need = if (e.equalsIgnoreCase("CollapsingMergeTree")) 1 else 2
      val colNames = ct.cols.map(_.name).toSet
      if (ct.engineArgs.take(need).size < need ||
          !ct.engineArgs.take(need).forall(colNames.contains))
        throw new IllegalArgumentException(
          s"$e requires ${if (need == 1) "a (sign)" else "a (sign, version)"}" +
            s" argument naming table columns; got ${
              ct.engineArgs.mkString("(", ", ", ")")}")
    }
    if (ct.ifNotExists && spark.catalog.tableExists(full.replace("`", ""))) return emptyOk
    val rdb = ct.db.getOrElse(spark.catalog.currentDatabase)
    val tid = org.apache.spark.sql.catalyst.TableIdentifier(ct.name, Some(rdb))
    val loc = new java.io.File(
      new java.net.URI(spark.sessionState.catalog.defaultTablePath(tid).toString).getPath)
    // A location with files but NO recorded create script is an orphan (a
    // crash between write and meta record): clear it. A location WITH a
    // script is live restored data — restoreCatalog reattaches it, so a
    // plain CREATE over it correctly fails with TableAlreadyExists above.
    if (!spark.catalog.tableExists(full.replace("`", "")) && loc.exists &&
        !java.nio.file.Files.exists(metaFile(rdb, ct.name)))
      rmTree(loc)

    val colDdl = ct.cols.map { c =>
      val sparkT = c.tpe.sparkType.sql
      val nn = if (c.notNull || (!isNullable(c.tpe) && c.primaryKey)) " NOT NULL" else ""
      s"`${c.name}` $sparkT$nn"
    }
    val ptkDdl = ct.partitionBy.map(_ => s", `$PtkCol` STRING").getOrElse("")
    val partClause = ct.partitionBy.map(_ => s" PARTITIONED BY (`$PtkCol`)").getOrElse("")
    // SETTINGS buckets=N + a PRIMARY KEY column -> hash-bucketed, sorted
    // layout: two tables bucketed the same way join WITHOUT a shuffle
    // (the 100 TB co-located-join path; reference primary keys are
    // metadata-only, crates/meta/src/types.rs:55-63 -- here they buy a
    // physical layout).
    val bucketClause =
      (ct.settings.get("buckets"), ct.cols.find(_.primaryKey)) match {
        case (Some(n), Some(pk)) =>
          s" CLUSTERED BY (`${pk.name}`) SORTED BY (`${pk.name}`) INTO $n BUCKETS"
        case _ => ""
      }
    val chTypesProp = ct.cols.map(c => s"${c.name}\u0002${c.tpe.chName}").mkString("\u0001")
    val defaultsProp = ct.cols.collect {
      case c if c.default.isDefined => s"${c.name}\u0002${c.default.get}"
    }.mkString("\u0001")
    val pksProp = ct.cols.filter(_.primaryKey).map(_.name).mkString("")
    val nnProp = ct.cols.filter(c => c.notNull ||
      (!isNullable(c.tpe) && c.primaryKey)).map(_.name).mkString("")
    val props = Seq(
      "graft.create_script" -> ct.createScript,
      "graft.engine" -> ct.engine.getOrElse("BaseStorage"),
      "graft.ch.types" -> chTypesProp) ++
      (if (ct.engineArgs.nonEmpty)
        Seq("graft.engine_args" -> ct.engineArgs.mkString(",")) else Nil) ++
      (if (pksProp.nonEmpty) Seq("graft.pks" -> pksProp) else Nil) ++
      // catalog nullability is not round-trippable for file-source tables
      // (Spark relaxes it on read), so NOT NULL-ness rides in a prop too
      (if (nnProp.nonEmpty) Seq("graft.notnull" -> nnProp) else Nil) ++
      (if (defaultsProp.nonEmpty) Seq("graft.defaults" -> defaultsProp) else Nil) ++
      // CHECK constraints (CONSTRAINT n CHECK e) — enforced on every
      // INSERT path in appendToTable, ClickHouse's semantics
      (if (ct.checks.nonEmpty)
        Seq("graft.checks" -> ct.checks.map { case (k, v) =>
          s"$k\u0002$v" }.mkString("\u0001")) else Nil) ++
      nestedProp ++
      ct.partitionBy.map("graft.ptk.expr" -> _) ++
      ct.settings.map { case (k, v) => s"graft.setting.$k" -> v }
    // `INDEX n col TYPE bloom_filter[...]` on a plain column wires to a
    // REAL parquet bloom filter: recorded as a table OPTION so EVERY
    // write path through the relation (INSERT, INSERT..SELECT, MV fanout,
    // wire blocks) emits the filter, and the scan's row-group filtering
    // consults it for equality/IN predicates — CH's skipping-index
    // payoff, parquet-native. minmax/set indexes stay informational
    // (footer stats already cover them); expression-typed indexes are
    // accepted as documentation only, like CH GRANULARITY.
    val bloomCols = ct.indexes.flatMap(GraftSession.bloomIndexColumn)
      .filter(c => ct.cols.exists(_.name.equalsIgnoreCase(c))).distinct
    val optionsDdl =
      if (bloomCols.isEmpty) ""
      else "\nOPTIONS (" + bloomCols.map(c =>
        s"'parquet.bloom.filter.enabled#$c'='true'").mkString(", ") + ")"
    val propsDdl = (props ++
      (if (bloomCols.nonEmpty) Seq("graft.bloom" -> bloomCols.mkString(","))
       else Nil)).map { case (k, v) =>
      s"'${k.replace("'", "''")}'='${v.replace("'", "''")}'"
    }.mkString(", ")

    // an explicit LOCATION is not auto-created the way a managed path is
    java.nio.file.Files.createDirectories(loc.toPath)
    val r = spark.sql(
      s"""CREATE TABLE ${if (ct.ifNotExists) "IF NOT EXISTS " else ""}$full
         |(${colDdl.mkString(", ")}$ptkDdl)
         |USING parquet$partClause$bucketClause$optionsDdl
         |LOCATION '${loc.getAbsolutePath.replace("'", "''")}'
         |TBLPROPERTIES ($propsDdl)""".stripMargin)
    // record the create script for restart replay (sled-store analog,
    // sys.rs:624-642) — written after the catalog accepts the table
    java.nio.file.Files.createDirectories(metaFile(rdb, ct.name).getParent)
    java.nio.file.Files.writeString(metaFile(rdb, ct.name), ct.createScript)
    r
  }

  /** Literal → typed column coercion, mirroring the reference's insert
    * literal codecs (mgmt.rs:1127-1269): date/datetime accept both native
    * string forms and epoch integers; FixedString zero-pads to N
    * (mgmt.rs:1258-1263); decimals rescale to declared scale.
    */
  private def coerce(raw: org.apache.spark.sql.Column, t: BqlType): org.apache.spark.sql.Column = {
    val isIntLiteral = raw.rlike("^-?[0-9]+$")
    def base(bt: BqlType): org.apache.spark.sql.Column = bt match {
      case BqlType.Nullable(inner) => base(inner)
      case BqlType.LowCardinality(inner) => base(inner)
      case BqlType.Date | BqlType.Date32 =>
        // epoch-day integers and 'YYYY-MM-DD' strings both accepted
        when(isIntLiteral, date_from_unix_date(raw.cast(IntegerType)))
          .otherwise(raw.cast(DateType))
      case BqlType.DateTime(_) =>
        // epoch-second integers and native datetime strings
        when(isIntLiteral, timestamp_seconds(raw.cast(LongType)))
          .otherwise(raw.cast(TimestampType))
      case BqlType.DateTime64(p, _) =>
        // numeric literals are Int64 TICKS at 10^-p seconds (CH's wire
        // and literal form); strings keep their sub-second text. Spark
        // timestamps are µs: p<=6 scales up exactly, 7..9 divides
        // (documented truncation).
        val isNumLiteral = raw.rlike("^-?[0-9]+(\\.[0-9]+)?$")
        val micros =
          if (p <= 6) raw.cast(DecimalType(30, 10)) *
            lit(math.pow(10, 6 - p).toLong)
          else raw.cast(DecimalType(30, 10)) /
            lit(math.pow(10, p - 6).toLong)
        when(isNumLiteral, timestamp_micros(micros.cast(LongType)))
          .otherwise(raw.cast(TimestampType))
      case BqlType.FixedString(n) =>
        // zero-pad to N bytes like the reference (mgmt.rs:1258-1263)
        rpad(raw.cast(BinaryType), n, Array[Byte](0))
      case e: BqlType.Enum =>
        // enums store their NAME string; CH also accepts the numeric form
        // in INSERT (VALUES (1) for 'low') — map it through the declared
        // value->name table instead of storing the literal '1' (ADVICE
        // r15 #4). An unknown name or number aborts the insert, CH's
        // behavior.
        val fromNum = e.entries.foldLeft(lit(null).cast(StringType)) {
          case (acc, (n, v)) =>
            when(raw.cast(IntegerType) === v, lit(n)).otherwise(acc)
        }
        val names = e.entries.map(_._1)
        val mapped = when(isIntLiteral, fromNum)
          .otherwise(when(raw.isin(names: _*), raw))
        when(raw.isNull, lit(null).cast(StringType)).otherwise(
          when(assert_true(mapped.isNotNull,
            concat(lit(s"unknown ${e.chName} value: "), raw)).isNull,
            mapped))
      case other => raw.cast(other.sparkType)
    }
    base(t)
  }

  private def tableMeta(db: Option[String], name: String):
      (StructType, Map[String, String], Option[String]) = {
    val schema = spark.table(fullName(db, name)).schema
    (schema, chTypes(db, name), tableProp(db, name, "graft.ptk.expr"))
  }

  /** Align a DataFrame of source values (any types) to the table's declared
    * schema + computed __ptk, then append. The partition expression is
    * evaluated by Catalyst codegen over the CH function pack — the Spark
    * replacement for the reference's cranelift JIT (write.rs:146-179).
    */
  /** ClickHouse MATERIALIZED VIEW: a normal engine table whose schema
    * derives from the SELECT (the CTAS machinery), tagged with
    * `graft.mv.src` / `graft.mv.select` properties; [[appendToTable]]
    * consults the tags and pushes every inserted block through the
    * SELECT into the view's storage. Exactly CH's contract, including
    * the famous caveat: an AGGREGATING view sees each inserted block
    * SEPARATELY (per-block partial rows accumulate; CH needs a
    * *MergeTree merge or -State combinators for the same reason —
    * spec-pinned). POPULATE backfills once from the existing source.
    * v1 scope: the view and its source live in the same database and the
    * SELECT's first top-level FROM names the source table directly.
    */
  // ---- Projections (ClickHouse ALTER TABLE ... ADD PROJECTION) ----------
  //
  // A projection is a pre-aggregated alternate layout the PLANNER routes to
  // automatically (CH stores them per-part; here each projection is a hidden
  // table `__proj_<parent>_<name>` maintained by the MV insert-fanout —
  // every inserted block appends its PARTIAL per-block aggregate, and the
  // router re-aggregates, which is exactly CH's AggregatingMergeTree merge
  // model). Parent table properties carry the routing metadata:
  //   graft.proj.list            = p1,p2
  //   graft.proj.<p>.table       = hidden table name
  //   graft.proj.<p>.select      = full SELECT (rebuilds + introspection)
  //   graft.proj.<p>.map         = outkindsrc entries joined by
  //                                , kind ∈ key|sum|min|max|count|countcol
  // Mutations/OPTIMIZE FINAL/partition DDL on the parent rebuild the
  // projection in full (CH rebuilds projections for mutated parts).

  private def projTableName(parent: String, proj: String): String =
    s"__proj_${parent}_$proj"

  /** Physically relocate a (just-renamed) table's storage to its current
    * default path and repoint the catalog entry. Tables here are EXTERNAL
    * (explicit LOCATION), so Spark's RENAME keeps the old directory; the
    * replay script, however, recreates at defaultTablePath(<name>) — the
    * two must agree or a restart mounts an empty table.
    */
  private def moveToDefaultLocation(rdb: String, table: String): Unit = {
    val cat = spark.sessionState.catalog
    val tid = org.apache.spark.sql.catalyst.TableIdentifier(table, Some(rdb))
    val meta = cat.getTableMetadata(tid)
    val newLoc = new java.io.File(
      new java.net.URI(cat.defaultTablePath(tid).toString).getPath)
    val oldLoc = new java.io.File(new java.net.URI(meta.location.toString).getPath)
    if (oldLoc.getCanonicalFile == newLoc.getCanonicalFile) return
    if (newLoc.exists) rmTree(newLoc) // a prior life's leftovers, never live
    java.nio.file.Files.createDirectories(newLoc.getParentFile.toPath)
    if (oldLoc.exists) java.nio.file.Files.move(oldLoc.toPath, newLoc.toPath)
    else java.nio.file.Files.createDirectories(newLoc.toPath)
    spark.sql(s"ALTER TABLE `$rdb`.`$table` SET LOCATION " +
      s"'${newLoc.getAbsolutePath.replace("'", "''")}'")
    // partition entries recorded per-directory follow the files, not the
    // catalog — re-derive them from the moved tree
    if (meta.partitionColumnNames.nonEmpty)
      spark.sql(s"ALTER TABLE `$rdb`.`$table` RECOVER PARTITIONS")
    spark.sql(s"REFRESH TABLE `$rdb`.`$table`"): Unit
  }

  /** (name, hiddenTable, select) for every projection on rdb.table. */
  private def projectionsOf(rdb: String, table: String): Seq[(String, String, String)] =
    tableProp(Some(rdb), table, "graft.proj.list").toSeq
      .flatMap(_.split(",").filter(_.nonEmpty)).flatMap { p =>
        for {
          tbl <- tableProp(Some(rdb), table, s"graft.proj.$p.table")
          sel <- tableProp(Some(rdb), table, s"graft.proj.$p.select")
        } yield (p, tbl, sel)
      }

  /** ALTER TABLE … ADD / DROP / MATERIALIZE INDEX — the skipping-index
    * DDL family over the physical parquet-bloom wiring: ADD records the
    * column (NEW writes carry the filter), MATERIALIZE rewrites existing
    * files through the staged-replace machinery so OLD data carries it
    * too (CH's MATERIALIZE INDEX contract; sorted runs re-applied with
    * it), DROP detaches (filters already in old footers are inert
    * bytes). Non-bloom kinds are accepted as documentation, CREATE
    * parity. Tracked (bloom) indexes are addressed by their COLUMN name
    * or the normalized `bf_<col>` (original creation names are not
    * persisted — the normalized replay script re-emits bf_<col>).
    */
  /** `ALTER TABLE t ADD CONSTRAINT n CHECK e` / `DROP CONSTRAINT n` —
    * CH's constraint lifecycle (MergeTree mutations docs): ADD applies
    * to FUTURE inserts only (existing rows are NOT re-validated — CH
    * parity), DROP stops enforcing immediately. The expression must
    * analyze against the table now, so later INSERTs fail on DATA, not
    * on an unresolvable guard. Constraints ride the `graft.checks` prop
    * (the same store CREATE-time CONSTRAINT clauses use), so every
    * insert path — SQL, wire blocks, MV fanout — enforces them, and the
    * normalized replay script re-emits them.
    */
  private[graft] def alterConstraint(ac: AlterConstraint): Unit = {
    val rdb = ac.db.getOrElse(spark.sessionState.catalog.getCurrentDatabase)
    val full = fullName(ac.db, ac.name)
    val meta = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(ac.name, Some(rdb)))
    val checks = propMap(meta, "graft.checks")
    ac.op match {
      case "add" =>
        require(!ac.cname.startsWith("__nested_"),
          "ADD CONSTRAINT: the __nested_ name prefix is reserved for " +
            "implicit Nested equal-length checks")
        if (checks.contains(ac.cname)) {
          if (!ac.ifNotExists) throw new IllegalArgumentException(
            s"ADD CONSTRAINT: constraint ${ac.cname} already exists on " +
              s"${ac.name}")
        } else {
          val e = ac.expr.get
          // analyze the guard against the table NOW (same expression
          // form appendToTable evaluates per insert)
          spark.table(full.replace("`", ""))
            .select(coalesce(expr(e).cast(BooleanType), lit(true)))
            .queryExecution.analyzed: Unit
          setProps(full,
            "graft.checks" -> encodePropMap(checks + (ac.cname -> e)))
          recordNormalizedScript(rdb, ac.name)
        }
      case "drop" =>
        if (!checks.contains(ac.cname)) {
          if (!ac.ifExists) throw new IllegalArgumentException(
            s"DROP CONSTRAINT: no constraint ${ac.cname} on ${ac.name}")
        } else {
          setProps(full,
            "graft.checks" -> encodePropMap(checks - ac.cname))
          recordNormalizedScript(rdb, ac.name)
        }
    }
    spark.catalog.refreshTable(full.replace("`", ""))
  }

  private[graft] def alterIndex(ai: AlterIndex): DataFrame = {
    val rdb = ai.db.getOrElse(spark.catalog.currentDatabase)
    val tid = org.apache.spark.sql.catalyst.TableIdentifier(ai.name, Some(rdb))
    require(spark.sessionState.catalog.tableExists(tid),
      s"ALTER TABLE: no table $rdb.${ai.name}")
    val full = fullName(Some(rdb), ai.name)
    def meta = spark.sessionState.catalog.getTableMetadata(tid)
    def blooms = meta.properties.get("graft.bloom")
      .map(_.split(",").filter(_.nonEmpty).toSeq).getOrElse(Nil)
    def syncStorageOptions(cols: Seq[String]): Unit = {
      val m = meta
      val base = m.storage.properties
        .filterNot(_._1.startsWith("parquet.bloom.filter.enabled#"))
      spark.sharedState.externalCatalog.alterTable(m.copy(storage =
        m.storage.copy(properties = base ++
          cols.map(c => s"parquet.bloom.filter.enabled#$c" -> "true"))))
      spark.catalog.refreshTable(full.replace("`", ""))
    }
    ai.op match {
      case "add" =>
        GraftSession.bloomIndexColumn(ai.body.get) match {
          case Some(c) if meta.schema.fieldNames.exists(_.equalsIgnoreCase(c)) =>
            if (blooms.exists(_.equalsIgnoreCase(c))) {
              if (!ai.ifExists) throw new IllegalArgumentException(
                s"ADD INDEX: a bloom_filter index on $c already exists")
            } else {
              val cols = blooms :+ c
              setProps(full, "graft.bloom" -> cols.mkString(","))
              syncStorageOptions(cols)
              recordNormalizedScript(rdb, ai.name)
            }
          case Some(c) => throw new IllegalArgumentException(
            s"ADD INDEX: no column $c in ${ai.name}")
          case None => () // minmax/set/expression kinds: documentation only
        }
        emptyOk
      case "drop" =>
        blooms.find(c => ai.indexName.equalsIgnoreCase(s"bf_$c") ||
            ai.indexName.equalsIgnoreCase(c)) match {
          case Some(c) =>
            val rest = blooms.filterNot(_.equalsIgnoreCase(c))
            if (rest.isEmpty)
              spark.sql(s"ALTER TABLE $full UNSET TBLPROPERTIES IF EXISTS " +
                "('graft.bloom')")
            else setProps(full, "graft.bloom" -> rest.mkString(","))
            syncStorageOptions(rest)
            recordNormalizedScript(rdb, ai.name)
          case None => require(ai.ifExists,
            s"DROP INDEX: no tracked index ${ai.indexName} on ${ai.name} " +
              "(physical bloom_filter indexes address by column or bf_<col>)")
        }
        emptyOk
      case "materialize" =>
        // full rewrite: EXISTING files gain the declared filters (and the
        // sorted-run discipline) — stagedReplace re-applies both
        import scala.jdk.CollectionConverters._
        val loc = java.nio.file.Paths.get(
          new java.net.URI(meta.location.toString).getPath)
        val dataFiles =
          if (!java.nio.file.Files.isDirectory(loc)) Vector.empty
          else {
            val walk = java.nio.file.Files.walk(loc)
            try walk.iterator.asScala.filter(p =>
              java.nio.file.Files.isRegularFile(p) &&
                p.getFileName.toString.endsWith(".parquet") &&
                !isHiddenPath(loc.relativize(p))).toVector
            finally walk.close()
          }
        if (dataFiles.nonEmpty) {
          val schema = spark.table(full).schema
          val partitioned = schema.fieldNames.contains(PtkCol)
          val src = spark.read.schema(schema)
            .option("basePath", loc.toString)
            .parquet(dataFiles.map(_.toString): _*)
          stagedReplace(loc, full, partitioned, src, dataFiles, "idxm-",
            math.max(dataFiles.size, 1))
        }
        emptyOk
    }
  }

  private[graft] def alterProjection(ap: AlterProjection): DataFrame = {
    val rdb = ap.db.getOrElse(spark.catalog.currentDatabase)
    require(spark.sessionState.catalog.tableExists(
        org.apache.spark.sql.catalyst.TableIdentifier(ap.name, Some(rdb))),
      s"ALTER TABLE: no table $rdb.${ap.name}")
    val existing = projectionsOf(rdb, ap.name)
    ap.op match {
      case "add" =>
        if (existing.exists(_._1 == ap.projName)) {
          if (ap.ifNotExists) emptyOk
          else throw new IllegalArgumentException(
            s"projection ${ap.projName} already exists on ${ap.name}")
        } else addProjection(rdb, ap.name, ap.projName, ap.selectSql.get,
          populate = true)
      case "drop" =>
        existing.find(_._1 == ap.projName) match {
          case None if ap.ifExists => emptyOk
          case None => throw new IllegalArgumentException(
            s"no projection ${ap.projName} on ${ap.name}")
          case Some((_, tbl, _)) => dropProjection(rdb, ap.name, ap.projName, tbl)
        }
      case "materialize" =>
        val (_, tbl, sel) = existing.find(_._1 == ap.projName).getOrElse(
          throw new IllegalArgumentException(
            s"no projection ${ap.projName} on ${ap.name}"))
        rebuildProjection(rdb, tbl, sel); emptyOk
    }
  }

  /** Splice `FROM <parent>` into a CH projection body, which omits it
    * (`SELECT a, sum(b) GROUP BY a`). Quoted strings are blanked and only
    * a depth-0 GROUP BY splits, so literals can't fool the splice.
    */
  private def projSelectWithFrom(body: String, parent: String): String =
    ChParser.firstFromTable(body) match {
      case Some((src, _, _)) =>
        val bare = if (src.contains(".")) src.split("\\.", 2)(1) else src
        require(bare.equalsIgnoreCase(parent),
          s"ADD PROJECTION: the SELECT must read FROM $parent (got $src)")
        body
      case None =>
        val blanked = {
          val sb = new StringBuilder(body)
          var i = 0; var q: Char = 0
          while (i < sb.length) {
            val c = sb.charAt(i)
            if (q != 0) { if (c == q) q = 0; sb.setCharAt(i, ' ') }
            else if (c == '\'' || c == '"' || c == '`') { q = c; sb.setCharAt(i, ' ') }
            i += 1
          }
          sb.toString
        }
        var depth = 0; var splitAt = blanked.length
        val m = java.util.regex.Pattern
          .compile("(?i)\\bgroup\\s+by\\b").matcher(blanked)
        var found = false
        var scan = 0
        while (!found && m.find(scan)) {
          depth = blanked.substring(0, m.start)
            .count(_ == '(') - blanked.substring(0, m.start).count(_ == ')')
          if (depth == 0) { splitAt = m.start; found = true }
          else scan = m.end
        }
        body.substring(0, splitAt) + s" FROM $parent " + body.substring(splitAt)
    }

  private def addProjection(rdb: String, table: String, pname: String,
                            body: String, populate: Boolean): DataFrame = {
    // idempotent: restore replays both the parent's inline clause and the
    // hidden table's own ALTER script — the second arrival is a no-op
    if (projectionsOf(rdb, table).exists(_._1 == pname)) return emptyOk
    import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Literal => CLit}
    import org.apache.spark.sql.catalyst.expressions.aggregate._
    import org.apache.spark.sql.catalyst.plans.logical.Aggregate

    val fullSel = projSelectWithFrom(body, table)
    val analyzed = spark.sql(rewriteSelect(fullSel)).queryExecution.analyzed
    val agg = analyzed.collectFirst { case a: Aggregate => a }.getOrElse(
      throw new IllegalArgumentException(
        "ADD PROJECTION: the body must be an aggregate " +
          "(SELECT keys, aggs ... GROUP BY keys)"))
    val groupNames = agg.groupingExpressions.map {
      case ar: AttributeReference => ar.name
      case other => throw new IllegalArgumentException(
        s"ADD PROJECTION: GROUP BY must list plain columns, got ${other.sql}")
    }
    def srcOf(e: org.apache.spark.sql.catalyst.expressions.Expression,
              what: String): String = e match {
      case ar: AttributeReference => ar.name
      case other => throw new IllegalArgumentException(
        s"ADD PROJECTION: $what must be over a plain column, got ${other.sql}")
    }
    val entries = agg.aggregateExpressions.map {
      case ar: AttributeReference =>
        require(groupNames.contains(ar.name),
          s"ADD PROJECTION: non-aggregate output ${ar.name} is not a GROUP BY key")
        s"${ar.name}key${ar.name}"
      case al @ Alias(ar: AttributeReference, _) =>
        require(groupNames.contains(ar.name),
          s"ADD PROJECTION: non-aggregate output ${al.name} is not a GROUP BY key")
        s"${al.name}key${ar.name}"
      case al @ Alias(ae: AggregateExpression, _) =>
        require(!ae.isDistinct && ae.filter.isEmpty,
          "ADD PROJECTION: aggregates must be plain (no DISTINCT / FILTER)")
        ae.aggregateFunction match {
          case s: Sum => s"${al.name}sum${srcOf(s.child, "sum")}"
          case m: Min => s"${al.name}min${srcOf(m.child, "min")}"
          case m: Max => s"${al.name}max${srcOf(m.child, "max")}"
          case c: Count => c.children match {
            case Seq(CLit(_, _)) => s"${al.name}count"
            case Seq(ar: AttributeReference) =>
              s"${al.name}countcol${ar.name}"
            case _ => throw new IllegalArgumentException(
              "ADD PROJECTION: count must be count() or count(column)")
          }
          case other => throw new IllegalArgumentException(
            s"ADD PROJECTION: unsupported aggregate ${other.prettyName} " +
              "(supported: sum, min, max, count — store avg as sum + count)")
        }
      case other => throw new IllegalArgumentException(
        s"ADD PROJECTION: unsupported output ${other.sql}")
    }
    val keySrcs = entries.collect {
      case e if e.split("")(1) == "key" => e.split("")(2)
    }
    require(groupNames.forall(keySrcs.contains),
      "ADD PROJECTION: every GROUP BY key must appear in the SELECT list")

    val hidden = projTableName(table, pname)
    // A NEW projection must never mount leftovers: if a previous life's
    // replay script lingers (e.g. its restore failed), drop it so
    // createTableInner's orphan cleanup clears the stale files too.
    if (populate)
      java.nio.file.Files.deleteIfExists(metaFile(rdb, hidden)): Unit
    val script = s"ALTER TABLE $table ADD PROJECTION $pname ($body)"
    createMaterializedView(CreateMaterializedView(Some(rdb), hidden,
      engine = None, partitionBy = None, populate = populate,
      selectSql = fullSel, ifNotExists = !populate, createScript = script))
    val list = (projectionsOf(rdb, table).map(_._1) :+ pname).mkString(",")
    spark.sql(s"ALTER TABLE ${fullName(Some(rdb), table)} SET TBLPROPERTIES (" +
      s"'graft.proj.list'='$list', " +
      s"'graft.proj.$pname.table'='$hidden', " +
      s"'graft.proj.$pname.select'='${fullSel.replace("'", "''")}', " +
      s"'graft.proj.$pname.map'='${entries.mkString("").replace("'", "''")}')")
    emptyOk
  }

  private def dropProjection(rdb: String, table: String, pname: String,
                             hidden: String): DataFrame = {
    val remaining = projectionsOf(rdb, table).map(_._1).filterNot(_ == pname)
    spark.sql(s"ALTER TABLE ${fullName(Some(rdb), table)} " +
      s"UNSET TBLPROPERTIES IF EXISTS ('graft.proj.$pname.table', " +
      s"'graft.proj.$pname.select', 'graft.proj.$pname.map')")
    spark.sql(s"ALTER TABLE ${fullName(Some(rdb), table)} SET TBLPROPERTIES (" +
      s"'graft.proj.list'='${remaining.mkString(",")}')")
    run(DropTable(Some(rdb), hidden, ifExists = true), "")
    emptyOk
  }

  /** Full rebuild = TRUNCATE + re-run the defining SELECT. CH rebuilds
    * projections of mutated parts; a whole-table rebuild is the
    * single-table analog and is always correct.
    */
  private def rebuildProjection(rdb: String, hidden: String, sel: String): Unit = {
    val full = fullName(Some(rdb), hidden)
    spark.sql(s"REFRESH TABLE $full")
    // The defining SELECT must read the PARENT's rows — routed, it would
    // re-aggregate the stale partials it is replacing. Bypass is
    // thread-local so concurrent queries keep routing.
    graft.plans.ProjectionRoute.bypass.set(true)
    try
      // INSERT OVERWRITE, not drop/recreate: keeps the MV subscription props
      spark.sql(rewriteSelect(sel)).write.mode("overwrite").insertInto(full)
    finally graft.plans.ProjectionRoute.bypass.set(false)
  }

  /** Hook run by every parent-mutating path (mutations, OPTIMIZE FINAL /
    * DEDUPLICATE, partition DDL): projections must never serve stale rows.
    */
  private def rebuildProjectionsOf(db: Option[String], table: String): Unit = {
    val rdb = db.getOrElse(spark.catalog.currentDatabase)
    projectionsOf(rdb, table).foreach { case (_, hidden, sel) =>
      rebuildProjection(rdb, hidden, sel)
    }
  }

  /** CH's `CREATE MATERIALIZED VIEW v TO target AS SELECT …`: the view
    * owns NO storage — every block inserted into the SELECT's source runs
    * through the SELECT and appends to the pre-existing `target` (the
    * canonical AggregateFunction pattern: target declares
    * `AggregateFunction(f, T)` columns in an AggregatingMergeTree and the
    * view writes `fState(…)` partials). Reads of the view read the
    * target (CH contract). The subscription props live ON the target
    * (that is where the fan-out appends); `graft.mv.via` ties them to
    * the view's name so DROP of the view detaches the subscription.
    */
  private def createMvTo(mv: CreateMaterializedView): DataFrame = {
    val rdb = mv.db.getOrElse(spark.catalog.currentDatabase)
    val (tdbOpt, target) = mv.to.get
    val tdb = tdbOpt.getOrElse(rdb)
    require(tdb == rdb,
      s"MATERIALIZED VIEW TO: target must live in the view's database " +
        s"(view in $rdb, target $tdb.$target)")
    require(!mv.populate,
      "MATERIALIZED VIEW TO does not support POPULATE (ClickHouse contract)")
    require(spark.sessionState.catalog.tableExists(
        org.apache.spark.sql.catalyst.TableIdentifier(target, Some(rdb))),
      s"MATERIALIZED VIEW TO: no table $rdb.$target")
    if (mv.ifNotExists && viewDefs.contains(mv.name)) return emptyOk
    // duplicate CREATE errors like ClickHouse: silently replacing the
    // wrapper view would leave the PREVIOUS target's graft.mv.* props in
    // place, so inserts kept fanning into the abandoned target (ADVICE
    // r17). DROP VIEW first to repoint.
    require(!viewDefs.contains(mv.name),
      s"MATERIALIZED VIEW TO: view ${mv.name} already exists " +
        "(use IF NOT EXISTS, or DROP VIEW first to repoint it)")
    val src = ChParser.firstFromTable(mv.selectSql).getOrElse(
      throw new IllegalArgumentException(
        "MATERIALIZED VIEW: the SELECT must read FROM a table directly"))._1
    val srcTable = if (src.contains(".")) src.split("\\.", 2)(1) else src
    require(!srcTable.equalsIgnoreCase(target),
      "MATERIALIZED VIEW TO: the target cannot be the SELECT's own source")
    // one subscription per target: a second TO-view would silently
    // overwrite the first's graft.mv.* props (replay of THIS view's own
    // script is fine — same via name)
    tableProp(Some(rdb), target, "graft.mv.via").foreach { via =>
      require(via == mv.name,
        s"MATERIALIZED VIEW TO: $rdb.$target is already the target of " +
          s"materialized view $via")
    }
    // validate now, like CH: a bad SELECT fails at CREATE, not first insert
    spark.sql(rewriteSelect(mv.selectSql)).queryExecution.analyzed
    spark.sql(s"ALTER TABLE ${fullName(Some(rdb), target)} SET TBLPROPERTIES (" +
      s"'graft.mv.src'='${s"$rdb.$srcTable".replace("'", "''")}', " +
      s"'graft.mv.select'='${mv.selectSql.replace("'", "''")}', " +
      s"'graft.mv.via'='${mv.name.replace("'", "''")}')")
    // reads of the view see the target's contents; the replay metaFile
    // carries the ORIGINAL MV script, so a restart re-runs this method.
    // The wrapper's FROM is db-QUALIFIED: the wrapper is a temp view, so
    // an unqualified name would re-resolve against whatever the CURRENT
    // database is at read time (or at creation under a concurrent
    // session's USE) — r18 parallel-suite runs caught exactly that.
    createView(CreateView(Some(rdb), mv.name,
      selectSql = s"SELECT * FROM `$rdb`.`$target`", orReplace = true,
      ifNotExists = false, createScript = mv.createScript))
  }

  private def createMaterializedView(mv: CreateMaterializedView): DataFrame = {
    // a new subscription changes the wire fast-path facts even when the
    // CREATE arrives outside sql() — restoreCatalog replays and the spec
    // surface construct MVs directly (ADVICE r19 #2: a warm JVM's stale
    // NEGATIVE mvSubs entry would make inserts skip a replayed MV)
    GraftSession.directRecipes.clear()
    GraftSession.mvSubs.clear()
    if (mv.to.isDefined) return createMvTo(mv)
    val rdb = mv.db.getOrElse(spark.catalog.currentDatabase)
    val src = ChParser.firstFromTable(mv.selectSql).getOrElse(
      throw new IllegalArgumentException(
        "MATERIALIZED VIEW: the SELECT must read FROM a table directly"))._1
    val srcTable = if (src.contains(".")) src.split("\\.", 2)(1) else src
    val schemaDf = spark.sql(rewriteSelect(mv.selectSql))
    val ct = CreateTable(Some(rdb), mv.name,
      schemaDf.schema.fields.toSeq.map(f => ColDef(
        f.name, BqlType.fromSpark(f.dataType, f.nullable),
        primaryKey = false, notNull = !f.nullable, default = None)),
      mv.engine, mv.partitionBy, Map.empty, mv.ifNotExists, mv.createScript)
    val preExisting = mv.ifNotExists &&
      spark.catalog.tableExists(fullName(Some(rdb), mv.name).replace("`", ""))
    val created = createTableInner(ct)
    if (!preExisting) {
      spark.sql(s"ALTER TABLE ${fullName(Some(rdb), mv.name)} SET TBLPROPERTIES (" +
        s"'graft.mv.src'='${s"$rdb.$srcTable".replace("'", "''")}', " +
        s"'graft.mv.select'='${mv.selectSql.replace("'", "''")}')")
      if (mv.populate)
        insertSelect(InsertSelect(Some(rdb), mv.name, None, mv.selectSql))
    }
    created
  }

  /** ClickHouse plain VIEW: store the query, substitute on every read.
    * Registered as a Spark temp view over the REWRITTEN SELECT (so CH
    * dialect — FINAL, SAMPLE, PREWHERE, function packs — works inside a
    * view body) and recorded under `_graft_meta` for restart replay,
    * exactly like tables/MVs. The temp view registered here serves
    * SHOW TABLES and same-moment reads; correctness across later inserts
    * comes from [[refreshReferencedViews]], which re-registers the view
    * (dependencies first) before any SELECT that mentions it.
    */
  private def createView(cv: CreateView): DataFrame = {
    val rdb = cv.db.getOrElse(spark.catalog.currentDatabase)
    val isOurs = viewDefs.contains(cv.name)
    val tableExists = spark.sessionState.catalog.tableExists(
      org.apache.spark.sql.catalyst.TableIdentifier(cv.name, Some(rdb)))
    require(!tableExists,
      s"CREATE VIEW: a table named $rdb.${cv.name} already exists")
    if (isOurs && cv.ifNotExists) return emptyOk
    require(!isOurs || cv.orReplace,
      s"CREATE VIEW: view ${cv.name} already exists (use OR REPLACE)")
    // validate now, like CH: a view over a missing table/column fails at
    // CREATE, not at first read. Dependencies must resolve first.
    refreshReferencedViews(cv.selectSql,
      scala.collection.mutable.Set(cv.name))
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW `${cv.name}` AS " +
      rewriteSelect(cv.selectSql))
    viewDefs(cv.name) = (rdb, cv.selectSql, cv.createScript)
    GraftSession.viewMemos.put(sessionKey(cv.name), cv.createScript): Unit
    val mf = metaFile(rdb, cv.name)
    // skip the rewrite when the recorded script is already this text —
    // keeps the meta mtime stable for the warm-restore script cache
    if (!java.nio.file.Files.exists(mf) ||
        java.nio.file.Files.readString(mf) != cv.createScript) {
      java.nio.file.Files.createDirectories(mf.getParent)
      java.nio.file.Files.writeString(mf, cv.createScript): Unit
    }
    emptyOk
  }

  /** DROP VIEW [IF EXISTS]: drop the temp view, registry entry and replay
    * metaFile. Errors on a base table (CH's kind check).
    */
  private def dropView(db: Option[String], name: String,
                       ifExists: Boolean): DataFrame = {
    val rdb = db.getOrElse(spark.catalog.currentDatabase)
    if (!viewDefs.contains(name)) {
      require(!spark.sessionState.catalog.tableExists(
          org.apache.spark.sql.catalyst.TableIdentifier(name, Some(rdb))),
        s"DROP VIEW: $rdb.$name is a table, not a view (use DROP TABLE)")
      // a view that failed to restore (source vanished) is not in the
      // registry but may still hold a replay metaFile — DROP clears it so
      // the next boot stops reporting it
      val hadMeta = java.nio.file.Files.deleteIfExists(metaFile(rdb, name))
      if (hadMeta) scala.util.Try(spark.catalog.dropTempView(name))
      if (hadMeta) GraftSession.viewMemos.remove(sessionKey(name)): Unit
      require(ifExists || hadMeta, s"DROP VIEW: view $name does not exist")
      return emptyOk
    }
    val vdb = viewDefs(name)._1
    spark.catalog.dropTempView(name)
    viewDefs.remove(name)
    GraftSession.viewMemos.remove(sessionKey(name)): Unit
    java.nio.file.Files.deleteIfExists(metaFile(vdb, name))
    // a TO-form materialized view's insert subscription lives on its
    // TARGET table (graft.mv.via names this view) — detach it, or the
    // fan-out keeps writing into the target after the view is gone
    val cat = spark.sessionState.catalog
    cat.listTables(vdb).foreach { tid =>
      scala.util.Try(cat.getTableMetadata(tid)).toOption.foreach { m =>
        if (m.properties.get("graft.mv.via").contains(name))
          spark.sql(s"ALTER TABLE `$vdb`.`${tid.table}` " +
            "UNSET TBLPROPERTIES IF EXISTS " +
            "('graft.mv.src', 'graft.mv.select', 'graft.mv.via')")
      }
    }
    emptyOk
  }

  private def createDictionary(cd: CreateDictionary): DataFrame = {
    val rdb = cd.db.getOrElse(spark.catalog.currentDatabase)
    if (dictDefs.contains(cd.name) && cd.ifNotExists) return emptyOk
    require(!dictDefs.contains(cd.name),
      s"CREATE DICTIONARY: ${cd.name} already exists")
    require(!spark.sessionState.catalog.tableExists(
        org.apache.spark.sql.catalyst.TableIdentifier(cd.name, Some(rdb))),
      s"CREATE DICTIONARY: a table named $rdb.${cd.name} exists")
    dictDefs(cd.name) = cd.copy(db = Some(rdb))
    try loadDictionary(cd.name)
    catch { case t: Throwable => dictDefs.remove(cd.name); throw t }
    java.nio.file.Files.createDirectories(metaFile(rdb, cd.name).getParent)
    java.nio.file.Files.writeString(metaFile(rdb, cd.name), cd.createScript)
    emptyOk
  }

  private def dropDictionary(db: Option[String], name: String,
                             ifExists: Boolean): DataFrame = {
    if (!dictDefs.contains(name)) {
      require(ifExists, s"DROP DICTIONARY: no dictionary $name")
      return emptyOk
    }
    val rdb = dictDefs(name).db.getOrElse(spark.catalog.currentDatabase)
    dictDefs.remove(name)
    dictJoinMode -= name
    dictBroadcasts.remove(name).foreach(_.unpersist(false))
    GraftSession.dictMemos.remove(sessionKey(name)): Unit
    java.nio.file.Files.deleteIfExists(metaFile(rdb, name))
    emptyOk
  }

  /** (Re)load a dictionary: snapshot the source table into a broadcast
    * hash and (re)bind the lookup function. The size guard is the
    * broadcast contract — a dictionary is dimension-sized by definition;
    * fact-sized lookups belong in a join, not a dictionary.
    */
  private def loadDictionary(name: String): Unit = {
    val cd = dictDefs(name)
    val attrs = cd.cols.filter(_.name != cd.key)
    val maxRows = spark.conf.getOption("graft.dict.maxRows")
      .map(_.toInt).getOrElse(10000000)
    val df = spark.table(cd.source)
      .select((cd.key +: attrs.map(_.name)).map(c =>
        col(s"`$c`").cast(StringType).as(c)): _*)
    val rows = df.limit(maxRows + 1).collect()
    if (rows.length > maxRows) {
      // fact-sized source: don't broadcast — serve dictGet/dictHas via the
      // join arm (CH `direct` layout). The broadcast arm for small sources
      // is untouched.
      dictJoinMode += name
      dictBroadcasts.remove(name).foreach(_.unpersist(false))
      GraftSession.dictMemos.put(sessionKey(name), GraftSession.DictMemo(
        cd.createScript, cd, joinMode = true, bc = None)): Unit
      return
    }
    dictJoinMode -= name
    val m = new java.util.HashMap[String, Array[String]](rows.length * 2)
    rows.foreach { r =>
      if (!r.isNullAt(0))
        m.put(r.getString(0), Array.tabulate(attrs.length)(i =>
          if (r.isNullAt(i + 1)) null else r.getString(i + 1)))
    }
    dictBroadcasts.remove(name).foreach(_.unpersist(false))
    val bc = spark.sparkContext.broadcast(m)
    dictBroadcasts(name) = bc
    val idx = attrs.map(_.name).zipWithIndex.toMap
    // Return encoding (ADVICE r15 #3): SQL-null = key missing; "\u0000"
    // = key present, stored attribute NULL (must surface as NULL, not
    // the DEFAULT); "\u0001"+value = present non-null. The rewrite
    // peels the prefix with substring(nullif(x, sentinel), 2).
    spark.udf.register(s"__graft_dict_$name",
      (attr: String, key: String) => {
        if (key == null) null
        else {
          val row = bc.value.get(key)
          if (row == null) null
          else if (attr == "__has") ""
          else idx.get(attr) match {
            case Some(i) =>
              val v = row(i)
              if (v == null) "\u0000" else "\u0001" + v
            case None => null
          }
        }
      }): Unit
    GraftSession.dictMemos.put(sessionKey(name), GraftSession.DictMemo(
      cd.createScript, cd, joinMode = false, bc = Some(bc))): Unit
  }

  /** dictGet / dictGetOrDefault / dictHas → the broadcast-hash lookup
    * function, typed back to the attribute's declared type. A missing
    * key yields the attribute's DEFAULT, else the CH type-zero (0 / ''),
    * else NULL — dictGetOrDefault's fourth argument wins over both.
    * Iterates to fix nested calls (a dictGet key computed by another
    * dictGet).
    */
  private def rewriteDictFns(sql: String): String = {
    if (dictDefs.isEmpty) return sql
    def build(kind: String, lits: Seq[String], raws: Seq[String]): String = {
      val cd = dictDefs(lits.head)
      val joinArm = dictJoinMode(cd.name)
      // join-arm probe: a correlated scalar subquery on the key — Catalyst
      // rewrites it into ONE aggregated left equi-join per distinct call
      // (max() makes the subquery provably single-row); same sentinel
      // encoding as the UDF, so the peel/fallback logic below is shared
      def probe(sel: String): String =
        s"(SELECT max($sel) FROM ${cd.source} WHERE " +
          s"CAST(`${cd.key}` AS STRING) = CAST((${raws.head}) AS STRING))"
      if (kind == "has") {
        require(raws.length == 1, "dictHas expects (dict, key)")
        val call =
          if (joinArm) probe("chr(1)")
          else s"`__graft_dict_${cd.name}`('__has', " +
            s"CAST((${raws.head}) AS STRING))"
        s"($call IS NOT NULL)"
      } else {
        val a = lits(1)
        val cdef = cd.cols.find(_.name == a).getOrElse(
          throw new IllegalArgumentException(
            s"dictGet: no attribute $a in dictionary ${cd.name}"))
        require(a != cd.key, s"dictGet: $a is the dictionary KEY, not an attribute")
        require(raws.nonEmpty, "dictGet expects a key expression")
        val t = cdef.tpe.sparkType.sql
        // the UDF sentinel-encodes (see loadDictionary): SQL-null means
        // the KEY is missing (-> DEFAULT/type-zero), chr(0) means the key
        // is present with a stored NULL (-> NULL, never the default;
        // ADVICE r15 #3), otherwise a chr(1) prefix precedes the value
        val callTxt =
          if (joinArm) probe(s"CASE WHEN `$a` IS NULL THEN chr(0) ELSE " +
            s"concat(chr(1), CAST(`$a` AS STRING)) END")
          else s"`__graft_dict_${cd.name}`('$a', " +
            s"CAST((${raws.head}) AS STRING))"
        val value = s"CAST(substring(nullif($callTxt, chr(0)), 2) AS $t)"
        val fallback =
          if (kind == "getOr") {
            require(raws.length == 2,
              "dictGetOrDefault expects (dict, attr, key, default)")
            Some(s"(${raws(1)})")
          } else cdef.default.map(d => s"CAST($d AS $t)").orElse {
            cdef.tpe.sparkType match {
              case _: org.apache.spark.sql.types.NumericType =>
                Some(s"CAST(0 AS $t)")
              case org.apache.spark.sql.types.StringType => Some("''")
              case _ => None
            }
          }
        fallback.fold(value) { f =>
          if (joinArm)
            // the subquery must appear exactly ONCE (each occurrence is a
            // join after Catalyst's rewrite): missing-key folds into the
            // same prefix encoding via a chr(2)-tagged default
            s"CAST(substring(nullif(coalesce($callTxt, " +
              s"concat(chr(2), CAST($f AS STRING))), chr(0)), 2) AS $t)"
          else s"(CASE WHEN $callTxt IS NULL THEN $f ELSE $value END)"
        }
      }
    }
    var cur = sql
    var changed = true
    var guard = 0
    while (changed && guard < 8) {
      changed = false; guard += 1
      val calls =
        ChParser.dictFnCalls(cur, "dictGet", 2).map(("get", _)) ++
          ChParser.dictFnCalls(cur, "dictGetOrDefault", 2).map(("getOr", _)) ++
          ChParser.dictFnCalls(cur, "dictHas", 1).map(("has", _))
      val valid = calls.filter { case (_, (_, _, lits, _)) =>
        dictDefs.contains(lits.head) }
      if (valid.nonEmpty) {
        changed = true
        cur = valid.sortBy(-_._2._1).foldLeft(cur) {
          case (acc, (kind, (from, to, lits, raws))) =>
            acc.substring(0, from) + build(kind, lits, raws) + acc.substring(to)
        }
      }
    }
    cur
  }

  /** Re-register (dependencies first) every stored view the given SQL
    * mentions, so its temp view re-resolves its sources against the
    * CURRENT catalog state — the read-time query substitution CH's plain
    * views are defined by. Word-boundary mention detection can
    * false-positive on a column named like a view; the only cost is a
    * harmless re-registration (metadata-only, no data read).
    */
  private def refreshReferencedViews(sql: String,
      seen: scala.collection.mutable.Set[String] =
        scala.collection.mutable.Set.empty[String]): Unit =
    viewDefs.foreach { case (name, (_, sel, _)) =>
      if (!seen.contains(name) &&
          java.util.regex.Pattern.compile(
            "(?i)\\b" + java.util.regex.Pattern.quote(name) + "\\b")
            .matcher(sql).find()) {
        seen += name
        refreshReferencedViews(sel, seen)
        // fault-isolated per view: a stored view whose SOURCE has vanished
        // must not poison an unrelated statement that merely MENTIONS its
        // name — `DROP VIEW stale_v` itself used to die re-analyzing
        // stale_v's SELECT over the dropped table (r18 parallel-suite
        // hunt). On failure the temp view is dropped so a statement that
        // actually READS it fails loudly with "not found" instead of
        // silently serving a stale definition — CH's read-time
        // substitution errors there too.
        try spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW `$name` AS " +
          rewriteSelect(sel))
        catch { case scala.util.control.NonFatal(_) =>
          scala.util.Try(spark.catalog.dropTempView(name)): Unit
          GraftSession.viewMemos.remove(sessionKey(name)): Unit
        }
      }
    }

  /** Rebuild a table's replay script from its catalog state (declared CH
    * types, engine, partition expr, settings, defaults) and re-record it
    * — the normalization RENAME/ALTER need, same form CTAS records.
    */
  private def recordNormalizedScript(rdb: String, table: String): Unit = {
    val full = fullName(Some(rdb), table)
    val meta = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(table, Some(rdb)))
    def dec(prop: String): Map[String, String] =
      meta.properties.get(prop).map {
        _.split("").filter(_.nonEmpty).map { kv =>
          val Array(k, v) = kv.split("", 2); k -> v
        }.toMap
      }.getOrElse(Map.empty)
    val types = dec("graft.ch.types")
    val dflts = dec("graft.defaults")
    // PRIMARY KEY / NOT NULL must survive normalization: the replayed
    // script feeds createTableInner's bucketClause match — dropping the
    // PK marker while keeping SETTINGS buckets=N would silently recreate
    // a bucketed table WITHOUT its CLUSTERED/SORTED layout, and NOT NULL
    // columns would come back Nullable on DESC and the wire. PKs come
    // from the graft.pks prop (recorded at create); for pre-prop tables
    // the bucket spec's column list is the same fact.
    val pks: Set[String] = meta.properties.get("graft.pks")
      .map(_.split("").filter(_.nonEmpty).toSet)
      .orElse(meta.bucketSpec.map(_.bucketColumnNames.toSet))
      .getOrElse(Set.empty)
    val notNulls: Set[String] = meta.properties.get("graft.notnull")
      .map(_.split("\u0001").filter(_.nonEmpty).toSet).getOrElse(Set.empty)
    // Nested families re-group into their `n Nested(a T, b U)` clause --
    // normalizing to the flattened members would replay fine but LOSE the
    // family metadata (graft.nested), breaking `ARRAY JOIN n` and plain
    // `n.a` references after a TRUNCATE/RENAME replay.
    val nestedFams: Seq[(String, Seq[String])] =
      meta.properties.get("graft.nested").map {
        _.split("\u0001").filter(_.nonEmpty).toSeq.map { kv =>
          val Array(k, v) = kv.split("\u0002", 2)
          k -> v.split(",").filter(_.nonEmpty).toSeq
        }
      }.getOrElse(Nil)
    val famOfMember: Map[String, String] = nestedFams.flatMap { case (f, ms) =>
      ms.map(_ -> f) }.toMap
    def innerOfArray(ch: String): String =
      if (ch.startsWith("Array(") && ch.endsWith(")"))
        ch.substring(6, ch.length - 1) else ch
    val colsDdl = meta.schema.fields.toSeq.filter(_.name != PtkCol).flatMap { f =>
      val t = types.getOrElse(f.name,
        BqlType.fromSpark(f.dataType, f.nullable).chName)
      famOfMember.get(f.name) match {
        case Some(fam) =>
          val members = nestedFams.find(_._1 == fam).get._2
          if (members.headOption.contains(f.name))
            Some(s"`$fam` Nested(" + members.map { m =>
              s"${m.substring(fam.length + 1)} ${innerOfArray(types.getOrElse(m, t))}"
            }.mkString(", ") + ")")
          else None
        case None =>
          val pkM = if (pks(f.name)) " PRIMARY KEY" else ""
          val nnM = if (notNulls(f.name) || !f.nullable) " NOT NULL" else ""
          Some(s"`${f.name}` $t$pkM$nnM" +
            dflts.get(f.name).map(d => s" DEFAULT $d").getOrElse(""))
      }
    }.mkString(", ")
    val settings = meta.properties.collect {
      case (k, v) if k.startsWith("graft.setting.") =>
        // multi-token values (a TTL expression) must re-parse: quote
        // anything that isn't a single bare token
        val vv = if (v.matches("[A-Za-z0-9_.+-]+")) v
          else "'" + v.replace("'", "''") + "'"
        s"${k.stripPrefix("graft.setting.")}=$vv"
    }
    // bloom skipping indexes must survive normalization (TRUNCATE/RENAME
    // replay recreates the table from this script; without the INDEX
    // clause the parquet bloom option would silently vanish)
    val idxDdl = meta.properties.get("graft.bloom")
      .map(_.split(",").filter(_.nonEmpty).toSeq).getOrElse(Nil)
      .map(c => s", INDEX bf_$c `$c` TYPE bloom_filter GRANULARITY 1")
      .mkString
    // USER CHECK constraints must survive normalization too (r19 fix:
    // they silently vanished from the replay script after any
    // normalizing ALTER + restart); the implicit __nested_ equal-length
    // checks regenerate from the Nested clause at CREATE and must NOT
    // be re-emitted or they would double up
    val checksDdl = dec("graft.checks").toSeq
      .filterNot(_._1.startsWith("__nested_")).sortBy(_._1)
      .map { case (n, e) => s", CONSTRAINT $n CHECK $e" }.mkString
    val script = s"CREATE TABLE $table($colsDdl$checksDdl$idxDdl)" +
      meta.properties.get("graft.engine").map(e => s" ENGINE=$e" +
        meta.properties.get("graft.engine_args")
          .map(a => s"($a)").getOrElse("")).getOrElse("") +
      meta.properties.get("graft.ptk.expr").map(e => s" PARTITION BY $e").getOrElse("") +
      (if (settings.isEmpty) "" else " SETTINGS " + settings.mkString(", "))
    spark.sql(s"ALTER TABLE $full SET TBLPROPERTIES (" +
      s"'graft.create_script'='${script.replace("'", "''")}')")
    java.nio.file.Files.createDirectories(metaFile(rdb, table).getParent)
    java.nio.file.Files.writeString(metaFile(rdb, table), script): Unit
  }

  /** Materialized views fed by (db, table): live catalog scan over the
    * database's tagged tables. A production deployment keeps this in a
    * registry; the live scan is always-correct and cheap at catalog
    * scale (it reads table METADATA, never data).
    */
  private def mvsFor(rdb: String, table: String): Seq[(String, String)] =
    GraftSession.mvSubs.computeIfAbsent(s"$rdb.$table", _ => {
      val cat = spark.sessionState.catalog
      cat.listTables(rdb).flatMap { tid =>
        scala.util.Try(cat.getTableMetadata(tid)).toOption.toSeq.flatMap { meta =>
          (meta.properties.get("graft.mv.src"), meta.properties.get("graft.mv.select")) match {
            case (Some(src), Some(sel)) if src == s"$rdb.$table" =>
              Seq((tid.table, sel))
            case _ => Nil
          }
        }
      }
    })

  /** Push one inserted block through every materialized view on the
    * table: substitute a temp view of the block for the SELECT's source
    * reference, run it, and append the result to the view's storage —
    * recursively, so chained views work, with a cycle guard.
    */
  private def propagateToMvs(rdb: String, table: String, block: DataFrame,
                             depth: Int): Unit = {
    val mvs = mvsFor(rdb, table)
    if (mvs.isEmpty) return
    require(depth <= 8,
      s"materialized-view chain deeper than 8 at $rdb.$table — cycle?")
    mvs.foreach { case (mvName, sel) =>
      val viewName = s"__graft_mv_block_${math.abs(sel.hashCode).toString}"
      block.createOrReplaceTempView(viewName)
      val substituted = ChParser.firstFromTable(sel) match {
        case Some((_, from, to)) =>
          sel.substring(0, from) + viewName + " " + sel.substring(to)
        case None => throw new IllegalStateException(
          s"materialized view $mvName lost its FROM reference")
      }
      val result = spark.sql(rewriteSelect(substituted))
      appendToTable(Some(rdb), mvName, result, srcIsRaw = false, depth + 1)
      spark.catalog.dropTempView(viewName): Unit
    }
  }

  private def tempSchema(ct: CreateTable): StructType =
    StructType(ct.cols.map(c => StructField(c.name, c.tpe.sparkType,
      !(c.notNull || (!isNullable(c.tpe) && c.primaryKey)))))

  private def createTempTable(ct: CreateTable): DataFrame = {
    require(ct.db.isEmpty,
      "CREATE TEMPORARY TABLE: temporary tables take no database (CH)")
    require(ct.partitionBy.isEmpty,
      "CREATE TEMPORARY TABLE: PARTITION BY is not supported")
    require(ct.asSelect.isEmpty,
      "CREATE TEMPORARY TABLE ... AS SELECT is not supported yet")
    require(ct.projections.isEmpty,
      "CREATE TEMPORARY TABLE: PROJECTION clauses are not supported")
    if (tempTables.contains(ct.name)) {
      if (ct.ifNotExists) return emptyOk
      throw new IllegalArgumentException(
        s"temporary table ${ct.name} already exists")
    }
    val empty = spark.createDataFrame(
      java.util.Collections.emptyList[Row](), tempSchema(ct))
    tempTables(ct.name) = (ct, empty)
    empty.createOrReplaceTempView(ct.name)
    emptyOk
  }

  /** Insert into a temporary table: same literal coercion as the engine
    * path, then an eager-checkpointed union re-registered as the view.
    */
  private def appendTempTable(name: String, src: DataFrame,
                              srcIsRaw: Boolean): Unit = {
    val (ct, cur) = tempTables(name)
    val dataCols = tempSchema(ct).fields
    require(src.columns.length == dataCols.length,
      s"INSERT column count ${src.columns.length} != table arity ${dataCols.length}")
    val renamed = src.toDF(dataCols.map(_.name).toIndexedSeq: _*)
    val typed = renamed.select(dataCols.toIndexedSeq.map { f =>
      val declared = ct.cols.find(_.name == f.name).map(_.tpe)
      val c = col(s"`${f.name}`")
      (declared match {
        case Some(bt) if srcIsRaw => coerce(c, bt)
        case _ => c.cast(f.dataType)
      }).as(f.name)
    }: _*)
    val next = cur.unionByName(typed).localCheckpoint(eager = true)
    tempTables(name) = (ct, next)
    next.createOrReplaceTempView(name)
  }

  private def appendToTable(db: Option[String], name: String, src: DataFrame,
                            srcIsRaw: Boolean, mvDepth: Int = 0): Unit = {
    if (tempDef(db, name).isDefined) { appendTempTable(name, src, srcIsRaw); return }
    val (schema, types, ptkExpr) = tableMeta(db, name)
    val dataCols = schema.fields.filter(_.name != PtkCol)
    require(src.columns.length == dataCols.length,
      s"INSERT column count ${src.columns.length} != table arity ${dataCols.length}")
    val renamed = src.toDF(dataCols.map(_.name): _*)
    val typed = renamed.select(dataCols.map { f =>
      val declared = types.get(f.name).flatMap(s => BqlType.parse(s).toOption)
      val c = col(s"`${f.name}`")
      val coerced = declared match {
        case Some(bt) if srcIsRaw => coerce(c, bt)
        case _ => c.cast(f.dataType)
      }
      coerced.as(f.name)
    }: _*)
    // CHECK constraints ride inside the write projection via assert_true
    // (zero extra pass over the source; the write job itself fails on the
    // first violating row — ClickHouse's INSERT-time CHECK semantics, with
    // SQL NULL-passes handling)
    val checks = checkConstraints(db, name)
    val checked = if (checks.isEmpty) typed else {
      val allOk = checks.map { case (_, ce) =>
        coalesce(expr(ce).cast(BooleanType), lit(true))
      }.reduce(_ && _)
      val msg = "INSERT violates CHECK constraint " +
        checks.map(_._1).mkString("/") + s" on ${fullName(db, name)}"
      val f = typed.columns.head
      typed.withColumn(f,
        when(assert_true(allOk, lit(msg)).isNull, col(s"`$f`")))
    }
    // When a materialized view subscribes, the block handed to the views
    // must be EXACTLY the rows the base append landed. Historically that
    // was a localCheckpoint pin — but the pin costs a full extra
    // materialization job per insert (measured 0.08-0.15 s/statement at
    // sf0.1, 13% of the MV-insert wall) and pins the whole block in
    // executor storage, which at 100 TB block sizes is itself a memory
    // hazard (guide §5). When re-executing the block's plan provably
    // yields the same rows — every leaf a file-based relation or
    // driver-resident rows, no nondeterministic expression anywhere, and
    // no leaf reading the TARGET table (an `INSERT INTO t SELECT ... FROM
    // t` would rescan its own just-landed rows; OTHER tables' file-index
    // snapshots are pinned inside the analyzed plan) — the MV pass re-runs
    // the plan instead: one fewer job, no storage pin, same rows.
    // `graft.mv.rescan=off` restores the unconditional checkpoint.
    val rdbName = db.getOrElse(spark.sessionState.catalog.getCurrentDatabase)
    val hasMvs = mvsFor(rdbName, name).nonEmpty
    val mustPin = hasMvs && !mvRescanSafe(checked, rdbName, name)
    val block = if (mustPin) checked.localCheckpoint(eager = true) else checked
    val withPtk = ptkExpr match {
      case Some(e) => block.withColumn(PtkCol, expr(e).cast(StringType))
      case None => block
    }
    // ENGINE=Null: the insert lands NOTHING (CH's /dev/null table) but
    // still feeds subscribed materialized views below — the canonical CH
    // ingest-transform idiom (INSERT INTO null_table; MVs fan out)
    val isNull = tableProp(db, name, "graft.engine")
      .exists(_.equalsIgnoreCase("Null"))
    // Driver-resident blocks (INSERT ... VALUES / FORMAT payloads — the
    // optimizer folds the typed projection into the LocalRelation) take
    // the same committer-free single-part write the wire path uses: the
    // rows are ALREADY materialized on this thread, so an insertInto
    // Spark job buys zero parallelism and pays task scheduling + the
    // Hadoop _temporary+rename cycle (~0.5 s/statement measured, PERF.md
    // r19-opt). directPartAppend re-checks the frozen facts (no MV, no
    // __ptk, no CHECK, no buckets, not Null) and falls through here when
    // the table needs full semantics. Scale posture unchanged:
    // distributed sources never fold to LocalRelation.
    // Cheap pre-gate: only consult the OPTIMIZED plan (a full Catalyst
    // optimization pass, ~50-150 ms) when every leaf of the already-built
    // logical plan is driver-resident — an INSERT...SELECT over real
    // tables can never fold to LocalRelation, and paying the extra
    // optimization pass per insert taxed the MV-heavy entries (~+0.2 s
    // each, d11/d29 A/B).
    def allLocalLeaves = withPtk.queryExecution.logical.collectLeaves().forall {
      case _: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => true
      case _: org.apache.spark.sql.catalyst.plans.logical.OneRowRelation => true
      case _ => false
    }
    if (!isNull && !hasMvs && ptkExpr.isEmpty && allLocalLeaves) {
      withPtk.queryExecution.optimizedPlan match {
        case lr: org.apache.spark.sql.catalyst.plans.logical.LocalRelation =>
          val tblSchema = StructType(dataCols.toIndexedSeq)
          if (directPartAppend(rdbName, name, lr.data, tblSchema)) return
        case _ => ()
      }
    }
    // serialize appends per table: concurrent wire connections (or remote()
    // shard streams) appending to one table would race in the Hadoop
    // committer's shared _temporary dir — the reference takes a per-table
    // CAS lock for exactly this (crates/meta/src/store/parts.rs:174-235;
    // single-writer-per-table is all it supports)
    if (!isNull) {
      // MergeTree parts are SORTED by the sorting key — that is what the
      // ORDER BY/PRIMARY KEY clause physically MEANS in CH, and at 100 TB
      // it is what makes parquet row-group min/max stats on the key
      // near-perfect range pruners (an unsorted part's stats span the
      // whole key domain and prune nothing). Sort within write tasks
      // (partition dir first, so each output file is one sorted run);
      // bucketed tables skip this — their CLUSTERED/SORTED layout already
      // owns the ordering.
      val sortKeys = tableProp(db, name, "graft.pks")
        .map(_.split("").filter(_.nonEmpty).toSeq).getOrElse(Nil)
        .filter(withPtk.columns.contains)
      val bucketed = spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(name,
          Some(db.getOrElse(spark.sessionState.catalog.getCurrentDatabase))))
        .bucketSpec.isDefined
      // Partitioned inserts hash-distribute by the partition key before
      // the write (guide §6 / Iceberg write.distribution-mode=hash): a
      // task holding every partition value writes one file PER value —
      // N tasks x P dirs files, the many-small-files problem — while the
      // clustered write lands P files and encodes partition values in
      // parallel (a clumped single-task source serialized the whole
      // encode: the sf0.1 ingest anchor measured 0.73 s single-task).
      // Explicit width so AQE's byte-based coalescing cannot fold the
      // tiny-byte exchange back to one task (the spreadHint lesson).
      // `graft.insert.distribute=off` restores the straight-through plan.
      val distributed =
        if (ptkExpr.isDefined && !bucketed &&
            spark.conf.getOption("graft.insert.distribute").forall(_ != "off"))
          withPtk.repartition(spark.sparkContext.defaultParallelism,
            col(s"`$PtkCol`"))
        else withPtk
      val block2 =
        if (sortKeys.isEmpty || bucketed) distributed
        else {
          val order =
            (if (distributed.columns.contains(PtkCol)) Seq(PtkCol) else Nil) ++
              sortKeys
          distributed.sortWithinPartitions(order.map(c => col(s"`$c`")): _*)
        }
      val lockKey =
        db.getOrElse(spark.sessionState.catalog.getCurrentDatabase) + "." + name
      val lock = GraftSession.tableWriteLocks
        .computeIfAbsent(lockKey, _ => new Object)
      lock.synchronized {
        block2.write.mode("append").insertInto(fullName(db, name).replace("`", ""))
      }
    }
    // insert-triggered materialized views see the TYPED block (CH runs
    // the view's SELECT over each inserted block, mgmt-analog; the block
    // here — pinned or provably re-executable, see above — is exactly
    // what landed, minus the hidden partition key). Only a block WE
    // pinned is released: a rescan-safe block's leaves may include an
    // upstream consumer's own live checkpoint.
    if (hasMvs)
      try propagateToMvs(rdbName, name, block, mvDepth)
      finally if (mustPin) releaseCheckpoint(block)
  }

  /** True when `df`'s plan can be re-executed for MV propagation in place
    * of a localCheckpoint pin and provably produce the identical block:
    * all expressions deterministic, every leaf either driver-resident
    * rows or a file-based relation, and no leaf reading the insert's own
    * target table (its file listing is the one thing the append itself
    * changes). Anything else — RDD-backed leaves, streaming, remote(),
    * nondeterministic generators — keeps the checkpoint.
    */
  private def mvRescanSafe(df: DataFrame, rdb: String,
                           target: String): Boolean = {
    if (spark.conf.getOption("graft.mv.rescan").exists(_ == "off")) return false
    // subquery plans too: collectLeaves does not descend into them, and a
    // scalar subquery scanning the target table is just as unsafe
    val plans = df.queryExecution.analyzed +:
      df.queryExecution.analyzed.subqueriesAll
    val deterministic =
      !plans.exists(_.exists(p => p.expressions.exists(!_.deterministic)))
    deterministic && plans.flatMap(_.collectLeaves()).forall {
      case _: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => true
      case _: org.apache.spark.sql.catalyst.plans.logical.OneRowRelation => true
      case _: org.apache.spark.sql.catalyst.plans.logical.Range => true
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation.isInstanceOf[
          org.apache.spark.sql.execution.datasources.HadoopFsRelation] &&
          !lr.catalogTable.exists(ct =>
            ct.identifier.table.equalsIgnoreCase(target) &&
              ct.identifier.database.forall(_.equalsIgnoreCase(rdb)))
      case _ => false
    }
  }

  /** Append an already-typed block of rows to a table — the wire-ingest
    * entry (client-streamed Data blocks over the CH native protocol; the
    * reference's write-block path, write.rs:26-67).
    *
    * GROUP COMMIT: each append pays a fixed ~0.8 s Spark-job +
    * Hadoop-committer cost regardless of block size (PERF.md r18), so
    * concurrent flushes against one table MERGE — while a leader thread
    * is writing, later flushes queue their rows and the leader lands the
    * whole queue in its next single append (the reference batches
    * concurrent connections into shared memtable parts the same way,
    * write.rs:26-67). Every row still lands exactly once and a flush
    * only returns after a commit that includes its rows; the one
    * granularity change is error attribution — a rejected row (CHECK
    * violation) fails every flush merged into its batch, not only the
    * connection that sent it.
    */
  def insertBlock(db: Option[String], name: String, rows: Seq[Row],
                  schema: StructType): Unit =
    insertBlockInternal(db, name,
      rows.map(org.apache.spark.sql.GraftSqlBridge.rowSerializer(schema)),
      schema)

  /** [[insertBlock]] over already-Catalyst rows — the wire server decodes
    * straight to `InternalRow` on its per-connection threads, so the
    * driver-side `createDataFrame` conversion (the measured bottleneck)
    * never runs on the serialized append path.
    */
  def insertBlockInternal(db: Option[String], name: String,
                          rows: Seq[org.apache.spark.sql.catalyst.InternalRow],
                          schema: StructType): Unit = {
    val rdb = db.getOrElse(spark.sessionState.catalog.getCurrentDatabase)
    // plain tables take the direct part-write path: the block encodes to
    // ONE parquet file on THIS thread (concurrent connections encode in
    // parallel) and only the rename serializes — no Spark job at all
    if (directPartAppend(rdb, name, rows, schema)) return
    val gc = GraftSession.groupCommits
      .computeIfAbsent(rdb + "." + name, _ => new GraftSession.GroupCommit)
    val me = new GraftSession.GroupWaiter
    val leader = gc.synchronized {
      gc.queue += ((rows, me))
      if (!gc.writing) { gc.writing = true; true } else false
    }
    if (leader) {
      var batch = gc.synchronized {
        val b = gc.queue.toVector; gc.queue.clear(); b
      }
      try {
        while (batch.nonEmpty) {
          val err =
            try {
              val all =
                if (batch.length == 1) batch.head._1
                else batch.iterator.flatMap(_._1).toVector
              val src = org.apache.spark.sql.GraftSqlBridge
                .internalLocalDf(spark, schema, all)
              appendToTable(Some(rdb), name, src, srcIsRaw = false)
              null
            } catch { case scala.util.control.NonFatal(e) => e }
          batch.foreach(_._2.complete(err))
          batch = gc.synchronized {
            val b = gc.queue.toVector; gc.queue.clear()
            if (b.isEmpty) gc.writing = false
            b
          }
        }
      } catch { case t: Throwable =>
        // fatal error mid-drain: fail the in-flight batch AND anything
        // already queued (a future flush would adopt the queue, but none
        // may ever come), then hand leadership back
        val stranded = gc.synchronized {
          gc.writing = false
          val b = gc.queue.toVector; gc.queue.clear(); b
        }
        (batch ++ stranded).foreach(_._2.complete(t))
        throw t
      }
    } else me.await()
    if (me.error != null) throw me.error
  }

  /** Wire-flush fast path: encode the block as ONE parquet part file on
    * the CALLING thread and atomically publish it into the table
    * directory — no Spark job, no Hadoop commit cycle. A streamed block
    * is already materialized on one server thread, so a distributed
    * write buys nothing and pays task serialization of every row
    * (~1.3 s/600k rows measured — PERF.md r19); with this path
    * concurrent connections ENCODE in parallel and only the rename
    * serializes under the table's write lock. The file is written by
    * Spark's own ParquetWriteSupport (identical encoding to an
    * insertInto part), pre-sorted in memory by the table's sorting key
    * and carrying its declared bloom filters — the same part physics
    * every other write path maintains. This is the reference's
    * memtable->part flush (crates/meta/src/store/parts.rs:174-235)
    * re-expressed on Spark's storage layout. Tables needing more than a
    * plain append — partitioning (`__ptk`), MV/projection fanout, CHECK
    * constraints, buckets, ENGINE=Null, temp tables, or a schema
    * mismatch — return false and take the full [[appendToTable]] path.
    */
  private def directPartAppend(rdb: String, name: String,
      rows: Seq[org.apache.spark.sql.catalyst.InternalRow],
      schema: StructType): Boolean = {
    if (rows.isEmpty) return true
    // the verdict + write recipe cache makes the steady-state flush pay
    // ZERO catalog round-trips (the uncached check costs ~0.4 s — mostly
    // the mvsFor catalog scan — which would re-serialize the whole path);
    // every shape-changing statement clears the cache (see sql())
    val key = rdb + "." + name
    val recipe = GraftSession.directRecipes
      .computeIfAbsent(key, _ => directRecipe(rdb, name))
    recipe match {
      case None => false
      case Some(r) =>
        val dataCols = r.dataSchema.fields
        if (dataCols.length != schema.fields.length ||
            !dataCols.zip(schema.fields).forall { case (a, b) =>
              a.name == b.name && a.dataType == b.dataType }) return false
        // MergeTree parts are sorted by the sorting key — in-memory sort
        // on this thread (the rows are RAM-resident already)
        val sorted =
          if (r.pks.isEmpty) rows
          else rows.sorted(org.apache.spark.sql.GraftSqlBridge
            .internalOrdering(r.dataSchema, r.pks))
        val (tmp, _) = org.apache.spark.sql.execution.datasources.parquet
          .GraftDirectParquet.writeHidden(spark,
            new org.apache.hadoop.fs.Path(new java.net.URI(r.location)),
            r.dataSchema, sorted.iterator, r.bloomCols)
        val lock = GraftSession.tableWriteLocks
          .computeIfAbsent(key, _ => new Object)
        lock.synchronized {
          org.apache.spark.sql.execution.datasources.parquet
            .GraftDirectParquet.publish(spark, tmp): Unit
          // invalidate the cached relation + file listing so the next
          // read (this session or the wire SELECT path) sees the part
          spark.sessionState.catalog.refreshTable(
            org.apache.spark.sql.catalyst.TableIdentifier(name, Some(rdb)))
        }
        true
    }
  }

  /** The frozen facts [[directPartAppend]] needs, or None when the table
    * requires the full [[appendToTable]] semantics.
    */
  private def directRecipe(rdb: String,
      name: String): Option[GraftSession.DirectRecipe] = {
    if (tempDef(Some(rdb), name).isDefined) return None
    val metaOpt = scala.util.Try(spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(name, Some(rdb)))).toOption
    if (metaOpt.isEmpty) return None
    val meta = metaOpt.get
    if (meta.bucketSpec.isDefined) return None
    if (meta.properties.get("graft.engine").exists(_.equalsIgnoreCase("Null")))
      return None
    val (tschema, _, ptkExpr) = tableMeta(Some(rdb), name)
    if (ptkExpr.isDefined) return None
    if (checkConstraints(Some(rdb), name).nonEmpty) return None
    if (mvsFor(rdb, name).nonEmpty) return None
    val dataCols = tschema.fields.filter(_.name != PtkCol)
    val pks = meta.properties.get("graft.pks")
      .map(_.split("").filter(_.nonEmpty).toSeq).getOrElse(Nil)
      .filter(k => dataCols.exists(_.name == k))
    val bloomCols = meta.properties.get("graft.bloom").toSeq
      .flatMap(_.split(",").filter(_.nonEmpty))
      .filter(c => dataCols.exists(_.name == c))
    Some(GraftSession.DirectRecipe(StructType(dataCols.toIndexedSeq), pks,
      bloomCols, meta.location.toString))
  }

  /** The table's declared data schema (without the hidden partition key) —
    * what a wire client's INSERT header block advertises.
    */
  /** Declared LowCardinality wire types by data-column position — what the
    * INSERT header block must advertise so a real client frames those
    * columns with CH's dict-block serialization (blocks.rs:480-531).
    * Non-LC columns return None and keep their Spark-derived wire type.
    */
  def lowCardinalityWireTypes(db: Option[String], name: String): Int => Option[BqlType] = {
    val schema = dataSchema(db, name)
    val types = chTypes(db, name)
    val byPos: Vector[Option[BqlType]] = schema.fields.toVector.map { f =>
      types.get(f.name).flatMap(s => BqlType.parse(s).toOption).collect {
        case lc: BqlType.LowCardinality => lc
        // Enum columns advertise their declared entries too, so a
        // conforming client (ours honors the header — r19) streams base
        // ints with the entry metadata and non-entry values fail the
        // WRITE loudly at encode; clients that ship plain String still
        // land (the block carries its own column types)
        case en: BqlType.Enum => en
        case ne @ BqlType.Nullable(_: BqlType.Enum) => ne
      }
    }
    i => if (i >= 0 && i < byPos.length) byPos(i) else None
  }

  def dataSchema(db: Option[String], name: String): StructType =
    StructType(spark.table(fullName(db, name)).schema.fields.filter(_.name != PtkCol))

  /** Declared DEFAULT literals per column (bql.pest column_constraint). */
  private def defaults(db: Option[String], name: String): Map[String, String] =
    tableProp(db, name, "graft.defaults").map {
      _.split("").filter(_.nonEmpty).map { kv =>
        val Array(k, v) = kv.split("", 2)
        k -> v
      }.toMap
    }.getOrElse(Map.empty)

  /** Declared CHECK constraints (name -> boolean expr) — enforced on every
    * insert path ([[appendToTable]]).
    */
  private def checkConstraints(db: Option[String],
                               name: String): Seq[(String, String)] =
    tableProp(db, name, "graft.checks").toSeq.flatMap {
      _.split("").filter(_.nonEmpty).map { kv =>
        val Array(k, v) = kv.split("", 2)
        k -> v
      }.toSeq
    }

  /** Expand an explicit column list to full arity: missing columns take
    * their declared DEFAULT literal, else NULL.
    */
  private def expand(db: Option[String], name: String,
                     cols: Option[Seq[String]], src: DataFrame): DataFrame =
    cols match {
      case None => src
      case Some(given) =>
        val temp = tempDef(db, name)
        val schema = temp.map(tempSchema).getOrElse(tableMeta(db, name)._1)
        val dfts = temp match {
          case Some(ct) => ct.cols.collect {
            case c if c.default.isDefined => c.name -> c.default.get
          }.toMap
          case None => defaults(db, name)
        }
        val dataCols = schema.fields.filter(_.name != PtkCol).map(_.name)
        require(given.length == src.columns.length,
          s"INSERT column list arity ${given.length} != source arity ${src.columns.length}")
        val bySrc = given.map(_.toLowerCase).zip(src.columns).toMap
        src.select(dataCols.map { dc =>
          bySrc.get(dc.toLowerCase) match {
            case Some(srcCol) => col(s"`$srcCol`").as(dc)
            case None => dfts.get(dc) match {
              case Some(d) => expr(d).cast(StringType).as(dc)
              case None => lit(null).as(dc)
            }
          }
        }.toIndexedSeq: _*)
    }

  private def insertValues(iv: InsertValues): DataFrame = {
    val arity = iv.rows.headOption.map(_.length).getOrElse(0)
    require(iv.rows.forall(_.length == arity), "ragged VALUES rows")
    // complex literals — [arrays], map(…), named_struct(…), any
    // constructor/function call — evaluate through the SELECT path
    // (UNION ALL of literal rows), where the full rewrite pipeline and
    // Catalyst's own literal typing apply
    def isComplex(v: String): Boolean = v.startsWith("[") ||
      v.matches("(?s)[A-Za-z_][A-Za-z0-9_]*\\(.*")
    if (iv.rows.exists(_.exists(_.exists(isComplex)))) {
      val sel = iv.rows.map { r =>
        "SELECT " + r.zipWithIndex.map { case (v, i) =>
          s"${v.getOrElse("NULL")} AS _c$i" }.mkString(", ")
      }.mkString(" UNION ALL ")
      return insertSelect(InsertSelect(iv.db, iv.name, iv.cols, sel))
    }
    // Rows arrive as raw literal text; build an all-string local relation
    // and let coerce() cast per declared CH type (reference codec:
    // mgmt.rs:1127-1269).
    val fields = (0 until arity).map(i => StructField(s"_c$i", StringType))
    val rows = iv.rows.map { r =>
      Row(r.map(_.map(stripQuotes).orNull): _*)
    }
    val src = spark.createDataFrame(rows.asJava, StructType(fields))
    appendToTable(iv.db, iv.name, expand(iv.db, iv.name, iv.cols, src), srcIsRaw = true)
    emptyOk
  }

  private def stripQuotes(s: String): String =
    if (s.length >= 2 && s.head == '\'' && s.last == '\'')
      s.substring(1, s.length - 1).replace("''", "'")
    else s

  private def insertSelect(is: InsertSelect): DataFrame = {
    val result = runSelect(is.selectSql)
    appendToTable(is.db, is.name, expand(is.db, is.name, is.cols, result),
      srcIsRaw = false)
    emptyOk
  }

  private def insertFormat(f: InsertFormat, payload: String): DataFrame = {
    val fmt = f.format.toUpperCase(java.util.Locale.ROOT)
    val text = if (f.inlinePayload.trim.nonEmpty) f.inlinePayload else payload
    // FORMAT Values: the payload IS a VALUES tuple list — route through
    // the statement parser so the full literal machinery (CH escapes,
    // NULLs, complex constructors) applies
    if (fmt == "VALUES") {
      val stmt = s"INSERT INTO ${f.db.fold("")(d => s"`$d`.")}`${f.name}`" +
        f.cols.fold("")(_.mkString(" (", ", ", ")")) + " VALUES " + text
      return ChParser.parse(stmt) match {
        case Right(iv: InsertValues) => insertValues(iv)
        case Right(is: InsertSelect) => insertSelect(is) // complex literals
        case Right(other) => throw new IllegalArgumentException(
          s"FORMAT Values: unexpected statement shape $other")
        case Left(e) =>
          throw new IllegalArgumentException(s"FORMAT Values: $e")
      }
    }
    import spark.implicits._
    val lines = text.split("\n").iterator.map(_.trim).filter(_.nonEmpty).toSeq
    val ds = spark.createDataset(lines)
    val src = fmt match {
      case "CSV" | "CSVWITHNAMES" =>
        spark.read.option("header", fmt == "CSVWITHNAMES").csv(ds)
      case "TSV" | "TABSEPARATED" | "TSVWITHNAMES" | "TABSEPARATEDWITHNAMES" =>
        spark.read.option("sep", "\t")
          .option("header", fmt.endsWith("WITHNAMES")).csv(ds)
      case "JSONEACHROW" =>
        // JSON keys are UNORDERED — map by NAME onto the target columns
        // (the positional rename downstream would scramble the
        // alphabetically-sorted json schema). Keys the table doesn't
        // declare are ignored, CH's input_format_skip_unknown_fields
        // behavior; absent keys land as NULL/DEFAULT via expand.
        val parsed = spark.read.json(ds)
        val (schema, _, _) = tableMeta(f.db, f.name)
        val targets = f.cols.getOrElse(
          schema.fields.filter(_.name != PtkCol).map(_.name).toSeq)
        val present = parsed.columns.map(c =>
          c.toLowerCase(java.util.Locale.ROOT) -> c).toMap
        parsed.select(targets.map { t =>
          present.get(t.toLowerCase(java.util.Locale.ROOT)) match {
            case Some(c) => col(s"`$c`").cast(StringType).as(t)
            case None => lit(null).cast(StringType).as(t)
          }
        }.toIndexedSeq: _*)
      case other =>
        throw new IllegalArgumentException(s"unsupported INSERT format: $other")
    }
    val cols = if (fmt == "JSONEACHROW")
      Some(f.cols.getOrElse {
        val (schema, _, _) = tableMeta(f.db, f.name)
        schema.fields.filter(_.name != PtkCol).map(_.name).toSeq
      })
    else f.cols
    appendToTable(f.db, f.name, expand(f.db, f.name, cols, src), srcIsRaw = true)
    emptyOk
  }
}

object GraftSession {
  /** JVM-wide per-table append locks (see appendToTable). */
  private[exec] val tableWriteLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Per-table group-commit state for [[GraftSession.insertBlock]]: while
    * one flush is paying the append job + Hadoop-commit, later flushes
    * for the same table queue their rows; the leader drains the queue and
    * lands EVERYTHING in one append. Throughput then scales with rows,
    * not with the number of connections serializing ~0.8 s commits
    * (PERF.md r18: the commit dominates regardless of block size).
    */
  private[exec] final class GroupCommit {
    val queue = scala.collection.mutable.ArrayBuffer
      .empty[(Seq[org.apache.spark.sql.catalyst.InternalRow], GroupWaiter)]
    var writing = false
  }
  private[exec] final class GroupWaiter {
    private val latch = new java.util.concurrent.CountDownLatch(1)
    @volatile var error: Throwable = null
    def complete(e: Throwable): Unit = { error = e; latch.countDown() }
    def await(): Unit = latch.await()
  }
  private[exec] val groupCommits =
    new java.util.concurrent.ConcurrentHashMap[String, GroupCommit]()

  /** Cached wire-ingest fast-path verdicts: "db.table" -> Some(frozen
    * write recipe) | None (needs full appendToTable semantics). Cleared
    * by [[GraftSession.sql]] on every statement that can change the
    * frozen facts (DDL, ALTER, OPTIMIZE target swaps, MV churn).
    */
  private[exec] final case class DirectRecipe(
      dataSchema: org.apache.spark.sql.types.StructType,
      pks: Seq[String], bloomCols: Seq[String], location: String)
  private[exec] val directRecipes =
    new java.util.concurrent.ConcurrentHashMap[String, Option[DirectRecipe]]()

  /** Cached MV-subscription lookups: "db.table" -> the (mvName, select)
    * pairs subscribed to it. [[mvsFor]] is a full listTables +
    * getTableMetadata scan of the database — O(tables) catalog calls —
    * and [[appendToTable]] consults it on EVERY insert, so a bench/wire
    * session paid the scan per statement. Same lifecycle as
    * [[directRecipes]]: cleared by [[GraftSession.sql]] on every
    * shape-changing statement (CREATE/DROP MATERIALIZED VIEW is one).
    */
  private[exec] val mvSubs =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[(String, String)]]()

  /** JVM-wide Nested-family registry: (db, table) -> family -> flattened
    * member column names ("n" -> Seq("n.a", "n.b")). Populated at CREATE
    * (and therefore at restore replay, which runs the same path); dropped
    * entries only ever cause a no-op backtick rewrite against a table
    * that no longer resolves, so staleness is harmless. Tables that
    * survive a JVM restart through a persistent metastore (replay
    * skipped) are seeded from their `graft.nested` prop during
    * [[GraftSession.restoreCatalog]].
    */
  private[exec] val nestedRegistry = new java.util.concurrent.ConcurrentHashMap[
    (String, String), Map[String, Seq[String]]]()

  /** The plain column of a `name col TYPE bloom_filter[...]` index body,
    * if that is its shape — only these wire to physical parquet blooms.
    */
  private[exec] def bloomIndexColumn(body: String): Option[String] = {
    val m = java.util.regex.Pattern.compile(
      "(?is)^\\s*\\S+\\s+`?([A-Za-z_][A-Za-z0-9_]*)`?\\s+TYPE\\s+bloom_filter\\b.*")
      .matcher(body)
    if (m.matches()) Some(m.group(1)) else None
  }

  /** Restore fast-path registries (r20, guide §1.2 fixed costs): a warm
    * JVM constructs a GraftSession per query entry, and the restore scan
    * paid file reads + parses per meta script, a temp-view re-analysis
    * per plain view, and a full source COLLECT per dictionary — ~126 ms
    * per construction measured at a 110-script warehouse, all of it
    * re-deriving state the JVM already holds. Each registry is keyed by
    * (SparkSession identity, name) and maintained by the mutating
    * statements themselves, so a script-text mismatch (file changed on
    * disk — a real restart or an external edit) always falls back to the
    * full replay path.
    */
  private[exec] final case class MetaScript(mtime: Long, size: Long,
      text: String, stmt: Option[ChStatement])
  private[exec] val metaScriptCache =
    new java.util.concurrent.ConcurrentHashMap[String, MetaScript]()

  /** (sessionId/viewName) -> the script text whose SELECT is currently
    * registered as the temp view. */
  private[exec] val viewMemos =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** (sessionId/dictName) -> loaded dictionary state. CH dictionaries are
    * server-global and stale-until-reload by design; adopting the loaded
    * broadcast instead of re-collecting the source per construction is
    * the CH model, not a shortcut. */
  private[exec] final case class DictMemo(script: String,
      cd: ChStatement.CreateDictionary, joinMode: Boolean,
      bc: Option[org.apache.spark.broadcast.Broadcast[
        java.util.HashMap[String, Array[String]]]])
  private[exec] val dictMemos =
    new java.util.concurrent.ConcurrentHashMap[String, DictMemo]()

  /** A running statement, for SHOW PROCESSLIST / system.processes /
    * KILL QUERY. The query id doubles as the Spark job group, so a kill
    * cancels the statement's active AND future jobs — including a SELECT
    * mid-stream over the wire.
    */
  final case class ProcEntry(qid: String, query: String, startMs: Long,
                             threadId: Long)
  private[graft] val processes =
    new java.util.concurrent.ConcurrentHashMap[String, ProcEntry]()
  // one "current statement" per thread: a SELECT stays listed while its
  // lazy result streams (jobs run after sql() returns, on this thread,
  // still in the query's job group); the NEXT statement on the thread —
  // or an explicit finishQuery() from a wire handler — retires it
  private[exec] val currentByThread =
    new java.util.concurrent.ConcurrentHashMap[Long, String]()

  /** Finished statements, newest first, capped — `system.query_log`. */
  final case class LogEntry(qid: String, query: String, startMs: Long,
                            durSec: Double)
  private[exec] val queryLog =
    new java.util.concurrent.ConcurrentLinkedDeque[LogEntry]()
  private[exec] val QueryLogCap = 1000
}
