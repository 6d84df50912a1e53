package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.server.{ChNativeClient, ChProto}

/** DataSource V2 connector over the ClickHouse-native protocol — the
  * engine's `remote(...)` transport (reference fan-out:
  * crates/runtime/src/read.rs:151-228; query localization
  * `to_local_query_str` crates/engine/src/remote.rs).
  *
  * Spark-native scale posture, beyond what the reference does:
  *   - one InputPartition PER SHARD ADDRESS — each executor task streams
  *     its own shard's blocks (the reference fans out on a driver-side
  *     thread pool and funnels everything through one process);
  *   - COLUMN PRUNING and FILTER PUSHDOWN travel to the remote server as
  *     SQL — `SELECT <pruned cols> FROM t WHERE <pushed predicates>` —
  *     so a selective query over a 100 TB remote moves only the matching
  *     columns/rows, not the table. Residual (untranslatable) predicates
  *     stay in Spark's local FilterExec.
  *
  * Options: `url` (ch://host[:port][,host2...]), `table`, optional
  * `user`/`password`.
  */
final class ChNativeSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "chnative"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val c = ChNativeConf(options.asCaseSensitiveMap().asScala.toMap)
    val (host, port) = c.addrs.head
    ChNativeClient.withClient(host, port, c.user, c.password)(
      _.schemaOf(s"SELECT * FROM ${c.table} WHERE 1=0"))
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new ChNativeTable(schema, ChNativeConf(properties.asScala.toMap))
}

private[sources] final case class ChNativeConf(options: Map[String, String]) {
  private def opt(k: String): Option[String] =
    options.collectFirst { case (key, v) if key.equalsIgnoreCase(k) => v }
  val url: String = opt("url").getOrElse(
    throw new IllegalArgumentException("chnative: missing option 'url'"))
  val table: String = opt("table").getOrElse(
    throw new IllegalArgumentException("chnative: missing option 'table'"))
  val user: String = opt("user").getOrElse("default")
  val password: String = opt("password").getOrElse("")
  def addrs: Seq[(String, Int)] = ChNativeClient.parseAddrs(url)
}

private final class ChNativeTable(schema: StructType, conf: ChNativeConf)
    extends Table with SupportsRead {
  override def name(): String = s"chnative:${conf.url}/${conf.table}"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ChScanBuilder(schema, conf)
}

private final class ChScanBuilder(fullSchema: StructType, conf: ChNativeConf)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters {

  private var required: StructType = fullSchema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    // an empty projection (count(*)) still needs one column on the wire
    required =
      if (requiredSchema.fields.nonEmpty) requiredSchema
      else StructType(fullSchema.fields.take(1))

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ok, residual) = filters.partition(f => ChFilterSql.translate(f).isDefined)
    pushed = ok
    residual // Spark keeps these in a local Filter
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new ChScan(required, pushed, conf)
}

private final class ChScan(schema: StructType, filters: Array[Filter],
                           conf: ChNativeConf) extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def description(): String = {
    val w = if (filters.isEmpty) "" else
      s" where ${filters.flatMap(ChFilterSql.translate).mkString(" AND ")}"
    s"chnative ${conf.table}$w"
  }

  private def remoteSql: String = {
    val cols = schema.fields.map(f => s"`${f.name}`").mkString(", ")
    val where = filters.flatMap(ChFilterSql.translate) match {
      case Array() => ""
      case ws => ws.mkString(" WHERE (", ") AND (", ")")
    }
    s"SELECT $cols FROM ${conf.table}$where"
  }

  override def planInputPartitions(): Array[InputPartition] =
    conf.addrs.map { case (h, p) =>
      ChInputPartition(h, p, conf.user, conf.password, remoteSql)
        : InputPartition
    }.toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new ChReaderFactory(schema)
}

private final case class ChInputPartition(host: String, port: Int,
                                          user: String, password: String,
                                          sql: String) extends InputPartition

private final class ChReaderFactory(schema: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[ChInputPartition]
    new PartitionReader[InternalRow] {
      private val client = new ChNativeClient(p.host, p.port, p.user, p.password)
      private val toCatalyst =
        CatalystTypeConverters.createToCatalystConverter(schema)
      private val rows: Iterator[InternalRow] =
        client.queryBlocks(p.sql)
          .flatMap(b => ChProto.blockToRows(b, schema))
          .map(r => toCatalyst(r).asInstanceOf[InternalRow])
      private var current: InternalRow = _
      override def next(): Boolean =
        if (rows.hasNext) { current = rows.next(); true } else false
      override def get(): InternalRow = current
      override def close(): Unit = client.close()
    }
  }
}

/** Spark source Filter → ClickHouse-dialect SQL. Translatable predicates go
  * to the remote; None means "keep it local". Only value types both
  * engines render identically are pushed.
  */
private[sources] object ChFilterSql {

  private def lit(v: Any): Option[String] = v match {
    case null => None
    case s: String => Some("'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'")
    case _: java.lang.Integer | _: java.lang.Long | _: java.lang.Short |
         _: java.lang.Byte | _: java.lang.Boolean => Some(String.valueOf(v))
    case d: java.math.BigDecimal => Some(d.toPlainString)
    case d: BigDecimal => Some(d.underlying.toPlainString)
    case d: java.sql.Date => Some(s"DATE'$d'")
    case d: java.time.LocalDate => Some(s"DATE'$d'")
    case t: java.sql.Timestamp => Some(s"TIMESTAMP'$t'")
    case _ => None // floats (repr drift), binary, nested — keep local
  }

  private def col(name: String): Option[String] =
    // nested fields (a.b) are not pushable; plain columns are backquoted
    if (name.contains(".")) None else Some(s"`$name`")

  def translate(f: Filter): Option[String] = f match {
    case EqualTo(a, v) => for { c <- col(a); l <- lit(v) } yield s"$c = $l"
    case GreaterThan(a, v) => for { c <- col(a); l <- lit(v) } yield s"$c > $l"
    case GreaterThanOrEqual(a, v) => for { c <- col(a); l <- lit(v) } yield s"$c >= $l"
    case LessThan(a, v) => for { c <- col(a); l <- lit(v) } yield s"$c < $l"
    case LessThanOrEqual(a, v) => for { c <- col(a); l <- lit(v) } yield s"$c <= $l"
    case IsNull(a) => col(a).map(c => s"$c IS NULL")
    case IsNotNull(a) => col(a).map(c => s"$c IS NOT NULL")
    case In(a, vs) if vs.nonEmpty =>
      val ls = vs.toSeq.map(lit)
      if (ls.forall(_.isDefined))
        col(a).map(c => s"$c IN (${ls.flatten.mkString(", ")})")
      else None
    case StringStartsWith(a, v) =>
      for { c <- col(a); l <- lit(v + "%") } yield s"$c LIKE $l"
    case And(l, r) =>
      for { ls <- translate(l); rs <- translate(r) } yield s"($ls) AND ($rs)"
    case Or(l, r) =>
      for { ls <- translate(l); rs <- translate(r) } yield s"($ls) OR ($rs)"
    case Not(c) => translate(c).map(s => s"NOT ($s)")
    case _ => None
  }
}
