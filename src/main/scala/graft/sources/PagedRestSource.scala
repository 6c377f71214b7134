package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 re-expression of the reference's REST extract at scale
  * (SURVEY §2.1 S2): the reference fetches one page range in one Lambda
  * (`src/lms_to_s3_lambda.py:36-51`, `limit`/`offset` envelope keys at
  * `:79-80`); here each Spark input partition owns a page range and
  * fetches independently, so a 1000-executor cluster pulls 1000 page
  * ranges concurrently. Column pruning (`SupportsPushDownRequiredColumns`)
  * and filter pushdown (`SupportsPushDownFilters`) both reach the
  * reader — the DSv2 analog of the reference's hand-written server-side
  * `_filter` string — and filters on `page` prune whole page-range
  * partitions at planning time, so pruned pages are never fetched.
  *
  * Two fetch modes share the whole planning surface:
  *
  *  - **Live HTTP** (`url` option set): [[HttpRestClient]] performs the
  *    reference's authenticated fetch for real — token POST, Bearer GET
  *    with limit/offset paging, `_filter` forwarding, envelope decode —
  *    with tokens cached per executor JVM. When `pages` isn't pinned,
  *    the source probes the envelope's `totalItems` once at planning
  *    time to derive the page count. Driven end-to-end against an
  *    embedded HTTP server in `PagedRestHttpSpec`.
  *  - **Stub** (no `url`; zero-egress default): [[StubPageFetcher]]
  *    synthesizes deterministic user pages with the same shape.
  *
  * Usage: `spark.read.format("graft.sources.PagedRestSource")
  *   .option("pages", 8).option("pageSize", 250).load()` — plus
  *   `.option("url", …).option("username", …).option("password", …)
  *   .option("privateKey", …)` for live mode.
  */
class PagedRestSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PagedRestSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val http = Option(properties.get("url")).map { u =>
      RestAuthConfig(u,
        Option(properties.get("username")).getOrElse(""),
        Option(properties.get("password")).getOrElse(""),
        Option(properties.get("privateKey")).getOrElse(""))
    }
    new PagedRestTable(
      pages = Option(properties.get("pages")).map(_.toInt).getOrElse(
        if (http.isDefined) -1 else 4), // -1 → probe totalItems at planning
      pageSize = Option(properties.get("pageSize")).map(_.toInt).getOrElse(100),
      pagesPerPartition = Option(properties.get("pagesPerPartition")).map(_.toInt).getOrElse(1),
      http = http)
  }
}

object PagedRestSource {
  /** The flattened user-record shape (reference fields post-P2/P3). */
  val schema: StructType = StructType(Seq(
    StructField("lms_user_id", LongType, nullable = false),
    StructField("first_name", StringType, nullable = false),
    StructField("department_id", StringType, nullable = false),
    StructField("active_status", IntegerType, nullable = false),
    StructField("page", IntegerType, nullable = false)))
}

/** Fetches one page of records. STUB: deterministic synthesis keyed on
  * (page, row) — a production implementation performs the authenticated
  * GET of `src/lms_to_s3_lambda.py:36-51` here and nothing else changes. */
trait PageFetcher extends Serializable {
  def fetch(page: Int, pageSize: Int): Iterator[(Long, String, String, Int)]
}

object StubPageFetcher extends PageFetcher {
  override def fetch(page: Int, pageSize: Int): Iterator[(Long, String, String, Int)] =
    (0 until pageSize).iterator.map { i =>
      val id = page.toLong * pageSize + i
      (id, s"user_$id", s"dept_${id % 7}", (id % 3).toInt)
    }
}

class PagedRestTable(pages: Int, pageSize: Int, pagesPerPartition: Int,
    http: Option[RestAuthConfig] = None)
    extends Table with SupportsRead {
  override def name(): String = s"paged_rest(pages=$pages)"
  override def schema(): StructType = PagedRestSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new PagedRestScanBuilder(pages, pageSize, pagesPerPartition, http)
}

class PagedRestScanBuilder(pages: Int, pageSize: Int, pagesPerPartition: Int,
    http: Option[RestAuthConfig] = None)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with org.apache.spark.sql.connector.read.SupportsPushDownFilters {
  import org.apache.spark.sql.sources._

  private var required: StructType = PagedRestSource.schema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Accept simple comparisons/In on the source's fields — the DSv2
    * analog of the reference's server-side `_filter` string
    * (`src/lms_to_s3_lambda.py:196-200`): accepted filters are evaluated
    * AT THE SOURCE (a production fetcher turns them into API query
    * params), and filters on `page` additionally prune whole page-range
    * partitions at planning time, so pruned pages are never fetched.
    * Everything is also returned as residual — Spark re-applies all
    * filters post-scan, so pushdown is purely an optimization and can
    * never change results. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(PagedRestFilters.supported)
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new Scan with Batch {
    override def readSchema(): StructType = required
    override def toBatch: Batch = this

    // surfaced in explain() — DSv2 doesn't render pushed filters unless
    // the Scan says so itself
    override def description(): String =
      s"PagedRestScan PushedFilters: [${pushed.mkString(", ")}], " +
        s"ReadSchema: ${required.simpleString}"

    // computed once and reused — Spark calls planInputPartitions more
    // than once per query (supportsColumnar + execution), and in live
    // mode each planning pass would otherwise re-probe the server
    private lazy val plannedPartitions: Array[InputPartition] = {
      // pages == -1 (live mode, page count unknown): probe the
      // envelope's totalItems ONCE, driver-side, at planning time —
      // this is how the page count exists before any task runs.
      val effectivePages =
        if (pages >= 0) pages
        else {
          val cfg = http.getOrElse(throw new IllegalStateException(
            "pages unset and no url to probe"))
          val total = new HttpRestClient(cfg)
            .probeTotalItems(PagedRestFilters.serverFilter(pushed))
          if (total < 0) throw new RuntimeException(
            s"${cfg.baseUrl}/users envelope has no totalItems; set the 'pages' option")
          ((total + pageSize - 1) / pageSize).toInt
        }
      val (lo, hi) = PagedRestFilters.pageBounds(pushed, effectivePages)
      (lo until hi by pagesPerPartition).map { start =>
        PageRangePartition(start, math.min(start + pagesPerPartition, hi)): InputPartition
      }.toArray
    }

    override def planInputPartitions(): Array[InputPartition] = plannedPartitions

    override def createReaderFactory(): PartitionReaderFactory =
      new PagedRestReaderFactory(pageSize, required, pushed, http)
  }
}

/** Filter support shared by planning (partition pruning) and the reader
  * (per-row source-side evaluation). */
object PagedRestFilters {
  import org.apache.spark.sql.sources._

  private val fields = Set("lms_user_id", "first_name", "department_id",
    "active_status", "page")

  def supported(f: Filter): Boolean = f match {
    case EqualTo(a, _) => fields(a)
    case GreaterThan(a, _) => fields(a)
    case GreaterThanOrEqual(a, _) => fields(a)
    case LessThan(a, _) => fields(a)
    case LessThanOrEqual(a, _) => fields(a)
    case In(a, _) => fields(a)
    case _ => false
  }

  /** Server-side `_filter` expression for an accepted department
    * equality — the exact syntax the reference sends
    * (`src/lms_to_s3_lambda.py:197-199`:
    * `"_filter": "departmentId eq guid'department_id'"`). Only this
    * shape forwards; everything else is evaluated client-side and
    * re-checked by Spark's residual filters regardless. */
  def serverFilter(pushed: Array[Filter]): Option[String] =
    pushed.collectFirst {
      case EqualTo("department_id", v) => s"departmentId eq guid'$v'"
    }

  /** [lo, hi) page range implied by pushed filters on `page`. */
  def pageBounds(pushed: Array[Filter], pages: Int): (Int, Int) = {
    var lo = 0
    var hi = pages
    pushed.foreach {
      case EqualTo("page", v: Number) =>
        lo = math.max(lo, v.intValue); hi = math.min(hi, v.intValue + 1)
      case GreaterThan("page", v: Number) => lo = math.max(lo, v.intValue + 1)
      case GreaterThanOrEqual("page", v: Number) => lo = math.max(lo, v.intValue)
      case LessThan("page", v: Number) => hi = math.min(hi, v.intValue)
      case LessThanOrEqual("page", v: Number) => hi = math.min(hi, v.intValue + 1)
      case _ => ()
    }
    (math.min(lo, hi), hi)
  }

  /** Evaluate one pushed filter against a synthesized record. */
  def eval(f: Filter, id: Long, name: String, dept: String, status: Int, pg: Int): Boolean = {
    def value(attr: String): Any = attr match {
      case "lms_user_id" => id
      case "first_name" => name
      case "department_id" => dept
      case "active_status" => status
      case "page" => pg
    }
    def cmp(attr: String, v: Any): Int = (value(attr), v) match {
      case (a: String, b) => a.compareTo(b.toString)
      case (a: Long, b: Number) => java.lang.Long.compare(a, b.longValue)
      case (a: Int, b: Number) => java.lang.Long.compare(a.toLong, b.longValue)
      case _ => 0
    }
    f match {
      case EqualTo(a, v) => cmp(a, v) == 0
      case GreaterThan(a, v) => cmp(a, v) > 0
      case GreaterThanOrEqual(a, v) => cmp(a, v) >= 0
      case LessThan(a, v) => cmp(a, v) < 0
      case LessThanOrEqual(a, v) => cmp(a, v) <= 0
      case In(a, vs) => vs.exists(v => cmp(a, v) == 0)
      case _ => true
    }
  }
}

case class PageRangePartition(startPage: Int, endPage: Int) extends InputPartition

class PagedRestReaderFactory(pageSize: Int, required: StructType,
    pushed: Array[org.apache.spark.sql.sources.Filter] = Array.empty,
    http: Option[RestAuthConfig] = None)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[PageRangePartition]
    new PartitionReader[InternalRow] {
      // Executor-side page pull: live HTTP (authenticated GET per page,
      // offset = page * pageSize, accepted filters forwarded via
      // `_filter`) or the zero-egress stub. Both feed the same
      // client-side filter eval + projection below.
      private val fetchPage: Int => Iterator[(Long, String, String, Int)] =
        http match {
          case Some(cfg) =>
            val client = new HttpRestClient(cfg)
            val sf = PagedRestFilters.serverFilter(pushed)
            pg => client.fetchPage(pageSize, pg * pageSize, sf)._1.iterator
              .map(u => (u.id, u.firstName, u.departmentId, u.activeStatus))
          case None => pg => StubPageFetcher.fetch(pg, pageSize)
        }
      private val it = (p.startPage until p.endPage).iterator
        .flatMap(pg => fetchPage(pg).map(r => (pg, r)))
        .filter { case (pg, (id, name, dept, status)) =>
          pushed.forall(PagedRestFilters.eval(_, id, name, dept, status, pg)) }
      private var current: InternalRow = _
      // projection map computed once: required field -> source ordinal
      private val ordinals = required.fields.map(f =>
        PagedRestSource.schema.fieldIndex(f.name))

      override def next(): Boolean =
        if (it.hasNext) {
          val (pg, (id, name, dept, status)) = it.next()
          val full = Array[Any](id, UTF8String.fromString(name),
            UTF8String.fromString(dept), status, pg)
          current = InternalRow.fromSeq(ordinals.toSeq.map(full))
          true
        } else false

      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}
