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
  * ranges concurrently. Column pruning is pushed into the reader
  * (`SupportsPushDownRequiredColumns`), the DSv2 analog of the
  * reference's hand-written server-side `_filter` pushdown.
  *
  * The HTTP layer is a clearly-marked STUB (zero-egress container): the
  * default [[PageFetcher]] synthesizes deterministic user pages. The
  * planning surface — TableProvider, page-range partitions, pruning,
  * per-partition readers — is the real, load-bearing part; a production
  * fetcher swaps in without touching any of it.
  *
  * Usage: `spark.read.format("graft.sources.PagedRestSource")
  *   .option("pages", 8).option("pageSize", 250).load()`
  */
class PagedRestSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PagedRestSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new PagedRestTable(
      pages = Option(properties.get("pages")).map(_.toInt).getOrElse(4),
      pageSize = Option(properties.get("pageSize")).map(_.toInt).getOrElse(100),
      pagesPerPartition = Option(properties.get("pagesPerPartition")).map(_.toInt).getOrElse(1))
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

class PagedRestTable(pages: Int, pageSize: Int, pagesPerPartition: Int)
    extends Table with SupportsRead {
  override def name(): String = s"paged_rest(pages=$pages)"
  override def schema(): StructType = PagedRestSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new PagedRestScanBuilder(pages, pageSize, pagesPerPartition)
}

class PagedRestScanBuilder(pages: Int, pageSize: Int, pagesPerPartition: Int)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = PagedRestSource.schema

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new Scan with Batch {
    override def readSchema(): StructType = required
    override def toBatch: Batch = this

    override def planInputPartitions(): Array[InputPartition] =
      (0 until pages by pagesPerPartition).map { start =>
        PageRangePartition(start, math.min(start + pagesPerPartition, pages)): InputPartition
      }.toArray

    override def createReaderFactory(): PartitionReaderFactory =
      new PagedRestReaderFactory(pageSize, required)
  }
}

case class PageRangePartition(startPage: Int, endPage: Int) extends InputPartition

class PagedRestReaderFactory(pageSize: Int, required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[PageRangePartition]
    new PartitionReader[InternalRow] {
      private val it = (p.startPage until p.endPage).iterator
        .flatMap(pg => StubPageFetcher.fetch(pg, pageSize).map(r => (pg, r)))
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
