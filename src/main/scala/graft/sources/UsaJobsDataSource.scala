package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownLimit, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{DataSourceRegister, EqualNullSafe, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, IsNotNull, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{IntegerType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 `TableProvider` for the paginated USAJOBS source
  * (SURVEY §2.1 S1/S2 evolution, §7.3): `spark.read.format("usajobs")`.
  *
  * Design: one API page = one `InputPartition`. The driver-side drain
  * loop (UsaJobsClient.drainPages) fetches sequentially and stops early;
  * this source instead over-provisions maxPages partitions at plan time
  * and lets each executor fetch its own page — pages past the end of the
  * result set yield zero rows, which costs one cheap HTTP round-trip.
  * That trades the drain loop's early-stop for horizontal scaling of the
  * fetch itself, which is the right trade whenever maxPages is bounded
  * (the reference caps at 20) and the API tolerates parallel readers.
  * Rate pacing becomes per-task (`requestIntervalMs` sleeps before each
  * fetch) — cluster-wide pacing needs an external token bucket, noted in
  * the option doc.
  *
  * Output schema: (page INT, keyword STRING, location STRING,
  * payload STRING) — `keyword`/`location` echo the API request
  * parameters that produced each page, and `payload` is the raw page
  * JSON, parsed downstream by Curate.fromPayloads through the usual
  * explode/project plan, so the whole curation pipeline is shared with
  * the driver-drain path.
  *
  * Filter pushdown (SupportsPushDownFilters): the search parameters are
  * the API's OWN access path (the reference sends them as `Keyword` /
  * `LocationName` request params rather than filtering responses), so a
  * `filter()` on this frame must become part of the REQUEST, not a
  * post-scan predicate over pages fetched with the default keyword:
  *  - `keyword = 'x'` / `location = 'y'` equality becomes the request
  *    parameter (overriding the reader option) and is fully consumed —
  *    every produced row carries exactly that value;
  *  - `page` equality/range bounds shrink the PLANNED partition set, so
  *    fewer pages are fetched at all;
  *  - contradictory equalities (`keyword='a' AND keyword='b'`) plan
  *    zero partitions — no fetch, correctly empty;
  *  - anything else is left to Spark as a residual filter over the
  *    emitted columns.
  * Pushed filters are surfaced in the scan's plan description
  * (spec-pinned), column pruning via SupportsPushDownRequiredColumns as
  * before.
  *
  * Limit pushdown (SupportsPushDownLimit): each page partition emits at
  * most one row, so `limit(n)` clips the planned page range to its
  * first n pages — the later fetches never happen. This is
  * semantics-preserving under the pagination contract the drain loop
  * already relies on (an empty page ends the result set — S2's stop
  * condition): if an empty page sits inside the clipped range, every
  * page after it is empty too, so no row the full scan would have kept
  * is lost. The limit stays partially-pushed (Spark keeps its own
  * LIMIT operator) since a fixture dir with a hole violates that
  * contract only in tests.
  *
  * Transports (chosen from options, all executor-constructible):
  *  - `pages.dir`: directory of page-N.json fixture files (tests/replay);
  *    missing file ⇒ empty page.
  *  - `api.key` [+ `base.url`]: live HTTP via UsaJobsClient.HttpTransport.
  */
class UsaJobsDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "usajobs"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    UsaJobsDataSource.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new UsaJobsTable(properties.asScala.toMap)
}

object UsaJobsDataSource {
  val Schema: StructType = new StructType()
    .add("page", IntegerType, nullable = false)
    .add("keyword", StringType, nullable = false)
    .add("location", StringType, nullable = true)
    .add("payload", StringType, nullable = false)
}

private[sources] class UsaJobsTable(props: Map[String, String])
    extends Table with SupportsRead {
  override def name(): String = "usajobs"
  override def schema(): StructType = UsaJobsDataSource.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder = {
    val merged = props ++ options.asScala
    new ScanBuilder with Scan with Batch
        with SupportsPushDownRequiredColumns with SupportsPushDownFilters
        with SupportsPushDownLimit {
      // column pruning pushed INTO the source: a projection that drops
      // `payload` (count-shaped reads, page inventories) never
      // materializes the page JSON into rows — the fetch itself still
      // happens, because "this page returned data" is what defines row
      // existence. Catalyst shows the pruned schema in the scan's
      // ReadSchema (spec-pinned).
      private var required: StructType = UsaJobsDataSource.Schema
      override def pruneColumns(requiredSchema: StructType): Unit =
        required = requiredSchema

      // --- filter pushdown state (plan-time, driver-side) ---
      // Equality constraints start from the reader options and tighten;
      // `contradiction` records keyword='a' AND keyword='b' (plans zero
      // partitions). Page bounds clip the 1..maxPages planning range.
      private var keywordEq: Option[String] = None
      private var locationEq: Option[String] = None
      private var contradiction = false
      private var pageLo = 1
      private var pageHi = Int.MaxValue
      private var accepted: Array[Filter] = Array.empty

      private def tightenString(cur: Option[String],
          v: String): Option[String] = cur match {
        case Some(existing) if existing != v => contradiction = true; cur
        case _ => Some(v)
      }

      override def pushFilters(filters: Array[Filter]): Array[Filter] = {
        val (ours, residual) = filters.partition {
          case EqualTo("keyword" | "location", _: String) => true
          case EqualNullSafe("keyword" | "location", _: String) => true
          case EqualTo("page", _: Int) => true
          case LessThan("page", _: Int) => true
          case LessThanOrEqual("page", _: Int) => true
          case GreaterThan("page", _: Int) => true
          case GreaterThanOrEqual("page", _: Int) => true
          // page/keyword are non-nullable by schema: trivially true
          case IsNotNull("page" | "keyword") => true
          case _ => false
        }
        ours.foreach {
          case EqualTo("keyword", v: String) =>
            keywordEq = tightenString(keywordEq, v)
          case EqualNullSafe("keyword", v: String) =>
            keywordEq = tightenString(keywordEq, v)
          case EqualTo("location", v: String) =>
            locationEq = tightenString(locationEq, v)
          case EqualNullSafe("location", v: String) =>
            locationEq = tightenString(locationEq, v)
          case EqualTo("page", v: Int) =>
            pageLo = math.max(pageLo, v); pageHi = math.min(pageHi, v)
          // Strict bounds in Long then clamp: v-1 / v+1 on raw Int
          // would wrap at Int.MinValue / Int.MaxValue, and since these
          // filters are reported fully pushed Spark never re-applies
          // them — a wrapped bound silently turns "return nothing"
          // into "return every planned page".
          case LessThan("page", v: Int) =>
            pageHi = math.min(pageHi.toLong, v.toLong - 1L)
              .max(Int.MinValue.toLong).toInt
          case LessThanOrEqual("page", v: Int) =>
            pageHi = math.min(pageHi, v)
          case GreaterThan("page", v: Int) =>
            pageLo = math.max(pageLo.toLong, v.toLong + 1L)
              .min(Int.MaxValue.toLong).toInt
          case GreaterThanOrEqual("page", v: Int) =>
            pageLo = math.max(pageLo, v)
          case _ => () // IsNotNull on non-nullable columns: no-op
        }
        accepted = ours
        residual
      }
      override def pushedFilters(): Array[Filter] = accepted

      // --- limit pushdown (plan-time) ---
      // ≤ 1 row per page partition ⇒ the first `limit` planned pages
      // can produce every row the limit keeps (empty-page-ends-results
      // contract, see class doc). Partially pushed: Spark keeps its
      // LIMIT node, we just stop planning fetches it would discard.
      private var pushedLimit: Option[Int] = None
      override def pushLimit(l: Int): Boolean = {
        pushedLimit = Some(l)
        true
      }
      override def isPartiallyPushed: Boolean = true

      override def build(): Scan = this
      override def readSchema(): StructType = required
      override def toBatch: Batch = this
      override def description(): String = {
        val pushed =
          if (accepted.isEmpty) "" else accepted.mkString(", ")
        val lim = pushedLimit.map(l => s" PushedLimit: $l").getOrElse("")
        s"usajobs PushedFilters: [$pushed]$lim"
      }

      override def planInputPartitions(): Array[InputPartition] = {
        val maxPages = merged.getOrElse("maxpages", "20").toInt
        val lo = math.max(1, pageLo)
        var hi = math.min(maxPages, pageHi)
        pushedLimit match {
          case Some(l) if l <= 0 => hi = lo - 1 // LIMIT 0: plan nothing
          case Some(l) => // Long arithmetic: lo + Int.MaxValue - 1 wraps
            hi = math.min(hi.toLong, lo.toLong + l - 1L).toInt
          case None => ()
        }
        if (contradiction || lo > hi) return Array.empty
        val keyword = keywordEq
          .orElse(merged.get("keyword")).getOrElse("data engineering")
        val location = locationEq
          .orElse(merged.get("location").filter(_.nonEmpty))
        (lo to hi).map(p =>
          UsaJobsPagePartition(p, keyword, location,
            merged.getOrElse("resultsperpage", "500").toInt,
            merged.get("pages.dir"),
            merged.get("api.key"),
            merged.getOrElse("base.url",
              UsaJobsClient.HttpTransport.DefaultBaseUrl),
            merged.getOrElse("requestintervalms", "0").toLong)
            : InputPartition).toArray
      }

      override def createReaderFactory(): PartitionReaderFactory =
        new UsaJobsReaderFactory(required.fieldNames.toSeq)
    }
  }
}

private[sources] case class UsaJobsPagePartition(page: Int, keyword: String,
    location: Option[String], resultsPerPage: Int, pagesDir: Option[String],
    apiKey: Option[String], baseUrl: String, requestIntervalMs: Long)
  extends InputPartition

private[sources] class UsaJobsReaderFactory(
    requiredFields: Seq[String]) extends PartitionReaderFactory {
  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[UsaJobsPagePartition]
    new PartitionReader[InternalRow] {
      private var done = false
      private var payload: String = _

      private def fetch(): String = p.pagesDir match {
        case Some(dir) =>
          val f = java.nio.file.Paths.get(dir, s"page-${p.page}.json")
          if (java.nio.file.Files.exists(f))
            new String(java.nio.file.Files.readAllBytes(f), "UTF-8")
          else ""
        case None =>
          val key = p.apiKey.getOrElse(throw new IllegalArgumentException(
            "usajobs source needs either pages.dir or api.key"))
          if (p.requestIntervalMs > 0) Thread.sleep(p.requestIntervalMs)
          UsaJobsClient.retry()(() =>
            UsaJobsClient.HttpTransport(key, p.baseUrl)(
              UsaJobsClient.PageRequest(p.keyword, p.page, p.resultsPerPage,
                p.location)))
      }

      override def next(): Boolean =
        if (done) false
        else {
          payload = fetch()
          done = true
          payload.nonEmpty
        }

      override def get(): InternalRow =
        InternalRow(requiredFields.map {
          case "page" => p.page
          case "keyword" => UTF8String.fromString(p.keyword)
          case "location" =>
            p.location.map(UTF8String.fromString).orNull
          case "payload" => UTF8String.fromString(payload)
        }: _*)

      override def close(): Unit = ()
    }
  }
}
