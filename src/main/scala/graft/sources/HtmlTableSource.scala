package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{DataSourceRegister, Filter, GreaterThan, GreaterThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

/** S1 as a DataSource V2 `TableProvider` — the production shape of the
  * FDA listing-table source (SURVEY §2.1 S1; reference
  * fda_rag_extraction/scripts/fda_watcher.py:274-355):
  *
  * {{{
  *   spark.read.format("graft-html")
  *     .option("baseDomain", "https://www.fda.gov/")
  *     .load("/data/crawl/listing_pages")      // *.html files
  *     .filter($"n_cells" >= 3)                // pushed INTO the scan
  * }}}
  *
  * Scale shape: one `InputPartition` per page file — a million crawled
  * pages parse on a thousand executors with no shuffle anywhere; the
  * parse ([[graft.ops.HtmlTable.parseRows]], a pure function) runs
  * inside the scan, and the listing-table cell-count gate (`n_cells >=
  * 3`, the watcher's "skip header/short rows" rule) is accepted by
  * `pushFilters`, so gated-out `<tr>`s are never materialized as rows —
  * the Filter node disappears from the plan and `explain` shows the
  * bound in the scan description.
  *
  * Options: `baseDomain` (href resolution base, default ""), `glob`
  * (page-file glob, default `*.html`). The fetch stage stays pluggable
  * (see [[graft.streaming.RateLimit]] for pacing): this source reads
  * already-fetched pages, which is also what keeps it deterministic and
  * testable — same split as the reference's requests-session vs parse
  * layers.
  */
class HtmlTableSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-html"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    HtmlTableSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new HtmlListingTable(new CaseInsensitiveStringMap(properties))
}

object HtmlTableSource {
  val schema: StructType = StructType(Seq(
    StructField("title", StringType),
    StructField("description", StringType),
    StructField("date", StringType),
    StructField("url", StringType),
    StructField("n_cells", IntegerType, nullable = false)))
}

private[sources] class HtmlListingTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String =
    s"graft-html:${options.getOrDefault("path", "")}"
  override def schema(): StructType = HtmlTableSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(caseInsensitiveOptions: CaseInsensitiveStringMap): ScanBuilder = {
    // getTable receives the merged properties; the read-path options win
    val merged = new util.HashMap[String, String](options.asCaseSensitiveMap())
    merged.putAll(caseInsensitiveOptions.asCaseSensitiveMap())
    new HtmlListingScanBuilder(new CaseInsensitiveStringMap(merged))
  }
}

/** Accepts `n_cells >= c` / `n_cells > c` as FULLY pushed (the parser
  * applies the tightest bound while walking `<tr>`s, so Spark drops its
  * Filter node); everything else stays post-scan. */
private[sources] class HtmlListingScanBuilder(options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownFilters {
  private var minCells: Int = 0
  private var pushed: Array[Filter] = Array.empty

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rest) = filters.partition {
      case GreaterThanOrEqual("n_cells", v: Int) => minCells = math.max(minCells, v); true
      case GreaterThan("n_cells", v: Int) => minCells = math.max(minCells, v + 1); true
      case _ => false
    }
    pushed = accepted
    rest
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new HtmlListingScan(options, minCells)
}

private[sources] class HtmlListingScan(options: CaseInsensitiveStringMap,
    minCells: Int) extends Scan with Batch {
  override def readSchema(): StructType = HtmlTableSource.schema
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-html path=${options.getOrDefault("path", "")} " +
      s"PushedMinCells: $minCells"

  override def planInputPartitions(): Array[InputPartition] = {
    // .load(dir), .load(file) or the standard multi-path
    // .load(p1, p2, …) (Spark passes the latter as a JSON array in the
    // "paths" option) — the multi-path form is what a per-tick ingest
    // driver uses to parse EXACTLY the pages that just landed
    val roots: Seq[String] = Option(options.get("paths"))
      .filter(_.nonEmpty)
      .map { js =>
        org.json4s.jackson.JsonMethods.parse(js) match {
          case org.json4s.JArray(vs) =>
            vs.collect { case org.json4s.JString(s) => s }
          case _ => Seq.empty[String]
        }
      }
      .getOrElse(Option(options.get("path")).toSeq)
      .filter(_.nonEmpty)
    require(roots.nonEmpty,
      "graft-html: .load(path…) with page files or a directory is required")
    val glob = options.getOrDefault("glob", "*.html")
    val hadoopConf = SparkSession.active.sessionState.newHadoopConf()
    val matched = roots.flatMap { p =>
      val root = new Path(p)
      val fs = root.getFileSystem(hadoopConf)
      if (fs.getFileStatus(root).isDirectory)
        fs.globStatus(new Path(root, glob)).toSeq
      else Seq(fs.getFileStatus(root))
    }
    // one partition per page file: a crawl of N pages parses with N-way
    // parallelism and zero shuffle (files are small — a page is KBs; at
    // millions of pages the scheduler batches tasks, not this source)
    matched.filter(_.isFile).sortBy(_.getPath.toString)
      .map(st => HtmlPagePartition(st.getPath.toString): InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val conf = new SerializableConfiguration(
      SparkSession.active.sessionState.newHadoopConf())
    val baseDomain = options.getOrDefault("baseDomain", "")
    new HtmlPageReaderFactory(conf, baseDomain, minCells)
  }
}

private[sources] case class HtmlPagePartition(file: String) extends InputPartition

private[sources] class HtmlPageReaderFactory(
    conf: SerializableConfiguration, baseDomain: String, minCells: Int)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[HtmlPagePartition].file
    new PartitionReader[InternalRow] {
      private lazy val rows: Iterator[graft.ops.HtmlTable.RawRow] = {
        val p = new Path(file)
        val fs = FileSystem.get(p.toUri, conf.value)
        val in = fs.open(p)
        val html =
          try new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8")
          finally in.close()
        graft.ops.HtmlTable.parseRows(html, baseDomain, minCells).iterator
      }
      private var current: graft.ops.HtmlTable.RawRow = _
      override def next(): Boolean = {
        if (rows.hasNext) { current = rows.next(); true } else false
      }
      override def get(): InternalRow = InternalRow(
        UTF8String.fromString(current.title),
        UTF8String.fromString(current.description),
        UTF8String.fromString(current.date),
        UTF8String.fromString(current.url),
        current.nCells)
      override def close(): Unit = ()
    }
  }
}
