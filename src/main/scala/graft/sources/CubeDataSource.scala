package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table,
  TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition,
  PartitionReader, PartitionReaderFactory, Scan, ScanBuilder,
  SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter,
  GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.plans.CubeParser

/** DataSource V2 reader for GENESIS cube flat files — SURVEY §7.3's
  * deferred "custom FileFormat" v2, landed (r8) as the scale answer to
  * many-cube ingestion: `spark.read.format("genesis-cube").load(dir)`.
  *
  * Why a source and not the [[graft.plans.CubePipeline.parseAll]]
  * plan-composition path: parseAll builds one sub-plan per cube and
  * needs each cube's header ON THE DRIVER to generate the extraction
  * Columns — batched (r8) that is one up-front job and O(N) plan
  * nodes. This source moves schema-from-header INTO THE EXECUTORS:
  * the driver only lists files (no Spark job at all), each cube file
  * becomes one [[InputPartition]], and its reader derives the layout
  * from the K/D header records and streams data records straight to
  * rows. O(1) driver cost for any cube count — at the GENESIS
  * corpus's ~10⁴–10⁵ cubes the difference between an ingestion plan
  * the driver can hold and one it can't.
  *
  * The two paths stay interchangeable because the output contract is
  * the SHARED long schema ([[CubeDataSource.schema]] ==
  * `CubePipeline.normalized`'s shape): heterogeneous per-cube axes
  * fold into the `dims` map (non-region axes, name-sorted), `value`
  * is DOUBLE (a single relation needs one type; the exact
  * declared-scale DECIMAL path remains `CubeParser.parse` — the house
  * rule already projects doubles at every driver-facing edge), and
  * the data-record filter + null-token mapping reuse
  * [[CubeParser.headerTags]]/[[CubeParser.nullValues]] so the reader
  * and the Column parser can never disagree on a cell
  * (CubeSourceSpec asserts row-for-row parity; the `cube_source` key
  * oracle-checks the whole path against DuckDB).
  *
  * Column pruning is pushed down ([[SupportsPushDownRequiredColumns]]):
  * a `select(cube, measure)` builds 2-field rows in the reader, not
  * 7-field rows projected later. `cube` predicates prune at FILE
  * granularity ([[SupportsPushDownFilters]]): cube identity IS the
  * file, so `filter(cube === x)` plans exactly the matching input
  * partitions — a point lookup over a 10⁵-cube corpus opens one file.
  * `time` (equality/IN/range) and `measure` (equality/IN) predicates
  * prune at READER granularity (r17, r16 verdict #4): off-year data
  * records are skipped before any row is built and only the surviving
  * measure slots of a record are emitted, so the common "one year,
  * one statistic, every cube" query materializes exactly its answer.
  * Like parquet's pushdown this is best-effort: every filter is also
  * returned as residual, so Catalyst re-evaluates above the scan and
  * correctness never depends on the pruning.
  *
  * Cube identity = file basename minus extension (the reference's
  * storage lays one file per cube download, named by cube code
  * [R: genesapi/storage.py — UNVERIFIED]). Partition granularity =
  * one file (GENESIS cubes are single-download sized); in-file
  * splitting is unnecessary at that shape.
  */
class CubeDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "genesis-cube"
  override def supportsExternalMetadata(): Boolean = false
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    CubeDataSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new CubeTable(CubeDataSource.pathsFrom(properties))
}

object CubeDataSource {
  /** The shared long schema (SURVEY §1.2) — identical shape to
    * `CubePipeline.normalized`. */
  val schema: StructType = StructType(Seq(
    StructField("cube", StringType),
    StructField("region", StringType),
    StructField("time", IntegerType),
    StructField("measure", StringType),
    StructField("value", DoubleType),
    StructField("quality", StringType),
    StructField("dims", MapType(StringType, StringType, valueContainsNull = true))))

  /** `load(p)` arrives as option `path`; `load(p1, p2, …)` as `paths`,
    * a JSON string array. Minimal parse (quoted segments), no JSON dep.
    */
  private[sources] def pathsFrom(properties: JMap[String, String]): Seq[String] = {
    val m = properties.asScala
    val multi = m.get("paths").toSeq.flatMap { js =>
      "\"((?:[^\"\\\\]|\\\\.)*)\"".r.findAllMatchIn(js)
        .map(_.group(1).replace("\\\"", "\"").replace("\\\\", "\\")).toSeq
    }
    val single = m.get("path").toSeq
    val all = (multi ++ single).distinct
    require(all.nonEmpty, "genesis-cube: no path given — use .load(path…)")
    all.toSeq
  }
}

private[sources] class CubeTable(paths: Seq[String]) extends Table
    with SupportsRead {
  override def name(): String = s"genesis-cube(${paths.mkString(",")})"
  override def schema(): StructType = CubeDataSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new CubeScanBuilder(paths)
}

private[sources] class CubeScanBuilder(paths: Seq[String])
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  private var required: StructType = CubeDataSource.schema
  private var cubeFilters: Seq[Filter] = Nil
  private var rowFilters: Seq[Filter] = Nil
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  /** Accept `cube` equality/IN predicates for FILE pruning, plus
    * `time` range/equality/IN and `measure` equality/IN predicates for
    * READER-level pruning (r17, r16 verdict #4): a data record whose
    * time fails the predicate is skipped before any row is built, and
    * only the predicate-surviving measures of a record are emitted —
    * at a 10⁵-cube store a "2020 BEVSTD only" query then reads and
    * discards nothing. Return EVERY filter as residual (best-effort
    * pushdown, the parquet pattern) so Catalyst re-evaluates above the
    * scan and pruning can never change results.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    cubeFilters = filters.collect {
      case f @ EqualTo("cube", _: String) => f: Filter
      case f @ In("cube", _) => f: Filter
    }.toSeq
    rowFilters = filters.collect {
      case f @ EqualTo("time", _: Int) => f: Filter
      case f @ In("time", _) => f: Filter
      case f @ GreaterThan("time", _: Int) => f: Filter
      case f @ GreaterThanOrEqual("time", _: Int) => f: Filter
      case f @ LessThan("time", _: Int) => f: Filter
      case f @ LessThanOrEqual("time", _: Int) => f: Filter
      // `measure` range predicates (>, <, BETWEEN) stay residual-only
      // BY DESIGN (r17 verdict #6): measure names are a CATEGORICAL
      // code vocabulary (BEVSTD, FLAECHE, …) — a lexicographic range
      // over them has no query meaning, so accepting one here would
      // add reader-side string-compare cost for zero pruning value.
      // Do not "complete" this list with range cases; equality/IN is
      // the whole useful algebra for this column.
      case f @ EqualTo("measure", _: String) => f: Filter
      case f @ In("measure", _) => f: Filter
    }.toSeq
    filters
  }
  override def pushedFilters(): Array[Filter] =
    (cubeFilters ++ rowFilters).toArray
  override def build(): Scan =
    new CubeScan(paths, required, cubeFilters, rowFilters)
}

private[sources] class CubeScan(paths: Seq[String], required: StructType,
    cubeFilters: Seq[Filter], rowFilters: Seq[Filter]) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"genesis-cube ${paths.size} path(s), ReadSchema: ${required.simpleString}" +
      (if (cubeFilters.nonEmpty || rowFilters.nonEmpty)
        s", PushedFilters: ${(cubeFilters ++ rowFilters).mkString("[", ", ", "]")}"
      else "")

  /** A file survives when its cube name (basename minus extension)
    * satisfies every pushed `cube` predicate. */
  private def keepFile(name: String): Boolean = {
    val cube = {
      val dot = name.lastIndexOf('.')
      if (dot > 0) name.substring(0, dot) else name
    }
    cubeFilters.forall {
      case EqualTo(_, v: String) => cube == v
      case In(_, vs) => vs.contains(cube)
      case _ => true
    }
  }

  /** Driver side: expand directories to files — a filesystem LISTING,
    * not a Spark job; one [[InputPartition]] per surviving cube file.
    */
  override def planInputPartitions(): Array[InputPartition] = {
    val conf = new Configuration()
    val files = paths.flatMap { p =>
      val path = new Path(p)
      val fs = path.getFileSystem(conf)
      val st = fs.getFileStatus(path)
      if (st.isDirectory)
        fs.listStatus(path).toSeq.filter(_.isFile).map(_.getPath)
      else Seq(path)
    }.filter(f => keepFile(f.getName)).map(_.toString).sorted
    files.map(f => CubeFilePartition(f): InputPartition).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new CubeReaderFactory(required, rowFilters)
}

private[sources] case class CubeFilePartition(path: String)
    extends InputPartition

private[sources] class CubeReaderFactory(required: StructType,
    rowFilters: Seq[Filter]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new CubeFileReader(partition.asInstanceOf[CubeFilePartition].path,
      required, rowFilters)
}

/** Executor-side reader for one cube file: pass 1 collects the K/D
  * header-candidate lines and derives the [[CubeParser.Layout]]
  * (shape-aware — a data row whose first axis value collides with a
  * header tag is resolved exactly like the Column parser does); pass 2
  * streams data records, emitting one row per (record, measure).
  * Two passes over a single cube file are cheap (cubes are
  * per-download sized) and keep memory at one line.
  */
private[sources] class CubeFileReader(path: String, required: StructType,
    rowFilters: Seq[Filter]) extends PartitionReader[InternalRow] {

  private val hPath = new Path(path)
  private val fs = hPath.getFileSystem(new Configuration())
  private val cubeName = {
    val base = hPath.getName
    val dot = base.lastIndexOf('.')
    if (dot > 0) base.substring(0, dot) else base
  }

  private def open() = new java.io.BufferedReader(
    new java.io.InputStreamReader(fs.open(hPath),
      java.nio.charset.StandardCharsets.UTF_8))

  private val layout: CubeParser.Layout = {
    val br = open()
    try {
      val hdr = Iterator.continually(br.readLine()).takeWhile(_ != null)
        .filter(l => l.startsWith("K;") ||
          CubeParser.headerTags.exists(t => l.startsWith(s"D;$t;")))
        .map(_.split(";", -1).toSeq).toSeq
      CubeParser.layoutFromHeader(hdr, path, cubeName)
    } finally br.close()
  }

  private val nAxes = layout.axes.size
  private val nMeasures = layout.measures.size
  private val expectedLen = 2 + nAxes + 2 * nMeasures
  private val timeRe = "^-?[0-9]+$".r
  private val nullValues = CubeParser.nullValues.toSet
  // dims = non-region axes, name-sorted (matches CubePipeline.normalized's
  // sorted dim_* fold) with their 0-based token slots (slot 0 = "D").
  private val dimAxes: Seq[(String, Int)] = layout.axes.zipWithIndex.tail
    .map { case (a, i) => (a, i + 1) }.sortBy(_._1)

  /** Pushed `time` predicates as one conjunction over the parsed time
    * token — evaluated BEFORE any row is built, so a year-filtered
    * query never materializes off-year records. Filters stay residual
    * above the scan, so an unhandled shape here is only a missed
    * optimization, never a correctness risk. */
  private def timeOk(t: Int): Boolean = rowFilters.forall {
    case EqualTo("time", v: Int) => t == v
    case In("time", vs) => vs.exists { case v: Int => t == v; case _ => false }
    case GreaterThan("time", v: Int) => t > v
    case GreaterThanOrEqual("time", v: Int) => t >= v
    case LessThan("time", v: Int) => t < v
    case LessThanOrEqual("time", v: Int) => t <= v
    case _ => true
  }

  /** Measure slots surviving the pushed `measure` predicates — a
    * record emits only these, computed once per file. */
  private val measureSlots: Seq[Int] = {
    def ok(m: String): Boolean = rowFilters.forall {
      case EqualTo("measure", v: String) => m == v
      case In("measure", vs) => vs.contains(m)
      case _ => true
    }
    (0 until nMeasures).filter(i => ok(layout.measures(i)))
  }

  private val data = open()
  private var pending: Iterator[InternalRow] = Iterator.empty
  private var current: InternalRow = _
  private var exhausted = false

  /** Same predicate as `CubeParser.parse`'s data filter. */
  private def isData(toks: Array[String]): Boolean =
    toks.length >= 2 && toks(0) == "D" &&
      (!CubeParser.headerTags.contains(toks(1)) ||
        (toks.length == expectedLen &&
          timeRe.matches(toks(nAxes + 1))))

  private def rowsOf(toks: Array[String]): Iterator[InternalRow] = {
    val region = UTF8String.fromString(toks(1))
    val time = toks(nAxes + 1).toInt
    val dims = new ArrayBasedMapData(
      new GenericArrayData(dimAxes.map(d =>
        UTF8String.fromString(d._1): AnyRef).toArray[Any]),
      new GenericArrayData(dimAxes.map(d =>
        UTF8String.fromString(toks(d._2)): AnyRef).toArray[Any]))
    measureSlots.iterator.map { i =>
      val v = toks(nAxes + 2 + 2 * i)
      val q = toks(nAxes + 3 + 2 * i)
      val row = new GenericInternalRow(required.length)
      var j = 0
      while (j < required.length) {
        row.update(j, required.fields(j).name match {
          case "cube" => UTF8String.fromString(layout.cube)
          case "region" => region
          case "time" => time
          case "measure" => UTF8String.fromString(layout.measures(i))
          // fail loudly on malformed numerics, like the ANSI cast the
          // Column parser applies — a silent null here would diverge.
          case "value" =>
            if (nullValues.contains(v)) null
            else java.lang.Double.valueOf(v.toDouble)
          case "quality" => UTF8String.fromString(q)
          case "dims" => dims
          case other => sys.error(s"genesis-cube: unknown column $other")
        })
        j += 1
      }
      row: InternalRow
    }
  }

  override def next(): Boolean = {
    while (!pending.hasNext && !exhausted) {
      val line = data.readLine()
      if (line == null) exhausted = true
      else {
        val toks = line.split(";", -1)
        if (isData(toks) && timeOk(toks(nAxes + 1).toInt))
          pending = rowsOf(toks)
      }
    }
    if (pending.hasNext) { current = pending.next(); true } else false
  }
  override def get(): InternalRow = current
  override def close(): Unit = data.close()
}
