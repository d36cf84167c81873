package graft.streaming

import java.util

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `tail -f` as a Structured Streaming source — the literal S1/S2 parity
  * path (reference: core/sensor.go:51 open+seek loop, :60-68 truncation
  * reset, :71 byte-offset resume).
  *
  * The directory file-stream source in [[Ingest]] discovers new FILES;
  * bytes appended to an already-read file are never re-scanned. This
  * source closes that gap: its streaming Offset is a per-file map of
  * LINE-ALIGNED byte offsets, so
  *  - appends to a watched file are picked up from the recorded offset
  *    (S1 intra-file tailing),
  *  - a file whose length shrinks below its recorded offset is re-read
  *    from byte 0 (S2 rotation/truncation reset — the same size-based
  *    heuristic the reference uses; a rotation that recreates the file
  *    at a LARGER size is indistinguishable by size, exactly as in the
  *    reference),
  *  - offsets live in the checkpoint WAL, so a restart resumes without
  *    re-ingesting (S3/S4), and replaying a committed (start, end]
  *    range re-reads exactly the same byte slices — exactly-once into
  *    idempotent sinks (ST6).
  *
  * Offsets only ever sit at '\n' boundaries: `latestOffset` scans the
  * appended region for the LAST newline and stops there, so a half
  * written line (the reference's bufio partial-read case) stays out of
  * the batch until its terminator lands.
  *
  * Scale contract: this is a TAIL source — a handful of live log files
  * per node, kilobytes per trigger — not a bulk loader. The driver
  * reads each appended region once to find line boundaries (exactly
  * the bytes a single tailing process would read); executors then read
  * their `[start, end)` slices via positioned reads. Slices are capped
  * at 2 GiB per file per batch (a growing file beyond that should be
  * rotated or bulk-loaded; the require names the limit). For bulk
  * directory ingest at scale, use the directory source in [[Ingest]].
  *
  * Usage: `spark.readStream.format("tail-file").load(path)` where path
  * is a file, directory, or glob (directories list their direct files).
  */
class TailFileSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "tail-file"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TailFileSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new TailTable(Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException(
        "tail-file source requires a path: .load(<file|dir|glob>)")))
}

object TailFileSource {
  val Schema: StructType = StructType(Seq(StructField("value", StringType)))
}

class TailTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"tail-file($path)"
  override def schema(): StructType = TailFileSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = TailFileSource.Schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new TailMicroBatchStream(path)
        override def description(): String = s"tail-file($path)"
      }
    }
}

/** Per-file line-aligned byte offsets. JSON shape:
  * `{"files":{"<path>":<offset>,...}}` via json4s (the engine treats it
  * as opaque text in the offset log). */
case class TailOffset(files: Map[String, Long]) extends Offset {
  import org.json4s.JsonDSL._
  import org.json4s.jackson.JsonMethods._
  override def json(): String =
    compact(render("files" -> files.toSeq.sortBy(_._1).toMap))
}

object TailOffset {
  import org.json4s._
  import org.json4s.jackson.JsonMethods._
  def fromJson(s: String): TailOffset = {
    val files = (parse(s) \ "files") match {
      case JObject(fields) => fields.map {
        case (k, JInt(v)) => k -> v.toLong
        case (k, JLong(v)) => k -> v
        case (k, other) => throw new IllegalArgumentException(
          s"bad tail offset for $k: $other")
      }.toMap
      case _ => Map.empty[String, Long]
    }
    TailOffset(files)
  }
}

class TailMicroBatchStream(pathSpec: String)
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  @transient private lazy val fs =
    new Path(pathSpec).getFileSystem(new org.apache.hadoop.conf.Configuration())

  /** Driver-side cache of the last line-aligned offsets; purely an
    * optimization (bounds the newline scan to the appended region). On
    * restart it is empty and the scan restarts from byte 0 of each file
    * — same boundaries, one extra driver read, no correctness impact. */
  private var known: Map[String, Long] = Map.empty

  private def listFiles(): Seq[(String, Long)] = {
    val statuses = Option(fs.globStatus(new Path(pathSpec)))
      .map(_.toSeq).getOrElse(Seq.empty)
      .flatMap(s =>
        if (s.isDirectory) fs.listStatus(s.getPath).toSeq else Seq(s))
      .filter(_.isFile)
    statuses.map(s => (s.getPath.toString, s.getLen))
  }

  /** Largest line-aligned offset in [from, len): position just past the
    * last '\n', or `from` if the appended region holds no terminator. */
  private def lineAlignedEnd(path: String, from: Long, len: Long): Long = {
    if (len <= from) return from
    val in = fs.open(new Path(path))
    try {
      in.seek(from)
      val buf = new Array[Byte](65536)
      var lastNl = -1L
      var pos = from
      var read = in.read(buf)
      while (read > 0 && pos < len) {
        val take = math.min(read.toLong, len - pos).toInt
        var i = 0
        while (i < take) {
          if (buf(i) == '\n') lastNl = pos + i
          i += 1
        }
        pos += take
        read = if (pos < len) in.read(buf) else -1
      }
      if (lastNl >= 0) lastNl + 1 else from
    } finally in.close()
  }

  override def initialOffset(): Offset = TailOffset(Map.empty)

  private def computeLatest(): TailOffset = {
    val next = listFiles().map { case (p, len) =>
      val prev0 = known.getOrElse(p, 0L)
      // size below our high-water mark = truncate/rotate: reset (S2)
      val prev = if (len < prev0) 0L else prev0
      p -> lineAlignedEnd(p, prev, len)
    }.toMap
    known = next
    TailOffset(next)
  }

  override def latestOffset(): Offset = computeLatest()

  /** Trigger.AvailableNow support: the target is pinned once at query
    * start; the run drains up to it and stops, ignoring concurrent
    * appends (they belong to the next run). */
  private var availableNowTarget: Option[TailOffset] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(computeLatest())
  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()
  override def latestOffset(start: Offset, limit: ReadLimit): Offset =
    availableNowTarget.getOrElse(computeLatest())

  override def deserializeOffset(json: String): Offset = TailOffset.fromJson(json)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[TailOffset].files
    val e = end.asInstanceOf[TailOffset].files
    e.toSeq.sortBy(_._1).flatMap { case (p, endOff) =>
      val s0 = s.getOrElse(p, 0L)
      // end below start = the file was truncated between the two
      // offsets: the batch re-reads the fresh content from byte 0.
      val startOff = if (endOff < s0) 0L else s0
      if (endOff > startOff) {
        require(endOff - startOff <= Int.MaxValue,
          s"tail-file: $p grew ${endOff - startOff} bytes in one batch; " +
            "cap is 2 GiB — rotate the file or bulk-load the backlog")
        Some(TailInputPartition(p, startOff, endOff))
      } else None
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new TailReaderFactory

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

case class TailInputPartition(path: String, start: Long, end: Long)
  extends InputPartition

class TailReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val tp = p.asInstanceOf[TailInputPartition]
    new PartitionReader[InternalRow] {
      private val fs = new Path(tp.path)
        .getFileSystem(new org.apache.hadoop.conf.Configuration())
      private val bytes = {
        val buf = new Array[Byte]((tp.end - tp.start).toInt)
        val in = fs.open(new Path(tp.path))
        try in.readFully(tp.start, buf) finally in.close()
        buf
      }
      private var cursor = 0
      private var line: UTF8String = _

      // The slice is line-aligned by construction (both offsets sit just
      // past a '\n'), so every emitted line is complete; like the text
      // source, empty lines yield empty rows, and a trailing '\r' is
      // stripped for CRLF logs.
      override def next(): Boolean = {
        if (cursor >= bytes.length) return false
        var nl = cursor
        while (nl < bytes.length && bytes(nl) != '\n') nl += 1
        val endIdx = if (nl > cursor && bytes(nl - 1) == '\r') nl - 1 else nl
        line = UTF8String.fromBytes(bytes, cursor, endIdx - cursor)
        cursor = nl + 1
        true
      }

      override def get(): InternalRow = new GenericInternalRow(Array[Any](line))
      override def close(): Unit = ()
    }
  }
}
