package graft.sources

import java.io.{DataInputStream, FileInputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.util.{Map => JMap}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 reader for NumPy `.npy` arrays — the reference ships
  * its demo datasets as `.npy` loaders (data/__init__.py:6-64
  * SpottedStar / SunSpots / TSI, shapes (3, 2148) / (2, 74326) /
  * (2, 12187)), so this is the engine's ingest surface for that data.
  * The format itself is the public NEP-1 spec: magic + version +
  * python-dict header (descr / fortran_order / shape) + raw
  * little-endian payload.
  *
  * Spark-native posture:
  *  - rows are (file, row, idx, value): a k×n array flattens
  *    row-major, so the reference's `t, y, dy = SpottedStar()`
  *    unpack maps to `row` 0/1/2 and `pivot`/`filter(row=…)` joins
  *    recover the series table shape (id=file, t=row 0, y=row 1).
  *  - each file is split into fixed-size ELEMENT RANGES (one
  *    InputPartition per `SplitElems` elements), not one partition
  *    per file: elements are fixed-width, so offsets are computable
  *    and a single multi-GB array still reads at full cluster width.
  *  - column pruning (SupportsPushDownRequiredColumns) reaches the
  *    reader: a `select(value)` never materializes the file/row/idx
  *    columns per element.
  *
  * Supports 1-D and 2-D C-order arrays of '<f8', '<f4', '<i8', '<i4'
  * — the dtypes the reference's datasets use.
  */
class NpyDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "npy"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    NpyDataSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new NpyTable(properties.get("path"),
      if (schema != null) schema else NpyDataSource.schema)

  /** Writes carry the query's own schema (any row shape with a double
    * `value` column persists); reads always use the inferred 4-col
    * layout. */
  override def supportsExternalMetadata(): Boolean = true
}

object NpyDataSource {
  val schema: StructType = StructType(Seq(
    StructField("file", StringType, nullable = false),
    StructField("row", LongType, nullable = false),
    StructField("idx", LongType, nullable = false),
    StructField("value", DoubleType, nullable = false)))

  /** Elements per input partition (8 MB of f8 — parquet-row-group
    * sized so local tests exercise the multi-partition path too). */
  val SplitElems: Long = 1L << 20

  /** (dtype, nRows, nCols, payloadOffset) from the NEP-1 header. */
  def header(path: String): (String, Long, Long, Long) = {
    val in = new DataInputStream(new FileInputStream(path))
    try {
      val magic = new Array[Byte](6)
      in.readFully(magic)
      require(magic(0) == 0x93.toByte &&
        new String(magic, 1, 5, "ASCII") == "NUMPY", s"$path: not .npy")
      val major = in.readUnsignedByte(); in.readUnsignedByte()
      val hlen =
        if (major == 1) {
          val b = new Array[Byte](2); in.readFully(b)
          ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN).getShort & 0xffff
        } else {
          val b = new Array[Byte](4); in.readFully(b)
          ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN).getInt
        }
      val hdr = new Array[Byte](hlen)
      in.readFully(hdr)
      val h = new String(hdr, "ASCII")
      val descr = "'descr':\\s*'([^']+)'".r.findFirstMatchIn(h)
        .getOrElse(sys.error(s"$path: no descr")).group(1)
      val fortran = "'fortran_order':\\s*(True|False)".r.findFirstMatchIn(h)
        .getOrElse(sys.error(s"$path: no fortran_order")).group(1)
      require(fortran == "False", s"$path: fortran_order not supported")
      val shape = "'shape':\\s*\\(([^)]*)\\)".r.findFirstMatchIn(h)
        .getOrElse(sys.error(s"$path: no shape")).group(1)
      val dims = shape.split(",").map(_.trim).filter(_.nonEmpty).map(_.toLong)
      require(dims.length >= 1 && dims.length <= 2,
        s"$path: only 1-D/2-D supported, shape=($shape)")
      val (r, c) = if (dims.length == 1) (1L, dims(0)) else (dims(0), dims(1))
      val off = (if (major == 1) 10 else 12) + hlen.toLong
      (descr, r, c, off)
    } finally in.close()
  }

  def elemSize(descr: String): Int = descr match {
    case "<f8" | "<i8" => 8
    case "<f4" | "<i4" => 4
    case d => sys.error(s"unsupported npy dtype $d")
  }
}

class NpyTable(path: String, tableSchema: StructType)
    extends Table with SupportsRead with SupportsWrite {
  require(path != null, "npy source requires a path")
  override def name(): String = s"npy:$path"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.Set.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new NpyScanBuilder(path)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new NpyWriteBuilder(path, info.schema())
}

class NpyScanBuilder(path: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = NpyDataSource.schema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new NpyScan(path, required)
}

case class NpyInputPartition(path: String, descr: String, nCols: Long,
    payloadOff: Long, fromElem: Long, toElem: Long) extends InputPartition

class NpyScan(path: String, required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"npy $path ReadSchema: ${required.fieldNames.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] = {
    val f = new java.io.File(path)
    val files =
      if (f.isDirectory)
        f.listFiles().filter(_.getName.endsWith(".npy")).map(_.getPath).sorted
      else Array(path)
    files.flatMap { p =>
      val (descr, r, c, off) = NpyDataSource.header(p)
      val total = r * c
      (0L until total by NpyDataSource.SplitElems).map(s =>
        NpyInputPartition(p, descr, c, off, s,
          math.min(s + NpyDataSource.SplitElems, total)))
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new NpyReaderFactory(required)
}

class NpyReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new NpyPartitionReader(p.asInstanceOf[NpyInputPartition], required)
}

/** Streams one element range; emits only the pruned columns. */
class NpyPartitionReader(p: NpyInputPartition, required: StructType)
    extends PartitionReader[InternalRow] {
  private val esize = NpyDataSource.elemSize(p.descr)
  private val in = new DataInputStream(
    new java.io.BufferedInputStream(new FileInputStream(p.path), 1 << 16))
  in.skipNBytes(p.payloadOff + p.fromElem * esize)
  private var elem = p.fromElem
  private val fileName = UTF8String.fromString(
    new java.io.File(p.path).getName)
  private val buf = new Array[Byte](esize)
  private val bb = ByteBuffer.wrap(buf).order(ByteOrder.LITTLE_ENDIAN)
  private var current: InternalRow = _

  override def next(): Boolean = {
    if (elem >= p.toElem) return false
    in.readFully(buf)
    bb.rewind()
    val v = p.descr match {
      case "<f8" => bb.getDouble
      case "<f4" => bb.getFloat.toDouble
      case "<i8" => bb.getLong.toDouble
      case "<i4" => bb.getInt.toDouble
    }
    val vals = required.fieldNames.map {
      case "file" => fileName
      case "row" => java.lang.Long.valueOf(elem / p.nCols)
      case "idx" => java.lang.Long.valueOf(elem % p.nCols)
      case "value" => java.lang.Double.valueOf(v)
    }
    current = InternalRow.fromSeq(vals.toIndexedSeq)
    elem += 1
    true
  }

  override def get(): InternalRow = current
  override def close(): Unit = in.close()
}

// ---------------------------------------------------------------------
// Write path: each task streams its partition's `value` column as one
// 1-D '<f8' part-file (values in partition row order), committed by
// atomic rename — a directory of part .npy files round-trips through
// the reader above. The element count isn't known up front, so the
// NEP-1 header is written as a fixed-width 128-byte block and the
// shape patched in at task commit.
// ---------------------------------------------------------------------

class NpyWriteBuilder(path: String, schema: StructType) extends WriteBuilder {
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new NpyBatchWrite(path, schema)
  }
}

class NpyBatchWrite(path: String, schema: StructType) extends BatchWrite {
  private val valueOrdinal: Int = {
    val i = schema.fieldIndex("value")
    require(schema(i).dataType == DoubleType, "value must be double")
    i
  }
  override def createBatchWriterFactory(info: PhysicalWriteInfo)
      : DataWriterFactory = NpyWriterFactory(path, valueOrdinal)
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    new java.io.File(path).mkdirs()
    messages.foreach { case NpyCommit(tmp, name) =>
      val dst = new java.io.File(path, name)
      if (!new java.io.File(tmp).renameTo(dst))
        sys.error(s"npy commit: rename $tmp -> $dst failed")
    }
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach { case NpyCommit(tmp, _) =>
      new java.io.File(tmp).delete(); ()
    }
}

case class NpyCommit(tmpPath: String, finalName: String)
  extends WriterCommitMessage

case class NpyWriterFactory(path: String, valueOrdinal: Int)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : DataWriter[InternalRow] =
    new NpyDataWriter(path, partitionId, taskId, valueOrdinal)
}

class NpyDataWriter(path: String, partitionId: Int, taskId: Long,
    valueOrdinal: Int) extends DataWriter[InternalRow] {
  private val tmp = java.io.File.createTempFile(
    f"npy-part-$partitionId%05d-$taskId", ".npy.tmp")
  private val out = new java.io.BufferedOutputStream(
    new java.io.FileOutputStream(tmp), 1 << 16)
  out.write(new Array[Byte](128)) // header placeholder, patched at commit
  private val buf = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
  private var n = 0L

  override def write(record: InternalRow): Unit = {
    buf.clear()
    buf.putDouble(record.getDouble(valueOrdinal))
    out.write(buf.array())
    n += 1
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    val dict = s"{'descr': '<f8', 'fortran_order': False, 'shape': ($n,), }"
    val hlen = 118 // 10 + 118 = 128, NEP-1 64-byte aligned
    require(dict.length < hlen, s"npy header overflow at n=$n")
    val full = dict + (" " * (hlen - dict.length - 1)) + "\n"
    val hdr = ByteBuffer.allocate(128).order(ByteOrder.LITTLE_ENDIAN)
    hdr.put(0x93.toByte).put("NUMPY".getBytes("ASCII"))
      .put(1.toByte).put(0.toByte)
      .putShort(hlen.toShort).put(full.getBytes("ASCII"))
    val raf = new java.io.RandomAccessFile(tmp, "rw")
    try { raf.seek(0); raf.write(hdr.array()) } finally raf.close()
    NpyCommit(tmp.getPath, f"part-$partitionId%05d-$taskId.npy")
  }

  override def abort(): Unit = { out.close(); tmp.delete(); () }
  override def close(): Unit = ()
}
