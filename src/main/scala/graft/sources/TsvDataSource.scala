package graft.sources

import java.util.{Map => JMap}

import org.apache.hadoop.io.compress.{CompressionCodecFactory, SplittableCompressionCodec}
import org.apache.hadoop.fs.Path
import org.apache.hadoop.mapreduce.TaskAttemptID
import org.apache.hadoop.mapreduce.lib.input.{FileSplit, LineRecordReader}
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

/** DataSource V2 implementation of the reference's `title \t body`
  * line format — `spark.read.format("graft-tsv").load(path)` — the
  * connector-API form of [[Tsv.readDocuments]] (same first-tab split,
  * blank lines dropped, tab-less line = empty body). Exists to make
  * the reference's input format a FIRST-CLASS table source: schema is
  * declared (no inference pass), and the scan plans one
  * [[InputPartition]] per byte range, so at 100 TB every executor
  * reads only its own split — Hadoop's `LineRecordReader` supplies
  * the standard boundary contract (a split skips its leading partial
  * line and reads past its end to finish the last one, so every line
  * is read exactly once across splits).
  *
  * Split size comes from the `maxSplitBytes` option (default 128 MB),
  * mirroring `spark.sql.files.maxPartitionBytes`' role for the
  * built-in file sources.
  *
  * The session's Hadoop configuration (every `spark.hadoop.*` key:
  * object-store credentials, endpoints, fs.* tuning) is captured at
  * planning time and shipped inside each partition via Spark's
  * [[SerializableConfiguration]], so executor-side readers open the
  * file with the SAME configuration the driver listed it with — a
  * fresh `new Configuration()` on the executor would silently drop
  * cluster auth and fail on s3a://-style paths.
  *
  * Compressed inputs follow the same rules as Hadoop's
  * FileInputFormat (the reference's input path, App.scala:248): a
  * file whose suffix maps to a non-splittable codec (.gz) gets ONE
  * whole-file split — byte-splitting mid-gzip-stream would produce
  * garbage — and `LineRecordReader` decompresses it transparently;
  * splittable codecs (.bz2) and plain text keep byte-range splits.
  */
class TsvDocsSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-tsv"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TsvDocsSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table = {
    val path = properties.get("path")
    require(path != null, "graft-tsv requires a load path")
    new TsvDocsTable(path,
      Option(properties.get("maxSplitBytes")).map(_.toLong)
        .getOrElse(128L * 1024 * 1024))
  }
}

object TsvDocsSource {
  val Schema: StructType = StructType(Seq(
    StructField("title", StringType, nullable = false),
    StructField("text", StringType, nullable = false)))
}

private[sources] class TsvDocsTable(path: String, maxSplitBytes: Long)
    extends Table with SupportsRead {
  override def name(): String = s"graft-tsv($path)"
  override def schema(): StructType = TsvDocsSource.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new TsvScan(path, maxSplitBytes)
    }
}

private[sources] class TsvScan(path: String, maxSplitBytes: Long)
    extends Scan with Batch {
  override def readSchema(): StructType = TsvDocsSource.Schema
  override def toBatch: Batch = this
  override def description(): String = s"graft-tsv $path"

  /** One partition per ≤ maxSplitBytes byte range of each data file —
    * driver-side listing only; no data is read at planning time.
    * Non-splittable-codec files (suffix-matched, e.g. .gz) get a
    * single whole-file split regardless of size.
    */
  override def planInputPartitions(): Array[InputPartition] = {
    val conf = SparkSession.active.sparkContext.hadoopConfiguration
    val serConf = new SerializableConfiguration(conf)
    val codecs = new CompressionCodecFactory(conf)
    val root = new Path(path)
    val fs = root.getFileSystem(conf)
    val files =
      if (fs.getFileStatus(root).isDirectory)
        fs.listStatus(root).filter(s => s.isFile &&
          !s.getPath.getName.startsWith("_") && !s.getPath.getName.startsWith("."))
      else Array(fs.getFileStatus(root))
    files.flatMap { f =>
      val codec = codecs.getCodec(f.getPath)
      val splittable = codec == null || codec.isInstanceOf[SplittableCompressionCodec]
      if (!splittable)
        Seq(TsvInputPartition(f.getPath.toString, 0L, f.getLen, serConf))
      else
        (0L until math.max(f.getLen, 1L) by maxSplitBytes).map { start =>
          TsvInputPartition(f.getPath.toString, start,
            math.min(maxSplitBytes, f.getLen - start), serConf)
        }
    }.toArray[InputPartition]
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] =
        new TsvPartitionReader(p.asInstanceOf[TsvInputPartition])
    }
}

/** `conf` is the driver's Hadoop configuration riding along to the
  * executor (Java-serialized by [[SerializableConfiguration]]).
  */
private[sources] case class TsvInputPartition(file: String, start: Long,
    length: Long, conf: SerializableConfiguration) extends InputPartition

/** Per-split reader on Hadoop's LineRecordReader (the split-boundary
  * and codec contracts live there); the first-tab split happens per
  * line here. Initialized with the DRIVER's Hadoop configuration from
  * the partition, never a default `new Configuration()`.
  */
private[sources] class TsvPartitionReader(p: TsvInputPartition)
    extends PartitionReader[InternalRow] {
  // mirror TextInputFormat.createRecordReader: the custom record
  // delimiter rides in the conf and goes to the reader's constructor
  private val delimiter =
    Option(p.conf.value.get("textinputformat.record.delimiter"))
      .map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8)).orNull
  private val reader = new LineRecordReader(delimiter)
  reader.initialize(
    new FileSplit(new Path(p.file), p.start, p.length, Array.empty[String]),
    new TaskAttemptContextImpl(p.conf.value, new TaskAttemptID()))

  private var row: InternalRow = _

  override def next(): Boolean = {
    while (reader.nextKeyValue()) {
      val line = reader.getCurrentValue.toString
      if (line.nonEmpty) {
        val i = line.indexOf('\t')
        val (title, body) =
          if (i < 0) (line, "") else (line.substring(0, i), line.substring(i + 1))
        row = new GenericInternalRow(Array[Any](
          UTF8String.fromString(title), UTF8String.fromString(body)))
        return true
      }
    }
    false
  }

  override def get(): InternalRow = row
  override def close(): Unit = reader.close()
}
