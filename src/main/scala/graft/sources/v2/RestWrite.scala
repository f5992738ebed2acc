package graft.sources.v2

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._

/** DSv2 batch WRITE path for the `graft-rest` connector — the
  * reference's publish side (batched applyEdits uploads,
  * `etl/loaders/sde_loader.py`-style edit sessions) re-expressed as
  * Spark's two-phase commit protocol:
  *
  *  - each task serializes its partition into ONE applyEdits batch file
  *    under `<path>/.staging/` (executor-local work, no coordination);
  *  - task `commit()` returns the staged name as its commit message —
  *    a failed/speculative task `abort()`s and deletes its file, so
  *    half-written batches never publish;
  *  - driver `commit(messages)` atomically renames every staged batch
  *    into `<path>/edits/` and stamps a `_SUCCESS` manifest (edit
  *    count + batch list) — the all-or-nothing edit session.
  *
  * At cluster scale this is the shape that matters: 1000 executors
  * stage in parallel, the driver publishes once, retries are free
  * (staging is keyed by task+attempt), and readers only ever observe
  * fully-committed edit sessions. The zero-egress environment spools
  * batches to a directory; swapping the spool for an HTTP POST leaves
  * the commit protocol untouched.
  */
class RestWriteBuilder(path: String, info: LogicalWriteInfo)
  extends WriteBuilder with SupportsTruncate {

  private var doTruncate = false

  override def truncate(): WriteBuilder = { doTruncate = true; this }

  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new RestBatchWrite(path, info.schema(), doTruncate)
  }
}

final case class RestCommitMessage(stagedName: String, rows: Long)
  extends WriterCommitMessage

class RestBatchWrite(path: String, schema: StructType, truncate: Boolean)
  extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new RestWriterFactory(path, schema)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val editsDir = new File(path, "edits")
    if (truncate) {
      Option(editsDir.listFiles()).getOrElse(Array.empty).foreach(_.delete())
    }
    editsDir.mkdirs()
    val msgs = messages.collect { case m: RestCommitMessage => m }
    msgs.foreach { m =>
      Files.move(
        Paths.get(path, ".staging", m.stagedName),
        Paths.get(editsDir.getPath, m.stagedName),
        StandardCopyOption.ATOMIC_MOVE)
    }
    val manifest = new ObjectMapper().createObjectNode()
    manifest.put("n_edits", msgs.map(_.rows).sum)
    manifest.put("n_batches", msgs.length)
    val arr = manifest.putArray("batches")
    msgs.map(_.stagedName).sorted.foreach(arr.add)
    Files.write(Paths.get(editsDir.getPath, "_SUCCESS"),
      manifest.toString.getBytes(StandardCharsets.UTF_8))
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.collect { case m: RestCommitMessage => m }.foreach { m =>
      Files.deleteIfExists(Paths.get(path, ".staging", m.stagedName))
    }
}

class RestWriterFactory(path: String, schema: StructType)
  extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new RestEditsWriter(path, schema, partitionId, taskId)
}

/** Buffers one partition as applyEdits JSON; the file materializes only
  * on task commit (write-then-rename inside .staging keeps even the
  * staging dir free of torn files).
  */
class RestEditsWriter(path: String, schema: StructType, partitionId: Int, taskId: Long)
  extends DataWriter[InternalRow] {

  private val mapper = new ObjectMapper()
  private val edits: ArrayNode = mapper.createArrayNode()

  override def write(row: InternalRow): Unit = {
    val o = mapper.createObjectNode()
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      if (row.isNullAt(i)) o.putNull(f.name)
      else addField(o, f.name, f.dataType, row, i)
    }
    edits.add(o)
    ()
  }

  private def addField(o: ObjectNode, name: String, dt: DataType, row: InternalRow, i: Int): Unit =
    dt match {
      case IntegerType => o.put(name, row.getInt(i)); ()
      case LongType    => o.put(name, row.getLong(i)); ()
      case DoubleType  => o.put(name, row.getDouble(i)); ()
      case BooleanType => o.put(name, row.getBoolean(i)); ()
      case StringType  => o.put(name, row.getUTF8String(i).toString); ()
      case m: MapType if m.keyType == StringType && m.valueType == StringType =>
        val sub  = o.putObject(name)
        val data = row.getMap(i)
        var j = 0
        while (j < data.numElements()) {
          sub.put(
            data.keyArray().getUTF8String(j).toString,
            data.valueArray().getUTF8String(j).toString)
          j += 1
        }
      case other =>
        throw new UnsupportedOperationException(
          s"graft-rest write: unsupported field type $other for '$name'")
    }

  override def commit(): WriterCommitMessage = {
    val name    = f"applyEdits-p$partitionId%05d-t$taskId.json"
    val staging = new File(path, ".staging")
    staging.mkdirs()
    val batch = mapper.createObjectNode()
    batch.put("partition", partitionId)
    batch.set[ObjectNode]("edits", edits)
    val tmp = Paths.get(staging.getPath, s"$name.tmp")
    Files.write(tmp, batch.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, Paths.get(staging.getPath, name), StandardCopyOption.ATOMIC_MOVE)
    RestCommitMessage(name, edits.size().toLong)
  }

  override def abort(): Unit = {
    val name = f"applyEdits-p$partitionId%05d-t$taskId.json"
    Files.deleteIfExists(Paths.get(path, ".staging", name))
    ()
  }

  override def close(): Unit = ()
}
