package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.channels.Channels
import java.nio.charset.StandardCharsets.UTF_8

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector._
import org.apache.arrow.vector.ipc.{ArrowStreamReader, ArrowStreamWriter}
import org.apache.arrow.vector.types.FloatingPointPrecision
import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema => ArrowSchema}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** In-memory Arrow interop — the reference's `to_arrow`/`from_arrow`
  * surface (string_column.py:76-102, numeric_column.py:138-159,
  * utils.py:3-10) re-expressed for Spark: a DataFrame round-trips
  * through the Arrow IPC *stream* format, the unit every Arrow
  * consumer (pyarrow, pandas, torch dataloaders, DuckDB) ingests
  * zero-copy.
  *
  * Scope note: like the reference's, this is a deliberately
  * DRIVER-SIDE interop verb — the reference materializes whole columns
  * into pyarrow buffers; the Spark-scale path for bulk data exchange
  * stays Parquet (Arrow-compatible on disk, see [[Tables]]). Use this
  * to hand a bounded result set (a scored sample, a feature frame) to
  * a local Arrow consumer without a filesystem hop. Built on the
  * public arrow-vector API only (Spark's own ArrowConverters is
  * private[sql]).
  */
object ArrowInterop {

  private[sources] def toArrowType(dt: DataType): ArrowType = dt match {
    case BooleanType => ArrowType.Bool.INSTANCE
    case IntegerType => new ArrowType.Int(32, true)
    case LongType    => new ArrowType.Int(64, true)
    case FloatType   => new ArrowType.FloatingPoint(FloatingPointPrecision.SINGLE)
    case DoubleType  => new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE)
    case StringType  => ArrowType.Utf8.INSTANCE
    case other => throw new IllegalArgumentException(
      s"ArrowInterop supports the reference column types (bool/int/long/float/double/string); got $other")
  }

  private[sources] def fromArrowType(t: ArrowType): DataType = t match {
    case _: ArrowType.Bool => BooleanType
    case i: ArrowType.Int if i.getBitWidth == 32 => IntegerType
    case i: ArrowType.Int if i.getBitWidth == 64 => LongType
    case f: ArrowType.FloatingPoint if f.getPrecision == FloatingPointPrecision.SINGLE => FloatType
    case f: ArrowType.FloatingPoint if f.getPrecision == FloatingPointPrecision.DOUBLE => DoubleType
    case _: ArrowType.Utf8 => StringType
    case other => throw new IllegalArgumentException(s"unsupported Arrow type $other")
  }

  /** Serialize the DataFrame to one Arrow IPC stream (schema + one
    * record batch), preserving null masks. Materializes on the driver
    * by design — see the scope note above.
    */
  def toArrowBytes(df: DataFrame): Array[Byte] = {
    val schema = df.schema
    val rows = df.collect()
    val allocator = new RootAllocator(Long.MaxValue)
    val fields = schema.fields.map { f =>
      new Field(f.name, new FieldType(f.nullable, toArrowType(f.dataType), null), null)
    }.toSeq.asJava
    val root = VectorSchemaRoot.create(new ArrowSchema(fields), allocator)
    try {
      root.allocateNew()
      var c = 0
      while (c < schema.length) {
        val vec = root.getVector(c)
        var i = 0
        while (i < rows.length) {
          val row = rows(i)
          if (row.isNullAt(c)) vec match {
            case v: BitVector     => v.setNull(i)
            case v: IntVector     => v.setNull(i)
            case v: BigIntVector  => v.setNull(i)
            case v: Float4Vector  => v.setNull(i)
            case v: Float8Vector  => v.setNull(i)
            case v: VarCharVector => v.setNull(i)
          } else vec match {
            case v: BitVector     => v.setSafe(i, if (row.getBoolean(c)) 1 else 0)
            case v: IntVector     => v.setSafe(i, row.getInt(c))
            case v: BigIntVector  => v.setSafe(i, row.getLong(c))
            case v: Float4Vector  => v.setSafe(i, row.getFloat(c))
            case v: Float8Vector  => v.setSafe(i, row.getDouble(c))
            case v: VarCharVector => v.setSafe(i, row.getString(c).getBytes(UTF_8))
          }
          i += 1
        }
        c += 1
      }
      root.setRowCount(rows.length)
      val out = new ByteArrayOutputStream()
      val writer = new ArrowStreamWriter(root, null, Channels.newChannel(out))
      writer.start(); writer.writeBatch(); writer.end(); writer.close()
      out.toByteArray
    } finally {
      root.close()
      allocator.close()
    }
  }

  /** Rehydrate an Arrow IPC stream (any number of batches) into a
    * DataFrame, preserving schema, nullability and null masks.
    */
  def fromArrowBytes(bytes: Array[Byte], spark: SparkSession): DataFrame = {
    val allocator = new RootAllocator(Long.MaxValue)
    val reader = new ArrowStreamReader(new ByteArrayInputStream(bytes), allocator)
    try {
      val root = reader.getVectorSchemaRoot
      val sparkSchema = StructType(root.getSchema.getFields.asScala.toSeq.map { f =>
        StructField(f.getName, fromArrowType(f.getFieldType.getType), f.isNullable)
      })
      val rows = ArrayBuffer.empty[Row]
      while (reader.loadNextBatch()) {
        var i = 0
        while (i < root.getRowCount) {
          rows += Row.fromSeq((0 until sparkSchema.length).map { c =>
            val vec = root.getVector(c)
            if (vec.isNull(i)) null
            else vec match {
              case v: BitVector     => v.get(i) == 1
              case v: IntVector     => v.get(i)
              case v: BigIntVector  => v.get(i)
              case v: Float4Vector  => v.get(i)
              case v: Float8Vector  => v.get(i)
              case v: VarCharVector => new String(v.get(i), UTF_8)
            }
          })
          i += 1
        }
      }
      spark.createDataFrame(rows.asJava, sparkSchema)
    } finally {
      reader.close()
      allocator.close()
    }
  }
}
