package graft.functions

import java.io.ByteArrayOutputStream

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{BinaryDecoder, BinaryEncoder, DecoderFactory, EncoderFactory}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import scala.jdk.CollectionConverters._

/** Avro binary serde as native Catalyst expressions.
  *
  * The runtime ships avro-core but not the `spark-avro` module, so the
  * reference's serialize/deserialize operators (reference:
  * aplicacoes/ProdutorAvro.java:59-70 via Confluent KafkaAvroSerializer;
  * aplicacoes/ConsumidorAvro.java:86-96) are re-expressed here as
  * expressions over `org.apache.avro` directly. Per-task state (datum
  * writer/reader, reused encoder/decoder, output buffer) lives in
  * `@transient lazy val`s: each Spark task deserializes its own copy of
  * the expression tree, so the mutable buffers are task-local.
  *
  * Only the types the payload schema needs are supported:
  * string/long/int/double/float/boolean/bytes/array/record — see
  * SchemaDef.mensagemAvroJson.
  */
object AvroSchemaMap {

  /** Map an Avro schema to the equivalent Spark type (subset). */
  def toSparkType(schema: Schema): DataType = schema.getType match {
    case Schema.Type.STRING  => StringType
    case Schema.Type.LONG    => LongType
    case Schema.Type.INT     => IntegerType
    case Schema.Type.DOUBLE  => DoubleType
    case Schema.Type.FLOAT   => FloatType
    case Schema.Type.BOOLEAN => BooleanType
    case Schema.Type.BYTES   => BinaryType
    case Schema.Type.ARRAY =>
      ArrayType(toSparkType(schema.getElementType), containsNull = false)
    case Schema.Type.RECORD =>
      StructType(schema.getFields.asScala.toSeq.map { f =>
        StructField(f.name(), toSparkType(f.schema()), nullable = false)
      })
    case t => throw new IllegalArgumentException(s"unsupported avro type: $t")
  }

  /** Catalyst value -> Avro datum, driven by both type systems. */
  def toAvroDatum(value: Any, dt: DataType, schema: Schema): AnyRef = (dt, value) match {
    case (_, null)            => null
    case (StringType, v: UTF8String) => v.toString
    case (BinaryType, v: Array[Byte]) => java.nio.ByteBuffer.wrap(v)
    case (ArrayType(et, _), v: ArrayData) =>
      val es = schema.getElementType
      val n = v.numElements()
      val out = new java.util.ArrayList[AnyRef](n)
      var i = 0
      while (i < n) { out.add(toAvroDatum(v.get(i, et), et, es)); i += 1 }
      out
    case (st: StructType, row: InternalRow) =>
      val rec = new GenericData.Record(schema)
      var i = 0
      while (i < st.length) {
        val f = st(i)
        rec.put(i, toAvroDatum(row.get(i, f.dataType), f.dataType, schema.getFields.get(i).schema()))
        i += 1
      }
      rec
    case (_, v) => v.asInstanceOf[AnyRef] // long/int/double/float/boolean box as-is
  }

  /** Avro datum -> Catalyst value. */
  def toCatalyst(value: AnyRef, dt: DataType): Any = (dt, value) match {
    case (_, null)        => null
    case (StringType, v)  => UTF8String.fromString(v.toString) // handles Utf8
    case (BinaryType, v: java.nio.ByteBuffer) =>
      val b = new Array[Byte](v.remaining()); v.duplicate().get(b); b
    case (ArrayType(et, _), v: java.util.Collection[_]) =>
      val out = new Array[Any](v.size())
      var i = 0
      val it = v.iterator()
      while (it.hasNext) { out(i) = toCatalyst(it.next().asInstanceOf[AnyRef], et); i += 1 }
      new GenericArrayData(out)
    case (st: StructType, rec: GenericRecord) =>
      val out = new Array[Any](st.length)
      var i = 0
      while (i < st.length) { out(i) = toCatalyst(rec.get(i), st(i).dataType); i += 1 }
      InternalRow.fromSeq(out.toIndexedSeq)
    case (_, v) => v
  }
}

/** struct -> Avro binary (single-record, no container file / header).
  *
  * Encodes STRAIGHT from Catalyst's InternalRow into the Avro
  * BinaryEncoder — no intermediate GenericRecord, no boxing; Avro
  * binary encoding is deterministic given (schema, values), so the
  * bytes are identical to the GenericDatumWriter route (asserted in
  * CoreSpec via the committed fixture's stored byte sizes and the
  * round-trip through the generic-reader FromAvro). */
@ExpressionDescription(usage = "graft_to_avro(struct) - Avro-binary encode a struct")
case class ToAvro(child: Expression, schemaJson: String)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = child.nullable

  @transient private lazy val avroSchema = new Schema.Parser().parse(schemaJson)
  @transient private lazy val structType = child.dataType.asInstanceOf[StructType]
  @transient private lazy val baos = new ByteArrayOutputStream(4096)
  @transient private var encoder: BinaryEncoder = _

  /** Fail at ANALYSIS when the input struct doesn't match the schema —
    * a mismatched struct would otherwise silently emit truncated Avro
    * bytes (SQL users hit this via graft_to_avro). */
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val expected = AvroSchemaMap.toSparkType(new Schema.Parser().parse(schemaJson))
    def compatible(a: DataType, b: DataType): Boolean = (a, b) match {
      case (x: StructType, y: StructType) =>
        x.length == y.length && x.fields.zip(y.fields).forall { case (f, g) =>
          f.name == g.name && compatible(f.dataType, g.dataType)
        }
      case (ArrayType(x, _), ArrayType(y, _)) => compatible(x, y)
      case (x, y) => x == y
    }
    if (compatible(child.dataType, expected))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_to_avro input ${child.dataType.simpleString} does not match the " +
          s"Avro schema's ${expected.simpleString}")
  }

  private def writeValue(value: Any, dt: DataType, schema: Schema,
      enc: BinaryEncoder): Unit = (dt: @unchecked) match {
    // the payload schema has no nullable/union fields, so a null here
    // is caller error — fail with the field type instead of the opaque
    // NullPointerException the raw cast below would throw
    case _ if value == null =>
      throw new IllegalArgumentException(
        s"graft_to_avro: null value for a non-nullable ${dt.simpleString} field — " +
          "the Avro payload schema declares no union/nullable fields")
    case StringType  => enc.writeString(value.asInstanceOf[UTF8String].toString)
    case LongType    => enc.writeLong(value.asInstanceOf[Long])
    case IntegerType => enc.writeInt(value.asInstanceOf[Int])
    case DoubleType  => enc.writeDouble(value.asInstanceOf[Double])
    case FloatType   => enc.writeFloat(value.asInstanceOf[Float])
    case BooleanType => enc.writeBoolean(value.asInstanceOf[Boolean])
    case BinaryType  => enc.writeBytes(value.asInstanceOf[Array[Byte]])
    case ArrayType(et, _) =>
      val arr = value.asInstanceOf[ArrayData]
      val es = schema.getElementType
      val n = arr.numElements()
      enc.writeArrayStart()
      enc.setItemCount(n.toLong)
      var i = 0
      while (i < n) {
        enc.startItem()
        writeValue(arr.get(i, et), et, es, enc)
        i += 1
      }
      enc.writeArrayEnd()
    case st: StructType =>
      val row = value.asInstanceOf[InternalRow]
      val fields = schema.getFields
      var i = 0
      while (i < st.length) {
        writeValue(row.get(i, st(i).dataType), st(i).dataType, fields.get(i).schema(), enc)
        i += 1
      }
  }

  override def nullSafeEval(input: Any): Any = {
    baos.reset()
    encoder = EncoderFactory.get().directBinaryEncoder(baos, encoder)
    writeValue(input.asInstanceOf[InternalRow], structType, avroSchema, encoder)
    encoder.flush()
    baos.toByteArray
  }

  override protected def withNewChildInternal(c: Expression): ToAvro = copy(child = c)
}

/** Avro binary -> struct (schema-exact, mirrors the registry-enforced
  * decode of the reference consumer).
  *
  * Reads the BinaryDecoder STRAIGHT into Catalyst values (InternalRow
  * / GenericArrayData / UTF8String) — no GenericRecord, no
  * Utf8→String→UTF8String double conversion. Writer schema == reader
  * schema by contract, so no resolution pass is needed; the generic
  * reader remains the round-trip oracle in PropertySpec. */
@ExpressionDescription(usage = "graft_from_avro(bin) - decode Avro-binary into a struct")
case class FromAvro(child: Expression, schemaJson: String)
    extends UnaryExpression with CodegenFallback {

  @transient private lazy val avroSchema = new Schema.Parser().parse(schemaJson)
  override lazy val dataType: DataType = AvroSchemaMap.toSparkType(
    new Schema.Parser().parse(schemaJson))
  // PERMISSIVE like from_json: decode failure yields NULL (see
  // nullSafeEval), so corrupt bytes surface as ok=false rows
  override def nullable: Boolean = true

  @transient private var decoder: BinaryDecoder = _

  private def readValue(dt: DataType, schema: Schema, dec: BinaryDecoder): Any =
    (dt: @unchecked) match {
      case StringType =>
        // fresh Utf8 per read: UTF8String.fromBytes WRAPS the backing
        // array, so a reused buffer would corrupt earlier values
        val u = dec.readString(null)
        UTF8String.fromBytes(u.getBytes, 0, u.getByteLength)
      case LongType    => dec.readLong()
      case IntegerType => dec.readInt()
      case DoubleType  => dec.readDouble()
      case FloatType   => dec.readFloat()
      case BooleanType => dec.readBoolean()
      case BinaryType =>
        val bb = dec.readBytes(null)
        val out = new Array[Byte](bb.remaining()); bb.get(out); out
      case ArrayType(et, _) =>
        val es = schema.getElementType
        val buf = scala.collection.mutable.ArrayBuffer.empty[Any]
        var n = dec.readArrayStart()
        while (n > 0) {
          var i = 0L
          while (i < n) { buf += readValue(et, es, dec); i += 1 }
          n = dec.arrayNext()
        }
        new GenericArrayData(buf.toArray)
      case st: StructType =>
        val fields = schema.getFields
        val out = new Array[Any](st.length)
        var i = 0
        while (i < st.length) {
          out(i) = readValue(st(i).dataType, fields.get(i).schema(), dec)
          i += 1
        }
        InternalRow.fromSeq(out.toIndexedSeq)
    }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    decoder = DecoderFactory.get().binaryDecoder(bytes, decoder)
    // PERMISSIVE decode (from_json parity; reference consumer parity —
    // ConsumidorAvro catches per-record deserialization errors and
    // counts them): corrupt/truncated bytes yield NULL, the consume
    // path's `m.isNotNull AS ok` counts the row as an erro, and the
    // job survives. Unguarded, one corrupt record killed the task —
    // the Avro path was strictly less tolerant than the JSON path
    // whose null-on-malformed the `ok` projection already expected.
    try readValue(dataType, avroSchema, decoder)
    catch { case scala.util.control.NonFatal(_) => null }
  }

  override protected def withNewChildInternal(c: Expression): FromAvro = copy(child = c)
}

/** Avro binary -> struct UNDER SCHEMA RESOLUTION (writer ≠ reader) —
  * the production evolution path the schema-exact [[FromAvro]] fast
  * path declares out of scope: a consumer deployed with reader schema
  * v2 decodes bytes produced under writer v1, with removed fields
  * skipped, added fields taking their declared defaults, and nested
  * records resolved recursively — Avro's own
  * `GenericDatumReader(writer, reader)` resolving machinery, mapped to
  * Catalyst afterward. One extra materialization vs the direct reader
  * — the documented price of resolution; PERMISSIVE like FromAvro
  * (corrupt bytes → NULL, never a dead task). */
@ExpressionDescription(
  usage = "graft_from_avro_evolved(bin) - decode Avro-binary with writer->reader resolution")
case class FromAvroEvolved(child: Expression, writerJson: String, readerJson: String)
    extends UnaryExpression with CodegenFallback {

  @transient private lazy val datumReader = {
    val w = new Schema.Parser().parse(writerJson)
    val r = new Schema.Parser().parse(readerJson)
    new GenericDatumReader[GenericRecord](w, r)
  }
  override lazy val dataType: DataType =
    AvroSchemaMap.toSparkType(new Schema.Parser().parse(readerJson))
  override def nullable: Boolean = true

  @transient private var decoder: BinaryDecoder = _

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    decoder = DecoderFactory.get().binaryDecoder(bytes, decoder)
    try AvroSchemaMap.toCatalyst(datumReader.read(null, decoder), dataType)
    catch { case scala.util.control.NonFatal(_) => null }
  }

  override protected def withNewChildInternal(c: Expression): FromAvroEvolved =
    copy(child = c)
}

object AvroSerde {
  /** Column API: Avro-encode a struct column. */
  def to_avro(c: Column, schemaJson: String): Column =
    ColumnBridge.column(ToAvro(ColumnBridge.expression(c), schemaJson))

  /** Column API: decode with writer→reader schema resolution. */
  def from_avro_evolved(c: Column, writerJson: String, readerJson: String): Column =
    ColumnBridge.column(FromAvroEvolved(ColumnBridge.expression(c), writerJson, readerJson))

  /** Column API: decode an Avro-binary column into a struct. */
  def from_avro(c: Column, schemaJson: String): Column =
    ColumnBridge.column(FromAvro(ColumnBridge.expression(c), schemaJson))
}
