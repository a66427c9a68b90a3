package graft.sources

import scala.jdk.CollectionConverters._
import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}

/** The reference's BINARY Avro wire path (goavro codec semantics;
  * reference main.go:20-46), on the real Avro runtime that ships with
  * Spark: records encode with a minimal WRITER schema and decode
  * against the full Location READER schema, so Avro's own schema
  * resolution — not engine code — fills `source`'s `"device"` default
  * and the null-union defaults. [[AvroSchema.ingestJson]] covers the
  * declarative (from_json) ingest; this covers the wire format.
  *
  * Schemas travel as JSON strings and parse per partition: the
  * encode/decode closures run distributed in `mapPartitions`, one
  * codec instance per partition (the batched-decode shape, same as
  * [[graft.multimodal.Multimodal]]).
  */
object AvroBinary {

  /** What a minimal producer serializes: the Location record WITHOUT
    * the defaulted fields — reader-side resolution must supply them.
    */
  val writerSchemaJson: String =
    """{
      |  "type": "record", "name": "Location",
      |  "fields": [
      |    { "name": "features", "type": { "type": "array", "items": { "name": "id", "type": "string" } } },
      |    { "name": "latitude", "type": "double" },
      |    { "name": "longitude", "type": "double" },
      |    { "name": "speed", "type": ["null", "double"], "default": null },
      |    { "name": "timestamp", "type": "long" },
      |    { "name": "user_id", "type": "string" }
      |  ]
      |}""".stripMargin

  /** A record as a minimal producer sees it. */
  final case class Wire(features: Seq[String], latitude: Double, longitude: Double,
      speed: Option[Double], timestamp: Long, user_id: String)

  /** A record as the full-Location consumer sees it (post-resolution). */
  final case class Loc(accuracy: Option[Double], altitude: Option[Double],
      altitudeAccuracy: Option[Double], course: Option[Double],
      features: Seq[String], latitude: Double, longitude: Double,
      speed: Option[Double], source: String, timestamp: Long, user_id: String)

  /** Encode one partition of producer records to Avro binary. */
  def encodePartition(rows: Iterator[Wire], writerJson: String): Iterator[Array[Byte]] = {
    val schema = new Schema.Parser().parse(writerJson)
    val writer = new GenericDatumWriter[GenericRecord](schema)
    val factory = EncoderFactory.get()
    rows.map { r =>
      val rec = new GenericData.Record(schema)
      rec.put("features", r.features.asJava)
      rec.put("latitude", r.latitude)
      rec.put("longitude", r.longitude)
      rec.put("speed", r.speed.map(java.lang.Double.valueOf).orNull)
      rec.put("timestamp", r.timestamp)
      rec.put("user_id", r.user_id)
      val out = new java.io.ByteArrayOutputStream()
      val enc = factory.binaryEncoder(out, null)
      writer.write(rec, enc)
      enc.flush()
      out.toByteArray
    }
  }

  /** Decode one partition of Avro binary against the full reader
    * schema — Avro schema resolution fills the defaulted fields.
    */
  def decodePartition(bytes: Iterator[Array[Byte]], writerJson: String,
      readerJson: String): Iterator[Loc] = {
    val writerSchema = new Schema.Parser().parse(writerJson)
    val readerSchema = new Schema.Parser().parse(readerJson)
    val reader = new GenericDatumReader[GenericRecord](writerSchema, readerSchema)
    val factory = DecoderFactory.get()
    def optD(rec: GenericRecord, f: String): Option[Double] =
      Option(rec.get(f)).map(_.asInstanceOf[Double])
    bytes.map { b =>
      val rec = reader.read(null, factory.binaryDecoder(b, null))
      Loc(
        accuracy = optD(rec, "accuracy"),
        altitude = optD(rec, "altitude"),
        altitudeAccuracy = optD(rec, "altitudeAccuracy"),
        course = optD(rec, "course"),
        features = rec.get("features").asInstanceOf[java.util.List[AnyRef]]
          .asScala.map(_.toString).toSeq,
        latitude = rec.get("latitude").asInstanceOf[Double],
        longitude = rec.get("longitude").asInstanceOf[Double],
        speed = optD(rec, "speed"),
        source = rec.get("source").toString,
        timestamp = rec.get("timestamp").asInstanceOf[Long],
        user_id = rec.get("user_id").toString)
    }
  }
}
