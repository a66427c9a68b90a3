package graft.sources

import scala.jdk.CollectionConverters._
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Avro-JSON record schema → Spark StructType, with null-union and
  * field-default handling — the schema-enforced ingest the reference
  * drives through its goavro codec (reference main.go:20-42: the
  * `Location` record with `["null","double"]` unions, a string-array
  * field, and a `"default":"device"` source field).
  *
  * Only the Avro surface the reference exercises is supported:
  * records of primitives, null-unions, arrays, and nested records.
  */
object AvroSchema {

  private val mapper = new ObjectMapper()

  /** The reference's Location schema, verbatim semantics. */
  val locationSchemaJson: String =
    """{
      |  "type": "record", "name": "Location",
      |  "fields": [
      |    { "name": "accuracy", "type": ["null", "double"], "default": null },
      |    { "name": "altitude", "type": ["null", "double"], "default": null },
      |    { "name": "altitudeAccuracy", "type": ["null", "double"], "default": null },
      |    { "name": "course", "type": ["null", "double"], "default": null },
      |    { "name": "features", "type": { "type": "array", "items": { "name": "id", "type": "string" } } },
      |    { "name": "latitude", "type": "double" },
      |    { "name": "longitude", "type": "double" },
      |    { "name": "speed", "type": ["null", "double"], "default": null },
      |    { "name": "source", "type": "string", "default": "device" },
      |    { "name": "timestamp", "type": "long" },
      |    { "name": "user_id", "type": "string" }
      |  ]
      |}""".stripMargin

  def toStructType(avroJson: String): StructType =
    recordType(mapper.readTree(avroJson))

  /** Field name → non-null default value (JSON scalar), for fill-in. */
  def defaults(avroJson: String): Map[String, Any] = {
    val root = mapper.readTree(avroJson)
    root.get("fields").elements.asScala.flatMap { f =>
      Option(f.get("default")).filterNot(_.isNull).map { d =>
        val v: Any =
          if (d.isTextual) d.asText
          else if (d.isIntegralNumber) d.asLong
          else if (d.isNumber) d.asDouble
          else if (d.isBoolean) d.asBoolean
          else d.toString
        f.get("name").asText -> v
      }
    }.toMap
  }

  private def recordType(node: JsonNode): StructType =
    StructType(node.get("fields").elements.asScala.map { f =>
      val (dt, nullable) = fieldType(f.get("type"))
      StructField(f.get("name").asText, dt, nullable)
    }.toSeq)

  private def fieldType(node: JsonNode): (DataType, Boolean) =
    if (node.isTextual) (primitive(node.asText), false)
    else if (node.isArray) { // union, e.g. ["null","double"]
      val members = node.elements.asScala.toSeq
      val isNull = (n: JsonNode) => n.isTextual && n.asText == "null"
      val inner = members.filterNot(isNull)
      require(inner.size == 1, s"only null-unions supported: $node")
      (fieldType(inner.head)._1, members.exists(isNull))
    } else { // object: array / record / {"type": primitive}
      node.get("type").asText match {
        case "array" => (ArrayType(fieldType(node.get("items"))._1, containsNull = false), false)
        case "record" => (recordType(node), false)
        case p => (primitive(p), false)
      }
    }

  private def primitive(name: String): DataType = name match {
    case "string" => StringType
    case "long" => LongType
    case "int" => IntegerType
    case "double" => DoubleType
    case "float" => FloatType
    case "boolean" => BooleanType
    case "bytes" => BinaryType
    case other => throw new IllegalArgumentException(s"unsupported avro type: $other")
  }

  /** Parse a JSON-lines column against the Avro schema and fill the
    * schema's defaults into missing/null fields — goavro's default
    * semantics, Spark-side: one codegen'd `from_json` + `coalesce`s,
    * no UDF, fully distributed.
    */
  def ingestJson(jsonCol: Column, avroJson: String): Column = {
    val st = toStructType(avroJson)
    val parsed = from_json(jsonCol, st)
    val filled = defaults(avroJson).foldLeft(parsed) { case (c, (field, dv)) =>
      c.withField(field, coalesce(c.getField(field), lit(dv)))
    }
    filled
  }
}
