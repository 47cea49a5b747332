package graft.types

import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.ingest.{PartitionFieldSpec, TableDef}

/** JSON table-spec loader — the stand-in for the reference's JDBC
  * catalog resolution (`catalog.loadTable` → Schema + PartitionSpec,
  * `App.java:81-87`, SURVEY.md A24): a table is *defined externally*
  * and loaded by name; the engine never infers schemas (schema-on-write,
  * SURVEY.md §1.1). Uses json4s, which ships with Spark.
  *
  * Format (types mirror the reference's coercion switch; nested types
  * are `{"struct": [...]}`, `{"list": <type>}`, `{"map": <valueType>}`
  * — map keys are strings by construction, A9):
  *
  * {{{
  * {
  *   "name": "events",
  *   "fields": [
  *     {"name": "id", "type": "long", "required": true},
  *     {"name": "event_date", "type": "date"},
  *     {"name": "amount", "type": "decimal(10,2)"},
  *     {"name": "payload", "type": {"struct": [
  *       {"name": "a", "type": "int"}]}},
  *     {"name": "tags", "type": {"list": "string"}},
  *     {"name": "attrs", "type": {"map": "string"}}
  *   ],
  *   "partitionSpec": [
  *     {"source": "event_date", "transform": "day"},
  *     {"source": "user_id", "transform": "bucket[16]", "name": "user_bucket"}
  *   ]
  * }
  * }}}
  */
object TableSpecJson {

  def parse(json: String): TableDef = {
    val root = JsonMethods.parse(json)
    val name = str(root \ "name", "name")
    val fields = (root \ "fields") match {
      case JArray(fs) => fs.map(parseField)
      case _ => throw new IllegalArgumentException("table spec needs a fields array")
    }
    val spec = (root \ "partitionSpec") match {
      case JArray(ps) => ps.map(parsePartition)
      case JNothing   => Nil
      case _ => throw new IllegalArgumentException("partitionSpec must be an array")
    }
    TableDef(name, GStruct(fields), spec)
  }

  def load(path: String): TableDef =
    parse(java.nio.file.Files.readString(java.nio.file.Paths.get(path)))

  private def parseField(jv: JValue): GField = {
    val name = str(jv \ "name", "field name")
    val required = (jv \ "required") match {
      case JBool(b) => b
      case _        => false
    }
    GField(name, parseType(jv \ "type"), required)
  }

  private def parseType(jv: JValue): GType = jv match {
    case JString(prim) => GType.primitive(prim)
    case obj: JObject =>
      (obj \ "struct", obj \ "list", obj \ "map") match {
        case (JArray(fs), JNothing, JNothing) => GStruct(fs.map(parseField))
        case (JNothing, l, JNothing) if l != JNothing => GList(parseType(l))
        case (JNothing, JNothing, m) if m != JNothing => GMap(parseType(m))
        case _ => throw new IllegalArgumentException(s"bad type object: $obj")
      }
    case other => throw new IllegalArgumentException(s"bad type: $other")
  }

  private def parsePartition(jv: JValue): PartitionFieldSpec = {
    val source = str(jv \ "source", "partition source")
    val transform = str(jv \ "transform", "partition transform")
    (jv \ "name") match {
      case JString(n) => PartitionFieldSpec(source, transform, n)
      case _          => PartitionFieldSpec(source, transform)
    }
  }

  private def str(jv: JValue, what: String): String = jv match {
    case JString(s) => s
    case _ => throw new IllegalArgumentException(s"missing/bad $what")
  }
}
