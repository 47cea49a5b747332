package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.PartitionFieldSpec
import graft.types._

/** TableSpecJson: the external-schema loading seam (A24 analog). */
class TableSpecSpec extends AnyFunSuite {

  test("parses the full fixture-shaped spec incl. nested types") {
    val t = TableSpecJson.parse(
      """{"name": "ev",
        | "fields": [
        |   {"name": "id", "type": "long", "required": true},
        |   {"name": "event_date", "type": "date"},
        |   {"name": "amount", "type": "decimal(10,2)"},
        |   {"name": "t", "type": "time"},
        |   {"name": "payload", "type": {"struct": [
        |     {"name": "a", "type": "int"},
        |     {"name": "c", "type": {"list": "double"}},
        |     {"name": "d", "type": {"map": "int"}}]}},
        |   {"name": "tags", "type": {"list": "string"}}
        | ],
        | "partitionSpec": [
        |   {"source": "event_date", "transform": "day"},
        |   {"source": "id", "transform": "bucket[16]", "name": "idb"}
        | ]}""".stripMargin)
    assert(t.name == "ev")
    assert(t.schema.fields.head == GField("id", GLong, required = true))
    assert(t.schema.fields(2).gtype == GDecimal(10, 2))
    assert(t.schema.fields(3).gtype == GTime)
    val payload = t.schema.fields(4).gtype.asInstanceOf[GStruct]
    assert(payload.fields(1).gtype == GList(GDouble))
    assert(payload.fields(2).gtype == GMap(GInt))
    assert(t.partitionSpec == Seq(
      PartitionFieldSpec("event_date", "day", "event_date_day"),
      PartitionFieldSpec("id", "bucket[16]", "idb")))
  }

  test("unsupported types fail fast like the reference (App.java:271-272)") {
    intercept[IllegalArgumentException](GType.primitive("uuid"))
    intercept[IllegalArgumentException](
      TableSpecJson.parse("""{"name":"x","fields":[{"name":"f","type":"binary"}]}"""))
  }

  test("missing partitionSpec means unpartitioned") {
    val t = TableSpecJson.parse(
      """{"name":"x","fields":[{"name":"f","type":"string"}]}""")
    assert(t.partitionSpec.isEmpty)
  }
}
