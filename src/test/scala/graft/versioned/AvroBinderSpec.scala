package graft.versioned

import org.apache.avro.Schema
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Unit contract of [[IcebergImport.avroBinder]]: field-id-first
  * binding with the spec's name-mapping fallback restricted to ID-LESS
  * writer fields. The killer case: an external table dropped column `x`
  * and re-added a new `x` (fresh field id — ids are never reused). Old
  * avro files carry a field NAMED `x` stamped with the RETIRED id; the
  * new id misses, and Iceberg semantics require NULLS for the re-added
  * column — binding the dead column's bytes by name would resurrect
  * deleted data.
  */
class AvroBinderSpec extends AnyFunSuite with Matchers {

  private def schema(json: String) = new Schema.Parser().parse(json)

  test("id-bound fields bind by id; the name fallback fires ONLY for " +
    "id-less writer fields — a retired-id name match reads as absent " +
    "(null), not as the dead column's bytes") {
    val writer = schema(
      """{"type":"record","name":"r","fields":[
        |{"name":"id","type":["null","int"],"default":null,"field-id":1},
        |{"name":"x","type":["null","string"],"default":null,"field-id":2},
        |{"name":"y","type":["null","string"],"default":null}]}"""
        .stripMargin.replaceAll("\n", ""))
    // table schema: id keeps id 1; x was dropped and re-added as id 7;
    // y never had an id in this file (late-added column — name mapping)
    val bound = IcebergImport.avroBinder(writer,
      Seq("id", "x", "y"), Map("id" -> 1, "x" -> 7, "y" -> 9))
    bound("id") shouldBe "id"
    bound("y") shouldBe "y" // id-less writer field: name-mapping fallback
    bound.get("x") shouldBe None // retired id 2 under the name — null-fill
  }

  test("renamed column still binds by id (the rename case the id-first " +
    "rule exists for)") {
    val writer = schema(
      """{"type":"record","name":"r","fields":[
        |{"name":"old_name","type":["null","int"],"default":null,"field-id":3}]}"""
        .stripMargin.replaceAll("\n", ""))
    val bound = IcebergImport.avroBinder(writer,
      Seq("new_name"), Map("new_name" -> 3))
    bound("new_name") shouldBe "old_name"
  }

  test("fully id-less writer schema binds every column by name") {
    val writer = schema(
      """{"type":"record","name":"r","fields":[
        |{"name":"a","type":"int"},{"name":"b","type":"string"}]}"""
        .stripMargin.replaceAll("\n", ""))
    val bound = IcebergImport.avroBinder(writer,
      Seq("a", "b", "c"), Map("a" -> 1, "b" -> 2, "c" -> 3))
    bound("a") shouldBe "a"
    bound("b") shouldBe "b"
    bound.get("c") shouldBe None
  }
}
