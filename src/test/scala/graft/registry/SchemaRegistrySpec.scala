package graft.registry

import graft.ingest.TypeMapping
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** W3 positional compatibility semantics (/root/reference/db/db.go:208-223)
  * and the ClickHouse type bijection. */
class SchemaRegistrySpec extends AnyFunSuite {
  private val reg = new SchemaRegistry

  private def cols(ts: String*): Seq[ColumnDef] =
    ts.zipWithIndex.map { case (t, i) => ColumnDef(s"c$i", t) }

  test("same count and types pass") {
    assert(reg.checkValid(cols("String", "Float64"), cols("String", "Float64")).isEmpty)
  }

  test("column names are ignored (positional check, db.go:209)") {
    val a = Seq(ColumnDef("x", "String"), ColumnDef("y", "Float64"))
    val b = Seq(ColumnDef("p", "String"), ColumnDef("q", "Float64"))
    assert(reg.checkValid(a, b).isEmpty)
  }

  test("count mismatch rejects") {
    assert(reg.checkValid(cols("String"), cols("String", "Float64")).isDefined)
  }

  test("per-index type mismatch rejects") {
    val err = reg.checkValid(cols("String", "Float64"), cols("String", "String"))
    assert(err.exists(_.contains("position 1")))
  }

  test("registry put/get and spark schema") {
    reg.put("temp_out", Seq(ColumnDef("client", "String"),
      ColumnDef("device", "String"), ColumnDef("value", "Float64")))
    assert(reg.contains("temp_out"))
    assert(reg.sparkSchema("temp_out").get ==
      StructType(Seq(StructField("client", StringType),
        StructField("device", StringType), StructField("value", DoubleType))))
  }

  test("type bijection round-trips") {
    TypeMapping.toClickHouse.foreach { case (dt, ch) =>
      assert(TypeMapping.toSpark(ch) == dt)
    }
    // the reference's dead "Int" spelling still maps in
    assert(TypeMapping.toSpark("Int") == LongType)
  }
}
