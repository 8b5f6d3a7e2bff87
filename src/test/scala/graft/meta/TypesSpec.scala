package graft.meta

import org.scalatest.funsuite.AnyFunSuite

import graft.meta.types.{Compat, TypeNorm}

class TypeNormSpec extends AnyFunSuite {
  test("N1 varchar(n) -> string") {
    assert(TypeNorm.convertVarchar("varchar(64)") == "string")
    assert(TypeNorm.convertVarchar("VARCHAR(8)") == "string")
    assert(TypeNorm.convertVarchar("int") == "int")
  }

  test("N2/N4 decimal canonical spacing") {
    assert(TypeNorm.processDecimal("decimal(18,2)") == "decimal(18, 2)")
    assert(TypeNorm.processDecimal("decimal(18, 2)") == "decimal(18, 2)")
    assert(TypeNorm.reformatDecimal("bigint") == "bigint")
  }

  test("N3 convert_data_type: ddl -> spark/iceberg") {
    assert(TypeNorm.convertDataType("varchar(10)") == "string")
    assert(TypeNorm.convertDataType("decimal(12,7)") == "decimal(12, 7)")
    assert(TypeNorm.convertDataType("timestamp") == "timestamptz")
    assert(TypeNorm.convertDataType("bigint") == "long")
    assert(TypeNorm.convertDataType("int") == "int")
    assert(TypeNorm.convertDataType("date") == "date")
  }

  test("N6 iceberg metadata -> spark") {
    assert(TypeNorm.mapIcebergToSparkDtype("timestamp") == "timestamp_ntz")
    assert(TypeNorm.mapIcebergToSparkDtype("timestamptz") == "timestamp")
    assert(TypeNorm.mapIcebergToSparkDtype("long") == "long")
  }
}

class CompatSpec extends AnyFunSuite {
  private val athena = Compat.isCompatible("athena") _
  private val iceberg = Compat.isCompatible("iceberg") _

  test("athena matrix cells (rule_book.py:307-317)") {
    assert(athena("int", "bigint"))
    assert(!athena("bigint", "int"))
    assert(athena("smallint", "int"))
    assert(athena("smallint", "bigint"))
    assert(athena("tinyint", "smallint"))
    assert(athena("byte", "bigint"))
    assert(athena("float", "double"))
    assert(!athena("double", "float"))
    assert(athena("string", "bigint")) // matrix says so, verbatim
    assert(!athena("date", "timestamp"))
  }

  test("iceberg matrix cells (rule_book.py:318-327)") {
    assert(iceberg("int", "long"))
    assert(iceberg("int", "bigint"))
    assert(!iceberg("string", "bigint")) // iceberg STRING row is empty
    assert(iceberg("float", "double"))
    assert(!iceberg("long", "int"))
  }

  test("N5 decimal widening: same scale, larger precision only") {
    assert(Compat.isDecimalCompatible("decimal(10,2)", "decimal(12,2)"))
    assert(!Compat.isDecimalCompatible("decimal(12,2)", "decimal(10,2)"))
    assert(!Compat.isDecimalCompatible("decimal(10,2)", "decimal(12,3)"))
    assert(!Compat.isDecimalCompatible("decimal(10,2)", "decimal(10,2)"))
    // canonical spacing accepted
    assert(Compat.isDecimalCompatible("decimal(10, 2)", "decimal(12, 2)"))
  }

  test("N5 permissive fallback when unparsable") {
    assert(Compat.isDecimalCompatible("decimalish", "decimal(10,2)"))
    assert(Compat.isDecimalCompatible("int", "bigint"))
  }

  test("decimal route through the engine matrix") {
    assert(athena("decimal(10,2)", "decimal(12,2)"))
    assert(!athena("decimal(10,2)", "decimal(9,2)"))
    assert(iceberg("decimal(10,2)", "decimal(12,2)"))
    // bare DECIMAL -> DECIMAL is a direct matrix hit
    assert(athena("decimal", "decimal"))
  }

  test("J5 classify splits and preserves order") {
    val changes = Seq(
      Compat.TypeChange("a", "int", "bigint"),
      Compat.TypeChange("b", "double", "int"),
      Compat.TypeChange("c", "float", "double"))
    val (allOk, ok, bad) = Compat.classify(changes, "athena")
    assert(!allOk)
    assert(ok.map(_.name) == Seq("a", "c"))
    assert(bad.map(_.name) == Seq("b"))
  }
}
