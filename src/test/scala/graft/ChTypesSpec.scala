package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.types.ChTypes

class ChTypesSpec extends AnyFunSuite {

  test("scalar mappings, unsigned widening, UInt64 exactness") {
    assert(ChTypes.parse("UInt8").dataType === IntegerType)
    assert(ChTypes.parse("UInt32").dataType === LongType)
    assert(ChTypes.parse("UInt64").dataType === DecimalType(20, 0))
    assert(ChTypes.parse("Int8").dataType === ByteType)
    assert(ChTypes.parse("Float32").dataType === FloatType)
    assert(ChTypes.parse("DateTime").dataType === TimestampType)
  }

  test("Nullable sets the flag, not a wrapper type") {
    val p = ChTypes.parse("Nullable(String)")
    assert(p.dataType === StringType && p.nullable)
    assert(!ChTypes.parse("String").nullable)
  }

  test("nested compositions") {
    assert(ChTypes.parse("Array(UInt32)").dataType === ArrayType(LongType, false))
    assert(ChTypes.parse("Array(Nullable(String))").dataType === ArrayType(StringType, true))
    assert(ChTypes.parse("Tuple(UInt8, String)").dataType ===
      StructType(Seq(StructField("_1", IntegerType, false), StructField("_2", StringType, false))))
    assert(ChTypes.parse("Array(Tuple(Int64, Array(String)))").dataType ===
      ArrayType(StructType(Seq(
        StructField("_1", LongType, false),
        StructField("_2", ArrayType(StringType, false), false))), false))
  }

  test("Nested(...) is Array(Struct) sharing offsets") {
    assert(ChTypes.parse("Nested(id UInt32, name String)").dataType ===
      ArrayType(StructType(Seq(
        StructField("id", LongType, false),
        StructField("name", StringType, false))), false))
  }

  test("FixedString / Enum / AggregateFunction layouts") {
    assert(ChTypes.parse("FixedString(16)").dataType === StringType)
    // Enum8/16 store the numeric value; the name map rides on metadata
    val e = ChTypes.parse("Enum8('a' = 1, 'b' = 2)")
    assert(e.dataType === ByteType)
    assert(e.enumDef.exists(_.typeName === "Enum8('a' = 1, 'b' = 2)"))
    // plain uniq stores the serialized bounded sketch; the exact
    // spellings store the distinct-value array
    assert(ChTypes.parse("AggregateFunction(uniq, UInt64)").dataType ===
      BinaryType)
    assert(ChTypes.parse("AggregateFunction(uniqExact, UInt64)").dataType ===
      ArrayType(DecimalType(20, 0), containsNull = false))
    // quantile reservoirs store the collected values
    assert(ChTypes.parse("AggregateFunction(quantiles(0.5, 0.9), UInt64)").dataType ===
      ArrayType(DecimalType(20, 0), containsNull = false))
    // avg stores its (sum, count) pair
    assert(ChTypes.parse("AggregateFunction(avg, UInt64)").dataType ===
      StructType(Seq(StructField("s", LongType), StructField("c", LongType, nullable = false))))
    // value states store the partial value itself
    assert(ChTypes.parse("AggregateFunction(sum, UInt32)").dataType === LongType)
    assert(ChTypes.parse("AggregateFunction(anyIf, String, UInt8)").dataType === StringType)
    // anything else stays opaque serialized bytes
    assert(ChTypes.parse("AggregateFunction(topK(5), String)").dataType === BinaryType)
  }

  test("full column-list schema") {
    val s = ChTypes.schema("d Date, k UInt64, v Nullable(Int8), tags Array(String)")
    assert(s.fieldNames.toSeq === Seq("d", "k", "v", "tags"))
    assert(s("v").nullable && !s("k").nullable)
    assert(s("tags").dataType === ArrayType(StringType, false))
  }

  test("round-trip of representative types") {
    Seq("Int32", "Float64", "String", "Date", "Array(Int64)",
      "Tuple(Int32, String)", "UInt64").foreach { t =>
      val p = ChTypes.parse(t)
      assert(ChTypes.toChName(p.dataType, p.nullable) === t)
    }
  }

  test("unknown type raises") {
    intercept[IllegalArgumentException](ChTypes.parse("Decimal(10,2)"))
  }

}
