package graft.formats

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class ProtobufFormatSpec extends SparkSpec {
  import ProtobufFormat._

  private def hex(bytes: Array[Byte]): String =
    bytes.map(b => f"${b & 0xff}%02x").mkString(" ")

  // Golden vectors from the public protobuf encoding documentation
  // (https://protobuf.dev/programming-guides/encoding/).

  test("golden: int32 field 1 = 150 encodes to 08 96 01") {
    val s = parseSchema("syntax = \"proto3\"; message Test1 { int32 a = 1; }")
    val b = encodeRow(Row(150), s.message("Test1"), s)
    assert(hex(b) == "08 96 01")
    assert(decodeBytes(b, s.message("Test1"), s) == Row(150))
  }

  test("golden: string field 2 = \"testing\" encodes to 12 07 74 65 73 74 69 6e 67") {
    val s = parseSchema("message Test2 { string b = 2; }")
    val b = encodeRow(Row("testing"), s.message("Test2"), s)
    assert(hex(b) == "12 07 74 65 73 74 69 6e 67")
    assert(decodeBytes(b, s.message("Test2"), s) == Row("testing"))
  }

  test("golden: embedded message field 3 encodes to 1a 03 08 96 01") {
    val s = parseSchema(
      "message Test1 { int32 a = 1; } message Test3 { Test1 c = 3; }")
    val b = encodeRow(Row(Row(150)), s.message("Test3"), s)
    assert(hex(b) == "1a 03 08 96 01")
    assert(decodeBytes(b, s.message("Test3"), s) == Row(Row(150)))
  }

  test("golden: packed repeated int32 [3, 270, 86942] decodes from 22 06 03 8e 02 9e a7 05") {
    val s = parseSchema("message Test4 { repeated int32 d = 4; }")
    val packed = Array(0x22, 0x06, 0x03, 0x8e, 0x02, 0x9e, 0xa7, 0x05).map(_.toByte)
    assert(decodeBytes(packed, s.message("Test4"), s) == Row(Seq(3, 270, 86942)))
    // our encoder writes unpacked; decoder must accept that form too
    val b = encodeRow(Row(Seq(3, 270, 86942)), s.message("Test4"), s)
    assert(decodeBytes(b, s.message("Test4"), s) == Row(Seq(3, 270, 86942)))
  }

  test("round-trips all scalar kinds incl zigzag and floats") {
    val proto =
      """message AllTypes {
        |  int32 a = 1; int64 b = 2; uint32 c = 3; uint64 d = 4;
        |  sint32 e = 5; sint64 f = 6; bool g = 7; string h = 8;
        |  bytes i = 9; float j = 10; double k = 11;
        |  fixed32 l = 12; fixed64 m = 13; sfixed32 n = 14; sfixed64 o = 15;
        |}""".stripMargin
    val s = parseSchema(proto)
    val row = Row(-42, -9999999999L, 4000000000L, 123L, -7, -8L, true, "héllo",
      Array[Byte](0, 1, 2), 1.5f, -2.25, 4294967295L, 9L, -3, -4L)
    val back = decodeBytes(encodeRow(row, s.message("AllTypes"), s), s.message("AllTypes"), s)
    val exp = row.toSeq.updated(8, null).toIndexedSeq // bytes compared separately
    val got = back.toSeq.updated(8, null).toIndexedSeq
    assert(got == exp)
    assert(back.getAs[Array[Byte]](8).toSeq == Seq[Byte](0, 1, 2))
  }

  test("decoder skips unknown fields") {
    val full = parseSchema("message M { int32 a = 1; string b = 2; double c = 3; }")
    val partial = parseSchema("message M { string b = 2; }")
    val bytes = encodeRow(Row(7, "keep", 1.25), full.message("M"), full)
    assert(decodeBytes(bytes, partial.message("M"), partial) == Row("keep"))
  }

  test("DataFrame encode/decode round-trip over a real table") {
    val proto =
      """syntax = "proto3";
        |message Order {
        |  int64 o_orderkey = 1;
        |  string o_orderstatus = 2;
        |  double o_totalprice = 3;
        |}""".stripMargin
    val orders = Tables.load(spark, "/root/testdata/sf0.001", "orders")
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    val encoded = ProtobufFormat.encode(orders, None, proto, "Order")
    val decoded = ProtobufFormat.decode(encoded, "proto", proto, "Order", "rec")
      .select("rec.o_orderkey", "rec.o_orderstatus", "rec.o_totalprice")
    assert(decoded.orderBy("o_orderkey").collect().toSeq ==
      orders.orderBy("o_orderkey").collect().toSeq)
  }

  test("parser rejects unsupported constructs with a clear error") {
    val e = intercept[IllegalArgumentException] {
      parseSchema("message M { oneof x { int32 a = 1; } }")
    }
    assert(e.getMessage.contains("not supported"))
  }
}
