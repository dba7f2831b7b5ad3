package graft.formats

import org.apache.spark.sql.Row
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property-based wire-format round-trip for the protobuf codec: any
  * generated value assignment for a fixed all-types message must decode
  * back to exactly what was encoded.
  */
object ProtobufProps extends Properties("ProtobufFormat") {
  import ProtobufFormat._

  private val schema = parseSchema(
    """message P {
      |  int32 a = 1; int64 b = 2; sint32 c = 3; sint64 d = 4;
      |  bool e = 5; string f = 6; double g = 7; float h = 8;
      |  fixed64 i = 9; sfixed32 j = 10;
      |  repeated int32 k = 11; repeated string l = 12;
      |}""".stripMargin)
  private val msg = schema.message("P")

  private val strGen = Gen.asciiPrintableStr.map(_.take(32))
  private val rowGen: Gen[Row] = for {
    a <- Gen.chooseNum(Int.MinValue, Int.MaxValue)
    b <- Gen.chooseNum(Long.MinValue, Long.MaxValue)
    c <- Gen.chooseNum(Int.MinValue, Int.MaxValue)
    d <- Gen.chooseNum(Long.MinValue, Long.MaxValue)
    e <- Gen.oneOf(true, false)
    f <- strGen
    g <- Gen.chooseNum(-1e12, 1e12)
    h <- Gen.chooseNum(-1e6f, 1e6f)
    i <- Gen.chooseNum(Long.MinValue, Long.MaxValue)
    j <- Gen.chooseNum(Int.MinValue, Int.MaxValue)
    k <- Gen.listOf(Gen.chooseNum(Int.MinValue, Int.MaxValue)).map(_.take(8))
    l <- Gen.listOf(strGen).map(_.take(4))
  } yield Row(a, b, c, d, e, f, g, h, i, j, k, l)

  property("encode then decode is identity") = forAll(rowGen) { row =>
    val back = decodeBytes(encodeRow(row, msg, schema), msg, schema)
    // empty repeated fields decode as null (proto3 has no empty-vs-absent)
    val norm = Row(row.toSeq.map {
      case s: Seq[_] if s.isEmpty => null
      case v => v
    }: _*)
    back == norm
  }

  property("unknown fields from a wider writer are skipped cleanly") = forAll(rowGen) { row =>
    val narrow = parseSchema("message P { string f = 6; repeated int32 k = 11; }")
    val back = decodeBytes(encodeRow(row, msg, schema), narrow.message("P"), narrow)
    val expectedK = row.getSeq[Int](10) match { case s if s.isEmpty => null; case s => s }
    back == Row(row.getString(5), expectedK)
  }
}
