package graft.formats

import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property: Spark -> Avro -> Spark schema conversion is the identity for
  * every supported type shape (primitives, nullability unions, logical
  * types, arrays, string-keyed maps, nested structs).
  */
object AvroSchemaProps extends Properties("AvroFormat.schema") {

  private val primitive: Gen[DataType] = Gen.oneOf(
    StringType, IntegerType, LongType, FloatType, DoubleType, BooleanType,
    BinaryType, DateType, TimestampType, TimestampNTZType,
    DecimalType(10, 2), DecimalType(38, 9))

  private def dataType(depth: Int): Gen[DataType] =
    if (depth <= 0) primitive
    else Gen.frequency(
      6 -> primitive,
      1 -> Gen.zip(dataType(depth - 1), Gen.oneOf(true, false))
        .map { case (et, n) => ArrayType(et, n) },
      1 -> Gen.zip(dataType(depth - 1), Gen.oneOf(true, false))
        .map { case (vt, n) => MapType(StringType, vt, n) },
      1 -> structType(depth - 1))

  private def structType(depth: Int): Gen[StructType] = for {
    n <- Gen.chooseNum(1, 5)
    fields <- Gen.listOfN(n, for {
      dt <- dataType(depth)
      nullable <- Gen.oneOf(true, false)
    } yield (dt, nullable))
  } yield StructType(fields.zipWithIndex.map { case ((dt, nl), i) =>
    StructField(s"f$i", dt, nl)
  })

  property("toSparkSchema(toAvroSchema(st)) == st") = forAll(structType(2)) { st =>
    AvroFormat.toSparkSchema(AvroFormat.toAvroSchema(st)) == st
  }
}
