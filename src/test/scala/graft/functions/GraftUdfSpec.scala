package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.types.{IntegerType, StringType}

class GraftUdfSpec extends SparkSpec {
  import spark.implicits._

  object VowelCount extends GraftUdf {
    override def name = "vowel_count"
    override def resultType = IntegerType
    override def eval(args: Seq[Any]): Any = args.head match {
      case null => null
      case s: String => s.count("aeiouAEIOU".contains(_))
    }
  }

  object Affix extends GraftUdf {
    override def name = "affix"
    override def resultType = StringType
    override def arity = 2
    override def eval(args: Seq[Any]): Any = (args(0), args(1)) match {
      case (null, _) | (_, null) => null
      case (s: String, p: String) => p + s + p
    }
  }

  test("ZetaUDF-style plugin functions register and run from SQL") {
    GraftUdf.register(spark, VowelCount, Affix)
    val df = Seq(Tuple1("seatunnel"), Tuple1(null.asInstanceOf[String])).toDF("s")
    df.createOrReplaceTempView("udf_in")
    val rows = spark.sql("SELECT vowel_count(s) AS vc, affix(s, '#') AS af FROM udf_in").collect()
    assert(rows(0).getInt(0) == 4 && rows(0).getString(1) == "#seatunnel#")
    assert(rows(1).isNullAt(0) && rows(1).isNullAt(1))
  }
}
