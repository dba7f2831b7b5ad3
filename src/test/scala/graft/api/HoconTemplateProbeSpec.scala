package graft.api

import org.scalatest.funsuite.AnyFunSuite

/** HOCON value-concatenation: the reference's e2e `string.template` lines
  * interleave quoted and unquoted segments; the parser must reassemble the
  * one JSON document the reference's lenient json-smart parse sees.
  */
class HoconConcatSpec extends AnyFunSuite {

  test("string.template concatenation rebuilds the strict-JSON document") {
    val line = """string.template=["{"data":{"c_string": "this is a string","c_boolean": "true","c_integer": "42","c_float": "3.14","c_double": "3.14","c_decimal": "10.55","c_date":"'2023-10-29'","c_datetime":\"16:12:43.459\"}}"]"""
    val o = Hocon.parse(line)
    val Some(Hocon.Arr(Seq(Hocon.Scalar(doc)))) = o.get("string.template")
    assert(doc ==
      """{"data":{"c_string": "this is a string","c_boolean": "true","c_integer": "42","c_float": "3.14","c_double": "3.14","c_decimal": "10.55","c_date":"'2023-10-29'","c_datetime":"16:12:43.459"}}""")
  }

  test("plain quoted scalars are unaffected by concatenation handling") {
    val o = Hocon.parse("a = \"b\"\nc = \"two words\", d = [\"x\", y]\n")
    assert(o.get("a").contains(Hocon.Scalar("b")))
    assert(o.get("c").contains(Hocon.Scalar("two words")))
    assert(o.get("d").contains(Hocon.Arr(Seq(Hocon.Scalar("x"), Hocon.Scalar("y")))))
  }

  test("general value concatenation joins segment CONTENT (typesafe semantics)") {
    val o = Hocon.parse("""v = ab"cd ef"gh""" + "\n")
    assert(o.get("v").contains(Hocon.Scalar("abcd efgh")))
    // the reference's variables idiom: quoted SQL fragments around an
    // unquoted substituted identifier
    val q = Hocon.parse("""query = "select * from "tbl1" where name = '"abc"' """ + "\"\n")
    assert(q.get("query").contains(Hocon.Scalar("select * from tbl1 where name = 'abc'")))
  }

  test("substituteVariables resolves ${name} and ${name:default}") {
    val text = "a = ${x}\nb = \"${y:fallback}_t\"\nc = ${z:10}\n"
    val out = Hocon.substituteVariables(text, Map("x" -> "[1,2]", "z" -> "42"))
    assert(out == "a = [1,2]\nb = \"fallback_t\"\nc = 42\n")
    intercept[IllegalArgumentException] {
      Hocon.substituteVariables("v = ${missing}", Map.empty)
    }
  }
}
