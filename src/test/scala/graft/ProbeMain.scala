package graft

/** Scratch probe (not committed): parser/json behavior checks. */
object ProbeMain {
  def main(args: Array[String]): Unit = {
    val line = """string.template=["{"data":{"c_string": "this is a string","c_boolean": "true","c_integer": "42","c_float": "3.14","c_double": "3.14","c_decimal": "10.55","c_date":"'2023-10-29'","c_datetime":\"16:12:43.459\"}}"]"""
    try {
      val o = graft.api.Hocon.parse(line)
      println("PARSED: " + o.entries)
    } catch { case e: Throwable => println("ERR: " + e) }
  }
}
