package graft

import org.scalatest.funsuite.AnyFunSuite

import com.fasterxml.jackson.databind.ObjectMapper

/** The `failures.json` / `oracle_sql.json` manifests Verify writes are
  * what the driver's `json.load` parses to diagnose a broken round — a
  * malformed escape there silently zeroes the round's correctness.
  * This suite round-trips the escaping through a real JSON parser
  * (Jackson, same strictness class as Python's json) over the nasty
  * inputs: quotes, backslashes, newlines, tabs, CRs, NULs, and every
  * control char below 0x20.
  */
class VerifyJsonSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()

  private def parse(json: String): Map[String, String] = {
    val node = mapper.readTree(json)
    val it = node.fields()
    val b = Map.newBuilder[String, String]
    while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue.asText }
    b.result()
  }

  test("quotes, backslashes and newlines survive a parser round-trip") {
    val kvs = Seq(
      "q_bad" -> "AnalysisException: cannot resolve \"x\" given [a, b]\nat line 2",
      "q_path" -> "IOException: C:\\tmp\\out \"quoted\" \r\n\ttab-indented")
    val parsed = parse(Verify.jsonObject(kvs))
    assert(parsed === kvs.toMap)
  }

  test("every control char below 0x20 round-trips") {
    val ctrl = (0 until 0x20).map(_.toChar).mkString
    val parsed = parse(Verify.jsonObject(Seq("ctl" -> ctrl)))
    assert(parsed("ctl") === ctrl)
  }

  test("keys are escaped too") {
    val k = "name with \"quotes\"\nand newline"
    val parsed = parse(Verify.jsonObject(Seq(k -> "v")))
    assert(parsed.keySet === Set(k))
  }

  test("empty map yields a valid empty object") {
    assert(parse(Verify.jsonObject(Nil)) === Map.empty)
  }
}
