package graft

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

/** The driver captures only the last ~2000 chars of Bench stdout, so the
  * final printed line must stay under budget AND stay valid JSON no
  * matter how many query keys exist. These specs pin that contract.
  */
class BenchSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()

  private def mkMedians(n: Int): Seq[(String, Double)] =
    (0 until n).map(i => (f"q_some_operator_name_$i%03d", 0.05 + i * 0.13))

  test("compact line fits driver tail budget with 95 realistic keys") {
    val line = Bench.compactLine(
      mkMedians(95), Nil, 42.1234, 3, Right(5.61),
      "/root/testdata/sf0.1", "bench_out.json")
    assert(line.length <= 1750, s"line too long: ${line.length}")
    assert(!line.contains("\n"))
    val node = mapper.readTree(line) // throws on invalid JSON
    assert(node.get("metric").asText() == "total")
    assert(node.get("unit").asText() == "sec")
    assert(node.get("n_queries").asInt() == 95)
    assert(node.get("pipeline_total").asDouble() == 5.61)
    val kept = node.get("queries").size()
    assert(kept + node.get("queries_omitted").asInt() == 95)
    // Slowest-first packing: the single slowest key always survives.
    assert(node.get("queries").has("q_some_operator_name_094"))
  }

  test("all keys fit when few; omitted is zero") {
    val line = Bench.compactLine(
      mkMedians(10), Nil, 1.0, 3, Right(0.5), "/sf", "out.json")
    val node = mapper.readTree(line)
    assert(node.get("queries").size() == 10)
    assert(node.get("queries_omitted").asInt() == 0)
  }

  test("errors map survives intact with messages truncated and escaped") {
    val errs = Seq(
      "q_bad" -> ("boom \"quoted\" path\\x\n" + "y" * 100),
      "q_worse" -> "short")
    val line = Bench.compactLine(
      mkMedians(93), errs, 9.9, 3, Left("pipeline fell over"),
      "/root/testdata/sf0.1", "bench_out.json")
    assert(line.length <= 1750)
    val node = mapper.readTree(line)
    assert(node.get("n_errors").asInt() == 2)
    assert(node.get("errors").get("q_worse").asText() == "short")
    assert(node.get("errors").get("q_bad").asText().length <= 60)
    assert(node.get("pipeline_error").asText() == "pipeline fell over")
  }

  test("pathologically many keys still parse under budget") {
    val line = Bench.compactLine(
      mkMedians(500), Nil, 99.9, 1, Right(1.0), "/sf", "o.json")
    assert(line.length <= 1750)
    assert(mapper.readTree(line).get("queries_omitted").asInt() > 0)
  }
}
