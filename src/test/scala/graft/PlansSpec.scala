package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** PLANS.md completeness gate: every declared raw operator key must
  * have its formatted physical plan on record. Round 10 shipped five
  * missing dumps and round 11 one — a stale file looked complete
  * because nothing compared it against the declared surface. This spec
  * checks the COMMITTED file (no Spark session needed), so `sbt test`
  * goes red the moment a key is declared without regenerating
  * (`sbt "runMain graft.PlansDump"`). */
class PlansSpec extends AnyFunSuite {

  test("PLANS.md has a section for every declared raw operator key") {
    val path = Paths.get("PLANS.md")
    assert(Files.exists(path), "PLANS.md missing — run graft.PlansDump")
    val txt = Files.readString(path)
    val missing = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(k => txt.contains(s"\n## $k\n"))
    assert(missing.isEmpty,
      "PLANS.md is stale — regenerate with `sbt \"runMain graft.PlansDump\"`; " +
        s"missing sections: ${missing.mkString(", ")}")
  }

  test("PLANS.md carries no section for a key that no longer exists") {
    val txt = Files.readString(Paths.get("PLANS.md"))
    val sections = "(?m)^## (q_\\S+)$".r.findAllMatchIn(txt)
      .map(_.group(1)).toSet
    val declared = SparkEntry.queries.keySet
    val orphans = sections -- declared
    assert(orphans.isEmpty,
      s"PLANS.md documents undeclared keys (renamed/removed operators?): " +
        s"${orphans.mkString(", ")}")
  }
}
