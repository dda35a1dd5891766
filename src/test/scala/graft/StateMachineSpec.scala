package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.schema.FileStatus

/** State-machine properties (SURVEY §5): exhaustive over the 6-state space,
  * plus a ScalaCheck property for arbitrary transition sequences.
  */
class StateMachineSpec extends AnyFunSuite {

  test("self-transition is always legal (idempotent re-application)") {
    FileStatus.all.foreach(s => assert(FileStatus.canTransition(s, s)))
  }

  test("FINISHED is terminal") {
    FileStatus.all.filter(_ != FileStatus.Finished).foreach(s =>
      assert(!FileStatus.canTransition(FileStatus.Finished, s)))
  }

  test("every status is reachable from DISCOVERED via legal edges") {
    def reachable(from: FileStatus): Set[FileStatus] = {
      var seen = Set(from)
      var frontier = Set(from)
      while (frontier.nonEmpty) {
        val next = frontier.flatMap(FileStatus.legal(_)) -- seen
        seen ++= next; frontier = next
      }
      seen
    }
    assert(reachable(FileStatus.Discovered) == FileStatus.all.toSet)
  }

  test("no transition ever re-enters DISCOVERED (discovery is append-only)") {
    FileStatus.all.filter(_ != FileStatus.Discovered).foreach(s =>
      assert(!FileStatus.canTransition(s, FileStatus.Discovered)))
  }

  test("round-trip name parse") {
    FileStatus.all.foreach(s => assert(FileStatus.fromName(s.name) == s))
    assertThrows[IllegalArgumentException](FileStatus.fromName("NOPE"))
  }

  test("property: any legal walk from DISCOVERED stays inside the status set " +
       "and only terminates at FINISHED or a live state") {
    val walkGen: Gen[List[Int]] = Gen.listOf(Gen.choose(0, 5))
    val prop = Prop.forAll(walkGen) { picks =>
      var cur: FileStatus = FileStatus.Discovered
      picks.foreach { i =>
        val outs = FileStatus.legal(cur).toSeq.sortBy(_.name)
        if (outs.nonEmpty) cur = outs(i % outs.size)
      }
      FileStatus.all.contains(cur) &&
        (FileStatus.legal(cur).nonEmpty || cur == FileStatus.Finished)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }
}
