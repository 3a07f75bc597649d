package graft

import org.scalatest.funsuite.AnyFunSuite

/** Unit tests for the bench harness's self-protection — the committed
  * floors ([[Bench]] `BENCH_LOCAL.json`) are what ScaleSmoke's 10x
  * tripwire and the round-over-round adjudication gate against, and
  * two rounds of review findings were bugs in exactly this logic while
  * it lived untested inline in main(): a failing pass could land -1
  * floors that permanently disabled the guard, and a sub-millisecond
  * floor killed the whole parse. Pure decision + parser, no Spark. */
class BenchGuardSpec extends AnyFunSuite {

  private val floors = Map("a" -> 10.0, "b" -> 20.0) // committed: 30 s
  private val names = Set("a", "b")

  private def decide(failedCount: Int = 0, anyNonPositive: Boolean = false,
                     committedSf: Option[String] = Some("/d/sf0.1"),
                     sfDir: String = "/d/sf0.1",
                     floorsUsable: Boolean = true,
                     fl: Map[String, Double] = floors,
                     nm: Set[String] = names,
                     ctrlMedian: Double = 1.0,
                     newTotal: Double = 25.0) =
    Bench.floorGuardDecision(failedCount, anyNonPositive, committedSf,
      sfDir, floorsUsable, fl, nm, ctrlMedian, newTotal)

  test("a strictly better pass replaces, without the raw-slower note") {
    assert(decide(newTotal = 25.0) === Right(false))
  }

  test("a pass with failures diverts even when its total would win") {
    val d = decide(failedCount = 2, newTotal = 1.0)
    assert(d.isLeft && d.swap.exists(_.contains("failed")))
  }

  test("a non-positive timing diverts (a -1 floor would permanently disable the guard)") {
    assert(decide(anyNonPositive = true, newTotal = 1.0).isLeft)
  }

  test("a different-scale run never replaces the sf artifact") {
    val d = decide(sfDir = "/d/sf0.01", newTotal = 1.0)
    assert(d.isLeft && d.swap.exists(_.contains("sf0.1")))
  }

  test("a machine-adjusted-worse pass diverts") {
    // 60 s at ctrl 1.5 = 40 s adjusted >= committed 30 s
    val d = decide(ctrlMedian = 1.5, newTotal = 60.0)
    assert(d.isLeft && d.swap.exists(_.contains("machine-adjusted")))
  }

  test("machine-adjusted better but raw beyond the loosening cap diverts to the binary A/B") {
    // 50 s at ctrl 2.0 = 25 s adjusted < 30 committed, but raw 50 >
    // 1.5 x 30: a uniform code regression that also slowed the
    // controls would look exactly like this
    val d = decide(ctrlMedian = 2.0, newTotal = 50.0)
    assert(d.isLeft && d.swap.exists(_.contains("binary A/B")))
  }

  test("a raw-slower pass within the cap replaces WITH the loud note") {
    // 40 s at ctrl 1.5 = 26.7 s adjusted < 30, raw 40 <= 45 = 1.5 x 30
    assert(decide(ctrlMedian = 1.5, newTotal = 40.0) === Right(true))
  }

  test("a changed query surface always replaces (smoke floors must cover every key)") {
    assert(decide(nm = Set("a", "b", "c"), newTotal = 999.0)
      === Right(false))
  }

  test("unusable floors (explicit override or empty) replace without adjudication") {
    // main() computes floorsUsable = no env override AND floors
    // nonEmpty, so empty floors always arrive with floorsUsable=false
    assert(decide(floorsUsable = false, newTotal = 999.0) === Right(false))
    assert(decide(floorsUsable = false, fl = Map.empty, newTotal = 999.0)
      === Right(false))
  }

  test("a committed floor at -1 disables the better-pass check, not the replace") {
    // floors poisoned by a pre-guard failing pass: forall(>0) is false,
    // so the decision falls through to replace — the new (clean) pass
    // heals the artifact rather than being judged against garbage
    assert(decide(fl = Map("a" -> -1.0, "b" -> 20.0), newTotal = 999.0)
      === Right(false))
  }

  test("readFloors parses negative exponents, plain and signed-positive floats") {
    val p = java.nio.file.Files.createTempFile("graft_floors_", ".json")
    java.nio.file.Files.write(p,
      """{"metric":"total","queries":{"tiny":9.5E-4,"plain":1.25,"pos":1.2e+1,"neg":-1.0},"sf":"x"}"""
        .getBytes("UTF-8"))
    val m = Bench.readFloors(p.toString)
    assert(m === Map("tiny" -> 9.5e-4, "plain" -> 1.25, "pos" -> 12.0,
      "neg" -> -1.0))
    java.nio.file.Files.delete(p)
  }

  test("readFloors returns empty on a missing or garbage file, never throws") {
    assert(Bench.readFloors("/nonexistent/floors.json") === Map.empty)
    val p = java.nio.file.Files.createTempFile("graft_floors_bad_", ".json")
    java.nio.file.Files.write(p, "not json at all".getBytes("UTF-8"))
    assert(Bench.readFloors(p.toString) === Map.empty)
    java.nio.file.Files.delete(p)
  }
}
