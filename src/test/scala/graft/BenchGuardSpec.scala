package graft

import org.scalatest.funsuite.AnyFunSuite

/** Unit tests for the bench harness's self-protection — the committed
  * floors ([[Bench]] `BENCH_LOCAL.json`) are what ScaleSmoke's 10x
  * tripwire and the round-over-round adjudication gate against, and
  * three rounds of review findings were bugs in exactly this logic while
  * it lived untested inline in main(): a failing pass could land -1
  * floors that permanently disabled the guard, a sub-millisecond floor
  * killed the whole parse, and surface growth re-landed all floors on a
  * slow window. Pure decision + parser + line builders, no Spark. */
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

  private def divertReason(d: Bench.FloorDecision): String = d match {
    case Bench.Divert(r) => r
    case other => fail(s"expected Divert, got $other")
  }

  test("a strictly better pass replaces, without the raw-slower note") {
    assert(decide(newTotal = 25.0) === Bench.Replace(false))
  }

  test("a pass with failures diverts even when its total would win") {
    assert(divertReason(decide(failedCount = 2, newTotal = 1.0))
      .contains("failed"))
  }

  test("a non-positive timing diverts (a -1 floor would permanently disable the guard)") {
    assert(decide(anyNonPositive = true, newTotal = 1.0)
      .isInstanceOf[Bench.Divert])
  }

  test("a different-scale run never replaces the sf artifact") {
    assert(divertReason(decide(sfDir = "/d/sf0.01", newTotal = 1.0))
      .contains("sf0.1"))
  }

  test("a machine-adjusted-worse pass diverts") {
    // 60 s at ctrl 1.5 = 40 s adjusted >= committed 30 s
    assert(divertReason(decide(ctrlMedian = 1.5, newTotal = 60.0))
      .contains("machine-adjusted"))
  }

  test("machine-adjusted better but raw beyond the loosening cap diverts to the binary A/B") {
    // 50 s at ctrl 2.0 = 25 s adjusted < 30 committed, but raw 50 >
    // 1.5 x 30: a uniform code regression that also slowed the
    // controls would look exactly like this
    assert(divertReason(decide(ctrlMedian = 2.0, newTotal = 50.0))
      .contains("binary A/B"))
  }

  test("a raw-slower pass within the cap replaces WITH the loud note") {
    // 40 s at ctrl 1.5 = 26.7 s adjusted < 30, raw 40 <= 45 = 1.5 x 30
    assert(decide(ctrlMedian = 1.5, newTotal = 40.0) === Bench.Replace(true))
  }

  test("surface GROWTH merges only the new keys — never re-lands existing floors (the r18 loophole)") {
    // two new twin queries on a 1.23x-slow window must not replace all
    // committed floors; only c and d get fresh (ctrl-normalized) floors
    assert(decide(nm = Set("a", "b", "c", "d"), ctrlMedian = 1.23,
      newTotal = 999.0) === Bench.MergeNew(Set("c", "d")))
  }

  test("surface growth on a WINNING window replaces wholesale — growth must not block a tightening pass") {
    // 25 s at ctrl 1.0 beats the committed 30 s and stays under the raw
    // cap: the pass covers the new query AND tightens the old floors
    assert(decide(nm = Set("a", "b", "c"), ctrlMedian = 1.0,
      newTotal = 25.0) === Bench.Replace(false))
    // raw-slower but machine-adjusted better, within the cap: replace
    // with the loud note, same as the equal-surface rule
    assert(decide(nm = Set("a", "b", "c"), ctrlMedian = 1.5,
      newTotal = 40.0) === Bench.Replace(true))
    // machine-adjusted better but beyond the raw cap: merge, don't
    // loosen (the uniform-regression disguise applies here too)
    assert(decide(nm = Set("a", "b", "c"), ctrlMedian = 2.0,
      newTotal = 50.0) === Bench.MergeNew(Set("c")))
  }

  test("surface growth without a control basket replaces (nothing to normalize new floors by)") {
    assert(decide(nm = Set("a", "b", "c"), ctrlMedian = -1.0,
      newTotal = 999.0) === Bench.Replace(false))
  }

  test("a genuinely different surface (removed keys) still replaces — smoke floors must cover every key") {
    assert(decide(nm = Set("a", "c"), newTotal = 999.0)
      === Bench.Replace(false))
  }

  test("unusable floors (explicit override or empty) replace without adjudication") {
    // main() computes floorsUsable = no env override AND floors
    // nonEmpty, so empty floors always arrive with floorsUsable=false
    assert(decide(floorsUsable = false, newTotal = 999.0)
      === Bench.Replace(false))
    assert(decide(floorsUsable = false, fl = Map.empty, newTotal = 999.0)
      === Bench.Replace(false))
  }

  test("a committed floor at -1 disables the better-pass check, not the replace") {
    // floors poisoned by a pre-guard failing pass: forall(>0) is false,
    // so the decision falls through to replace — the new (clean) pass
    // heals the artifact rather than being judged against garbage
    assert(decide(fl = Map("a" -> -1.0, "b" -> 20.0), newTotal = 999.0)
      === Bench.Replace(false))
  }

  test("mergedFloorsJson round-trips through readFloors and keeps old floors verbatim") {
    val merged = floors ++ Map("c" -> 3.25, "d" -> 9.5e-4)
    val json = Bench.mergedFloorsJson(merged, Set("c", "d"),
      committedCalib = 0.31, ctrl = 1.23, sfDir = "/d/sf0.1")
    val p = java.nio.file.Files.createTempFile("graft_merged_", ".json")
    java.nio.file.Files.write(p, json.getBytes("UTF-8"))
    assert(Bench.readFloors(p.toString) === merged)
    // sf + calib survive for the scale check and bench_compare
    assert(json.contains("\"sf\":\"/d/sf0.1\""))
    assert(json.contains("\"calib_sec\":0.31"))
    assert(json.contains("\"floor_merge\""))
    java.nio.file.Files.delete(p)
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

  // --- stdout-line size discipline (the parsed:null fix, r19 task 1) ---

  private val fmt3: Double => String = s => f"$s%.3f"
  private val twoHundred = (1 to 200).map(i =>
    f"synthetic_query_name_$i%03d" -> (i * 0.137)).toIndexedSeq

  test("summary line stays under 1,900 bytes at 200 queries — even with failures and reprobes") {
    val mins = twoHundred.toMap
    val fls = twoHundred.map { case (k, v) => k -> v / 2 }.toMap
    val line = Bench.summaryLine(total = 1234.5, reps = 2, calib = 0.42,
      ctrlMedian = 1.07, worst = Bench.worstVsFloors(mins, fls),
      failedNames = twoHundred.map(_._1), // pathological: all failed
      reprobed = twoHundred.take(60).map(_._1), // over the display cap
      sfDir = "/root/testdata/sf0.1", fmt3)
    assert(line.length < 1900, s"summary line is ${line.length} bytes")
    // it must still be one self-contained JSON object
    assert(line.startsWith("{") && line.endsWith("}"))
    assert(line.contains("\"failed\":200")) // true count survives the cap
  }

  test("part lines each stay under 1,900 bytes and reassemble the full query map") {
    val parts = Bench.partLines(twoHundred, fmt3)
    assert(parts.nonEmpty)
    parts.foreach(l => assert(l.length < 1900, s"part line ${l.length} bytes"))
    // every query appears exactly once across the parts
    val entries = parts.flatMap(l =>
      "\"(synthetic_query_name_\\d+)\":".r.findAllMatchIn(l).map(_.group(1)))
    assert(entries.sorted === twoHundred.map(_._1).sorted)
    // parts are numbered 1..n with a consistent "of"
    assert(parts.head.contains("\"bench_part\":1"))
    assert(parts.last.contains(s""""of":${parts.size}"""))
  }

  test("worstVsFloors ranks by ratio desc and skips queries without usable floors") {
    val mins = Map("x" -> 10.0, "y" -> 4.0, "z" -> 1.0, "nofloor" -> 99.0,
      "failed" -> -1.0)
    val fls = Map("x" -> 2.0, "y" -> 4.0, "z" -> 0.25, "failed" -> 1.0)
    val w = Bench.worstVsFloors(mins, fls, n = 2)
    assert(w.map(_._1) === Seq("x", "z")) // ratios 5.0, 4.0 (y=1.0 below)
  }

  test("reprobeSelection picks >2x-floor queries worst-first and caps loudly") {
    val mins = Map("spike" -> 10.0, "worse" -> 50.0, "fine" -> 1.9,
      "nofloor" -> 99.0, "failed" -> -1.0)
    val fls = Map("spike" -> 1.0, "worse" -> 1.0, "fine" -> 1.0,
      "failed" -> 1.0)
    assert(Bench.reprobeSelection(mins, fls) === Seq("worse", "spike"))
    assert(Bench.reprobeSelection(mins, fls, cap = 1) === Seq("worse"))
    assert(Bench.reprobeSelection(mins, Map.empty) === Seq.empty)
  }

  test("candidate write-path is OUTCOME-KEYED: a divert can never clobber a merge pass's artifact") {
    // the r19 session lost a WINNING growth pass's full artifact to a
    // later slow pass's divert because both wrote one shared candidate
    // file; outcome-keyed names make that clobber impossible
    assert(Bench.candidatePath(Bench.Divert("slow window"))
      === "BENCH_LOCAL_candidate.divert.json")
    assert(Bench.candidatePath(Bench.MergeNew(Set("new_q")))
      === "BENCH_LOCAL_candidate.merge.json")
    assert(Bench.candidatePath(Bench.Replace(false)) === "BENCH_LOCAL.json")
  }

  test("best-so-far candidate is immutable against worse passes; only a machine-adjusted better pass replaces it") {
    // no best recorded yet: any complete pass claims the slot
    assert(Bench.bestCandidateWins(None, newTotal = 200.0, newCtrl = 1.0))
    // a failed/empty pass never claims it
    assert(!Bench.bestCandidateWins(None, newTotal = -1.0, newCtrl = 1.0))
    val best = """{"metric":"total","value":150.0,"unit":"sec",""" +
      """"ctrl_ratio_vs_floor":1.0,"queries":{"a":1.0}}"""
    // raw-slower on a slow window: 180/1.5 = 120 adjusted < 150 — wins
    assert(Bench.bestCandidateWins(Some(best), 180.0, 1.5))
    // raw-faster on a FAST window: 140/0.8 = 175 adjusted — correctly
    // refused (the window, not the code, made it fast)
    assert(!Bench.bestCandidateWins(Some(best), 140.0, 0.8))
    // plainly worse: never overwrites
    assert(!Bench.bestCandidateWins(Some(best), 300.0, 1.0))
    // unreadable ctrl in the recorded best: falls back to raw totals
    val noCtrl = """{"metric":"total","value":150.0,"queries":{}}"""
    assert(Bench.bestCandidateWins(Some(noCtrl), 100.0, 1.0))
    assert(!Bench.bestCandidateWins(Some(noCtrl), 200.0, 1.0))
  }

  test("reprobeSelection never heals a control: an elevated control is the machine signal, not a transient to retry") {
    val ctrl = Bench.ControlQueries.head
    val mins = Map(ctrl -> 10.0, "spike" -> 10.0)
    val fls = Map(ctrl -> 1.0, "spike" -> 1.0)
    assert(Bench.reprobeSelection(mins, fls) === Seq("spike"),
      "a >2x control must stay out of the re-probe set so " +
        "ctrl_ratio_vs_floor reports the window as measured")
  }

  test("capped-slice smoke query pushes its vec_id bound to the parquet scan — the slice never reads the replicas") {
    // the zero-exemption smoke's honesty hinges on the slice being a
    // constant-work PRUNED read of the scaled corpus: replica 0 is the
    // base corpus verbatim and the bound must reach the scan, or the
    // "capped" form would still scan all 10x replicas and the
    // exponent-0.5 budget would be a lie
    import TestSpark._
    val df = ScaleSmoke.cappedQuery("dedup_embedding_cosine", spark,
      sfDir, baseRows = 100)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    val pushed = plan.linesIterator
      .filter(_.contains("PushedFilters:")).toSeq
    assert(pushed.nonEmpty && pushed.forall(_.contains(
      "LessThan(vec_id,100)")),
      s"vec_id slice bound not pushed to the scan:\n$plan")
    intercept[RuntimeException](
      ScaleSmoke.cappedQuery("not_a_capped_query", spark, sfDir, 100))
  }
}
