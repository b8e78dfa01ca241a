package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.BenchFloors

/** The bench's floor-file parser: per-query floors = min(timed, warmup)
  * from a previous BENCH_DETAIL.json, same-sf only, resilient to error
  * strings, escaped quotes, and malformed input (degrade to empty, the
  * no-floors path — never a crash that would take the bench with it). */
class BenchFloorsSpec extends AnyFunSuite {

  private val detail =
    """{"metric":"total","value":10.0,"unit":"sec","n_queries":3,
      |"n_error":1,"sf":"/data/sf0.1",
      |"queries":{"q01_rev":1.5,"l07_dedup":0.8,
      |  "p01_dead":"error: boom {\"nested\": true} \\ end"},
      |"warmup":{"q01_rev":2.0,"l07_dedup":0.4,"p01_dead":-1},
      |"probe":{"0":0.05}}""".stripMargin

  test("floors are per-query min(timed, warmup), errors and -1 skipped") {
    val f = BenchFloors.parse(detail, "/data/sf0.1")
    assert(f == Map("q01_rev" -> 1.5, "l07_dedup" -> 0.4))
  }

  test("a different sf dir yields no floors") {
    assert(BenchFloors.parse(detail, "/data/sf1").isEmpty)
  }

  test("error-string values with braces and escapes do not corrupt the scan") {
    // the error string for p01 embeds `{`, `}`, an escaped quote and a
    // backslash — the brace-matcher must not mistake them for structure
    val f = BenchFloors.parse(detail, "/data/sf0.1")
    assert(!f.contains("p01_dead"))
    assert(f.contains("l07_dedup"), "entries after the error string must survive")
  }

  test("the machine-attributed floor_exceeded objects do not leak into " +
      "the floor maps") {
    // round-15 detail format: floor_exceeded is an array of
    // {name, machine_attributed} objects; the parser must keep reading
    // floors from `queries`/`warmup` only — an object array elsewhere
    // in the file must neither add keys nor shift the brace scan
    val withAttribution = detail.dropRight(1) +
      ""","retimed":["q01_rev"],"floor_exceeded":[{"name":"q01_rev",""" +
      """"machine_attributed":true},{"name":"l07_dedup",""" +
      """"machine_attributed":false}]}"""
    val f = BenchFloors.parse(withAttribution, "/data/sf0.1")
    assert(f == Map("q01_rev" -> 1.5, "l07_dedup" -> 0.4))
  }

  test("missing objects or truncated input degrade gracefully, not a crash") {
    assert(BenchFloors.parse("""{"sf":"/d"}""", "/d").isEmpty)
    // truncated mid-object: the brace scan runs to end-of-input and keeps
    // whatever complete pairs it saw — the partial floor map, never a throw
    assert(BenchFloors.parse("""{"sf":"/d","queries":{"a":1.0""", "/d")
      == Map("a" -> 1.0))
    assert(BenchFloors.parse("", "/d").isEmpty)
  }

  test("sidecar: render/parse round-trips a multi-sf floor map") {
    val m = Map(
      "/data/sf0.1" -> Map("q01_rev" -> 1.5, "l07_dedup" -> 0.4),
      "target/sf1" -> Map("q01_rev" -> 2.183))
    assert(BenchFloors.parseSidecar(BenchFloors.renderSidecar(m)) == m)
  }

  test("sidecar: min-merge tightens floors per sf WITHOUT touching the " +
      "other scale — the sf0.01-gate-between-sf0.1-profiles wipe this " +
      "sidecar exists to prevent") {
    val before = Map(
      "/data/sf0.1" -> Map("q01_rev" -> 1.5, "l07_dedup" -> 0.4))
    // an sf0.01 gate run lands: sf0.1 floors must survive untouched
    val after01 = BenchFloors.mergeSidecar(before, "/data/sf0.01",
      Map("q01_rev" -> 0.2))
    assert(after01("/data/sf0.1") == before("/data/sf0.1"))
    assert(after01("/data/sf0.01") == Map("q01_rev" -> 0.2))
    // a later sf0.1 run only ever LOWERS same-sf floors (min-merge) and
    // adds new queries
    val after1 = BenchFloors.mergeSidecar(after01, "/data/sf0.1",
      Map("q01_rev" -> 9.9, "l07_dedup" -> 0.3, "w03_lag" -> 0.2))
    assert(after1("/data/sf0.1") ==
      Map("q01_rev" -> 1.5, "l07_dedup" -> 0.3, "w03_lag" -> 0.2))
  }

  test("sidecar: malformed or empty input degrades to empty, never a crash") {
    assert(BenchFloors.parseSidecar("").isEmpty)
    assert(BenchFloors.parseSidecar("{}").isEmpty)
    assert(BenchFloors.parseSidecar("""{"/d":{"a":1.0""") ==
      Map("/d" -> Map("a" -> 1.0)))
  }

  test("adjudicate substitutes floors ONLY for machine-attributed " +
      "inflation — a genuine regression (not attributed) keeps its raw " +
      "time and still moves the adjudicated total") {
    val reported = Seq("a" -> 9.0, "b" -> 9.0, "c" -> 1.0, "d" -> 0.2)
    val floors = Map("a" -> 0.5, "b" -> 0.5, "d" -> 0.4)
    // a: inflated AND the probe proved its window loaded -> floor (0.5)
    // b: same raw shape but NOT attributed (no probe evidence) -> a
    //    possible real regression, keeps 9.0
    // c: no floor known -> raw
    // d: attributed but reported BELOW its floor -> raw (never inflate)
    val (subs, total) =
      BenchFloors.adjudicate(reported, floors, Set("a", "d"))
    assert(subs == Seq("a" -> 0.5), s"substitutions: $subs")
    assert(math.abs(total - (0.5 + 9.0 + 1.0 + 0.2)) < 1e-9,
      s"adjudicated total: $total")
    // no attribution ⇒ identity
    val (none, raw) = BenchFloors.adjudicate(reported, floors, Set.empty)
    assert(none.isEmpty && math.abs(raw - 19.2) < 1e-9)
  }
}
