package graft.core

/** Parser for the per-query IDLE FLOORS the bench reads from a previous
  * BENCH_DETAIL.json (see [[graft.Bench]]): floor = min(previous timed,
  * previous warmup) per query, only when the detail file was produced
  * for the SAME sf dir. Extracted from the bench main so the parse is
  * spec-testable — this build has no JSON library, so the extraction is
  * a small brace-matching scan that must survive error-string values
  * (`"q":"error: ..."` — skipped, not a number), escaped quotes inside
  * them, and nested braces; any structural surprise degrades to "no
  * floors", never a crashed bench. */
object BenchFloors {
  def parse(txt: String, sfDir: String): Map[String, Double] = {
    if (!txt.contains(s""""sf":"$sfDir"""")) return Map.empty
    def objBody(key: String): String = {
      val i = txt.indexOf(s""""$key":{""")
      if (i < 0) return ""
      val start = txt.indexOf('{', i)
      var depth = 0; var j = start; var inStr = false; var esc = false
      while (j < txt.length && (depth > 0 || j == start)) {
        val c = txt.charAt(j)
        if (inStr) {
          if (esc) esc = false
          else if (c == '\\') esc = true
          else if (c == '"') inStr = false
        } else {
          if (c == '"') inStr = true
          else if (c == '{') depth += 1
          else if (c == '}') depth -= 1
        }
        j += 1
      }
      txt.substring(start, j)
    }
    val q = numPairs(objBody("queries"))
    val w = numPairs(objBody("warmup"))
    q.keySet.flatMap { k =>
      val cands = (q.get(k).toSeq ++ w.get(k).toSeq).filter(_ > 0)
      if (cands.isEmpty) None else Some(k -> cands.min)
    }.toMap
  }

  private val num = """"([A-Za-z0-9_]+)":(-?[0-9][0-9.]*)""".r
  private def numPairs(body: String): Map[String, Double] =
    num.findAllMatchIn(body)
      .map(m => m.group(1) -> m.group(2).toDouble).toMap

  /** The multi-sf floors SIDECAR (`BENCH_FLOORS.json`):
    * `{"<sfDir>": {"<query>": floor, ...}, ...}`. BENCH_DETAIL.json
    * holds ONE run and is overwritten wholesale, so alternating sf
    * dirs (an sf0.01 gate run between two sf0.1 profile runs) used to
    * WIPE the other scale's floors — exactly when the retime trigger
    * and floor_exceeded receipt need them. The sidecar keys floors by
    * sf dir and merges min-wise across runs, so every scale keeps its
    * best-known per-query cost regardless of run order. Same
    * no-JSON-library discipline: a tolerant scan, any surprise
    * degrades to empty, never a crashed bench. */
  def parseSidecar(txt: String): Map[String, Map[String, Double]] =
    try {
      val out = Map.newBuilder[String, Map[String, Double]]
      var j = txt.indexOf('{')
      if (j < 0) return Map.empty
      j += 1
      var done = false
      while (!done) {
        val kq = txt.indexOf('"', j)
        val kend = if (kq < 0) -1 else txt.indexOf('"', kq + 1)
        val ob = if (kend < 0) -1 else txt.indexOf('{', kend)
        if (ob < 0) done = true
        else {
          // sf-dir keys carry no quotes/escapes; bodies are flat
          var depth = 1; var p = ob + 1
          while (p < txt.length && depth > 0) {
            val c = txt.charAt(p)
            if (c == '{') depth += 1 else if (c == '}') depth -= 1
            p += 1
          }
          out += txt.substring(kq + 1, kend) -> numPairs(txt.substring(ob, p))
          j = p
        }
      }
      out.result()
    } catch { case scala.util.control.NonFatal(_) => Map.empty }

  /** Render the sidecar (keys sorted both levels for stable diffs). */
  def renderSidecar(m: Map[String, Map[String, Double]]): String =
    m.toSeq.sortBy(_._1).map { case (sf, qs) =>
      val body = qs.toSeq.sortBy(_._1).map { case (k, v) =>
        f""""$k":${String.format(java.util.Locale.ROOT, "%.3f",
          Double.box(v))}"""
      }.mkString("{", ",", "}")
      s""""$sf":$body"""
    }.mkString("{", ",", "}")

  /** Min-merge `observed` into `all` under `sfDir`. */
  def mergeSidecar(all: Map[String, Map[String, Double]], sfDir: String,
      observed: Map[String, Double]): Map[String, Map[String, Double]] = {
    val old = all.getOrElse(sfDir, Map.empty)
    val merged = (old.keySet ++ observed.keySet).map { k =>
      k -> (old.get(k).toSeq ++ observed.get(k).toSeq).min
    }.toMap
    all + (sfDir -> merged)
  }

  /** The ADJUDICATED bench total (see the Bench main's rationale): for
    * every query in `machineAttributed` (its final reported time still
    * exceeded 3× its carried floor AND the probe series shows its
    * window was measurably loaded) whose floor is BELOW the reported
    * time, substitute the floor — the best idle cost this box has
    * measured for the same query; everything else keeps its raw
    * timing. A floor-exceeded query NOT machine-attributed keeps its
    * raw number, so a genuine plan regression still moves the
    * adjudicated total. Returns (per-query substitutions, adjudicated
    * sum). Extracted from the bench main so the substitution law is
    * spec-testable (BenchFloorsSpec). */
  def adjudicate(reported: Seq[(String, Double)],
      floors: Map[String, Double], machineAttributed: Set[String])
      : (Seq[(String, Double)], Double) = {
    val subs = reported.collect {
      case (k, sec) if machineAttributed.contains(k) &&
          floors.get(k).exists(_ < sec) =>
        (k, floors(k))
    }
    val subMap = subs.toMap
    val total = reported.map { case (k, sec) =>
      subMap.getOrElse(k, sec) }.sum
    (subs, total)
  }
}
