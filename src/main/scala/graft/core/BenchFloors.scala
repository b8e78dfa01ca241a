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
    val num = """"([A-Za-z0-9_]+)":(-?[0-9][0-9.]*)""".r
    def pairs(body: String): Map[String, Double] =
      num.findAllMatchIn(body)
        .map(m => m.group(1) -> m.group(2).toDouble).toMap
    val q = pairs(objBody("queries"))
    val w = pairs(objBody("warmup"))
    q.keySet.flatMap { k =>
      val cands = (q.get(k).toSeq ++ w.get(k).toSeq).filter(_ > 0)
      if (cands.isEmpty) None else Some(k -> cands.min)
    }.toMap
  }
}
