package graft

import org.apache.spark.sql.functions._
import graft.operators.CurationOps

/** Semantic contracts for the CurationOps pack (l27-l30) on crafted
  * fixtures where each rule provably bites — the synthetic corpus only
  * exercises them at its natural (low) rates. */
class CurationSpec extends SparkSpec {

  import spark.implicits._

  test("l27: duplicated paragraph is removed everywhere but its first " +
      "occurrence, in (doc_id, pos) order") {
    // 5-token-aligned spans; "alpha beta gamma delta epsilon" appears in
    // doc 1 (pos 0), doc 2 (pos 1), and doc 3 (pos 0).
    val span = "alpha beta gamma delta epsilon"
    val d = Seq(
      (1L, "a", s"$span one two three four five"),
      (2L, "a", s"one two three four five $span"),
      (3L, "b", s"$span")).toDF("doc_id", "source", "text")
    val out = CurationOps.paragraphDedupStats(d)
      .orderBy("source")
      .collect()
    // source a: 4 paragraphs; BOTH of doc 2's are dups (the span copies
    // doc 1 pos 0, and "one two three four five" copies doc 1 pos 1) —
    // 20 tokens total, doc 1's 10 kept.
    assert(out(0).getString(0) == "a")
    assert(out(0).getLong(1) == 4 && out(0).getLong(2) == 2)
    assert(out(0).getLong(3) == 20 && out(0).getLong(4) == 10)
    // source b: doc 3's copy also removed — dedup is global, not
    // per-source.
    assert(out(1).getString(0) == "b")
    assert(out(1).getLong(1) == 1 && out(1).getLong(2) == 1)
    assert(out(1).getLong(4) == 0)
  }

  test("l27: ragged tail paragraph keeps its true token count") {
    val d = Seq((1L, "a", "one two three four five six seven"))
      .toDF("doc_id", "source", "text")
    val paras = CurationOps.paragraphs(d).orderBy("pos").collect()
    assert(paras.length == 2)
    assert(paras(0).getAs[String]("para") == "one two three four five")
    assert(paras(0).getAs[Long]("n_tok") == 5L)
    assert(paras(1).getAs[String]("para") == "six seven")
    assert(paras(1).getAs[Long]("n_tok") == 2L)
  }

  test("l28: line filter drops short and boilerplate lines, keeps " +
      "clean prose") {
    val text = Seq(
      "this line is long enough to keep",
      "ok",                                    // < 3 words
      "please enable javascript to continue",  // boilerplate pattern
      "copyright 2024 example corp",           // boilerplate pattern
      "another perfectly fine line").mkString("\n")
    val kept = Seq(text).toDF("text")
      .select(CurationOps.keptLines(col("text")).as("kept"))
      .head().getSeq[String](0)
    assert(kept == Seq("this line is long enough to keep",
      "another perfectly fine line"))
  }

  test("l29: count-min sketch estimates bound the exact heavy-hitter " +
      "counts (contract for the approximate path)") {
    val toks = SparkEntry.queries("l29_heavy_hitters")(spark, sfDir)
    val exact = toks.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val stream = spark.read
      .parquet(s"$sfDir/documents.parquet")
      .select(explode(graft.functions.Text.tokens(col("text"))).as("token"))
    val total = stream.count()
    val eps = 0.005
    val cms = stream.stat.countMinSketch("token", eps, 0.99, 42)
    exact.foreach { case (tok, cnt) =>
      val est = cms.estimateCount(tok)
      assert(est >= cnt, s"CMS must never undercount ($tok: $est < $cnt)")
      assert(est <= cnt + (eps * total).toLong,
        s"CMS overcount for $tok out of contract: $est vs $cnt + ${eps * total}")
    }
  }

  test("l30: tf/df ranking picks the distinctive term, not the common one") {
    val d = Seq(
      (1L, "a", "rare rare common"),
      (2L, "a", "common other other")).toDF("doc_id", "source", "text")
    // df: rare=1, common=2, other=1.
    // doc 1: rare 2/1 = 2.0 beats common 1/2; doc 2: other 2/1 = 2.0
    // beats common 1/2.
    val top = CurationOps.tfidfTop(d)
      .select("doc_id", "keyword").as[(Long, String)].collect().toMap
    assert(top(1L) == "rare" && top(2L) == "other")
  }

  test("l31: chunk windows cover every token exactly per the stride") {
    // w=4, stride=3: 10 tokens -> chunks at 0,3,6 with sizes 4,4,4
    // (starts 0/3/6 cover [0,10) with 1-token overlap); 3 tokens -> one
    // short chunk; 4 tokens -> exactly one full window.
    val d = Seq(
      (1L, "en", (1 to 10).map(i => s"t$i").mkString(" ")),
      (2L, "en", "a b c"),
      (3L, "en", "a b c d")).toDF("doc_id", "lang", "text")
    val sizes = CurationOps.chunkSizes(d, 4, 3)
      .groupBy("lang").agg(
        count(lit(1)).as("n"), sum("chunk_tokens").as("tot"),
        collect_list("chunk_tokens").as("all"))
      .collect()(0)
    // doc1: ceil((10-4)/3)+1 = 3 chunks, sizes 4+4+4 (last starts at 6,
    // slice(7,4) = tokens 7..10 = 4 tokens); doc2: 1 chunk of 3;
    // doc3: 1 chunk of 4. Coverage: each doc's final chunk must reach
    // its last token — sum per doc = (c-1)*w + (n-(c-1)*s).
    assert(sizes.getAs[Long]("n") == 5, s"chunk count: $sizes")
    assert(sizes.getAs[Long]("tot") == 12 + 3 + 4, s"token mass: $sizes")
    assert(sizes.getAs[scala.collection.Seq[Int]]("all")
      .toSeq.sorted == Seq(3, 4, 4, 4, 4))
  }

  test("l41: a shared 8-token span is caught in BOTH docs; within-doc " +
      "repeats and short docs don't count") {
    val shared = (1 to 8).map(i => s"a$i").mkString(" ")
    val selfRep = (1 to 8).map(i => s"b$i").mkString(" ")
    val d = Seq(
      // source a: docs 1 and 2 share one 8-token run at different
      // offsets — substring dedup must catch it regardless of position
      (1L, "a", s"$shared x y"),
      (2L, "a", s"p q $shared"),
      // source b: doc 3 is unique; doc 4 is too short to span at all
      (3L, "b", (1 to 8).map(i => s"c$i").mkString(" ")),
      (4L, "b", "short text"),
      // source c: the same span twice in ONE doc — cross-doc distinct
      // count is 1, so nothing is "duplicated"
      (5L, "c", s"$selfRep $selfRep")).toDF("doc_id", "source", "text")
    val out = CurationOps.spanDupStats(d).collect()
      .map(r => r.getString(0) -> r).toMap
    // source a: 3 spans per 10-token doc, exactly one (the shared run)
    // duplicated in each; 1/3 ≥ 20% flags both docs
    assert(out("a").getLong(1) == 2 && out("a").getLong(2) == 2)
    assert(out("a").getLong(3) == 6 && out("a").getLong(4) == 2)
    // source b: doc 4 never reaches the span stage
    assert(out("b").getLong(1) == 1 && out("b").getLong(2) == 0)
    assert(out("b").getLong(3) == 1 && out("b").getLong(4) == 0)
    // source c: 9 spans, first and last identical but same-doc only
    assert(out("c").getLong(1) == 1 && out("c").getLong(2) == 0)
    assert(out("c").getLong(3) == 9 && out("c").getLong(4) == 0)
  }

  test("l97: identical length distributions score KS 0; disjoint " +
      "supports score KS 1000") {
    val same = Seq(("A", 100L), ("A", 200L), ("A", 300L),
      ("B", 100L), ("B", 200L), ("B", 300L))
      .toDF("source", "n_chars")
    val rs = CurationOps.ksDriftStats(same).collect()
    assert(rs.forall(_.getAs[Long]("ks_permille") === 0L))
    // every diff is 0, so the argmax tie-break lands on the lowest v
    assert(rs.forall(_.getAs[Long]("argmax_v") === 100L))
    val disj = Seq(("A", 100L), ("A", 110L), ("B", 200L), ("B", 210L))
      .toDF("source", "n_chars")
    val rd = CurationOps.ksDriftStats(disj).collect()
    assert(rd.forall(_.getAs[Long]("ks_permille") === 1000L))
    // the full CDF separation is first reached at A's top value
    assert(rd.map(r => r.getString(0) -> r.getAs[Long]("argmax_v"))
      .toMap === Map("A" -> 110L, "B" -> 110L))
    // degenerate single-source frame: n_rest = 0, and the guard must
    // report "no drift" 0 — not NULL (0 div 0) — for helper callers
    val solo = Seq(("A", 100L), ("A", 200L)).toDF("source", "n_chars")
    val ro = CurationOps.ksDriftStats(solo).collect()
    assert(ro.length == 1 && ro(0).getAs[Long]("ks_permille") === 0L)
  }

  test("l42: the mixing ledger's epochs/permille satisfy the ceil-div " +
      "laws for every source") {
    val rows = graft.SparkEntry.queries("l42_domain_mixing")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val avail = r.getAs[Long]("avail_tokens")
      val weight = r.getAs[Long]("weight")
      val desired = r.getAs[Long]("desired_tokens")
      val epochs = r.getAs[Long]("epochs")
      val permille = r.getAs[Long]("last_epoch_permille")
      assert(Seq(1L, 2L, 4L).contains(weight), s"weight: $r")
      // epochs = ceil(desired / avail): tight from both sides
      assert(epochs >= 1 && desired <= epochs * avail, s"epochs high: $r")
      assert((epochs - 1) * avail < desired || desired == 0,
        s"epochs low: $r")
      // the final partial pass samples a valid rate
      assert(permille >= 0 && permille <= 1000, s"permille: $r")
    }
  }

  test("native span_hashes is bit-equal to the HOF rolling-fold " +
      "specification and stays inside whole-stage codegen") {
    import graft.functions.Text
    val hashed = spark.read.parquet(s"$sfDir/documents.parquet")
      .limit(200)
      .select($"doc_id",
        expr(s"""transform(${Text.toksSql("text")},
                |  t -> ${Text.portableStrHashSql("t")})""".stripMargin)
          .as("th"))
      .localCheckpoint() // pin the heavy parse, the operators' barrier
    val rows = hashed
      .select($"doc_id",
        CurationOps.spanHashesExpr("th", 8).as("hof"),
        Text.spanHashes($"th", 8).as("native"))
      .as[(Long, Seq[Long], Seq[Long])]
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, hof, native) =>
      assert(hof == native, s"doc $id: hof=$hof native=$native")
    }
    val df = hashed.select(Text.spanHashes($"th", 8).as("sh"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
        l.contains("span_hashes") && l.contains("*(")),
      s"span_hashes projection not codegen'd:\n$plan")
  }
}
