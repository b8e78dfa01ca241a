package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._
import graft.core.{Tables => T}
import graft.operators.Ingest
import graft.functions.{Geo, Text, ZOrderInterleave}

/** Property-style invariants, mirroring the reference's statistical
  * tests (SURVEY.md §5: totals ≈ Σ components, bounds, uniqueness). */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  /** Minimal property driver over raw scalacheck Gens (the scalatest
    * bridge artifact isn't in the offline cache): deterministic seeds,
    * n samples per law. */
  private def forSamples[A](g: Gen[A], n: Int = 20)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      g.apply(Gen.Parameters.default, Seed(i.toLong))
        .foreach(a => f(a))
    }

  test("ingest totality: every input line lands in exactly one branch") {
    val junk = Gen.listOfN(40, Gen.oneOf(
      Gen.alphaNumStr,
      Gen.const("""{"trip_id":"x"}"""),
      Gen.const("{broken"),
      Gen.const(""),
      Gen.const("""{"pickup_datetime":"2024-01-01T01:00:00",
        |"dropoff_datetime":"2024-01-01T02:00:00","trip_distance":1.0,
        |"total_amount":5.0}""".stripMargin.replaceAll("\n", ""))))
    forSamples(junk) { lines =>
      if (lines.nonEmpty) {
        val parsed = Ingest.parseRecords(lines.toDF("raw"), "prop")
        val v = Ingest.valid(parsed).count()
        val i = Ingest.invalid(parsed).count()
        assert(v + i == lines.size)
      }
    }
  }

  test("dead-letter error types stay within the reference's six classes") {
    val lines = Gen.listOfN(60, Gen.oneOf(
      Gen.alphaNumStr, Gen.const("{bad"), Gen.const("""{"a":1}""")))
    val allowed = Set("json_parsing_failed", "missing_field",
      "invalid_timestamp_format", "invalid_timestamp_order",
      "validation_failed", "unexpected_error")
    forSamples(lines) { ls =>
      if (ls.nonEmpty) {
        val types = Ingest.invalid(
            Ingest.parseRecords(ls.toDF("raw"), "prop"))
          .select("error_type").distinct().as[String].collect().toSet
        assert(types.subsetOf(allowed))
      }
    }
  }

  test("moneyAvg2 matches BigDecimal HALF_UP for arbitrary cent amounts") {
    val cents = Gen.listOfN(20, Gen.chooseNum(1L, 10000000L))
    forSamples(cents, n = 8) { cs =>
      if (cs.nonEmpty) {
        val spark2dp = cs.zipWithIndex
          .map { case (c, i) => (i % 3, c / 100.0) }
          .toDF("g", "v")
          .groupBy("g").agg(T.moneyAvg2(col("v")).as("avg2"))
          .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
        val expected = cs.zipWithIndex.groupBy(_._2 % 3).map { case (g, xs) =>
          val sum = BigDecimal(xs.map(_._1).sum)
          g -> (sum / xs.size).setScale(0, BigDecimal.RoundingMode.HALF_UP)
            .toDouble / 100.0
        }
        expected.foreach { case (g, e) =>
          assert(math.abs(spark2dp(g) - e) < 1e-9,
            s"group $g: spark=${spark2dp(g)} expected=$e")
        }
      }
    }
  }

  test("zorder interleave is a bijection (deinterleave recovers inputs)") {
    def unspread(v: Long): Long = {
      var x = v & 0x5555555555555555L
      x = (x | (x >> 1)) & 0x3333333333333333L
      x = (x | (x >> 2)) & 0x0f0f0f0f0f0f0f0fL
      x = (x | (x >> 4)) & 0x00ff00ff00ff00ffL
      x = (x | (x >> 8)) & 0x0000ffff0000ffffL
      x = (x | (x >> 16)) & 0x00000000ffffffffL
      x
    }
    forSamples(Gen.zip(Gen.chooseNum(0L, 0xffffffffL),
        Gen.chooseNum(0L, 0xffffffffL)), n = 200) { case (a, b) =>
        val z = ZOrderInterleave.interleave(a, b)
        assert(unspread(z) == a)
        assert(unspread(z >> 1) == b)
    }
  }

  test("geohash precision-prefix law: longer hashes refine shorter ones") {
    val coords = for {
      lat <- Gen.chooseNum(-89.9, 89.9)
      lon <- Gen.chooseNum(-179.9, 179.9)
    } yield (lat, lon)
    forSamples(coords, n = 50) { case (lat, lon) =>
      val h8 = Geo.encode(lat, lon, 8)
      (1 to 7).foreach(p => assert(Geo.encode(lat, lon, p) == h8.take(p)))
    }
  }

  test("S7 log-sink: invalid-record metric equals the dead-letter count") {
    // The reference's log sink (main.py:324-330) reduces to a counted
    // side channel; foreach with an accumulator is the Spark analog.
    val lines = Seq("ok-but-not-json", """{"x":1}""", "also bad")
    val invalid = Ingest.invalid(
      Ingest.parseRecords(lines.toDF("raw"), "prop"))
    val metric = spark.sparkContext.longAccumulator("invalid_records")
    invalid.foreach(_ => metric.add(1))
    assert(metric.value == invalid.count())
  }

  test("w18 law: the interval sweep equals brute-force trailing distinct " +
      "for arbitrary presence patterns") {
    val pres = Gen.listOfN(30, for {
      u <- Gen.choose(1L, 5L)
      h <- Gen.choose(0L, 60L)
    } yield (u, h))
    forSamples(pres, n = 8) { ps =>
      if (ps.nonEmpty) {
        val ev = ps.zipWithIndex.map { case ((u, h), i) =>
          (i.toLong, new java.sql.Timestamp(h * 3600L * 1000L), u)
        }.toDF("event_id", "ts", "user_id")
        val swept = graft.operators.Windows.rollingDistinctUsers(ev)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        // brute force: per spine hour, |users with presence in [h-23,h]|
        val hours = ps.map(_._2)
        val (h0, h1) = (hours.min, hours.max)
        (h0 to h1).foreach { h =>
          val expect = ps.filter(p => p._2 >= h - 23 && p._2 <= h)
            .map(_._1).distinct.size.toLong
          assert(swept(h) === expect, s"hour $h of $ps")
        }
      }
    }
  }

  test("l31 chunk law: windows cover all n tokens for arbitrary (n, w, s)") {
    // the oracle's closed form and the executed slice must agree for
    // EVERY shape, not just the fixture's: total mass telescopes to
    // (c-1)·w + (n-(c-1)·s) for n > w and n for one window, each
    // non-last window is exactly w, and consecutive windows overlap by
    // w - s tokens
    val shapes = for {
      n <- Gen.choose(0, 300)
      w <- Gen.choose(2, 80)
      s <- Gen.choose(1, w) // stride <= window (overlapping or exact)
    } yield (n, w, s)
    forSamples(shapes, 40) { case (n, w, st) =>
      val text = (1 to n).map(i => s"t$i").mkString(" ")
      val d = Seq((1L, "en", text)).toDF("doc_id", "lang", "text")
      val sizes = graft.operators.CurationOps.chunkSizes(d, w, st)
        .select("chunk_tokens").as[Int].collect().toSeq
      // NOTE n=0 still tokenizes to one empty-string token (split of
      // "" is [""]), matching DuckDB's string_split — so m >= 1 always
      val m = math.max(n, 1)
      val c = if (m <= w) 1 else (m - w + st - 1) / st + 1
      assert(sizes.length == c, s"(n=$n w=$w s=$st): ${sizes.length} != $c")
      assert(sizes.sum == (c - 1) * w + (m - (c - 1) * st),
        s"(n=$n w=$w s=$st): mass ${sizes.sum}")
      assert(sizes.init.forall(_ == w),
        s"(n=$n w=$w s=$st): non-last window short: $sizes")
    }
  }

  test("w20 law: median/MAD recompute brute-force per event type, and " +
      "the fence has a 50% breakdown point where mean/stddev do not") {
    val out = SparkEntry.queries("w20_mad_outliers")(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4))).toMap
    val rows = graft.core.Tables.loadEvents(spark, sfDir)
      .select(col("event_type"), col("value")).collect()
      .map(r => r.getString(0) -> r.getDouble(1))
    def medLong(xs: Seq[Long]): Double = {
      val s = xs.sorted
      if (s.length % 2 == 1) s(s.length / 2).toDouble
      else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
    }
    rows.groupBy(_._1).foreach { case (t, vs) =>
      // same integer scaling as the query: cents x2
      val vc2 = vs.map { case (_, v) =>
        (BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP)
          * 200).toLongExact
      }.toSeq
      val med2 = medLong(vc2)
      val dev2 = vc2.map(x => math.abs(x - med2.toLong))
      val mad2 = medLong(dev2)
      val nOut = dev2.count(_.toDouble > 3.0 * mad2)
      val (n, medV, madV, got) = out(t)
      assert(n === vc2.length.toLong)
      assert(medV === med2 / 200.0, s"median mismatch for $t")
      assert(madV === mad2 / 200.0, s"MAD mismatch for $t")
      assert(got === nOut.toLong, s"outlier count mismatch for $t")
      // breakdown point: corrupt 40% of values to 1000x — the median
      // and MAD fences move by a bounded amount while mean/stddev blow
      // up; the surviving clean majority still decides the center
      val k = vc2.length * 2 / 5
      val corrupted = vc2.take(k).map(_ * 1000L) ++ vc2.drop(k)
      val cmed = medLong(corrupted)
      assert(math.abs(cmed - med2) <= (vc2.max - vc2.min).toDouble,
        "median moved beyond the clean data's range under 40% corruption")
      val mean = vc2.sum.toDouble / vc2.length
      val cmean = corrupted.sum.toDouble / corrupted.length
      assert(cmean > mean * 10,
        "sanity: the mean SHOULD blow up under the same corruption")
    }
  }

  test("kgram_hashes edge cases: native equals HOF for empty/short/" +
      "multi-byte/boundary strings and arbitrary ASCII") {
    import graft.functions.Text
    val k = 8
    val cases = Seq(
      "",                       // empty
      "abc",                    // shorter than k
      "exactly8",               // exactly k chars -> one gram
      "exactly8!",              // k+1 -> two grams
      "héllo wörld, caffé latté and more", // 2-byte UTF-8 chars
      "日本語のテキストですここにもっと",      // 3-byte UTF-8 chars
      "a b  c\t d \n e f g h i j", // whitespace mix (pre-norm input)
      "\u0000binary\u0001ish\u007f data here") ++
      // arbitrary printable ASCII via a fixed-seed generator
      (1 to 20).map { i =>
        val rnd = new scala.util.Random(i * 7919)
        (0 until rnd.nextInt(40)).map(_ => (32 + rnd.nextInt(95)).toChar)
          .mkString
      }
    val df = spark.createDataFrame(
      cases.zipWithIndex.map { case (s, i) => (i, s) })
      .toDF("id", "s")
    val rows = df.select(col("id"), col("s"),
        Text.kgramHashes(col("s"), k).as("native"),
        Text.kgramHashesHof("s", k).as("hof"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](2) === r.getSeq[Long](3),
        s"native != HOF for input ${r.getInt(0)}: '${r.getString(1)}'")
    }
    // gram-count law: max(0, numChars - k + 1)
    rows.foreach { r =>
      val expected = math.max(0, r.getString(1).codePointCount(
        0, r.getString(1).length) - k + 1)
      assert(r.getSeq[Long](2).length === expected,
        s"gram count wrong for '${r.getString(1)}'")
    }
  }

  test("portable hash family: uniform bits, independent perms, rare collisions") {
    // The portable minhash/simhash signatures trade xxhash64 for
    // DuckDB-replayable integer mixing — these laws are what keep LSH
    // band buckets balanced at 10^9 docs (bucket sizes, hence
    // candidate-join cost, grow with the SQUARE of any bias). The
    // corpus cannot pin them (31 distinct tokens at sf0.01), so check
    // the family itself over random token strings. Deterministic Gen
    // seeds: the measured values are fixed, the bounds have 4-5 sigma
    // slack, so this cannot flake.
    import graft.functions.PortableHash
    import org.apache.spark.unsafe.types.UTF8String
    val tokens = (0 until 200).flatMap { i =>
      Gen.listOfN(100, Gen.identifier)
        .apply(Gen.Parameters.default, Seed(i.toLong))
        .getOrElse(Seq.empty)
    }.distinct
    assert(tokens.size > 15000, s"generator yielded only ${tokens.size}")
    val h0s = tokens.map(t => PortableHash.strHash(UTF8String.fromString(t)))
    // (1) char-fold collisions stay at birthday-bound scale: expected
    // n^2 / (2 * 1e9+7) ~ 0.2 for ~20k tokens; allow a 5x margin
    assert(h0s.size - h0s.distinct.size <= 3,
      s"strHash collisions: ${h0s.size - h0s.distinct.size}")
    val hs = h0s.map(PortableHash.tokenHash62)
    val n = hs.size.toDouble
    val sigma = math.sqrt(n) / 2
    // (2) every one of the 62 signature bits is ~fair (dev < 5 sigma)
    (0 until 62).foreach { j =>
      val ones = hs.count(h => ((h >> j) & 1L) == 1L)
      assert(math.abs(ones - n / 2) < 5 * sigma,
        s"bit $j biased: $ones of $n")
    }
    // (3) adjacent bits are independent (agreement ~ n/2): a lattice
    // artifact in the mixer shows up exactly here
    (0 until 61).foreach { j =>
      val agree = hs.count(h => ((h >> j) & 1L) == ((h >> (j + 1)) & 1L))
      assert(math.abs(agree - n / 2) < 5 * sigma,
        s"bits $j,${j + 1} correlated: $agree of $n")
    }
    // (4) minhash permutations pick DIFFERENT minima: over 16 perms of
    // a 50-element set, independent hashes select ~13.7 distinct
    // argmins on average ( n(1-(1-1/n)^16) ); identical-permutation
    // degeneracy would select 1. Require an average >= 10.
    val sets = h0s.grouped(50).take(100).toSeq.filter(_.size == 50)
    val avgDistinct = sets.map { s =>
      (0 until 16).map(p => s.minBy(h => PortableHash.minhashPerm(h, p)))
        .distinct.size
    }.sum.toDouble / sets.size
    assert(avgDistinct >= 10.0,
      s"perms nearly identical: avg distinct argmins $avgDistinct")
    // (5) SEQUENTIAL seeds (the l17/l23/l33 doc_id splits) land in
    // balanced % 100 buckets: sequential inputs are exactly where a
    // single LCG round's lattice shows up (the documented reason the
    // mixer has two rounds + xor-shift). 100k ids, every bucket within
    // 5 sigma of 1000.
    val nIds = 100000
    val buckets = new Array[Int](100)
    (0 until nIds).foreach { i =>
      buckets((PortableHash.mix(i + 1L) % 100).toInt) += 1
    }
    val exp = nIds / 100.0
    val sigmaB = math.sqrt(nIds * 0.01 * 0.99)
    buckets.zipWithIndex.foreach { case (c, b) =>
      assert(math.abs(c - exp) < 5 * sigmaB,
        s"sequential-seed bucket $b skewed: $c vs $exp")
    }
  }

  test("l41 span fold: SQL spans equal the Scala reference; " +
      "transpositions change the hash") {
    import graft.functions.PortableHash
    import graft.operators.CurationOps
    import org.apache.spark.unsafe.types.UTF8String
    val w = 8
    def refSpans(toks: Seq[String]): Seq[Long] = {
      val th = toks.map(t => PortableHash.strHash(UTF8String.fromString(t)))
      if (th.size < w) Seq.empty
      else th.sliding(w).map(_.foldLeft(0L)((h, x) =>
        ((h * 131L + x) % 1000000007L + 1000000007L) % 1000000007L)).toSeq
    }
    val docsGen = Gen.chooseNum(2, 30).flatMap(n =>
      Gen.listOfN(n, Gen.identifier.suchThat(_.nonEmpty)))
    forSamples(docsGen, n = 15) { toks =>
      val df = Seq(Tuple1(toks)).toDF("th0")
        .select(expr(s"transform(th0, t -> ${Text.portableStrHashSql("t")})")
          .as("th"))
        .select(CurationOps.spanHashesExpr("th", w).as("spans"))
      val got = df.collect()(0).getSeq[Long](0)
      assert(got == refSpans(toks),
        s"SQL spans diverge from reference for $toks")
      // order sensitivity: swapping two adjacent distinct tokens inside
      // the first window must change that window's hash (the property
      // separating substring dedup from bag-of-words dedup)
      if (toks.size >= w && toks(0) != toks(1)) {
        val swapped = toks.updated(0, toks(1)).updated(1, toks(0))
        assert(refSpans(swapped).head != refSpans(toks).head,
          s"transposition invisible to span hash: $toks")
      }
    }
  }

  test("w09 session laws: sessions partition events, never overlap, " +
      "and always span at least the gap") {
    val ev = T.load(spark, sfDir, "events")
    val sess = ev
      .groupBy(col("user_id"), session_window(col("ts"), "6 hours"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("session_window.start").as("s"),
        col("session_window.end").as("e"), col("n"))
      .cache()
    try {
      // partition: every event lands in exactly one session
      val total = sess.agg(sum(col("n"))).collect()(0).getLong(0)
      assert(total == ev.count(), s"session event counts sum to $total")
      // no overlap: a user's next session starts at/after the previous
      // session's end (end = last event + gap, so the inactivity gap
      // between sessions is >= the threshold by construction)
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("s"))
      val overlaps = sess.withColumn("prev_e", lag(col("e"), 1).over(w))
        .filter(col("prev_e").isNotNull && col("s") < col("prev_e"))
        .count()
      assert(overlaps == 0, s"$overlaps overlapping sessions")
      // minimum span: end = last event + gap >= start + gap
      val short = sess
        .filter(col("e") < col("s") + expr("INTERVAL 6 HOURS")).count()
      assert(short == 0, s"$short sessions shorter than the gap")
    } finally sess.unpersist()
  }

  test("codec round-trip: decode(encode(...)) recovers dimensions and " +
      "exact sums for arbitrary PPM images and WAV payloads") {
    import graft.operators.Multimodal
    val imgGen = for {
      w <- Gen.choose(1, 17)
      h <- Gen.choose(1, 13)
      seed <- Gen.choose(0, 1000000)
    } yield (w, h, seed)
    forSamples(imgGen) { case (w, h, seed) =>
      val pix = (j: Int) => (seed * 31 + j) % 256
      val im = Multimodal.decodePpm(Multimodal.encodePpm(w, h, pix))
        .getOrElse(fail(s"decode failed for ${(w, h, seed)}"))
      assert((im.width, im.height) == ((w, h)))
      val expected = (0 until w * h * 3).map(pix(_).toLong)
      assert(im.rSum == expected.grouped(3).map(_.head).sum)
      assert(im.gSum == expected.grouped(3).map(_(1)).sum)
      assert(im.bSum == expected.grouped(3).map(_(2)).sum)
    }
    val wavGen = for {
      n <- Gen.choose(1, 300)
      rate <- Gen.oneOf(8000, 16000, 44100)
      seed <- Gen.choose(0, 1000000)
    } yield (n, rate, seed)
    forSamples(wavGen) { case (n, rate, seed) =>
      val samples = Array.tabulate(n)(i =>
        ((seed * 7 + i * 131) % 65536 - 32768).toShort)
      val au = Multimodal.decodeWav(Multimodal.encodeWav(rate, samples))
        .getOrElse(fail(s"decode failed for ${(n, rate, seed)}"))
      assert((au.channels, au.sampleRate, au.bitsPerSample) == ((1, rate, 16)))
      assert(au.nSamples == n.toLong)
      assert(au.sampleSum == samples.map(_.toLong).sum)
    }
  }

  test("l100 resize laws: identity at equal size, constant images stay " +
      "constant, the block partition tiles the source exactly") {
    import graft.operators.Multimodal
    val gen = for {
      w <- Gen.choose(4, 23)
      h <- Gen.choose(3, 17)
      seed <- Gen.choose(0, 1000000)
    } yield (w, h, seed)
    forSamples(gen) { case (w, h, seed) =>
      val pix = (j: Int) => (seed * 31 + j) % 256
      val bytes = Multimodal.encodePpm(w, h, pix)
      // identity: resizing to the source size is the gray decode itself
      val ident = Multimodal.resizeBoxGray(bytes, w, h)
        .getOrElse(fail("identity resize failed"))
      val gray = Multimodal.decodePpmGray(bytes).get._3
      assert(ident.toSeq == gray.toSeq)
      // constant image: any downsample of an all-42 image is all 42
      // (floor average of identical values is that value)
      val const = Multimodal.encodePpm(w, h, _ => 42)
      assert(Multimodal.resizeBoxGray(const, 4, 3).get.forall(_ == 42))
      // exact tiling: target block AREAS partition the w*h source, so
      // the area-weighted sum of block averages computed WITHOUT the
      // floor (re-derived here) equals the total gray mass — a gap or
      // overlap in the block bounds breaks this identity
      val (tw, th) = (4, 3)
      val areas = for (t <- 0 until tw * th) yield {
        val (tx, ty) = (t % tw, t / tw)
        ((tx + 1) * w / tw - tx * w / tw) * ((ty + 1) * h / th - ty * h / th)
      }
      assert(areas.sum == w * h && areas.forall(_ > 0))
      // and the kernel refuses to upsample rather than fabricating rows
      assert(Multimodal.resizeBoxGray(bytes, w + 1, h).isEmpty)
    }
  }

  test("q36-q40 TPC-H shape laws: pair symmetry, share bounds, " +
      "distribution completeness, small-qty subset, disjunct union") {
    // q36: only the two trade nations appear, never on both sides at once
    val vs = SparkEntry.queries("q36_volume_shipping")(spark, sfDir).collect()
    vs.foreach { r =>
      val (sn, cn) = (r.getString(0), r.getString(1))
      assert(Set("NATION_1", "NATION_2")(sn) && Set("NATION_1", "NATION_2")(cn))
      assert(sn != cn, "a nation traded with itself through the pair filter")
    }
    // q37: numerator bounded by denominator; permille in [0, 1000]
    SparkEntry.queries("q37_market_share")(spark, sfDir).collect().foreach {
      r =>
        val (num, den, pm) = (r.getLong(1), r.getLong(2), r.getLong(3))
        assert(num >= 0 && num <= den)
        assert(pm >= 0 && pm <= 1000)
    }
    // q38: the distribution partitions the customer set exactly
    val dist = SparkEntry.queries(
      "q38_order_count_distribution")(spark, sfDir)
      .agg(sum(col("custdist"))).collect().head.getLong(0)
    val nCust = T.load(spark, sfDir, "customer").count()
    assert(dist == nCust, s"distribution covers $dist of $nCust customers")
    // q39: small-quantity lines are a subset of the brand's lines
    val small = SparkEntry.queries("q39_small_qty_revenue")(spark, sfDir)
      .collect().head
    val brandLines = T.load(spark, sfDir, "lineitem")
      .join(T.load(spark, sfDir, "part")
          .filter(col("p_brand") === "Brand#1"),
        col("l_partkey") === col("p_partkey")).count()
    assert(small.getLong(0) <= brandLines)
    assert(small.getDouble(2) <= small.getDouble(1) / 7.0 + 0.01)
    // q40: the OR of the three branches never undercounts any single one
    val all = SparkEntry.queries("q40_disjunctive_revenue")(spark, sfDir)
      .collect().head.getLong(0)
    val b1 = T.load(spark, sfDir, "lineitem")
      .join(T.load(spark, sfDir, "part"),
        col("l_partkey") === col("p_partkey"))
      .filter(col("p_brand") === "Brand#1" &&
        col("p_size").between(1, 5) && col("l_quantity").between(1, 11))
      .count()
    assert(all >= b1, "disjunction dropped a branch")
  }

  test("l92/l93/w21/k14 laws: containment bounds, kappa range, " +
      "quantile monotonicity, merge = recompute") {
    // l92: per-direction subsets bound the either-direction union
    val c = SparkEntry.queries("l92_containment_audit")(spark, sfDir)
      .collect().head
    val (nc, nsa, nsb, nu) =
      (c.getLong(0), c.getLong(1), c.getLong(2), c.getLong(3))
    assert(nu <= nc && math.max(nsa, nsb) <= nu && nu <= nsa + nsb)
    // l93: kappa stays in [-1000, 1000], agreement bounded by total
    val k = SparkEntry.queries("l93_label_agreement")(spark, sfDir)
      .collect().head
    assert(k.getLong(1) <= k.getLong(0))
    assert(k.getLong(3) >= -1000 && k.getLong(3) <= 1000)
    // w21: three quantiles, monotone bins, exact lower edges
    val qs = SparkEntry.queries("w21_histogram_quantiles")(spark, sfDir)
      .collect()
    assert(qs.map(_.getLong(0)).toSeq == Seq(50L, 90L, 99L))
    assert(qs.map(_.getLong(1)).toSeq ==
      qs.map(_.getLong(1)).toSeq.sorted)
    qs.foreach(r => assert(r.getDouble(2) == r.getLong(1) * 15.625))
    // k14: the partial-merge result equals a from-scratch recompute
    val merged = SparkEntry.queries("k14_delta_agg_merge")(spark, sfDir)
    val direct = T.loadEvents(spark, sfDir)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum((T.dec2(col("value")) * 100).cast("long")).as("sum_cents"),
        min(col("ts")).as("first_ts"), max(col("ts")).as("last_ts"))
      .orderBy("user_id")
    assert(merged.exceptAll(direct).isEmpty &&
      direct.exceptAll(merged).isEmpty,
      "merged partials diverge from the from-scratch aggregate")
  }

  test("t13: CDC upsert final state is invariant to how the stream " +
      "is sliced into batches (apply is commutative by total order)") {
    import graft.streaming.Streaming
    val byEight = Streaming.queries("t13_cdc_upsert")(spark, sfDir)
    // re-slice by a different modulus AND a time-ordered split: both
    // must converge to the identical latest-per-key state
    val ev = T.loadEvents(spark, sfDir)
      .select(col("user_id"),
        struct(col("ts"), col("event_id"), col("value"),
          col("event_type")).as("top"))
    val direct = ev.groupBy(col("user_id"))
      .agg(max(col("top")).as("top"), count(lit(1)).as("n_versions"))
      .select(col("user_id"), col("n_versions"),
        col("top.value").as("last_value"),
        col("top.event_type").as("last_event_type"),
        col("top.ts").as("last_ts"))
    assert(byEight.exceptAll(direct).isEmpty &&
      direct.exceptAll(byEight).isEmpty,
      "batch-sliced CDC apply diverged from the order-free fold")
  }

  test("w22: the prefix-sum closed form equals the sequential CUSUM " +
      "recursion on arbitrary integer series") {
    val series = Gen.listOfN(24, Gen.chooseNum(0L, 500L))
    forSamples(series) { xs =>
      if (xs.nonEmpty) {
        val n = xs.length.toLong
        val t = xs.sum
        val e = xs.map(_ * n - t)
        // sequential recursion: S_i = max(0, S_{i-1} + e_i)
        val seq = e.scanLeft(0L)((s, v) => math.max(0L, s + v)).tail
        // closed form: P_i − min(0, min_{j≤i} P_j)
        val p = e.scanLeft(0L)(_ + _).tail
        val closed = p.zipWithIndex.map { case (pi, i) =>
          pi - math.min(0L, p.take(i + 1).min)
        }
        assert(seq == closed,
          s"CUSUM closed form diverged from the recursion on $xs")
      }
    }
  }

  test("w23: the rank-sum Gini equals the mean-absolute-difference " +
      "definition on arbitrary value sets") {
    val vals = Gen.listOfN(16, Gen.chooseNum(1L, 10000L))
    forSamples(vals) { vs =>
      if (vs.nonEmpty && vs.sum > 0) {
        val n = vs.length.toLong
        val tot = vs.sum
        val sorted = vs.sorted
        val rankW = sorted.zipWithIndex
          .map { case (v, i) => (i + 1) * v }.sum
        val giniRank = 1000L * (2 * rankW - (n + 1) * tot) / (n * tot)
        // definition: G = Σᵢⱼ|vᵢ−vⱼ| / (2n²μ) = Σ|..|·1000 / (2n·tot)
        val absSum = (for (a <- vs; b <- vs) yield math.abs(a - b)).sum
        val giniDef = 1000L * absSum / (2 * n * tot)
        assert(giniRank == giniDef,
          s"rank-sum Gini diverged from the pairwise definition on $vs")
      }
    }
  }

  test("s11 generator contracts: frequency ordering, bounds, id " +
      "uniqueness (the reference's simulator distribution laws)") {
    // Mirrors tests/test_taxi_simulator.py:151-218 — the reference
    // asserts its generator's DISTRIBUTIONS, not just row counts:
    // payment-type frequency ordering (:151-163), per-type value
    // tendency (:165-183), duration bounds (:195-201), coordinate
    // bounds (:203-218), and unique prefixed ids (:130-149). The s11
    // source carries the same contracts over its own columns, and
    // because every column is a deterministic mixer of the row id the
    // laws are exact facts of the formula, not flaky sampling.
    val rows = 100000L
    val g = spark.read.format("graft.sources.SeqSourceProvider")
      .option("rows", rows.toString).option("slices", "8").load()
    val byType = g.groupBy("event_type")
      .agg(count(lit(1)).as("n"), avg(col("value")).as("mean_v"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    // weight cuts 40/25/15/15/5 ⇒ strict frequency ordering on the
    // distinct weights (view > click > {purchase, signup} > error) —
    // the payment_type card > cash > no_charge > dispute analog
    val n = byType.view.mapValues(_._1).toMap
    assert(n("view") > n("click") && n("click") > n("purchase") &&
      n("purchase") > n("error"))
    assert(n("click") > n("signup") && n("signup") > n("error"))
    assert(n.values.sum == rows)
    // value is type-independent by construction: every per-type mean
    // sits near the global ~49.995 (the tip-tendency analog, with a
    // deterministic rather than probabilistic tolerance)
    byType.values.foreach { case (_, m) => assert(math.abs(m - 50.0) < 2.0) }
    // bounds: value ∈ [0, 100), ts within the 30-day corpus window
    // (the coordinate/duration-bounds analog)
    val b = g.agg(min("value"), max("value"), min("ts"), max("ts"))
      .collect()(0)
    assert(b.getDouble(0) >= 0.0 && b.getDouble(1) < 100.0)
    val epoch = java.time.Instant.parse("2024-01-01T00:00:00Z")
    val lo = b.getTimestamp(2).toInstant
    val hi = b.getTimestamp(3).toInstant
    assert(!lo.isBefore(epoch) &&
      hi.isBefore(epoch.plusSeconds(30L * 24 * 3600)))
    // id uniqueness at scale (the hist_-prefix trip-id uniqueness
    // analog): the id grid is dense [0, rows) with no dup, no gap
    val ids = g.agg(countDistinct("event_id"), min("event_id"),
      max("event_id")).collect()(0)
    assert(ids.getLong(0) == rows && ids.getLong(1) == 0L &&
      ids.getLong(2) == rows - 1)
  }

  test("native portable_str_hash / token_hashes are bit-equal to the HOF " +
      "character fold, including multi-byte code points") {
    // adversarial panel: ASCII, accents, CJK, emoji (4-byte), empties,
    // and real corpus tokens
    val panel = Seq("", "a", "ab", "héllo", "日本語テキスト", "🚀x🚀",
      "mixed ascii é 日 🚀 end", "  spaces  ")
      .toDF("s")
    val fromPanel = panel
      .select(expr(Text.portableStrHashSql("s")).as("hof"),
        Text.portableHash($"s").as("native"))
      .as[(Long, Long)].collect()
    fromPanel.foreach { case (hof, native) => assert(hof == native) }
    // corpus tokens through the array form, HOF transform vs native map
    val rows = spark.read.parquet(s"$sfDir/documents.parquet").limit(100)
      .select($"doc_id", Text.tokens($"text").as("tk"))
      .localCheckpoint()
      .select($"doc_id",
        expr(s"transform(tk, t -> ${Text.portableStrHashSql("t")})")
          .as("hof"),
        Text.tokenHashesNative($"tk").as("native"))
      .as[(Long, Seq[Long], Seq[Long])].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, hof, native) =>
      assert(hof == native, s"doc $id diverged")
    }
    // and the expressions stay inside whole-stage codegen (checked on
    // a parquet-backed frame — a local panel folds into a
    // LocalTableScan before any codegen stage exists)
    val df = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(Text.portableHash($"text").as("h"),
        Text.tokenHashesNative(Text.tokens($"text")).as("th"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
        l.contains("portable_str_hash") && l.contains("*(")),
      s"portable_str_hash not codegen'd:\n$plan")
    assert(plan.contains("token_hashes"),
      s"token_hashes missing from the projection:\n$plan")
  }
}
