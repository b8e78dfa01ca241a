package graft

import graft.functions.Geo

/** Geohash known-vector tests (the one scalar DuckDB cannot oracle). */
class ScalarsSpec extends SparkSpec {
  import spark.implicits._

  test("x21: pseudonymization is deterministic, collision-free at test " +
      "scale, and matches a JVM sha256 recomputation") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("x21_pseudonymize")(spark, sfDir)
      .collect()
    assert(out.length === 10)
    // zero collisions at this scale, and every row agrees on the audit
    assert(out.forall(_.getLong(3) === 0L))
    // tokens recompute byte-for-byte with java.security sha256
    val md = java.security.MessageDigest.getInstance("SHA-256")
    out.foreach { r =>
      val uid = r.getLong(0)
      val hex = md.digest(s"corpus-v1:$uid".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(16)
      assert(r.getString(1) === hex, s"token mismatch for user $uid")
    }
    // determinism: a second run yields the identical mapping
    val again = SparkEntry.queries("x21_pseudonymize")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(again.toSeq === out.map(r => (r.getLong(0), r.getString(1))).toSeq)
  }

  test("geohash matches published test vectors") {
    assert(Geo.encode(42.605, -5.603, 5) == "ezs42")
    assert(Geo.encode(57.64911, 10.40744, 11) == "u4pruydqqvj")
    assert(Geo.encode(0.0, 0.0, 7) == "s000000")
    assert(Geo.encode(-90.0, -180.0, 5) == "00000")
  }

  test("geohash runs as a native codegen expression (no ScalaUDF node)") {
    val df = Seq((57.64911, 10.40744)).toDF("lat", "lon")
      .withColumn("gh", Geo.geohashCol($"lat", $"lon", 7))
    assert(df.select("gh").as[String].head() == "u4pruyd")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("UDF"), s"expected no UDF node in:\n$plan")
    // null-safe: a null coordinate yields a null geohash, not a crash
    val n = Seq((Option.empty[Double], Option(10.0))).toDF("lat", "lon")
      .withColumn("gh", Geo.geohashCol($"lat", $"lon", 7))
      .select("gh").as[Option[String]].head()
    assert(n.isEmpty)
  }

  test("geohash is registered as a SQL function via GraftExtensions") {
    graft.core.GraftExtensions.register(spark)
    val out = spark.sql(
      "SELECT geohash(57.64911D, 10.40744D, 7) AS gh").as[String].head()
    assert(out == "u4pruyd")
  }

  test("geohash prefix property: nearby points share prefixes") {
    val a = Geo.encode(40.7484, -73.9857, 8)
    val b = Geo.encode(40.7485, -73.9858, 8)
    assert(a.take(6) == b.take(6))
    val far = Geo.encode(-33.8688, 151.2093, 8)
    assert(a.take(2) != far.take(2))
  }

  test("x14: exact-sum closed forms agree with Spark's native statistics") {
    import org.apache.spark.sql.functions._
    val li = graft.core.Tables.load(spark, sfDir, "lineitem")
      .select(col("l_returnflag"), col("l_quantity").cast("double").as("x"),
        (col("l_extendedprice") * 100).as("y"))
    val native = li.groupBy("l_returnflag")
      .agg(corr(col("x"), col("y")).as("c"),
        covar_samp(col("x"), col("y")).as("cv"),
        regr_slope(col("y"), col("x")).as("sl"),
        regr_intercept(col("y"), col("x")).as("ic"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    val ours = SparkEntry.queries("x14_stat_aggs")(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    assert(ours.keySet == native.keySet)
    def close(a: Double, b: Double): Boolean =
      math.abs(a - b) <= 1e-9 * math.max(1.0, math.max(math.abs(a), math.abs(b)))
    ours.foreach { case (flag, (c, cv, sl, ic)) =>
      val (nc, ncv, nsl, nic) = native(flag)
      assert(close(c, nc), s"$flag corr $c vs native $nc")
      assert(close(cv, ncv), s"$flag covar $cv vs native $ncv")
      assert(close(sl, nsl), s"$flag slope $sl vs native $nsl")
      assert(close(ic, nic), s"$flag intercept $ic vs native $nic")
    }
  }
}
