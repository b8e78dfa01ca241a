package graft

/** The driver contract itself: entry smoke, key hygiene, determinism of
  * the query registry. */
class ContractSpec extends SparkSpec {

  test("entry (flagship) returns rows on the smoke scale factor") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key names an implemented query") {
    assert((SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet).isEmpty)
  }

  test("query keys are unique across packs and non-empty") {
    val keys = SparkEntry.queries.keys.toSeq
    assert(keys.nonEmpty)
    assert(keys.distinct.size == keys.size)
    assert(keys.forall(_.matches("[a-z][a-z0-9_]+")))
  }

  test("testdata schema canary: every table loads; events.ts is a " +
      "session timestamp") {
    // The driver regenerated /root/testdata between rounds 7 and 8 with
    // a changed events.ts physical type (INT64 nanos -> TIMESTAMP
    // micros), which broke 20 tests mid-round. This canary makes the
    // next drift fail HERE, by name, at round start.
    import graft.core.{Tables => T}
    import org.apache.spark.sql.types._
    T.names.foreach { n =>
      val df = T.load(spark, sfDir, n)
      assert(df.columns.nonEmpty, s"$n loads no columns")
    }
    val ts = T.load(spark, sfDir, "events").schema("ts").dataType
    assert(ts == TimestampType,
      s"events.ts must load as TimestampType (got $ts) — update " +
        "Tables.loadEvents for the new physical spelling")
    val emb = T.load(spark, sfDir, "embeddings").schema("embedding").dataType
    assert(emb == ArrayType(FloatType, containsNull = true) ||
      emb == ArrayType(FloatType, containsNull = false),
      s"embeddings.embedding must stay array<float> (got $emb)")
  }

  test("oracle SQL never references scratch paths or engine internals") {
    SparkEntry.oracleSql.foreach { case (k, sql) =>
      assert(!sql.contains("target/scratch"), s"$k oracle reads scratch")
      assert(!sql.toLowerCase.contains("xxhash"), s"$k oracle uses Spark hash")
    }
  }
}
