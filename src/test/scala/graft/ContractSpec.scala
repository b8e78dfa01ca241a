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

  test("oracle SQL never references scratch paths or engine internals") {
    SparkEntry.oracleSql.foreach { case (k, sql) =>
      assert(!sql.contains("target/scratch"), s"$k oracle reads scratch")
      assert(!sql.toLowerCase.contains("xxhash"), s"$k oracle uses Spark hash")
    }
  }
}
