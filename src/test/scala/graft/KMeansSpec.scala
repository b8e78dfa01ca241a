package graft

import org.apache.spark.sql.functions._
import graft.operators.KMeansOps

/** Contracts of the Lloyd trainer the oracle cannot see: per-iteration
  * WCSS monotonicity and cluster recovery on planted data. */
class KMeansSpec extends SparkSpec {
  import spark.implicits._

  /** Three tight planted clusters in 4-d, far apart; the first 3
    * vectors (the deterministic seeds) sit one per cluster so Lloyd
    * must recover the planting exactly. */
  private def planted = {
    val centers = Seq(
      Array(0.0, 0.0, 0.0, 0.0),
      Array(10.0, 10.0, 0.0, 0.0),
      Array(0.0, 0.0, 10.0, 10.0))
    // deterministic jitter: point j of cluster c offset by ±0.1·digit
    val rows = for {
      c <- centers.indices
      j <- 0 until 20
    } yield {
      val off = 0.01 * ((j * 7 + c * 3) % 10)
      val v = centers(c).map(_ + off)
      // vec_ids 0,1,2 are the three seeds — one per cluster
      (if (j == 0) c.toLong else (3 + c * 19 + (j - 1)).toLong, c, v)
    }
    rows.toDF("vec_id", "planted", "vec")
  }

  test("l32: WCSS never increases across Lloyd iterations") {
    val m = KMeansOps.train(planted, 3, 4)
    assert(m.wcss.size == 4)
    m.wcss.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a + 1e-9, s"WCSS rose: ${m.wcss}")
    }
  }

  test("l32: planted clusters are recovered exactly from seed init") {
    val m = KMeansOps.train(planted, 3, 4)
    // each trained centroid must sit on its planted center (within the
    // jitter radius), in seed order
    m.centroids.zipWithIndex.foreach { case (c, i) =>
      val expected = Seq(
        Array(0.0, 0.0, 0.0, 0.0),
        Array(10.0, 10.0, 0.0, 0.0),
        Array(0.0, 0.0, 10.0, 10.0))(i)
      val dist = math.sqrt(c.zip(expected).map { case (a, b) =>
        (a - b) * (a - b) }.sum)
      assert(dist < 0.2, s"centroid $i drifted: ${c.mkString(",")}")
    }
  }

  test("l32: entry publishes the training contract") {
    val r = SparkEntry.queries("l32_kmeans_train")(spark, sfDir).collect()(0)
    assert(r.getAs[Long]("n_points") > 0)
    assert(r.getAs[Boolean]("wcss_improved"))
  }
}
