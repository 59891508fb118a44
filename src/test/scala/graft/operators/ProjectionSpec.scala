package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProjectionSpec extends SparkSpec {
  import spark.implicits._

  // deterministic pseudo-random unit-free vectors (fixed LCG, no RNG)
  private var seed = 12345L
  private def next(): Double = {
    seed = seed * 6364136223846793005L + 1442695040888963407L
    (seed >>> 11).toDouble / (1L << 53).toDouble - 0.5
  }

  private def vecs(n: Int, d: Int) = {
    seed = 12345L
    (0 until n).map(i => (i.toLong, Array.fill(d)(next().toFloat)))
      .toDF("vec_id", "embedding")
  }

  /** Clustered corpus — the shape real embedding tables have (iid
    * vectors concentrate to near-equal pairwise distances in 64-d, so
    * neighbor identity there is pure noise that NO distance-preserving
    * compression could keep; cluster structure is what ANN recall is
    * measured on).
    */
  private def clusteredVecs(centers: Int, perCenter: Int, d: Int) = {
    seed = 98765L
    val cs = Array.fill(centers)(Array.fill(d)(next()))
    (0 until centers * perCenter).map { i =>
      val c = cs(i % centers)
      (i.toLong, c.map(x => (x + 0.08 * next()).toFloat))
    }.toDF("vec_id", "embedding")
  }

  test("projection output shape and determinism") {
    val df = vecs(50, 64)
    val a = Projection.randomProject(df, "embedding", 64, 16)
      .orderBy("vec_id").as[(Long, Array[Double])].collect()
    val b = Projection.randomProject(df, "embedding", 64, 16)
      .orderBy("vec_id").as[(Long, Array[Double])].collect()
    assert(a.length == 50 && a.forall(_._2.length == 16))
    assert(a.zip(b).forall { case ((i1, v1), (i2, v2)) =>
      i1 == i2 && v1.sameElements(v2) })
  }

  test("pairwise squared distances correlate after 64->36 projection") {
    val n = 60
    val df = clusteredVecs(10, 6, 64)
    val orig = df.orderBy("vec_id").as[(Long, Array[Float])].collect()
      .map(_._2.map(_.toDouble))
    val proj = Projection.randomProject(df, "embedding", 64, 36)
      .orderBy("vec_id").as[(Long, Array[Double])].collect().map(_._2)
    def d2(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val pairs = for (i <- 0 until n; j <- i + 1 until n)
      yield (d2(orig(i), orig(j)), d2(proj(i), proj(j)))
    val (xs, ys) = (pairs.map(_._1), pairs.map(_._2))
    val (mx, my) = (xs.sum / xs.size, ys.sum / ys.size)
    val cov = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum
    val corr = cov / math.sqrt(
      xs.map(x => (x - mx) * (x - mx)).sum *
      ys.map(y => (y - my) * (y - my)).sum)
    assert(corr > 0.8, s"distance correlation $corr")
    // unbiasedness: mean projected/original distance ratio near 1
    val ratio = ys.sum / xs.sum
    assert(ratio > 0.7 && ratio < 1.3, s"mean distance ratio $ratio")
  }

  test("knn in projected space recovers a useful fraction of true neighbors") {
    val df = clusteredVecs(15, 10, 64)
    val queries = df.filter(col("vec_id") < 20)
    val trueNn = Similarity.bruteKnn(df, queries, "vec_id", "embedding", 10)
      .select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().groupBy(_._1)
      .map { case (q, ns) => q -> ns.map(_._2).toSet }
    val proj = Projection.randomProject(df, "embedding", 64, 16)
    val projNn = Similarity.bruteKnn(proj,
        proj.filter(col("vec_id") < 20), "vec_id", "proj", 10)
      .select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().groupBy(_._1)
      .map { case (q, ns) => q -> ns.map(_._2).toSet }
    val recall = trueNn.keys.toSeq.map(q =>
      (trueNn(q) & projNn(q)).size.toDouble / trueNn(q).size).sum /
      trueNn.size
    assert(recall >= 0.5, s"recall@10 after 4x compression = $recall")
  }

  test("non-square output dim is rejected") {
    intercept[IllegalArgumentException] {
      Projection.randomProject(vecs(3, 64), "embedding", 64, 20)
    }
  }
}
