package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VectorFnsSpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (1L, Seq(1.0f, 0.0f, 0.0f)),
    (2L, Seq(0.0f, 1.0f, 0.0f)),
    (3L, Seq(2.0f, 0.0f, 0.0f)),
    (4L, Seq(1.0f, 1.0f, 0.0f)))

  test("cosine: identity=1, orthogonal=0, scale-invariant") {
    val df = vecs.toDF("id", "v")
    val pairs = df.as("a").crossJoin(df.as("b"))
      .select($"a.id".as("ia"), $"b.id".as("ib"),
        VectorFns.cosine($"a.v", $"b.v").as("cos"))
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, c) => (a, b) -> c }.toMap
    assert(pairs((1L, 1L)) == 1.0)
    assert(pairs((1L, 2L)) == 0.0)
    assert(pairs((1L, 3L)) == 1.0) // scale-invariant
    assert(math.abs(pairs((1L, 4L)) - math.sqrt(0.5)) < 1e-12)
  }

  test("lshBucket: deterministic, scale-invariant, bounded") {
    val df = vecs.toDF("id", "v")
      .select($"id", VectorFns.lshBucket($"v", 8).as("b"))
    val m = df.as[(Long, Long)].collect().toMap
    val m2 = vecs.toDF("id", "v")
      .select($"id", VectorFns.lshBucket($"v", 8).as("b"))
      .as[(Long, Long)].collect().toMap
    assert(m == m2)                  // deterministic across runs
    assert(m(1L) == m(3L))           // same direction → same bucket
    assert(m.values.forall(b => b >= 0 && b < 256))
  }
}
