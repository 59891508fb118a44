package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Expression-level pin of [[NearestCells]]' ordering logic against
  * the broadcast-join + row_number window formulation it replaced
  * (r15, advice item): the operator specs and the oracle suite cover
  * it only transitively, on well-behaved vectors — this drives the
  * edges directly: exact score TIES (duplicate centroids → lower cell
  * wins), NaN scores (a zero vector's cosine is 0/0 against every
  * centroid → DESC ranks NaN above all), null scores from
  * length-mismatched vectors (DESC nulls-last for cosine, ASC
  * nulls-first for sqDist), and keep > |cells| truncation.
  */
class NearestCellsSpec extends SparkSpec {
  import spark.implicits._

  private val cents: Seq[(Long, IndexedSeq[Double])] = Seq(
    (3L, IndexedSeq(1.0, 0.0)),
    (5L, IndexedSeq(1.0, 0.0)), // duplicate of cell 3 → exact ties
    (7L, IndexedSeq(0.0, 1.0)),
    (9L, IndexedSeq(0.6, 0.8)),
    (11L, IndexedSeq(0.5, 0.5, 0.5))) // length-3 centroid: MIXES null
                                      // and real scores per vector

  private def vecs: DataFrame = Seq(
    (10L, Seq(1.0, 0.0)),       // exact tie between cells 3 and 5
    (11L, Seq(0.0, 0.0)),       // zero vector → cosine NaN everywhere
    (12L, Seq(0.2, 0.9)),       // ordinary
    (13L, Seq(1.0, 2.0, 3.0)),  // length mismatch → null scores
    (14L, Seq(-1.0, 0.0))       // negative cosines, sqDist ties
  ).toDF("id", "v")

  /** The replaced formulation, verbatim: broadcast join + per-vector
    * row_number over (score DESC|ASC, cell ASC) with Spark's own
    * NaN/null window semantics, same sequential-fold scores.
    */
  private def windowForm(bySqDist: Boolean, keep: Int): DataFrame = {
    val cdf = cents.toDF("cell", "cv")
    val score =
      if (bySqDist)
        aggregate(zip_with(col("v"), col("cv"),
          (x, y) => (x.cast(DoubleType) - y) * (x.cast(DoubleType) - y)),
          lit(0.0), (acc, d) => acc + d)
      else graft.functions.VectorFns.cosine(col("v"), col("cv"))
    val w = Window.partitionBy(col("id")).orderBy(
      if (bySqDist) col("score").asc else col("score").desc, col("cell"))
    vecs.crossJoin(broadcast(cdf))
      .withColumn("score", score)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= keep)
      .select(col("id"), (col("rn") - 1).cast("int").as("pos"),
        col("cell"), col("score"))
  }

  private def kernelForm(bySqDist: Boolean, keep: Int): DataFrame =
    vecs.select(col("id"),
        posexplode(NearestCells.single(col("v"), cents, keep, bySqDist))
          .as(Seq("pos", "c")))
      .select(col("id"), col("pos").cast("int").as("pos"),
        col("c.cell").as("cell"), col("c.score").as("score"))

  /** (id, pos, cell, score-bits-or-null) rows, order-canonicalized;
    * bit comparison keeps NaN distinguishable and exact.
    */
  private def canon(df: DataFrame): Seq[(Long, Int, Long, Any)] =
    df.collect().map { r =>
      (r.getLong(0), r.getInt(1), r.getLong(2),
        if (r.isNullAt(3)) null
        else java.lang.Double.doubleToLongBits(r.getDouble(3)))
    }.toSeq.sortBy(t => (t._1, t._2))

  for (bySqDist <- Seq(false, true); keep <- Seq(1, 2, 5, 16)) {
    val mode = if (bySqDist) "sqDist" else "cosine"
    test(s"NearestCells == join+window on ties/NaN/null edges " +
        s"($mode, keep=$keep)") {
      assert(canon(kernelForm(bySqDist, keep)) ===
        canon(windowForm(bySqDist, keep)))
    }
  }

  test("tie rule: duplicate centroids rank lower cell first; zero " +
      "vector ranks NaN above every real cosine") {
    val rows = canon(kernelForm(bySqDist = false, keep = 5))
    val tie = rows.filter(_._1 == 10L).map(t => (t._2, t._3))
    assert(tie.take(2) === Seq((0, 3L), (1, 5L))) // lower cell first
    val zero = rows.filter(_._1 == 11L)
    // length-2 NaNs (cells 3,5,7,9) rank above the null from the
    // length-3 centroid (cell 11 — cosine DESC puts null LAST)
    assert(zero.map(_._3) === Seq(3L, 5L, 7L, 9L, 11L))
    assert(zero.take(4).forall(t =>
      java.lang.Double.longBitsToDouble(t._4.asInstanceOf[Long]).isNaN))
    assert(zero.last._4 == null)
  }

  test("length mismatch: cosine ranks null scores LAST, sqDist FIRST " +
      "(the asymmetry the window order implies)") {
    val cos10 = canon(kernelForm(bySqDist = false, keep = 5))
      .filter(_._1 == 10L)
    assert(cos10.last._3 === 11L && cos10.last._4 == null)
    val sq10 = canon(kernelForm(bySqDist = true, keep = 5))
      .filter(_._1 == 10L)
    assert(sq10.head._3 === 11L && sq10.head._4 == null) // nulls FIRST
    // a vector matching ONLY the length-3 centroid keeps that real
    // score and null everywhere else
    val sq13 = canon(kernelForm(bySqDist = true, keep = 5))
      .filter(_._1 == 13L)
    assert(sq13.take(4).forall(_._4 == null)) // 4 mismatched cells first
    assert(sq13.last._3 === 11L && sq13.last._4 != null)
  }
}
