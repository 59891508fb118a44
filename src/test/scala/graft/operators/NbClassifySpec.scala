package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NbClassifySpec extends SparkSpec {
  import spark.implicits._

  private def corpus() = Seq(
    // clearly separable vocabularies per label
    (1L, "code", "def foo return class import lambda"),
    (2L, "code", "class bar import def return yield"),
    (3L, "code", "import os def main return print"),
    (4L, "news", "president election vote parliament today"),
    (5L, "news", "election results president announced today"),
    (6L, "news", "parliament vote passed law today"),
    (7L, "recipe", "flour sugar butter oven bake minutes"),
    (8L, "recipe", "sugar eggs butter whisk bake oven"),
    (9L, "recipe", "oven flour eggs bake sugar minutes")
  ).toDF("id", "label", "text")

  test("nbClassify recovers the label of held-out docs from " +
    "separable vocabularies") {
    val train = corpus()
    val tests = Seq(
      (101L, "def import return lambda"),
      (102L, "president parliament vote"),
      (103L, "butter oven bake flour")
    ).toDF("id", "text")
    val preds = TextAnalysis
      .nbClassify(train, tests, "label", "id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(preds === Map(101L -> "code", 102L -> "news",
      103L -> "recipe"))
  }

  test("nbClassify scores are negative log-probabilities; argmax " +
    "beats the others") {
    val train = corpus()
    val tests = Seq((201L, "def import bake")).toDF("id", "text")
    val row = TextAnalysis
      .nbClassify(train, tests, "label", "id", "text").collect().head
    assert(row.getDouble(2) < 0.0) // ln-prob sum is negative
  }

  test("nbClassify never drops a scored doc with at least one token, " +
    "even when every token is out-of-vocabulary") {
    val train = corpus()
    val tests = Seq((301L, "zzz qqq www")).toDF("id", "text")
    val rows = TextAnalysis
      .nbClassify(train, tests, "label", "id", "text").collect()
    assert(rows.length === 1)
    // all labels tie on pure-smoothing scores except via ln(tok_l+V)
    // and prior; prediction must still be deterministic
    assert(Set("code", "news", "recipe").contains(rows.head.getString(1)))
  }

  test("nbClassify is invariant to input partitioning") {
    val train = corpus()
    val tests = Seq((401L, "def sugar president import import"))
      .toDF("id", "text")
    val a = TextAnalysis.nbClassify(train.repartition(7), tests,
      "label", "id", "text").collect().head
    val b = TextAnalysis.nbClassify(train.coalesce(1), tests,
      "label", "id", "text").collect().head
    assert(a.getString(1) === b.getString(1))
    assert(a.getDouble(2) === b.getDouble(2))
  }
}
