// A/B harness (dev-only): sbt console < tools/ab_jaccard.scala
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFns

val s = SparkSession.builder().master("local[32]")
  .config("spark.sql.shuffle.partitions", "32")
  .config("spark.sql.session.timeZone", "UTC")
  .config("spark.ui.enabled", "false").getOrCreate()
s.sparkContext.setLogLevel("ERROR")
val docs = graft.tables.Tables.documents(s, "/root/testdata/sf0.1")

def fanOut(df: org.apache.spark.sql.DataFrame) =
  df.repartition(32)

// variant A: counts-join (original)
def variantA() = {
  val sh = fanOut(docs).select(col("doc_id").as("did"),
    explode(array_distinct(TextFns.shingles(col("text"), 3))).as("sh"))
  val counts = sh.groupBy("did").agg(count(lit(1)).as("nsh"))
  val inter = sh.as("a").join(sh.as("b"),
      col("a.sh") === col("b.sh") && col("a.did") < col("b.did"))
    .groupBy(col("a.did").as("id_a"), col("b.did").as("id_b"))
    .agg(count(lit(1)).as("inter"))
  inter.join(counts.withColumnRenamed("did","id_a").withColumnRenamed("nsh","nsh_a"), "id_a")
    .join(counts.withColumnRenamed("did","id_b").withColumnRenamed("nsh","nsh_b"), "id_b")
    .withColumn("jaccard", col("inter").cast("double") /
      (col("nsh_a") + col("nsh_b") - col("inter")).cast("double"))
    .filter(col("jaccard") >= 0.5)
    .select("id_a","id_b","jaccard")
}
// variant B: shared sh-exchange
def variantB() = {
  val sh = fanOut(docs).select(col("doc_id").as("did"),
    explode(array_distinct(TextFns.shingles(col("text"), 3))).as("sh"))
    .repartition(col("sh"))
  val counts = sh.groupBy("did").agg(count(lit(1)).as("nsh"))
  val inter = sh.as("a").join(sh.as("b"),
      col("a.sh") === col("b.sh") && col("a.did") < col("b.did"))
    .groupBy(col("a.did").as("id_a"), col("b.did").as("id_b"))
    .agg(count(lit(1)).as("inter"))
  inter.join(counts.withColumnRenamed("did","id_a").withColumnRenamed("nsh","nsh_a"), "id_a")
    .join(counts.withColumnRenamed("did","id_b").withColumnRenamed("nsh","nsh_b"), "id_b")
    .withColumn("jaccard", col("inter").cast("double") /
      (col("nsh_a") + col("nsh_b") - col("inter")).cast("double"))
    .filter(col("jaccard") >= 0.5)
    .select("id_a","id_b","jaccard")
}

def time(tag: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
  val t0 = System.nanoTime()
  f.write.format("noop").mode("overwrite").save()
  println(s"AB $tag ${(System.nanoTime()-t0)/1e9}")
}
// warmup
docs.write.format("noop").mode("overwrite").save()
time("A1")(variantA()); time("B1")(variantB())
time("A2")(variantA()); time("B2")(variantB())
time("A3")(variantA()); time("B3")(variantB())
sys.exit(0)
