// A/B (dev-only): { echo ':paste'; cat tools/ab_simhash.scala; printf '\x04'; } | sbt console
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFns

val s = SparkSession.builder().master("local[32]")
  .config("spark.sql.shuffle.partitions", "32")
  .config("spark.sql.session.timeZone", "UTC")
  .config("spark.ui.enabled", "false").getOrCreate()
s.sparkContext.setLogLevel("ERROR")
val docs = graft.tables.Tables.documents(s, "/root/testdata/sf0.1")

def pairs(shareExchange: Boolean): DataFrame = {
  val hashed = docs.repartition(32).select(col("doc_id").as("did"),
      explode(TextFns.toks(col("text"))).as("t"))
    .select(col("did"), TextFns.hash32(col("t")).as("m"))
  val bitAggs = (0 until 16).map(b =>
    sum(when(shiftright(col("m"), b) % 2 === 1, 1L).otherwise(-1L)).as(s"b$b"))
  val sigs0 = hashed.groupBy("did").agg(bitAggs.head, bitAggs.tail: _*)
    .select(col("did"), (0 until 16).map(b =>
      when(col(s"b$b") > 0, lit(1L << b)).otherwise(lit(0L)))
      .reduce(_ + _).as("sig"))
  val sigs = if (shareExchange) sigs0.repartition(col("sig")) else sigs0
  val distinctSigs = sigs.select(col("sig")).distinct()
  val banded = distinctSigs.select(col("sig"),
      explode(array((0 until 4).map(i => struct(lit(i).as("bi"),
        (shiftright(col("sig"), 4 * i) % 16).as("bv"))): _*)).as("band"))
    .select(col("sig"), col("band.bi").as("bi"), col("band.bv").as("bv"))
  val sigPairs = banded.as("x").join(banded.as("y"),
      col("x.bi") === col("y.bi") && col("x.bv") === col("y.bv"))
    .select(col("x.sig").as("sig_a"), col("y.sig").as("sig_b"),
      TextFns.hamming(col("x.sig"), col("y.sig")).cast("int").as("hamming"))
    .filter(col("hamming") <= 3)
    .dropDuplicates("sig_a", "sig_b")
  sigs.as("a").join(broadcast(sigPairs), col("a.sig") === col("sig_a"))
    .join(sigs.as("b"), col("b.sig") === col("sig_b") && col("a.did") < col("b.did"))
    .select(col("a.did").as("id_a"), col("b.did").as("id_b"), col("hamming"))
}
def time(tag: String)(f: => DataFrame): Unit = {
  val t0 = System.nanoTime()
  f.write.format("noop").mode("overwrite").save()
  println(s"AB $tag ${(System.nanoTime()-t0)/1e9}")
}
docs.write.format("noop").mode("overwrite").save()
time("plain1")(pairs(false)); time("shared1")(pairs(true))
time("plain2")(pairs(false)); time("shared2")(pairs(true))
sys.exit(0)
