package graft.tools
import graft.operators.{Pq, Similarity}
import graft.tables.Tables.embeddings
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object PqRecall {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = embeddings(spark, "/root/testdata/sf0.001").select("vec_id", "embedding")
    val q = e.filter(col("vec_id") < 50)
    val brute = Similarity.bruteKnn(e, q, "vec_id", "embedding", k = 5)
      .select(col("query_id"), col("neighbor_id")).cache()
    val denom = brute.count()
    for ((m, ksub, sl) <- Seq((8,16,50),(8,16,100),(16,16,50),(8,64,50),(4,16,100))) {
      val pq = Pq.pqKnnRerank(e, q, "vec_id", "embedding", k = 5, shortlist = sl, m = m, ksub = ksub)
        .select(col("query_id"), col("neighbor_id"))
      val hit = brute.intersect(pq).count()
      println(s"RECALL m=$m ksub=$ksub shortlist=$sl -> ${hit.toDouble / denom}")
    }
    spark.stop()
  }
}
