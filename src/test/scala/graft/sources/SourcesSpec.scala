package graft.sources

import graft.SparkSpec

class SourcesSpec extends SparkSpec {

  // the spark-sql-kafka connector ships as a separate artifact and is
  // not on this container's classpath — the wrapper resolves the source
  // at plan time, so the observable behavior here is the connector
  // lookup itself (a deployment with the connector jar gets the full
  // (key, value, topic, partition, offset, timestamp) frame)
  test("kafka wrappers reach the connector lookup (jar not bundled here)") {
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      Sources.kafka(spark, "broker:9092", "ODS_BASE_LOG")
    }
    assert(e.getMessage.contains("kafka"))
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      Sources.kafkaFrom(spark, "broker:9092", "ODS_BASE_DB",
        """{"ODS_BASE_DB":{"0":1234,"1":5678}}""")
    }
    assert(e2.getMessage.contains("kafka"))
  }

  test("jsonLines dev source mirrors the kafka value shape") {
    val dir = java.nio.file.Files.createTempDirectory("jsonl").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/a.txt"), "{\"x\":1}\n")
    val df = Sources.jsonLines(spark, dir)
    assert(df.isStreaming && df.columns.toSeq == Seq("value"))
  }
}
