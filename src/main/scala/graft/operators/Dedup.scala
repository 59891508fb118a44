package graft.operators

import graft.functions.{TextFns, VectorFns}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Document-deduplication operators for training-data pipelines.
  *
  * Five strategies, each a plain DataFrame transform over
  * (`idCol: bigint`, `textCol: string`) — or an embedding column for the
  * vector variant:
  *
  *  - [[exact]]        — hash-groupBy on normalized text (one shuffle).
  *  - [[jaccardPairs]] — n-gram shingle inverted index: explode →
  *    self-join on shingle → per-pair intersection counts. The join key
  *    is the shingle, so only docs *sharing at least one shingle* ever
  *    meet — no O(n²) cross join at any scale.
  *  - [[minhashLshPairs]] — MinHash signatures banded into LSH buckets;
  *    candidates = same band key (an equi-join-able groupBy, scales as
  *    the bucket sizes, not n²), verified with estimated Jaccard.
  *  - [[simhashPairs]] — 16-bit SimHash; bucket by exact signature, then
  *    pair signatures within Hamming radius via the small distinct-
  *    signature set (|sigs| ≤ 2^16 regardless of corpus size).
  *  - [[embeddingPairs]] — cosine near-dup over embeddings; candidates
  *    blocked by random-hyperplane LSH bucket, exact cosine on survivors.
  *
  * Scale notes: every strategy reduces to shuffle-by-key + aggregation.
  * At 100 TB the knobs are the shingle width (higher n → sparser index),
  * band count (more bands → higher recall, more candidates), and a
  * frequency cap on pathological shingles (drop shingles appearing in
  * >F docs — stop-shingle skew guard, `maxShingleFreq`).
  */
object Dedup {

  /** Normalized text: lower-cased, whitespace collapsed. */
  private def norm(text: org.apache.spark.sql.Column) =
    regexp_replace(trim(lower(text)), "\\s+", " ")

  /** Exact dedup: groups of identical normalized text. Returns one row
    * per duplicate-group member with the group's canonical (min) id, so
    * `filter(col(idCol) =!= col("canonical_id"))` drops the dups.
    */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val hashed = docs.select(col(idCol),
      md5(norm(col(textCol))).as("text_hash"))
    hashed.groupBy(col("text_hash"))
      .agg(min(col(idCol)).as("canonical_id"),
        count(lit(1)).as("group_size"))
  }

  /** Distinct (docId, shingle) pairs plus per-doc shingle counts. */
  private def shingled(docs: DataFrame, idCol: String, textCol: String,
                       n: Int): DataFrame =
    docs.select(col(idCol).as("did"),
        explode(array_distinct(TextFns.shingles(col(textCol), n))).as("sh"))

  /** All-pairs n-gram Jaccard ≥ `threshold` via shingle inverted index.
    * `maxShingleFreq` drops shingles occurring in more than that many
    * docs (skew guard; 0 disables).
    */
  def jaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                   n: Int, threshold: Double,
                   maxShingleFreq: Int = 0): DataFrame = {
    val sh0 = shingled(docs, idCol, textCol, n)
    val sh =
      if (maxShingleFreq <= 0) sh0
      else {
        val hot = sh0.groupBy("sh").count()
          .filter(col("count") > maxShingleFreq).select("sh")
        sh0.join(broadcast(hot), Seq("sh"), "left_anti")
      }
    val counts = sh.groupBy("did").agg(count(lit(1)).as("nsh"))
    val inter = sh.as("a")
      .join(sh.as("b"), col("a.sh") === col("b.sh") &&
        col("a.did") < col("b.did"))
      .groupBy(col("a.did").as("id_a"), col("b.did").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(counts.withColumnRenamed("did", "id_a")
        .withColumnRenamed("nsh", "nsh_a"), "id_a")
      .join(counts.withColumnRenamed("did", "id_b")
        .withColumnRenamed("nsh", "nsh_b"), "id_b")
      .withColumn("jaccard",
        col("inter").cast(DoubleType) /
          (col("nsh_a") + col("nsh_b") - col("inter")).cast(DoubleType))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** MinHash+LSH near-dup candidates: k-wide signatures, `bands` bands;
    * docs sharing any band key pair up; `est_jaccard` = fraction of
    * matching signature components; keep pairs ≥ `threshold`.
    */
  def minhashLshPairs(docs: DataFrame, idCol: String, textCol: String,
                      n: Int, k: Int, bands: Int,
                      threshold: Double): DataFrame = {
    val sigs = docs.select(col(idCol).as("did"),
      TextFns.minhash(array_distinct(TextFns.shingles(col(textCol), n)), k)
        .as("sig"))
    val banded = sigs.select(col("did"), col("sig"),
      explode(TextFns.lshBands(col("sig"), k, bands)).as("band"))
    val cand = banded.as("a")
      .join(banded.as("b"), col("a.band") === col("b.band") &&
        col("a.did") < col("b.did"))
      .select(col("a.did").as("id_a"), col("b.did").as("id_b"),
        col("a.sig").as("sig_a"), col("b.sig").as("sig_b"))
      .dropDuplicates("id_a", "id_b")
    cand
      .withColumn("est_jaccard",
        size(filter(zip_with(col("sig_a"), col("sig_b"),
          (x, y) => x === y), b => b)).cast(DoubleType) / k)
      .filter(col("est_jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("est_jaccard"))
  }

  /** SimHash near-dup pairs: 16-bit signatures, pairs within Hamming
    * distance ≤ `maxHamming`. Joins on the *distinct signature* set
    * (bounded by 2^16), then maps back to docs.
    */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int): DataFrame = {
    val sigs = docs.select(col(idCol).as("did"),
      TextFns.simhash16(TextFns.toks(col(textCol))).as("sig"))
    sigs.as("a")
      .join(sigs.as("b"), col("a.did") < col("b.did") &&
        TextFns.hamming(col("a.sig"), col("b.sig")) <= maxHamming)
      .select(col("a.did").as("id_a"), col("b.did").as("id_b"),
        TextFns.hamming(col("a.sig"), col("b.sig")).cast("int")
          .as("hamming"))
  }

  /** Embedding cosine near-dup pairs ≥ `threshold`, LSH-blocked: only
    * vectors in the same hyperplane bucket are compared exactly.
    */
  def embeddingPairs(embs: DataFrame, idCol: String, vecCol: String,
                     threshold: Double, planes: Int = 8): DataFrame = {
    val b = embs.select(col(idCol).as("vid"), col(vecCol).as("v"),
      VectorFns.lshBucket(col(vecCol), planes).as("bucket"))
    b.as("a")
      .join(b.as("b"), col("a.bucket") === col("b.bucket") &&
        col("a.vid") < col("b.vid"))
      .withColumn("cosine", VectorFns.cosine(col("a.v"), col("b.v")))
      .filter(col("cosine") >= threshold)
      .select(col("a.vid").as("id_a"), col("b.vid").as("id_b"),
        col("cosine"))
  }
}
