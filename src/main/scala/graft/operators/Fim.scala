package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFns

/** Fill-in-middle transformation (Bavarian et al. 2022, "Efficient
  * Training of Language Models to Fill in the Middle") — the
  * pretraining augmentation that rewrites a deterministic fraction of
  * documents as `<PRE>prefix<SUF>suffix<MID>middle` (PSM order) so the
  * model learns infilling.
  *
  * Everything is a narrow per-row projection (hash → two cut points →
  * three substrings → concat), no shuffle, scan speed at 100 TB. Cut
  * points and the apply/skip decision come from md5-prefix hashes of
  * the id ([[TextFns.hash32]]) — never `rand()` — so reruns and the
  * SQL oracle reproduce the transform bit-for-bit.
  */
object Fim {

  val Pre = "<PRE>"
  val Suf = "<SUF>"
  val Mid = "<MID>"

  /** Adds `fim_applied`, `cut_start`, `cut_end` (0-based, end
    * exclusive; both -1 when not applied) and `fim_text` (PSM rewrite,
    * or the unchanged text for skipped rows). `ratePct` of documents
    * (by id hash mod 100) are transformed; cut points are two
    * independent id-hash draws over [0, len], sorted.
    */
  def fimTransform(df: DataFrame, idCol: String, textCol: String,
                   ratePct: Int): DataFrame = {
    val id = col(idCol).cast("string")
    val text = col(textCol)
    val len = length(text)
    val applied = TextFns.hash32(concat(id, lit(":m"))) % 100 < ratePct
    val h1 = (TextFns.hash32(concat(id, lit(":a"))) % (len + 1))
      .cast("int")
    val h2 = (TextFns.hash32(concat(id, lit(":b"))) % (len + 1))
      .cast("int")
    val start = least(h1, h2)
    val end = greatest(h1, h2)
    val prefix = text.substr(lit(1), start)
    val middle = text.substr(start + 1, end - start)
    val suffix = text.substr(end + 1, len - end)
    df.withColumn("fim_applied", applied)
      .withColumn("cut_start",
        when(applied, start).otherwise(lit(-1)).cast("int"))
      .withColumn("cut_end",
        when(applied, end).otherwise(lit(-1)).cast("int"))
      .withColumn("fim_text",
        when(applied, concat(lit(Pre), prefix, lit(Suf), suffix,
          lit(Mid), middle)).otherwise(text))
  }
}
