package graft.operators

import graft.SparkSpec

/** Paging.paginate against the window formulation it replaces —
  * including the edges the oracle fixtures don't reach: null keys
  * (NULLS FIRST rank parity) and identical-row ties across the page
  * boundary.
  */
class PagingSpec extends SparkSpec {
  import spark.implicits._

  test("paginate matches row_number semantics incl. null keys first") {
    val df = Seq(
      (Some(3L), "c"), (None, "z"), (Some(1L), "a"), (Some(2L), "b"))
      .toDF("k", "v")
    val got = Paging.paginate(df, Seq("k"), from = 0, size = 4)
      .select("k", "v", "rn").collect()
      .map(r => (Option(r.get(0)), r.getString(1), r.getInt(2))).toSet
    // null sorts first (Spark asc default), then 1, 2, 3
    assert(got == Set(
      (None, "z", 1), (Some(1L), "a", 2),
      (Some(2L), "b", 3), (Some(3L), "c", 4)))
  }

  test("identical rows straddling the page cut get consecutive ranks") {
    val df = Seq((1L, "x"), (2L, "dup"), (2L, "dup"), (2L, "dup"),
      (3L, "y")).toDF("k", "v")
    val page = Paging.paginate(df, Seq("k", "v"), from = 1, size = 2)
      .select("k", "v", "rn").as[(Long, String, Int)].collect().toSet
    // full ranking: (1,x)=1, (2,dup)=2,3,4, (3,y)=5 → page (1,2] = rns 2,3
    assert(page == Set((2L, "dup", 2), (2L, "dup", 3)))
  }

  test("keyset returns the page strictly after the last-seen key") {
    val df = (1L to 10L).map(i => (i, s"v$i")).toDF("k", "v")
    val got = Paging.keyset(df, "k",
        Some(org.apache.spark.sql.functions.lit(4L)), 3)
      .select("k").as[Long].collect().toSeq
    assert(got == Seq(5L, 6L, 7L))
  }

  test("keyset excludes null keys from every page, not just later ones") {
    // without the guard, null-keyed rows appear on page one (NULLS
    // FIRST) but `key > lastSeen` is null-rejecting — they'd silently
    // vanish from all later pages. The contract is: excluded everywhere.
    val df = Seq((Some(1L), "a"), (None, "n1"), (Some(2L), "b"),
      (None, "n2"), (Some(3L), "c")).toDF("k", "v")
    val page1 = Paging.keyset(df, "k", None, 2)
      .select("v").as[String].collect().toSeq
    assert(page1 == Seq("a", "b"))
    val page2 = Paging.keyset(df, "k",
        Some(org.apache.spark.sql.functions.lit(2L)), 2)
      .select("v").as[String].collect().toSeq
    assert(page2 == Seq("c"))
  }
}
