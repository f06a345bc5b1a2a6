package graft

import graft.text.Collocations
import org.apache.spark.sql.functions._

class CollocationsSpec extends SparkSpec {
  import spark.implicits._

  test("pmi ratios match hand computation on a tiny corpus") {
    // unigrams: x:3 y:2 z:1 (NU=6); bigrams: (x,y):2 (y,x):1 (x,z):1 (NB=4)
    val docs = Seq((1L, "x y x y"), (2L, "x z")).toDF("doc_id", "text")
    val got = Collocations.pmiBigrams(docs, 1L)
      .orderBy(desc("pmi_ratio"), col("t1"), col("t2"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
      .toSeq
    assert(got == Seq(
      ("x", "y", 2L, 3L, 2L, 2.0 * 36 / (4 * 3 * 2)), // 3.0
      ("x", "z", 1L, 3L, 1L, 36.0 / (4 * 3 * 1)), //      3.0, tie -> t2
      ("y", "x", 1L, 2L, 3L, 36.0 / (4 * 2 * 3)))) //     1.5
  }

  test("minCount filters rare bigrams; single-token docs contribute none") {
    val docs = Seq((1L, "x y x y"), (2L, "x z"), (3L, "q")).toDF("doc_id", "text")
    val got = Collocations.pmiBigrams(docs, 2L)
      .select("t1", "t2").as[(String, String)].collect().toSet
    assert(got == Set(("x", "y")))
    // but q still raises NU (7) — check via the surviving row's ratio
    val row = Collocations.pmiBigrams(docs, 2L).collect().head
    assert(row.getDouble(5) == 2.0 * 49 / (4 * 3 * 2))
  }
}
