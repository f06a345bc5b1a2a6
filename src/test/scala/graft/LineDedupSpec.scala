package graft

import graft.dedup.LineDedup
import org.apache.spark.sql.functions._

class LineDedupSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("first occurrence wins, order preserved, later copies deleted") {
    val out = LineDedup.dedupLines(docs(
      1L -> "alpha\nshared\nbeta",
      2L -> "shared\ngamma",
      3L -> "gamma\nshared\nalpha"))
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq == Seq(
      1L -> "alpha\nshared\nbeta",
      2L -> "gamma"))
    // doc 3 lost every line (all seen earlier) and was dropped entirely
  }

  test("duplicate line inside one doc keeps only the first") {
    val out = LineDedup.dedupLines(docs(5L -> "x\ny\nx\nz"))
      .head().getString(1)
    assert(out == "x\ny\nz")
  }

  test("result is invariant to partitioning") {
    import spark.implicits._
    val d = spark.range(500L)
      .map(id => (id, graft.queries.TextQueries.lineDoc(3L, id)))
      .toDF("doc_id", "text")
    def run(df: org.apache.spark.sql.DataFrame) =
      LineDedup.dedupLines(df).orderBy("doc_id").collect().toSeq
    assert(run(d.repartition(16)) == run(d.coalesce(1)))
  }
}
