package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ORC round-trip: the mirror write is lossless (row-identical to the
  * parquet projection) and the gated aggregate matches the same
  * aggregate computed straight from parquet. */
class FormatsSpec extends AnyFunSuite {
  lazy val spark = graft.Sessions.local("4", "graft-formats-test")
  val dir = "/root/testdata/sf0.01"

  test("ORC mirror rows are identical to the parquet projection") {
    Formats.orcRoundtrip(spark, dir).collect() // force the mirror write
    val key = IndexStore.keyOf(dir)
    val orc = spark.read.orc(s"target/orc/docs_$key")
      .orderBy("doc_id").collect().toSeq
    val pq = Tables.documents(spark, dir)
      .select("doc_id", "lang", "n_chars")
      .orderBy("doc_id").collect().toSeq
    assert(orc == pq)
  }

  test("gated aggregate equals the parquet-derived aggregate") {
    val viaOrc = Formats.orcRoundtrip(spark, dir).collect().toSeq
    val viaPq = Tables.documents(spark, dir)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"),
        min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))
      .orderBy("lang").collect().toSeq
    assert(viaOrc == viaPq)
  }
}
