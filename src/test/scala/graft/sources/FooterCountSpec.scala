package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Footer-metadata row counts must equal a real scan's count — and fail
  * soft (None) on non-parquet paths so callers can fall back. */
class FooterCountSpec extends AnyFunSuite {
  lazy val spark = graft.Sessions.local("4", "graft-footer-test")

  test("footer row count equals count() for every test table") {
    for (t <- Seq("documents", "embeddings", "orders")) {
      val meta = Tables.footerRowCount(spark, "/root/testdata/sf0.01", t)
      val real = Tables.table(spark, "/root/testdata/sf0.01", t).count()
      assert(meta.contains(real), s"$t: footer=$meta scan=$real")
    }
  }

  test("missing path yields None, not an exception") {
    assert(Tables.footerRowCount(spark, "/root/testdata/sf0.01", "nope").isEmpty)
  }
}
