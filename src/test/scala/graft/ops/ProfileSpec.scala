package graft.ops

import graft.GraftTestBase

class ProfileSpec extends GraftTestBase {

  behavior of "joinSizeStats"

  it should "predict the exact join cardinality without running the join" in {
    val r = Profile.joinSizeStats(spark, sf).head()
    val o = graft.Tables.orders(spark, sf)
    val l = graft.Tables.lineitem(spark, sf)
    val actual = o.join(l, o("o_orderkey") === l("l_orderkey")).count()
    r.getAs[Long]("actual_join_rows") shouldBe actual
    r.getAs[Long]("n_orders") shouldBe graft.Tables.orders(spark, sf).count()
    r.getAs[Long]("n_lineitem") shouldBe
      graft.Tables.lineitem(spark, sf).count()
    // uniform-NDV estimate is exact when the join is key-to-foreign-key
    // with near-full key coverage — both sides here — so est and actual
    // agree to within the unmatched-key slack
    r.getAs[Long]("max_key_contrib") should be >= 1L
    r.getAs[Long]("ndv_orders") should be >= r.getAs[Long]("ndv_lineitem")
  }
}
