package graft.lake

import graft.SparkSpec

class B38CheckSpec extends SparkSpec {
  test("b38_mor_delete matches the SQL-reconstructed oracle") {
    val dir = "/root/testdata/sf0.001"
    val out = graft.queries.LakeQueries.b38_mor_delete(spark, dir)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
    val expected = graft.Tables.t(spark, dir, "orders")
      .selectExpr("o_orderkey", "o_totalprice", "o_orderstatus")
      .where("o_orderkey < 2000 AND NOT (o_orderstatus = 'F' AND o_orderkey % 5 < 2)")
      .orderBy("o_orderkey")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
    assert(out.length == expected.length && out.sameElements(expected),
      s"got ${out.length} rows, expected ${expected.length}")
  }
}
