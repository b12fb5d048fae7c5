package graft

/** Typed accessors decode every core table at sf0.001 (schema drift in
  * the case classes fails here, at the boundary, not mid-job). */
class SchemasSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("all typed tables decode and are non-empty") {
    assert(Schemas.lineitem(spark, dir).head().l_quantity > 0)
    assert(Schemas.orders(spark, dir).head().o_orderkey >= 0)
    assert(Schemas.customer(spark, dir).head().c_name.nonEmpty)
    assert(Schemas.supplier(spark, dir).head().s_name.nonEmpty)
    assert(Schemas.nation(spark, dir).count() > 0)
    assert(Schemas.region(spark, dir).count() > 0)
    assert(Schemas.events(spark, dir).head().ts > 0)
    assert(Schemas.documents(spark, dir).head().text.nonEmpty)
    assert(Schemas.embeddings(spark, dir).head().embedding.length === 64)
  }

  test("typed filter + map compiles and runs on lineitem") {
    import spark.implicits._
    val revenue = Schemas.lineitem(spark, dir)
      .filter(_.l_discount < 0.05)
      .map(l => l.l_extendedprice * (1 - l.l_discount))
      .reduce(_ + _)
    assert(revenue > 0)
  }
}
