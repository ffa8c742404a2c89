package graft

/** The SQL-registered face of every custom expression: each function must
  * be callable from `spark.sql` text (both literal-arg evaluation in the
  * registry and analyzer resolution). */
class SqlSurfaceSpec extends SparkSpec {

  test("all graft functions resolve and evaluate from SQL") {
    graft.core.GraftExtensions.registerFunctions(spark)
    val r = spark.sql(
      """SELECT
        |  geodesic_km(51.4986d, -0.0962d, 51.5027d, -0.1496d) AS geo,
        |  cosine_sim(array(1.0f, 2.0f), array(2.0f, 4.0f)) AS cos,
        |  dot_product(array(1.0f, 2.0f), array(3.0f, 4.0f)) AS dot,
        |  l2_distance(array(0.0f, 3.0f), array(4.0f, 0.0f)) AS l2,
        |  fingerprint64('foobar') AS fp,
        |  simhash64(array('a', 'b')) AS sh,
        |  shingles('a b c d', 3) AS shg,
        |  minhash(array('x'), 4, 42L) AS mh,
        |  lsh_bands(minhash(array('x'), 4, 42L), 2) AS bands,
        |  text_stats('the cat sat') AS ts,
        |  rp_sig(array(1.0f, -1.0f), 8, 7L) AS rp,
        |  winnow_sketch('abcdefghijklmno', 8, 8) AS wn
        |""".stripMargin).collect().head
    assert(math.abs(r.getAs[Double]("geo") - 3.735) < 0.01)
    assert(math.abs(r.getAs[Double]("cos") - 1.0) < 1e-12)
    assert(r.getAs[Double]("dot") == 11.0)
    assert(r.getAs[Double]("l2") == 5.0)
    assert(r.getAs[Long]("fp") == 0x85944171f73967e8L) // FNV-1a vector
    assert(r.getAs[collection.Seq[String]]("shg").toSeq == Seq("a b c", "b c d"))
    assert(r.getAs[collection.Seq[Long]]("mh").size == 4)
    assert(r.getAs[collection.Seq[Long]]("bands").size == 2)
    assert(r.getAs[org.apache.spark.sql.Row]("ts").getAs[Long]("n_tokens") == 3L)
    // 15 chars, k=8 → 8 hashes, w=8 → exactly ONE window structurally
    // (8−8+1) → exactly one fingerprint regardless of hash constants
    assert(r.getAs[collection.Seq[Long]]("wn").size == 1)
  }

  test("round-4 functions: splitmix64, interleave16, bloom, argmax from SQL") {
    graft.core.GraftExtensions.registerFunctions(spark)
    val r = spark.sql(
      """SELECT splitmix64(0L) AS sm,
        |       interleave16(1L, 1L) AS z
        |""".stripMargin).collect().head
    assert(r.getAs[Long]("sm") ==
      graft.expr.TextHashKernels.splitmix64(0L))
    assert(r.getAs[Long]("z") == 3L)
    // aggregates + the probe expression, end to end over a table
    spark.range(0, 100).createOrReplaceTempView("ks")
    val agg = spark.sql(
      """SELECT bloom_agg(id, 4096L, 4) AS bloom,
        |       argmax_agg(id, id * 10) AS am
        |FROM ks""".stripMargin).collect().head
    assert(agg.getAs[Long]("am") == 990L)
    val blob = agg.getAs[Array[Byte]]("bloom")
    (0L until 100L).foreach(k =>
      assert(graft.expr.BloomKernels.mightContain(blob, k)))
    spark.range(0, 100).createOrReplaceTempView("probe")
    val hits = spark.sql(
      """SELECT count(*) AS n FROM probe
        |WHERE bloom_might_contain(
        |  (SELECT bloom_agg(id, 4096L, 4) FROM ks WHERE id < 50), id)
        |""".stripMargin).collect().head.getAs[Long]("n")
    assert(hits >= 50 && hits < 60, s"bloom SQL probe hits=$hits")
  }

  test("round-6 functions: topk_agg and dd_quantile_agg from SQL") {
    graft.core.GraftExtensions.registerFunctions(spark)
    spark.range(1, 101).createOrReplaceTempView("r6")
    // NATURAL literal spelling: Spark parses bare 0.01 / array(0.5, 1.0)
    // as DECIMAL, which the registry converts (Decimal is not a
    // java.lang.Number — a naive cast dies in a ClassCastException)
    val r = spark.sql(
      """SELECT topk_agg(CAST(id AS DOUBLE), id, 3) AS top,
        |       dd_quantile_agg(CAST(id AS DOUBLE), 0.01,
        |                       array(0.5, 1.0)) AS q
        |FROM r6""".stripMargin).collect().head
    val top = r.getAs[collection.Seq[org.apache.spark.sql.Row]]("top")
      .map(_.getAs[Long]("payload")).toSeq
    assert(top == Seq(100L, 99L, 98L), top.toString)
    val q = r.getAs[collection.Seq[Double]]("q").toSeq
    // worst-case bound: within 1% of the true p50 (50) and max (100)
    assert(math.abs(q(0) - 50.0) <= 0.5 + 1e-9 &&
      math.abs(q(1) - 100.0) <= 1.0 + 1e-9, q.toString)
  }
}
