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
}
