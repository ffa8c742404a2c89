package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.operators.Graphs
import graft.sources.Sources

/** Exact triangle counting: hand-checkable graphs, canonicalization, and
  * input-order/orientation invariance. */
class GraphsSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("s", LongType, nullable = true),
    StructField("t", LongType, nullable = true)))

  private def g(edges: (Long, Long)*) =
    Sources.inMemory(spark, edges.map(e => Row(e._1, e._2)), schema)

  test("K4 has 4 triangles, every node in 3") {
    val k4 = g(1L -> 2L, 1L -> 3L, 1L -> 4L, 2L -> 3L, 2L -> 4L, 3L -> 4L)
    val tri = rows(Graphs.triangles(k4, "s", "t"))
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(tri == Set((1L, 2L, 3L), (1L, 2L, 4L), (1L, 3L, 4L), (2L, 3L, 4L)))
    val perNode = rows(Graphs.trianglesPerNode(k4, "s", "t"))
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perNode == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("canonicalization: direction, duplicates, self-loops, nulls don't distort") {
    // the same single triangle expressed messily: reversed edges, dups,
    // a self-loop, a null endpoint, and a dangling edge
    val withNull = Sources.inMemory(spark,
      Seq(Row(2L, 1L), Row(1L, 2L), Row(2L, 3L), Row(3L, 1L), Row(3L, 3L),
        Row(1L, 9L), Row(null, 5L)), schema)
    val tri = rows(Graphs.triangles(withNull, "s", "t"))
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(tri == Seq((1L, 2L, 3L)))
  }

  test("hub graph: star has zero triangles; star + rim edge has exactly one") {
    // a degree-100 hub — the shape whose wedges explode without
    // degree-ordered orientation; count must still be exact
    val star = g((1L to 100L).map(i => 0L -> i): _*)
    assert(rows(Graphs.triangles(star, "s", "t")).isEmpty)
    val withRim = g(((1L to 100L).map(i => 0L -> i) :+ (7L -> 8L)): _*)
    val tri = rows(Graphs.triangles(withRim, "s", "t"))
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(tri == Seq((0L, 7L, 8L)))
  }

  test("triangle set is partitioning-invariant") {
    val edges = (for (a <- 1L to 12L; b <- a + 1 to 12L
      if (a + b) % 3 != 0) yield (a, b))
    val df1 = g(edges: _*).repartition(1)
    val df7 = g(scala.util.Random.shuffle(edges): _*).repartition(7)
    val t1 = rows(Graphs.triangles(df1, "s", "t"))
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val t7 = rows(Graphs.triangles(df7, "s", "t"))
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(t1 == t7 && t1.nonEmpty)
  }
}
