package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {

  test("pageRank matches the hand-iterated formula (dangling node keeps rank)") {
    val s = spark; import s.implicits._
    // 1 -> 2, 2 -> 1, 1 -> 3; node 3 dangles (its mass is dropped, the
    // documented convention)
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 3L)).toDF("src", "dst")
    val pr = Graph.pageRank(edges, col("src"), col("dst"), iters = 2, damping = 0.85)
      .as[(Long, Double)].collect().toMap
    // pr0 = 1/3 each; base = 0.15/3 = 0.05
    // iter1: p(1) = .05 + .85*(1/3); p(2) = p(3) = .05 + .85*(1/6)
    // iter2: p(1) = .05 + .85*p1(2); p(2) = p(3) = .05 + .85*p1(1)/2
    val p11 = 0.05 + 0.85 / 3.0
    val p12 = 0.05 + 0.85 / 6.0
    assert(math.abs(pr(1L) - (0.05 + 0.85 * p12)) < 1e-12)
    assert(math.abs(pr(2L) - (0.05 + 0.85 * p11 / 2)) < 1e-12)
    assert(math.abs(pr(3L) - (0.05 + 0.85 * p11 / 2)) < 1e-12)
    assert(pr.values.sum < 1.0) // dangling mass not redistributed
  }

  test("pageRank on a symmetric cycle stays uniform at any iteration count") {
    val s = spark; import s.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val pr = Graph.pageRank(edges, col("src"), col("dst"), iters = 4)
      .as[(Long, Double)].collect().toMap
    pr.values.foreach(v => assert(math.abs(v - 1.0 / 3) < 1e-12))
  }

  test("pageRank collapses parallel edges before computing degrees") {
    val s = spark; import s.implicits._
    val edges = Seq((1L, 2L), (1L, 2L), (2L, 1L)).toDF("src", "dst")
    val pr = Graph.pageRank(edges, col("src"), col("dst"), iters = 8)
      .as[(Long, Double)].collect().toMap
    // dedup makes this the symmetric 2-cycle: uniform 1/2
    pr.values.foreach(v => assert(math.abs(v - 0.5) < 1e-12))
  }

  test("labelPropagation adopts the majority neighbor label, min tiebreak") {
    val s = spark; import s.implicits._
    // star: hub 1 with leaves 2..4 + detached pair (10, 11)
    val e = Seq((1L, 2L), (1L, 3L), (1L, 4L), (10L, 11L)).toDF("u", "v")
    val out = graft.operators.Graph.labelPropagation(e, col("u"), col("v"), iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // round 1: leaves -> 1, hub -> 2 (min of leaf labels); pair swaps labels
    // round 2: leaves adopt hub's 2; hub adopts leaves' 1; pair swaps back
    assert(out(2L) == 2L && out(3L) == 2L && out(4L) == 2L && out(1L) == 1L)
    assert(out(10L) == 10L && out(11L) == 11L)
  }

  test("triangleCount: K4 has 4 triangles; orientation dedups parallel/reversed edges") {
    val s = spark; import s.implicits._
    // K4 on 1..4 (4 triangles) + a pendant edge (4,5) + noise:
    // duplicate and reversed listings of the same edges, one self-loop
    val k4 = for (a <- 1L to 4L; b <- 1L to 4L if a < b) yield (a, b)
    val edges = (k4 ++ k4.map(_.swap) ++ Seq((4L, 5L), (2L, 1L), (3L, 3L)))
      .toDF("x", "y")
    val row = Graph.triangleCount(edges, col("x"), col("y")).collect().head
    assert(row.getAs[Long]("n_nodes") == 5)
    assert(row.getAs[Long]("n_edges") == 7) // 6 K4 edges + pendant
    assert(row.getAs[Long]("n_triangles") == 4)
  }

  test("triangleCount: triangle-free bipartite graph counts zero") {
    val s = spark; import s.implicits._
    val edges = (for (a <- 1L to 3L; b <- 10L to 12L) yield (a, b)).toDF("x", "y")
    val row = Graph.triangleCount(edges, col("x"), col("y")).collect().head
    assert(row.getAs[Long]("n_triangles") == 0L)
    assert(row.getAs[Long]("n_edges") == 9L)
  }
}
