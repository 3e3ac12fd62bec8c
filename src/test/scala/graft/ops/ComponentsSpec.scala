package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def components(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Components.minLabelPropagate(edges.toDF("a", "b"))
      .as[(Long, Long)].collect().toMap

  test("long chain collapses to its minimum (needs multi-hop propagation)") {
    // 0-1-2-...-30, min label must travel 30 hops; pointer jumping
    // should converge well inside the default maxIter = 20
    val chain = (0L until 30L).map(i => (i, i + 1))
    val got = components(chain)
    assert(got.size == 31 && got.values.forall(_ == 0L))
  }

  test("disjoint components keep separate labels") {
    val got = components(Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L)))
    assert(got(1L) == 1L && got(2L) == 1L && got(3L) == 1L)
    assert(got(10L) == 10L && got(11L) == 10L)
    assert(got(20L) == 20L && got(21L) == 20L)
  }

  test("star and cycle shapes") {
    val star = Seq((5L, 1L), (5L, 2L), (5L, 3L))
    assert(components(star).values.forall(_ == 1L))
    val cycle = Seq((7L, 8L), (8L, 9L), (9L, 7L))
    assert(components(cycle).values.forall(_ == 7L))
  }

  test("dedup-group resolution: near-dup pairs to survivor groups") {
    // chains a~b, b~c (no direct a~c edge) resolve into one group
    val pairs = Seq((100L, 200L), (200L, 300L), (400L, 500L))
    val got = components(pairs)
    assert(got(100L) == 100L && got(200L) == 100L && got(300L) == 100L)
    assert(got(400L) == 400L && got(500L) == 400L)
  }

  test("Dedup.resolveGroups maps every doc to its group survivor") {
    import spark.implicits._
    val pairs = Seq((100L, 200L), (200L, 300L), (400L, 500L)).toDF("id_a", "id_b")
    val got = Dedup.resolveGroups(pairs).as[(Long, Long)].collect().toMap
    assert(got == Map(100L -> 100L, 200L -> 100L, 300L -> 100L,
                      400L -> 400L, 500L -> 400L))
  }

  private def incremental(base: Seq[(Long, Long)],
                          delta: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    val labels = Components.minLabelPropagate(base.toDF("a", "b"))
    Components.incrementalComponents(labels, delta.toDF("a", "b"))
      .as[(Long, Long)].collect().toMap
  }

  test("incremental ≡ from-scratch when a delta edge merges two components") {
    val base = Seq((1L, 2L), (10L, 11L), (20L, 21L))
    val delta = Seq((2L, 11L)) // merges {1,2} with {10,11}
    assert(incremental(base, delta) == components(base ++ delta))
  }

  test("incremental: delta chain merges THREE components transitively") {
    val base = Seq((1L, 2L), (10L, 11L), (20L, 21L))
    val delta = Seq((2L, 10L), (11L, 20L)) // chain across all three
    assert(incremental(base, delta) == components(base ++ delta))
  }

  test("incremental: brand-new nodes join old components and each other") {
    val base = Seq((5L, 6L), (30L, 31L))
    // 100-101 is a new island; 102 attaches to the {5,6} component;
    // 2 is a NEW node whose id UNDERCUTS an old root (root must move)
    val delta = Seq((100L, 101L), (102L, 6L), (2L, 30L))
    assert(incremental(base, delta) == components(base ++ delta))
  }

  test("incremental with within-component delta edges is a no-op relabeling") {
    val base = Seq((1L, 2L), (2L, 3L))
    val delta = Seq((1L, 3L), (3L, 2L)) // already same component
    assert(incremental(base, delta) == components(base))
  }

  test("incremental with an empty delta returns the labeling unchanged") {
    import spark.implicits._
    val labels = Components.minLabelPropagate(Seq((1L, 2L)).toDF("a", "b"))
    val got = Components.incrementalComponents(
        labels, Seq.empty[(Long, Long)].toDF("a", "b"))
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L))
  }

  test("incremental randomized equivalence with from-scratch") {
    val rnd = new scala.util.Random(42)
    val base = Seq.fill(60)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter { case (a, b) => a != b }
    val delta = Seq.fill(20)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      .filter { case (a, b) => a != b }
    assert(incremental(base, delta) == components(base ++ delta))
  }
}
