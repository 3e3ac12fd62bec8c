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
}
