package graft

import graft.operators.{Components, Dedup}
import org.apache.spark.sql.functions._

class ComponentsSpec extends SparkSpec {

  private def resolve(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    Components.connectedComponents(pairs.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("two components and a chain resolve to min-id labels") {
    // component {1,2,3} (chain), component {7,9}
    val got = resolve(Seq((2L, 1L), (2L, 3L), (9L, 7L)))
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 9L -> 7L))
  }

  test("a long path converges (the case that defeats naive min propagation slowly)") {
    // path 0-1-2-...-40: one component labeled 0
    val path = (0L until 40L).map(i => (i, i + 1))
    val got = resolve(path)
    assert(got.size === 41 && got.values.forall(_ == 0L))
  }

  test("self-loops and duplicate/reversed edges are harmless") {
    val got = resolve(Seq((5L, 5L), (1L, 2L), (2L, 1L), (1L, 2L), (3L, 2L)))
    // pure self-loop vertices carry no edge information and drop out
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("clusters match a local union-find over the real near-dup pairs") {
    val docs = sources.Lake.table(spark, sf001, "documents")
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      shingleN = 3, threshold = 0.4)
    val edge = pairs.select(col("id_a"), col("id_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(edge.nonEmpty)

    // reference labels: driver-side union-find on the collected pairs
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edge.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = parent.keys.map(v => v -> find(v)).toMap

    val got = Components.clusters(pairs, "id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.map(g => g._1 -> g._2).toMap === want)
    // sizes consistent with the labels
    val sizeByCluster = want.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    got.foreach { case (_, c, n) => assert(n === sizeByCluster(c)) }
  }
}
