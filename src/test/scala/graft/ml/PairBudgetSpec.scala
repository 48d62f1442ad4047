package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** `maxPairsPerDoc` on the pairs-emitting dedup APIs (r12 directive 4):
  * a mutually-similar mega-group makes pair output O(g²) even when every
  * upstream stage is bounded — the budget caps emission per doc while
  * keeping the verdicts the dedup paths derive from the pairs.
  */
class PairBudgetSpec extends SparkSpec {

  import spark.implicits._

  // g docs with identical text: the worst case — a mutual clique where
  // every ordered pair is a containment-1.0 / jaccard-1.0 pair
  private def clique(g: Int) = (1 to g)
    .map(i => (i.toLong, "the same boilerplate licence header text repeated " +
      "across every single document in this templated corpus"))
    .toDF("doc_id", "text")

  test("containmentPairs: budget bounds O(g^2) emission per doc") {
    val docs = clique(30)
    val full = Dedup.containmentPairs(docs, "doc_id", "text", threshold = 0.9)
    assert(full.count() == 30L * 29) // both directions of every pair
    val capped = Dedup.containmentPairs(docs, "doc_id", "text",
      threshold = 0.9, maxPairsPerDoc = 3)
    assert(capped.count() == 30L * 3) // every doc has 29 partners, keeps 3
    // kept partners are the smallest ids per doc (deterministic)
    val kept4 = capped.filter(col("id_a") === 4).select("id_b")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(kept4 == Seq(1L, 2L, 3L))
  }

  test("containment drop-set is identical under the cap on a mutual group") {
    // the dedup verdict on an equal-size mutual group: smallest id
    // survives, everything else drops — capped pairs must reproduce it
    // because the smallest partner ids are exactly the ones kept
    val docs = clique(25)
    def dropsFrom(pairs: org.apache.spark.sql.DataFrame): Set[Long] = {
      // the containmentDedup drop rule for equal shingle sizes:
      // drop a iff it has a partner with a smaller id
      pairs.filter(col("id_a") > col("id_b"))
        .select("id_a").distinct().collect().map(_.getLong(0)).toSet
    }
    val full = dropsFrom(Dedup.containmentPairs(docs, "doc_id", "text", threshold = 0.9))
    val capped = dropsFrom(Dedup.containmentPairs(docs, "doc_id", "text",
      threshold = 0.9, maxPairsPerDoc = 1))
    assert(full == (2L to 25L).toSet)
    assert(capped == full)
  }

  test("minhashPairs: budget bounds emission and preserves clique components") {
    val docs = clique(20)
    val full = Dedup.minhashPairs(docs, "doc_id", "text", threshold = 0.5)
    assert(full.count() == 20L * 19 / 2) // unordered pairs once
    val capped = Dedup.minhashPairs(docs, "doc_id", "text",
      threshold = 0.5, maxPairsPerDoc = 2)
    assert(capped.count() <= 20L * 2)
    // the id -> next-id chain survives any budget >= 1, so the connected
    // component over the clique is unchanged
    val comps = Dedup.connectedComponents(
      capped.select(col("id_a"), col("id_b")), "id_a", "id_b")
    assert(comps.select(countDistinct(col("label"))).head.getLong(0) == 1L)
    assert(comps.select(countDistinct(col("id"))).head.getLong(0) == 20L)
  }

  test("budget CAN sever components on non-mutual graphs (scope pin)") {
    // The survival guarantee is CLIQUE-scoped. Asymmetric containment
    // star: hub 5's text is fully contained in big docs 1 and 2, which
    // contain nothing — the pair graph is 5→1, 5→2 ONLY (no edges
    // back). budget=1 on the hub keeps the smallest partner (1) and
    // drops the ONLY edge reaching 2: the {1,2,5} component splits.
    // Use the uncapped paths when cluster membership is the deliverable
    // (scoped in the capPairsPerDoc scaladoc + DIVERGENCES.md #16).
    val hub = "alpha beta gamma delta epsilon"
    def big(tag: String) = hub + " " + (1 to 30).map(i => s"$tag$i").mkString(" ")
    val docs = Seq((1L, big("x")), (2L, big("y")), (5L, hub)).toDF("doc_id", "text")
    def edges(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = Dedup.containmentPairs(docs, "doc_id", "text", threshold = 0.9)
    assert(edges(full) == Set((5L, 1L), (5L, 2L))) // one component {1,2,5}
    val capped = Dedup.containmentPairs(docs, "doc_id", "text",
      threshold = 0.9, maxPairsPerDoc = 1)
    assert(edges(capped) == Set((5L, 1L))) // the 5→2 edge is gone: 2 severed
  }

  test("default budget leaves plans untouched (no window in the plan)") {
    val docs = clique(5)
    val plan = Dedup.minhashPairs(docs, "doc_id", "text", threshold = 0.5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("__rk"))
  }
}
