package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** First-principles pins for the greedy MMR core behind
  * `rag_mmr_rerank` — the properties the DuckDB differential exercises
  * on real data but cannot state as intent: diversification actually
  * overrides relevance for near-duplicates, ties break to the smaller
  * id, λ=1 degenerates to pure relevance order, and the loop survives
  * pool exhaustion. */
class MmrSpec extends AnyFunSuite {

  private def sim(pairs: ((Long, Long), Double)*): Map[(Long, Long), Double] =
    pairs.map { case ((a, b), s) => (math.min(a, b), math.max(a, b)) -> s }.toMap

  test("a near-duplicate of the first pick loses to a novel lower-relevance doc") {
    // b is almost as relevant as a but nearly identical to it; c is
    // mediocre but novel. Pure relevance ranks (a, b); MMR must rank (a, c, b).
    val rel = Seq(1L -> 0.9, 2L -> 0.89, 3L -> 0.5)
    val s = sim((1L, 2L) -> 0.99, (1L, 3L) -> 0.0, (2L, 3L) -> 0.0)
    val picked = LlmQueries.mmrSelect(rel, s, lambda = 0.7, mu = 0.3, k = 3)
    assert(picked.map(_._1) == Seq(1L, 3L, 2L),
      s"diversity term failed to demote the near-duplicate: $picked")
    // scores are the definition, verbatim
    assert(picked(0)._2 == 0.7 * 0.9)
    assert(picked(1)._2 == 0.7 * 0.5 - 0.3 * 0.0)
    assert(picked(2)._2 == 0.7 * 0.89 - 0.3 * 0.99)
  }

  test("mu = 0 (or lambda = 1 scaling) is pure relevance order") {
    val rel = Seq(1L -> 0.2, 2L -> 0.9, 3L -> 0.5)
    val s = sim((1L, 2L) -> 1.0, (1L, 3L) -> 1.0, (2L, 3L) -> 1.0)
    val picked = LlmQueries.mmrSelect(rel, s, lambda = 1.0, mu = 0.0, k = 3)
    assert(picked.map(_._1) == Seq(2L, 3L, 1L))
    assert(picked.map(_._2) == Seq(0.9, 0.5, 0.2))
  }

  test("ties break to the smaller id at every step") {
    val rel = Seq(4L -> 0.5, 2L -> 0.5, 9L -> 0.5)
    val s = sim((2L, 4L) -> 0.1, (2L, 9L) -> 0.1, (4L, 9L) -> 0.1)
    val picked = LlmQueries.mmrSelect(rel, s, lambda = 0.7, mu = 0.3, k = 3)
    assert(picked.map(_._1) == Seq(2L, 4L, 9L))
  }

  test("k beyond the pool stops at pool exhaustion; empty pool refuses") {
    val rel = Seq(1L -> 0.9, 2L -> 0.1)
    val s = sim((1L, 2L) -> 0.0)
    assert(LlmQueries.mmrSelect(rel, s, 0.7, 0.3, k = 10).size == 2)
    assertThrows[IllegalArgumentException] {
      LlmQueries.mmrSelect(Seq.empty, Map.empty, 0.7, 0.3, 5)
    }
  }
}
