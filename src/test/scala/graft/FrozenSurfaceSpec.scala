package graft

import org.scalatest.funsuite.AnyFunSuite

/** Drift guard over the FROZEN divergence surfaces (VERDICT r9 item 5):
  * the no-oracle set and the conformance case-skip table are frozen
  * end-of-round-9 state — an accidental new skip, or a silently
  * dropped oracle, must fail the suite rather than widen a frozen
  * table unnoticed. Lifting a row is fine: shrink the expectation in
  * the same change that lifts it.
  */
class FrozenSurfaceSpec extends AnyFunSuite {

  test("no_oracle set is exactly the two frozen approximates") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    val frozen = Set(
      // q18 and q66 lifted in r13 (exact twins + sketch tolerance);
      // d24 lifted in r15 — the training loop was integer-deterministic
      // all along, and a 40-round recursive-CTE oracle restates it
      // textbook-exactly (Bpe.bpeOracle)
      "d12_knn_ivf",          // IVF recall gate — relational twin d38
      "d23_pq_ann")           // PQ recall/compression gates
    assert(noOracle == frozen,
      s"no_oracle drifted: +${(noOracle -- frozen).toSeq.sorted.mkString(",")} " +
        s"-${(frozen -- noOracle).toSeq.sorted.mkString(",")}")
  }

  test("oracle coverage only ratchets up") {
    assert(SparkEntry.oracleSql.size >= 312,
      s"oracleSql shrank to ${SparkEntry.oracleSql.size} (floor 312)")
    assert(SparkEntry.queries.size >= 315,
      s"queries shrank to ${SparkEntry.queries.size} (floor 315)")
  }

  test("every TPC-DS shape row ds01-ds96 exists and carries an oracle") {
    val ds = SparkEntry.queries.keySet.filter(_.startsWith("ds"))
    assert(ds.size >= 96, s"ds rows: ${ds.size} (expected >= 96)")
    val dsNoOracle = ds -- SparkEntry.oracleSql.keySet
    assert(dsNoOracle.isEmpty, s"ds rows without oracle: $dsNoOracle")
  }
}
