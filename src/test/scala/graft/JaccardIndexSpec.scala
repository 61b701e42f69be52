package graft

import org.apache.spark.sql.functions._

import graft.textops.Dedup

/** Focused gates for the r15 jaccardPairs rewrite (inverted-index
  * intersection COUNTS instead of shuffling shingle arrays) and for
  * T.spread (unsplittable-scan redistribution).
  *
  * The driver corpora never trip the ShingleDfCap (max df 25 at sf0.1
  * vs cap 1000), so the `inter_hot` compensation path — counting back
  * the intersections the cap withheld from the self-join — is pinned
  * HERE with a tiny cap against a brute-force oracle computed in plain
  * Scala over the same shingle sets.
  */
class JaccardIndexSpec extends SparkSpec {
  import spark.implicits._

  private def shingles(text: String): Set[String] = {
    val w = text.split(' ')
    if (w.length >= 3) w.sliding(3).map(_.mkString(" ")).toSet else Set.empty
  }

  private val docs = Seq(
    // docs 1-4 all share the "hot" run "a b c d" (shingles "a b c",
    // "b c d" get df=4 > maxDf=2); pairs differ in their cold tails.
    (1L, "a b c d x1 y1 z1 w1"),
    (2L, "a b c d x1 y1 z1 w2"),
    (3L, "a b c d p q r s t"),
    (4L, "a b c d p q r s u"),
    // 5/6: a near-dup pair with NO hot shingles at all
    (5L, "m n o p2 q2 r2 s2"),
    (6L, "m n o p2 q2 r2 t2"),
    // 7: short doc (no 3-gram) — must never appear in any pair
    (7L, "k l"))

  private def bruteForce(threshold: Double): Set[(Long, Long, Double)] = {
    val sets = docs.map { case (id, t) => id -> shingles(t) }
    (for {
      (a, sa) <- sets; (b, sb) <- sets
      if a < b && sa.nonEmpty && sb.nonEmpty
      inter = (sa & sb).size
      if inter > 0
      jac = inter.toDouble / (sa.size + sb.size - inter)
      if jac >= threshold
    } yield (a, b, jac)).toSet
  }

  test("jaccardPairs is exact when the df cap actually withholds hot shingles") {
    val df = docs.toDF("doc_id", "text")
    val sh = Dedup.shingleOf(spark, df, 2)
    // cap=2: the shared "a b c"/"b c d" shingles (df=4) are HOT and the
    // candidate self-join never sees them — inter_hot must add them back.
    val got = Dedup.jaccardPairs(sh, maxDf = 2, threshold = 0.3)
      .select("doc_a", "doc_b", "jac").as[(Long, Long, Double)].collect().toSet
    val want = bruteForce(0.3)
    assert(got == want, s"got=$got want=$want")
    assert(want.exists { case (a, b, _) => Set(a, b) == Set(1L, 2L) },
      "fixture must contain a verified pair whose jac depends on hot shingles")
  }

  test("jaccardPairs with a non-binding cap matches brute force too") {
    val df = docs.toDF("doc_id", "text")
    val sh = Dedup.shingleOf(spark, df, 2)
    val got = Dedup.jaccardPairs(sh, maxDf = 1000, threshold = 0.3)
      .select("doc_a", "doc_b", "jac").as[(Long, Long, Double)].collect().toSet
    assert(got == bruteForce(0.3))
  }

  test("a pair sharing ONLY hot shingles is not a candidate (cap semantics unchanged)") {
    val df = docs.toDF("doc_id", "text")
    val sh = Dedup.shingleOf(spark, df, 2)
    val got = Dedup.jaccardPairs(sh, maxDf = 2, threshold = 0.0)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    // 1↔3 share only the hot "a b c"/"b c d": under the documented cap
    // semantics they never become a candidate pair at ANY threshold.
    assert(!got.contains((1L, 3L)))
  }

  test("T.spread's repartition branch preserves rows exactly") {
    // r16 (advisor): the sf0.001 gate below only exercises the identity
    // branch; force the REPARTITION branch with a 1-row-group table big
    // enough to clear the rows-per-core floor (4096 * 4 cores).
    val dir = java.nio.file.Files.createTempDirectory("spreadtest").toString
    val n = 20000L
    spark.range(n).selectExpr("id AS k", "id % 97 AS v")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/big.parquet")
    val base = T(spark, dir, "big")
    val spreadDf = T.spread(spark, dir, "big", "k")
    assert(spreadDf.rdd.getNumPartitions == spark.sparkContext.defaultParallelism,
      "the spread gate must fire on a 1-row-group table with enough rows")
    assert(spreadDf.count() == n)
    assert(spreadDf.exceptAll(base).isEmpty && base.exceptAll(spreadDf).isEmpty)
  }

  test("d15 label propagation matches brute-force union-find over d04 pairs") {
    // r16 gate for the subgraph + pointer-doubling rewrite: components
    // computed distributed must equal a plain Scala union-find (with
    // min-id roots) over the same verified pair list.
    val pairs = run("d04_jaccard_pairs")
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    val docs = T(spark, sfDir, "documents")
      .select("doc_id").as[Long].collect()
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = docs.map(d => d -> find(d)).toMap
    val got = run("d15_neardup_components")
      .select("doc_id", "component").as[(Long, Long)].collect().toMap
    assert(got == want)
    assert(pairs.nonEmpty, "fixture must contain at least one near-dup pair")
  }

  test("T.spread returns exactly the base table's rows") {
    val base = T(spark, sfDir, "lineitem").select("l_orderkey", "l_linenumber")
    val spreadDf = T.spread(spark, sfDir, "lineitem", "l_orderkey")
      .select("l_orderkey", "l_linenumber")
    assert(spreadDf.count() == base.count())
    assert(spreadDf.exceptAll(base).isEmpty && base.exceptAll(spreadDf).isEmpty)
  }
}
