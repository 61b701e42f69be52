package graft

import org.apache.spark.sql.functions._

/** Invariants of the sparse-retrieval pack beyond the driver's oracle
  * hash: BM25's IDF actually discriminates (the rare term dominates its
  * query's ranking), and chunking covers every token with the declared
  * overlap and a unique (doc, chunk) key. */
class RetrievalSpec extends SparkSpec {

  test("bm25: every q2 top-5 doc contains the rare term 'dup'") {
    val top = run("d47_bm25_topk").filter(col("query_id") === "q2")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(top.size == 5)
    val withDup = T(spark, sfDir, "documents")
      .filter(col("text").contains("dup"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(top.subsetOf(withDup),
      s"rare-term IDF must dominate: ${top -- withDup} lack 'dup'")
  }

  test("bm25: scores are positive integers, ranks are 1..5 per query") {
    val rows = run("d47_bm25_topk").collect()
    assert(rows.length == 15)
    val byQuery = rows.groupBy(_.getString(0))
    assert(byQuery.keySet == Set("q1", "q2", "q3"))
    byQuery.values.foreach { qs =>
      assert(qs.map(_.getLong(1)).sorted.toSeq == Seq(1L, 2L, 3L, 4L, 5L))
      // ranks ordered by (score desc, doc_id): a total order
      val ordered = qs.sortBy(_.getLong(1)).map(r => (-r.getLong(3), r.getLong(2)))
      assert(ordered.toSeq == ordered.sorted.toSeq)
      assert(qs.forall(_.getLong(3) > 0))
    }
  }

  test("chunking: full coverage, declared overlap, unique (doc_id, chunk_idx)") {
    val chunks = run("d48_chunk_stride").collect()
    val docs = T(spark, sfDir, "documents")
      .select(col("doc_id"), size(filter(split(col("text"), " "),
        w => w =!= "")).as("n")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val byDoc = chunks.groupBy(_.getLong(0))
    assert(byDoc.keySet == docs.filter(_._2 > 0).keys.toSet)
    byDoc.foreach { case (id, cs) =>
      val n = docs(id)
      val idxs = cs.map(_.getLong(1)).sorted.toSeq
      // starts are 0, 8, 16, ... strictly below the doc length
      assert(idxs == (0L until ((n + 7) / 8).toLong))
      // every chunk is 16 tokens except a shorter tail
      cs.foreach { c =>
        val start = c.getLong(1) * 8
        val want = math.min(16L, n - start)
        assert(c.getLong(2) == want, s"doc $id chunk ${c.getLong(1)}")
        assert(c.getString(3).split(" ").length.toLong == want)
      }
    }
  }
}
