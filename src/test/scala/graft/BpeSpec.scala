package graft

import graft.textops.Bpe

/** BPE training/tokenization properties: the textbook example learns
  * the expected merges, tokenization round-trips, and compression is
  * monotone in merge count.
  */
class BpeSpec extends SparkSpec {

  test("learns the classic merges on a known vocabulary") {
    // Sennrich-style toy: 'low' x5, 'lower' x2 — first merges chase
    // the shared 'lo'/'low' prefix mass
    val merges = Bpe.learn(Map("low" -> 5L, "lower" -> 2L), 3)
    assert(merges.head == ("l", "o"), s"got $merges")
    assert(merges(1) == ("lo", "w"), s"got $merges")
    // 'low' x5 ends as a single token + </w> merge candidates; the
    // third merge is the most frequent remaining pair: low+</w> (5)
    assert(merges(2) == ("low", "</w>"), s"got $merges")
  }

  test("tokenization round-trips and is deterministic") {
    val vocab = Map("spark" -> 10L, "sparse" -> 7L, "parse" -> 3L)
    val merges = Bpe.learn(vocab, 10)
    vocab.keys.foreach { w =>
      val toks = Bpe.tokenize(w, merges)
      assert(toks.mkString.stripSuffix("</w>") == w, s"round trip failed: $w -> $toks")
    }
    assert(Bpe.learn(vocab, 10) == merges, "training must be deterministic")
  }

  test("more merges never increase token count") {
    val vocab = Map("aaabdaaabac" -> 4L, "aabb" -> 2L)
    val w = "aaabdaaabac"
    val counts = (0 to 8).map(n => Bpe.tokenize(w, Bpe.learn(vocab, n)).length)
    assert(counts.zip(counts.tail).forall { case (a, b) => b <= a }, counts.toString)
    assert(counts.last < counts.head)
  }

  test("d24 runs: BPE token counts are below character counts") {
    val rows = run("d24_bpe_tokenize").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(1) <= r.getLong(2)),
      "BPE must not exceed the character tokenization")
    assert(rows.exists(r => r.getLong(1) < r.getLong(2)),
      "40 merges must compress at least one document")
  }
}
