package graft.operators

class BpeSpec extends graft.SparkSpec {
  import spark.implicits._

  test("bpe: classic vocabulary learns (e,s) -> (es,t) -> (est,</w>)") {
    val vocab = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
      .toDF("word", "freq")
    val (rules, seg) = Bpe.train(vocab, nMerges = 3)
    assert(rules.map(r => (r.rank, r.left, r.right, r.count)) ==
      Seq((1, "e", "s", 9L), (2, "es", "t", 9L), (3, "est", "</w>", 9L)))
    val toks = seg.collect()
      .map(r => r.getAs[String]("word") -> r.getAs[String]("tokens")).toMap
    assert(toks("newest") == "n e w est</w>")
    assert(toks("widest") == "w i d est</w>")
    assert(toks("low") == "l o w </w>")
    val n = seg.collect()
      .map(r => r.getAs[String]("word") -> r.getAs[Long]("n_tokens")).toMap
    assert(n("newest") == 4L && n("low") == 4L)
  }

  test("bpe: overlapping pairs count fully but apply greedy-leftmost") {
    // "a a a a </w>": pair (a,a) counts 3 occurrences x freq, but the
    // fold merges non-overlapping leftmost -> "aa aa </w>"
    val vocab = Seq(("aaaa", 10L)).toDF("word", "freq")
    val (rules, seg) = Bpe.train(vocab, nMerges = 2)
    assert(rules.head.left == "a" && rules.head.right == "a" && rules.head.count == 30L)
    // iteration 2: "aa </w>" (10) sorts before "aa aa" (10) because
    // '<' < 'a' at the first differing byte — the string tiebreak
    assert((rules(1).left, rules(1).right) == ("aa", "</w>"))
    assert(seg.collect().head.getAs[String]("tokens") == "aa aa</w>")
  }

  test("bpe: wordVocab aggregates corpus word frequencies") {
    val docs = Seq((1L, "a b a"), (2L, "b a")).toDF("doc_id", "text")
    val v = Bpe.wordVocab(docs, "text").collect()
      .map(r => r.getAs[String]("word") -> r.getAs[Long]("freq")).toMap
    assert(v == Map("a" -> 3L, "b" -> 2L))
  }

  test("bpe: encodeCorpus falls back to char segmentation for out-of-vocabulary words") {
    // trained on {low}; served a corpus containing the unseen 'newest'
    val (_, seg) = Bpe.train(Seq(("low", 5L)).toDF("word", "freq"), nMerges = 1)
    val served = Seq((1L, "low newest low")).toDF("doc_id", "text")
    val out = Bpe.encodeCorpus(served, "doc_id", "text", seg).collect().head
    assert(out.getAs[Long]("n_words") == 3L) // nothing silently dropped
    val toks = out.getAs[String]("tokenized")
    assert(toks.contains("n e w e s t </w>"), s"char fallback missing in: $toks")
    // 6 chars + </w> for the unknown word, trained form for the known ones
    assert(out.getAs[Long]("n_bpe_tokens") ==
      seg.where($"word" === "low").select($"n_tokens").as[Long].head() * 2 + 7)
  }
}
