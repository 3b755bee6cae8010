package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** BPE merge-rule induction (t16) on the classic Sennrich corpus with
  * hand-computed expected merges, plus the replace-trick edge cases
  * (consecutive and overlapping pair occurrences). */
class BpeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("sennrich corpus: merges and frequencies match the hand computation") {
    // word freqs: low:3 lower:1 lowest:1 newest:2 widest:1
    val docs = Seq((1L,
      "low low low lower lowest newest newest widest"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.bpeMerges(docs, vocabSize = 100, rounds = 4)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    // r1: lo and ow tie at 5 -> l < o wins; r2: (lo,w) 5;
    // r3: es and st tie at 4 -> e < s wins; r4: (es,t) 4
    assert(out.toSeq == Seq(
      (1L, "l", "o", 5L),
      (2L, "lo", "w", 5L),
      (3L, "e", "s", 4L),
      (4L, "es", "t", 4L)), out.mkString(", "))
  }

  test("consecutive occurrences merge in one round; overlap merges greedily") {
    // 'abab' word: after merging (a,b), BOTH occurrences must be merged
    // in the same round (the replace must not consume the boundary);
    // 'aaa' must merge the LEFT pair only (greedy left-to-right)
    val docs = Seq((1L, "abab abab aaa")).toDF("doc_id", "text")
    val out = TextAnalysis.bpeMerges(docs, vocabSize = 100, rounds = 2)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    // r1 pairs: (a,b):4 (2 per 'abab' x2... weighted by word freq:
    // 'abab' n=2 -> 2 occurrences x 2 = 4), (b,a):2, (a,a):2
    assert(out(0) == ((1L, "a", "b", 4L)), out.mkString(", "))
    // r2: words are 'ab ab' (n=2) and 'aaa'; pairs: (ab,ab):2, (a,a):2
    // -> tie at 2, 'a' < 'ab' so (a,a) wins — proving 'a  a  a' kept
    // its double-space boundaries and 'ab  ab' merged both occurrences
    assert(out(1) == ((2L, "a", "a", 2L)), out.mkString(", "))
  }

  test("encode (t17): sennrich corpus subword usage matches hand computation") {
    // after merges (l,o),(lo,w),(e,s),(es,t): low(x3)='low',
    // lower='low e r', lowest='low est', newest(x2)='n e w est',
    // widest='w i d est' -> weighted subword counts:
    // low:5, est:4, e:3, w:3, n:2, d:1, i:1, r:1
    val docs = Seq((1L,
      "low low low lower lowest newest newest widest"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.bpeEncodeFreq(docs, vocabSize = 100, rounds = 4,
        topN = 100)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      (1L, "low", 5L), (2L, "est", 4L), (3L, "e", 3L), (4L, "w", 3L),
      (5L, "n", 2L), (6L, "d", 1L), (7L, "i", 1L), (8L, "r", 1L)),
      out.mkString(", "))
  }

  test("rounds beyond exhaustion stop early instead of failing") {
    val docs = Seq((1L, "ab ab")).toDF("doc_id", "text")
    val out = TextAnalysis.bpeMerges(docs, vocabSize = 10, rounds = 5)
      .collect()
    assert(out.length == 1) // one merge fully collapses the vocab
  }
}
