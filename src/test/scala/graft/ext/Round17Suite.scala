package graft.ext

import graft.SparkSpec

/** Round-17 batch: token-ID corpus materialization under a learned BPE
  * vocabulary — hand-checked segmentation, ID assignment, document
  * order, and the empty-document row.
  */
class Round17Suite extends SparkSpec {
  import spark.implicits._

  describe("TextAnalysis.bpeEncode") {
    it("segments with the merge list, ranks pieces lexicographically, keeps order") {
      // merges: (p,l) -> 'pl', then (pl,a) -> 'pla'
      val merges = Seq(("p", "l"), ("pl", "a"))
      val docs = Seq(
        (1L, "play plaza lap"),
        (2L, "PLAY !!"),      // no clean token -> (0, '', '')
        (3L, "al pla")
      ).toDF("doc_id", "text")
      val out = TextAnalysis.bpeEncode(docs, merges)
        .orderBy("doc_id")
        .as[(Long, Long, String, String)].collect()

      // play  -> |p|l|a|y| -> |pl|a|y| -> |pla|y|  => pla y
      // plaza -> ... -> |pla|z|a|                  => pla z a
      // lap   -> |l|a|p| (no |p|l| adjacency)      => l a p
      // al    -> |a|l|                             => a l
      // pla   -> |pla|                             => pla
      // vocab sorted: a=1, l=2, p=3, pla=4, y=5, z=6
      assert(out(0) == ((1L, 8L, "pla y pla z a l a p", "4 5 4 6 1 2 1 3")))
      assert(out(1) == ((2L, 0L, "", "")))
      assert(out(2) == ((3L, 3L, "a l pla", "1 2 4")))
    }

    it("bpePieceCounts agrees with bpeEncode's n_pieces on every document") {
      val merges = Seq(("p", "l"), ("pl", "a"))
      val docs = Seq(
        (1L, "play plaza lap"), (2L, "NOPE !!"), (3L, "al pla ab")
      ).toDF("doc_id", "text")
      val enc = TextAnalysis.bpeEncode(docs, merges)
        .select("doc_id", "n_pieces").as[(Long, Long)].collect().toMap
      val cnt = TextAnalysis.bpePieceCounts(docs, merges)
        .as[(Long, Long)].collect().toMap
      assert(cnt == enc)
    }

    it("n_pieces reconciles with the pieces string for every document") {
      val docs = Seq(
        (10L, "aa ab aa ba"),
        (11L, "b a ab"),
        (12L, "")
      ).toDF("doc_id", "text")
      val out = TextAnalysis.bpeEncode(docs, Seq(("a", "b")))
        .orderBy("doc_id")
        .as[(Long, Long, String, String)].collect()
      for ((_, n, pieces, ids) <- out) {
        val np = if (pieces.isEmpty) 0 else pieces.split(" ").length
        val ni = if (ids.isEmpty) 0 else ids.split(" ").length
        assert(n == np && n == ni)
      }
      // 'ab' is a learned piece; 'ba' stays two pieces (order matters)
      assert(out(0)._3 == "a a ab a a b a")
    }
  }
}
