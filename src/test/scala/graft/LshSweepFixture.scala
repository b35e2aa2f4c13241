package graft

/** THE labeled near-dup fixture behind the dedupNearLsh precision/recall
  * numbers — one generator shared by `Scratch lshsweep` (the sweep that
  * produced the FIXTURES.md table) and the CorpusOpsSpec operating-point
  * test that pins the default (8, 4) point EXACTLY (785 truth / 901
  * candidate / 568 true-positive pairs). Sharing makes the spec's "the
  * exact fixture the sweep measures" claim true by construction: an edit
  * here moves both, an edit can't move one silently.
  *
  * Shape: 100 families × 10 copies, each copy mutating 0..8 of the base's
  * 40 words (the ' uq<j>'-style mutation generator of the r15 skew
  * replica, generalized to graded similarity), plus 1000 unrelated
  * singleton docs; 400-word vocabulary, seed 20260816.
  */
object LshSweepFixture {
  def docs(): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(20260816L)
    val vocab = (0 until 400).map(i => s"w$i")
    def doc(): Array[String] = Array.fill(40)(vocab(rnd.nextInt(vocab.size)))
    val rows = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    var id = 0L
    for (_ <- 0 until 100) {
      val base = doc()
      for (_ <- 0 until 10) {
        val words = base.clone()
        val m = rnd.nextInt(9)
        (0 until m).foreach { _ =>
          words(rnd.nextInt(words.length)) = vocab(rnd.nextInt(vocab.size))
        }
        id += 1; rows += ((id, words.mkString(" ")))
      }
    }
    for (_ <- 0 until 1000) { id += 1; rows += ((id, doc().mkString(" "))) }
    rows.toSeq
  }
}
