package graft.ops

import graft.SparkSpec

/** [[Preference]]: wins-matrix derivation (ties deterministic), MM
  * ratings ordering on closed-form duels, renormalization invariant,
  * and the degenerate total-loser case the zero-guards cover.
  */
class PreferenceSpec extends SparkSpec {
  import spark.implicits._

  test("wins matrix: higher utility wins, ties to the smaller item") {
    val ut = Seq(
      ("r1", "a", 10L), ("r1", "b", 5L),   // a beats b
      ("r2", "a", 3L), ("r2", "b", 3L),    // tie -> a (smaller) wins
      ("r3", "b", 9L), ("r3", "c", 1L))    // b beats c
      .toDF("rater", "item", "w")
    val wm = Preference.winsMatrix(ut)
      .as[(String, String, Long)].collect().toSet
    assert(wm == Set(("a", "b", 2L), ("b", "c", 1L)))
  }

  test("dominance chain rates a > b > c; ratings renormalize to k·1e6") {
    // a beats b 9:1, b beats c 9:1, a beats c 9:1 — strict chain
    val wm = Seq(
      ("a", "b", 9L), ("b", "a", 1L),
      ("b", "c", 9L), ("c", "b", 1L),
      ("a", "c", 9L), ("c", "a", 1L)).toDF("item", "rival", "wins")
    val r = Preference.bradleyTerry(wm, iters = 3)
      .as[(String, Long, Long, Long)].collect()
    assert(r.map(_._1).toSeq == Seq("a", "b", "c"),
      s"expected rating order a,b,c got ${r.toSeq}")
    val Seq(pa, pb, pc) = r.map(_._4).toSeq
    assert(pa > pb && pb > pc)
    // floor renormalization: sum within nItems of the 3e6 target
    assert(math.abs(pa + pb + pc - 3000000L) <= 3)
    // wins/games bookkeeping: a won 18 of its 20 games
    val a = r.find(_._1 == "a").get
    assert(a._2 == 18L && a._3 == 20L)
  }

  test("symmetric round-robin rates everyone equal") {
    val wm = Seq(
      ("a", "b", 5L), ("b", "a", 5L),
      ("b", "c", 5L), ("c", "b", 5L),
      ("a", "c", 5L), ("c", "a", 5L)).toDF("item", "rival", "wins")
    val p = Preference.bradleyTerry(wm, iters = 3)
      .as[(String, Long, Long, Long)].collect().map(_._4).toSet
    assert(p.size == 1, s"symmetric duels must tie exactly, got $p")
  }

  test("total loser floors to rating 0 without dividing by zero") {
    // z never wins a single game; after iteration 1 its rating is 0 and
    // later iterations must keep serving (the tExpr/renorm zero guards)
    val wm = Seq(("a", "z", 10L), ("b", "z", 10L), ("a", "b", 1L),
      ("b", "a", 1L)).toDF("item", "rival", "wins")
    val r = Preference.bradleyTerry(wm, iters = 3)
      .as[(String, Long, Long, Long)].collect()
    val z = r.find(_._1 == "z").get
    assert(z._4 == 0L && z._2 == 0L && z._3 == 20L)
    assert(r.filter(_._1 != "z").forall(_._4 > 0L))
  }
}
