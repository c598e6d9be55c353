package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-11 batch checks. The SGD training loop gets a
  * training-dynamics test (the property the cross-engine gate cannot
  * express: both engines could agree on a DIVERGING curve) plus a
  * step-0 consistency link to the single-step key's evidence. */
class Round11OpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("text_classifier_train_loop: loss strictly decreases over 3 steps") {
    val rows = graft.llm.TextStats.textClassifierTrainLoop(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(rows.map(_._1).toSeq == Seq(0L, 1L, 2L, 3L))
    val losses = rows.map(_._2)
    // strictly decreasing — the assertion that makes "training loop"
    // mean something (a sign error or a doubled gradient would still
    // gate-match, since the oracle replays the same algebra)
    losses.sliding(2).foreach { case Array(a, b) =>
      assert(b < a, s"loss did not decrease: ${losses.mkString(", ")}")
    }
    // gradient norm shrinks as the model approaches the optimum of
    // this convex objective (diagnostic of a sane step size: an
    // overshooting learning rate would oscillate or grow)
    val grads = rows.map(_._3)
    assert(grads.forall(_ > 0d))
    assert(grads.last < grads.head / 2,
      s"gradient barely moved: ${grads.mkString(", ")}")
    // logistic loss at any finite weights is bounded below by the
    // label-entropy floor; with ~ln(2) start, 3 bounded steps must
    // stay in (0, ln 2 + margin)
    assert(losses.forall(l => l > 0d && l < 0.75))
  }
}
