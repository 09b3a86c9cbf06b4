package graft.rank

import graft.SparkSpecBase

/** Finite-difference validation of the two-tower gradient (temporary
  * diagnostic, kept as a regression net: a wrong backprop converges
  * slowly instead of failing loudly). */
class TwoTowerGradCheckSpec extends SparkSpecBase {

  test("analytic chunk gradient matches finite differences") {
    val cfg = TwoTower.Config(embDim = 4, hiddenDim = 3, seed = "gc")
    val us = Array(0, 1, 2, 0)
    val is = Array(0, 1, 2, 3)
    val w = TwoTower.testInit(4, 4, cfg)

    def loss(w: TwoTower.Weights): Double = {
      val g = TwoTower.testGrad(w, us, is, cfg)
      g._2
    }
    val base = TwoTower.testGrad(w, us, is, cfg)
    val eps = 1e-4f

    def checkOne(get: () => Float, set: Float => Unit, analytic: Double,
        tag: String): Unit = {
      val orig = get()
      set(orig + eps); val lp = loss(w)
      set(orig - eps); val lm = loss(w)
      set(orig)
      val numeric = (lp - lm) / (2.0 * eps)
      assert(math.abs(numeric - analytic) < 1e-2 * math.max(1.0, math.abs(numeric)),
        s"$tag: numeric $numeric vs analytic $analytic")
    }

    val g = base._1
    // a user embedding touched by two rows
    checkOne(() => w.uEmb(0)(1), v => w.uEmb(0)(1) = v,
      g.uEmbGrad(0)(1), "uEmb(0)(1)")
    checkOne(() => w.iEmb(2)(3), v => w.iEmb(2)(3) = v,
      g.iEmbGrad(2)(3), "iEmb(2)(3)")
    checkOne(() => w.wU(1)(2), v => w.wU(1)(2) = v, g.wUGrad(1)(2), "wU(1)(2)")
    checkOne(() => w.wI(2)(0), v => w.wI(2)(0) = v, g.wIGrad(2)(0), "wI(2)(0)")
    checkOne(() => w.bU(0), v => w.bU(0) = v, g.bUGrad(0), "bU(0)")
    checkOne(() => w.bI(1), v => w.bI(1) = v, g.bIGrad(1), "bI(1)")
  }
}
