package graft.tools

import graft.models.CatsModel.{LstmCell, BiLstm}

object CatsPhase {
  def main(args: Array[String]): Unit = {
    val rnd = new scala.util.Random(3)
    def m(r: Int, c: Int) = Array.fill(r, c)(rnd.nextFloat())
    def v(n: Int) = Array.fill(n)(rnd.nextFloat())
    val cell1 = LstmCell(m(4, 200), m(50, 200), v(200))
    val cell2 = LstmCell(m(100, 600), m(150, 600), v(600))
    val bi1 = BiLstm(cell1, LstmCell(m(4, 200), m(50, 200), v(200)))
    val bi2 = BiLstm(cell2, LstmCell(m(100, 600), m(150, 600), v(600)))
    val x = Array.fill(395, 4)(rnd.nextDouble())
    def time(tag: String, reps: Int)(f: => Unit): Unit = {
      (0 until 3).foreach(_ => f)
      val t0 = System.nanoTime()
      (0 until reps).foreach(_ => f)
      println(f"$tag: ${(System.nanoTime() - t0) / 1e6 / reps}%.2f ms")
    }
    var h1: Array[Array[Double]] = null
    time("lstm1.sequences (4->2x50)", 20) { h1 = bi1.sequences(x) }
    time("lstm2.lastState (100->2x150)", 20) { bi2.lastState(h1) }
    val xb = Array.fill(16)(x)
    time("lstm1 batch16/row", 2) { bi1.sequencesBatch(xb) }
    val h1b = bi1.sequencesBatch(xb)
    time("lstm2 batch16 (total)", 2) { bi2.lastStateBatch(h1b) }
  }
}
