package graft.tools

import graft.operators.Multimodal

object AudioProbe {
  def main(args: Array[String]): Unit = {
    val wav = Multimodal.syntheticWav(8000, 2, 1200, 9000)
    def run(threads: Int, perThread: Int): Double = {
      val t0 = System.nanoTime()
      val ts = (0 until threads).map { _ =>
        new Thread(() => {
          var i = 0
          while (i < perThread) { Multimodal.decodeAudio(wav); i += 1 }
        })
      }
      ts.foreach(_.start()); ts.foreach(_.join())
      (System.nanoTime() - t0) / 1e9
    }
    run(1, 500) // JIT warm-up
    val n = 50000
    println(f"1 thread : ${run(1, n)}%6.2f s for $n decodes")
    println(f"32 thread: ${run(32, n / 32)}%6.2f s for $n decodes")
  }
}
