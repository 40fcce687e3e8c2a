package graft.fixtures

import java.util.concurrent.atomic.AtomicLong

/** Pure-JVM multithreaded kernel throughput (no Spark): isolates whether
  * the scaling ceiling is Spark machinery or memory bandwidth / host caps. */
object ThreadProfileMain {
  def main(args: Array[String]): Unit = {
    val rows = if (args.nonEmpty) args(0).toInt else 40000
    val mode = if (args.length > 1) args(1) else "all"
    val pages0 = (0 until rows).map(i => PageGen.page(i.toLong, 42L))
    val pages = (mode match {
      case "all" => pages0
      case m => pages0.filter(_.text.startsWith(m))
    }).toArray
    println(s"mode=$mode n=${pages.length}")
    // warmup
    pages.take(3000).foreach(p => graft.kernel.ExtractKernel.extractOne(p.url, p.html, 0, 0))
    (if (sys.env.contains("BURST_PROBE")) Seq(32,32,32,32,32,32,32,32) else Seq(32, 8, 32, 1)).foreach { threads =>
      val idx = new AtomicLong(0)
      val t0 = System.nanoTime()
      val ts = (0 until threads).map { _ =>
        new Thread(() => {
          var i = idx.getAndIncrement()
          while (i < pages.length) {
            val p = pages(i.toInt)
            graft.kernel.ExtractKernel.extractOne(p.url, p.html, 0, 0)
            i = idx.getAndIncrement()
          }
        })
      }
      ts.foreach(_.start()); ts.foreach(_.join())
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"threads=$threads%2d  ${pages.length / sec}%9.0f docs/s  t=${System.currentTimeMillis / 1000 % 10000}")
      if (sys.env.contains("BURST_SLEEP")) Thread.sleep(sys.env("BURST_SLEEP").toLong * 1000)
    }
  }
}
