package graft.fixtures

/** Single-threaded kernel profile (no Spark): docs/sec of ExtractKernel
  * alone, per payload class — separates kernel cost from Spark overhead. */
object ProfileMain {
  def main(args: Array[String]): Unit = {
    val rows = if (args.nonEmpty) args(0).toInt else 5000
    val pages = (0 until rows).map(i => PageGen.page(i.toLong, 42L))
    // warmup
    pages.take(500).foreach(p => graft.kernel.ExtractKernel.extractOne(p.url, p.html, 0, 0))
    val tA = System.nanoTime()
    pages.foreach(p => graft.kernel.ExtractKernel.extractOne(p.url, p.html, 0, 0))
    println(f"TOTAL-first: ${rows / ((System.nanoTime() - tA) / 1e9)}%.0f docs/s")
    val byClass = pages.groupBy(_.text)
    byClass.toSeq.sortBy(_._1).foreach { case (cls, ps) =>
      val t0 = System.nanoTime()
      var chars = 0L
      ps.foreach { p =>
        val d = graft.kernel.ExtractKernel.extractOne(p.url, p.html, 0, 0)
        chars += d.n_chars
      }
      val sec = (System.nanoTime() - t0) / 1e9
      val bytes = ps.map(_.html.length.toLong).sum
      println(f"$cls%-16s n=${ps.size}%5d  ${ps.size / sec}%9.0f docs/s  ${bytes / sec / 1e6}%8.1f MB/s  avg=${bytes / ps.size}%7d B")
    }
    (1 to 4).foreach { pass =>
      val t0 = System.nanoTime()
      pages.foreach(p => graft.kernel.ExtractKernel.extractOne(p.url, p.html, 0, 0))
      val sec = (System.nanoTime() - t0) / 1e9
      val rt = Runtime.getRuntime
      println(f"TOTAL pass $pass: ${rows / sec}%.0f docs/s  heapUsed=${(rt.totalMemory - rt.freeMemory) / 1e6}%.0f MB")
    }
  }
}
