package graft.fixtures

import java.nio.file.{Files, Paths}
import java.util.Base64

/** Dump the first N fixture payloads as JSONL (url, b64 html, provenance)
  * for the CPython golden oracle (tools/gen_page_goldens.py). Plain JVM
  * main — no Spark needed. */
object DumpMain {
  def main(args: Array[String]): Unit = {
    val out = args(0)
    val rows = args(1).toInt
    val seed = if (args.length > 2) args(2).toLong else 42L
    val sb = new StringBuilder
    (0 until rows).foreach { i =>
      val p = PageGen.page(i.toLong, seed)
      sb.append("{\"url\":\"").append(p.url)
        .append("\",\"b64\":\"").append(Base64.getEncoder.encodeToString(p.html))
        .append("\",\"provenance\":\"").append(p.text).append("\"}\n")
    }
    Files.write(Paths.get(out), sb.toString.getBytes("UTF-8"))
    println(s"wrote $rows payloads to $out")
  }
}
