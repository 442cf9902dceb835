package graft
import htmlspark.pipeline.{PagesGen, ParseJob}
object ThreadProf {
  def main(args: Array[String]): Unit = {
    val nt = args(0).toInt
    val perThread = 60000L
    // warmup
    (0L until 5000L).foreach(i => ParseJob.parsePage(PagesGen.page(i)))
    val t0 = System.nanoTime()
    val threads = (0 until nt).map { k =>
      val t = new Thread(() => {
        var i = k * perThread
        val end = i + perThread
        while (i < end) { ParseJob.parsePage(PagesGen.page(i)); i += 1 }
      })
      t.start(); t
    }
    threads.foreach(_.join())
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"THREADS $nt docs=${nt * perThread} secs=$secs%.2f docs_per_sec=${nt * perThread / secs}%.0f per_core=${perThread * nt / secs / nt}%.0f")
  }
}
