package graft.tools

/** Throwaway: reproduce a gate failure with the full root stack. */
object Repro {
  def main(args: Array[String]): Unit = {
    val s = graft.GraftSession.local(threads = sys.env.getOrElse("REPRO_CPUS", "8").toInt, shufflePartitions = 32)
    s.sparkContext.setLogLevel("ERROR")
    try {
      val df = graft.SparkEntry.queries(args(0))(s, args(1))
      df.write.format("noop").mode("overwrite").save()
      println("REPRO-OK rows=" + df.count())
    } catch {
      case e: Throwable =>
        def root(t: Throwable): Throwable =
          if (t.getCause == null) t else root(t.getCause)
        val r = root(e)
        println("REPRO-ROOT: " + r)
        r.getStackTrace.take(50).foreach(x => println("  at " + x))
    }
    s.stop()
  }
}
