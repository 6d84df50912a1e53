package graft

/** Cost-curve probe (VERDICT r15 #8): time named SparkEntry queries at a
  * given SF dir — run at two scales a decade apart, the wall-time ratios
  * are the scaling exponents SCALE.md records. Output: one JSON line
  * {"sf":dir,"queries":{name:sec,...}} (min of N reps, default 2).
  *
  *   sbt "runMain graft.ScaleProbe <sfDir> <name1,name2,...> [reps]"
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val reps = if (args.length > 2) args(2).toInt else 2
    val spark = Sessions.build("graft-scaleprobe")
    def timeIt(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val out = names.map { n =>
      val fn = SparkEntry.queries.getOrElse(n,
        sys.error(s"no such query: $n"))
      val xs = (1 to reps).map { _ =>
        val t = timeIt { fn(spark, sfDir).write.mode("overwrite")
          .format("noop").save() }
        graft.queries.LlmQueries.releaseShared()
        t
      }
      f""""$n":${xs.min}%.3f"""
    }
    println(s"""{"sf":"$sfDir","reps":$reps,"queries":${
      out.mkString("{", ",", "}")}}""")
    spark.stop()
  }
}
