package graft

import scala.io.Source

import graft.exec.GraftSession

/** Minimal script/REPL entry point — SURVEY §7 step 6 (replaces the
  * reference's wire servers for demos and e2e runs; its script runner is
  * crates/tests_integ/src/sql_test_runner.rs).
  *
  * Usage:
  *   runMain graft.GraftCli script.sql [script2.sql …]   # run scripts
  *   runMain graft.GraftCli -e "SELECT 1"                # one statement
  *   runMain graft.GraftCli --serve [port]               # CH native TCP server
  *   runMain graft.GraftCli --serve-http [port]          # CH HTTP interface
  *   runMain graft.GraftCli                              # REPL on stdin
  */
object GraftCli {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.build("graft-cli")
    val g = new GraftSession(spark)

    def show(df: org.apache.spark.sql.DataFrame): Unit =
      if (df.schema.nonEmpty) df.show(100, truncate = false)

    args.toList match {
      case "-e" :: stmt :: Nil => show(g.sql(stmt))
      case "--serve" :: rest =>
        val port = rest.headOption.map(_.toInt).getOrElse(9000)
        val server = new graft.server.ChWireServer(spark, port).start()
        println(s"graft: ClickHouse-native server listening on ${server.boundPort}")
        Thread.currentThread.join() // serve until killed
      case "--serve-mysql" :: rest =>
        val port = rest.headOption.map(_.toInt).getOrElse(3306)
        val server = new graft.server.MysqlWireServer(spark, port).start()
        println(s"graft: MySQL server listening on ${server.boundPort}")
        Thread.currentThread.join() // serve until killed
      case "--serve-http" :: rest =>
        val port = rest.headOption.map(_.toInt).getOrElse(8123)
        val server = new graft.server.ChHttpServer(spark, port).start()
        println(s"graft: ClickHouse HTTP server listening on ${server.boundPort}")
        Thread.currentThread.join() // serve until killed
      case Nil =>
        println("graft> one statement per line; 'exit' quits")
        Iterator.continually(scala.io.StdIn.readLine("graft> "))
          .takeWhile(l => l != null && l.trim != "exit")
          .filter(_.trim.nonEmpty)
          .foreach { line =>
            try show(g.sql(line))
            catch { case e: Exception => println(s"error: ${e.getMessage}") }
          }
      case scripts =>
        scripts.foreach { path =>
          val text = {
            val src = Source.fromFile(path)
            try src.mkString finally src.close()
          }
          show(g.script(text))
        }
    }
    spark.stop()
  }
}
