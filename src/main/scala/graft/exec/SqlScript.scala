package graft.exec

import scala.collection.mutable.ArrayBuffer

import graft.parser.ChParser

/** Splitters for the reference's own SQL test corpus, so its files run
  * VERBATIM through [[GraftSession]]:
  *
  *  - [[splitBlankLine]] reproduces the reference's `sql_test_runner`
  *    semantics (crates/tests_integ/src/sql_test_runner.rs:50-95):
  *    statements are blank-line-separated blocks; a leading `:N` line is
  *    the expected scalar of the block's statement. (The reference's own
  *    `while find("\n\n")` loop silently drops the FINAL block — and with
  *    it basic_checks.sql's only assertion; here the final block runs.)
  *  - [[splitSemicolon]] serves `;`-terminated scripts
  *    (crates/tests_integ/tpch/01095_tpch_like_smoke.sql): statements are
  *    split on top-level `;` — string-literal- and comment-aware — and a
  *    trailing `-- {{ serverError N }}` marker on the terminator line is
  *    captured as "the reference expects this statement to FAIL".
  *  - [[disabledStatements]] resurrects the query blocks the reference
  *    ships fully commented out (`-- select ...` runs for its q4/q21/q22,
  *    disabled because DataFusion-6 lacks [NOT] EXISTS).
  */
object SqlScript {

  /** One runnable statement from a script file.
    *
    * @param expectServerError the script marks this statement with
    *        `-- {{ serverError N }}` — the reference engine expects it
    *        to fail
    * @param expectScalar a `:N` expectation line preceding the statement
    */
  final case class Stmt(sql: String, expectServerError: Boolean = false,
                        expectScalar: Option[Long] = None)

  /** True when `raw` holds no tokens (only whitespace/comments). */
  private def isBlank(raw: String): Boolean =
    ChParser.tokenize(raw).toOption.exists(_.isEmpty)

  /** Leading comment-only lines (a preceding disabled block) belong to the
    * file, not to the statement that follows them.
    */
  private def stripLeadingComments(s: String): String =
    s.split("\n", -1)
      .dropWhile(l => l.trim.isEmpty || l.trim.startsWith("--"))
      .mkString("\n")

  def splitSemicolon(text: String): Seq[Stmt] = {
    val out = ArrayBuffer.empty[Stmt]
    val n = text.length
    var i = 0
    var start = 0
    while (i < n) {
      val c = text.charAt(i)
      if (c == '-' && i + 1 < n && text.charAt(i + 1) == '-') {
        while (i < n && text.charAt(i) != '\n') i += 1
      } else if (c == '/' && i + 1 < n && text.charAt(i + 1) == '*') {
        val end = text.indexOf("*/", i + 2)
        i = if (end < 0) n else end + 2
      } else if (c == '\'') {
        // CH string literal: backslash escapes and '' doubling
        var j = i + 1
        var closed = false
        while (j < n && !closed) {
          val ch = text.charAt(j)
          if (ch == '\\' && j + 1 < n) j += 2
          else if (ch == '\'' && j + 1 < n && text.charAt(j + 1) == '\'') j += 2
          else if (ch == '\'') { closed = true; j += 1 }
          else j += 1
        }
        i = j
      } else if (c == ';') {
        val raw = text.substring(start, i)
        // a serverError marker rides in a comment on the terminator line
        var j = i + 1
        while (j < n && text.charAt(j) != '\n') j += 1
        val lineTail = text.substring(i + 1, j)
        val cmt = lineTail.indexOf("--")
        val preComment = if (cmt < 0) lineTail else lineTail.take(cmt)
        if (!isBlank(raw))
          out += Stmt(stripLeadingComments(raw).trim,
            expectServerError = cmt >= 0 &&
              lineTail.substring(cmt).contains("serverError"))
        // a terminator line ending in a trailing comment: the comment
        // belongs to THIS statement, not the next one — but same-line SQL
        // after the ';' starts the next statement immediately
        if (preComment.trim.isEmpty) { start = j; i = j }
        else { start = i + 1; i += 1 }
      } else i += 1
    }
    val last = text.substring(start)
    if (!isBlank(last)) out += Stmt(stripLeadingComments(last).trim)
    out.toSeq
  }

  def splitBlankLine(text: String): Seq[Stmt] =
    text.split("\n[ \t]*\n").toSeq.map(_.trim).filter(b => !isBlank(b))
      .map { block =>
        val lines = block.split("\n").toSeq
        val (expect, body) =
          if (lines.head.trim.matches(":-?[0-9]+"))
            (Some(lines.head.trim.drop(1).toLong),
             lines.tail.mkString("\n").trim)
          else (None, block)
        Stmt(body.stripSuffix(";").trim, expectScalar = expect)
      }
      .filter(s => s.sql.nonEmpty)

  /** Statements the script ships fully commented out: runs of consecutive
    * `-- `-prefixed lines whose uncommented text is a complete SELECT. The
    * annotation comments inside live statements never match (they do not
    * start with `select`).
    */
  def disabledStatements(text: String): Seq[String] = {
    val runs = ArrayBuffer.empty[Seq[String]]
    var cur = ArrayBuffer.empty[String]
    text.split("\n", -1).foreach { l =>
      if (l.startsWith("--"))
        cur += l.stripPrefix("--").stripPrefix(" ")
      else if (cur.nonEmpty) { runs += cur.toSeq; cur = ArrayBuffer.empty }
    }
    if (cur.nonEmpty) runs += cur.toSeq
    runs.map(_.mkString("\n").trim)
      .filter(s => s.toLowerCase.startsWith("select") && s.contains(";"))
      .flatMap(s => splitSemicolon(s).map(_.sql))
      .toSeq
  }
}
