package graft

/** Shared child-JVM plumbing for the cross-process race tools
  * ([[CommitRaceDryRun]], [[BranchRaceDryRun]]): spawn a child with
  * the parent's module options (the JDK-17 --add-opens set build.sbt
  * passes every forked JVM) and capture its combined output to a file
  * — a dead child's stack must be quotable in the failure message, not
  * scattered into sbt stdout (the round-14 flake was undiagnosable for
  * exactly that reason). */
private[graft] object RaceHarness {

  /** The parent JVM's --add-opens/--add-exports flags, verbatim. */
  def moduleOpts: Seq[String] = {
    import scala.jdk.CollectionConverters._
    val in = java.lang.management.ManagementFactory
      .getRuntimeMXBean.getInputArguments.asScala.toList
    in.zip(in.drop(1) :+ "").collect {
      case (flag, v) if flag == "--add-opens" || flag == "--add-exports" =>
        Seq(flag, v)
      case (flag, _) if flag.startsWith("--add-opens=") ||
          flag.startsWith("--add-exports=") => Seq(flag)
    }.flatten
  }

  def childLog(table: String, tag: String): java.io.File =
    new java.io.File(s"$table.child-$tag.log")

  /** Spawn `mainClass child <table> <tag> <args…>` with output captured
    * to [[childLog]]. */
  def spawn(mainClass: String, table: String, tag: String,
      args: Seq[String]): Process = {
    val cp = System.getProperty("java.class.path")
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val cmd = Seq(javaBin) ++ moduleOpts ++ Seq("-Xmx1g", "-cp", cp,
      mainClass, "child", table, tag) ++ args
    new ProcessBuilder(cmd: _*)
      .redirectErrorStream(true)
      .redirectOutput(childLog(table, tag))
      .start()
  }

  /** Last 40 lines of a child's captured output, for failure messages. */
  def tail(table: String, tag: String): String = {
    val f = childLog(table, tag)
    if (!f.exists()) return s"<no ${f.getName}>"
    val src = scala.io.Source.fromFile(f, "UTF-8")
    try {
      val all = src.getLines().toVector
      s"--- child $tag (last 40 of ${all.size} lines) ---\n" +
        all.takeRight(40).mkString("\n")
    } finally src.close()
  }
}
