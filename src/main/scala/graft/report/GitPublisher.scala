package graft.report

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import graft.streaming.ReportPublisher

/** S11: real git publication of report artifacts (reference:
  * core/reporter.go:35-91 Init open-or-clone + pull, :176-207
  * add/commit/push and report-URL construction).
  *
  * Backed by the `git` CLI via ProcessBuilder rather than a JGit-style
  * library — same observable repo state (a commit per report, message
  * "reporting N addresses, M total events", pushed to origin), no extra
  * dependency. The remote may be any git URL; tests use a local bare
  * repository, so publication is exercised end-to-end without network.
  *
  * This is a driver-side effect after the aggregation completes, exactly
  * as in the reference — it is deliberately NOT a Spark operator and does
  * no distributed work beyond reading the already-written CSV artifact.
  */
class GitPublisher(localRepo: String, remote: String, httpBase: String)
    extends ReportPublisher {

  private val repoPath: Path = Paths.get(localRepo)

  /** Open + pull if the local clone exists, else clone (reporter.go:49-91). */
  def init(): this.type = {
    if (Files.isDirectory(repoPath.resolve(".git"))) {
      git("fetch", "origin")
      // the reference's Pull; --ff-only because reports are append-only
      git("merge", "--ff-only", "FETCH_HEAD")
    } else {
      Option(repoPath.toAbsolutePath.getParent).foreach(Files.createDirectories(_))
      runGit(repoPath.toAbsolutePath.getParent,
        Seq("clone", remote, repoPath.toAbsolutePath.toString))
    }
    this
  }

  /** Copy the CSV artifact into the worktree (collapsing Spark part files
    * into the reference's one-file-per-report shape), then add + commit +
    * push and return the public URL (reporter.go:176-207). */
  override def publishCsv(csvDir: String, addresses: Long, events: Long): String = {
    val src = Paths.get(csvDir)
    val baseName = src.getFileName.toString
    val parts = Files.list(src).iterator().asScala
      .filter(_.getFileName.toString.startsWith("part-"))
      .toSeq.sortBy(_.getFileName.toString)
    require(parts.nonEmpty, s"no CSV part files under $csvDir")
    val lines = parts.zipWithIndex.flatMap { case (p, i) =>
      val ls = Files.readAllLines(p, StandardCharsets.UTF_8).asScala.toSeq
      if (i == 0) ls else ls.drop(1) // every part repeats the header
    }
    Files.write(repoPath.resolve(baseName),
      lines.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))
    git("add", baseName)
    git("commit", "-m", s"reporting $addresses addresses, $events total events")
    git("push", "origin", "HEAD")
    val base = if (httpBase.endsWith("/")) httpBase else httpBase + "/"
    base + baseName
  }

  /** The tweet belongs to the Twitter channel (core/twitter.go), not the
    * git one; recorded for inspection. */
  val summaries = scala.collection.mutable.ArrayBuffer[String]()
  override def publishSummary(tweet: String): Unit = summaries += tweet

  private def git(args: String*): String = runGit(repoPath, args)

  private def runGit(cwd: Path, args: Seq[String]): String = {
    val cmd = Seq("git", "-c", "user.name=graft-reporter",
      "-c", "user.email=graft@localhost") ++ args
    val pb = new ProcessBuilder(cmd.asJava)
    pb.directory(cwd.toFile)
    pb.redirectErrorStream(true)
    val proc = pb.start()
    val out = new String(proc.getInputStream.readAllBytes(), StandardCharsets.UTF_8)
    val rc = proc.waitFor()
    if (rc != 0)
      throw new RuntimeException(
        s"git ${args.mkString(" ")} failed (rc=$rc) in $cwd:\n$out")
    out
  }
}
