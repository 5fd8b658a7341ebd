package graft

import java.nio.file.{Files, Paths}

/** RAM-backed scratch-dir management for the harness mains (round-15
  * hygiene, r14 VERDICT item 7 / ADVICE item 1): every scratch root is
  * suffixed with the owning JVM's pid so (a) concurrent JVMs (Bench +
  * Verify) can never collide on shuffle or checkpoint paths, and (b) a
  * startup sweep can safely reclaim dirs left behind by killed runs —
  * a SIGKILL'd JVM cleans nothing, and /dev/shm otherwise accumulates
  * ~GBs of dead shuffle/state files until reboot. */
object Scratch {

  private def pid: Long = ProcessHandle.current().pid()

  private def shmOk: Boolean =
    Files.isWritable(Paths.get("/dev/shm"))

  private def root: String =
    if (shmOk) "/dev/shm" else System.getProperty("java.io.tmpdir")

  private def rm(p: java.io.File): Unit = {
    Option(p.listFiles()).foreach(_.foreach(rm)); p.delete(); ()
  }

  private def pidAlive(pid: Long): Boolean =
    ProcessHandle.of(pid).isPresent

  /** Delete graft scratch dirs whose owning JVM is gone: pid-suffixed
    * dirs with a dead pid, plus the legacy un-suffixed names (written
    * by pre-round-15 code, which no current JVM uses). Idempotent and
    * safe under concurrency: a LIVE pid's dirs are never touched. */
  def sweepStale(): Unit = {
    val dir = new java.io.File(root)
    val prefixes = Seq("graft-local", "graft-replay-ck")
    Option(dir.listFiles()).getOrElse(Array.empty).foreach { f =>
      val n = f.getName
      prefixes.foreach { p =>
        if (n == p) rm(f) // legacy shared name: only a dead run's leftover
        else if (n.startsWith(p + "-")) {
          val suffix = n.substring(p.length + 1)
          suffix.toLongOption match {
            case Some(owner) if !pidAlive(owner) => rm(f)
            case None => rm(f) // malformed suffix: not a live format
            case _ => ()
          }
        }
      }
    }
  }

  /** Per-JVM spark.local.dir (shuffle/spill scratch) on the RAM dir
    * when present. Harness-only posture: cluster deployments set
    * spark.local.dir to their NVMe arrays via spark-defaults; the
    * suite's shuffles are KB-to-MB so tmpfs capacity is not a bet. */
  def localDir(): String = {
    sweepStale()
    s"$root/graft-local-$pid"
  }

  /** Per-JVM replay checkpoint base (run-scoped scratch — determinism
    * comes from the ordered feed, not recovery). */
  def replayCkBase(): String = s"$root/graft-replay-ck-$pid"
}
