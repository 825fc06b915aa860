package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import java.io.File
import java.nio.file.{Files, Path}
import java.nio.file.attribute.FileTime

/** The stale-partials sweep, driven against planted trees in a scratch
  * dir: reclamation requires pid-dead AND a cold heartbeat (the O(1)
  * proof-of-life each run touches on every persisted-partials access),
  * and deletion never follows a symlink out of the swept tree. */
class PartialsSweepSpec extends AnyFunSuite with Matchers {
  private val ColdMs = 7L * 3600000L // older than the 6 h sweep window

  /** A pid that names no live process on this host. */
  private lazy val deadPid: Long =
    Iterator.iterate(600000L)(_ + 1)
      .find(p => ProcessHandle.of(p).isEmpty).get

  private def scratch(): Path = Files.createTempDirectory("sweep_spec_")

  private def plant(tmp: Path, pid: Long, heartbeatAgeMs: Option[Long],
                    rootAgeMs: Long): File = {
    val root = tmp.resolve(s"graft_partials_$pid")
    Files.createDirectories(root.resolve("fixture-abc/counter_hourly"))
    Files.write(root.resolve("fixture-abc/counter_hourly/part-0.parquet"),
      Array[Byte](1, 2, 3))
    heartbeatAgeMs.foreach { age =>
      val hb = root.resolve(SparkEntry.HeartbeatName)
      Files.write(hb, Array.emptyByteArray)
      Files.setLastModifiedTime(hb,
        FileTime.fromMillis(System.currentTimeMillis() - age))
    }
    Files.setLastModifiedTime(root,
      FileTime.fromMillis(System.currentTimeMillis() - rootAgeMs))
    root.toFile
  }

  private def sweep(tmp: Path): Unit =
    SparkEntry.sweepStaleSiblings(tmp.toFile, System.currentTimeMillis(),
      ProcessHandle.current().pid())

  test("a dead-pid tree with a COLD heartbeat is reclaimed") {
    val tmp = scratch()
    val root = plant(tmp, deadPid, heartbeatAgeMs = Some(ColdMs),
      rootAgeMs = ColdMs)
    sweep(tmp)
    root.exists() shouldBe false
  }

  test("a dead-pid tree with a FRESH heartbeat SURVIVES — the pid may " +
    "be live in another namespace sharing this /tmp") {
    val tmp = scratch()
    val root = plant(tmp, deadPid, heartbeatAgeMs = Some(0L),
      rootAgeMs = ColdMs)
    sweep(tmp)
    root.exists() shouldBe true
    Files.exists(root.toPath.resolve(
      "fixture-abc/counter_hourly/part-0.parquet")) shouldBe true
  }

  test("a pre-heartbeat dead tree falls back to the root dir's own " +
    "mtime: cold root reclaimed, fresh root kept") {
    val tmp = scratch()
    val cold = plant(tmp, deadPid, heartbeatAgeMs = None,
      rootAgeMs = ColdMs)
    val fresh = plant(tmp, deadPid + 1, heartbeatAgeMs = None,
      rootAgeMs = 0L)
    sweep(tmp)
    cold.exists() shouldBe false
    fresh.exists() shouldBe true
  }

  test("a LIVE pid's tree is never swept, heartbeat or not") {
    val tmp = scratch()
    val livePid = ProcessHandle.current().pid()
    // selfPid is a DIFFERENT pid, so only the liveness check protects it
    val root = plant(tmp, livePid, heartbeatAgeMs = None,
      rootAgeMs = ColdMs)
    SparkEntry.sweepStaleSiblings(tmp.toFile, System.currentTimeMillis(),
      selfPid = livePid + 1)
    root.exists() shouldBe true
  }

  test("reclaiming a tree unlinks a planted symlink ITSELF — the " +
    "victim directory it points at is never entered or deleted") {
    val tmp = scratch()
    val victim = Files.createTempDirectory("sweep_victim_")
    Files.write(victim.resolve("precious.txt"),
      "do not delete".getBytes("UTF-8"))
    val root = plant(tmp, deadPid, heartbeatAgeMs = Some(ColdMs),
      rootAgeMs = ColdMs)
    Files.createSymbolicLink(root.toPath.resolve("link"), victim)
    // creating the link refreshed the root dir's mtime — re-age it so
    // the tree still reads cold (the attack plants the link long before
    // the sweep runs)
    Files.setLastModifiedTime(root.toPath,
      FileTime.fromMillis(System.currentTimeMillis() - ColdMs))
    sweep(tmp)
    root.exists() shouldBe false
    Files.exists(victim.resolve("precious.txt")) shouldBe true
  }

  test("lastAliveMs reads a symlinked heartbeat's OWN mtime, not its " +
    "target's — a planted link to an old (or fresh) file cannot forge " +
    "the tree's age") {
    val tmp = scratch()
    val root = tmp.resolve(s"graft_partials_$deadPid")
    Files.createDirectories(root)
    // target is 10 days old; the link itself is created NOW
    val target = tmp.resolve("old_target")
    Files.write(target, Array.emptyByteArray)
    Files.setLastModifiedTime(target,
      FileTime.fromMillis(System.currentTimeMillis() - 10L * 86400000L))
    Files.createSymbolicLink(
      root.resolve(SparkEntry.HeartbeatName), target)
    Files.setLastModifiedTime(root,
      FileTime.fromMillis(System.currentTimeMillis() - 10L * 86400000L))
    // NOFOLLOW: the link's own (fresh) mtime wins over the old target
    // and the old root — the value is plant-time, which ages normally
    SparkEntry.lastAliveMs(root.toFile) should be >
      (System.currentTimeMillis() - 3600000L)
  }
}
