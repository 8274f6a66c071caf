package graft

import org.scalatest.funsuite.AnyFunSuite

/** Bench-infrastructure pins for tools.CacheKeeper: pinning maps real
  * bytes, unpin stops the touch thread, and a missing root degrades
  * to a no-op instead of failing a bench run. */
class CacheKeeperSpec extends AnyFunSuite {
  test("pin maps files, keeps a daemon touch thread, unpin stops it") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ck").toFile
    val f = new java.io.File(dir, "data.bin")
    val bytes = Array.tabulate[Byte](1 << 20)(i => (i * 31).toByte)
    java.nio.file.Files.write(f.toPath, bytes)
    val pinned = tools.CacheKeeper.pin(Seq(dir.getAbsolutePath), touchIntervalMs = 50L)
    assert(pinned === bytes.length.toLong)
    def keeper() = Thread.getAllStackTraces.keySet.toArray
      .map(_.asInstanceOf[Thread])
      .find(_.getName == "graft-cache-keeper")
    val t = keeper()
    assert(t.isDefined && t.get.isDaemon)
    tools.CacheKeeper.unpin()
    val deadline = System.nanoTime() + 5L * 1000 * 1000 * 1000
    while (keeper().exists(_.isAlive) && System.nanoTime() < deadline)
      Thread.sleep(20)
    assert(keeper().forall(!_.isAlive))
  }

  test("missing root and re-pin are safe") {
    assert(tools.CacheKeeper.pin(Seq("/no/such/graft/dir")) === 0L)
    tools.CacheKeeper.unpin() // idempotent
    tools.CacheKeeper.unpin()
  }

  test("benchLocalDir is RAM-backed temp or None, never throws") {
    tools.CacheKeeper.benchLocalDir().foreach { d =>
      assert(new java.io.File(d).isDirectory)
    }
  }
}
