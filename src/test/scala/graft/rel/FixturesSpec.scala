package graft.rel

import java.nio.file.{Files, Path}
import org.scalatest.funsuite.AnyFunSuite

class FixturesSpec extends AnyFunSuite {

  private def tmpRoot(): Path =
    Files.createTempDirectory("graft-fixtures-spec")

  test("ensure publishes atomically: a crashed writer leaves no target") {
    val root = tmpRoot()
    val target = root.resolve("data")
    intercept[RuntimeException] {
      Fixtures.ensure(target) { dir =>
        Files.createDirectories(dir)
        Files.writeString(dir.resolve("part1"), "x")
        throw new RuntimeException("simulated crash mid-write")
      }
    }
    // the half-written attempt never carries the final name, so the
    // next call regenerates instead of trusting a partial fixture
    assert(!Files.exists(target))
    val out = Fixtures.ensure(target) { dir =>
      Files.createDirectories(dir)
      Files.writeString(dir.resolve("part1"), "x")
      Files.writeString(dir.resolve("part2"), "y")
    }
    assert(Files.exists(out.resolve("part2")))
  }

  test("ensure is idempotent and never rewrites an existing target") {
    val root = tmpRoot()
    val target = root.resolve("file.bin")
    Fixtures.ensure(target)(p => Files.writeString(p, "first"))
    Fixtures.ensure(target)(p => Files.writeString(p, "second"))
    assert(Files.readString(target) == "first")
  }

  test("a stale tmp dir from a crashed prior attempt is scrubbed, not published") {
    val root = tmpRoot()
    val target = root.resolve("d")
    val stale = root.resolve(
      s"d.tmp-${ProcessHandle.current().pid()}")
    Files.createDirectories(stale)
    Files.writeString(stale.resolve("junk"), "stale")
    Fixtures.ensure(target) { dir =>
      Files.createDirectories(dir)
      Files.writeString(dir.resolve("good"), "fresh")
    }
    assert(Files.exists(target.resolve("good")))
    assert(!Files.exists(target.resolve("junk")))
  }
}
