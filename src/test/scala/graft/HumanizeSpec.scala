package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Humanize

class HumanizeSpec extends AnyFunSuite {
  test("bytes round-trip") {
    assert(Humanize.bytes(512) == "512 B")
    assert(Humanize.bytes(1536) == "1.5 KB")
    assert(Humanize.bytes(3L * 1024 * 1024 * 1024) == "3.0 GB")
    assert(Humanize.parseBytes("1.5 KB") == 1536)
    assert(Humanize.parseBytes("16mb") == 16 * 1024 * 1024)
    assert(Humanize.parseBytes("42") == 42)
  }
  test("counts") {
    assert(Humanize.count(999) == "999")
    assert(Humanize.count(1234567) == "1.2M")
  }
}
