package graft

import graft.logs.{LogSelector, SinceDuration, LogPathLayout}
import org.scalatest.funsuite.AnyFunSuite

class LogSelectorSpec extends AnyFunSuite {

  test("selector grammar (y-logcli:83-102 semantics)") {
    assert(LogSelector.parse("""{namespace="qa",pod="x"}""").labels ==
      Map("namespace" -> "qa", "pod" -> "x"))
    assert(LogSelector.parse("""{ namespace = "qa" , container = "app" }""").labels ==
      Map("namespace" -> "qa", "container" -> "app"))
    assert(LogSelector.parse("{}").isEmpty)
    assert(LogSelector.parse("""{pod="a,b"}""").labels == Map("pod" -> "a,b"))
  }

  test("selector rejects unknown keys, duplicates, malformed pairs") {
    intercept[IllegalArgumentException](LogSelector.parse("""{foo="x"}"""))
    intercept[IllegalArgumentException](LogSelector.parse("""{pod="a",pod="b"}"""))
    intercept[IllegalArgumentException](LogSelector.parse("""{pod=x}"""))
  }

  test("since duration grammar (y-logcli:126-136)") {
    assert(SinceDuration.parseSeconds("5s") == 5)
    assert(SinceDuration.parseSeconds("5m") == 300)
    assert(SinceDuration.parseSeconds("2h") == 7200)
    intercept[IllegalArgumentException](SinceDuration.parseSeconds("5d"))
    intercept[IllegalArgumentException](SinceDuration.parseSeconds("m"))
  }

  test("glob construction ports build_s3_path (y-logcli:106-123)") {
    assert(LogPathLayout.buildGlob("/r", Map.empty, "parquet") ==
      "/r/*/*/*/*/*/*/*/*/*/*/*.parquet")
    assert(LogPathLayout.buildGlob("/r", Map("namespace" -> "qa"), "parquet") ==
      "/r/*/qa/*/*/*/*/*/*/*/*/*.parquet")
    // pod/container selectors force the deep fixed-arity glob
    assert(LogPathLayout.buildGlob("/r", Map("namespace" -> "qa", "pod" -> "p", "container" -> "c"), "parquet") ==
      "/r/*/qa/*/*/*/*/p/c/*/*/*.parquet")
    assert(LogPathLayout.buildGlob("/r", Map("cluster" -> "dev", "node" -> "n1"), "parquet") ==
      "/r/dev/*/*/*/*/n1/*/*/*/*/*.parquet")
  }

  test("segment indices are computed from the layout, not hard-coded") {
    // layout: cluster/namespace/Y/M/D/node/pod/container/HH/MM/file
    assert(LogPathLayout.indexFromEnd("file") == 1)
    assert(LogPathLayout.indexFromEnd("minute") == 2)
    assert(LogPathLayout.indexFromEnd("container") == 4)
    assert(LogPathLayout.indexFromEnd("pod") == 5)
    assert(LogPathLayout.indexFromEnd("node") == 6)
    assert(LogPathLayout.indexFromEnd("namespace") == 10)
    assert(LogPathLayout.indexFromEnd("cluster") == 11)
  }
}
