package graft

import graft.core.CanonHash

/** Pins the canonical-hash rendering contract behind Verify's
  * per-query `_canon_sha256` artifact: run-stable for every value
  * shape a result frame can carry. The binary case is the round-8
  * ADVICE item — `Array[Byte].toString` is JVM identity and would
  * have reported false run-to-run drift for any binary-emitting
  * query.
  */
class CanonHashSpec extends SparkSpecBase {

  import spark.implicits._

  test("binary columns hex-encode — two structurally equal frames hash equal") {
    def frame() = Seq((1, Array[Byte](0, 16, -1)), (2, Array[Byte](127)))
      .toDF("id", "payload")
    // fresh Array[Byte] instances each call: identity-rendering would
    // produce different strings per run
    assert(CanonHash.of(frame()) == CanonHash.of(frame()))
    assert(CanonHash.render(Array[Byte](0, 16, -1)) == "bin0010ff")
  }

  test("hash is row-order and column-order invariant") {
    val a = Seq((1, "x"), (2, "y")).toDF("k", "v")
    val b = Seq((2, "y"), (1, "x")).toDF("k", "v").select("v", "k")
    assert(CanonHash.of(a) == CanonHash.of(b))
  }

  test("value changes move the hash; nulls are distinct from strings") {
    val a = Seq((1, "x")).toDF("k", "v")
    val c = Seq((1, "z")).toDF("k", "v")
    assert(CanonHash.of(a) != CanonHash.of(c))
    assert(CanonHash.render(null) != CanonHash.render("null"))
  }

  test("arrays, maps, and nested rows render structurally") {
    val withArr = Seq((1, Seq(1L, 2L))).toDF("k", "xs")
    assert(CanonHash.of(withArr) == CanonHash.of(withArr))
    // map entry order is not canonical in Spark — rendering sorts
    assert(CanonHash.render(Map(1 -> "a", 2 -> "b")) ==
      CanonHash.render(Map(2 -> "b", 1 -> "a")))
  }
}
