package graft

import org.apache.spark.sql.functions._
import graft.functions.NfcNormalize

/** NfcNormalize contract: UAX #15 NFC composition, ASCII identity
  * (fast path returns the input buffer), null propagation, and
  * interpreted/codegen parity. All unicode spelled as \\u escapes so
  * the source encoding can't silently pre-compose the fixtures.
  */
class UnicodeSpec extends SparkSpecBase {

  import spark.implicits._

  private val eAcuteD = "e\u0301"   // decomposed: e + combining acute
  private val eAcuteC = "\u00e9"    // composed
  private val aRingD = "A\u030A"    // decomposed: A + combining ring
  private val aRingC = "\u00c5"     // composed

  test("composes decomposed sequences; ASCII is identity") {
    val df = Seq(
      ("a", "plain ascii"),
      ("b", eAcuteD),
      ("c", aRingD),
      ("d", s"caf${eAcuteD}s"),
      ("e", "")
    ).toDF("id", "s")
    val out = df.select(col("id"), NfcNormalize(col("s")).as("n"),
        length(col("s")).as("lr"), length(NfcNormalize(col("s"))).as("ln"))
      .collect().map(r => r.getString(0) -> ((r.getString(1), r.getInt(2), r.getInt(3)))).toMap
    assert(out("a") == (("plain ascii", 11, 11)))
    assert(out("b") == ((eAcuteC, 2, 1)))
    assert(out("c") == ((aRingC, 2, 1)))
    assert(out("d") == ((s"caf${eAcuteC}s", 6, 5)))
    assert(out("e") == (("", 0, 0)))
  }

  test("null propagates; already-composed input unchanged") {
    val df = Seq(Some(eAcuteC), None).toDF("s")
    val out = df.select(NfcNormalize(col("s"))).collect()
    assert(out(0).getString(0) == eAcuteC)
    assert(out(1).isNullAt(0))
  }

  test("registered as a SQL function (expr strings can call it)") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    Seq(eAcuteD).toDF("s").createOrReplaceTempView("nfc_probe")
    assert(spark.sql("SELECT nfc_normalize(s) AS n FROM nfc_probe")
      .head().getString(0) == eAcuteC)
  }

  test("interpreted eval matches codegen result") {
    import org.apache.spark.unsafe.types.UTF8String
    val decomposed = UTF8String.fromString(s"ne${eAcuteD} ${aRingD}ngstrom")
    val viaKernel = NfcNormalize.normalize(decomposed).toString
    val viaPlan = Seq(decomposed.toString).toDF("s")
      .select(NfcNormalize(col("s"))).head().getString(0)
    assert(viaKernel == viaPlan)
    assert(viaKernel == s"ne${eAcuteC} ${aRingC}ngstrom")
  }
}
