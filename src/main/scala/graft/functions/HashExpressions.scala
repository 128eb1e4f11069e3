package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The portable 60-bit md5 hash (see [[SqlDialect.hash64]]) computed
  * straight from digest bytes. Bit-identical to
  * `conv(substr(md5(x),1,15),16,10)` — the first 15 hex chars of an
  * md5 are the top 60 bits of its first 8 bytes — but skips the
  * 32-char hex-string materialization and the base-16 reparse, which
  * dominate the per-token cost on dedup/fingerprint hot paths.
  */
object PortableHash {

  private val tl = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private def md5(u: UTF8String): Array[Byte] = {
    val d = tl.get()
    d.reset()
    d.digest(u.getBytes)
  }

  private def be64(b: Array[Byte], off: Int): Long = {
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (b(off + i) & 0xffL); i += 1 }
    v
  }

  /** Hex chars [1,15] of md5(u): top 60 bits of bytes 0..7. */
  def hash64(u: UTF8String): Long = be64(md5(u), 0) >>> 4

  /** Both independent 60-bit lanes of one digest: hex chars [1,15]
    * and [16,30] — lane 1 is nibbles 15..29 = low 60 bits of bytes
    * 7..14.
    */
  def lanes(u: UTF8String): Array[Long] = {
    val b = md5(u)
    Array(be64(b, 0) >>> 4, be64(b, 7) & ((1L << 60) - 1))
  }
}

/** `portable_hash64(str)` — scalar 60-bit portable hash. */
case class PortableHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "portable_hash64"

  override def nullSafeEval(v: Any): Any =
    PortableHash.hash64(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PortableHash.hash64($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `portable_md5_lanes(str)` — array(lane0, lane1): two independent
  * 60-bit hashes from ONE digest, for call sites that amortize the md5
  * (minhash lanes).
  */
case class PortableMd5Lanes(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "portable_md5_lanes"

  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(PortableHash.lanes(v.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"new org.apache.spark.sql.catalyst.util.GenericArrayData(graft.functions.PortableHash.lanes($c))")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
