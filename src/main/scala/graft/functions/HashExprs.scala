// Lives in the org.apache.spark.sql namespace for the same reason as
// ArrayMath: AbstractDataType and the Column<->Expression bridge are
// private[sql].
package org.apache.spark.sql.graft

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the MinHash signature hot path: the two
  * unsigned 32-bit halves of md5(input) as `array<bigint>` [a, b].
  *
  * Value-identical to the portable built-in construction
  * `conv(substring(md5(x), 1, 8), 16, 10)` / `conv(substring(md5(x), 9, 8),
  * 16, 10)` — a is digest bytes 0..3 big-endian, b is bytes 4..7 — so the
  * DuckDB oracle keeps reproducing signatures from hex slices while the
  * Spark side skips the 32-char hex STRING the built-in chain formats and
  * immediately re-parses per row. One digest, two longs, no string
  * allocation, inside whole-stage codegen (the MessageDigest instance is
  * per-operator mutable state, not per-row).
  */
case class Md5Halves(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "md5_halves"

  @transient private lazy val digest = MessageDigest.getInstance("MD5")

  override def nullSafeEval(input: Any): Any = {
    val d = digest.digest(input.asInstanceOf[UTF8String].getBytes)
    new GenericArrayData(Array(Md5Halves.half(d, 0), Md5Halves.half(d, 4)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      val md = ctx.addMutableState("java.security.MessageDigest", "md5digest",
        v => s"""try { $v = java.security.MessageDigest.getInstance("MD5"); }
                 catch (java.security.NoSuchAlgorithmException e) { throw new RuntimeException(e); }""")
      val d = ctx.freshName("d")
      s"""
        byte[] $d = $md.digest($in.getBytes());
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(new long[]{
          ((($d[0] & 0xffL) << 24) | (($d[1] & 0xffL) << 16) | (($d[2] & 0xffL) << 8) | ($d[3] & 0xffL)),
          ((($d[4] & 0xffL) << 24) | (($d[5] & 0xffL) << 16) | (($d[6] & 0xffL) << 8) | ($d[7] & 0xffL))});
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Md5Halves =
    copy(child = newChild)
}

object Md5Halves {
  private[graft] def half(d: Array[Byte], off: Int): Long =
    ((d(off) & 0xffL) << 24) | ((d(off + 1) & 0xffL) << 16) |
      ((d(off + 2) & 0xffL) << 8) | (d(off + 3) & 0xffL)
}

object HashExprs {
  /** Column-level entry for [[Md5Halves]]. */
  def md5Halves(s: Column): Column =
    ExpressionUtils.column(Md5Halves(ExpressionUtils.expression(s)))
}
