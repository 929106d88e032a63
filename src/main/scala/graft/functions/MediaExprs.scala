package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, TernaryExpression}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Codegen'd per-window audio energy: Σ ((b & 0xff) − 128)² over the
  * byte slice `[start, start+len)` of a binary column (0-based start).
  *
  * The column formulation — explode a per-window byte index, decode
  * each byte via `conv(hex(substring(...)))`, then re-aggregate — is
  * correct but multiplies the window rows ×len (64 rows per 64-byte
  * window) through an extra (media_id, w_i) aggregation exchange. This
  * expression is the TokenPolyHash move: the loop and accumulator live
  * in whole-stage-generated code, one output row per window, no
  * intermediate rows, no extra aggregation (round-5 verdict #2).
  *
  * Bounds are clamped to the payload (`substring` semantics: bytes past
  * the end contribute nothing), so a truncated container yields the
  * energy of the bytes present — the explode twin's sum over the same
  * surviving bytes. Bit-identity with the explode formulation is
  * spec-asserted (MultimodalSpec).
  */
@ExpressionDescription(usage = "graft_win_energy(bin, start, len) - sum of squared (byte-128) over a slice")
case class ByteWindowEnergy(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = first.nullable || second.nullable || third.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (BinaryType, LongType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"graft_win_energy needs (binary, bigint, int), got $a / $b / $c")
    }

  override def nullSafeEval(bin: Any, start: Any, len: Any): Any = {
    val bytes = bin.asInstanceOf[Array[Byte]]
    val s = start.asInstanceOf[Long]
    val end = math.min(s + len.asInstanceOf[Int], bytes.length.toLong).toInt
    var i = math.max(0L, s).toInt
    var acc = 0L
    while (i < end) {
      val d = (bytes(i) & 0xff) - 128L
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, s, l) => {
      val i = ctx.freshName("i")
      val end = ctx.freshName("end")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |int $end = (int) java.lang.Math.min($s + (long) $l, (long) $b.length);
         |long $acc = 0L;
         |for (int $i = (int) java.lang.Math.max(0L, $s); $i < $end; $i++) {
         |  long $d = ($b[$i] & 0xff) - 128L;
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): ByteWindowEnergy =
    copy(first = f, second = s, third = t)
}

object MediaExprs {
  /** Window energy over a binary slice (see [[ByteWindowEnergy]]). */
  def winEnergy(bin: Column, start: Column, len: Column): Column =
    ColumnBridge.column(ByteWindowEnergy(
      ColumnBridge.expression(bin),
      ColumnBridge.expression(start.cast("long")),
      ColumnBridge.expression(len.cast("int"))))
}
