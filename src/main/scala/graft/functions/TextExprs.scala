package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-token step of the polynomial rolling hash (Rabin-Karp over
  * md5-derived 60-bit token hashes): acc ← (acc·B + md5₆₀(t)) mod P.
  *
  * md5₆₀(t) is the first 15 hex chars of md5(t) as an integer, mod P —
  * bit-identical to the column formulation
  * `conv(substring(md5(t), 1, 15), 16, 10) % P` (15 nibbles = the top
  * 60 bits of the first 8 digest bytes) and to DuckDB's
  * `('0x' || substring(md5(t), 1, 15))::UBIGINT % P`.
  */
object RollingHash {
  val B: Long = 31L
  val P: Long = 4294967291L // largest 32-bit prime; acc·B + h < 2^63

  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def step(acc: Long, token: UTF8String): Long = {
    val d = md.get()
    d.reset()
    val dig = d.digest(token.getBytes)
    var top = 0L
    var i = 0
    while (i < 8) { top = (top << 8) | (dig(i) & 0xffL); i += 1 }
    val h = (top >>> 4) % P // top 60 bits = first 15 hex chars
    (acc * B + h) % P
  }
}

/** Codegen'd order-sensitive rolling hash over a token array.
  *
  * The builtin route — `aggregate(transform(w, md5/conv/...), 0L,
  * fold)` — is a higher-order-function chain: CodegenFallback,
  * interpreted per element, with a materialized intermediate hash
  * array. This expression is a whole-stage-codegen'd tight loop over
  * the array calling one static step per token (the DotProduct
  * precedent: the loop and accumulator live in generated code, no
  * per-element expression-tree interpretation, no intermediate array).
  */
@ExpressionDescription(usage = "graft_polyhash(tokens) - md5-based polynomial rolling hash")
case class TokenPolyHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  /** A null ELEMENT yields a null hash — the same semantics as the
    * replaced `aggregate(transform(...))` formulation, where a null
    * propagated through the fold (round-3 ADVICE: the expression threw
    * instead, failing the whole job on one bad row). The result is
    * therefore nullable whenever the array may contain nulls, not only
    * when the array itself may be null. */
  override def nullable: Boolean = child.nullable || (child.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _ => true
  })

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_polyhash needs array<string>, got $other")
    }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      acc = RollingHash.step(acc, arr.getUTF8String(i))
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      // per-element check only when the element TYPE admits nulls:
      // with containsNull=false the guard is statically elided even
      // when the array itself is nullable (nullSafeCodeGen already
      // short-circuits the array-level null, and gating on the
      // expression-level `nullable` — which is also true in that case
      // — would emit a dead check per element). containsNull=true
      // implies `nullable`, so ev.isNull is assignable here.
      val elemMayBeNull = child.dataType match {
        case ArrayType(_, containsNull) => containsNull
        case _ => true
      }
      val nullCheck =
        if (elemMayBeNull) s"if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $n = $a.numElements();
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullCheck
         |  $acc = graft.functions.RollingHash.step($acc, $a.getUTF8String($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): TokenPolyHash = copy(child = c)
}

object TextExprs {
  /** Codegen'd rolling hash (see [[TokenPolyHash]]). */
  def polyHash(tokens: Column): Column =
    ColumnBridge.column(TokenPolyHash(ColumnBridge.expression(tokens)))
}
