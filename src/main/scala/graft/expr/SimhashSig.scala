package graft.expr

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native 60-bit SimHash of a whitespace-tokenized text column (SURVEY
  * §2.H dedup surface, §4.3 custom-expression rule): one tight per-row
  * loop — split, md5 per token, majority-vote the 60 hash bits — with
  * whole-stage codegen via a single static call.
  *
  * Semantics are EXACTLY the declarative formulation the DuckDB oracle
  * runs (and LlmExtSpec pins): token hash = first 15 hex chars of
  * md5(token) as a 60-bit integer (`conv(substring(md5(t),1,15),16,10)`),
  * tokens = `split(text, ' ')` with Spark's keep-trailing-empties
  * behavior, signature bit b set iff more than half the token hashes
  * have bit b set (the classic ±1 accumulator).
  *
  * Why native: the same computation as SQL needs either an explode + a
  * 20-buffer SWAR hash aggregate (a shuffle plus a ~1.5 s one-shot
  * codegen compile of the wide agg) or a higher-order `aggregate` fold
  * (no shuffle, but interpreted lambdas allocating a 21-slot array per
  * token measured 3-5x SLOWER than the wide agg at sf0.1). The native
  * loop does one md5 and 60 shift-adds per token on primitive arrays —
  * no shuffle, no codegen cliff, no per-token allocation. */
case class SimhashSig(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"simhash60 expects STRING, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash60"

  override protected def nullSafeEval(input: Any): Any =
    SimhashSig.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.SimhashSig.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimhashSig =
    copy(child = newChild)
}

object SimhashSig {
  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Java-callable kernel (codegen emits a single static call). */
  def compute(text: UTF8String): Long = {
    val md = md5.get()
    // split(text, ' ') twin: Spark's StringSplit uses limit -1 (trailing
    // empty tokens kept), so "a " hashes ["a", ""] in both paths
    val toks = text.toString.split(" ", -1)
    val ones = new Array[Int](60)
    var j = 0
    while (j < toks.length) {
      md.reset()
      val d = md.digest(toks(j).getBytes(StandardCharsets.UTF_8))
      // first 15 hex chars of the digest = top 60 bits of bytes 0..7,
      // identically conv(substring(md5(t), 1, 15), 16, 10)
      var h = 0L
      var i = 0
      while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
      h = h >>> 4
      var b = 0
      while (b < 60) { ones(b) += ((h >>> b) & 1L).toInt; b += 1 }
      j += 1
    }
    val n = toks.length
    var sig = 0L
    var b = 0
    while (b < 60) { if (2L * ones(b) > n) sig |= 1L << b; b += 1 }
    sig
  }
}
