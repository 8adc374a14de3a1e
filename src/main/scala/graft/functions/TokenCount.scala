package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `token_runs(text, mode)` — single-pass byte-scan token counting,
  * replacing `size(regexp_extract_all(...))` formulations that build an
  * array of match strings only to count them (at 100 TB that is one
  * transient UTF8String per token of the corpus). Three modes, each
  * value-identical to its regex reference (Java `Pattern` default
  * semantics — ASCII `\s`, per-code-point character classes):
  *
  *  - `ws`    ≡ `size(regexp_extract_all(text, "\\S+"))` — maximal
  *    non-whitespace runs. Whitespace is ASCII `\s` = TAB..CR + space;
  *    multi-byte UTF-8 chars are non-whitespace, so byte-level run
  *    detection equals code-point-level.
  *  - `punct` ≡ `size(regexp_extract_all(text, "[^A-Za-z0-9\\s]", 0))`
  *    — count of code points outside alnum+whitespace. Counted at
  *    leading bytes (continuation bytes `10xxxxxx` skip), so a 4-byte
  *    emoji counts once, exactly as Java regex matches one code point.
  *  - `bpe`   ≡ `size(regexp_extract_all(text,
  *    "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]", 0))` — letter runs + digit
  *    runs + single punctuation code points (the BPE-ish pre-token
  *    segmentation in [[graft.ext.TextOps.bpeTokenCount]]).
  *
  * The generated code is a branchy byte loop over the UTF8String —
  * no allocation, stays inside whole-stage codegen. Null text => NULL,
  * matching the regex forms.
  */
case class TokenCount(child: Expression, mode: String) extends UnaryExpression {

  require(TokenCount.Modes.contains(mode),
    s"token_runs mode must be one of ${TokenCount.Modes.mkString("/")}, got '$mode'")

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"token_runs expects string, got ${other.simpleString}")
  }

  override def nullSafeEval(tv: Any): Any = {
    val s = tv.asInstanceOf[UTF8String]
    val n = s.numBytes()
    var count = 0
    // prev byte class: 0 = start/whitespace, 1 = letter, 2 = digit, 3 = other
    var prev = 0
    var i = 0
    while (i < n) {
      val ub = s.getByte(i) & 0xff
      if ((ub & 0xc0) == 0x80) { // continuation byte: inside a non-ASCII code point
        if (mode == "ws") () else prev = 3
      } else {
        val isWs = ub == 0x20 || (ub >= 0x09 && ub <= 0x0d)
        val isLetter = (ub | 0x20) >= 'a' && (ub | 0x20) <= 'z'
        val isDigit = ub >= '0' && ub <= '9'
        mode match {
          case "ws" =>
            if (!isWs && prev == 0) count += 1
            prev = if (isWs) 0 else 3
          case "punct" =>
            if (!isWs && !isLetter && !isDigit) count += 1
          case "bpe" =>
            if (isLetter) { if (prev != 1) count += 1; prev = 1 }
            else if (isDigit) { if (prev != 2) count += 1; prev = 2 }
            else { if (!isWs) count += 1; prev = if (isWs) 0 else 3 }
        }
      }
      i += 1
    }
    count
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val ub = ctx.freshName("ub")
      val cnt = ctx.freshName("cnt")
      val prev = ctx.freshName("prev")
      val isWs = ctx.freshName("isWs")
      val isLetter = ctx.freshName("isLetter")
      val isDigit = ctx.freshName("isDigit")
      val body = mode match {
        case "ws" =>
          s"""if (($ub & 0xc0) != 0x80) {
             |  final boolean $isWs = $ub == 0x20 || ($ub >= 0x09 && $ub <= 0x0d);
             |  if (!$isWs && $prev == 0) $cnt++;
             |  $prev = $isWs ? 0 : 3;
             |}""".stripMargin
        case "punct" =>
          s"""if (($ub & 0xc0) != 0x80) {
             |  final boolean $isWs = $ub == 0x20 || ($ub >= 0x09 && $ub <= 0x0d);
             |  final boolean $isLetter = ($ub | 0x20) >= 'a' && ($ub | 0x20) <= 'z';
             |  final boolean $isDigit = $ub >= '0' && $ub <= '9';
             |  if (!$isWs && !$isLetter && !$isDigit) $cnt++;
             |}""".stripMargin
        case "bpe" =>
          s"""if (($ub & 0xc0) == 0x80) {
             |  $prev = 3;
             |} else {
             |  final boolean $isWs = $ub == 0x20 || ($ub >= 0x09 && $ub <= 0x0d);
             |  final boolean $isLetter = ($ub | 0x20) >= 'a' && ($ub | 0x20) <= 'z';
             |  final boolean $isDigit = $ub >= '0' && $ub <= '9';
             |  if ($isLetter) { if ($prev != 1) $cnt++; $prev = 1; }
             |  else if ($isDigit) { if ($prev != 2) $cnt++; $prev = 2; }
             |  else { if (!$isWs) $cnt++; $prev = $isWs ? 0 : 3; }
             |}""".stripMargin
      }
      s"""
         |final int $n = $t.numBytes();
         |int $cnt = 0;
         |int $prev = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final int $ub = $t.getByte($i) & 0xff;
         |  $body
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): TokenCount =
    copy(child = newChild)
}

object TokenCount {
  val Modes: Set[String] = Set("ws", "punct", "bpe")
}
