package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `minhash_sig(hashes)` — the k-permutation MinHash signature of an
  * array of feature hashes: element i is `min over x of (a_i*x + b_i) mod P`.
  * The seed pairs are constructor state (not children): they are fixed at
  * plan time and baked into the generated code as reference arrays.
  *
  * Replaces a k x n interpreted lambda scan (zip_with + array_min +
  * transform) with one generated k x n Java loop. Semantics mirror the
  * HOF formulation exactly, including the quirks: null elements are
  * SKIPPED (array_min ignores nulls), and an element with no valid
  * inputs is null.
  */
case class MinHashSig(child: Expression, seeds: Seq[(Long, Long)])
    extends UnaryExpression {

  require(seeds.nonEmpty, "minhash_sig needs at least one seed pair")

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects array<bigint>, got ${other.simpleString}")
  }

  private val aSeeds: Array[Long] = seeds.map(_._1).toArray
  private val bSeeds: Array[Long] = seeds.map(_._2).toArray

  override def nullSafeEval(av: Any): Any = {
    val arr = av.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Any](aSeeds.length)
    var k = 0
    while (k < aSeeds.length) {
      var mn = Long.MaxValue
      var seen = false
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) {
          seen = true
          val v = (aSeeds(k) * arr.getLong(i) + bSeeds(k)) % graft.ext.TextOps.P
          if (v < mn) mn = v
        }
        i += 1
      }
      out(k) = if (seen) mn else null
      k += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val aRef = ctx.addReferenceObj("aSeeds", aSeeds, "long[]")
      val bRef = ctx.addReferenceObj("bSeeds", bSeeds, "long[]")
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val n = ctx.freshName("n")
      val mn = ctx.freshName("mn")
      val seen = ctx.freshName("seen")
      val v = ctx.freshName("v")
      val out = ctx.freshName("out")
      s"""
         |final int $n = $a.numElements();
         |final Object[] $out = new Object[${aSeeds.length}];
         |for (int $k = 0; $k < ${aSeeds.length}; $k++) {
         |  long $mn = Long.MAX_VALUE;
         |  boolean $seen = false;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if (!$a.isNullAt($i)) {
         |      $seen = true;
         |      final long $v = ($aRef[$k] * $a.getLong($i) + $bRef[$k])
         |        % ${graft.ext.TextOps.P}L;
         |      if ($v < $mn) $mn = $v;
         |    }
         |  }
         |  $out[$k] = $seen ? (Object) Long.valueOf($mn) : null;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}
