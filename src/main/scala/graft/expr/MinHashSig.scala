package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: the full numPerm-wide MinHash signature
  * of an `array<long>` shingle-hash column in ONE pass (SURVEY.md §7.3
  * tier-b custom operator, added on sf1 bench evidence: the
  * declarative form — numPerm separate
  * `array_min(transform(hx, x -> pmod(pmod(x,P)*a+b, P)))` columns —
  * runs each permutation as its own interpreted higher-order pass and
  * allocates an intermediate array per permutation per row, which
  * dominated dedup_minhash_lsh at sf1: 18.3 s, vs 1.1 s for
  * dedup_simhash doing identical shingling + hashing without the 16
  * permutation passes).
  *
  * Arithmetic is BIT-IDENTICAL to the declarative form (and so to the
  * DuckDB oracle, which replays the same permutations): per element
  * hm = pmod(x, P), then per permutation v = pmod(hm * a_i + b_i, P),
  * with the multiply wrapping in 64-bit exactly like the pmod
  * expression tree would; per-permutation minima skip null elements
  * like array_min, and an empty/all-null input yields null signature
  * slots. Coefficients come from [[graft.ops.MinHashLSH.coef]] — one
  * source of truth with the oracle SQL generator.
  */
case class MinHashSig(child: Expression, numPerm: Int)
    extends UnaryExpression {

  private val P = 2147483647L // ops.MinHashLSH.P (Mersenne 2^31-1)
  private val as: Array[Long] =
    (0 until numPerm).map(i => graft.ops.MinHashLSH.coef(i)._1).toArray
  private val bs: Array[Long] =
    (0 until numPerm).map(i => graft.ops.MinHashLSH.coef(i)._2).toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if numPerm > 0 => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash_sig expects array<bigint> and numPerm > 0, got $other / $numPerm")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "graft_minhash_sig"
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(numPerm)(Long.MaxValue)
    var any = false
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        any = true
        val x = arr.getLong(i)
        val hm = ((x % P) + P) % P
        var j = 0
        while (j < numPerm) {
          val v0 = hm * as(j) + bs(j) // 64-bit wrap = the pmod tree's
          val v = ((v0 % P) + P) % P
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    if (!any) new GenericArrayData(Array.fill[Any](numPerm)(null))
    else new GenericArrayData(mins.map(Long.box(_): Any))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val aRef = ctx.addReferenceObj("mhA", as, "long[]")
      val bRef = ctx.addReferenceObj("mhB", bs, "long[]")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val mins = ctx.freshName("mins")
      val any = ctx.freshName("any")
      val hm = ctx.freshName("hm")
      val v = ctx.freshName("v")
      val out = ctx.freshName("out")
      s"""
         |int $n = $a.numElements();
         |long[] $mins = new long[$numPerm];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |boolean $any = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) continue;
         |  $any = true;
         |  long $hm = (($a.getLong($i) % ${P}L) + ${P}L) % ${P}L;
         |  for (int $j = 0; $j < $numPerm; $j++) {
         |    long $v = (($hm * $aRef[$j] + $bRef[$j]) % ${P}L + ${P}L) % ${P}L;
         |    if ($v < $mins[$j]) $mins[$j] = $v;
         |  }
         |}
         |Object[] $out = new Object[$numPerm];
         |for (int $j = 0; $j < $numPerm; $j++) {
         |  $out[$j] = $any ? (Object) Long.valueOf($mins[$j]) : null;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
