package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst expressions for the text-hash kernels in [[TextHash]].
  *
  * Each generates a single static call into the compiled kernel from
  * inside whole-stage codegen — replacing interpreted HOF lambda chains
  * (`aggregate(sequence(...))` runs one interpreted substring per
  * CHARACTER) on every corpus hot path. Numeric results are identical to
  * the HOF formulations in [[TextFunctions]], which the DuckDB oracles
  * replay (PropertySpec asserts expression == HOF on random input).
  */

private[functions] trait ArrayInExpr extends UnaryExpression {
  protected def expects: DataType
  protected def fname: String

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(et, _) if et == expects =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$fname expects array<$expects>, got $other")
  }
}

/** graft_charhash(s): polynomial code-point hash, seed 7, mod 1e9+7. */
case class CharPolyHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_charhash expects string, got $other")
  }

  override protected def nullSafeEval(s: Any): Any =
    TextHash.charHash(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.TextHash.charHash($s)")

  override protected def withNewChildInternal(c: Expression): CharPolyHash =
    copy(child = c)
}

/** graft_token_hashes(arr): charhash per element, null-preserving. */
case class TokenPolyHashes(child: Expression) extends ArrayInExpr {
  override protected def expects: DataType = StringType
  override protected def fname: String = "graft_token_hashes"
  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override protected def nullSafeEval(a: Any): Any =
    TextHash.tokenHashes(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.TextHash.tokenHashes($a)")

  override protected def withNewChildInternal(c: Expression): TokenPolyHashes =
    copy(child = c)
}

/** graft_bigram_hashes(arr): hashes of the n−1 word bigrams "a b". */
case class BigramPolyHashes(child: Expression) extends ArrayInExpr {
  override protected def expects: DataType = StringType
  override protected def fname: String = "graft_bigram_hashes"
  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override protected def nullSafeEval(a: Any): Any =
    TextHash.bigramHashes(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.TextHash.bigramHashes($a)")

  override protected def withNewChildInternal(c: Expression): BigramPolyHashes =
    copy(child = c)
}

/** graft_minhash(hs, n): n MinHash signatures of a bigint array. */
case class MinHashSigs(child: Expression, nHashes: Int) extends ArrayInExpr {
  override protected def expects: DataType = LongType
  override protected def fname: String = "graft_minhash"
  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override protected def nullSafeEval(a: Any): Any =
    TextHash.minHash(a.asInstanceOf[ArrayData], nHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"graft.functions.TextHash.minHash($a, $nHashes)")

  override protected def withNewChildInternal(c: Expression): MinHashSigs =
    copy(child = c)
}

/** graft_band_keys(mh, bands, rows): per-band fold keys of a signature. */
case class BandKeysFold(child: Expression, bands: Int, rows: Int)
  extends ArrayInExpr {
  override protected def expects: DataType = LongType
  override protected def fname: String = "graft_band_keys"
  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override protected def nullSafeEval(a: Any): Any =
    TextHash.bandKeys(a.asInstanceOf[ArrayData], bands, rows)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"graft.functions.TextHash.bandKeys($a, $bands, $rows)")

  override protected def withNewChildInternal(c: Expression): BandKeysFold =
    copy(child = c)
}

/** graft_simhash(hs, bits, spread): bitwise-majority SimHash. */
case class SimHashBits(child: Expression, bits: Int, spread: Long)
  extends ArrayInExpr {
  override protected def expects: DataType = LongType
  override protected def fname: String = "graft_simhash"
  override def dataType: DataType = LongType

  override protected def nullSafeEval(a: Any): Any =
    TextHash.simHash(a.asInstanceOf[ArrayData], bits, spread)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"graft.functions.TextHash.simHash($a, $bits, ${spread}L)")

  override protected def withNewChildInternal(c: Expression): SimHashBits =
    copy(child = c)
}

/** graft_ngram_hashes(hs, n): windowed rolling-fold hashes of every
  * contiguous n-gram of a bigint array. */
case class NGramFold(child: Expression, n: Int) extends ArrayInExpr {
  override protected def expects: DataType = LongType
  override protected def fname: String = "graft_ngram_hashes"
  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override protected def nullSafeEval(a: Any): Any =
    TextHash.ngramHashes(a.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"graft.functions.TextHash.ngramHashes($a, $n)")

  override protected def withNewChildInternal(c: Expression): NGramFold =
    copy(child = c)
}

/** Shared shape for kernels that return a boxed value (null = SQL NULL
  * even when the input array itself is non-null, e.g. a null element). */
private[functions] trait BoxedKernelExpr extends ArrayInExpr {
  protected def boxedJavaType: String
  protected def unboxMethod: String
  protected def kernelCall(arg: String): String
  protected def kernelEval(a: ArrayData): AnyRef

  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else kernelEval(v.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val box = ctx.freshName("box")
    val resultCode =
      code"""
        |${childGen.code}
        |boolean ${ev.isNull} = true;
        |${CodeGenerator.javaType(dataType)} ${ev.value} =
        |  ${CodeGenerator.defaultValue(dataType)};
        |if (!${childGen.isNull}) {
        |  $boxedJavaType $box = ${kernelCall(childGen.value.toString)};
        |  if ($box != null) {
        |    ${ev.isNull} = false;
        |    ${ev.value} = $box.$unboxMethod();
        |  }
        |}
       """.stripMargin
    ev.copy(code = resultCode)
  }
}

/** graft_sum_lengths(arr): Σ code-point lengths; null element → null. */
case class SumCharLengths(child: Expression) extends BoxedKernelExpr {
  override protected def expects: DataType = StringType
  override protected def fname: String = "graft_sum_lengths"
  override def dataType: DataType = IntegerType
  override protected def boxedJavaType: String = "java.lang.Integer"
  override protected def unboxMethod: String = "intValue"
  override protected def kernelCall(a: String): String =
    s"graft.functions.TextHash.sumCharLengths($a)"
  override protected def kernelEval(a: ArrayData): AnyRef =
    TextHash.sumCharLengths(a)

  override protected def withNewChildInternal(c: Expression): SumCharLengths =
    copy(child = c)
}

/** graft_chunk_fp(arr): rolling fingerprint fold of charhash per token,
  * seed 0, mod 1e15 — the q83 chunk fingerprint. Null element → null. */
case class ChunkFingerprint(child: Expression) extends BoxedKernelExpr {
  override protected def expects: DataType = StringType
  override protected def fname: String = "graft_chunk_fp"
  override def dataType: DataType = LongType
  override protected def boxedJavaType: String = "java.lang.Long"
  override protected def unboxMethod: String = "longValue"
  override protected def kernelCall(a: String): String =
    s"graft.functions.TextHash.chunkFingerprint($a)"
  override protected def kernelEval(a: ArrayData): AnyRef =
    TextHash.chunkFingerprint(a)

  override protected def withNewChildInternal(c: Expression): ChunkFingerprint =
    copy(child = c)
}

/** graft_jaro_winkler(a, b): Jaro–Winkler similarity (see
  * [[TextHash.jaroWinkler]] for the pinned conventions — DuckDB
  * `jaro_winkler_similarity` semantics, gate-verified). Spark has no
  * built-in; a Scala UDF would break whole-stage codegen on the
  * blocked-pair hot path, so this generates one static kernel call. */
case class JaroWinklerSim(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_jaro_winkler expects (string, string), got ($l, $r)")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    TextHash.jaroWinkler(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.TextHash.jaroWinkler($a, $b)")

  override protected def withNewChildrenInternal(
    l: Expression, r: Expression): JaroWinklerSim = copy(left = l, right = r)
}

/** graft_common_bytes(a, b): multiset common-byte count — the
  * counting-filter primitive (TextHash.commonBytes): edit distance ≥
  * max(chars) − common, so a blocked edit-distance join can discard
  * most pairs in O(|a|+|b|) before any DP runs. */
case class CommonByteCount(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_common_bytes expects (string, string), got ($l, $r)")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    TextHash.commonBytes(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.TextHash.commonBytes($a, $b)")

  override protected def withNewChildrenInternal(
    l: Expression, r: Expression): CommonByteCount = copy(left = l, right = r)
}

/** graft_jaro_winkler_gte(a, b, cutoff): [[JaroWinklerSim]] with a
  * literal score floor baked into the generated kernel call — sub-floor
  * pairs short-circuit through the O(|a|+|b|) common-byte bound
  * (TextHash.jaroWinklerGte) instead of running the quadratic match
  * loop. Callers must filter `>= cutoff` downstream: every value below
  * the floor surfaces as 0.0. */
case class JaroWinklerGte(left: Expression, right: Expression,
  cutoff: Double)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_jaro_winkler_gte expects (string, string), got ($l, $r)")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    TextHash.jaroWinklerGte(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String], cutoff)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.TextHash.jaroWinklerGte($a, $b, ${cutoff}D)")

  override protected def withNewChildrenInternal(
    l: Expression, r: Expression): JaroWinklerGte = copy(left = l, right = r)
}
