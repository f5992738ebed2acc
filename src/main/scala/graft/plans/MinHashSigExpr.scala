package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

import graft.functions.PortableHash

/** Fused portable MinHash signature (Broder, "On the resemblance and
  * containment of documents"): shingle array → the K per-family minima
  * in ONE native pass per row.
  *
  * The composed form ([[graft.operators.Dedup.minhashSignaturesPortable]]
  * explode → md5 → K partial-min aggregates → array rebuild) already
  * hashes each shingle once, but pays an explode (row blow-up = shingle
  * count), a hash shuffle of K partial minima per doc, and a groupBy to
  * reassemble the signature. This expression is the same arithmetic —
  * md5 of the UTF-8 shingle bytes, first 8 hex chars as the base hash,
  * Carter–Wegman affine family `(a·h + b) & Mask40`
  * ([[PortableHash]]) — as a running-minima loop inside the projection:
  * no explode, no aggregate, no shuffle; the signature column is born
  * finished in the scan stage. Spec-asserted equal to the composed form,
  * so the DuckDB oracle mirror stays valid.
  *
  * Returns null for an empty (or null) shingle array — the same
  * "document disappears" semantics the composed form gets from explode
  * producing no rows. Callers should PRE-filter such rows with the cheap
  * [[graft.functions.TextFunctions.hasShingles]] predicate rather than
  * post-filter `sig IS NOT NULL`: Catalyst pushes that filter below the
  * Project by alias substitution, evaluating this expression twice.
  */
case class MinHashSigExpr(child: Expression, seed: Long, numHashes: Int)
  extends UnaryExpression {

  require(numHashes >= 1, s"numHashes must be >= 1, got $numHashes")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean  = true
  override def prettyName: String = "minhash_sig"

  // affine family constants, precomputed once per expression instance
  @transient private lazy val (as, bs) = {
    val ab = PortableHash.affineConstants(seed, numHashes)
    (ab.map(_._1).toArray, ab.map(_._2).toArray)
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires an array<string> column")
    }

  override def nullSafeEval(v: Any): Any =
    MinHashSigExpr.compute(v.asInstanceOf[ArrayData], as, bs)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val asRef = ctx.addReferenceObj("minhashAs", as, "long[]")
      val bsRef = ctx.addReferenceObj("minhashBs", bs, "long[]")
      s"""
        ${ev.value} = graft.plans.MinHashSigExpr.compute($a, $asRef, $bsRef);
        ${ev.isNull} = ${ev.value} == null;
      """
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object MinHashSigExpr {

  // one MessageDigest per thread, reset per shingle — codec-style reuse
  private val mdLocal: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** The fused per-row kernel (static so generated code can call it).
    * Null when no non-null shingle exists (mirrors explode's drop).
    */
  def compute(arr: ArrayData, as: Array[Long], bs: Array[Long]): ArrayData = {
    val n = arr.numElements()
    val k = as.length
    val md = mdLocal.get()
    var mins: Array[Long] = null
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        md.reset()
        val d = md.digest(arr.getUTF8String(i).getBytes)
        // first 8 hex chars of the digest == first 4 bytes, unsigned —
        // identical to conv(substring(md5(x),1,8),16,10)
        val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        if (mins == null) mins = Array.fill(k)(Long.MaxValue)
        var j = 0
        while (j < k) {
          val v = (h * as(j) + bs(j)) & PortableHash.Mask40
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    if (mins == null) null else new GenericArrayData(mins)
  }

  def apply(shingles: Column, seed: Long = 7L, numHashes: Int = 64): Column =
    GraftColumnBridge.column(
      MinHashSigExpr(GraftColumnBridge.expression(shingles), seed, numHashes))
}
