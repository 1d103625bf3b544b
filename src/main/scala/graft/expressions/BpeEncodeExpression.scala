package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Kernel behind [[BpeEncode]]: apply a FROZEN BPE merge list to one
  * word's symbol array — the Hugging-Face `tokenizers` BPE inference
  * loop (Sennrich 2016 §3.2's apply side): repeatedly find the
  * LOWEST-RANK merge whose pair is adjacent somewhere in the word, fuse
  * all its non-overlapping occurrences LEFT TO RIGHT in one pass, and
  * stop when no listed pair remains.
  *
  * Equivalence contract: on a WELL-FORMED merge list — each merge's
  * symbols are base characters or outputs of strictly earlier merges,
  * which is exactly what [[graft.operators.Bpe.trainMerges]] emits —
  * the min-rank loop equals applying the merges once each in rank
  * order (each with the same greedy left-to-right replace-all), because
  * fusing rank r can only create symbols that participate in merges of
  * rank > r. The DuckDB oracle replays the rank-sequential form with
  * the SAME list_reduce rewrite the training oracle uses; the
  * rank-order HOF spec ([[graft.operators.Bpe.bpeEncodeSeqSpec]]) pins
  * the two equal in BpeSpec.
  *
  * Cost: each loop iteration shrinks the symbol array, so a word of L
  * symbols costs O(L²) pair-rank hash probes — FLAT in merge-list size
  * (a 32k-merge production model costs the same per word as an 8-merge
  * toy), which is the property the rank-sequential scan lacks.
  */
object BpeEncodeKernel {

  /** Unambiguous pair key: length-prefixed lhs then rhs (no separator
    * collision — "a"+"bc" vs "ab"+"c" get distinct keys).
    */
  def pairKey(l: String, r: String): String = l.length + ":" + l + r

  def buildRanks(lhs: Array[String], rhs: Array[String])
      : java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](lhs.length * 2)
    var i = 0
    while (i < lhs.length) {
      // first (lowest) rank wins if a pair is listed twice
      m.putIfAbsent(pairKey(lhs(i), rhs(i)), Integer.valueOf(i))
      i += 1
    }
    m
  }

  def encode(syms: ArrayData, lhs: Array[String], rhs: Array[String],
             ranks: java.util.HashMap[String, Integer]): GenericArrayData = {
    val n = syms.numElements()
    var buf = new java.util.ArrayList[String](n)
    var i = 0
    while (i < n) {
      buf.add(if (syms.isNullAt(i)) "" else syms.getUTF8String(i).toString)
      i += 1
    }
    var done = buf.size() < 2
    while (!done) {
      var bestRank = Int.MaxValue
      var j = 0
      while (j < buf.size() - 1) {
        val r = ranks.get(pairKey(buf.get(j), buf.get(j + 1)))
        if (r != null && r.intValue() < bestRank) bestRank = r.intValue()
        j += 1
      }
      if (bestRank == Int.MaxValue) done = true
      else {
        val l = lhs(bestRank)
        val r = rhs(bestRank)
        val out = new java.util.ArrayList[String](buf.size())
        var k = 0
        while (k < buf.size()) {
          if (k < buf.size() - 1 && buf.get(k) == l && buf.get(k + 1) == r) {
            out.add(l + r); k += 2
          } else { out.add(buf.get(k)); k += 1 }
        }
        buf = out
        done = buf.size() < 2
      }
    }
    val res = new Array[Any](buf.size())
    var t = 0
    while (t < buf.size()) { res(t) = UTF8String.fromString(buf.get(t)); t += 1 }
    new GenericArrayData(res)
  }
}

/** Frozen-merge-list BPE encoding of a symbol array (ARRAY<STRING> →
  * ARRAY<STRING>) — the true BPE APPLY semantics (merge-RANK order, the
  * HF `tokenizers` inference loop), which segments differently from
  * greedy longest-match on the same vocabulary (e.g. merges [(b,c),
  * (a,b)] on "abc": rank order yields [a, bc]; MaxMatch over the unit
  * set yields [ab, c] — BpeSpec pins the disagreement). Feed it
  * `split(w, '')` so symbol identity matches the training rewrite's
  * splitting exactly.
  *
  * The merge table rides as reference objects (the
  * [[NearestCentroidCell]] discipline): a tokenizer model is a bounded
  * artifact (≤ a few hundred k rows — the PQ-codebook/centroid
  * precedent), the generated source depends only on the expression
  * shape, and per-word cost is flat in merge-list size. NULL input →
  * NULL; NULL elements are treated as empty-string symbols (tokens
  * never contain them in practice).
  */
case class BpeEncode(child: Expression, lhs: IndexedSeq[String],
                     rhs: IndexedSeq[String])
    extends UnaryExpression {

  require(lhs.length == rhs.length && lhs.nonEmpty, "bad merge list")

  // IndexedSeq params, not Array: case-class equality on Array is
  // identity, which would break Catalyst expression equality and
  // common-subexpression elimination between two BpeEncode nodes built
  // from the same collected merge list. The kernel gets plain arrays.
  @transient private lazy val lhsArr = lhs.toArray
  @transient private lazy val rhsArr = rhs.toArray
  @transient private lazy val ranks = BpeEncodeKernel.buildRanks(lhsArr, rhsArr)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"BpeEncode expects ARRAY<STRING>, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullIntolerant: Boolean = true

  override def nullSafeEval(value: Any): Any =
    BpeEncodeKernel.encode(value.asInstanceOf[ArrayData], lhsArr, rhsArr, ranks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lhsRef = ctx.addReferenceObj("bpeLhs", lhsArr, "java.lang.String[]")
    val rhsRef = ctx.addReferenceObj("bpeRhs", rhsArr, "java.lang.String[]")
    val ranksRef = ctx.addReferenceObj("bpeRanks", ranks, "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.BpeEncodeKernel.encode(" +
        s"$c, $lhsRef, $rhsRef, $ranksRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
