package graft.expressions

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}

/** Bottom-k distinct longs — the KMV (k-minimum-values) sketch state.
  *
  * A custom imperative aggregate, NOT `slice(sort_array(collect_set(x)))`:
  * collect_set's per-group state grows with the DISTINCT COUNT (exactly
  * what a 100 TB distinct-count job cannot hold), while this buffer is
  * bounded at k longs per group no matter how many values stream through.
  * Partial buffers merge associatively (union then trim), so map-side
  * combine works and the shuffle moves ≤ k longs per (group, partition).
  *
  * Output: the ≤k smallest DISTINCT child values, ascending. With a
  * uniform hash as input, (k-1)·M / kth-value estimates the distinct
  * count (the KMV estimator); the estimator stays in the SQL layer
  * (operators/Sketch.scala) so the sketch itself is reusable (e.g. as a
  * bounded sample of the hash space for set-similarity).
  *
  * Determinism: the result depends only on the SET of input values —
  * insertion order, partitioning, and merge order cannot change it, which
  * is what makes a sketch oracle-checkable cross-engine.
  */
case class BottomKLongs(child: Expression, k: Int,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] with ExpectsInputTypes {

  require(k > 0, "k must be positive")

  // Fail misuse at analysis time; without this a non-long child reaches
  // update()'s asInstanceOf[Long] and dies mid-job with ClassCastException.
  // (Seq[DataType] because AbstractDataType is private[sql] in Spark 4;
  // covariance makes it a legal override.)
  override def inputTypes: Seq[DataType] = Seq(LongType)

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(buf: java.util.TreeSet[java.lang.Long],
                      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      buf.add(v.asInstanceOf[Long])
      if (buf.size > k) buf.pollLast()
    }
    buf
  }

  override def merge(b1: java.util.TreeSet[java.lang.Long],
                     b2: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = b2.iterator()
    while (it.hasNext) {
      b1.add(it.next())
      if (b1.size > k) b1.pollLast()
    }
    b1
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val arr = new Array[Any](buf.size)
    val it = buf.iterator() // TreeSet iterates ascending
    var i = 0
    while (it.hasNext) { arr(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(arr)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val s = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { s.add(bb.getLong); i += 1 }
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKLongs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKLongs =
    copy(inputAggBufferOffset = newOffset)

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def withNewChildInternal(newChild: Expression): BottomKLongs =
    copy(child = newChild)
}

/** Bottom-k distinct (hash, value) PAIRS by (hash asc, value asc) — the
  * deterministic uniform-sample sketch behind
  * [[graft.operators.Sketch.sampledQuantiles]].
  *
  * Same bounded-state / merge-order-free discipline as [[BottomKLongs]]
  * (≤ k pairs per group buffer, associative union-then-trim merge, result
  * a function of the input SET only), but the sketch carries a VALUE
  * alongside the ordering hash: with a uniform key hash, the k kept pairs
  * are a uniform random-but-reproducible sample of the group's rows, and
  * any order statistic of the sampled values estimates the group's — the
  * bounded-state answer for quantiles over UNBOUNDED-cardinality columns,
  * where the exact histogram pass (ExactQuantiles) has nothing bounded to
  * histogram on. Cross-engine: an oracle re-derives the identical sample
  * as the k smallest DISTINCT (hash, value) rows — no RNG anywhere.
  *
  * Output: array<struct<h: long, v: long>> ascending by (h, v).
  */
case class BottomKLongPairs(left: Expression, right: Expression, k: Int,
                            mutableAggBufferOffset: Int = 0,
                            inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[(Long, Long)]]
  with BinaryLike[Expression] with ExpectsInputTypes {

  require(k > 0, "k must be positive")

  override def inputTypes: Seq[DataType] = Seq(LongType, LongType)

  override def createAggregationBuffer(): java.util.TreeSet[(Long, Long)] =
    new java.util.TreeSet[(Long, Long)](Ordering.Tuple2(Ordering.Long, Ordering.Long))

  override def update(buf: java.util.TreeSet[(Long, Long)],
                      input: InternalRow): java.util.TreeSet[(Long, Long)] = {
    val h = left.eval(input)
    val v = right.eval(input)
    if (h != null && v != null) {
      buf.add((h.asInstanceOf[Long], v.asInstanceOf[Long]))
      if (buf.size > k) buf.pollLast()
    }
    buf
  }

  override def merge(b1: java.util.TreeSet[(Long, Long)],
                     b2: java.util.TreeSet[(Long, Long)]): java.util.TreeSet[(Long, Long)] = {
    val it = b2.iterator()
    while (it.hasNext) {
      b1.add(it.next())
      if (b1.size > k) b1.pollLast()
    }
    b1
  }

  override def eval(buf: java.util.TreeSet[(Long, Long)]): Any = {
    val arr = new Array[Any](buf.size)
    val it = buf.iterator() // ascending (h, v)
    var i = 0
    while (it.hasNext) {
      val (h, v) = it.next()
      arr(i) = InternalRow(h, v)
      i += 1
    }
    new GenericArrayData(arr)
  }

  override def serialize(buf: java.util.TreeSet[(Long, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) { val (h, v) = it.next(); bb.putLong(h); bb.putLong(v) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[(Long, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val s = new java.util.TreeSet[(Long, Long)](
      Ordering.Tuple2(Ordering.Long, Ordering.Long))
    var i = 0
    while (i < n) { s.add((bb.getLong, bb.getLong)); i += 1 }
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKLongPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKLongPairs =
    copy(inputAggBufferOffset = newOffset)

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("h", LongType, nullable = false),
      StructField("v", LongType, nullable = false))), containsNull = false)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BottomKLongPairs =
    copy(left = newLeft, right = newRight)
}

/** Misra–Gries frequent-items summary over strings — the bounded-state
  * heavy-hitter candidate generator.
  *
  * Why not `groupBy(item).count()`: over an UNBOUNDED key domain (tokens,
  * URLs, n-grams at web scale) the exact frequency table's cardinality is
  * the domain's, so the aggregate's output — and the shuffle that feeds
  * it — grows with distinct keys, not with k. This buffer never holds
  * more than k counters per partial, the shuffle moves ≤ k (item, weight)
  * entries per (group, partition), and the classic guarantee holds after
  * any sequence of updates and merges (mergeable summaries, Agarwal et
  * al., PODS'12): every item with true count > n/(k+1) is PRESENT in the
  * summary, and each kept weight undercounts its true count by at most
  * n/(k+1).
  *
  * Counter discipline: update inserts/increments while < k counters are
  * live, otherwise decrements ALL counters by 1 and evicts zeros (the
  * arriving item is simply not inserted — its "count" is absorbed by the
  * shared decrement). Merge sums the two counter sets keyed by item, and
  * if more than k survive, subtracts the (k+1)-th largest weight from all
  * and evicts non-positives — both are the canonical error-additive
  * operations, so errors compose: a summary built from any merge tree
  * over any partitioning keeps the n/(k+1) bound.
  *
  * NOT deterministic in its WEIGHTS: different partitionings decrement in
  * different orders, so kept weights (and sub-threshold stragglers) may
  * differ run to run. Consumers must treat the output as a candidate
  * SUPERSET and recount exactly (operators/HeavyHitters.exactTopShare) —
  * that composition is deterministic and oracle-checkable; the raw
  * sketch deliberately is not, and has no oracle entry of its own.
  *
  * Output: array<struct<item: string, w: long>> by (w desc, item asc).
  */
case class MisraGriesStrings(child: Expression, k: Int,
                             mutableAggBufferOffset: Int = 0,
                             inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[String, Long]]
  with UnaryLike[Expression] with ExpectsInputTypes {

  require(k > 0, "k must be positive")

  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def createAggregationBuffer(): java.util.HashMap[String, Long] =
    new java.util.HashMap[String, Long]()

  override def update(buf: java.util.HashMap[String, Long],
                      input: InternalRow): java.util.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.toString // copy out of Spark's reused UTF8String buffer
      // live counters are always >= 1 (zeros are evicted), so a 0 from
      // getOrDefault means "absent" unambiguously
      val cur = buf.getOrDefault(s, 0L)
      if (cur > 0L) buf.put(s, cur + 1L)
      else if (buf.size < k) buf.put(s, 1L)
      else {
        // decrement-all; evict zeros. O(k) but amortized O(1): each
        // decrement pass cancels k+1 arrivals' worth of weight.
        val it = buf.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue <= 1L) it.remove() else e.setValue(e.getValue - 1L)
        }
      }
    }
    buf
  }

  override def merge(b1: java.util.HashMap[String, Long],
                     b2: java.util.HashMap[String, Long]): java.util.HashMap[String, Long] = {
    val it2 = b2.entrySet().iterator()
    while (it2.hasNext) {
      val e = it2.next()
      b1.put(e.getKey, b1.getOrDefault(e.getKey, 0L) + e.getValue)
    }
    if (b1.size > k) {
      // subtract the (k+1)-th largest weight from all, evict non-positive
      val ws = new Array[Long](b1.size)
      var i = 0
      val vit = b1.values().iterator()
      while (vit.hasNext) { ws(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(ws)
      val sub = ws(b1.size - (k + 1)) // (k+1)-th largest
      val it = b1.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue <= sub) it.remove() else e.setValue(e.getValue - sub)
      }
    }
    b1
  }

  override def eval(buf: java.util.HashMap[String, Long]): Any = {
    val entries = new Array[(String, Long)](buf.size)
    var i = 0
    val it = buf.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); entries(i) = (e.getKey, e.getValue); i += 1 }
    scala.util.Sorting.stableSort(entries,
      (a: (String, Long), b: (String, Long)) =>
        a._2 > b._2 || (a._2 == b._2 && a._1 < b._1))
    val arr = new Array[Any](entries.length)
    i = 0
    while (i < entries.length) {
      arr(i) = InternalRow(
        org.apache.spark.unsafe.types.UTF8String.fromString(entries(i)._1),
        entries(i)._2)
      i += 1
    }
    new GenericArrayData(arr)
  }

  override def serialize(buf: java.util.HashMap[String, Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out.writeUTF(e.getKey)
      out.writeLong(e.getValue)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, Long] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val m = new java.util.HashMap[String, Long]()
    var i = 0
    while (i < n) { m.put(in.readUTF(), in.readLong()); i += 1 }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesStrings =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesStrings =
    copy(inputAggBufferOffset = newOffset)

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("item", StringType, nullable = false),
      StructField("w", LongType, nullable = false))), containsNull = false)
  override protected def withNewChildInternal(newChild: Expression): MisraGriesStrings =
    copy(child = newChild)
}
