package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom typed-imperative aggregates (the UDAF rung of the extension ladder —
  * bounded mutable state per group, partial/merge/final like HLL or KLL, not a
  * fold of built-ins).
  *
  * [[BottomK]] is a bottom-k (KMV) sketch: the k smallest DISTINCT values of a
  * string column per group. Unlike most sketches its result is a pure function
  * of the input SET — insertion order, partitioning, and merge order cannot
  * change it — so it is exactly reproducible anywhere (and an exact SQL oracle
  * applies). Uses: distinct-count estimation ((k-1)/F(k-th) for hash inputs),
  * set-similarity between groups (KMV sketch intersection), cheap per-group
  * "signature" rows. State is O(k) per group; update/merge are map-side, so a
  * 100 TB scan shuffles only k strings per group. */
object SketchAggregates {

  /** k smallest distinct values, ascending. Null inputs ignored; empty group →
    * empty array. */
  case class BottomK(child: Expression, k: Int,
                     mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[java.util.TreeSet[UTF8String]]
      with UnaryLike[Expression] {
    require(k >= 1 && k <= 65536, s"bottom_k: k out of range: $k")

    override def createAggregationBuffer(): java.util.TreeSet[UTF8String] =
      new java.util.TreeSet[UTF8String]()

    override def update(buf: java.util.TreeSet[UTF8String], input: InternalRow)
    : java.util.TreeSet[UTF8String] = {
      child.eval(input) match {
        case null => ()
        case v: UTF8String =>
          // copy: the incoming UTF8String may alias a reused row buffer.
          // Evict only on a GENUINE insert — re-adding a value already in the
          // set returns false and must not pop the current max.
          if (buf.size < k) { buf.add(v.clone()); () }
          else if (v.compareTo(buf.last()) < 0 && buf.add(v.clone())) {
            buf.pollLast(); ()
          }
      }
      buf
    }

    override def merge(a: java.util.TreeSet[UTF8String], b: java.util.TreeSet[UTF8String])
    : java.util.TreeSet[UTF8String] = {
      val it = b.iterator()
      while (it.hasNext) {
        val v = it.next()
        if (a.size < k) { a.add(v); () }
        else if (v.compareTo(a.last()) < 0 && a.add(v)) { a.pollLast(); () }
      }
      a
    }

    override def eval(buf: java.util.TreeSet[UTF8String]): Any =
      new GenericArrayData(buf.toArray.asInstanceOf[Array[AnyRef]])

    override def serialize(buf: java.util.TreeSet[UTF8String]): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val out = new DataOutputStream(bos)
      out.writeInt(buf.size)
      val it = buf.iterator()
      while (it.hasNext) {
        val bytes = it.next().getBytes
        out.writeInt(bytes.length)
        out.write(bytes)
      }
      out.flush(); bos.toByteArray
    }

    override def deserialize(bytes: Array[Byte]): java.util.TreeSet[UTF8String] = {
      val in = new DataInputStream(new ByteArrayInputStream(bytes))
      val buf = createAggregationBuffer()
      var n = in.readInt()
      while (n > 0) {
        val b = new Array[Byte](in.readInt())
        in.readFully(b)
        buf.add(UTF8String.fromBytes(b))
        n -= 1
      }
      buf
    }

    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullable: Boolean = false
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bottom_k needs a string child (cast first), got $other")
      }
    override def withNewMutableAggBufferOffset(offset: Int): BottomK =
      copy(mutableAggBufferOffset = offset)
    override def withNewInputAggBufferOffset(offset: Int): BottomK =
      copy(inputAggBufferOffset = offset)
    override protected def withNewChildInternal(newChild: Expression): BottomK =
      copy(child = newChild)
    override def prettyName: String = "bottom_k"
  }

  /** Top-k rows per group by a bounded heap — the aggregate formulation of
    * "top-N per group". The window formulation
    * (`row_number().over(partitionBy(g).orderBy(...)) <= k`) must SHUFFLE AND
    * SORT EVERY ROW; this aggregate keeps a k-element min-heap per group and
    * combines map-side, so only `k` rows per group per partition reach the
    * exchange — the difference between shuffling 100 TB and shuffling
    * kilobytes when groups are few and k is small.
    *
    * `child` must be a struct whose FIELD ORDER is the sort key: rows are
    * ranked by lexicographic struct comparison, descending (put the metric
    * first and unique tiebreakers after it for a deterministic, exactly
    * SQL-reproducible result: `ORDER BY f1 DESC, f2 DESC, ... LIMIT k`). */
  case class TopKRows(child: Expression, k: Int,
                      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[java.util.PriorityQueue[InternalRow]]
      with UnaryLike[Expression] {
    require(k >= 1 && k <= (1 << 20), s"top_k_rows: k out of range: $k")

    private lazy val rowType = child.dataType.asInstanceOf[StructType]
    private lazy val ordering: Ordering[InternalRow] = {
      val fieldOrds = rowType.fields.map(f =>
        org.apache.spark.sql.catalyst.util.TypeUtils.getInterpretedOrdering(f.dataType))
      (a: InternalRow, b: InternalRow) => {
        var i = 0
        var cmp = 0
        while (cmp == 0 && i < rowType.length) {
          val (av, bv) = (a.get(i, rowType(i).dataType), b.get(i, rowType(i).dataType))
          cmp = (av == null, bv == null) match {
            case (true, true) => 0
            case (true, false) => -1 // nulls smallest -> evicted first
            case (false, true) => 1
            case _ => fieldOrds(i).asInstanceOf[Ordering[Any]].compare(av, bv)
          }
          i += 1
        }
        cmp
      }
    }
    private lazy val toUnsafe =
      org.apache.spark.sql.catalyst.expressions.UnsafeProjection.create(rowType)

    override def createAggregationBuffer(): java.util.PriorityQueue[InternalRow] =
      new java.util.PriorityQueue[InternalRow](math.min(k, 1024), ordering)

    private def offer(heap: java.util.PriorityQueue[InternalRow], row: InternalRow): Unit = {
      if (heap.size < k) { heap.offer(row); () }
      else if (ordering.compare(row, heap.peek()) > 0) {
        heap.poll(); heap.offer(row); ()
      }
    }

    override def update(heap: java.util.PriorityQueue[InternalRow], input: InternalRow)
    : java.util.PriorityQueue[InternalRow] = {
      child.eval(input) match {
        case null => ()
        case r: InternalRow =>
          // copy through UnsafeProjection: the child row may alias reused buffers
          if (heap.size < k || ordering.compare(r, heap.peek()) > 0)
            offer(heap, toUnsafe(r).copy())
      }
      heap
    }

    override def merge(a: java.util.PriorityQueue[InternalRow],
                       b: java.util.PriorityQueue[InternalRow])
    : java.util.PriorityQueue[InternalRow] = {
      val it = b.iterator()
      while (it.hasNext) offer(a, it.next())
      a
    }

    /** descending: best row first. */
    override def eval(heap: java.util.PriorityQueue[InternalRow]): Any = {
      val arr = heap.toArray(new Array[InternalRow](heap.size))
      java.util.Arrays.sort(arr, ordering.reverse)
      new GenericArrayData(arr.asInstanceOf[Array[AnyRef]])
    }

    override def serialize(heap: java.util.PriorityQueue[InternalRow]): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val out = new DataOutputStream(bos)
      out.writeInt(heap.size)
      val it = heap.iterator()
      while (it.hasNext) {
        val bytes = toUnsafe(it.next()) match {
          case u: org.apache.spark.sql.catalyst.expressions.UnsafeRow => u.getBytes
        }
        out.writeInt(bytes.length)
        out.write(bytes)
      }
      out.flush(); bos.toByteArray
    }

    override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[InternalRow] = {
      val in = new DataInputStream(new ByteArrayInputStream(bytes))
      val heap = createAggregationBuffer()
      var n = in.readInt()
      while (n > 0) {
        val b = new Array[Byte](in.readInt())
        in.readFully(b)
        val row = new org.apache.spark.sql.catalyst.expressions.UnsafeRow(rowType.length)
        row.pointTo(b, b.length)
        heap.offer(row)
        n -= 1
      }
      heap
    }

    override def dataType: DataType = ArrayType(rowType, containsNull = false)
    override def nullable: Boolean = false
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case _: StructType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"top_k_rows needs a struct child (sort key = field order), got $other")
      }
    override def withNewMutableAggBufferOffset(offset: Int): TopKRows =
      copy(mutableAggBufferOffset = offset)
    override def withNewInputAggBufferOffset(offset: Int): TopKRows =
      copy(inputAggBufferOffset = offset)
    override protected def withNewChildInternal(newChild: Expression): TopKRows =
      copy(child = newChild)
    override def prettyName: String = "top_k_rows"
  }

  /** Space-Saving frequent-items sketch (Metwally et al. 2005): the classic
    * heavy-hitters summary with `capacity` counters per group. Every reported
    * count is an UPPER bound and `cnt - err` a LOWER bound on the true
    * frequency; any item with true frequency > N/capacity is guaranteed
    * present. When the distinct count never exceeds `capacity` — the common
    * "low-cardinality column, unknown-but-bounded domain" profiling case — no
    * counter is ever evicted, every `err` is 0, and the result is EXACT (so a
    * plain GROUP BY oracle applies).
    *
    * Merge keeps both bounds honest (Agarwal et al. 2013, mergeable
    * summaries): keys in both sides sum counts and errors; a key present in
    * only one side adds the other side's worst-case missed count (its minimum
    * counter if that side ever evicted, else 0 — absent from a never-evicted
    * summary means truly absent from that stream) to both `cnt` and `err`;
    * then the merged table is trimmed back to `capacity`, dropping smallest.
    * State is O(capacity) per group, updates combine map-side — a 100 TB scan
    * ships `capacity` counters per group per partition, never the raw rows. */
  case class SpaceSaving(child: Expression, capacity: Int,
                         mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[SpaceSaving.Summary]
      with UnaryLike[Expression] {
    require(capacity >= 1 && capacity <= 65536,
      s"space_saving: capacity out of range: $capacity")

    override def createAggregationBuffer(): SpaceSaving.Summary =
      new SpaceSaving.Summary()

    override def update(buf: SpaceSaving.Summary, input: InternalRow): SpaceSaving.Summary = {
      child.eval(input) match {
        case null => ()
        case v: UTF8String => buf.add(v, capacity)
      }
      buf
    }

    override def merge(a: SpaceSaving.Summary, b: SpaceSaving.Summary): SpaceSaving.Summary = {
      a.mergeIn(b, capacity); a
    }

    /** array of (item, cnt, err), count-descending then item-ascending — a
      * deterministic pure function of the merged summary. */
    override def eval(buf: SpaceSaving.Summary): Any = {
      val entries = buf.sortedEntries
      val rows = entries.map { e =>
        InternalRow(e.item, e.cnt, e.err): AnyRef
      }
      new GenericArrayData(rows)
    }

    override def serialize(buf: SpaceSaving.Summary): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val out = new DataOutputStream(bos)
      out.writeBoolean(buf.evicted)
      out.writeInt(buf.map.size)
      val it = buf.map.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val bytes = e.getKey.getBytes
        out.writeInt(bytes.length)
        out.write(bytes)
        out.writeLong(e.getValue.cnt)
        out.writeLong(e.getValue.err)
      }
      out.flush(); bos.toByteArray
    }

    override def deserialize(bytes: Array[Byte]): SpaceSaving.Summary = {
      val in = new DataInputStream(new ByteArrayInputStream(bytes))
      val buf = createAggregationBuffer()
      buf.evicted = in.readBoolean()
      var n = in.readInt()
      while (n > 0) {
        val b = new Array[Byte](in.readInt())
        in.readFully(b)
        val c = new SpaceSaving.Counter(in.readLong(), in.readLong())
        buf.map.put(UTF8String.fromBytes(b), c)
        n -= 1
      }
      buf
    }

    override def dataType: DataType = ArrayType(SpaceSaving.entryType, containsNull = false)
    override def nullable: Boolean = false
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"space_saving needs a string child (cast first), got $other")
      }
    override def withNewMutableAggBufferOffset(offset: Int): SpaceSaving =
      copy(mutableAggBufferOffset = offset)
    override def withNewInputAggBufferOffset(offset: Int): SpaceSaving =
      copy(inputAggBufferOffset = offset)
    override protected def withNewChildInternal(newChild: Expression): SpaceSaving =
      copy(child = newChild)
    override def prettyName: String = "space_saving"
  }

  object SpaceSaving {
    import org.apache.spark.sql.types.{LongType, StructField}
    val entryType: StructType = StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false),
      StructField("err", LongType, nullable = false)))

    final class Counter(var cnt: Long, var err: Long)

    final class Summary {
      val map = new java.util.HashMap[UTF8String, Counter]()
      /** true iff this summary (or anything merged into it) ever dropped a
        * counter — the switch between "exact table" and "sketch with bounds". */
      var evicted: Boolean = false

      def add(v: UTF8String, capacity: Int): Unit = {
        val existing = map.get(v)
        if (existing != null) existing.cnt += 1
        else if (map.size < capacity) map.put(v.clone(), new Counter(1L, 0L))
        else {
          // classic Space-Saving eviction: the new item inherits the minimum
          // counter's count as its overestimate bound (tie → lexicographically
          // smallest key, for cross-partition determinism of the bound)
          val (minKey, minCtr) = minEntry()
          map.remove(minKey)
          map.put(v.clone(), new Counter(minCtr.cnt + 1, minCtr.cnt))
          evicted = true
        }
      }

      private def minEntry(): (UTF8String, Counter) = {
        var mk: UTF8String = null
        var mc: Counter = null
        val it = map.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (mc == null || e.getValue.cnt < mc.cnt ||
              (e.getValue.cnt == mc.cnt && e.getKey.compareTo(mk) < 0)) {
            mk = e.getKey; mc = e.getValue
          }
        }
        (mk, mc)
      }

      /** the worst-case count a key ABSENT from this summary may have seen:
        * 0 if nothing was ever evicted, else the minimum counter value. */
      private def absentBound(): Long =
        if (!evicted) 0L
        else {
          var m = Long.MaxValue
          val it = map.values().iterator()
          while (it.hasNext) m = math.min(m, it.next().cnt)
          if (m == Long.MaxValue) 0L else m
        }

      def mergeIn(other: Summary, capacity: Int): Unit = {
        val boundThis = absentBound()
        val boundOther = other.absentBound()
        // keys present here: add other's count (or its absent bound)
        val itA = map.entrySet().iterator()
        while (itA.hasNext) {
          val e = itA.next()
          val o = other.map.get(e.getKey)
          if (o != null) { e.getValue.cnt += o.cnt; e.getValue.err += o.err }
          else { e.getValue.cnt += boundOther; e.getValue.err += boundOther }
        }
        // keys only in other: bring over, charged with this side's absent bound
        val itB = other.map.entrySet().iterator()
        while (itB.hasNext) {
          val e = itB.next()
          if (!map.containsKey(e.getKey))
            map.put(e.getKey, new Counter(e.getValue.cnt + boundThis, e.getValue.err + boundThis))
        }
        evicted ||= other.evicted
        // trim back to capacity, dropping the smallest counters
        while (map.size > capacity) {
          val (mk, _) = minEntry()
          map.remove(mk)
          evicted = true
        }
      }

      /** count-descending, item-ascending — deterministic regardless of
        * partitioning or merge order (given identical multiset content). */
      def sortedEntries: Array[Entry] = {
        val arr = new Array[Entry](map.size)
        var i = 0
        val it = map.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          arr(i) = Entry(e.getKey, e.getValue.cnt, e.getValue.err)
          i += 1
        }
        java.util.Arrays.sort(arr, (a: Entry, b: Entry) =>
          if (a.cnt != b.cnt) java.lang.Long.compare(b.cnt, a.cnt)
          else a.item.compareTo(b.item))
        arr
      }
    }

    final case class Entry(item: UTF8String, cnt: Long, err: Long)
  }

  /** Distinct LONG values per group, CAPPED at `cap` elements — the bounded
    * twin of `collect_set` for prune-then-use patterns: a group whose
    * distinct count exceeds `cap` simply stops collecting (its ≤-cap result
    * is a truncated sample the caller is about to DISCARD anyway — d13's
    * maxDocFreq prune calls this with cap = maxDocFreq + 1, so
    * `size(ids) > maxDocFreq` still detects overflow exactly). Every buffer —
    * map-side partials included — holds at most `cap` longs (8·cap bytes),
    * so a key shared by millions of rows costs O(cap) memory per partition
    * instead of an unbounded in-buffer array: the executor-OOM shape
    * `collect_set` has on hot keys cannot occur. Output sorted ascending
    * (a pure function of the retained SET; with no overflow — the only case
    * callers keep — it is exactly the distinct set, SQL-reproducible). */
  case class CollectSetBoundedLong(child: Expression, cap: Int,
                                   mutableAggBufferOffset: Int = 0,
                                   inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[java.util.HashSet[java.lang.Long]]
      with UnaryLike[Expression] {
    require(cap >= 1 && cap <= (1 << 20),
      s"collect_set_bounded: cap out of range: $cap")

    override def createAggregationBuffer(): java.util.HashSet[java.lang.Long] =
      new java.util.HashSet[java.lang.Long]()

    override def update(buf: java.util.HashSet[java.lang.Long], input: InternalRow)
    : java.util.HashSet[java.lang.Long] = {
      child.eval(input) match {
        case null => ()
        case v: java.lang.Long => if (buf.size < cap) { buf.add(v); () }
        case v: Long => if (buf.size < cap) { buf.add(v); () }
      }
      buf
    }

    override def merge(a: java.util.HashSet[java.lang.Long],
                       b: java.util.HashSet[java.lang.Long])
    : java.util.HashSet[java.lang.Long] = {
      val it = b.iterator()
      while (it.hasNext && a.size < cap) { a.add(it.next()); () }
      // drain silently past cap: the group is over the prune bound either way
      a
    }

    override def eval(buf: java.util.HashSet[java.lang.Long]): Any = {
      val arr = new Array[Long](buf.size)
      val it = buf.iterator(); var i = 0
      while (it.hasNext) { arr(i) = it.next(); i += 1 }
      java.util.Arrays.sort(arr)
      new GenericArrayData(arr)
    }

    override def serialize(buf: java.util.HashSet[java.lang.Long]): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val out = new DataOutputStream(bos)
      out.writeInt(buf.size)
      val it = buf.iterator()
      while (it.hasNext) out.writeLong(it.next())
      out.flush(); bos.toByteArray
    }

    override def deserialize(bytes: Array[Byte]): java.util.HashSet[java.lang.Long] = {
      val in = new DataInputStream(new ByteArrayInputStream(bytes))
      val buf = createAggregationBuffer()
      var n = in.readInt()
      while (n > 0) { buf.add(in.readLong()); n -= 1 }
      buf
    }

    override def dataType: DataType =
      ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
    override def nullable: Boolean = false
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case org.apache.spark.sql.types.LongType =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"collect_set_bounded needs a long child (cast first), got $other")
      }
    override def withNewMutableAggBufferOffset(offset: Int): CollectSetBoundedLong =
      copy(mutableAggBufferOffset = offset)
    override def withNewInputAggBufferOffset(offset: Int): CollectSetBoundedLong =
      copy(inputAggBufferOffset = offset)
    override protected def withNewChildInternal(newChild: Expression): CollectSetBoundedLong =
      copy(child = newChild)
    override def prettyName: String = "collect_set_bounded"
  }

  import org.apache.spark.sql.graft.ColumnBridge.{column, expression}

  /** DataFrame-side: `bottomK(col, k)` usable inside `agg(...)`. */
  def bottomK(c: Column, k: Int): Column =
    column(BottomK(expression(c), k).toAggregateExpression())

  /** DataFrame-side: `topKRows(struct(metric, tiebreakers...), k)`. */
  def topKRows(structCol: Column, k: Int): Column =
    column(TopKRows(expression(structCol), k).toAggregateExpression())

  /** DataFrame-side: `spaceSaving(col, capacity)` usable inside `agg(...)` —
    * array of (item, cnt, err) structs, count-descending. */
  def spaceSaving(c: Column, capacity: Int): Column =
    column(SpaceSaving(expression(c), capacity).toAggregateExpression())

  /** DataFrame-side: `collectSetBounded(longCol, cap)` usable inside
    * `agg(...)` — sorted distinct longs, collection stopping at `cap`. */
  def collectSetBounded(c: Column, cap: Int): Column =
    column(CollectSetBoundedLong(expression(c), cap).toAggregateExpression())
}
