package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass champion-list aggregate: per group, (df, cf, top-k postings)
  * in a SINGLE partially-aggregated pass — the fusion of the
  * `groupBy(term).agg(count, sum)` stats aggregate and the bounded
  * [[GroupTopK]] heap prune that [[graft.operators.Rank.championIndex]]
  * previously ran as two separate subtrees over the same tokenized census.
  * As two subtrees, ONE logical corpus pass executed twice (the census UDF
  * ran once per subtree) and the plan carried two exchanges plus the
  * stats join and a rank window; fused, the census is tokenized once, one
  * exchange moves partial buffers (df/cf partial sums + a k-bounded heap —
  * never a full posting list), and rank falls out of the heap's sorted
  * drain (guide §2.3 "aggregate before you shuffle", §2.4 "remove shuffles
  * outright").
  *
  * Semantics (bit-identical to the two-subtree form):
  *  - df = count(1) over the group's rows; cf = sum(cfExpr) (null-skipped).
  *  - postings = top-k rows by (ordExpr DESC NULLS LAST, idExpr ASC NULLS
  *    FIRST) — the exact SortOrder the previous GroupTopK + rank window
  *    used — emitted best-first, with any `payload` columns carried.
  *
  * Memory contract: the heap is k-bounded per group in BOTH phases, so a
  * stopword's corpus-sized posting list still never materializes; the
  * partial phase runs under ObjectHashAggregateExec, whose sort-based
  * fallback (`spark.sql.objectHashAggregate.sortBased.fallbackThreshold`)
  * keeps group-explosive inputs spill-safe. */
final case class ChampionAgg(
    cfExpr: Expression,
    ordExpr: Expression,
    idExpr: Expression,
    payload: Seq[Expression],
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ChampionAgg.Buffer] {

  require(k > 0, "ChampionAgg: k must be positive")

  override def children: Seq[Expression] = Seq(cfExpr, ordExpr, idExpr) ++ payload

  override def nullable: Boolean = false

  private def idType: DataType = idExpr.dataType

  override def dataType: DataType = StructType(Seq(
    StructField("df", LongType, nullable = false),
    StructField("cf", LongType, nullable = true),
    StructField("posts", ArrayType(StructType(
      StructField("ord", LongType, nullable = true) +:
        StructField("id", idType, nullable = true) +:
        payload.indices.map(i => StructField(s"p$i", LongType, nullable = true))),
      containsNull = false), nullable = false)))

  override def createAggregationBuffer(): ChampionAgg.Buffer =
    new ChampionAgg.Buffer(k, idType)

  override def update(b: ChampionAgg.Buffer, input: InternalRow): ChampionAgg.Buffer = {
    b.df += 1L
    val cfV = cfExpr.eval(input)
    if (cfV != null) { b.cf += cfV.asInstanceOf[Long]; b.cfSeen = true }
    val ordV = ordExpr.eval(input)
    val idV0 = idExpr.eval(input)
    // copy unsafe-backed values out of the reused input row
    val idV = idV0 match {
      case s: UTF8String => s.clone()
      case v => v
    }
    val pay = new Array[java.lang.Long](payload.length)
    var i = 0
    while (i < payload.length) {
      val p = payload(i).eval(input)
      pay(i) = if (p == null) null else java.lang.Long.valueOf(p.asInstanceOf[Long])
      i += 1
    }
    b.offer(new ChampionAgg.Post(
      if (ordV == null) null else java.lang.Long.valueOf(ordV.asInstanceOf[Long]),
      idV, pay))
    b
  }

  override def merge(b: ChampionAgg.Buffer, o: ChampionAgg.Buffer): ChampionAgg.Buffer = {
    b.df += o.df
    b.cf += o.cf
    b.cfSeen |= o.cfSeen
    val it = o.heap.iterator()
    while (it.hasNext) b.offer(it.next())
    b
  }

  override def eval(b: ChampionAgg.Buffer): Any = {
    val arr = b.heap.toArray(new Array[ChampionAgg.Post](b.heap.size))
    java.util.Arrays.sort(arr, b.bestFirst)
    val rows: Array[Any] = arr.map { p =>
      val vals = new Array[Any](2 + payload.length)
      vals(0) = p.ord
      vals(1) = p.id
      var i = 0
      while (i < payload.length) { vals(2 + i) = p.pay(i); i += 1 }
      new GenericInternalRow(vals): Any
    }
    new GenericInternalRow(Array[Any](
      b.df, if (b.cfSeen) java.lang.Long.valueOf(b.cf) else null,
      new GenericArrayData(rows)))
  }

  override def serialize(b: ChampionAgg.Buffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(b.df)
    out.writeLong(b.cf)
    out.writeBoolean(b.cfSeen)
    out.writeInt(b.heap.size)
    val it = b.heap.iterator()
    while (it.hasNext) {
      val p = it.next()
      out.writeBoolean(p.ord != null)
      if (p.ord != null) out.writeLong(p.ord.longValue)
      out.writeBoolean(p.id != null)
      if (p.id != null) idType match {
        case LongType => out.writeLong(p.id.asInstanceOf[Long])
        case IntegerType => out.writeInt(p.id.asInstanceOf[Int])
        case StringType =>
          val bytes = p.id.asInstanceOf[UTF8String].getBytes
          out.writeInt(bytes.length); out.write(bytes)
        case t => throw new IllegalStateException(s"ChampionAgg: unsupported id type $t")
      }
      var i = 0
      while (i < p.pay.length) {
        out.writeBoolean(p.pay(i) != null)
        if (p.pay(i) != null) out.writeLong(p.pay(i).longValue)
        i += 1
      }
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ChampionAgg.Buffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val b = new ChampionAgg.Buffer(k, idType)
    b.df = in.readLong()
    b.cf = in.readLong()
    b.cfSeen = in.readBoolean()
    val n = in.readInt()
    var j = 0
    while (j < n) {
      val ord = if (in.readBoolean()) java.lang.Long.valueOf(in.readLong()) else null
      val id: Any = if (!in.readBoolean()) null else idType match {
        case LongType => in.readLong()
        case IntegerType => in.readInt()
        case StringType =>
          val len = in.readInt()
          val bs = new Array[Byte](len); in.readFully(bs)
          UTF8String.fromBytes(bs)
        case t => throw new IllegalStateException(s"ChampionAgg: unsupported id type $t")
      }
      val pay = new Array[java.lang.Long](payload.length)
      var i = 0
      while (i < payload.length) {
        pay(i) = if (in.readBoolean()) java.lang.Long.valueOf(in.readLong()) else null
        i += 1
      }
      b.offer(new ChampionAgg.Post(ord, id, pay))
      j += 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ChampionAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): ChampionAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): ChampionAgg =
    copy(cfExpr = newChildren(0), ordExpr = newChildren(1), idExpr = newChildren(2),
      payload = newChildren.drop(3))

  override def prettyName: String = "champion_agg"
}

object ChampionAgg {

  /** One posting candidate: nullable ordering key, id (Long / Int /
    * UTF8String / null), nullable Long payload columns. */
  final class Post(val ord: java.lang.Long, val id: Any, val pay: Array[java.lang.Long])

  /** Bounded top-k heap + df/cf partial sums. Ordering is (ord DESC NULLS
    * LAST, id ASC NULLS FIRST) — identical to the rank window the fused
    * form replaces. The heap's head is the WORST kept posting. */
  final class Buffer(k: Int, idType: DataType) {
    var df: Long = 0L
    var cf: Long = 0L
    var cfSeen: Boolean = false

    private def idCmp(a: Any, b: Any): Int = {
      // ASC NULLS FIRST: null is smallest
      if (a == null && b == null) 0
      else if (a == null) -1
      else if (b == null) 1
      else idType match {
        case LongType => java.lang.Long.compare(a.asInstanceOf[Long], b.asInstanceOf[Long])
        case IntegerType => java.lang.Integer.compare(a.asInstanceOf[Int], b.asInstanceOf[Int])
        case StringType => a.asInstanceOf[UTF8String].compareTo(b.asInstanceOf[UTF8String])
        case t => throw new IllegalStateException(s"ChampionAgg: unsupported id type $t")
      }
    }

    /** > 0 when a is BETTER than b (higher ord — null ord worst — then
      * smaller id — null id first). */
    private def goodness(a: Post, b: Post): Int = {
      val ao = a.ord; val bo = b.ord
      val c =
        if (ao == null && bo == null) 0
        else if (ao == null) -1 // null ord sorts last = worst
        else if (bo == null) 1
        else java.lang.Long.compare(ao.longValue, bo.longValue)
      if (c != 0) c
      else -idCmp(a.id, b.id) // smaller id = better
    }

    /** Heap comparator: ascending goodness, so peek() is the worst kept. */
    private val worstFirst = new java.util.Comparator[Post] {
      override def compare(a: Post, b: Post): Int = goodness(a, b)
    }

    /** Best-first output order — what rank 1..k enumerates. */
    val bestFirst: java.util.Comparator[Post] = new java.util.Comparator[Post] {
      override def compare(a: Post, b: Post): Int = -goodness(a, b)
    }

    val heap = new java.util.PriorityQueue[Post](math.min(k, 1 << 10), worstFirst)

    def offer(p: Post): Unit = {
      if (heap.size < k) heap.offer(p)
      else if (goodness(p, heap.peek()) > 0) { heap.poll(); heap.offer(p) }
    }
  }
}
