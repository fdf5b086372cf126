package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types._

/** The whole-operator extension surface (builder-brief preference (c)): a
  * native AS-OF JOIN as a LogicalPlan + SparkStrategy + SparkPlan, installed
  * session-wide by [[graft.extensions.GraftExtensions]].
  *
  * The composition form ([[graft.operators.AsOfJoin.lastAtOrBefore]] —
  * union + last_value window) is semantically identical and remains the
  * default; this operator exists because the physical algorithm Spark can't
  * express declaratively is better: both sides hash-partition on the key and
  * sort per partition, then ONE streaming merge pass matches every left row
  * to the latest right row at-or-before it. No union row-padding (the window
  * form widens every right row to the left schema), no window state machine
  * — per partition it is two sorted iterators and O(1) carry state, the
  * textbook as-of merge at any scale.
  *
  * Contract (checked by the builder in [[graft.operators.AsOfJoin.native]]):
  * key and ts columns are any int/long-backed atomic type (bigint, int,
  * smallint, tinyint, date, timestamp, timestamp_ntz). The KEY type must be
  * IDENTICAL on both sides — the sides co-partition by hash, and Spark's
  * Murmur3 hashes an int 5 and a long 5 differently, so mixed key widths
  * would silently scatter equal keys to different partitions. The TS types
  * may differ in width (compared as promoted longs per side); mixing a date
  * ts with a timestamp ts is the caller's unit error, same as comparing
  * them raw in SQL. Any number of right payload columns, of any type,
  * carried from the SAME matched row. Ties among right rows at equal
  * (key, ts) resolve to the largest right id — identical to the composition
  * and the DuckDB oracle.
  */
final case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    keyCol: String, tsCol: String, rightId: String, rightPayloads: Seq[String],
    matchedAttrs: Seq[Attribute]  // generated ONCE by the builder: stable exprIds across copies
) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ matchedAttrs
  /** The matched columns originate HERE (like Generate's generator output) —
    * without this, CheckAnalysis reports them missing from the inputs. */
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(matchedAttrs)

  /** The operator consumes key/ts (+ right id/payloads) BY NAME, which
    * Catalyst cannot see in `expressions` — declaring them here keeps
    * ColumnPruning from stripping them from the children (unused left
    * payload columns still prune, which is the behavior we want). */
  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet = {
    val lNeeded = Set(keyCol, tsCol)
    val rNeeded = Set(keyCol, tsCol, rightId) ++ rightPayloads
    org.apache.spark.sql.catalyst.expressions.AttributeSet(
      left.output.filter(a => lNeeded.exists(a.name.equalsIgnoreCase)) ++
        right.output.filter(a => rNeeded.exists(a.name.equalsIgnoreCase)))
  }
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinPlan {
  /** Key/ts types the merge supports: atomic types physically stored as int
    * or long, so ordering is one primitive comparison (no boxed ordering in
    * the per-row hot loop). */
  def supportedOrderType(dt: DataType): Boolean = dt match {
    case LongType | TimestampType | TimestampNTZType |
         IntegerType | DateType | ShortType | ByteType => true
    case _ => false
  }

  /** Reader promoting the physical int/long representation to a long. */
  private[plans] def longReader(dt: DataType): (InternalRow, Int) => Long = dt match {
    case LongType | TimestampType | TimestampNTZType => (r, i) => r.getLong(i)
    case IntegerType | DateType => (r, i) => r.getInt(i).toLong
    case ShortType => (r, i) => r.getShort(i).toLong
    case ByteType => (r, i) => r.getByte(i).toLong
    case other => throw new IllegalArgumentException(
      s"as-of join: unsupported key/ts type ${other.simpleString}")
  }
}

/** Plans [[AsOfJoinPlan]] into [[AsOfJoinExec]]; ignores every other node. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: AsOfJoinPlan =>
      AsOfJoinExec(planLater(p.left), planLater(p.right),
        p.keyCol, p.tsCol, p.rightId, p.rightPayloads, p.matchedAttrs) :: Nil
    case _ => Nil
  }
}

final case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    keyCol: String, tsCol: String, rightId: String, rightPayloads: Seq[String],
    matchedAttrs: Seq[Attribute]
) extends BinaryExecNode {

  private def attr(side: SparkPlan, name: String): Attribute =
    side.output.find(_.name.equalsIgnoreCase(name)).getOrElse(
      throw new IllegalArgumentException(s"as-of join: no column '$name' in ${side.output}"))

  override def output: Seq[Attribute] = left.output ++ matchedAttrs
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(matchedAttrs)

  /** Co-partition both sides on the key: EnsureRequirements inserts the two
    * compatible hash exchanges (or reuses existing partitioning). */
  override def requiredChildDistribution: Seq[Distribution] = Seq(
    ClusteredDistribution(Seq(attr(left, keyCol))),
    ClusteredDistribution(Seq(attr(right, keyCol))))

  /** Per-partition sort: (key, ts) on the left; (key, ts, rightId) on the
    * right so the largest id is the LAST consumed at a tied timestamp. */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(attr(left, keyCol), Ascending), SortOrder(attr(left, tsCol), Ascending)),
    Seq(SortOrder(attr(right, keyCol), Ascending), SortOrder(attr(right, tsCol), Ascending),
      SortOrder(attr(right, rightId), Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeyOrd = left.output.indexWhere(_.name.equalsIgnoreCase(keyCol))
    val lTsOrd = left.output.indexWhere(_.name.equalsIgnoreCase(tsCol))
    val rKeyOrd = right.output.indexWhere(_.name.equalsIgnoreCase(keyCol))
    val rTsOrd = right.output.indexWhere(_.name.equalsIgnoreCase(tsCol))
    val rIdOrd = right.output.indexWhere(_.name.equalsIgnoreCase(rightId))
    val rPayOrds = rightPayloads.map(p =>
      right.output.indexWhere(_.name.equalsIgnoreCase(p))).toArray
    // promoted-long readers per column (the TS widths may differ per side,
    // e.g. an int left ts against a bigint right ts; the KEY type is
    // builder-checked identical — mixed key widths would mis-co-partition)
    val lKeyRead = AsOfJoinPlan.longReader(left.output(lKeyOrd).dataType)
    val lTsRead = AsOfJoinPlan.longReader(left.output(lTsOrd).dataType)
    val rKeyRead = AsOfJoinPlan.longReader(right.output(rKeyOrd).dataType)
    val rTsRead = AsOfJoinPlan.longReader(right.output(rTsOrd).dataType)
    val ridType = matchedAttrs(0).dataType
    val payTypes = rightPayloads.indices.map(i => matchedAttrs(i + 1).dataType).toArray
    val nPay = rPayOrds.length
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val rBuf = rIt.buffered
      val joined = new JoinedRow
      val matchedRow = new GenericInternalRow(1 + nPay)
      val toUnsafe = UnsafeProjection.create(outAttrs, outAttrs)
      // O(1) carry state per partition: the latest right row seen for lastKey
      var lastKey = 0L
      var haveLast = false
      var lastRid: Any = null
      val lastRpay = new Array[Any](nPay)

      // NULLS-FIRST comparators mirroring the composition's window order:
      // null keys form their own group (window PARTITION BY semantics — the
      // spec for this operator — not join equality), and a null ts counts
      // as "before everything".
      def cmpNullsFirst(aNull: Boolean, a: Long, bNull: Boolean, b: Long): Int =
        if (aNull && bNull) 0 else if (aNull) -1 else if (bNull) 1
        else java.lang.Long.compare(a, b)
      var lastKeyNull = false

      lIt.map { l =>
        val lkNull = l.isNullAt(lKeyOrd)
        val lk = if (lkNull) 0L else lKeyRead(l, lKeyOrd)
        val ltsNull = l.isNullAt(lTsOrd)
        val lts = if (ltsNull) 0L else lTsRead(l, lTsOrd)
        // Consume rights up to (key, ts]; rows for earlier keys just pass.
        while (rBuf.hasNext && {
          val r = rBuf.head
          val ck = cmpNullsFirst(r.isNullAt(rKeyOrd),
            if (r.isNullAt(rKeyOrd)) 0L else rKeyRead(r, rKeyOrd), lkNull, lk)
          ck < 0 || (ck == 0 && cmpNullsFirst(r.isNullAt(rTsOrd),
            if (r.isNullAt(rTsOrd)) 0L else rTsRead(r, rTsOrd), ltsNull, lts) <= 0)
        }) {
          val r = rBuf.next()
          val rkNull = r.isNullAt(rKeyOrd)
          val rk = if (rkNull) 0L else rKeyRead(r, rKeyOrd)
          if (cmpNullsFirst(rkNull, rk, lkNull, lk) == 0) {
            lastKeyNull = rkNull
            lastKey = rk
            haveLast = true
            // InternalRow.copyValue: deep-copies UTF8String/array/struct
            // values out of the iterator's reused row buffer — the carry
            // state must survive rBuf advancing.
            lastRid = if (r.isNullAt(rIdOrd)) null
              else InternalRow.copyValue(r.get(rIdOrd, ridType))
            var i = 0
            while (i < nPay) {
              lastRpay(i) = if (r.isNullAt(rPayOrds(i))) null
                else InternalRow.copyValue(r.get(rPayOrds(i), payTypes(i)))
              i += 1
            }
          }
        }
        val hit = haveLast && cmpNullsFirst(lastKeyNull, lastKey, lkNull, lk) == 0
        matchedRow(0) = if (hit) lastRid else null
        var i = 0
        while (i < nPay) {
          matchedRow(i + 1) = if (hit) lastRpay(i) else null
          i += 1
        }
        toUnsafe(joined(l, matchedRow))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
