package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{BooleanType, DataType, IntegerType, LongType}

/** Pattern DSL of the reference's sequenceMatch/sequenceCount
  * (dbms/src/AggregateFunctions/AggregateFunctionSequenceMatch.h:
  * parsePattern at :273-361, backtracking matcher at :365-497):
  * `(?N)` = event condition N, `.` = any single event, `.*` = any
  * run of events, `(?t<=N)`/`(?t<N)`/`(?t>=N)`/`(?t>N)` = seconds
  * between the previously matched event and the next one.
  *
  * Aggregation state is the per-group (timestamp, condition-bitmask)
  * event list — bounded by per-key activity, not table size, exactly
  * the reference's `AggregateFunctionSequenceMatchData`. Matching
  * runs once per group at eval on the sorted list.
  */
object SequencePattern {
  sealed trait Action
  final case class SpecificEvent(n: Int) extends Action
  case object AnyEvent extends Action
  case object KleeneStar extends Action
  final case class TimeLE(s: Long) extends Action
  final case class TimeLT(s: Long) extends Action
  final case class TimeGE(s: Long) extends Action
  final case class TimeGT(s: Long) extends Action

  private val MaxIterations = 1000000

  def parse(pattern: String, condCount: Int): IndexedSeq[Action] = {
    val out = ArrayBuffer[Action](KleeneStar) // implicit leading .*
    var i = 0
    def fail(msg: String) = throw new IllegalArgumentException(
      s"sequence pattern: $msg at $i in '$pattern'")
    while (i < pattern.length) {
      if (pattern.startsWith("(?", i)) {
        i += 2
        if (i < pattern.length && pattern.charAt(i) == 't') {
          i += 1
          val op: Long => Action =
            if (pattern.startsWith("<=", i)) { i += 2; TimeLE(_) }
            else if (pattern.startsWith(">=", i)) { i += 2; TimeGE(_) }
            else if (pattern.startsWith("<", i)) { i += 1; TimeLT(_) }
            else if (pattern.startsWith(">", i)) { i += 1; TimeGT(_) }
            else fail("unknown time condition")
          val st = i
          while (i < pattern.length && pattern.charAt(i).isDigit) i += 1
          if (i == st) fail("expected number")
          out.last match {
            case SpecificEvent(_) | AnyEvent | KleeneStar => ()
            case _ => fail("time condition must follow an event condition")
          }
          out += op(pattern.substring(st, i).toLong)
        } else {
          val st = i
          while (i < pattern.length && pattern.charAt(i).isDigit) i += 1
          if (i == st) fail("expected event number")
          val n = pattern.substring(st, i).toInt
          if (n < 1 || n > condCount) fail(s"event number $n out of range")
          out += SpecificEvent(n - 1)
        }
        if (i >= pattern.length || pattern.charAt(i) != ')') fail("expected ')'")
        i += 1
      } else if (pattern.startsWith(".*", i)) { out += KleeneStar; i += 2 }
      else if (pattern.charAt(i) == '.') { out += AnyEvent; i += 1 }
      else fail("unexpected symbol")
    }
    out.toIndexedSeq
  }

  /** Direct port of the reference's backtracking match
    * (AggregateFunctionSequenceMatch.h:365-497). Returns (matched,
    * index after the match) so sequenceCount can resume scanning. */
  def matchFrom(actions: IndexedSeq[Action], ts: Array[Long],
      masks: Array[Long], start: Int): (Boolean, Int) = {
    val end = ts.length
    var actionIt = 0
    var eventsIt = start
    var baseIt = start
    // backtrack frames: (actionIt, eventsIt, baseIt)
    var stack = List.empty[(Int, Int, Int)]
    def doBacktrack(): Boolean = {
      while (stack.nonEmpty) {
        val (a, e, b) = stack.head
        stack = stack.tail
        actionIt = a; eventsIt = e + 1; baseIt = b
        if (eventsIt != end) return true
      }
      false
    }
    var iters = 0
    var break = false
    while (!break && actionIt < actions.length && eventsIt < end) {
      actions(actionIt) match {
        case SpecificEvent(n) =>
          if ((masks(eventsIt) & (1L << n)) != 0) {
            baseIt = eventsIt; actionIt += 1; eventsIt += 1
          } else if (!doBacktrack()) break = true
        case AnyEvent =>
          baseIt = eventsIt; actionIt += 1; eventsIt += 1
        case KleeneStar =>
          stack = (actionIt, eventsIt, baseIt) :: stack
          baseIt = eventsIt; actionIt += 1
        case TimeLE(s) =>
          if (ts(eventsIt) - ts(baseIt) <= s) {
            stack = (actionIt, eventsIt, baseIt) :: stack
            baseIt = eventsIt; actionIt += 1
          } else if (!doBacktrack()) break = true
        case TimeLT(s) =>
          if (ts(eventsIt) - ts(baseIt) < s) {
            stack = (actionIt, eventsIt, baseIt) :: stack
            baseIt = eventsIt; actionIt += 1
          } else if (!doBacktrack()) break = true
        case TimeGE(s) =>
          if (ts(eventsIt) - ts(baseIt) >= s) {
            stack = (actionIt, eventsIt, baseIt) :: stack
            baseIt = eventsIt; actionIt += 1
          } else {
            eventsIt += 1
            if (eventsIt == end && !doBacktrack()) break = true
          }
        case TimeGT(s) =>
          if (ts(eventsIt) - ts(baseIt) > s) {
            stack = (actionIt, eventsIt, baseIt) :: stack
            baseIt = eventsIt; actionIt += 1
          } else {
            eventsIt += 1
            if (eventsIt == end && !doBacktrack()) break = true
          }
      }
      iters += 1
      if (iters > MaxIterations) throw new IllegalStateException(
        "sequence pattern too difficult: exceeded max iterations")
    }
    // trailing actions that match the empty tail
    while (actionIt < actions.length && (actions(actionIt) match {
      case KleeneStar | TimeLE(_) | TimeLT(_) => true
      case TimeGE(s) => s == 0L
      case _ => false
    })) actionIt += 1
    if (eventsIt == start) eventsIt += 1
    (actionIt == actions.length, eventsIt)
  }
}

/** Growable (timestamp, condition-bitmask) event list. */
final class SeqEvents(
    var ts: ArrayBuffer[Long] = ArrayBuffer.empty,
    var masks: ArrayBuffer[Long] = ArrayBuffer.empty) {
  def add(t: Long, m: Long): Unit = { ts += t; masks += m }
  /** Sort by (ts, mask) — a total order, so the survivor sequence is
    * deterministic under any merge order (the reference sorts its
    * pair list the same way). */
  def sorted: (Array[Long], Array[Long]) = {
    val idx = ts.indices.sortBy(i => (ts(i), masks(i)))
    (idx.map(ts).toArray, idx.map(masks).toArray)
  }
}

abstract class SequenceAggBase[T]
    extends TypedImperativeAggregate[SeqEvents]
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  def pattern: String
  def tsExpr: Expression
  def conds: Seq[Expression]

  @transient protected lazy val actions =
    SequencePattern.parse(pattern, conds.length)

  override def inputTypes =
    LongType +: conds.map(_ => BooleanType)
  override def children: Seq[Expression] = tsExpr +: conds
  override def nullable: Boolean = false

  override def createAggregationBuffer(): SeqEvents = new SeqEvents()

  override def update(buf: SeqEvents, input: InternalRow): SeqEvents = {
    val t = tsExpr.eval(input)
    if (t != null) {
      var mask = 0L
      var i = 0
      while (i < conds.length) {
        val c = conds(i).eval(input)
        if (c != null && c.asInstanceOf[Boolean]) mask |= (1L << i)
        i += 1
      }
      buf.add(t.asInstanceOf[Long], mask)
    }
    buf
  }

  override def merge(a: SeqEvents, b: SeqEvents): SeqEvents = {
    a.ts ++= b.ts; a.masks ++= b.masks; a
  }

  override def serialize(buf: SeqEvents): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.ts.length * 16)
    bb.putInt(buf.ts.length)
    var i = 0
    while (i < buf.ts.length) { bb.putLong(buf.ts(i)); bb.putLong(buf.masks(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): SeqEvents = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new SeqEvents()
    var i = 0
    while (i < n) { buf.add(bb.getLong, bb.getLong); i += 1 }
    buf
  }
}

/** sequenceMatch('pattern')(ts, cond1, …) — 1 when the ordered event
  * sequence matches the pattern, else 0 (UInt8 in the reference). */
case class SequenceMatchAgg(
    pattern: String,
    tsExpr: Expression,
    conds: Seq[Expression],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends SequenceAggBase[Int] {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "sequence_match"

  override def eval(buf: SeqEvents): Any = {
    val (ts, masks) = buf.sorted
    if (SequencePattern.matchFrom(actions, ts, masks, 0)._1) 1 else 0
  }

  override def withNewMutableAggBufferOffset(offset: Int): SequenceMatchAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): SequenceMatchAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): SequenceMatchAgg =
    copy(tsExpr = newChildren.head, conds = newChildren.tail)
}

/** sequenceCount('pattern')(ts, cond1, …) — number of non-overlapping
  * matches, scanning left to right (the reference's count loop). */
case class SequenceCountAgg(
    pattern: String,
    tsExpr: Expression,
    conds: Seq[Expression],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends SequenceAggBase[Long] {

  override def dataType: DataType = LongType
  override def prettyName: String = "sequence_count"

  override def eval(buf: SeqEvents): Any = {
    val (ts, masks) = buf.sorted
    var count = 0L
    var it = 0
    var go = true
    while (go && it < ts.length) {
      val (ok, next) = SequencePattern.matchFrom(actions, ts, masks, it)
      if (ok) count += 1 else go = false
      it = next
    }
    count
  }

  override def withNewMutableAggBufferOffset(offset: Int): SequenceCountAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): SequenceCountAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): SequenceCountAgg =
    copy(tsExpr = newChildren.head, conds = newChildren.tail)
}
