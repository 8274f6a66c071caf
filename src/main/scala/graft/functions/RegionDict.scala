package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Embedded region dictionary — the reference's geobase hierarchy
  * functions (dbms/src/Functions/FunctionsEmbeddedDictionaries.cpp:9-11;
  * Dictionaries/RegionsHierarchy.h): every region has a parent pointer
  * and a type (continent / country / district / area / city), and the
  * functions walk the parent chain. The reference loads the table from
  * a configured geobase file into flat in-RAM arrays on every server;
  * the Spark restatement keeps the same judgment — a driver-side map
  * shipped in the task closure (dictionary-sized data, never a fact
  * table), exactly like dictGet (MiscQueries.q69).
  *
  * [[RegionDict.load]] swaps in a user hierarchy; the default fixture
  * is a small synthetic geobase (25 cities / 5 areas / 3 countries /
  * 2 continents) used by tests and the q93 oracle.
  */
object RegionDict {
  // geobase region types (RegionsHierarchy.h)
  final val Continent = 1
  final val Country = 3
  final val District = 4
  final val Area = 5
  final val City = 6

  final case class Entry(parent: Long, rtype: Int)

  /** Synthetic public fixture: city 1000+k (k=0..24) → area 100+k/5 →
    * country 10+k/10 → continent 1+(k/10)%2. */
  val fixture: Map[Long, Entry] = {
    val cities = (0 until 25).map(k => (1000L + k) -> Entry(100L + k / 5, City))
    val areas = (0 until 5).map(a => (100L + a) -> Entry(10L + a / 2, Area))
    val countries = (0 until 3).map(c => (10L + c) -> Entry(1L + c % 2, Country))
    val continents = (0 until 2).map(x => (1L + x) -> Entry(0L, Continent))
    (cities ++ areas ++ countries ++ continents).toMap
  }

  @volatile private var current: Map[Long, Entry] = fixture

  def load(hierarchy: Map[Long, Entry]): Unit = { current = hierarchy }
  def reset(): Unit = { current = fixture }
  def dict: Map[Long, Entry] = current

  /** Walk the parent chain until a region of `target` type (0 when
    * the chain ends without one — the reference's convention). */
  def toType(id0: Long, target: Int): Long = {
    var id = id0
    var steps = 0
    while (id != 0 && steps < 64) {
      current.get(id) match {
        case Some(e) =>
          if (e.rtype == target) return id
          id = e.parent
        case None => return 0L
      }
      steps += 1
    }
    0L
  }

  /** The chain itself: [id, parent, ..., top] (empty for unknown). */
  def hierarchy(id0: Long): Array[Long] = {
    val out = Array.newBuilder[Long]
    var id = id0
    var steps = 0
    while (id != 0 && steps < 64 && current.contains(id)) {
      out += id
      id = current(id).parent
      steps += 1
    }
    out.result()
  }

  /** regionIn(child, ancestor): ancestor on child's chain (reflexive). */
  def isIn(child: Long, ancestor: Long): Boolean = {
    var id = child
    var steps = 0
    while (id != 0 && steps < 64) {
      if (id == ancestor) return true
      id = current.get(id).map(_.parent).getOrElse(0L)
      steps += 1
    }
    false
  }
}

/** regionToCity / regionToArea / regionToCountry / regionToContinent /
  * regionToDistrict — parent-chain walk to a fixed region type.
  * CodegenFallback: dictionary lookups are dialect surface, not a hot
  * scan path; the map rides the closure like any broadcast dict. */
case class RegionToTypeExpr(child: Expression, target: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = s"region_to_type_$target"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ByteType | ShortType | IntegerType | LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"regionTo* expects an integral id, got $t")
  }
  override protected def nullSafeEval(input: Any): Any =
    RegionDict.toType(toLong(input), target)
  private def toLong(a: Any): Long = a match {
    case l: Long => l
    case i: Int => i.toLong
    case s: Short => s.toLong
    case b: Byte => b.toLong
  }
  override protected def withNewChildInternal(newChild: Expression): RegionToTypeExpr =
    copy(child = newChild)
}

/** regionHierarchy(id) / dictGetHierarchy('regions', id). */
case class RegionHierarchyExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "region_hierarchy"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ByteType | ShortType | IntegerType | LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"regionHierarchy expects an integral id, got $t")
  }
  override protected def nullSafeEval(input: Any): Any = {
    val id = input match {
      case l: Long => l
      case i: Int => i.toLong
      case s: Short => s.toLong
      case b: Byte => b.toLong
    }
    new GenericArrayData(RegionDict.hierarchy(id))
  }
  override protected def withNewChildInternal(newChild: Expression): RegionHierarchyExpr =
    copy(child = newChild)
}

/** regionIn(child, ancestor) / dictIsIn('regions', child, ancestor) —
  * UInt8 result per the reference's boolean convention. */
case class RegionInExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "region_in"
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ByteType | ShortType | IntegerType | LongType,
            ByteType | ShortType | IntegerType | LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"regionIn expects integral ids, got ($l, $r)")
    }
  override def nullSafeEval(l: Any, r: Any): Any = {
    def toLong(a: Any): Long = a match {
      case x: Long => x
      case x: Int => x.toLong
      case x: Short => x.toLong
      case x: Byte => x.toLong
    }
    if (RegionDict.isIn(toLong(l), toLong(r))) 1 else 0
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RegionInExpr =
    copy(left = newLeft, right = newRight)
}
