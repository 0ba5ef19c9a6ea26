package graft.sink

import org.apache.spark.sql.Row
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType

/** SQL three-valued evaluation of data-source [[Filter]]s against the
  * memory endpoint's buffered external rows — the row-level half of the
  * mutation surface (DELETE WHERE / overwrite-by-filter): a mutation
  * applies to rows where the condition is TRUE; NULL/unknown rows
  * survive, exactly as the server-side `ALTER TABLE … DELETE WHERE`
  * would leave them.
  *
  * `supports` is the plan-time gate: a filter shape or type pairing the
  * evaluator cannot decide makes the whole mutation refuse up front
  * (canDeleteWhere false → analysis error) — never a silent partial
  * mutation.
  */
object RowFilterEval {

  def supports(f: Filter, schema: StructType): Boolean = {
    def col(a: String): Boolean = schema.fieldNames.contains(a)
    f match {
      case EqualTo(a, _) => col(a)
      case EqualNullSafe(a, _) => col(a)
      case GreaterThan(a, _) => col(a)
      case GreaterThanOrEqual(a, _) => col(a)
      case LessThan(a, _) => col(a)
      case LessThanOrEqual(a, _) => col(a)
      case In(a, _) => col(a)
      case IsNull(a) => col(a)
      case IsNotNull(a) => col(a)
      case StringStartsWith(a, _) => col(a)
      case StringEndsWith(a, _) => col(a)
      case StringContains(a, _) => col(a)
      case And(l, r) => supports(l, schema) && supports(r, schema)
      case Or(l, r) => supports(l, schema) && supports(r, schema)
      case Not(c) => supports(c, schema)
      case AlwaysTrue() => true
      case AlwaysFalse() => true
      case _ => false
    }
  }

  /** Compare with numeric widening (a literal Integer against a Long
    * column must not miscompare); floating comparisons go through
    * double, integral through long, everything else through Comparable
    * of the same class. None = incomparable (treated as unknown).
    */
  private def cmp(a: Any, b: Any): Option[Int] = (a, b) match {
    case (x: java.lang.Number, y: java.lang.Number)
      if x.isInstanceOf[java.lang.Double] ||
         x.isInstanceOf[java.lang.Float] ||
         y.isInstanceOf[java.lang.Double] ||
         y.isInstanceOf[java.lang.Float] =>
      Some(java.lang.Double.compare(x.doubleValue, y.doubleValue))
    case (x: java.lang.Number, y: java.lang.Number) =>
      Some(java.lang.Long.compare(x.longValue, y.longValue))
    case (x: Comparable[_], y) if x.getClass.isInstance(y) =>
      Some(x.asInstanceOf[Comparable[Any]].compareTo(y))
    case _ => None
  }

  /** Three-valued: Some(true/false) or None for NULL/unknown. */
  def eval(f: Filter, row: Row, schema: StructType): Option[Boolean] = {
    def v(attr: String): Any = row.get(schema.fieldIndex(attr))
    def compare(attr: String, lit: Any, ok: Int => Boolean):
        Option[Boolean] = {
      val x = v(attr)
      if (x == null || lit == null) None
      else cmp(x, lit).map(ok)
    }
    f match {
      case EqualTo(a, l) => compare(a, l, _ == 0)
      case EqualNullSafe(a, null) => Some(v(a) == null)
      case EqualNullSafe(a, l) =>
        if (v(a) == null) Some(false) else compare(a, l, _ == 0)
      case GreaterThan(a, l) => compare(a, l, _ > 0)
      case GreaterThanOrEqual(a, l) => compare(a, l, _ >= 0)
      case LessThan(a, l) => compare(a, l, _ < 0)
      case LessThanOrEqual(a, l) => compare(a, l, _ <= 0)
      case In(a, ls) =>
        if (v(a) == null) None
        else {
          val hits = ls.toSeq.map(l =>
            if (l == null) None else cmp(v(a), l).map(_ == 0))
          if (hits.contains(Some(true))) Some(true)
          else if (hits.contains(None)) None
          else Some(false)
        }
      case IsNull(a) => Some(v(a) == null)
      case IsNotNull(a) => Some(v(a) != null)
      case StringStartsWith(a, p) => v(a) match {
        case null => None
        case s: String => Some(s.startsWith(p))
        case _ => None
      }
      case StringEndsWith(a, p) => v(a) match {
        case null => None
        case s: String => Some(s.endsWith(p))
        case _ => None
      }
      case StringContains(a, p) => v(a) match {
        case null => None
        case s: String => Some(s.contains(p))
        case _ => None
      }
      case And(l, r) =>
        (eval(l, row, schema), eval(r, row, schema)) match {
          case (Some(false), _) | (_, Some(false)) => Some(false)
          case (Some(true), Some(true)) => Some(true)
          case _ => None
        }
      case Or(l, r) =>
        (eval(l, row, schema), eval(r, row, schema)) match {
          case (Some(true), _) | (_, Some(true)) => Some(true)
          case (Some(false), Some(false)) => Some(false)
          case _ => None
        }
      case Not(c) => eval(c, row, schema).map(!_)
      case AlwaysTrue() => Some(true)
      case AlwaysFalse() => Some(false)
      case _ => None
    }
  }

  /** TRUE under ALL filters (the mutation's AND semantics). */
  def matchesAll(filters: Seq[Filter], row: Row,
      schema: StructType): Boolean =
    filters.forall(f => eval(f, row, schema).contains(true))
}
