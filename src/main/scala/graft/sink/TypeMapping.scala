package graft.sink

import java.sql.{PreparedStatement, Types}

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Spark DataType ↔ JDBC mapping for the sink's 15 supported logical
  * types, mirroring the reference's converter/type-util pair
  * (CH/table/internal/converter/ClickHouseRowConverter.java:170-229 for
  * the setter dispatch, CH/table/internal/utils/JdbcTypeUtil.java:24-72
  * for the java.sql.Types ids used by setNull). Any other type throws
  * UnsupportedOperationException, as the reference does (:227-229).
  *
  * Internal encodings line up 1:1 with Spark's (SURVEY.md §1): DATE as
  * epoch-day int, TIME as millis-of-day int (no Spark TIME type — carried
  * as IntegerType by convention), TIMESTAMP as java.sql.Timestamp,
  * DECIMAL as BigDecimal, intervals as int months / long millis.
  */
object TypeMapping {

  def jdbcType(dt: DataType): Int = dt match {
    case NullType => Types.NULL
    case BooleanType => Types.BOOLEAN
    case ByteType => Types.TINYINT
    case ShortType => Types.SMALLINT
    case IntegerType => Types.INTEGER
    case LongType => Types.BIGINT
    case FloatType => Types.FLOAT
    case DoubleType => Types.DOUBLE
    case _: DecimalType => Types.DECIMAL
    case StringType => Types.VARCHAR
    case BinaryType => Types.BINARY
    case DateType => Types.DATE
    case TimestampType | TimestampNTZType => Types.TIMESTAMP
    case _: YearMonthIntervalType => Types.INTEGER // months (converter :183-185)
    case _: DayTimeIntervalType => Types.BIGINT // millis (converter :186-188)
    case other =>
      throw new UnsupportedOperationException(s"Unsupported type: $other")
  }

  /** Positional setter for one field; null-wrapped like the reference's
    * createNullableExternalSerializer (ClickHouseRowConverter.java:149-168).
    */
  def setField(stmt: PreparedStatement, pos: Int, row: Row, idx: Int,
      dt: DataType): Unit =
    if (row.isNullAt(idx)) stmt.setNull(pos, jdbcType(dt))
    else dt match {
      case BooleanType => stmt.setBoolean(pos, row.getBoolean(idx))
      case ByteType => stmt.setByte(pos, row.getByte(idx))
      case ShortType => stmt.setShort(pos, row.getShort(idx))
      case IntegerType | _: YearMonthIntervalType =>
        stmt.setInt(pos, row.getInt(idx))
      case LongType | _: DayTimeIntervalType =>
        stmt.setLong(pos, row.getLong(idx))
      case FloatType => stmt.setFloat(pos, row.getFloat(idx))
      case DoubleType => stmt.setDouble(pos, row.getDouble(idx))
      case _: DecimalType =>
        stmt.setBigDecimal(pos, row.getDecimal(idx))
      case StringType => stmt.setString(pos, row.getString(idx))
      case BinaryType =>
        stmt.setBytes(pos, row.getAs[Array[Byte]](idx))
      case DateType => stmt.setDate(pos, row.getDate(idx))
      case TimestampType | TimestampNTZType =>
        stmt.setTimestamp(pos, row.getTimestamp(idx))
      case other =>
        throw new UnsupportedOperationException(s"Unsupported type: $other")
    }
}
