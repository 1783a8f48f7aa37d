package graft.types

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** The reference's type system (dtypes.py, forked from TorchArrow) as a
  * thin façade over Spark's `DataType`.
  *
  * The one semantic the reference carries that Spark does not is
  * **nullability-in-the-type**: every dtype is a frozen value with a
  * `nullable` flag and structural equality (`dtypes.py:52-65`), and
  * `with_null()` (`dtypes.py:81-82`) rebinds it. Spark keeps
  * nullability on `StructField`, so a bare `DataType` loses it; this
  * façade keeps the flag on every node and converts losslessly to and
  * from `StructField`/`StructType` schemas.
  *
  * Case objects/classes mirror `dtypes.py`: Boolean (`:112-121`),
  * Int8..Int64 (`:124-169`), Float32/Float64 (`:177-198`), String
  * (`:201-210`), Map (`:213-235`), List (`:238-262`), Struct
  * (`:265-366`). Unsigned ints are deliberately absent, as in the
  * reference (`dtypes.py:172-174`). DenseUnion/SparseUnion are
  * unsupported there too (`dtypes.py:415-439`) and have no Spark
  * equivalent.
  */
sealed trait GraftType {
  def nullable: Boolean
  /** `with_null()` (dtypes.py:81-82): same type, nullable. */
  def withNull: GraftType
  /** Inverse of [[withNull]]: same type, non-nullable. */
  def nonNull: GraftType
  /** The Spark type this façade wraps (nullability travels separately,
    * on the enclosing StructField — Spark's model).
    */
  def toSpark: DataType
}

final case class GBoolean(nullable: Boolean = false) extends GraftType {
  def withNull: GraftType = copy(nullable = true)
  def nonNull: GraftType = copy(nullable = false)
  def toSpark: DataType = BooleanType
}
final case class GInt8(nullable: Boolean = false) extends GraftType {
  def withNull: GraftType = copy(nullable = true)
  def nonNull: GraftType = copy(nullable = false)
  def toSpark: DataType = ByteType
}
final case class GInt16(nullable: Boolean = false) extends GraftType {
  def withNull: GraftType = copy(nullable = true)
  def nonNull: GraftType = copy(nullable = false)
  def toSpark: DataType = ShortType
}
final case class GInt32(nullable: Boolean = false) extends GraftType {
  def withNull: GraftType = copy(nullable = true)
  def nonNull: GraftType = copy(nullable = false)
  def toSpark: DataType = IntegerType
}
final case class GInt64(nullable: Boolean = false) extends GraftType {
  def withNull: GraftType = copy(nullable = true)
  def nonNull: GraftType = copy(nullable = false)
  def toSpark: DataType = LongType
}
final case class GFloat32(nullable: Boolean = false) extends GraftType {
  def withNull: GraftType = copy(nullable = true)
  def nonNull: GraftType = copy(nullable = false)
  def toSpark: DataType = FloatType
}
final case class GFloat64(nullable: Boolean = false) extends GraftType {
  def withNull: GraftType = copy(nullable = true)
  def nonNull: GraftType = copy(nullable = false)
  def toSpark: DataType = DoubleType
}
final case class GString(nullable: Boolean = false) extends GraftType {
  def withNull: GraftType = copy(nullable = true)
  def nonNull: GraftType = copy(nullable = false)
  def toSpark: DataType = StringType
}
/** List(item_dtype, fixed_size) (dtypes.py:238-262). `fixedSize = -1`
  * means variable length; Spark has no fixed-size array type, so the
  * flag is metadata the caller enforces (the reference checks it only
  * at construction time too).
  */
final case class GList(item: GraftType, fixedSize: Int = -1,
    nullable: Boolean = false) extends GraftType {
  def withNull: GraftType = copy(nullable = true)
  def nonNull: GraftType = copy(nullable = false)
  def toSpark: DataType = ArrayType(item.toSpark, containsNull = item.nullable)
}
/** Map(key, item, keys_sorted) (dtypes.py:213-235). The reference
  * declares Map but ships no MapColumn implementation; Spark's MapType
  * is fully usable.
  */
final case class GMap(key: GraftType, item: GraftType, keysSorted: Boolean = false,
    nullable: Boolean = false) extends GraftType {
  def withNull: GraftType = copy(nullable = true)
  def nonNull: GraftType = copy(nullable = false)
  def toSpark: DataType = MapType(key.toSpark, item.toSpark, valueContainsNull = item.nullable)
}
final case class GField(name: String, tpe: GraftType)
/** Struct(fields, is_dataframe) (dtypes.py:265-366): `isDataFrame`
  * marks the outermost frame, as the reference's flag does.
  */
final case class GStruct(fields: Seq[GField], isDataFrame: Boolean = false,
    nullable: Boolean = false) extends GraftType {
  def withNull: GraftType = copy(nullable = true)
  def nonNull: GraftType = copy(nullable = false)
  def toSpark: DataType =
    StructType(fields.map(f => StructField(f.name, f.tpe.toSpark, f.tpe.nullable)))

  /** The reference is stricter than Spark: a nullable struct requires
    * every field nullable (`dtypes.py:301-307` raises TypeError). We
    * adopt Spark's laxer semantics (outer null independent of field
    * nullability — SURVEY §1.2) but expose the reference's check for
    * code that wants bug-for-bug portability.
    */
  def validateReferenceStrict(): Unit =
    if (nullable && fields.exists(!_.tpe.nullable))
      throw new IllegalArgumentException(
        "reference semantics: nullable struct requires all fields nullable (dtypes.py:301-307)")
}

object GraftType {

  /** Lossless import of a Spark type + its field-level nullability. */
  def fromSpark(dt: DataType, nullable: Boolean = false): GraftType = dt match {
    case BooleanType => GBoolean(nullable)
    case ByteType    => GInt8(nullable)
    case ShortType   => GInt16(nullable)
    case IntegerType => GInt32(nullable)
    case LongType    => GInt64(nullable)
    case FloatType   => GFloat32(nullable)
    case DoubleType  => GFloat64(nullable)
    case StringType  => GString(nullable)
    case ArrayType(et, cn) => GList(fromSpark(et, cn), nullable = nullable)
    case MapType(kt, vt, vn) =>
      GMap(fromSpark(kt), fromSpark(vt, vn), nullable = nullable)
    case st: StructType =>
      GStruct(st.fields.toSeq.map(f => GField(f.name, fromSpark(f.dataType, f.nullable))),
        nullable = nullable)
    case other => throw new IllegalArgumentException(
      s"no reference dtype for Spark type $other (reference has no date/decimal/binary — SURVEY §1.2)")
  }

  /** The frame's schema as a reference-style dtype (is_dataframe=true,
    * nullability preserved per field).
    */
  def schemaOf(df: DataFrame): GStruct =
    fromSpark(df.schema).asInstanceOf[GStruct].copy(isDataFrame = true)

  // Predicate helpers (dtypes.py:455-582) — pattern-match sugar.
  def isInteger(t: GraftType): Boolean =
    t.isInstanceOf[GInt8] || t.isInstanceOf[GInt16] ||
      t.isInstanceOf[GInt32] || t.isInstanceOf[GInt64]
  def isFloating(t: GraftType): Boolean =
    t.isInstanceOf[GFloat32] || t.isInstanceOf[GFloat64]
  def isNumerical(t: GraftType): Boolean = isInteger(t) || isFloating(t)
  def isString(t: GraftType): Boolean = t.isInstanceOf[GString]
  def isBoolean(t: GraftType): Boolean = t.isInstanceOf[GBoolean]
  def isList(t: GraftType): Boolean = t.isInstanceOf[GList]
  def isMap(t: GraftType): Boolean = t.isInstanceOf[GMap]
  def isStruct(t: GraftType): Boolean = t.isInstanceOf[GStruct]
  def isPrimitive(t: GraftType): Boolean =
    isNumerical(t) || isString(t) || isBoolean(t)
}
