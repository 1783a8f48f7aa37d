package graft

import org.apache.spark.sql.types._

import graft.types._

/** The reference type-system façade (dtypes.py ↔ Spark DataType):
  * nullable-in-type round-trips, structural equality, with_null, the
  * strict nullable-struct rule, predicate helpers (SURVEY §1.2).
  */
class TypesSpec extends SparkSpec {

  test("schema round-trip preserves nullability per field") {
    import spark.implicits._
    val df = Seq((1L, "a", Some(1.5)), (2L, "b", None)).toDF("i", "s", "d")
    val g = GraftType.schemaOf(df)
    assert(g.isDataFrame)
    assert(g.toSpark == df.schema)
    // re-import of the exported schema is identity (structural equality,
    // dtypes.py:52-56 — frozen dataclass semantics)
    assert(GraftType.fromSpark(g.toSpark) == g.copy(isDataFrame = false))
  }

  test("with_null/nonNull rebind the flag without changing the type") {
    val t = GInt64()
    assert(!t.nullable && t.withNull.nullable)           // dtypes.py:81-82
    assert(t.withNull.nonNull == t)
    assert(t.withNull.toSpark == LongType)               // Spark type unchanged
    val l = GList(GFloat32(), fixedSize = 64)
    assert(l.withNull.asInstanceOf[GList].fixedSize == 64)
  }

  test("nested list/map/struct conversion keeps element nullability") {
    val g = GStruct(Seq(
      GField("xs", GList(GInt64(nullable = true))),
      GField("m", GMap(GString(), GFloat64(nullable = true)))))
    val s = g.toSpark.asInstanceOf[StructType]
    assert(s("xs").dataType == ArrayType(LongType, containsNull = true))
    assert(s("m").dataType == MapType(StringType, DoubleType, valueContainsNull = true))
    assert(GraftType.fromSpark(s) == g)
  }

  test("reference strict rule: nullable struct requires all-nullable fields") {
    // dtypes.py:301-307 raises; Spark semantics are laxer, the check is opt-in
    val bad = GStruct(Seq(GField("a", GInt32())), nullable = true)
    intercept[IllegalArgumentException](bad.validateReferenceStrict())
    GStruct(Seq(GField("a", GInt32(nullable = true))), nullable = true)
      .validateReferenceStrict()  // no throw
  }

  test("predicate helpers match dtypes.py:455-582 families") {
    import GraftType._
    assert(isInteger(GInt8()) && isInteger(GInt64()) && !isInteger(GFloat32()))
    assert(isFloating(GFloat64()) && isNumerical(GInt16()) && isNumerical(GFloat32()))
    assert(isString(GString()) && isPrimitive(GBoolean()) && !isPrimitive(GList(GInt32())))
    assert(isList(GList(GInt32())) && isMap(GMap(GString(), GInt32())) &&
      isStruct(GStruct(Nil)))
  }

  test("types the reference lacks are rejected with a pointer") {
    intercept[IllegalArgumentException](GraftType.fromSpark(DateType))
  }
}
