package object graft {
  /** A named query in the driver contract: (session, scale-factor dir) ⇒ result. */
  type Q = (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame
}
