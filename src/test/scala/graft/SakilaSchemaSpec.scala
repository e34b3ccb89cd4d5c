package graft

import graft.medallion.Medallion
import graft.sakila.{SakilaPipeline, SakilaSchema}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Full 15-table bronze ingest against the explicit schema registry: every
  * Sakila table the reference lands in bronze (kafka_to_bronze.py:115-121)
  * round-trips writeBronze → readBronze with its registry StructType, and
  * the 4 silver cleaners accept the registry-parsed frames.
  */
class SakilaSchemaSpec extends SparkSpec {

  private val clock = "2026-02-01 08:00:00"

  /** Synthetic rows honoring the arrival conventions the registry
    * documents (temporals + DECIMALs as strings, ints as numbers). */
  private def sampleDf(schema: StructType, n: Int): DataFrame = {
    def value(f: StructField, idx: Int): Any = f.dataType match {
      case IntegerType => idx
      case StringType =>
        if (f.name.endsWith("date") || f.name == "last_update")
          s"2026-01-1$idx 12:00:0$idx"
        else if (f.name == "amount" || f.name == "rental_rate"
          || f.name == "replacement_cost") s"$idx.99"
        else s"${f.name}_$idx"
      case other => fail(s"unhandled arrival type $other for ${f.name}")
    }
    val rows = (1 to n).map(idx => Row.fromSeq(schema.fields.toSeq.map(value(_, idx))))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
  }

  test("all 15 tables round-trip bronze with their registry schema") {
    assert(SakilaSchema.tables.size === 15)
    assert(SakilaSchema.tables.keySet === SakilaSchema.primaryKeys.keySet)
    val root = new java.io.File("target/tmp/sakila_schema_spec").getAbsolutePath
    SakilaSchema.tables.foreach { case (name, schema) =>
      val src = sampleDf(schema, 3)
      val path = Medallion.writeBronze(src, name, clock, root)
      val back = Medallion.readBronze(spark, path, schema)
      // parsed data.* fields must carry exactly the registry types
      val dataFields = back.schema.fields.filter(_.name != "_op").toSeq
      assert(dataFields === schema.fields.toSeq, s"schema drift for $name")
      // values survive the JSON envelope bit-for-bit
      val pk = SakilaSchema.primaryKeys(name).map(col)
      val a = src.orderBy(pk: _*).collect().toSeq
      val b = back.drop("_op").select(schema.fieldNames.map(col): _*)
        .orderBy(pk: _*).collect().toSeq
      assert(a === b, s"value drift for $name")
    }
  }

  test("the 4 silver cleaners accept registry-parsed bronze frames") {
    val root = new java.io.File("target/tmp/sakila_schema_silver").getAbsolutePath
    def bronzeOf(name: String): DataFrame = {
      val src = sampleDf(SakilaSchema.tables(name), 3)
      val path = Medallion.writeBronze(src, name, clock, root)
      // cleaners expect the enveloped frame (they select data.*)
      spark.read.text(path)
        .select(from_json(col("value"),
          Medallion.envelopeSchema(SakilaSchema.tables(name))).as("env"))
        .select(col("env.*"))
    }
    val cust = SakilaPipeline.cleanCustomer(bronzeOf("customer"), clock)
    assert(cust.count() === 3)
    assert(cust.schema("create_date").dataType === TimestampType)
    val film = SakilaPipeline.cleanFilm(bronzeOf("film"), clock)
    assert(film.count() === 3)
    assert(film.schema("rental_rate").dataType === DoubleType)
    val pay = SakilaPipeline.cleanPayment(bronzeOf("payment"), clock)
    assert(pay.count() === 3)
    assert(pay.schema("amount").dataType === DoubleType)
    val rent = SakilaPipeline.cleanRental(bronzeOf("rental"), clock)
    assert(rent.count() === 3)
    assert(rent.schema("return_date").dataType === TimestampType)
  }
}
