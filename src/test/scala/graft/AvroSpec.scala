package graft

import org.apache.avro.Schema
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.sources.AvroIO

/** Native Avro source/sink (sources/AvroIO.scala): round-trip through
  * the engine's own writer AND a read of a file produced by the RAW
  * Avro API (an independent writer — guards against a symmetric
  * encode/decode bug cancelling out in the round-trip).
  */
class AvroSpec extends SparkSpecBase {

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("name", StringType, nullable = true),
    StructField("score", DoubleType, nullable = true),
    StructField("flag", BooleanType, nullable = false),
    StructField("payload", BinaryType, nullable = true)))

  private val rows = Seq(
    Row(1L, "alpha", 1.5, true, Array[Byte](1, 2, 3)),
    Row(2L, null, 2.25, false, null),
    Row(3L, "gamma", null, true, Array[Byte]()),
    Row(4L, "delta", -0.75, false, Array[Byte](-1, 0, 127)))

  private def canon(r: Row): (Long, String, Any, Boolean, String) =
    (r.getLong(0), String.valueOf(r.get(1)), r.get(2), r.getBoolean(3),
      Option(r.get(4)).map(_.asInstanceOf[Array[Byte]].toSeq.toString).orNull)

  test("avro round-trip preserves rows, nulls, and binary payloads") {
    val dir = java.nio.file.Files.createTempDirectory("avro_rt").toString
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    AvroIO.writeAvro(df, dir)
    assert(new java.io.File(s"$dir/_SUCCESS").exists(), "missing success marker")
    val back = AvroIO.readAvro(spark, dir)
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      schema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(back.collect().map(canon).toSet == rows.map(canon).toSet)
  }

  test("reads a container file written by the raw avro API (independent writer)") {
    val dir = java.nio.file.Files.createTempDirectory("avro_raw").toString
    val avroSchema = new Schema.Parser().parse(
      """{"type":"record","name":"ev","fields":[
        |{"name":"k","type":"long"},
        |{"name":"v","type":["null","string"],"default":null}]}""".stripMargin)
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](avroSchema))
    w.create(avroSchema, new java.io.File(s"$dir/data.avro"))
    for (i <- 1 to 100) {
      val rec = new GenericData.Record(avroSchema)
      rec.put("k", i.toLong)
      rec.put("v", if (i % 10 == 0) null else s"row$i")
      w.append(rec)
    }
    w.close()
    val df = AvroIO.readAvro(spark, dir)
    assert(df.count() == 100)
    assert(df.schema.map(f => (f.name, f.dataType, f.nullable)) ==
      Seq(("k", LongType, false), ("v", StringType, true)))
    val got = df.collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got(7L) == "row7" && got(10L) == null && got.size == 100)
  }

  test("schema evolution: a file with reordered fields resolves BY NAME, not position") {
    val dir = java.nio.file.Files.createTempDirectory("avro_evo").toString
    def write(name: String, schemaJson: String, put: GenericData.Record => Unit): Unit = {
      val sch = new Schema.Parser().parse(schemaJson)
      val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](sch))
      w.create(sch, new java.io.File(s"$dir/$name"))
      val rec = new GenericData.Record(sch); put(rec); w.append(rec); w.close()
    }
    // lexicographically FIRST file fixes the reader schema (k, v) …
    write("a_first.avro",
      """{"type":"record","name":"ev","fields":[
        |{"name":"k","type":"long"},{"name":"v","type":"string"}]}""".stripMargin,
      r => { r.put("k", 1L); r.put("v", "first") })
    // … a later producer wrote the SAME fields in the opposite order
    write("b_reordered.avro",
      """{"type":"record","name":"ev","fields":[
        |{"name":"v","type":"string"},{"name":"k","type":"long"}]}""".stripMargin,
      r => { r.put("v", "second"); r.put("k", 2L) })
    val got = AvroIO.readAvro(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    // positional decoding would crash or swap columns here
    assert(got == Set((1L, "first"), (2L, "second")), got)
  }

  test("overwrite clears stale part files from a previous wider write") {
    val dir = java.nio.file.Files.createTempDirectory("avro_ow").toString
    import spark.implicits._
    AvroIO.writeAvro(spark.range(8).toDF("id").repartition(4), dir)
    assert(new java.io.File(dir).listFiles().count(_.getName.endsWith(".avro")) == 4)
    AvroIO.writeAvro(spark.range(3).toDF("id").repartition(1), dir)
    // a non-clearing writer would leave parts 1-3 alive → 8+3 rows
    assert(AvroIO.readAvro(spark, dir).count() == 3)
  }

  test("unsupported shapes fail loudly, not silently") {
    val dir = java.nio.file.Files.createTempDirectory("avro_bad").toString
    import spark.implicits._
    val nested = Seq((1L, Seq(1, 2))).toDF("id", "xs")
    val e = intercept[Exception] { AvroIO.writeAvro(nested, dir) }
    assert(String.valueOf(e.getMessage).contains("unsupported"))
  }
}
