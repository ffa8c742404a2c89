package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import graft.sources.{GraftCatalog, GraftDeletes, GraftParquetWrite}

/** The cached per-session Hadoop conf ([[GraftParquetWrite.sessionConf]])
  * is SHARED and must stay read-only. The one plausible mutator is
  * parquet's `GroupWriteSupport.setSchema(conf)` during metadata-writer
  * construction (snapshot/manifest/DV/schema-carrier writers all build
  * `ExampleParquetWriter`s) — if it wrote through to the shared conf, two
  * concurrent driver-side commits could interleave setSchema/init and
  * persist metadata under the WRONG schema.
  *
  * It does not write through: parquet 1.16's `ParquetWriter.Builder.build()`
  * allocates its own fresh `HadoopParquetConfiguration` when `withConf` was
  * never called (the conf inside `HadoopOutputFile` is used for filesystem
  * access only), so `setSchema` lands on a builder-private conf. This spec
  * pins that contract against parquet upgrades: exercise every driver-side
  * metadata writer, then assert the shared conf carries no schema key.
  */
class SessionConfIsolationSpec extends SparkSpec {

  private val fmt = "graft.sources.GraftParquetTableProvider"
  private val SchemaKey = "parquet.example.schema"

  private def tmp(name: String): String = {
    val d = Files.createTempDirectory(s"graft_confiso_$name").toFile
    d.delete()
    d.getAbsolutePath
  }

  test("metadata writer construction never mutates the shared session conf") {
    spark.sparkContext // force the lazy session so sessionConf caches it
    val shared = GraftParquetWrite.sessionConf()
    assert(shared.get(SchemaKey) == null,
      "precondition: shared conf already carries a writer schema")

    // 1) table write → snapshot writer (logSchema) + manifest writer
    //    (manifestSchema) both build against driver-side confs
    val dir = tmp("write")
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "source", "lang", "n_chars")
      .limit(50).coalesce(1)
      .write.format(fmt).option("path", dir).mode("append").save()

    // 2) schema carrier (dataless DDL path — GraftCatalog writer)
    val carrierDir = tmp("carrier")
    new java.io.File(carrierDir).mkdirs()
    GraftCatalog.commitSchemaCarrier(carrierDir,
      StructType(Seq(StructField("k", LongType),
        StructField("v", StringType))), shared)

    // 3) DV writer (dvSchema)
    val dvOut = new org.apache.hadoop.fs.Path(tmp("dv"), "dv.parquet")
    val (w, factory) = GraftDeletes.openDvWriter(dvOut, shared)
    val g = factory.newGroup()
    g.add(0, "part-00000.parquet"); g.add(1, 3L)
    w.write(g); w.close()

    // three DIFFERENT schemas went through writer construction against
    // (or alongside) the shared conf — none may have written through
    assert(GraftParquetWrite.sessionConf().get(SchemaKey) == null,
      "shared session conf was mutated by a parquet writer builder — " +
        "concurrent driver-side commits could persist wrong-schema metadata")
    assert(shared eq GraftParquetWrite.sessionConf(),
      "session conf cache no longer returns the same instance")

    // and the table written in step 1 still reads back coherently
    assert(spark.read.format(fmt).option("path", dir).load().count() == 50)
  }
}
