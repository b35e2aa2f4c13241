package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.json4s._

/** `$jslt` / `$jq` stages (Jslt.java:18-36, Jq.java:16-33, harness
  * Script.java:28-95). The spec is a string: `resource:/x` loads a classpath
  * resource, an existing file path loads that file, anything else is the
  * inline script (the reference behaves the same through
  * `net.pincette.json.Jslt.tryReader`).
  *
  * Both scripts compile to Catalyst `Column`s against the input schema
  * ([[JsltCompiler]]/[[JqCompiler]]) — the transform is ordinary projection
  * (and for top-level jq `select`, a filter), fully codegen'd and
  * pushdown-friendly, instead of a per-row script engine behind a UDF.
  *
  * Re-key rule (Script.java:71-73): if the result has a string `_id` it
  * becomes the new key, else the key is unchanged.
  */
object ScriptStages {

  private[graft] def scriptSource(spec: JValue): String = spec match {
    case JString(s) if s.startsWith("resource:") =>
      val path = s.stripPrefix("resource:")
      val in = getClass.getResourceAsStream(path)
      if (in == null) throw new IllegalArgumentException(s"no such resource: $path")
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    case JString(s) if java.nio.file.Files.isRegularFile(java.nio.file.Paths.get(s)) =>
      new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s)), "UTF-8")
    case JString(s) => s
    case other => throw new IllegalArgumentException(s"script spec must be a string: $other")
  }

  private def docSchema(df: DataFrame): StructType =
    StructType(df.schema.filter(_.name != "key"))

  /** Expand the result struct into the new document columns + re-key. */
  private def emit(df: DataFrame, doc: org.apache.spark.sql.Column): DataFrame = {
    val hasKey = df.columns.contains("key")
    val withRes = df.select(
      (if (hasKey) Seq(col("key")) else Nil) :+ doc.as("__doc"): _*)
    val resType = withRes.schema("__doc").dataType match {
      case st: StructType => st
      case other => throw new IllegalArgumentException(
        s"$$jslt/$$jq must produce an object in this implementation; " +
          s"the script's top-level result is ${other.simpleString} " +
          "(the reference logs a script error per Script.java:40-55)")
    }
    val newKey =
      if (hasKey && resType.exists(f => f.name == "_id" && f.dataType == StringType))
        coalesce(col("__doc").getField("_id"), col("key")).as("key")
      else if (hasKey) col("key").as("key")
      else lit(null) // dropped below
    val cols = (if (hasKey) Seq(newKey) else Nil) ++
      resType.fieldNames.map(f => col("__doc").getField(f).as(f))
    withRes.select(cols: _*)
  }

  def jslt(df: DataFrame, spec: JValue): DataFrame = {
    val tc = JsltCompiler.compileProgram(scriptSource(spec), docSchema(df))
    emit(df, tc.col)
  }

  def jq(df: DataFrame, spec: JValue): DataFrame = {
    val compiled = JqCompiler.compileProgram(scriptSource(spec), docSchema(df))
    val filtered = compiled.keep.map(df.filter).getOrElse(df)
    emit(filtered, compiled.doc.col)
  }
}
