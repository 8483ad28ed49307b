package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** RDF N-Triples → one wide typed DataFrame per rdf:type class — the
  * capability of the reference's NTtoDF.java:39-388, re-expressed as a
  * declarative two-pass plan instead of RDD groupByKey chains:
  *   pass 1 (schema): distinct (predicate, xsd-type, repeated?) triples;
  *   pass 2 (rows): one conditional aggregate per predicate column
  *     (single shuffle on subject; no pivot string round-trips).
  * Contract kept from the reference: repeated property ⇒ ArrayType,
  * typed literal ⇒ typed column, `id` column = subject IRI.
  */
object NtSource {

  private val TypeIri = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

  private val XsdToSpark: Map[String, DataType] = Map(
    "http://www.w3.org/2001/XMLSchema#integer" -> IntegerType,
    "http://www.w3.org/2001/XMLSchema#int" -> IntegerType,
    "http://www.w3.org/2001/XMLSchema#long" -> LongType,
    "http://www.w3.org/2001/XMLSchema#double" -> DoubleType,
    "http://www.w3.org/2001/XMLSchema#decimal" -> DoubleType,
    "http://www.w3.org/2001/XMLSchema#boolean" -> BooleanType,
    "http://www.w3.org/2001/XMLSchema#dateTime" -> TimestampType,
    "http://www.w3.org/2001/XMLSchema#date" -> DateType)

  /** Parsed triple columns (s, p, o, dt) from raw NT lines. Object is an
    * IRI, a plain literal, or a typed literal `"lex"^^<dt>`. */
  private def parseTriples(spark: SparkSession, path: String): DataFrame = {
    val line = spark.read.text(path).filter(length(trim(col("value"))) > 0)
    val s = regexp_extract(col("value"), "^\\s*<([^>]+)>", 1)
    val p = regexp_extract(col("value"), "^\\s*<[^>]+>\\s+<([^>]+)>", 1)
    val rest = regexp_extract(col("value"), "^\\s*<[^>]+>\\s+<[^>]+>\\s+(.+?)\\s*\\.\\s*$", 1)
    line.select(s.as("s"), p.as("p"), rest.as("o_raw"))
      .filter(col("s") =!= "" && col("p") =!= "")
      .select(col("s"), col("p"),
        when(col("o_raw").startsWith("<"),
          regexp_extract(col("o_raw"), "^<([^>]+)>", 1))
          .otherwise(regexp_extract(col("o_raw"), "^\"((?:[^\"\\\\]|\\\\.)*)\"", 1))
          .as("o"),
        regexp_extract(col("o_raw"), "\\^\\^<([^>]+)>", 1).as("dt"))
  }

  private def localName(iri: String): String = {
    val cut = math.max(iri.lastIndexOf('/'), iri.lastIndexOf('#'))
    iri.substring(cut + 1)
  }

  /** Read all subjects of `classIri` into one wide typed table. */
  def read(spark: SparkSession, path: String, classIri: String): DataFrame = {
    val triples = parseTriples(spark, path)
    val members = triples
      .filter(col("p") === TypeIri && col("o") === classIri)
      .select(col("s")).distinct()
    val own = triples.filter(col("p") =!= TypeIri)
      .join(members, "s") // broadcast or SMJ — Catalyst/AQE decides

    // pass 1: schema discovery (collects one row per predicate — small)
    val predInfo = own
      .groupBy(col("s"), col("p"))
      .agg(count(lit(1)).as("cnt"), max(col("dt")).as("sdt"))
      .groupBy(col("p"))
      .agg(max(col("sdt")).as("dt"), max(col("cnt")).as("maxPerSubject"))
      .collect()

    val columns: Seq[Column] = predInfo.sortBy(_.getString(0)).map { r =>
      val pred = r.getString(0)
      val dt = Option(r.getString(1)).filter(_.nonEmpty)
      val repeated = r.getLong(2) > 1
      val sparkType = dt.flatMap(XsdToSpark.get).getOrElse(StringType)
      val typedVal = when(col("p") === pred, col("o").cast(sparkType))
      val c =
        if (repeated) sort_array(collect_list(typedVal))
        else first(typedVal, ignoreNulls = true)
      c.as(localName(pred))
    }.toSeq

    own.groupBy(col("s").as("id")).agg(columns.head, columns.tail: _*)
  }
}
