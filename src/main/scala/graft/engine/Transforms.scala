package graft.engine

import graft.model.TransformFn
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's 7 join-side transformation functions (SURVEY §2.8;
  * reference SparkExecutor.scala:196-245) as pure Column expressions.
  * Three reference bugs are deliberately fixed (SURVEY §7.4.3):
  *   - substit keeps non-matching rows (`otherwise(col)`; the reference
  *     nulls them, SparkExecutor.scala:224);
  *   - prefix/postfix concatenate correctly (SparkExecutor.scala:233,239).
  * skp(v) is row-dropping, not value-mapping, so it is exposed separately
  * via [[skipValue]].
  */
object Transforms {

  def apply(col: Column, fns: Seq[TransformFn]): Column =
    fns.filterNot(_.name == "skp").foldLeft(col)(applyOne)

  /** skp(v) values for `df.filter(col =!= v)` — applied by the star
    * compiler as a row filter (reference SparkExecutor.scala:215-218). */
  def skipValues(fns: Seq[TransformFn]): Seq[String] =
    fns.collect { case TransformFn("skp", args) => args.head }

  private def applyOne(col: Column, fn: TransformFn): Column = fn.name match {
    // try_cast: uncastable → null (reference semantics under Spark 2.4;
    // Spark 4 ANSI mode would throw on a plain cast)
    case "toInt" => col.try_cast("int")
    case "scl" =>
      // arg forms: `_+61`, `_-61`, `_*61` (inline), or `+61` / `61` (FnO)
      val a = fn.args.head.stripPrefix("_").trim
      // integral literals stay integral so int/long columns keep their type
      def num(s: String): Column =
        s.toLongOption.map(lit(_)).getOrElse(lit(s.toDouble))
      a.head match {
        case '+' => col + num(a.tail.trim)
        case '-' => col - num(a.tail.trim)
        case '*' => col * num(a.tail.trim)
        case d if d.isDigit => col + num(a)
        case other => sys.error(s"scl: unsupported operator '$other'")
      }
    case "substit" =>
      val Seq(from, to) = fn.args.take(2)
      when(col === lit(from), lit(to)).otherwise(col)
    case "replc" =>
      val Seq(from, to) = fn.args.take(2)
      // literal substring replace, not regex (the reference used
      // regexp_replace on a raw string; `replace` is the intended semantic)
      regexp_replace(col, java.util.regex.Pattern.quote(from), to)
    case "prefix" => concat(lit(fn.args.head), col)
    case "postfix" => concat(col, lit(fn.args.head))
    case "skp" => col // handled as a row filter
    case other => sys.error(s"unknown transformation '$other'")
  }
}
