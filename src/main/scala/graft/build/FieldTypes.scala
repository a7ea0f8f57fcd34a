package graft.build

/** Typed schema fields (reference surface: [R] cockatrice/schema.py /
  * [W] whoosh/fields.py declare `numeric`, `datetime`, `boolean` field
  * types with sortable byte encodings, queried via NumericRange/DateRange;
  * SURVEY.md §1.1 "Schema", §2.6).
  *
  * Spark-native representation: a typed field indexes exactly ONE term per
  * document — the value under a SORTABLE STRING ENCODING — through the
  * keyword analyzer chain. Term order == value order, so the existing
  * lexicon range scan (pushed >= / <= on the term-sorted parquet) answers
  * `field:[lo TO hi]` with zero new kernel machinery: the range expands to
  * an OR of the matching encoded terms (ascending == numeric/time order,
  * QMulti.MaxExpand-capped like every multiterm).
  *
  * Encodings (pinned):
  *  - numeric (long): 16-hex-digit offset binary — the value XOR
  *    Long.MinValue formatted %016x, so lexicographic order == signed order;
  *  - datetime: epoch millis UTC of an ISO-8601 instant (`yyyy-mm-dd` or
  *    `yyyy-mm-ddThh:mm[:ss]`, `T`/`t`/space), encoded like numeric;
  *  - boolean: "T"/"F" (accepts true/false, t/f, 1/0, yes/no).
  */
sealed trait FieldType extends Serializable
case object TextType extends FieldType
case object NumericType extends FieldType
case object DatetimeType extends FieldType
case object BooleanType extends FieldType

object FieldTypes {

  /** sortable 16-hex encoding: lexicographic == signed numeric order */
  def encodeLong(v: Long): String = f"${v ^ Long.MinValue}%016x"

  def decodeLong(s: String): Long =
    java.lang.Long.parseUnsignedLong(s, 16) ^ Long.MinValue

  /** epoch millis (UTC) of an ISO-8601-ish literal; the parser lowercases
    * range bounds, so 't'/space separators are accepted */
  def parseDatetimeMillis(raw: String): Option[Long] = {
    val s = raw.trim.replace(' ', 'T').replace('t', 'T')
    try {
      val ldt =
        if (s.length <= 10) java.time.LocalDate.parse(s).atStartOfDay()
        else java.time.LocalDateTime.parse(
          if (s.count(_ == ':') == 1) s + ":00" else s)
      Some(ldt.toInstant(java.time.ZoneOffset.UTC).toEpochMilli)
    } catch { case _: java.time.format.DateTimeParseException => None }
  }

  /** raw field/query value -> the indexed term; None = unindexable value
    * (the document simply lacks the field / the query node matches nothing) */
  def encodeValue(ft: FieldType, raw: String): Option[String] = ft match {
    case TextType     => Some(raw)
    case NumericType  => raw.trim.toLongOption.map(encodeLong)
    case DatetimeType => parseDatetimeMillis(raw).map(encodeLong)
    case BooleanType  => raw.trim.toLowerCase(java.util.Locale.ROOT) match {
      case "true" | "t" | "1" | "yes" => Some("T")
      case "false" | "f" | "0" | "no" => Some("F")
      case _                          => None
    }
  }
}
