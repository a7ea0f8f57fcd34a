package graft.build

import graft.model.CorpusRow
import MultiFieldIndex.FieldSpec

/** Schema-from-config (reference surface: [R] cockatrice creates indexes
  * from a user-supplied YAML/JSON schema — `create_index(name, schema)`;
  * [R] cockatrice/schema.py instantiates field types and analyzer chains
  * from the config's dotted names).
  *
  * Our config is a JSON array of field objects (Jackson is on the public
  * Spark classpath):
  *
  * {{{
  * [{"name": "content", "source": "content"},
  *  {"name": "dirs",    "source": "path", "analyzer": "path", "boost": 2.0},
  *  {"name": "size",    "source": "content_length", "type": "numeric"}]
  * }}}
  *
  *  - `source`: which corpus column feeds the field — one of repo, path,
  *    commit, lang, content, or the derived content_length;
  *  - `type`: text (default) | numeric | datetime | boolean (FieldTypes);
  *  - `analyzer`: an AnalyzerSpec string (`standard|lower|stop(2)`,
  *    `path`, `keyword`, ...) — text fields only;
  *  - `boost`: schema-time field boost.
  */
object SchemaConfig {

  private val sources: Map[String, CorpusRow => String] = Map(
    "repo" -> (_.repo),
    "path" -> (_.path),
    "commit" -> (_.commit),
    "lang" -> (_.lang),
    "content" -> (_.content),
    "content_length" -> (r => r.content.length.toString))

  private val types: Map[String, FieldType] = Map(
    "text" -> TextType, "numeric" -> NumericType,
    "datetime" -> DatetimeType, "boolean" -> BooleanType)

  def fromJson(json: String): Seq[FieldSpec] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(json)
    require(root.isArray && root.size() > 0, "schema config must be a non-empty JSON array")
    (0 until root.size()).map { i =>
      val f = root.get(i)
      require(f.hasNonNull("name"), s"field $i: missing name")
      val name = f.get("name").asText()
      val source = if (f.hasNonNull("source")) f.get("source").asText() else name
      val extract = sources.getOrElse(source,
        sys.error(s"field $name: unknown source '$source' " +
          s"(expected one of ${sources.keys.toSeq.sorted.mkString(", ")})"))
      val ftype = if (!f.hasNonNull("type")) TextType
        else types.getOrElse(f.get("type").asText(),
          sys.error(s"field $name: unknown type '${f.get("type").asText()}'"))
      val analyzer = if (!f.hasNonNull("analyzer")) graft.analysis.AnalyzerSpec.Standard
        else graft.analysis.AnalyzerSpec.fromString(f.get("analyzer").asText())
      val boost = if (f.hasNonNull("boost")) f.get("boost").asDouble(1.0) else 1.0
      require(boost > 0.0, s"field $name: boost must be positive")
      FieldSpec(name, extract, boost, analyzer, ftype)
    }
  }
}
