package graft.dict

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.collection.mutable

final case class DictEntry(titleName: Option[String], otherTitles: Option[Vector[String]])

/** The bundled BLS occupational-title dictionary.
  *
  * Mirrors the reference's compile-time-embedded JSON
  * (`include_str!`, `/root/reference/src/utils.rs:28,198`): the JSON ships
  * inside our jar as a classpath resource, so every executor JVM can load
  * it locally — no broadcast or distributed read needed for a <1 MB static
  * dictionary. Loaded once per JVM via lazy vals.
  *
  * Semantics reproduced exactly:
  *  - `corpus`: flattened `other_titles` in JSON order; entries missing
  *    `other_titles` are skipped (`/root/reference/src/utils.rs:27-37`).
  *  - `aliasToCategory`: every entry's `other_titles ∪ {title_name}` →
  *    `title_name`, later JSON entries win for ambiguous aliases
  *    (`/root/reference/src/utils.rs:201-221`); built ONCE here instead of
  *    per-output-row (the reference re-parses the JSON per row — a known
  *    defect we deliberately do not reproduce, SURVEY.md §3).
  */
object TitleDictionary extends Serializable {

  lazy val entries: Vector[DictEntry] = {
    val in = getClass.getResourceAsStream("/standarized_titles.json")
    require(in != null, "standarized_titles.json missing from classpath")
    try {
      val root: JsonNode = new ObjectMapper().readTree(in)
      require(root.isArray, "dictionary JSON must be an array")
      val buf = Vector.newBuilder[DictEntry]
      root.forEach { node =>
        val name =
          if (node.hasNonNull("title_name") && node.get("title_name").isTextual)
            Some(node.get("title_name").asText())
          else None
        val titles =
          if (node.has("other_titles") && node.get("other_titles").isArray) {
            val b = Vector.newBuilder[String]
            node.get("other_titles").forEach { t => if (t.isTextual) b += t.asText() }
            Some(b.result())
          } else None
        buf += DictEntry(name, titles)
      }
      buf.result()
    } finally in.close()
  }

  /** Match corpus: flattened other_titles, JSON order. */
  lazy val corpus: Array[String] =
    entries.iterator.flatMap(_.otherTitles.getOrElse(Vector.empty)).toArray

  /** alias → BLS category, last JSON entry wins for ambiguous aliases. */
  lazy val aliasToCategory: Map[String, String] = {
    val m = mutable.LinkedHashMap.empty[String, String]
    entries.foreach { e =>
      e.titleName.foreach { name =>
        e.otherTitles.getOrElse(Vector.empty).foreach(t => m.update(t, name))
        m.update(name, name)
      }
    }
    m.toMap
  }

  /** Unknown alias → identity (`/root/reference/src/utils.rs:223-226`). */
  def categoryOf(alias: String): String = aliasToCategory.getOrElse(alias, alias)
}
