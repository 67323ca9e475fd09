package graft.text

import java.util.regex.Pattern

/** Tokenization with reference parity.
  *
  * The reference tokenizes with the Rust regex `\w+` (Unicode word chars)
  * and ASCII-lowercases each match (`/root/reference/src/utils.rs:16,43-50`).
  * Java's `\w` is ASCII-only by default, so we compile with
  * UNICODE_CHARACTER_CLASS to match Rust's default-Unicode `\w`.
  */
object Tokenize extends Serializable {

  private val WordRe: Pattern =
    Pattern.compile("\\w+", Pattern.UNICODE_CHARACTER_CLASS)

  /** Rust `str::to_ascii_lowercase`: only ASCII A-Z are lowered. */
  def asciiLower(s: String): String = {
    var i = 0
    var needs = false
    while (i < s.length && !needs) {
      val c = s.charAt(i)
      if (c >= 'A' && c <= 'Z') needs = true else i += 1
    }
    if (!needs) s
    else {
      val arr = s.toCharArray
      var j = i
      while (j < arr.length) {
        val c = arr(j)
        if (c >= 'A' && c <= 'Z') arr(j) = (c + 32).toChar
        j += 1
      }
      new String(arr)
    }
  }

  def tokenize(text: String): Array[String] = {
    val m = WordRe.matcher(text)
    val buf = scala.collection.mutable.ArrayBuffer.empty[String]
    while (m.find()) buf += asciiLower(m.group())
    buf.toArray
  }

  /** Per-JVM stem memo. Corpus token frequencies are Zipf — a few tens
    * of thousands of distinct tokens cover almost every occurrence — so
    * memoizing the (pure) stem computation turns the dominant per-row
    * UDF cost into a hash probe. Bounded: lookups always happen, inserts
    * stop at the cap, so a pathological unique-token stream degrades to
    * the uncached path instead of growing the heap. Thread-safe for the
    * multi-task executor JVM. */
  private val StemMemo = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val StemMemoCap = 1 << 17

  private def stemMemo(tok: String): String = {
    val hit = StemMemo.get(tok)
    if (hit != null) hit
    else {
      val s = EnglishStemmer.stem(tok)
      if (StemMemo.size < StemMemoCap) StemMemo.putIfAbsent(tok, s)
      s
    }
  }

  /** tokenize → ASCII-lowercase → Snowball-English stem, per token. */
  def tokenizeAndStem(text: String): Array[String] = {
    val t = tokenize(text)
    var i = 0
    while (i < t.length) { t(i) = stemMemo(t(i)); i += 1 }
    t
  }
}
