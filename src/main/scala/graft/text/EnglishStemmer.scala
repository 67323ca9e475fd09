package graft.text

/** Snowball "English" (Porter2) stemmer.
  *
  * Implemented from the published algorithm description at
  * snowballstem.org/algorithms/english/stemmer.html (public algorithm).
  * Behavioral-parity target: the `rust-stemmers` `Algorithm::English`
  * stemmer used by the reference (`/root/reference/src/utils.rs:17,47`),
  * which is generated from the same Snowball source.
  *
  * Input is expected lowercase (the tokenizer ASCII-lowercases first, as
  * the reference does at `/root/reference/src/utils.rs:46`); any
  * non-[aeiouy] character (digits, underscore, non-ASCII) is treated as a
  * consonant, matching Snowball semantics.
  */
object EnglishStemmer extends Serializable {

  private val Exception1: Map[String, String] = Map(
    "skis" -> "ski", "skies" -> "sky", "dying" -> "die", "lying" -> "lie",
    "tying" -> "tie", "idly" -> "idl", "gently" -> "gentl", "ugly" -> "ugli",
    "early" -> "earli", "only" -> "onli", "singly" -> "singl",
    // invariants
    "sky" -> "sky", "news" -> "news", "howe" -> "howe", "atlas" -> "atlas",
    "cosmos" -> "cosmos", "bias" -> "bias", "andes" -> "andes")

  private val Exception2: Set[String] = Set(
    "inning", "outing", "canning", "herring", "earring",
    "proceed", "exceed", "succeed")

  // bb dd ff gg mm nn pp rr tt
  private def isDoubleChar(c: Char): Boolean = c match {
    case 'b' | 'd' | 'f' | 'g' | 'm' | 'n' | 'p' | 'r' | 't' => true
    case _ => false
  }

  private def isLiEnding(c: Char): Boolean = c match {
    case 'c' | 'd' | 'e' | 'g' | 'h' | 'k' | 'm' | 'n' | 'r' | 't' => true
    case _ => false
  }

  // 'Y' (the marked consonant-y) is NOT a vowel; lowercase y is.
  private def isVowel(c: Char): Boolean = c match {
    case 'a' | 'e' | 'i' | 'o' | 'u' | 'y' => true
    case _ => false
  }

  /** Start of the region after the first non-vowel following a vowel,
    * scanning from `from`; length if none. */
  private def regionStart(w: CharSequence, from: Int): Int = {
    var i = from
    val n = w.length
    while (i < n && !isVowel(w.charAt(i))) i += 1
    while (i < n && isVowel(w.charAt(i))) i += 1
    if (i < n) i + 1 else n
  }

  /** w[0:end) ends in a short syllable. */
  private def endsInShortSyllable(w: CharSequence, end: Int): Boolean = {
    if (end >= 3) {
      val c3 = w.charAt(end - 3); val c2 = w.charAt(end - 2); val c1 = w.charAt(end - 1)
      !isVowel(c3) && isVowel(c2) && !isVowel(c1) && c1 != 'w' && c1 != 'x' && c1 != 'Y'
    } else if (end == 2) {
      isVowel(w.charAt(0)) && !isVowel(w.charAt(1))
    } else false
  }

  private def containsVowel(w: CharSequence, from: Int, until: Int): Boolean = {
    var i = from
    while (i < until) { if (isVowel(w.charAt(i))) return true; i += 1 }
    false
  }

  def stem(wordIn: String): String = {
    // exception1 is checked before the length guard (snowball: `exception1 or not hop 3 or ...`)
    Exception1.get(wordIn) match {
      case Some(out) => return out
      case None =>
    }
    if (wordIn.length < 3) return wordIn

    // ---- prelude: strip one leading apostrophe; mark consonant-y as 'Y'
    var w: String = if (wordIn.charAt(0) == '\'') wordIn.substring(1) else wordIn
    if (w.length < 3) return w
    var yFound = false
    locally {
      val arr = w.toCharArray
      var i = 0
      while (i < arr.length) {
        if (arr(i) == 'y' && (i == 0 || isVowel(arr(i - 1)))) { arr(i) = 'Y'; yFound = true }
        i += 1
      }
      if (yFound) w = new String(arr)
    }

    // ---- mark regions (positions are fixed for the rest of the run)
    val r1: Int = {
      val special = List("gener", "commun", "arsen").find(w.startsWith)
      special match {
        case Some(p) => p.length
        case None => regionStart(w, 0)
      }
    }
    val r2: Int = regionStart(w, r1)
    @inline def inR1(suffixStart: Int): Boolean = suffixStart >= r1
    @inline def inR2(suffixStart: Int): Boolean = suffixStart >= r2

    // ---- step 0: longest of  '  's  's'
    if (w.endsWith("'s'")) w = w.substring(0, w.length - 3)
    else if (w.endsWith("'s")) w = w.substring(0, w.length - 2)
    else if (w.endsWith("'")) w = w.substring(0, w.length - 1)

    // ---- step 1a
    if (w.endsWith("sses")) {
      w = w.substring(0, w.length - 2) // sses -> ss
    } else if (w.endsWith("ied") || w.endsWith("ies")) {
      // replace by i if preceded by more than one letter, else by ie
      w = if (w.length - 3 > 1) w.substring(0, w.length - 2) else w.substring(0, w.length - 1)
    } else if (w.endsWith("us") || w.endsWith("ss")) {
      // do nothing
    } else if (w.endsWith("s")) {
      // delete if the preceding word part contains a vowel not immediately before the s
      if (containsVowel(w, 0, w.length - 2)) w = w.substring(0, w.length - 1)
    }

    if (Exception2.contains(w)) return w

    // ---- step 1b
    {
      val len = w.length
      if (w.endsWith("eedly")) {
        if (inR1(len - 5)) w = w.substring(0, len - 3) // eedly -> ee
      } else if (w.endsWith("eed")) {
        if (inR1(len - 3)) w = w.substring(0, len - 1) // eed -> ee
      } else {
        val sufLen =
          if (w.endsWith("ingly")) 5
          else if (w.endsWith("edly")) 4
          else if (w.endsWith("ing")) 3
          else if (w.endsWith("ed")) 2
          else 0
        if (sufLen > 0 && containsVowel(w, 0, w.length - sufLen)) {
          w = w.substring(0, w.length - sufLen)
          if (w.endsWith("at") || w.endsWith("bl") || w.endsWith("iz")) w = w + "e"
          else if (w.length >= 2 && w.charAt(w.length - 1) == w.charAt(w.length - 2) &&
                   isDoubleChar(w.charAt(w.length - 1))) w = w.substring(0, w.length - 1)
          else if (r1 >= w.length && endsInShortSyllable(w, w.length)) w = w + "e"
        }
      }
    }

    // ---- step 1c: y/Y -> i if preceded by a non-vowel which is not the first letter
    {
      val len = w.length
      if (len > 2) {
        val last = w.charAt(len - 1)
        if ((last == 'y' || last == 'Y') && !isVowel(w.charAt(len - 2)))
          w = w.substring(0, len - 1) + "i"
      }
    }

    // ---- step 2 (longest among; condition: suffix in R1)
    {
      val len = w.length
      // (suffix, replacement) — searched longest-first; special-cased: ogi, li
      def tryRepl(suffix: String, repl: String): Boolean = {
        if (w.endsWith(suffix)) {
          if (inR1(w.length - suffix.length)) w = w.substring(0, w.length - suffix.length) + repl
          true // matched (even if R1 failed -> no shorter suffix is tried)
        } else false
      }
      val _ = len
      val matched =
        tryRepl("ational", "ate") || tryRepl("fulness", "ful") || tryRepl("iveness", "ive") ||
        tryRepl("ization", "ize") || tryRepl("ousness", "ous") ||
        tryRepl("biliti", "ble") || tryRepl("lessli", "less") || tryRepl("tional", "tion") ||
        tryRepl("alism", "al") || tryRepl("aliti", "al") || tryRepl("ation", "ate") ||
        tryRepl("entli", "ent") || tryRepl("fulli", "ful") || tryRepl("ousli", "ous") ||
        tryRepl("anci", "ance") || tryRepl("abli", "able") || tryRepl("alli", "al") ||
        tryRepl("ator", "ate") || tryRepl("enci", "ence") || tryRepl("izer", "ize") ||
        tryRepl("iviti", "ive") || {
          if (w.endsWith("ogi")) {
            if (w.length >= 4 && w.charAt(w.length - 4) == 'l' && inR1(w.length - 3))
              w = w.substring(0, w.length - 1) // ogi -> og
            true
          } else false
        } || tryRepl("bli", "ble") || {
          if (w.endsWith("li")) {
            if (w.length >= 3 && isLiEnding(w.charAt(w.length - 3)) && inR1(w.length - 2))
              w = w.substring(0, w.length - 2)
            true
          } else false
        }
      val _2 = matched
    }

    // ---- step 3 (longest among; condition: suffix in R1)
    {
      def del(suffix: String): Boolean = {
        if (w.endsWith(suffix)) {
          if (inR1(w.length - suffix.length)) w = w.substring(0, w.length - suffix.length)
          true
        } else false
      }
      def repl(suffix: String, r: String): Boolean = {
        if (w.endsWith(suffix)) {
          if (inR1(w.length - suffix.length)) w = w.substring(0, w.length - suffix.length) + r
          true
        } else false
      }
      val matched =
        repl("ational", "ate") || repl("tional", "tion") || repl("alize", "al") ||
        repl("icate", "ic") || repl("iciti", "ic") || {
          if (w.endsWith("ative")) {
            if (inR1(w.length - 5) && inR2(w.length - 5)) w = w.substring(0, w.length - 5)
            true
          } else false
        } || repl("ical", "ic") || del("ness") || del("ful")
      val _ = matched
    }

    // ---- step 4 (longest among; condition: suffix in R2)
    {
      def del(suffix: String): Boolean = {
        if (w.endsWith(suffix)) {
          if (inR2(w.length - suffix.length)) w = w.substring(0, w.length - suffix.length)
          true
        } else false
      }
      val matched =
        del("ement") ||
        del("ance") || del("ence") || del("able") || del("ible") || del("ment") || {
          if (w.endsWith("sion") || w.endsWith("tion")) {
            // 'ion' delete if in R2 and preceded by s or t
            if (inR2(w.length - 3)) w = w.substring(0, w.length - 3)
            true
          } else if (w.endsWith("ion")) true // matched 'ion' but not preceded by s/t -> nothing
          else false
        } ||
        del("ant") || del("ent") || del("ism") || del("ate") || del("iti") ||
        del("ous") || del("ive") || del("ize") ||
        del("al") || del("er") || del("ic")
      val _ = matched
    }

    // ---- step 5
    {
      val len = w.length
      if (len > 0 && w.charAt(len - 1) == 'e') {
        if (inR2(len - 1) || (inR1(len - 1) && !endsInShortSyllable(w, len - 1)))
          w = w.substring(0, len - 1)
      } else if (len > 1 && w.charAt(len - 1) == 'l') {
        if (inR2(len - 1) && w.charAt(len - 2) == 'l') w = w.substring(0, len - 1)
      }
    }

    // ---- postlude
    if (yFound) w = w.replace('Y', 'y')
    w
  }
}
