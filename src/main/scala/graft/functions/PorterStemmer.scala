package graft.functions

/** The Porter stemming algorithm (M.F. Porter, "An algorithm for
  * suffix stripping", Program 14(3), 1980 — public domain algorithm).
  * Implemented from the paper's rule tables; replaces the round-1
  * step-1-only approximation. The reference engine wraps Snowball's
  * English stemmer (`/root/reference/plugins/nlp/nlp.cc:213-284`),
  * whose English variant is Porter's algorithm.
  *
  * Pure function String → String; the hot per-row loop lives in
  * `plans.PorterStem` (a native Catalyst expression around this).
  */
object PorterStemmer {

  private def isCons(w: String, i: Int): Boolean = w.charAt(i) match {
    case 'a' | 'e' | 'i' | 'o' | 'u' => false
    case 'y' => i == 0 || !isCons(w, i - 1)
    case _ => true
  }

  /** m of w[0, end): number of VC sequences in [C](VC)^m[V]. */
  private def measure(w: String, end: Int): Int = {
    var m = 0
    var i = 0
    while (i < end && isCons(w, i)) i += 1
    while (i < end) {
      while (i < end && !isCons(w, i)) i += 1
      if (i < end) {
        m += 1
        while (i < end && isCons(w, i)) i += 1
      }
    }
    m
  }

  private def hasVowel(w: String, end: Int): Boolean =
    (0 until end).exists(i => !isCons(w, i))

  private def endsDoubleCons(w: String): Boolean =
    w.length >= 2 && w.charAt(w.length - 1) == w.charAt(w.length - 2) &&
      isCons(w, w.length - 1)

  /** *o: stem ends cvc where the final c is not w, x or y. */
  private def endsCvc(w: String): Boolean = {
    val n = w.length
    n >= 3 && isCons(w, n - 3) && !isCons(w, n - 2) && isCons(w, n - 1) &&
      !"wxy".contains(w.charAt(n - 1))
  }

  /** longest matching (suffix → replacement) whose stem passes cond;
    * Porter fires at most ONE rule per step. */
  private def applyRules(w: String, rules: Seq[(String, String)],
      cond: String => Boolean): String = {
    rules.filter { case (suf, _) => w.endsWith(suf) && w.length > suf.length }
      .sortBy(-_._1.length).headOption match {
      case Some((suf, rep)) =>
        val stem = w.substring(0, w.length - suf.length)
        if (cond(stem)) stem + rep else w
      case None => w
    }
  }

  def stem(word: String): String = {
    if (word == null) return null
    // words too short to stem keep their case — the reference's
    // stemmer leaves 'I' as 'I' (MLDB-1126 "I like have lot")
    if (word.length <= 2) return word
    val w0 = word.toLowerCase
    var w = w0

    // Step 1a
    if (w.endsWith("sses")) w = w.dropRight(2)
    else if (w.endsWith("ies")) w = w.dropRight(2)
    else if (!w.endsWith("ss") && w.endsWith("s")) w = w.dropRight(1)

    // Step 1b
    var extraStep = false
    if (w.endsWith("eed")) {
      if (measure(w, w.length - 3) > 0) w = w.dropRight(1)
    } else if (w.endsWith("ed") && hasVowel(w, w.length - 2)) {
      w = w.dropRight(2); extraStep = true
    } else if (w.endsWith("ing") && hasVowel(w, w.length - 3)) {
      w = w.dropRight(3); extraStep = true
    }
    if (extraStep) {
      if (w.endsWith("at") || w.endsWith("bl") || w.endsWith("iz")) w += "e"
      else if (endsDoubleCons(w) && !"lsz".contains(w.charAt(w.length - 1)))
        w = w.dropRight(1)
      else if (measure(w, w.length) == 1 && endsCvc(w)) w += "e"
    }

    // Step 1c
    if (w.endsWith("y") && hasVowel(w, w.length - 1)) w = w.dropRight(1) + "i"

    // Step 2 (m > 0)
    w = applyRules(w, Seq(
      "ational" -> "ate", "tional" -> "tion", "enci" -> "ence",
      "anci" -> "ance", "izer" -> "ize", "abli" -> "able", "alli" -> "al",
      "entli" -> "ent", "eli" -> "e", "ousli" -> "ous", "ization" -> "ize",
      "ation" -> "ate", "ator" -> "ate", "alism" -> "al", "iveness" -> "ive",
      "fulness" -> "ful", "ousness" -> "ous", "aliti" -> "al",
      "iviti" -> "ive", "biliti" -> "ble", "logi" -> "log"),
      s => measure(s, s.length) > 0)

    // Step 3 (m > 0)
    w = applyRules(w, Seq(
      "icate" -> "ic", "ative" -> "", "alize" -> "al", "iciti" -> "ic",
      "ical" -> "ic", "ful" -> "", "ness" -> ""),
      s => measure(s, s.length) > 0)

    // Step 4 (m > 1; "ion" additionally requires the stem to end s/t)
    val step4 = Seq("al", "ance", "ence", "er", "ic", "able", "ible", "ant",
      "ement", "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous",
      "ive", "ize")
    step4.filter(suf => w.endsWith(suf) && w.length > suf.length)
      .sortBy(-_.length).headOption.foreach { suf =>
        val stem = w.substring(0, w.length - suf.length)
        val ok = measure(stem, stem.length) > 1 &&
          (suf != "ion" || (stem.nonEmpty && "st".contains(stem.last)))
        if (ok) w = stem
      }

    // Step 5a
    if (w.endsWith("e")) {
      val stem = w.dropRight(1)
      val m = measure(stem, stem.length)
      if (m > 1 || (m == 1 && !endsCvc(stem))) w = stem
    }
    // Step 5b
    if (measure(w, w.length) > 1 && w.endsWith("ll")) w = w.dropRight(1)

    w
  }
}
