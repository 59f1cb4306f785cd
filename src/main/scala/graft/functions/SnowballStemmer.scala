package graft.functions

/** Snowball stemmers for the reference's non-English languages
  * (M.F. Porter's Snowball algorithm family, snowballstem.org —
  * public-domain algorithm descriptions). The reference wraps
  * libstemmer and accepts any of its languages at function-creation
  * time (`plugins/nlp/nlp.cc:213-284`); this port implements the FULL
  * vendored set — French, German, Spanish, Portuguese, Italian,
  * Dutch, Russian, Danish, Norwegian, Swedish, Romanian, Hungarian,
  * Finnish, Turkish, plus English/Porter — each from the published
  * algorithm descriptions and differential-tested at zero mismatches
  * against libstemmer's output on fuzzed vocabularies of 9k-40k words
  * per language (FunctionsSpec pins representative pairs).
  *
  * Pure String → String functions; `plans.SnowballStem` wraps them as
  * a native Catalyst expression for the per-row hot path.
  */
object SnowballStemmer {

  /** Languages creatable as stemmer function entities. */
  val supported: Set[String] = Set("english", "porter", "french", "german",
    "spanish", "portuguese", "italian", "dutch", "russian", "danish",
    "norwegian", "swedish", "romanian", "hungarian", "finnish",
    "turkish")

  /** Creation-time validation — the reference's exact error shape
    * (`nlp.cc:277`: sb_stemmer_new failure). */
  def validate(language: String): Unit =
    if (!supported(language.toLowerCase))
      throw new IllegalArgumentException(
        s"language `$language' not available for stemming in encoding `utf8'")

  def stem(language: String, word: String): String =
    language.toLowerCase match {
      case "english" | "porter" => PorterStemmer.stem(word)
      case "french" => french(word)
      case "german" => german(word)
      case "spanish" => spanish(word)
      case "portuguese" => portuguese(word)
      case "italian" => italian(word)
      case "dutch" => dutch(word)
      case "russian" => russian(word)
      case "danish" => danish(word)
      case "norwegian" => norwegian(word)
      case "swedish" => swedish(word)
      case "romanian" => romanian(word)
      case "hungarian" => hungarian(word)
      case "finnish" => finnish(word)
      case "turkish" => turkish(word)
      case other => throw new IllegalArgumentException(
        s"language `$other' not available for stemming in encoding `utf8'")
    }

  // ---- shared region helpers ----------------------------------------------

  /** standard R1: region after the first non-vowel following a vowel. */
  private def standardR(w: String, from: Int, vowels: Set[Char]): Int = {
    var i = from
    while (i < w.length && !vowels(w.charAt(i))) i += 1    // to first vowel
    while (i < w.length && vowels(w.charAt(i))) i += 1     // through vowels
    if (i < w.length) i + 1 else w.length                  // past the non-vowel
  }

  // =========================================================================
  // GERMAN (snowball "german" algorithm)
  // =========================================================================

  private val deVowels = "aeiouyäöü".toSet

  def german(word0: String): String = {
    var w = word0.toLowerCase.replace("ß", "ss")
    if (w.isEmpty) return w
    // mark consonantal u/y between vowels as upper case
    val sb = new StringBuilder(w)
    var i = 1
    while (i < sb.length - 1) {
      val c = sb.charAt(i)
      if ((c == 'u' || c == 'y') && deVowels(sb.charAt(i - 1)) &&
          deVowels(sb.charAt(i + 1)))
        sb.setCharAt(i, c.toUpper)
      i += 1
    }
    w = sb.toString
    var r1 = standardR(w, 0, deVowels)
    if (r1 < 3) r1 = math.min(3, w.length)  // region before R1 has >= 3 letters
    val r2 = standardR(w, standardR(w, 0, deVowels), deVowels)
    def inR1(pos: Int) = pos >= r1
    def inR2(pos: Int) = pos >= r2
    val sEnding = "bdfghklmnrt".toSet
    val stEnding = "bdfghklmnt".toSet

    // step 1 (longest-match groups)
    locally {
      val g_a = Seq("ern", "em", "er")
      val g_b = Seq("en", "es", "e")
      val a = g_a.filter(w.endsWith).sortBy(-_.length).headOption
      val b = g_b.filter(w.endsWith).sortBy(-_.length).headOption
      // across groups, the longest suffix present decides the rule
      val pick = (a.map(s => (s, 'a')).toSeq ++ b.map(s => (s, 'b')).toSeq ++
        (if (w.endsWith("s")) Seq(("s", 'c')) else Nil))
        .sortBy(-_._1.length).headOption
      pick match {
        case Some((suf, 'a')) =>
          if (inR1(w.length - suf.length)) w = w.dropRight(suf.length)
        case Some((suf, 'b')) =>
          if (inR1(w.length - suf.length)) {
            w = w.dropRight(suf.length)
            if (w.endsWith("niss")) w = w.dropRight(1)
          }
        case Some((_, 'c')) =>
          if (inR1(w.length - 1) && w.length >= 2 &&
              sEnding(w.charAt(w.length - 2)))
            w = w.dropRight(1)
        case _ => ()
      }
    }
    // step 2
    locally {
      val g_a = Seq("est", "en", "er")
      val a = g_a.filter(w.endsWith).sortBy(-_.length).headOption
      val pick = (a.map(s => (s, 'a')).toSeq ++
        (if (w.endsWith("st")) Seq(("st", 'b')) else Nil))
        .sortBy(-_._1.length).headOption
      pick match {
        case Some((suf, 'a')) =>
          if (inR1(w.length - suf.length)) w = w.dropRight(suf.length)
        case Some((_, 'b')) =>
          if (inR1(w.length - 2) && w.length >= 6 &&
              stEnding(w.charAt(w.length - 3)))
            w = w.dropRight(2)
        case _ => ()
      }
    }
    // step 3 (d-suffixes)
    locally {
      val suffixes = Seq("end", "ung", "isch", "lich", "heit", "keit",
        "ig", "ik").sortBy(-_.length)
      suffixes.find(w.endsWith) match {
        case Some(suf @ ("end" | "ung")) =>
          if (inR2(w.length - suf.length)) {
            w = w.dropRight(suf.length)
            if (w.endsWith("ig") && inR2(w.length - 2) &&
                !(w.length >= 3 && w.charAt(w.length - 3) == 'e'))
              w = w.dropRight(2)
          }
        case Some(suf @ ("ig" | "ik" | "isch")) =>
          if (inR2(w.length - suf.length) &&
              !(w.length > suf.length &&
                w.charAt(w.length - suf.length - 1) == 'e'))
            w = w.dropRight(suf.length)
        case Some(suf @ ("lich" | "heit")) =>
          if (inR2(w.length - suf.length)) {
            w = w.dropRight(suf.length)
            val pre = Seq("er", "en").find(w.endsWith)
            pre.foreach { p =>
              if (inR1(w.length - p.length)) w = w.dropRight(p.length)
            }
          }
        case Some("keit") =>
          if (inR2(w.length - 4)) {
            w = w.dropRight(4)
            val pre = Seq("lich", "ig").find(w.endsWith)
            pre.foreach { p =>
              if (inR2(w.length - p.length)) w = w.dropRight(p.length)
            }
          }
        case _ => ()
      }
    }
    w.map {
      case 'U' => 'u'; case 'Y' => 'y'
      case 'ä' => 'a'; case 'ö' => 'o'; case 'ü' => 'u'
      case c => c
    }
  }

  // =========================================================================
  // SPANISH (snowball "spanish" algorithm)
  // =========================================================================

  private val esVowels = "aeiouáéíóúü".toSet

  /** The Spanish/Portuguese/Italian RV definition: second letter
    * consonant → after the next vowel; two initial vowels → after the
    * next consonant; consonant-vowel → after the third letter. */
  private def romanceRV(w: String, vowels: Set[Char]): Int = {
    if (w.length < 3) return w.length
    if (!vowels(w.charAt(1))) {
      // second letter consonant: after the next following vowel
      var i = 2
      while (i < w.length && !vowels(w.charAt(i))) i += 1
      if (i < w.length) i + 1 else w.length
    } else if (vowels(w.charAt(0)) && vowels(w.charAt(1))) {
      // first two letters vowels: after the next consonant
      var i = 2
      while (i < w.length && vowels(w.charAt(i))) i += 1
      if (i < w.length) i + 1 else w.length
    } else 3  // consonant-vowel: after the third letter
  }

  private def esRV(w: String): Int = romanceRV(w, esVowels)

  private def esUnaccent(c: Char): Char = c match {
    case 'á' => 'a'; case 'é' => 'e'; case 'í' => 'i'
    case 'ó' => 'o'; case 'ú' => 'u'; case other => other
  }

  def spanish(word0: String): String = {
    var w = word0.toLowerCase
    if (w.isEmpty) return w
    val rv = esRV(w)
    val r1 = standardR(w, 0, esVowels)
    val r2 = standardR(w, r1, esVowels)
    def inRV(pos: Int) = pos >= rv
    def inR1(pos: Int) = pos >= r1
    def inR2(pos: Int) = pos >= r2

    // step 0: attached pronoun
    locally {
      val pronouns = Seq("selas", "selos", "sela", "selo", "las", "les",
        "los", "nos", "me", "se", "la", "le", "lo")
      pronouns.find(w.endsWith).foreach { p =>
        val base = w.dropRight(p.length)
        val gA = Seq("iéndo", "ándo", "ár", "ér", "ír")
        val gB = Seq("iendo", "ando", "ar", "er", "ir")
        val a = gA.filter(base.endsWith).sortBy(-_.length).headOption
        val b = gB.filter(base.endsWith).sortBy(-_.length).headOption
        (a, b) match {
          case (Some(s), _) if inRV(base.length - s.length) =>
            // only the matched suffix loses its acute accent
            // (iéndo → iendo); accents elsewhere in the word stay
            w = base.dropRight(s.length) + s.map(esUnaccent)
          case (_, Some(s)) if inRV(base.length - s.length) =>
            w = base
          case _ =>
            if (base.endsWith("yendo") && base.length > 5 &&
                base.charAt(base.length - 6) == 'u' &&
                inRV(base.length - 5))
              w = base
        }
      }
    }
    val beforeStep1 = w
    // step 1: standard suffixes (longest match governs)
    locally {
      case class Rule(sufs: Seq[String], apply: String => Option[String])
      def del(pos: Int, cond: Int => Boolean)(s: String, n: Int) =
        if (cond(s.length - n)) Some(s.dropRight(n)) else None
      val allSufs: Seq[(String, String => Option[String])] = {
        val simple = Seq("amientos", "imientos", "amiento", "imiento",
          "anzas", "anza", "icos", "icas", "ico", "ica", "ismos", "ismo",
          "ables", "able", "ibles", "ible", "istas", "ista", "osos",
          "osas", "oso", "osa").map { s =>
          s -> ((x: String) => del(0, inR2)(x, s.length))
        }
        val adora = Seq("adoras", "adores", "aciones", "adora", "ación",
          "antes", "ancias", "ador", "ante", "ancia").map { s =>
          s -> ((x: String) => del(0, inR2)(x, s.length).map { y =>
            if (y.endsWith("ic") && inR2(y.length - 2)) y.dropRight(2) else y
          })
        }
        val logia = Seq("logías", "logía").map { s =>
          s -> ((x: String) =>
            if (inR2(x.length - s.length))
              Some(x.dropRight(s.length) + "log") else None)
        }
        val ucion = Seq("uciones", "ución").map { s =>
          s -> ((x: String) =>
            if (inR2(x.length - s.length))
              Some(x.dropRight(s.length) + "u") else None)
        }
        val encia = Seq("encias", "encia").map { s =>
          s -> ((x: String) =>
            if (inR2(x.length - s.length))
              Some(x.dropRight(s.length) + "ente") else None)
        }
        val amente = Seq("amente").map { s =>
          s -> ((x: String) =>
            if (inR1(x.length - 6)) Some {
              var y = x.dropRight(6)
              if (y.endsWith("iv") && inR2(y.length - 2)) {
                y = y.dropRight(2)
                if (y.endsWith("at") && inR2(y.length - 2)) y = y.dropRight(2)
              } else {
                val p = Seq("os", "ic", "ad").find(y.endsWith)
                p.foreach { q =>
                  if (inR2(y.length - q.length)) y = y.dropRight(q.length) }
              }
              y
            } else None)
        }
        val mente = Seq("mente").map { s =>
          s -> ((x: String) =>
            if (inR2(x.length - 5)) Some {
              var y = x.dropRight(5)
              val p = Seq("ante", "able", "ible").find(y.endsWith)
              p.foreach { q =>
                if (inR2(y.length - q.length)) y = y.dropRight(q.length) }
              y
            } else None)
        }
        val idad = Seq("idades", "idad").map { s =>
          s -> ((x: String) =>
            if (inR2(x.length - s.length)) Some {
              var y = x.dropRight(s.length)
              val p = Seq("abil", "ic", "iv").find(y.endsWith)
              p.foreach { q =>
                if (inR2(y.length - q.length)) y = y.dropRight(q.length) }
              y
            } else None)
        }
        val iva = Seq("ivas", "ivos", "iva", "ivo").map { s =>
          s -> ((x: String) =>
            if (inR2(x.length - s.length)) Some {
              var y = x.dropRight(s.length)
              if (y.endsWith("at") && inR2(y.length - 2)) y = y.dropRight(2)
              y
            } else None)
        }
        simple ++ adora ++ logia ++ ucion ++ encia ++ amente ++ mente ++
          idad ++ iva
      }
      allSufs.filter { case (s, _) => w.endsWith(s) }
        .sortBy { case (s, _) => -s.length }.headOption
        .foreach { case (_, f) => f(w).foreach(w = _) }
    }
    // Steps 2a/2b/3 "search for the longest among the following
    // suffixes IN RV" — the suffix must lie entirely inside RV to be a
    // candidate at all (a longer match straddling the RV boundary does
    // NOT shadow a shorter in-RV one: amábamos keeps ábamos out of the
    // running and drops amos).
    def inRvCandidates(sufs: Seq[String]): Option[String] =
      sufs.filter(s => w.endsWith(s) && inRV(w.length - s.length))
        .sortBy(-_.length).headOption
    // step 2a: verb suffixes beginning y (only if step 1 removed nothing)
    var did2a = false
    if (w == beforeStep1) {
      val ys = Seq("yeron", "yendo", "yamos", "yais", "yan", "yen", "yas",
        "yes", "ya", "ye", "yo", "yó")
      inRvCandidates(ys).foreach { s =>
        if (w.length > s.length && w.charAt(w.length - s.length - 1) == 'u') {
          w = w.dropRight(s.length)
          did2a = true
        }
      }
    }
    // step 2b: other verb suffixes (if neither 1 nor 2a fired)
    if (w == beforeStep1 && !did2a) {
      val gGu = Seq("emos", "éis", "en", "es")
      val gAll = Seq("aríamos", "eríamos", "iríamos", "iéramos", "iésemos",
        "aremos", "eremos", "iremos",
        "aríais", "aseis", "eríais", "iríais", "ierais", "ieseis",
        "asteis", "isteis",
        "ábamos", "áramos", "ásemos", "arían", "arías", "aréis", "erían",
        "erías", "eréis", "irían", "irías", "iréis", "ieran", "iesen",
        "ieron", "iendo", "ieras", "ieses", "abais", "arais", "aseis",
        "íamos", "arán", "arás", "aría", "erán", "erás", "ería", "irán",
        "irás", "iría", "iera", "iese", "aste", "iste", "aban", "aran",
        "asen", "aron", "ando", "abas", "adas", "idas", "aras", "ases",
        "íais", "ados", "idos", "amos", "imos", "ará", "aré", "erá",
        "eré", "irá", "iré", "aba", "ada", "ida", "ara", "ase", "ían",
        "ado", "ido", "ías", "áis", "ía", "ad", "ed", "id", "an", "ió",
        "ar", "er", "ir", "as", "ís")
      val pickGu = inRvCandidates(gGu)
      val pickAll = inRvCandidates(gAll)
      (pickGu.map(s => (s, true)).toSeq ++ pickAll.map(s => (s, false)).toSeq)
        .sortBy(-_._1.length).headOption.foreach { case (s, isGu) =>
          w = w.dropRight(s.length)
          if (isGu && w.endsWith("gu")) w = w.dropRight(1)
        }
    }
    // step 3: residual suffix
    locally {
      val g1 = Seq("os", "a", "o", "á", "í", "ó")
      val g2 = Seq("e", "é")
      val p1 = inRvCandidates(g1)
      val p2 = inRvCandidates(g2)
      (p1.map(s => (s, false)).toSeq ++ p2.map(s => (s, true)).toSeq)
        .sortBy(-_._1.length).headOption.foreach { case (s, isE) =>
          w = w.dropRight(s.length)
          if (isE && w.endsWith("gu") && inRV(w.length - 1))
            w = w.dropRight(1)
        }
    }
    w.map(esUnaccent)
  }

  // =========================================================================
  // FRENCH (snowball "french" algorithm)
  // =========================================================================

  private val frVowels = "aeiouyâàëéêèïîôûù".toSet

  def french(word0: String): String = {
    var w = word0.toLowerCase
    if (w.isEmpty) return w
    // Mark consonantal u/i between vowels, y next to a vowel, u after
    // q — reproducing the Snowball prelude's POSITIONAL scan: at each
    // cursor c, (v [u|i] v) is tried FIRST with the not-yet-marked
    // left neighbor counting as a vowel, so in 'yiè' the i is marked I
    // (y is its preceding vowel) and the y then stays a vowel. That
    // ordering shifts R1/R2 (yièreable → yière, not yièreabl).
    val sb = new StringBuilder(w)
    var c = 0
    def v(j: Int) = j >= 0 && j < sb.length && frVowels(sb.charAt(j))
    var marked = true
    while (c < sb.length) {
      marked = false
      if (v(c) && c + 1 < sb.length) {
        sb.charAt(c + 1) match {
          case 'u' if v(c + 2) => sb.setCharAt(c + 1, 'U'); marked = true
          case 'i' if v(c + 2) => sb.setCharAt(c + 1, 'I'); marked = true
          case 'y' => sb.setCharAt(c + 1, 'Y'); marked = true
          case _ => ()
        }
      }
      if (!marked && sb.charAt(c) == 'y' && v(c + 1)) {
        sb.setCharAt(c, 'Y'); marked = true
      }
      if (!marked && sb.charAt(c) == 'q' && c + 1 < sb.length &&
          sb.charAt(c + 1) == 'u') {
        sb.setCharAt(c + 1, 'U'); marked = true
      }
      if (!marked) c += 1  // on a mark, rescan from the same cursor
    }
    w = sb.toString
    def isV(c: Char) = frVowels(c)  // marked U/I/Y are consonants now
    // RV: start par/col/tap, or two initial vowels → after third letter;
    // else after the first vowel not at the start
    val rv: Int = {
      if (w.length >= 3 && (isV(w.charAt(0)) && isV(w.charAt(1)))) 3
      else if (w.startsWith("par") || w.startsWith("col") ||
        w.startsWith("tap")) 3
      else {
        var j = 1
        while (j < w.length && !isV(w.charAt(j))) j += 1
        if (j < w.length) j + 1 else w.length
      }
    }
    val r1 = standardR(w, 0, frVowels)
    val r2 = standardR(w, r1, frVowels)
    def inRV(pos: Int) = pos >= rv
    def inR1(pos: Int) = pos >= r1
    def inR2(pos: Int) = pos >= r2

    val original = w
    var step1Changed = false
    var foundMent = false

    // ---- step 1: standard suffixes ----
    locally {
      type Res = Option[String]
      val rules: Seq[(String, String => Res)] = {
        val simple = Seq("ances", "iqUes", "ismes", "ables", "istes",
          "ance", "iqUe", "isme", "able", "iste", "eux").map { s =>
          s -> ((x: String) =>
            if (inR2(x.length - s.length)) Some(x.dropRight(s.length))
            else None)
        }
        val atrice = Seq("atrices", "ateurs", "ations", "atrice", "ateur",
          "ation").map { s =>
          s -> ((x: String) =>
            if (inR2(x.length - s.length)) Some {
              var y = x.dropRight(s.length)
              if (y.endsWith("ic")) {
                if (inR2(y.length - 2)) y = y.dropRight(2)
                else y = y.dropRight(2) + "iqU"
              }
              y
            } else None)
        }
        val logie = Seq("logies", "logie").map { s =>
          s -> ((x: String) =>
            if (inR2(x.length - s.length))
              Some(x.dropRight(s.length) + "log") else None)
        }
        val usion = Seq("usions", "utions", "usion", "ution").map { s =>
          s -> ((x: String) =>
            if (inR2(x.length - s.length))
              Some(x.dropRight(s.length) + "u") else None)
        }
        val ence = Seq("ences", "ence").map { s =>
          s -> ((x: String) =>
            if (inR2(x.length - s.length))
              Some(x.dropRight(s.length) + "ent") else None)
        }
        val ement = Seq("ements", "ement").map { s =>
          s -> ((x: String) =>
            if (inRV(x.length - s.length)) Some {
              var y = x.dropRight(s.length)
              if (y.endsWith("iv") && inR2(y.length - 2)) {
                y = y.dropRight(2)
                if (y.endsWith("at") && inR2(y.length - 2)) y = y.dropRight(2)
              } else if (y.endsWith("eus")) {
                if (inR2(y.length - 3)) y = y.dropRight(3)
                else if (inR1(y.length - 3)) y = y.dropRight(3) + "eux"
              } else if (y.endsWith("abl") && inR2(y.length - 3))
                y = y.dropRight(3)
              else if (y.endsWith("iqU") && inR2(y.length - 3))
                y = y.dropRight(3)
              else if (y.endsWith("ièr") && inRV(y.length - 3))
                y = y.dropRight(3) + "i"
              else if (y.endsWith("Ièr") && inRV(y.length - 3))
                y = y.dropRight(3) + "i"
              y
            } else None)
        }
        val ite = Seq("ités", "ité").map { s =>
          s -> ((x: String) =>
            if (inR2(x.length - s.length)) Some {
              var y = x.dropRight(s.length)
              if (y.endsWith("abil")) {
                if (inR2(y.length - 4)) y = y.dropRight(4)
                else y = y.dropRight(4) + "abl"
              } else if (y.endsWith("ic")) {
                if (inR2(y.length - 2)) y = y.dropRight(2)
                else y = y.dropRight(2) + "iqU"
              } else if (y.endsWith("iv") && inR2(y.length - 2))
                y = y.dropRight(2)
              y
            } else None)
        }
        val if_ = Seq("ives", "ifs", "ive", "if").map { s =>
          s -> ((x: String) =>
            if (inR2(x.length - s.length)) Some {
              var y = x.dropRight(s.length)
              if (y.endsWith("at") && inR2(y.length - 2)) {
                y = y.dropRight(2)
                if (y.endsWith("ic")) {
                  if (inR2(y.length - 2)) y = y.dropRight(2)
                  else y = y.dropRight(2) + "iqU"
                }
              }
              y
            } else None)
        }
        val eaux = Seq("eaux").map { s =>
          s -> ((x: String) => Some(x.dropRight(4) + "eau"))
        }
        val aux = Seq("aux").map { s =>
          s -> ((x: String) =>
            if (inR1(x.length - 3)) Some(x.dropRight(3) + "al") else None)
        }
        val euse = Seq("euses", "euse").map { s =>
          s -> ((x: String) =>
            if (inR2(x.length - s.length)) Some(x.dropRight(s.length))
            else if (inR1(x.length - s.length))
              Some(x.dropRight(s.length) + "eux")
            else None)
        }
        val issement = Seq("issements", "issement").map { s =>
          s -> ((x: String) =>
            if (inR1(x.length - s.length) && x.length > s.length &&
                !isV(x.charAt(x.length - s.length - 1)))
              Some(x.dropRight(s.length)) else None)
        }
        val amment = Seq("amment").map { s =>
          s -> ((x: String) =>
            if (inRV(x.length - 6)) Some(x.dropRight(6) + "ant") else None)
        }
        val emment = Seq("emment").map { s =>
          s -> ((x: String) =>
            if (inRV(x.length - 6)) Some(x.dropRight(6) + "ent") else None)
        }
        val ment = Seq("ments", "ment").map { s =>
          s -> ((x: String) =>
            if (x.length > s.length && inRV(x.length - s.length - 1) &&
                isV(x.charAt(x.length - s.length - 1)))
              Some(x.dropRight(s.length)) else None)
        }
        simple ++ atrice ++ logie ++ usion ++ ence ++ ement ++ ite ++
          if_ ++ eaux ++ aux ++ euse ++ issement ++ amment ++ emment ++ ment
      }
      val cand = rules.filter { case (s, _) => w.endsWith(s) }
        .sortBy { case (s, _) => -s.length }.headOption
      cand.foreach { case (s, f) =>
        val mentFamily = Set("amment", "emment", "ment", "ments")(s)
        f(w) match {
          case Some(y) =>
            if (y != w) { w = y; step1Changed = true }
            if (mentFamily) foundMent = true
          case None =>
            if (mentFamily) foundMent = true
        }
      }
    }

    var step2Changed = false
    // ---- step 2a: verb suffixes beginning i ----
    val do2 = !step1Changed || foundMent
    if (do2) {
      val sufs = Seq("issaIent", "issantes", "issions", "issants",
        "issante", "issent", "issant", "issais", "issait", "issiez",
        "issons", "issez", "isses", "irent", "irais", "irait", "iraIent",
        "irions", "irons", "iront", "iriez", "isse", "îtes", "îmes",
        "irez", "iras", "ira", "irai", "ies", "ît", "is", "ie", "it",
        "ir", "i")
      // "search for the longest suffix IN RV": a match straddling the
      // RV boundary is not a candidate and must not shadow a shorter
      // in-RV suffix
      def inRvCands(ss: Seq[String]): Seq[String] =
        ss.filter(s => w.endsWith(s) && inRV(w.length - s.length))
      inRvCands(sufs).sortBy(-_.length).headOption.foreach { s =>
        val pos = w.length - s.length
        if (pos > 0 && !isV(w.charAt(pos - 1)) && inRV(pos - 1)) {
          w = w.dropRight(s.length)
          step2Changed = true
        }
      }
      // ---- step 2b (only if 2a removed nothing) ----
      if (!step2Changed) {
        val gIons = Seq("ions")
        val gE = Seq("eraIent", "erions", "èrent", "erais", "erait",
          "eriez", "erons", "eront", "erai", "eras", "erez", "ées",
          "era", "iez", "ée", "és", "er", "ez", "é")
        val gA = Seq("assions", "assiez", "assent", "asses", "antes",
          "aIent", "asse", "ants", "ante", "âmes", "âtes", "ais", "ait",
          "ant", "ât", "ai", "as", "a")
        val cands =
          inRvCands(gIons).map(s => (s, 'i')) ++
            inRvCands(gE).map(s => (s, 'e')) ++
            inRvCands(gA).map(s => (s, 'a'))
        cands.sortBy(-_._1.length).headOption.foreach { case (s, g) =>
          val pos = w.length - s.length
          g match {
            case 'i' =>
              if (inR2(pos)) { w = w.dropRight(4); step2Changed = true }
            case 'e' =>
              w = w.dropRight(s.length); step2Changed = true
            case 'a' =>
              w = w.dropRight(s.length)
              step2Changed = true
              if (w.endsWith("e") && inRV(w.length - 1)) w = w.dropRight(1)
          }
        }
      }
    }

    // "If the LAST step to be obeyed altered the word, do step 3, else
    // step 4": when a ment-family suffix routed us into 2a/2b and those
    // removed nothing, the last step obeyed (2a/2b) did NOT alter —
    // step 4 runs even though step 1 changed the word.
    val lastAltered = if (do2) step2Changed else step1Changed
    if (lastAltered) {
      // ---- step 3 ----
      if (w.endsWith("Y")) w = w.dropRight(1) + "i"
      else if (w.endsWith("ç")) w = w.dropRight(1) + "c"
    } else {
      // ---- step 4: residual suffixes ----
      if (w.endsWith("s") && w.length >= 2) {
        val p = w.charAt(w.length - 2)
        if (!"aiouès".contains(p) && p != 'I')
          w = w.dropRight(1)
      }
      locally {
        // longest suffix IN RV (straddling matches are not candidates)
        val cands = Seq("ion", "ière", "Ière", "ier", "Ier", "e", "ë")
          .filter(s => w.endsWith(s) && inRV(w.length - s.length))
          .sortBy(-_.length).headOption
        cands.foreach {
          case "ion" =>
            val pos = w.length - 3
            if (inR2(pos) && pos > 0 &&
                (w.charAt(pos - 1) == 's' || w.charAt(pos - 1) == 't') &&
                inRV(pos - 1))
              w = w.dropRight(3)
          case s @ ("ière" | "Ière" | "ier" | "Ier") =>
            w = w.dropRight(s.length) + "i"
          case "e" =>
            w = w.dropRight(1)
          case "ë" =>
            // the preceding 'gu' must itself lie inside RV (the
            // backward-mode limit): ciguë → cigu but aiguë stays
            if (w.endsWith("guë") && inRV(w.length - 3)) w = w.dropRight(1)
          case _ => ()
        }
      }
    }
    // ---- step 5: undouble ----
    if (Seq("enn", "onn", "ett", "ell", "eill").exists(w.endsWith))
      w = w.dropRight(1)
    // ---- step 6: un-accent ----
    locally {
      var j = w.length - 1
      var nonV = 0
      while (j >= 0 && !isV(w.charAt(j)) &&
          w.charAt(j) != 'é' && w.charAt(j) != 'è') { nonV += 1; j -= 1 }
      if (nonV >= 1 && j >= 0 && (w.charAt(j) == 'é' || w.charAt(j) == 'è'))
        w = w.substring(0, j) + "e" + w.substring(j + 1)
    }
    w.map { case 'I' => 'i'; case 'U' => 'u'; case 'Y' => 'y'; case c => c }
  }

  // =========================================================================
  // PORTUGUESE (snowball "portuguese" algorithm)
  // =========================================================================

  private val ptVowels = "aeiouáéíóúâêô".toSet

  def portuguese(word0: String): String = {
    // prelude: nasalised vowels become vowel + consonant '~'
    var w = word0.toLowerCase.replace("ã", "a~").replace("õ", "o~")
    if (w.isEmpty) return w
    val rv = romanceRV(w, ptVowels)
    val r1 = standardR(w, 0, ptVowels)
    val r2 = standardR(w, r1, ptVowels)
    def inRV(pos: Int) = pos >= rv
    def inR1(pos: Int) = pos >= r1
    def inR2(pos: Int) = pos >= r2
    val original = w

    // ---- step 1: standard suffixes (longest match governs) ----
    locally {
      def del(cond: Int => Boolean)(s: String, n: Int): Option[String] =
        if (cond(s.length - n)) Some(s.dropRight(n)) else None
      val rules: Seq[(String, String => Option[String])] = {
        val simple = Seq("amentos", "imentos", "amento", "imento",
          "adoras", "adores", "aço~es", "ismos", "istas", "adora",
          "aça~o", "antes", "ância", "ezas", "icos", "icas", "ismo",
          "ável", "ível", "ista", "osos", "osas", "ador", "ante", "eza",
          "ico", "ica", "oso", "osa").map { s =>
          s -> ((x: String) => del(inR2)(x, s.length))
        }
        // the published algorithm keeps the Spanish-accented spellings
        // for these two families (logía/ución), not the Portuguese ones
        val logia = Seq("logías", "logía").map { s =>
          s -> ((x: String) =>
            if (inR2(x.length - s.length))
              Some(x.dropRight(s.length) + "log") else None)
        }
        val ucao = Seq("uciones", "ución").map { s =>
          s -> ((x: String) =>
            if (inR2(x.length - s.length))
              Some(x.dropRight(s.length) + "u") else None)
        }
        val encia = Seq("ências", "ência").map { s =>
          s -> ((x: String) =>
            if (inR2(x.length - s.length))
              Some(x.dropRight(s.length) + "ente") else None)
        }
        val amente = Seq("amente").map { s =>
          s -> ((x: String) =>
            if (inR1(x.length - 6)) Some {
              var y = x.dropRight(6)
              if (y.endsWith("iv") && inR2(y.length - 2)) {
                y = y.dropRight(2)
                if (y.endsWith("at") && inR2(y.length - 2)) y = y.dropRight(2)
              } else {
                val p = Seq("os", "ic", "ad").find(y.endsWith)
                p.foreach { q =>
                  if (inR2(y.length - q.length)) y = y.dropRight(q.length) }
              }
              y
            } else None)
        }
        val mente = Seq("mente").map { s =>
          s -> ((x: String) =>
            if (inR2(x.length - 5)) Some {
              var y = x.dropRight(5)
              val p = Seq("ante", "avel", "ível").find(y.endsWith)
              p.foreach { q =>
                if (inR2(y.length - q.length)) y = y.dropRight(q.length) }
              y
            } else None)
        }
        val idade = Seq("idades", "idade").map { s =>
          s -> ((x: String) =>
            if (inR2(x.length - s.length)) Some {
              var y = x.dropRight(s.length)
              val p = Seq("abil", "ic", "iv").find(y.endsWith)
              p.foreach { q =>
                if (inR2(y.length - q.length)) y = y.dropRight(q.length) }
              y
            } else None)
        }
        val iva = Seq("ivas", "ivos", "iva", "ivo").map { s =>
          s -> ((x: String) =>
            if (inR2(x.length - s.length)) Some {
              var y = x.dropRight(s.length)
              if (y.endsWith("at") && inR2(y.length - 2)) y = y.dropRight(2)
              y
            } else None)
        }
        val ira = Seq("iras", "ira").map { s =>
          s -> ((x: String) => {
            val pos = x.length - s.length
            if (inRV(pos) && pos > 0 && x.charAt(pos - 1) == 'e')
              Some(x.dropRight(s.length) + "ir") else None
          })
        }
        simple ++ logia ++ ucao ++ encia ++ amente ++ mente ++ idade ++
          iva ++ ira
      }
      rules.filter { case (s, _) => w.endsWith(s) }
        .sortBy { case (s, _) => -s.length }.headOption
        .foreach { case (_, f) => f(w).foreach(w = _) }
    }

    // ---- step 2: verb suffixes (only if step 1 changed nothing);
    // longest suffix IN RV (straddling matches are not candidates) ----
    if (w == original) {
      val verbs = Seq("aríamos", "eríamos", "iríamos", "ássemos",
        "êssemos", "íssemos", "aríeis", "eríeis", "iríeis", "ásseis",
        "ésseis", "ísseis", "áramos", "éramos", "íramos", "ávamos",
        "aremos", "eremos", "iremos", "ariam", "eriam", "iriam",
        "assem", "essem", "issem", "ara~o", "era~o", "ira~o", "arias",
        "erias", "irias", "ardes", "erdes", "irdes", "asses", "esses",
        "isses", "astes", "estes", "istes", "áreis", "areis", "éreis",
        "ereis", "íreis", "ireis", "ásteis", "ésteis", "ísteis",
        "áveis", "íamos", "armos", "ermos", "irmos", "aria", "eria",
        "iria", "asse", "esse", "isse", "aste", "este", "iste", "arei",
        "erei", "irei", "aram", "eram", "iram", "avam", "arem", "erem",
        "irem", "ando", "endo", "indo", "adas", "idas", "arás", "aras",
        "erás", "eras", "irás", "avas", "ares", "eres", "ires", "íeis",
        "ados", "idos", "ámos", "amos", "emos", "imos", "iras", "ada",
        "ida", "ará", "ara", "erá", "era", "irá", "ava", "iam", "ado",
        "ido", "ias", "ais", "eis", "ira", "ia", "ei", "am", "em", "ar",
        "er", "ir", "as", "es", "is", "eu", "iu", "ou")
      verbs.filter(s => w.endsWith(s) && inRV(w.length - s.length))
        .sortBy(-_.length).headOption
        .foreach(s => w = w.dropRight(s.length))
    }

    if (w != original) {
      // ---- step 3: delete i if in RV and preceded by c ----
      if (w.endsWith("ci") && inRV(w.length - 1)) w = w.dropRight(1)
    } else {
      // ---- step 4: residual suffix ----
      Seq("os", "a", "i", "o", "á", "í", "ó")
        .filter(s => w.endsWith(s) && inRV(w.length - s.length))
        .sortBy(-_.length).headOption
        .foreach(s => w = w.dropRight(s.length))
    }

    // ---- step 5: final e/é/ê, trailing gu/ci undouble, ç → c ----
    if (Seq("e", "é", "ê").exists(w.endsWith) && inRV(w.length - 1)) {
      w = w.dropRight(1)
      if ((w.endsWith("gu") || w.endsWith("ci")) && inRV(w.length - 1))
        w = w.dropRight(1)
    } else if (w.endsWith("ç")) w = w.dropRight(1) + "c"

    w.replace("a~", "ã").replace("o~", "õ")
  }

  // =========================================================================
  // ITALIAN (snowball "italian" algorithm)
  // =========================================================================

  private val itVowels = "aeiouàèìòù".toSet

  def italian(word0: String): String = {
    // prelude: acute → grave accents, qu → qU, u/i between vowels → U/I
    var w = word0.toLowerCase
      .map { case 'á' => 'à'; case 'é' => 'è'; case 'í' => 'ì'
             case 'ó' => 'ò'; case 'ú' => 'ù'; case c => c }
      .replace("qu", "qU")
    if (w.isEmpty) return w
    locally {
      val sb = new StringBuilder(w)
      def v(j: Int) = j >= 0 && j < sb.length && itVowels(sb.charAt(j))
      var c = 0
      while (c + 2 < sb.length + 1 && c < sb.length - 2) {
        val m = sb.charAt(c + 1)
        if (v(c) && (m == 'u' || m == 'i') && v(c + 2)) {
          sb.setCharAt(c + 1, m.toUpper); c += 2
        } else c += 1
      }
      w = sb.toString
    }
    val rv = romanceRV(w, itVowels)
    val r1 = standardR(w, 0, itVowels)
    val r2 = standardR(w, r1, itVowels)
    def inRV(pos: Int) = pos >= rv
    def inR1(pos: Int) = pos >= r1
    def inR2(pos: Int) = pos >= r2

    // ---- step 0: attached pronoun ----
    locally {
      val pronouns = Seq("gliela", "gliele", "glieli", "glielo", "gliene",
        "sene", "mela", "mele", "meli", "melo", "mene", "tela", "tele",
        "teli", "telo", "tene", "cela", "cele", "celi", "celo", "cene",
        "vela", "vele", "veli", "velo", "vene", "gli", "ci", "la", "le",
        "li", "lo", "mi", "ne", "si", "ti", "vi")
      pronouns.filter(w.endsWith).sortBy(-_.length).headOption.foreach { p =>
        val base = w.dropRight(p.length)
        val a = Seq("ando", "endo").find(base.endsWith)
        val b = Seq("ar", "er", "ir").find(base.endsWith)
        (a, b) match {
          case (Some(s), _) if inRV(base.length - s.length) => w = base
          case (_, Some(s)) if inRV(base.length - s.length) => w = base + "e"
          case _ => ()
        }
      }
    }

    val beforeStep1 = w
    // ---- step 1: standard suffixes (longest match governs) ----
    locally {
      val rules: Seq[(String, String => Option[String])] = {
        val simple = Seq("atrice", "atrici", "abile", "abili", "ibile",
          "ibili", "mente", "anza", "anze", "iche", "ichi", "ismo",
          "ismi", "ista", "iste", "isti", "istà", "istè", "istì",
          "ante", "anti", "ico", "ici", "ica", "ice", "oso", "osi",
          "osa", "ose").map { s =>
          s -> ((x: String) =>
            if (inR2(x.length - s.length)) Some(x.dropRight(s.length))
            else None)
        }
        val azione = Seq("azione", "azioni", "atore", "atori").map { s =>
          s -> ((x: String) =>
            if (inR2(x.length - s.length)) Some {
              var y = x.dropRight(s.length)
              if (y.endsWith("ic") && inR2(y.length - 2)) y = y.dropRight(2)
              y
            } else None)
        }
        val logia = Seq("logia", "logie").map { s =>
          s -> ((x: String) =>
            if (inR2(x.length - s.length))
              Some(x.dropRight(s.length) + "log") else None)
        }
        val uzione = Seq("uzione", "uzioni", "usione", "usioni").map { s =>
          s -> ((x: String) =>
            if (inR2(x.length - s.length))
              Some(x.dropRight(s.length) + "u") else None)
        }
        val enza = Seq("enza", "enze").map { s =>
          s -> ((x: String) =>
            if (inR2(x.length - s.length))
              Some(x.dropRight(s.length) + "ente") else None)
        }
        val amento = Seq("amento", "amenti", "imento", "imenti").map { s =>
          s -> ((x: String) =>
            if (inRV(x.length - s.length)) Some(x.dropRight(s.length))
            else None)
        }
        val amente = Seq("amente").map { s =>
          s -> ((x: String) =>
            if (inR1(x.length - 6)) Some {
              var y = x.dropRight(6)
              if (y.endsWith("iv") && inR2(y.length - 2)) {
                y = y.dropRight(2)
                if (y.endsWith("at") && inR2(y.length - 2)) y = y.dropRight(2)
              } else {
                val p = Seq("os", "ic", "abil").find(y.endsWith)
                p.foreach { q =>
                  if (inR2(y.length - q.length)) y = y.dropRight(q.length) }
              }
              y
            } else None)
        }
        val ita = Seq("ità").map { s =>
          s -> ((x: String) =>
            if (inR2(x.length - 3)) Some {
              var y = x.dropRight(3)
              val p = Seq("abil", "ic", "iv").find(y.endsWith)
              p.foreach { q =>
                if (inR2(y.length - q.length)) y = y.dropRight(q.length) }
              y
            } else None)
        }
        val ivo = Seq("ivo", "ivi", "iva", "ive").map { s =>
          s -> ((x: String) =>
            if (inR2(x.length - s.length)) Some {
              var y = x.dropRight(s.length)
              if (y.endsWith("at") && inR2(y.length - 2)) {
                y = y.dropRight(2)
                if (y.endsWith("ic") && inR2(y.length - 2)) y = y.dropRight(2)
              }
              y
            } else None)
        }
        simple ++ azione ++ logia ++ uzione ++ enza ++ amento ++ amente ++
          ita ++ ivo
      }
      rules.filter { case (s, _) => w.endsWith(s) }
        .sortBy { case (s, _) => -s.length }.headOption
        .foreach { case (_, f) => f(w).foreach(w = _) }
    }

    // ---- step 2: verb suffixes (only if step 1 removed nothing) ----
    if (w == beforeStep1) {
      val verbs = Seq("erebbero", "irebbero", "assero", "assimo",
        "eranno", "erebbe", "eremmo", "ereste", "eresti", "essero",
        "iranno", "irebbe", "iremmo", "ireste", "iresti", "iscano",
        "iscono", "issero", "arono", "avamo", "avano", "avate",
        "eremo", "erete", "erono", "evamo", "evano", "evate", "iremo",
        "irete", "irono", "ivamo", "ivano", "ivate", "ammo", "ando",
        "asse", "assi", "emmo", "enda", "ende", "endi", "endo", "erai",
        "erei", "Yamo", "iamo", "immo", "irai", "irei", "isca", "isce",
        "isci", "isco", "ano", "are", "ata", "ate", "ati", "ato",
        "ava", "avi", "avo", "erà", "ere", "erò", "ete", "eva", "evi",
        "evo", "irà", "ire", "irò", "ita", "ite", "iti", "ito", "iva",
        "ivi", "ivo", "ono", "uta", "ute", "uti", "uto", "ar", "ir")
      verbs.filter(s => w.endsWith(s) && inRV(w.length - s.length))
        .sortBy(-_.length).headOption
        .foreach(s => w = w.dropRight(s.length))
    }

    // ---- step 3a: final vowel (and a preceding i) in RV ----
    locally {
      val fin = "aeioàèìò"
      if (w.nonEmpty && fin.contains(w.last) && inRV(w.length - 1)) {
        w = w.dropRight(1)
        if (w.endsWith("i") && inRV(w.length - 1)) w = w.dropRight(1)
      }
    }
    // ---- step 3b: ch → c, gh → g (in RV) ----
    if ((w.endsWith("ch") || w.endsWith("gh")) && inRV(w.length - 2))
      w = w.dropRight(1)

    w.map { case 'U' => 'u'; case 'I' => 'i'; case c => c }
  }

  // =========================================================================
  // DUTCH (snowball "dutch" algorithm)
  // =========================================================================

  private val nlVowels = "aeiouyè".toSet

  def dutch(word0: String): String = {
    var w = word0.toLowerCase.map {
      case 'ä' | 'á' => 'a'; case 'ë' | 'é' => 'e'; case 'ï' | 'í' => 'i'
      case 'ö' | 'ó' => 'o'; case 'ü' | 'ú' => 'u'; case c => c
    }
    if (w.isEmpty) return w
    // mark initial y, y after a vowel, i between vowels as consonants
    locally {
      val sb = new StringBuilder(w)
      if (sb.charAt(0) == 'y') sb.setCharAt(0, 'Y')
      var i = 1
      while (i < sb.length) {
        val ch = sb.charAt(i)
        if (ch == 'y' && nlVowels(sb.charAt(i - 1))) sb.setCharAt(i, 'Y')
        else if (ch == 'i' && nlVowels(sb.charAt(i - 1)) &&
            i + 1 < sb.length && nlVowels(sb.charAt(i + 1)))
          sb.setCharAt(i, 'I')
        i += 1
      }
      w = sb.toString
    }
    // the "region before R1 has at least 3 letters" adjustment counts
    // UTF-8 BYTES in the reference implementation (è weighs 2), so
    // compare R1 in byte offsets
    val byteOff = w.scanLeft(0)((acc, c) =>
      acc + String.valueOf(c).getBytes("UTF-8").length)
    var r1b = byteOff(standardR(w, 0, nlVowels))
    if (r1b < 3) r1b = 3
    val r2 = standardR(w, standardR(w, 0, nlVowels), nlVowels)
    def inR1(pos: Int) = byteOff(pos) >= r1b
    def inR2(pos: Int) = pos >= r2
    def undouble(s: String): String =
      if (Seq("kk", "dd", "tt").exists(s.endsWith)) s.dropRight(1) else s
    def validEn(base: String): Boolean =
      base.nonEmpty && !nlVowels(base.last) && !base.endsWith("gem")
    def enEnding(): Unit =
      Seq("ene", "en").find(w.endsWith).foreach { s =>
        val base = w.dropRight(s.length)
        if (inR1(base.length) && validEn(base)) w = undouble(base)
      }

    // ---- step 1 (longest among heden / ene en / se s) ----
    locally {
      val cands = Seq("heden", "ene", "en", "se", "s").filter(w.endsWith)
      cands.sortBy(-_.length).headOption.foreach {
        case "heden" =>
          if (inR1(w.length - 5)) w = w.dropRight(5) + "heid"
        case s @ ("ene" | "en") =>
          val base = w.dropRight(s.length)
          if (inR1(base.length) && validEn(base)) w = undouble(base)
        case s @ ("se" | "s") =>
          val base = w.dropRight(s.length)
          if (inR1(base.length) && base.nonEmpty &&
              !nlVowels(base.last) && base.last != 'j')
            w = base
        case _ => ()
      }
    }

    // ---- step 2: delete e in R1 after a non-vowel; undouble ----
    var eFound = false
    def step2(): Unit =
      if (w.endsWith("e") && inR1(w.length - 1) && w.length >= 2 &&
          !nlVowels(w.charAt(w.length - 2))) {
        eFound = true
        w = undouble(w.dropRight(1))
      }
    step2()

    // ---- step 3a: heid (R2, not after c), then the en treatment ----
    if (w.endsWith("heid") && inR2(w.length - 4) &&
        (w.length < 5 || w.charAt(w.length - 5) != 'c')) {
      w = w.dropRight(4)
      enEnding()
    }

    // ---- step 3b: d-suffixes (longest match governs) ----
    locally {
      val cands = Seq("baar", "lijk", "end", "ing", "bar", "ig")
        .filter(w.endsWith)
      cands.sortBy(-_.length).headOption.foreach {
        case s @ ("end" | "ing") =>
          if (inR2(w.length - s.length)) {
            w = w.dropRight(s.length)
            if (w.endsWith("ig") && inR2(w.length - 2) &&
                (w.length < 3 || w.charAt(w.length - 3) != 'e'))
              w = w.dropRight(2)
            else w = undouble(w)
          }
        case "ig" =>
          if (inR2(w.length - 2) &&
              (w.length < 3 || w.charAt(w.length - 3) != 'e'))
            w = w.dropRight(2)
        case "lijk" =>
          if (inR2(w.length - 4)) { w = w.dropRight(4); step2() }
        case "baar" =>
          if (inR2(w.length - 4)) w = w.dropRight(4)
        case "bar" =>
          if (inR2(w.length - 3) && eFound) w = w.dropRight(3)
        case _ => ()
      }
    }

    // ---- step 4: undouble vowel (CVD with V in {aa,ee,oo,uu}) ----
    if (w.length >= 4) {
      val d = w.last; val v2 = w.charAt(w.length - 2)
      val v3 = w.charAt(w.length - 3); val c0 = w.charAt(w.length - 4)
      if (!nlVowels(d) && d != 'I' && v2 == v3 && "aeou".contains(v2) &&
          !nlVowels(c0))
        w = w.substring(0, w.length - 2) + d
    }

    w.map { case 'Y' => 'y'; case 'I' => 'i'; case c => c }
  }

  // =========================================================================
  // RUSSIAN (snowball "russian" algorithm)
  // =========================================================================

  private val ruVowels = "аеиоуыэюя".toSet

  def russian(word0: String): String = {
    // NOTE: the reference's vendored libstemmer does NOT fold ё → е
    // (that mapping is left to the caller), so neither do we
    var w = word0.toLowerCase
    if (w.isEmpty) return w
    val rv = { // region after the first vowel
      val i = w.indexWhere(ruVowels)
      if (i < 0) w.length else i + 1
    }
    val r1 = standardR(w, 0, ruVowels)
    val r2 = standardR(w, r1, ruVowels)
    def inRV(pos: Int) = pos >= rv
    def inR2(pos: Int) = pos >= r2
    def rvLongest(sufs: Seq[String]): Option[String] =
      sufs.filter(s => w.endsWith(s) && inRV(w.length - s.length))
        .sortBy(-_.length).headOption
    /** Longest in-RV match across both groups; group-1 suffixes must
      * directly follow an а/я that is itself in RV. A longest match
      * whose precondition fails ends the among (no shorter fallback —
      * the snowball `among` semantics). */
    def amongDelete(g1: Seq[String], g2: Seq[String]): Boolean = {
      val cands = (g1.map(s => (s, true)) ++ g2.map(s => (s, false)))
        .filter { case (s, _) =>
          w.endsWith(s) && inRV(w.length - s.length) }
      cands.sortBy { case (s, _) => -s.length }.headOption match {
        case Some((s, needsAYa)) =>
          val pos = w.length - s.length
          if (!needsAYa || (pos - 1 >= rv &&
              (w.charAt(pos - 1) == 'а' || w.charAt(pos - 1) == 'я'))) {
            w = w.dropRight(s.length); true
          } else false
        case None => false
      }
    }

    // ---- step 1 ----
    val gerund = amongDelete(Seq("вшись", "вши", "в"),
      Seq("ившись", "ывшись", "ивши", "ывши", "ив", "ыв"))
    if (!gerund) {
      rvLongest(Seq("ся", "сь")).foreach(s => w = w.dropRight(s.length))
      val adjective = Seq("ими", "ыми", "его", "ого", "ему", "ому",
        "ее", "ие", "ые", "ое", "ей", "ий", "ый", "ой", "ем", "им",
        "ым", "ом", "их", "ых", "ую", "юю", "ая", "яя", "ою", "ею")
      val adjectival = rvLongest(adjective) match {
        case Some(s) =>
          w = w.dropRight(s.length)
          // optionally a participle before the adjective ending
          amongDelete(Seq("ем", "нн", "вш", "ющ", "щ"),
            Seq("ивш", "ывш", "ующ"))
          true
        case None => false
      }
      if (!adjectival) {
        val verb = amongDelete(
          Seq("ете", "йте", "ешь", "нно", "ла", "на", "ли", "ем", "ло",
            "но", "ет", "ют", "ны", "ть", "й", "л", "н"),
          Seq("ейте", "уйте", "ила", "ыла", "ена", "ите", "или", "ыли",
            "ило", "ыло", "ено", "ует", "уют", "ены", "ить", "ыть",
            "ишь", "ей", "уй", "ил", "ыл", "им", "ым", "ен", "ят",
            "ит", "ыт", "ую", "ю"))
        if (!verb)
          rvLongest(Seq("иями", "ями", "ами", "ией", "иям", "ием",
            "иях", "ию", "ью", "ия", "ья", "ие", "ье", "еи", "ии",
            "ей", "ой", "ий", "ям", "ем", "ам", "ом", "ах", "ях",
            "ев", "ов", "а", "е", "и", "й", "о", "у", "ы", "ь", "ю",
            "я")).foreach(s => w = w.dropRight(s.length))
      }
    }

    // ---- step 2: final и ----
    if (w.endsWith("и") && inRV(w.length - 1)) w = w.dropRight(1)

    // ---- step 3: derivational (in R2) ----
    Seq("ость", "ост")
      .filter(s => w.endsWith(s) && inR2(w.length - s.length))
      .sortBy(-_.length).headOption
      .foreach(s => w = w.dropRight(s.length))

    // ---- step 4: undouble н / superlative / soft sign ----
    if (w.endsWith("нн") && w.length - 2 >= rv - 1 && inRV(w.length - 1))
      w = w.dropRight(1)
    else {
      rvLongest(Seq("ейше", "ейш")).foreach { s =>
        w = w.dropRight(s.length)
        if (w.endsWith("нн") && inRV(w.length - 1)) w = w.dropRight(1)
      }
      if (w.endsWith("ь") && inRV(w.length - 1)) w = w.dropRight(1)
    }
    w
  }

  // =========================================================================
  // DANISH / NORWEGIAN / SWEDISH (snowball Scandinavian algorithms)
  // =========================================================================
  // Unlike Dutch (whose reference counts the R1 >= 3 minimum in UTF-8
  // bytes), these three use the hop-3 form — three CHARACTERS.

  private val daVowels = "aeiouyæåø".toSet // Norwegian shares this set
  private val svVowels = "aeiouyäåö".toSet

  private def scandiR1(w: String, vowels: Set[Char]): Int = {
    var r1 = standardR(w, 0, vowels)
    if (r1 < 3) r1 = math.min(3, w.length)
    r1
  }

  def danish(word0: String): String = {
    var w = word0.toLowerCase
    if (w.isEmpty) return w
    val r1 = scandiR1(w, daVowels)
    def inR1(pos: Int) = pos >= r1
    val sEnding = "abcdfghjklmnoprtvyzå".toSet

    // ---- step 1 ----
    locally {
      // the published inventory (longest match via filter+sort below)
      // plus the s-with-valid-ending rule
      val inventory = Seq("hed", "ethed", "ered", "e", "erede", "ende",
        "erende", "ene", "erne", "ere", "en", "heden", "eren", "er",
        "heder", "erer", "heds", "es", "endes", "erendes", "enes",
        "ernes", "eres", "ens", "hedens", "erens", "ers", "ets",
        "erets", "et", "eret")
      val cands = (inventory.map(s => (s, 'd')) ++ Seq(("s", 's')))
        .filter { case (s, _) =>
          w.endsWith(s) && inR1(w.length - s.length) }
      cands.sortBy { case (s, _) => -s.length }.headOption.foreach {
        case (s, 'd') => w = w.dropRight(s.length)
        case (_, _) =>
          if (w.length >= 2 && sEnding(w.charAt(w.length - 2)))
            w = w.dropRight(1)
      }
    }
    // ---- step 2: consonant pair tails lose their last letter ----
    if (Seq("gd", "dt", "gt", "kt").exists(s =>
        w.endsWith(s) && inR1(w.length - 2)))
      w = w.dropRight(1)
    // ---- step 3 ----
    if (w.endsWith("igst")) w = w.dropRight(2)
    locally {
      val cands = Seq(("elig", 'd'), ("løst", 'l'), ("lig", 'd'),
        ("els", 'd'), ("ig", 'd'))
        .filter { case (s, _) =>
          w.endsWith(s) && inR1(w.length - s.length) }
      cands.sortBy { case (s, _) => -s.length }.headOption.foreach {
        case (s, 'd') =>
          w = w.dropRight(s.length)
          if (Seq("gd", "dt", "gt", "kt").exists(t =>
              w.endsWith(t) && inR1(w.length - 2)))
            w = w.dropRight(1)
        case (_, _) => w = w.dropRight(1) // løst → løs
      }
    }
    // ---- step 4: undouble a final double consonant in R1 ----
    if (w.length >= 2 && w.last == w.charAt(w.length - 2) &&
        !daVowels(w.last) && inR1(w.length - 1))
      w = w.dropRight(1)
    w
  }

  def norwegian(word0: String): String = {
    var w = word0.toLowerCase
    if (w.isEmpty) return w
    val r1 = scandiR1(w, daVowels)
    def inR1(pos: Int) = pos >= r1
    val sEnding = "bcdfghjlmnoprtvyz".toSet

    // ---- step 1 ----
    locally {
      val inventory = Seq("a", "e", "ede", "ande", "ende", "ane", "ene",
        "hetene", "en", "heten", "ar", "er", "heter", "as", "es",
        "edes", "endes", "enes", "hetenes", "ens", "hetens", "ers",
        "ets", "et", "het", "ast")
      val cands = (inventory.map(s => (s, 'd')) ++
        Seq(("erte", 'e'), ("ert", 'e'), ("s", 's')))
        .filter { case (s, _) =>
          w.endsWith(s) && inR1(w.length - s.length) }
      cands.sortBy { case (s, _) => -s.length }.headOption.foreach {
        case (s, 'd') => w = w.dropRight(s.length)
        case (s, 'e') => w = w.dropRight(s.length) + "er"
        case (_, _) =>
          // valid s-ending: one of the consonants, or k NOT preceded
          // by a vowel
          val ok = w.length >= 2 && {
            val p = w.charAt(w.length - 2)
            sEnding(p) || (p == 'k' &&
              (w.length < 3 || !daVowels(w.charAt(w.length - 3))))
          }
          if (ok) w = w.dropRight(1)
      }
    }
    // ---- step 2 ----
    if (Seq("dt", "vt").exists(s => w.endsWith(s) && inR1(w.length - 2)))
      w = w.dropRight(1)
    // ---- step 3 ----
    Seq("hetslov", "slov", "elov", "elig", "eleg", "lov", "lig", "eig",
      "leg", "els", "ig")
      .filter(s => w.endsWith(s) && inR1(w.length - s.length))
      .sortBy(-_.length).headOption
      .foreach(s => w = w.dropRight(s.length))
    w
  }

  // =========================================================================
  // TURKISH (snowball "turkish" algorithm, E. Kapusuz Çilden)
  // =========================================================================

  private val trVowels = "aeıioöuü".toSet
  private val trU = "ıiuü".toSet

  def turkish(word0: String): String = {
    var w = word0.toLowerCase
    // a word with fewer than two vowels is returned unstemmed
    if (w.count(trVowels) < 2) return w

    // ---- backward-mode primitives. Marks compute positions on the
    // CURRENT w without mutating it; every suffix delete truncates w
    // at the mark (the bracket is always at the live end). ----
    def among(p: Int, sufs: String*): Option[Int] =
      sufs.filter(s => p >= s.length &&
          w.regionMatches(p - s.length, s, 0, s.length))
        .sortBy(-_.length).headOption.map(p - _.length)
    /** vowel harmony at p: the last vowel before p must be echoed by
      * some earlier vowel of its harmony class. */
    def harmony(p: Int): Boolean = {
      var i = p - 1
      while (i >= 0 && !trVowels(w.charAt(i))) i -= 1
      if (i < 0) return false
      val cls = w.charAt(i) match {
        case 'a' => "aıou"; case 'e' => "eiöü"; case 'ı' => "aı"
        case 'i' => "ei"; case 'o' | 'u' => "ou"; case _ => "öü"
      }
      var j = i - 1
      while (j >= 0 && cls.indexOf(w.charAt(j)) < 0) j -= 1
      j >= 0
    }
    /** optional suffix consonant (n/s/y): consumed when present after
      * a vowel; when absent the next char back must still be preceded
      * by a vowel; present-but-not-after-a-vowel fails the mark. */
    def optCons(p: Int, letter: Char): Option[Int] =
      if (p >= 1 && w.charAt(p - 1) == letter)
        if (p >= 2 && trVowels(w.charAt(p - 2))) Some(p - 1) else None
      else if (p >= 2 && trVowels(w.charAt(p - 2))) Some(p)
      else None
    /** optional suffix high vowel (ı/i/u/ü): consumed when present
      * after a non-vowel; mirror shape to [[optCons]]. */
    def optU(p: Int): Option[Int] =
      if (p >= 1 && trU(w.charAt(p - 1)))
        if (p >= 2 && !trVowels(w.charAt(p - 2))) Some(p - 1) else None
      else if (p >= 2 && !trVowels(w.charAt(p - 2))) Some(p)
      else None
    def harm(p: Int)(body: => Option[Int]): Option[Int] =
      if (harmony(p)) body else None

    // ---- the suffix marks ----
    def possessives(p: Int) = among(p, "miz", "niz", "muz", "nuz",
      "mız", "nız", "müz", "nüz", "m", "n").flatMap(optU)
    def sU(p: Int) = harm(p) {
      if (p >= 1 && trU(w.charAt(p - 1))) optCons(p - 1, 's') else None
    }
    def lArI(p: Int) = among(p, "leri", "ları")
    def yU(p: Int) = harm(p) {
      if (p >= 1 && trU(w.charAt(p - 1))) optCons(p - 1, 'y') else None
    }
    def nU(p: Int) = harm(p)(among(p, "ni", "nu", "nı", "nü"))
    def nUn(p: Int) =
      harm(p)(among(p, "in", "un", "ın", "ün").flatMap(optCons(_, 'n')))
    def yA(p: Int) = harm(p)(among(p, "a", "e").flatMap(optCons(_, 'y')))
    def nA(p: Int) = harm(p)(among(p, "na", "ne"))
    def dA(p: Int) = harm(p)(among(p, "da", "ta", "de", "te"))
    def ndA(p: Int) = harm(p)(among(p, "nda", "nde"))
    def dAn(p: Int) = harm(p)(among(p, "dan", "tan", "den", "ten"))
    def ndAn(p: Int) = harm(p)(among(p, "ndan", "nden"))
    def ylA(p: Int) =
      harm(p)(among(p, "la", "le").flatMap(optCons(_, 'y')))
    def ki(p: Int) = among(p, "ki")
    def ncA(p: Int) =
      harm(p)(among(p, "ca", "ce").flatMap(optCons(_, 'n')))
    def yUm(p: Int) =
      harm(p)(among(p, "im", "um", "ım", "üm").flatMap(optCons(_, 'y')))
    def sUn(p: Int) = harm(p)(among(p, "sin", "sun", "sın", "sün"))
    def yUz(p: Int) =
      harm(p)(among(p, "iz", "uz", "ız", "üz").flatMap(optCons(_, 'y')))
    def sUnUz(p: Int) = among(p, "siniz", "sunuz", "sınız", "sünüz")
    def lAr(p: Int) = harm(p)(among(p, "lar", "ler"))
    def nUz(p: Int) = harm(p)(among(p, "niz", "nuz", "nız", "nüz"))
    def dUr(p: Int) = harm(p)(among(p, "dir", "tir", "dur", "tur",
      "dır", "tır", "dür", "tür"))
    def cAsInA(p: Int) = among(p, "casına", "cesine")
    def yDU(p: Int) = harm(p)(among(p, "dik", "tik", "duk", "tuk",
      "dık", "tık", "dük", "tük", "dim", "tim", "dum", "tum", "dım",
      "tım", "düm", "tüm", "din", "tin", "dun", "tun", "dın", "tın",
      "dün", "tün", "di", "ti", "du", "tu", "dı", "tı", "dü", "tü")
      .flatMap(optCons(_, 'y')))
    def ysA(p: Int) = among(p, "sak", "sek", "sam", "sem", "san",
      "sen", "sa", "se").flatMap(optCons(_, 'y'))
    def ymUs(p: Int) = harm(p)(
      among(p, "miş", "muş", "mış", "müş").flatMap(optCons(_, 'y')))
    def yken(p: Int) = among(p, "ken").flatMap(optCons(_, 'y'))

    def cut(p: Int): Unit = w = w.substring(0, p)
    def end = w.length

    // ---- ki chain: ki after a case suffix restarts the noun chain.
    // The chain can be entered with a PENDING (marked, not yet
    // deleted) suffix beyond p0, so its deletes remove the segment
    // [c, bracket) and keep the tail — a local bracket that moves to
    // each delete's position, exactly the reference's cursor model. ----
    def chainBeforeKi(p0: Int): Boolean = {
      var ket = p0
      def cutAt(c: Int): Unit = { // slice [c, ket), keep the tail
        w = w.substring(0, c) + w.substring(ket)
        ket = c
      }
      ki(p0) match {
        case None => false
        case Some(p1) =>
          dA(p1) match {
            case Some(c) =>
              cutAt(c)
              lAr(ket) match {
                case Some(c2) => cutAt(c2); chainBeforeKi(ket); ()
                case None =>
                  possessives(ket).foreach { c2 =>
                    cutAt(c2)
                    lAr(ket).foreach { c3 =>
                      cutAt(c3); chainBeforeKi(ket) }
                  }
              }
              true
            case None => nUn(p1) match {
              case Some(c) =>
                cutAt(c)
                lArI(ket) match {
                  case Some(c2) => cutAt(c2)
                  case None =>
                    possessives(ket).orElse(sU(ket)) match {
                      case Some(c2) =>
                        cutAt(c2)
                        lAr(ket).foreach { c3 =>
                          cutAt(c3); chainBeforeKi(ket) }
                      case None => chainBeforeKi(ket); ()
                    }
                }
                true
              case None => ndA(p1) match {
                case Some(c) =>
                  lArI(c) match {
                    case Some(c2) => cutAt(c2); true
                    case None => sU(c) match {
                      case Some(c2) =>
                        cutAt(c2)
                        lAr(ket).foreach { c3 =>
                          cutAt(c3); chainBeforeKi(ket) }
                        true
                      case None => chainBeforeKi(c)
                    }
                  }
                case None => false
              }
            }
          }
      }
    }

    // ---- nominal verb suffixes (continueNoun gates the noun pass) ----
    var continueNoun = true
    def stemNominalVerb(): Unit = {
      val p = end
      ymUs(p).orElse(yDU(p)).orElse(ysA(p)).orElse(yken(p)) match {
        case Some(c) => cut(c); return
        case None => ()
      }
      cAsInA(p).foreach { c1 => // cAsInA (person)? ymUş
        val c2 = sUnUz(c1).orElse(lAr(c1)).orElse(yUm(c1))
          .orElse(sUn(c1)).orElse(yUz(c1)).getOrElse(c1)
        ymUs(c2) match {
          case Some(c3) => cut(c3); return
          case None => ()
        }
      }
      lAr(p) match { // lAr then optionally DUr/yDU/ysA/ymUş; stop nouns
        case Some(c1) =>
          cut(c1)
          val p2 = end
          val c2 = dUr(p2).orElse(yDU(p2)).orElse(ysA(p2))
            .orElse(ymUs(p2))
          continueNoun = false
          cut(c2.getOrElse(p2))
          return
        case None => ()
      }
      nUz(p).foreach { c1 =>
        yDU(c1).orElse(ysA(c1)) match {
          case Some(c2) => cut(c2); return
          case None => ()
        }
      }
      sUnUz(p).orElse(yUz(p)).orElse(sUn(p)).orElse(yUm(p)) match {
        case Some(c1) =>
          cut(c1)
          val p2 = end
          cut(ymUs(p2).getOrElse(p2))
          return
        case None => ()
      }
      dUr(p).foreach { c1 =>
        cut(c1)
        val p2 = end
        val c2 = sUnUz(p2).orElse(lAr(p2)).orElse(yUm(p2))
          .orElse(sUn(p2)).orElse(yUz(p2)).getOrElse(p2)
        ymUs(c2).foreach(cut)
      }
    }

    // ---- noun suffixes ----
    def stemNoun(): Unit = {
      val p = end
      lAr(p) match {
        case Some(c) => cut(c); chainBeforeKi(end); return
        case None => ()
      }
      ncA(p) match {
        case Some(c) =>
          cut(c)
          lArI(end) match {
            case Some(c2) => cut(c2)
            case None =>
              possessives(end).orElse(sU(end)) match {
                case Some(c2) =>
                  cut(c2)
                  lAr(end).foreach { c3 => cut(c3); chainBeforeKi(end) }
                case None =>
                  lAr(end).foreach { c2 => cut(c2); chainBeforeKi(end) }
              }
          }
          return
        case None => ()
      }
      ndA(p).orElse(nA(p)) match {
        case Some(c) =>
          val done = lArI(c) match {
            case Some(c2) => cut(c2); true
            case None => sU(c) match {
              case Some(c2) =>
                cut(c2)
                lAr(end).foreach { c3 => cut(c3); chainBeforeKi(end) }
                true
              case None => chainBeforeKi(c) // chain behind the pending mark
            }
          }
          if (done) return
        case None => ()
      }
      ndAn(p).orElse(nU(p)) match {
        case Some(c) =>
          val done = sU(c) match {
            case Some(c2) =>
              cut(c2)
              lAr(end).foreach { c3 => cut(c3); chainBeforeKi(end) }
              true
            case None => lArI(c).isDefined // marked, nothing deleted
          }
          if (done) return
        case None => ()
      }
      dAn(p) match {
        case Some(c) =>
          cut(c)
          possessives(end) match {
            case Some(c2) =>
              cut(c2)
              lAr(end).foreach { c3 => cut(c3); chainBeforeKi(end) }
            case None =>
              lAr(end) match {
                case Some(c2) => cut(c2); chainBeforeKi(end); ()
                case None => chainBeforeKi(end); ()
              }
          }
          return
        case None => ()
      }
      nUn(p).orElse(ylA(p)) match {
        case Some(c) =>
          cut(c)
          // lAr+chain, else possessive/sU(+lAr+chain), else chain
          val viaLar = lAr(end) match {
            case Some(c2) => cut(c2); chainBeforeKi(end)
            case None => false
          }
          if (!viaLar) {
            possessives(end).orElse(sU(end)) match {
              case Some(c2) =>
                cut(c2)
                lAr(end).foreach { c3 => cut(c3); chainBeforeKi(end) }
              case None => chainBeforeKi(end); ()
            }
          }
          return
        case None => ()
      }
      lArI(p) match {
        case Some(c) => cut(c); return
        case None => ()
      }
      if (chainBeforeKi(end)) return
      dA(p).orElse(yU(p)).orElse(yA(p)) match {
        case Some(c) =>
          cut(c)
          possessives(end) match {
            case Some(c2) =>
              cut(c2)
              lAr(end).foreach(cut) // optional lAr after the possessive
              chainBeforeKi(end); () // chain runs either way (swallowed)
            case None =>
              lAr(end) match {
                case Some(c2) => cut(c2); chainBeforeKi(end); ()
                case None => () // neither → the whole try is swallowed
              }
          }
          return
        case None => ()
      }
      possessives(p).orElse(sU(p)).foreach { c =>
        cut(c)
        lAr(end).foreach { c2 => cut(c2); chainBeforeKi(end) }
      }
    }

    // ---- pipeline ----
    stemNominalVerb()
    if (!continueNoun) return w // nominal lAr branch ends stemming
    stemNoun()
    // postlude — skipped entirely for the reserved words
    if (w != "ad" && w != "soyad") {
      if (w.endsWith("d") || w.endsWith("g")) {
        // append the high vowel harmonizing with the last vowel
        var i = w.length - 1
        while (i >= 0 && !trVowels(w.charAt(i))) i -= 1
        if (i >= 0) w += (w.charAt(i) match {
          case 'a' | 'ı' => "ı"
          case 'e' | 'i' => "i"
          case 'o' | 'u' => "u"
          case _ => "ü"
        })
      }
      if (w.nonEmpty) w.last match {
        case 'b' => w = w.dropRight(1) + "p"
        case 'c' => w = w.dropRight(1) + "ç"
        case 'd' => w = w.dropRight(1) + "t"
        case 'ğ' => w = w.dropRight(1) + "k"
        case _ => ()
      }
    }
    w
  }

  // =========================================================================
  // FINNISH (snowball "finnish" algorithm)
  // =========================================================================

  private val fiV1 = "aeiouyäö".toSet
  private val fiV2 = "aeiouäö".toSet
  private val fiAEI = "aeiä".toSet
  private val fiLong = Seq("aa", "ee", "ii", "oo", "uu", "ää", "öö")

  def finnish(word0: String): String = {
    var w = word0.toLowerCase
    if (w.isEmpty) return w
    val r1 = standardR(w, 0, fiV1)
    val r2 = standardR(w, r1, fiV1)
    def inR1(pos: Int) = pos >= r1
    def inR2(pos: Int) = pos >= r2
    var endingRemoved = false
    // suffix matching is limited to the region (a straddling longer
    // suffix is not a candidate), but preceded-by tests are not
    def longestIn(sufs: Seq[String], region: Int => Boolean,
        all: Boolean = false): Seq[String] = {
      val cands = sufs.filter(s =>
        w.endsWith(s) && region(w.length - s.length)).sortBy(-_.length)
      if (all) cands else cands.take(1)
    }

    // ---- particle etc. ----
    longestIn(Seq("kaan", "kään", "sti", "kin", "han", "hän", "ko",
      "kö", "pa", "pä"), inR1).foreach { s =>
      val pos = w.length - s.length
      val ok =
        if (s == "sti") inR2(pos)
        else pos > 0 && (fiV1(w.charAt(pos - 1)) ||
          w.charAt(pos - 1) == 'n' || w.charAt(pos - 1) == 't')
      if (ok) w = w.dropRight(s.length)
    }

    // ---- possessive ----
    longestIn(Seq("nsa", "nsä", "mme", "nne", "ni", "si", "an", "än",
      "en"), inR1).foreach { s =>
      val base = w.dropRight(s.length)
      s match {
        case "si" =>
          if (!base.endsWith("k")) w = base
        case "ni" =>
          w = base
          if (w.endsWith("kse")) w = w.dropRight(1) + "i"
        case "nsa" | "nsä" | "mme" | "nne" => w = base
        case "an" =>
          if (Seq("lla", "ssa", "sta", "lta", "ta", "na")
              .exists(base.endsWith)) w = base
        case "än" =>
          if (Seq("llä", "ssä", "stä", "ltä", "tä", "nä")
              .exists(base.endsWith)) w = base
        case _ => // "en"
          if (Seq("lle", "ine").exists(base.endsWith)) w = base
      }
    }

    // ---- case endings. seen/siin/den/tten carry their precondition
    // INSIDE the among (a failed gate falls back to the next-longest
    // candidate); the other conditions live in the action (a failure
    // ends the step with no fallback) ----
    val caseCands = longestIn(Seq("han", "hen", "hin", "hon", "hän",
      "hön", "lla", "llä", "ssa", "ssä", "sta", "stä", "lta", "ltä",
      "tta", "ttä", "lle", "ine", "ksi", "na", "nä", "ta", "tä", "a",
      "ä", "n", "seen", "siin", "den", "tten"), inR1, all = true)
    caseCands.find { s =>
      val base = w.dropRight(s.length)
      s match {
        case "seen" => fiLong.exists(base.endsWith) // after a long vowel
        case "siin" | "den" | "tten" => // after Vi (a V2 vowel then i)
          base.length >= 2 && base.endsWith("i") &&
            fiV2(base.charAt(base.length - 2))
        case _ => true
      }
    }.foreach { s =>
      val pos = w.length - s.length
      val base = w.dropRight(s.length)
      s match {
        case "seen" | "siin" | "den" | "tten" =>
          w = base; endingRemoved = true
        case "han" | "hen" | "hin" | "hon" | "hän" | "hön" =>
          // the harmonizing vowel must precede: ahan, ehen, ihin, …
          val want = Map("han" -> "a", "hen" -> "e", "hin" -> "i",
            "hon" -> "o", "hän" -> "ä", "hön" -> "ö")(s)
          if (base.endsWith(want)) { w = base; endingRemoved = true }
        case "a" | "ä" =>
          // preceded by consonant + vowel
          if (pos >= 2 && fiV1(w.charAt(pos - 1)) &&
              !fiV1(w.charAt(pos - 2))) {
            w = base; endingRemoved = true
          }
        case "tta" | "ttä" =>
          if (base.endsWith("e")) { w = base; endingRemoved = true }
        case "n" =>
          // delete n; a preceding long vowel or "ie" loses its last
          // letter too
          val extra =
            if (fiLong.exists(base.endsWith) || base.endsWith("ie")) 1
            else 0
          w = w.substring(0, pos - extra)
          endingRemoved = true
        case _ =>
          w = base; endingRemoved = true
      }
    }

    // ---- other endings (in R2) ----
    longestIn(Seq("impi", "impa", "impä", "immi", "imma", "immä",
      "mpi", "mpa", "mpä", "mmi", "mma", "mmä", "eja", "ejä"), inR2)
      .foreach { s =>
        val base = w.dropRight(s.length)
        val comparative = Set("mpi", "mpa", "mpä", "mmi", "mma", "mmä")
        if (!comparative(s) || !base.endsWith("po")) w = base
      }

    // ---- plurals ----
    if (endingRemoved) {
      // i_plural: final i or j in R1
      if (w.nonEmpty && (w.last == 'i' || w.last == 'j') &&
          inR1(w.length - 1))
        w = w.dropRight(1)
    } else {
      // t_plural: final t in R1 after a vowel …
      if (w.endsWith("t") && inR1(w.length - 1) && w.length >= 2 &&
          fiV1(w.charAt(w.length - 2))) {
        w = w.dropRight(1)
        // … then a final mma/imma in R2 (mma not after po)
        longestIn(Seq("imma", "mma"), inR2).foreach { s =>
          val base = w.dropRight(s.length)
          if (s == "imma" || !base.endsWith("po")) w = base
        }
      }
    }

    // ---- tidying up (each sub-step within R1) ----
    if (fiLong.exists(s => w.endsWith(s) && inR1(w.length - 2)))
      w = w.dropRight(1)
    if (w.length >= 2 && fiAEI(w.last) && inR1(w.length - 2) &&
        !fiV1(w.charAt(w.length - 2)))
      w = w.dropRight(1)
    if ((w.endsWith("oj") || w.endsWith("uj")) && inR1(w.length - 2))
      w = w.dropRight(1)
    if (w.endsWith("jo") && inR1(w.length - 2))
      w = w.dropRight(1)
    // undouble a final double consonant followed by zero or more vowels
    locally {
      var i = w.length - 1
      while (i >= 0 && fiV1(w.charAt(i))) i -= 1
      if (i >= 1 && !fiV1(w.charAt(i)) && w.charAt(i - 1) == w.charAt(i))
        w = w.substring(0, i) + w.substring(i + 1)
    }
    w
  }

  // =========================================================================
  // HUNGARIAN (snowball "hungarian" algorithm)
  // =========================================================================

  private val huVowels = "aáeéiíoóöőuúüű".toSet
  private val huDigraphs = Seq("dzs", "cs", "gy", "ly", "ny", "sz", "ty", "zs")
  private val huDoubles = Seq("ccs", "ggy", "lly", "nny", "ssz", "tty",
    "zzs", "bb", "cc", "dd", "ff", "gg", "jj", "kk", "ll", "mm", "nn",
    "pp", "rr", "ss", "tt", "vv", "zz")

  def hungarian(word0: String): String = {
    var w = word0.toLowerCase
    if (w.isEmpty) return w
    // R1: after the first consonant (or consonant digraph) when the
    // word starts with a vowel; after the first vowel otherwise
    val r1 = {
      if (huVowels(w.charAt(0))) {
        val c = w.indexWhere(ch => !huVowels(ch))
        if (c < 0) w.length
        else huDigraphs.find(d => w.startsWith(d, c)) match {
          case Some(d) => c + d.length
          case None => c + 1
        }
      } else {
        val v = w.indexWhere(huVowels)
        if (v < 0) w.length else v + 1
      }
    }
    def inR1(pos: Int) = pos >= r1
    def endsDouble(s: String) = huDoubles.exists(s.endsWith)
    // "remove one of the double consonant": deleting the second-to-last
    // character handles both plain doubles (ll → l) and doubled
    // digraphs (nny → ny, ssz → sz)
    def undouble(s: String) =
      if (s.length >= 2) s.substring(0, s.length - 2) + s.last else s
    def vEnding(): Unit =
      if (w.endsWith("á") && inR1(w.length - 1)) w = w.dropRight(1) + "a"
      else if (w.endsWith("é") && inR1(w.length - 1)) w = w.dropRight(1) + "e"
    /** longest suffix of `m` matching; if in R1, apply: Some(repl) →
      * replace, None → delete. Suffixes carrying á/é revert them. */
    def among(m: Seq[(String, Option[String])]): Unit =
      m.filter { case (s, _) => w.endsWith(s) }
        .sortBy { case (s, _) => -s.length }.headOption
        .foreach { case (s, act) =>
          if (inR1(w.length - s.length))
            w = w.dropRight(s.length) + act.getOrElse("")
        }
    def D = None: Option[String]
    def A = Some("a"); def E = Some("e")

    // instrumental case: al/el in R1 after a double consonant
    Seq("al", "el").find(s => w.endsWith(s) && inR1(w.length - 2))
      .foreach { _ =>
        val base = w.dropRight(2)
        if (endsDouble(base)) w = undouble(base)
      }
    // frequent cases, then revert a lengthened final vowel
    locally {
      val cases = Seq("ba", "ra", "be", "re", "ig", "nak", "nek", "val",
        "vel", "ul", "ből", "ről", "től", "nál", "nél", "ból", "ról",
        "tól", "ül", "n", "an", "ban", "en", "ben", "képpen", "on",
        "ön", "képp", "kor", "t", "at", "et", "ként", "anként",
        "enként", "onként", "ot", "ért", "öt", "hez", "hoz", "höz",
        "vá", "vé")
      val before = w
      among(cases.map(s => (s, D)))
      if (w != before) vEnding()
    }
    // special and other case forms
    among(Seq(("én", E), ("án", A), ("ánként", A)))
    among(Seq(("astul", D), ("estül", D), ("stul", D), ("stül", D),
      ("ástul", A), ("éstül", E)))
    // factive case: á/é in R1 after a double consonant
    Seq("á", "é").find(s => w.endsWith(s) && inR1(w.length - 1))
      .foreach { _ =>
        val base = w.dropRight(1)
        if (endsDouble(base)) w = undouble(base)
      }
    // owned, singular owner, plural owner, plural
    among(Seq(("aké", D), ("eké", D), ("oké", D), ("öké", D),
      ("éké", E), ("áké", A), ("ké", D), ("ééi", E), ("áéi", A),
      ("éi", D), ("éé", E), ("é", D)))
    among(Seq(("unk", D), ("ünk", D), ("ánk", A), ("énk", E),
      ("nk", D), ("ájuk", A), ("éjük", E), ("juk", D), ("jük", D),
      ("uk", D), ("ük", D), ("am", D), ("em", D), ("om", D),
      ("ám", A), ("ém", E), ("m", D), ("ad", D), ("ed", D),
      ("od", D), ("öd", D), ("ád", A), ("éd", E), ("d", D),
      ("ja", D), ("je", D), ("a", D), ("e", D), ("o", D),
      ("á", A), ("é", E)))
    among(Seq(("jaim", D), ("jeim", D), ("aim", D), ("eim", D),
      ("áim", A), ("éim", E), ("im", D), ("jaid", D), ("jeid", D),
      ("aid", D), ("eid", D), ("áid", A), ("éid", E), ("id", D),
      ("jai", D), ("jei", D), ("ai", D), ("ei", D), ("ái", A),
      ("éi", E), ("i", D), ("jaink", D), ("jeink", D), ("aink", D),
      ("eink", D), ("áink", A), ("éink", E), ("ink", D),
      ("jaitok", D), ("jeitek", D), ("aitok", D), ("eitek", D),
      ("áitok", A), ("éitek", E), ("itek", D), ("jaik", D),
      ("jeik", D), ("aik", D), ("eik", D), ("áik", A), ("éik", E),
      ("ik", D)))
    among(Seq(("ák", A), ("ék", E), ("ök", D), ("ok", D), ("ek", D),
      ("ak", D), ("k", D)))
    w
  }

  // =========================================================================
  // ROMANIAN (snowball "romanian" algorithm; cedilla forms ş/ţ as in
  // the reference's vendored tables)
  // =========================================================================

  private val roVowels = "aăâeiîou".toSet

  def romanian(word0: String): String = {
    var w = word0.toLowerCase
    if (w.isEmpty) return w
    // prelude: i/u between vowels become consonants I/U
    locally {
      val sb = new StringBuilder(w)
      def v(j: Int) = j >= 0 && j < sb.length && roVowels(sb.charAt(j))
      var c = 0
      while (c < sb.length - 2) {
        val m = sb.charAt(c + 1)
        if (v(c) && (m == 'u' || m == 'i') && v(c + 2)) {
          sb.setCharAt(c + 1, m.toUpper); c += 2
        } else c += 1
      }
      w = sb.toString
    }
    val rv = romanceRV(w, roVowels)
    val r1 = standardR(w, 0, roVowels)
    val r2 = standardR(w, r1, roVowels)
    def inRV(pos: Int) = pos >= rv
    def inR1(pos: Int) = pos >= r1
    def inR2(pos: Int) = pos >= r2

    // ---- step 0: removal of plurals (in R1; longest match) ----
    locally {
      val rules: Seq[(String, String => Option[String])] = {
        def repl(to: String)(sufs: String*) = sufs.map { s =>
          s -> ((x: String) =>
            if (inR1(x.length - s.length))
              Some(x.dropRight(s.length) + to) else None)
        }
        repl("")("ul", "ului") ++ repl("a")("aua") ++
          repl("e")("ea", "ele", "elor") ++
          repl("i")("ii", "iua", "iei", "iile", "ilor", "iilor") ++
          Seq("ile" -> ((x: String) =>
            if (inR1(x.length - 3) &&
                !(x.length >= 5 && x.regionMatches(x.length - 5, "ab", 0, 2)))
              Some(x.dropRight(3) + "i") else None)) ++
          repl("at")("atei") ++ repl("aţi")("aţie", "aţia")
      }
      rules.filter { case (s, _) => w.endsWith(s) }
        .sortBy { case (s, _) => -s.length }.headOption
        .foreach { case (_, f) => f(w).foreach(w = _) }
    }

    // ---- steps 1+2: combining suffixes (repeat) then standard ----
    var suffixRemoved = false
    locally {
      // step 1: reduce combining suffixes in R1 until none replaces
      val combos: Seq[(String, String)] = Seq(
        "abilitate" -> "abil", "abilitati" -> "abil",
        "abilităi" -> "abil", "abilităţi" -> "abil",
        "ibilitate" -> "ibil",
        "ivitate" -> "iv", "ivitati" -> "iv", "ivităi" -> "iv",
        "ivităţi" -> "iv",
        "icitate" -> "ic", "icitati" -> "ic", "icităi" -> "ic",
        "icităţi" -> "ic", "icator" -> "ic", "icatori" -> "ic",
        "iciv" -> "ic", "iciva" -> "ic", "icive" -> "ic",
        "icivi" -> "ic", "icivă" -> "ic", "ical" -> "ic",
        "icala" -> "ic", "icale" -> "ic", "icali" -> "ic",
        "icală" -> "ic",
        "ativ" -> "at", "ativa" -> "at", "ative" -> "at",
        "ativi" -> "at", "ativă" -> "at", "aţiune" -> "at",
        "atoare" -> "at", "ator" -> "at", "atori" -> "at",
        "ătoare" -> "at", "ător" -> "at", "ători" -> "at",
        "itiv" -> "it", "itiva" -> "it", "itive" -> "it",
        "itivi" -> "it", "itivă" -> "it", "iţiune" -> "it",
        "itoare" -> "it", "itor" -> "it", "itori" -> "it")
      var changed = true
      while (changed) {
        changed = false
        combos.filter { case (s, _) => w.endsWith(s) }
          .sortBy { case (s, _) => -s.length }.headOption
          .foreach { case (s, to) =>
            if (inR1(w.length - s.length)) {
              w = w.dropRight(s.length) + to
              suffixRemoved = true
              changed = true
            }
          }
      }
      // step 2: standard suffixes in R2 (longest match)
      val del = Seq("abila", "abile", "abili", "abilă", "ibila", "ibile",
        "ibili", "ibilă", "itate", "itati", "ităţi", "atori", "oasa",
        "oasă", "oase", "abil", "ibil", "ator", "ităi", "anta", "ante",
        "anti", "antă", "ata", "ate", "ati", "ată", "ica", "ice", "ici",
        "ică", "ita", "ite", "iti", "ită", "osi", "oşi", "uta", "ute",
        "uti", "ută", "iva", "ive", "ivi", "ivă", "ant", "os", "at",
        "it", "ut", "iv", "ic")
      val ist = Seq("isme", "ista", "iste", "isti", "istă", "işti",
        "ism", "ist")
      val iune = Seq("iune", "iuni")
      val cands =
        (del.map(s => (s, 'd')) ++ ist.map(s => (s, 'i')) ++
          iune.map(s => (s, 't'))).filter { case (s, _) => w.endsWith(s) }
      cands.sortBy { case (s, _) => -s.length }.headOption.foreach {
        case (s, 'd') =>
          if (inR2(w.length - s.length)) {
            w = w.dropRight(s.length); suffixRemoved = true
          }
        case (s, 'i') =>
          if (inR2(w.length - s.length)) {
            w = w.dropRight(s.length) + "ist"; suffixRemoved = true
          }
        case (s, _) =>
          // iune/iuni: delete if in R2 and preceded by ţ → replace ţ by t
          val pos = w.length - s.length
          if (inR2(pos) && pos > 0 && w.charAt(pos - 1) == 'ţ') {
            w = w.dropRight(s.length + 1) + "t"; suffixRemoved = true
          }
      }
    }

    // ---- step 3: verb suffixes (only if steps 1-2 removed nothing);
    // longest in RV; group 1 also needs a consonant or u before it
    // (that character itself inside RV) ----
    if (!suffixRemoved) {
      val g1 = Seq("aserăţi", "iserăţi", "userăţi",
        "âserăţi", "aserăm", "iserăm", "userăm", "âserăm",
        "ească", "aseră", "iseră", "useră", "âseră",
        "aseşi", "iseşi", "useşi", "âseşi", "arăţi",
        "irăţi", "urăţi", "ârăţi", "eaţi", "iaţi", "arăm", "irăm",
        "urăm", "ârăm", "asem", "isem", "usem", "âsem",
        "ează", "eşte", "ăşte", "eşti", "ăşti", "indu", "ându",
        "ară", "iră", "ură", "âră", "ase", "ise", "use", "âse",
        "eai", "iai", "aşi", "işi", "uşi", "âşi", "eam", "iam",
        "eau", "iau", "esc", "ăsc", "ind", "ând", "are", "ere",
        "ire", "âre", "eze", "ezi", "ea", "ia", "ai", "ui", "âi",
        "am", "au", "ez")
      val g2 = Seq("seserăţi", "serăţi", "seserăm", "serăm", "seseră",
        "seră", "seseşi", "seşi", "sesem", "sese", "aţi", "eţi",
        "iţi", "âţi", "sei", "ăm", "em", "im", "âm", "se")
      val cands = (g1.map(s => (s, true)) ++ g2.map(s => (s, false)))
        .filter { case (s, _) =>
          w.endsWith(s) && inRV(w.length - s.length) }
      cands.sortBy { case (s, _) => -s.length }.headOption.foreach {
        case (s, needsCons) =>
          val pos = w.length - s.length
          if (!needsCons || (pos - 1 >= rv && {
            val p = w.charAt(pos - 1)
            !roVowels(p) || p == 'u'
          })) w = w.dropRight(s.length)
      }
    }

    // ---- step 4: final vowel — the LONGEST of a/e/ie/i/ă is matched
    // first and only then tested against RV (a longest match outside
    // RV ends the step; no fallback to a shorter suffix) ----
    Seq("ie", "a", "e", "i", "ă")
      .filter(w.endsWith).sortBy(-_.length).headOption
      .foreach(s => if (inRV(w.length - s.length)) w = w.dropRight(s.length))

    w.map { case 'I' => 'i'; case 'U' => 'u'; case c => c }
  }

  def swedish(word0: String): String = {
    var w = word0.toLowerCase
    if (w.isEmpty) return w
    val r1 = scandiR1(w, svVowels)
    def inR1(pos: Int) = pos >= r1
    val sEnding = "bcdfghjklmnoprtvy".toSet

    // ---- step 1 ----
    locally {
      val inventory = Seq("a", "arna", "erna", "heterna", "orna", "ad",
        "e", "ade", "ande", "arne", "are", "aste", "en", "anden",
        "aren", "heten", "ern", "ar", "er", "heter", "or", "as",
        "arnas", "ernas", "ornas", "es", "ades", "andes", "ens",
        "arens", "hetens", "erns", "at", "andet", "het", "ast")
      val cands = (inventory.map(s => (s, 'd')) ++ Seq(("s", 's')))
        .filter { case (s, _) =>
          w.endsWith(s) && inR1(w.length - s.length) }
      cands.sortBy { case (s, _) => -s.length }.headOption.foreach {
        case (s, 'd') => w = w.dropRight(s.length)
        case (_, _) =>
          if (w.length >= 2 && sEnding(w.charAt(w.length - 2)))
            w = w.dropRight(1)
      }
    }
    // ---- step 2 ----
    if (Seq("dd", "gd", "nn", "dt", "gt", "kt", "tt").exists(s =>
        w.endsWith(s) && inR1(w.length - 2)))
      w = w.dropRight(1)
    // ---- step 3 ----
    locally {
      val cands = Seq(("fullt", 'f'), ("löst", 'l'), ("lig", 'd'),
        ("els", 'd'), ("ig", 'd'))
        .filter { case (s, _) =>
          w.endsWith(s) && inR1(w.length - s.length) }
      cands.sortBy { case (s, _) => -s.length }.headOption.foreach {
        case (s, 'd') => w = w.dropRight(s.length)
        case (_, _) => w = w.dropRight(1) // fullt → full, löst → lös
      }
    }
    w
  }
}
