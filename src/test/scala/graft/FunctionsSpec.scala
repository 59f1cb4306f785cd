package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Tables
import graft.functions.{MathFunctions => M, TextFunctions => T, VectorFunctions => V}

class FunctionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"
  private def docs = Tables.documents(spark, sf)

  test("native SimHash64 expression matches interpreted reference") {
    val n = docs.select(
      T.simHash64(col("text")).as("fast"),
      T.simHash64Reference(col("text")).as("ref"))
      .filter(col("fast") =!= col("ref")).count()
    assert(n === 0)
  }

  test("native MinHashSig expression matches interpreted reference") {
    val n = docs.limit(100).select(
      T.minHashSignature(col("text"), 16, 3).as("fast"),
      T.minHashSignatureReference(col("text"), 16, 3).as("ref"))
      .filter(col("fast") =!= col("ref")).count()
    assert(n === 0)
  }

  test("native ShingleHashes expression matches interpreted reference") {
    val n = docs.limit(200).select(
      T.shingleHashes(col("text"), 3).as("fast"),
      T.shingleHashesReference(col("text"), 3).as("ref"))
      .filter(col("fast") =!= col("ref")).count()
    assert(n === 0)
    // short-doc path: fewer tokens than n -> single whole-doc shingle
    val short = docs.sparkSession.sql("SELECT 'one two' AS text")
    val s = short.select(
      T.shingleHashes(col("text"), 3).as("fast"),
      T.shingleHashesReference(col("text"), 3).as("ref")).head()
    assert(s.getSeq[Long](0) === s.getSeq[Long](1) && s.getSeq[Long](0).size === 1)
  }

  test("Porter stemmer matches the published algorithm's sample pairs") {
    // vocabulary pairs from Porter 1980 (sections 1a-5b examples)
    val pairs = Seq(
      "caresses" -> "caress", "ponies" -> "poni", "ties" -> "ti",
      "caress" -> "caress", "cats" -> "cat", "feed" -> "feed",
      "agreed" -> "agre", "plastered" -> "plaster", "bled" -> "bled",
      "motoring" -> "motor", "sing" -> "sing", "conflated" -> "conflat",
      "troubled" -> "troubl", "sized" -> "size", "hopping" -> "hop",
      "tanned" -> "tan", "falling" -> "fall", "hissing" -> "hiss",
      "fizzed" -> "fizz", "failing" -> "fail", "filing" -> "file",
      "happy" -> "happi", "sky" -> "sky",
      "relational" -> "relat", "conditional" -> "condit",
      "rational" -> "ration", "valenci" -> "valenc",
      "hesitanci" -> "hesit", "digitizer" -> "digit",
      "conformabli" -> "conform", "radicalli" -> "radic",
      "differentli" -> "differ", "vileli" -> "vile",
      "analogousli" -> "analog", "vietnamization" -> "vietnam",
      "predication" -> "predic", "operator" -> "oper",
      "feudalism" -> "feudal", "decisiveness" -> "decis",
      "hopefulness" -> "hope", "callousness" -> "callous",
      "formaliti" -> "formal", "sensitiviti" -> "sensit",
      "sensibiliti" -> "sensibl",
      "triplicate" -> "triplic", "formative" -> "form",
      "formalize" -> "formal", "electriciti" -> "electr",
      "electrical" -> "electr", "hopeful" -> "hope",
      "goodness" -> "good",
      "generalizations" -> "gener", "oscillators" -> "oscil",
      "revival" -> "reviv", "allowance" -> "allow",
      "inference" -> "infer", "airliner" -> "airlin",
      "gyroscopic" -> "gyroscop", "adjustable" -> "adjust",
      "defensible" -> "defens", "irritant" -> "irrit",
      "replacement" -> "replac", "adjustment" -> "adjust",
      "dependent" -> "depend", "adoption" -> "adopt",
      "communism" -> "commun", "activate" -> "activ",
      "effective" -> "effect", "bowdlerize" -> "bowdler",
      "probate" -> "probat", "rate" -> "rate", "cease" -> "ceas",
      "controll" -> "control", "roll" -> "roll")
    pairs.foreach { case (in, want) =>
      val got = graft.functions.PorterStemmer.stem(in)
      assert(got === want, s"stem($in) = $got, want $want")
    }
    // the native expression agrees with the Scala function over a corpus
    import org.apache.spark.sql.functions.explode
    val viaExpr = docs.limit(50)
      .select(explode(T.tokens(col("text"))).as("t"))
      .select(col("t"), graft.operators.TextAnalysis.stem(col("t")).as("s"))
      .collect()
    viaExpr.foreach { r =>
      assert(r.getString(1) === graft.functions.PorterStemmer.stem(r.getString(0)))
    }
  }

  test("Snowball stemmers (french/german/spanish) match libstemmer output") {
    import graft.functions.SnowballStemmer
    // pairs produced by the reference's vendored libstemmer
    // (ext/libstemmer) — the full implementations are additionally
    // differential-tested against it on 45k fuzz words offline
    val german = Seq(
      "häuser" -> "haus", "katzen" -> "katz", "bücher" -> "buch",
      "freundlichkeit" -> "freundlich", "möglichkeiten" -> "moglich",
      "unabhängigkeit" -> "unabhang", "bedeutungen" -> "bedeut",
      "spielern" -> "spiel", "gearbeitet" -> "gearbeitet",
      "regierungen" -> "regier", "geschwindigkeit" -> "geschwind",
      "wissenschaftlich" -> "wissenschaft", "verantwortung" -> "verantwort",
      "grundsätzlich" -> "grundsatz", "ständig" -> "standig",
      "fertig" -> "fertig", "richtig" -> "richtig", "komisch" -> "komisch",
      "gegend" -> "gegend", "für" -> "fur", "menschen" -> "mensch",
      "länder" -> "land", "freundin" -> "freundin",
      "persönlichkeit" -> "person", "verständnisse" -> "verstandnis")
    val spanish = Seq(
      "canciones" -> "cancion", "caminando" -> "camin",
      "trabajadores" -> "trabaj", "hablaban" -> "habl",
      "nacionales" -> "nacional", "rápidamente" -> "rapid",
      "universidad" -> "univers", "comunicaciones" -> "comun",
      "administración" -> "administr", "tecnología" -> "tecnolog",
      "solución" -> "solucion", "presencia" -> "presenci",
      "creativos" -> "creativ", "activo" -> "activ", "hermoso" -> "hermos",
      "niños" -> "niñ", "leyendo" -> "leyend", "venderla" -> "vend",
      "dijeron" -> "dijeron", "hubiésemos" -> "hub", "amaba" -> "amab",
      "partía" -> "part", "años" -> "años", "es" -> "es",
      "corazones" -> "corazon", "llegué" -> "lleg",
      "escribiéndole" -> "escrib", "averigüe" -> "averigü")
    val french = Seq(
      "continuation" -> "continu", "chienne" -> "chien",
      "majestueusement" -> "majestu", "nationaux" -> "national",
      "administration" -> "administr", "organisation" -> "organis",
      "naturellement" -> "naturel", "heureusement" -> "heureux",
      "possibilité" -> "possibil", "activité" -> "activ",
      "objectif" -> "object", "créatives" -> "créativ",
      "biologies" -> "biolog", "technologies" -> "technolog",
      "évolution" -> "évolu", "prudemment" -> "prudent",
      "simplement" -> "simpl", "finir" -> "fin", "grandissant" -> "grand",
      "mangeait" -> "mang", "parlerons" -> "parl", "donnasses" -> "don",
      "particulier" -> "particuli", "journaux" -> "journal",
      "est" -> "est", "bien" -> "bien", "beaux" -> "beau",
      "amis" -> "amis", "royaumes" -> "royaum", "yeux" -> "yeux",
      "ciguë" -> "cigu", "aiguë" -> "aiguë", "voyons" -> "voyon")
    for ((lang, pairs) <- Seq("german" -> german, "spanish" -> spanish,
        "french" -> french); (in, want) <- pairs) {
      val got = SnowballStemmer.stem(lang, in)
      assert(got === want, s"$lang stem($in) = $got, want $want")
    }
    // english dispatches to the Porter implementation
    assert(SnowballStemmer.stem("english", "generalizations") === "gener")
    // unsupported languages fail with the reference's creation-time
    // error (`plugins/nlp/nlp.cc:277`)
    val err = intercept[IllegalArgumentException] {
      SnowballStemmer.validate("klingon")
    }
    assert(err.getMessage ===
      "language `klingon' not available for stemming in encoding `utf8'")
    // the native expression agrees with the Scala function
    val viaExpr = docs.sparkSession.sql(
      "SELECT 'continuation' AS t UNION ALL SELECT 'chienne'")
      .select(graft.plans.SnowballStem.column(col("t"), "french").as("s"))
      .collect().map(_.getString(0)).sorted
    assert(viaExpr === Array("chien", "continu"))
  }

  test("Snowball stemmers (portuguese/italian/dutch/russian) match " +
      "libstemmer output") {
    import graft.functions.SnowballStemmer
    // pairs produced by the reference's vendored libstemmer
    // (ext/libstemmer) — each implementation is additionally
    // differential-tested against it on 9k-26k fuzz words offline
    // (0 mismatches at round 13)
    val portuguese = Seq(
      "nações" -> "naçõ", "quilométricas" -> "quilométr",
      "bonecas" -> "bonec", "amorosa" -> "amor", "felizmente" -> "feliz",
      "rapidamente" -> "rapid", "trabalhadores" -> "trabalh",
      "comunicações" -> "comunic", "administração" -> "administr",
      "universidade" -> "univers", "possibilidades" -> "possibil",
      "cantando" -> "cant", "cantaria" -> "cant", "bebeu" -> "beb",
      "partiu" -> "part", "falávamos" -> "fal", "vivêssemos" -> "viv",
      "proposição" -> "proposiçã", "coração" -> "coraçã",
      "corações" -> "coraçõ", "segurança" -> "seguranc",
      "lógica" -> "lógic", "biologia" -> "biolog", "solução" -> "soluçã",
      "soluções" -> "soluçõ", "presença" -> "presenc",
      "ciência" -> "ciênc", "criativos" -> "criativ",
      "atividade" -> "ativ", "felicidade" -> "felic",
      "amabilidade" -> "amabil", "primeira" -> "primeir",
      "carreira" -> "carreir", "cheguei" -> "chegu", "guerra" -> "guerr",
      "portuguesa" -> "portugues", "é" -> "é", "são" -> "sã",
      "grandes" -> "grand", "amigos" -> "amig")
    val italian = Seq(
      "nazione" -> "nazion", "nazioni" -> "nazion",
      "abitazione" -> "abit", "comunicazione" -> "comun",
      "rapidamente" -> "rapid", "felicemente" -> "felic",
      "lavoratori" -> "lavor", "lavoratrice" -> "lavor",
      "università" -> "univers", "possibilità" -> "possibil",
      "attività" -> "attiv", "cantando" -> "cant",
      "canterebbero" -> "cant", "mangiava" -> "mang",
      "parlavano" -> "parl", "guardarci" -> "guard",
      "mangiarlo" -> "mang", "dirglielo" -> "dirgliel",
      "amici" -> "amic", "logica" -> "logic", "biologia" -> "biolog",
      "tecnologie" -> "tecnolog", "soluzione" -> "soluzion",
      "presenza" -> "presenz", "scienza" -> "scienz",
      "esperienza" -> "esperient", "creativi" -> "creat",
      "attivo" -> "attiv", "pensieri" -> "pensier",
      "ragazzi" -> "ragazz", "italiano" -> "ital", "quiete" -> "qui",
      "città" -> "citt", "perché" -> "perc", "è" -> "è",
      "propaganda" -> "propagand")
    val dutch = Seq(
      "lichamelijk" -> "licham", "lichamelijkheden" -> "licham",
      "mogelijkheden" -> "mogelijk", "kinderen" -> "kinder",
      "huizen" -> "huiz", "katten" -> "kat", "boeken" -> "boek",
      "vrienden" -> "vriend", "werkte" -> "werkt", "werkten" -> "werkt",
      "gewerkt" -> "gewerkt", "lopend" -> "lopend",
      "snelheid" -> "snelheid", "grootste" -> "grootst",
      "kleinere" -> "kleiner", "mooiste" -> "mooist",
      "verjaardag" -> "verjaardag", "bijzondere" -> "bijzonder",
      "aanbieding" -> "aanbied", "ogenblikkelijk" -> "ogenblik",
      "koninklijke" -> "konink", "belangrijkste" -> "belangrijkst",
      "gemeente" -> "gemeent", "bedrijven" -> "bedrijv",
      "problemen" -> "problem", "mogelijk" -> "mogelijk",
      "natuurlijk" -> "natur", "waarschijnlijk" -> "waarschijn",
      "maan" -> "man", "manen" -> "man", "brood" -> "brod",
      "broden" -> "brod", "bomen" -> "bom", "lopen" -> "lop",
      "gelopen" -> "gelop", "meisje" -> "meisj", "vrouwen" -> "vrouw",
      "duidelijke" -> "duidelijk", "afspraken" -> "afsprak",
      "gesprekken" -> "gesprek")
    val russian = Seq(
      "работает" -> "работа", "работала" -> "работа",
      "работающий" -> "работа", "книгами" -> "книг", "книги" -> "книг",
      "делал" -> "дела", "делавший" -> "дела", "говорил" -> "говор",
      "красивые" -> "красив", "красивейший" -> "красив",
      "новости" -> "новост", "новостей" -> "новост",
      "стариков" -> "старик", "дружба" -> "дружб",
      "любовь" -> "любов", "мысли" -> "мысл", "страны" -> "стран",
      "странами" -> "стран", "важность" -> "важност",
      "важностью" -> "важност", "исследование" -> "исследован",
      "исследования" -> "исследован",
      "государственный" -> "государствен",
      "возможности" -> "возможн", "настоящий" -> "настоя",
      "петербурга" -> "петербург", "человека" -> "человек",
      "людей" -> "люд", "временем" -> "времен", "жизнью" -> "жизн",
      "первый" -> "перв", "большинство" -> "большинств",
      "прекрасное" -> "прекрасн", "удивительно" -> "удивительн",
      "быстрее" -> "быстр", "сильнейший" -> "сильн",
      "нравится" -> "нрав", "остановиться" -> "останов",
      "встречаются" -> "встреча", "продолжение" -> "продолжен")
    for ((lang, pairs) <- Seq("portuguese" -> portuguese,
        "italian" -> italian, "dutch" -> dutch, "russian" -> russian);
        (in, want) <- pairs) {
      val got = SnowballStemmer.stem(lang, in)
      assert(got === want, s"$lang stem($in) = $got, want $want")
      SnowballStemmer.validate(lang) // creatable as a function entity
    }
    // the native expression dispatches the new languages too
    val viaExpr = docs.sparkSession.sql(
      "SELECT 'nações' AS t UNION ALL SELECT 'trabalhadores'")
      .select(graft.plans.SnowballStem.column(col("t"), "portuguese").as("s"))
      .collect().map(_.getString(0)).sorted
    assert(viaExpr === Array("naçõ", "trabalh"))
  }

  test("Snowball stemmers (danish/norwegian/swedish) match libstemmer " +
      "output") {
    import graft.functions.SnowballStemmer
    // pairs produced by the reference's vendored libstemmer; each
    // implementation additionally fuzz-matches it on ~12k words
    // (0 mismatches at round 13). The deliberately odd-looking pairs
    // (naturligvis unchanged, arbeiderne -> arbeidern, fullt/löst kept
    // by the Swedish R1 rule) are verified reference behavior.
    val danish = Seq(
      "mulighederne" -> "mulighed", "kattene" -> "kat",
      "vigtige" -> "vigt", "vigtigst" -> "vigt",
      "arbejderne" -> "arbejd", "følelserne" -> "føl",
      "sikkerhed" -> "sikker", "sikkerheden" -> "sikker",
      "købte" -> "købt", "læreren" -> "lær", "bøgerne" -> "bøg",
      "husene" -> "hus", "underligt" -> "under",
      "undersøgelse" -> "undersøg", "undersøgelser" -> "undersøg",
      "forskellige" -> "forskel", "naturligvis" -> "naturligvis",
      "virkeligheden" -> "virk", "kærlighed" -> "kær",
      "samfundet" -> "samfund", "udviklingen" -> "udvikling",
      "betydning" -> "betydning", "mennesker" -> "mennesk",
      "menneskers" -> "mennesk", "børnene" -> "børn",
      "spørgsmålet" -> "spørgsmål")
    val norwegian = Seq(
      "mulighetene" -> "mul", "kattene" -> "katt", "viktige" -> "vikt",
      "viktigst" -> "viktigst", "arbeiderne" -> "arbeidern",
      "følelsene" -> "føl", "sikkerhet" -> "sikker",
      "sikkerheten" -> "sikker", "kjøpte" -> "kjøpt",
      "læreren" -> "lærer", "bøkene" -> "bøk", "husene" -> "hus",
      "underlig" -> "under", "undersøkelse" -> "undersøk",
      "undersøkelser" -> "undersøk", "forskjellige" -> "forskjel",
      "naturligvis" -> "naturligvis", "virkeligheten" -> "virk",
      "kjærlighet" -> "kjær", "samfunnet" -> "samfunn",
      "utviklingen" -> "utvikling", "betydning" -> "betydning",
      "mennesker" -> "mennesk", "barna" -> "barn",
      "spørsmålet" -> "spørsmål", "hetslov" -> "het",
      "forskningslov" -> "forskning")
    val swedish = Seq(
      "möjligheterna" -> "möj", "katterna" -> "katt",
      "viktiga" -> "vikt", "viktigast" -> "vikt",
      "arbetarna" -> "arbet", "känslorna" -> "känsl",
      "säkerhet" -> "säker", "säkerheten" -> "säker",
      "köpte" -> "köpt", "läraren" -> "lär", "böckerna" -> "böck",
      "husen" -> "hus", "underligt" -> "under",
      "undersökning" -> "undersökning",
      "undersökningar" -> "undersökning", "olika" -> "olik",
      "naturligtvis" -> "naturligtvis", "verkligheten" -> "verk",
      "kärlek" -> "kärlek", "samhället" -> "samhället",
      "utvecklingen" -> "utveckling", "betydelse" -> "betyd",
      "människor" -> "människ", "människors" -> "människor",
      "barnen" -> "barn", "frågorna" -> "fråg", "fullt" -> "fullt",
      "löst" -> "löst", "jämlikhet" -> "jämlik", "klokast" -> "klok")
    val romanian = Seq(
      "lucrează" -> "lucr", "lucrau" -> "lucr", "copiii" -> "copii",
      "copilul" -> "copil", "frumoasă" -> "frumoas",
      "frumoşi" -> "frumoş", "abilitate" -> "abil",
      "abilităţi" -> "abil", "naţiune" -> "naţiun",
      "naţiunea" -> "naţiun", "artişti" -> "artişt",
      "artistul" -> "artist", "cântecele" -> "cântec",
      "cântând" -> "cânt", "vorbesc" -> "vorb", "vorbeam" -> "vorb",
      "muncitorii" -> "muncit", "şcolile" -> "şcol",
      "casele" -> "cas", "oamenii" -> "oamen", "istoria" -> "istor",
      "istorice" -> "istor", "libertate" -> "libert",
      "libertatea" -> "libert", "românesc" -> "român",
      "românească" -> "român", "înţelegere" -> "înţeleg",
      "gândire" -> "gând", "gânduri" -> "gândur", "iubire" -> "iubir",
      "ţara" -> "ţar", "ţării" -> "ţăr",
      "creativitate" -> "creativ", "uşor" -> "uşor",
      "uşoară" -> "uşoar", "puternică" -> "putern",
      "importanţa" -> "importanţ", "importante" -> "import",
      "dezvoltarea" -> "dezvolt")
    for ((lang, pairs) <- Seq("danish" -> danish,
        "norwegian" -> norwegian, "swedish" -> swedish,
        "romanian" -> romanian);
        (in, want) <- pairs) {
      val got = SnowballStemmer.stem(lang, in)
      assert(got === want, s"$lang stem($in) = $got, want $want")
      SnowballStemmer.validate(lang)
    }
  }

  test("Snowball stemmers (hungarian/finnish/turkish) match libstemmer " +
      "output — the full libstemmer language set is now supported") {
    import graft.functions.SnowballStemmer
    // pairs produced by the reference's vendored libstemmer; each
    // implementation additionally fuzz-matches it on 23k-39k words
    // (0 mismatches at round 13)
    val hungarian = Seq(
      "kalapjaim" -> "kalap", "kalapjaink" -> "kalap", "házak" -> "ház",
      "házakat" -> "ház", "házamat" -> "ház", "könyvekkel" -> "könyv",
      "könyveinket" -> "könyv", "gyerekeknek" -> "gyerek",
      "gyerekekkel" -> "gyerek", "asszonnyal" -> "asszony",
      "fallal" -> "fal", "bokrokkal" -> "bokr", "iskolában" -> "iskol",
      "iskolákban" -> "iskola", "tanároknak" -> "tanár",
      "madarakat" -> "madar", "autóval" -> "autó", "szépen" -> "szép",
      "szépség" -> "szépség", "magyarországon" -> "magyarország",
      "budapesten" -> "budapest", "városokban" -> "város",
      "emberek" -> "ember", "embereknek" -> "ember",
      "királynők" -> "királynő", "boldogságot" -> "boldogság")
    val finnish = Seq(
      "taloissa" -> "talo", "taloissansa" -> "talo", "talojen" -> "talo",
      "taloja" -> "talo", "kirjasta" -> "kirj", "kirjoja" -> "kirj",
      "kirjassa" -> "kirj", "koirien" -> "koir", "koirille" -> "koir",
      "kaupungissa" -> "kaupung", "kaupungeissa" -> "kaupung",
      "ystävänsä" -> "ystäv", "ystävälleen" -> "ystäv",
      "opettajien" -> "opettaj", "suomalaisia" -> "suomalais",
      "nopeasti" -> "nopeast", "pienempi" -> "pienemp",
      "suurimmat" -> "suurim", "kauneimmat" -> "kauneim",
      "tyttöjen" -> "tyttöj", "poikien" -> "poik", "vesien" -> "ves",
      "käsiin" -> "käs", "maiden" -> "maide", "töissä" -> "töis",
      "pakkaa" -> "pak", "takkia" -> "tak",
      "edeltäjistään" -> "edeltäj", "kokoontuivat" -> "kokoontuiv")
    val turkish = Seq(
      "kitaplar" -> "kitap", "kitabın" -> "kitap",
      "kitaplarımız" -> "kitap", "kitaplarımızdan" -> "kitap",
      "evlerinizden" -> "ev", "evimizdeki" -> "ev",
      "gözlerimin" -> "göz", "çocuklarımızınki" -> "çocuk",
      "çocuklarımızınkiler" -> "çocuklarımızınki",
      "okullarda" -> "okul", "arabamla" -> "araba",
      "annesinin" -> "anne", "babasından" -> "baba",
      "günlerde" -> "gün", "yollarda" -> "yol", "suyun" -> "suy",
      "köylerden" -> "köy", "şehirlerimizde" -> "şehir",
      "adamlar" -> "adam", "kadınlar" -> "kadın",
      "güzelliğin" -> "güzellik", "büyükler" -> "büyük",
      "küçücük" -> "küçücük", "türkiye" -> "türki",
      "geliyorum" -> "geliyor", "gidiyorsunuz" -> "gidiyor",
      "yapmışsınız" -> "yap", "olduğunu" -> "olduk",
      "istedikleri" -> "istedik",
      // the reference's reserved words skip the postlude
      "soyadı" -> "soyad", "adı" -> "ad")
    for ((lang, pairs) <- Seq("hungarian" -> hungarian,
        "finnish" -> finnish, "turkish" -> turkish);
        (in, want) <- pairs) {
      val got = SnowballStemmer.stem(lang, in)
      assert(got === want, s"$lang stem($in) = $got, want $want")
      SnowballStemmer.validate(lang)
    }
    // every language the reference's vendored libstemmer ships is now
    // creatable as a stemmer function entity
    Seq("english", "porter", "french", "german", "spanish",
      "portuguese", "italian", "dutch", "russian", "danish",
      "norwegian", "swedish", "romanian", "hungarian", "finnish",
      "turkish").foreach(SnowballStemmer.validate)
  }

  test("simhash hamming distance is zero on identical text") {
    val n = docs.select(
      T.hamming64(T.simHash64(col("text")), T.simHash64(col("text"))).as("h"))
      .filter(col("h") =!= 0).count()
    assert(n === 0)
  }

  test("tokens lowercases, drops empties; tokenCount consistent") {
    import spark.implicits._
    val df = Seq("Hello,  WORLD! foo", "", "a b  c").toDF("t")
    val rows = df.select(T.tokens(col("t")).as("tk"),
      T.tokenCount(col("t")).as("n")).collect()
    assert(rows(0).getSeq[String](0) === Seq("hello", "world", "foo"))
    assert(rows(1).getSeq[String](0) === Seq.empty)
    assert(rows(2).getAs[Int]("n") === 3)
  }

  test("shingles: n-grams when long enough, whole doc otherwise") {
    import spark.implicits._
    val df = Seq("a b c d", "a b").toDF("t")
    val rows = df.select(T.shingles(col("t"), 3).as("s")).collect()
    assert(rows(0).getSeq[String](0) === Seq("a b c", "b c d"))
    assert(rows(1).getSeq[String](0) === Seq("a b"))
  }

  test("jaccard: identical=1, disjoint=0") {
    import spark.implicits._
    val df = Seq(("a b c", "a b c", "x y z")).toDF("t1", "t2", "t3")
    val r = df.select(
      T.jaccardTokens(col("t1"), col("t2")).as("same"),
      T.jaccardTokens(col("t1"), col("t3")).as("diff")).head()
    assert(r.getDouble(0) === 1.0)
    assert(r.getDouble(1) === 0.0)
  }

  test("Wilson bounds bracket the observed proportion") {
    import spark.implicits._
    val df = Seq((100L, 30L), (10L, 9L), (1000L, 1L)).toDF("t", "s")
    val bad = df.select(
      (col("s") / col("t")).as("p"),
      M.binomialLb80(col("t"), col("s")).as("lb"),
      M.binomialUb80(col("t"), col("s")).as("ub"))
      .filter(!(col("lb") <= col("p") && col("p") <= col("ub"))).count()
    assert(bad === 0)
  }

  test("vector norm/normalize/cosine basics") {
    import spark.implicits._
    val df = Seq((Seq(3.0f, 4.0f), Seq(4.0f, 3.0f))).toDF("a", "b")
    val r = df.select(
      V.norm(col("a")).as("n2"),
      V.norm(col("a"), 1.0).as("n1"),
      V.cosine(col("a"), col("a")).as("self"),
      V.cosine(col("a"), col("b")).as("cross")).head()
    assert(math.abs(r.getDouble(0) - 5.0) < 1e-12)
    assert(math.abs(r.getDouble(1) - 7.0) < 1e-12)
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-12)
    assert(math.abs(r.getDouble(3) - 24.0 / 25.0) < 1e-12)
  }

  test("native vector expressions match interpreted references") {
    val emb = Tables.embeddings(spark, sf)
    val pairs = emb.select(col("vec_id").as("id_a"), col("embedding").as("a"))
      .join(emb.select((col("vec_id") + 1).as("id_b"), col("embedding").as("b")),
        col("id_a") === col("id_b"))
    val bad = pairs.select(
      V.dot(col("a"), col("b")).as("d"),
      V.dotReference(col("a"), col("b")).as("dr"),
      V.norm(col("a")).as("n2"),
      V.normReference(col("a")).as("n2r"),
      V.norm(col("a"), 1.0).as("n1"),
      V.normReference(col("a"), 1.0).as("n1r"),
      V.cosine(col("a"), col("b")).as("c"),
      V.cosineReference(col("a"), col("b")).as("cr"),
      V.lshBucket(col("a"), 8).as("l"),
      V.lshBucketReference(col("a"), 8).as("lr"))
      .filter(abs(col("d") - col("dr")) > 1e-9 ||
        abs(col("n2") - col("n2r")) > 1e-12 ||
        abs(col("n1") - col("n1r")) > 1e-12 ||
        abs(col("c") - col("cr")) > 1e-12 ||
        col("l") =!= col("lr"))
      .count()
    assert(bad === 0)
  }

  test("native TokenCounts (tokenBag) matches the interpreted formulation") {
    // differential over the real corpus: the one-pass JVM map must
    // agree with the O(n·distinct) Column formulation on every doc
    val diff = docs.limit(200)
      .select(array_sort(map_entries(T.tokenBag(col("text")))).as("a"),
        array_sort(map_entries(T.tokenBagReference(col("text")))).as("b"))
      .filter(col("a") =!= col("b"))
    assert(diff.count() === 0)
    // counts, not just keys: repeated tokens accumulate
    val m = spark.range(1)
      .select(T.tokenBag(lit("a b a c b a")).as("t"))
      .head().getMap[String, Int](0)
    assert(m("a") === 3 && m("b") === 2 && m("c") === 1)
    // ngram variant runs through the same native path
    val g = spark.range(1)
      .select(T.tokenBagNgrams(lit("x y x y"), 1, 2).as("t"))
      .head().getMap[String, Int](0)
    assert(g("x") === 2 && g("x y") === 2 && g("y x") === 1)
  }

  test("fingerprint: order-sensitive, whitespace/punct-insensitive, deterministic") {
    val r = spark.range(1).select(
      T.fingerprint(lit("alpha beta gamma")).as("a"),
      T.fingerprint(lit("  alpha,  beta. gamma!")).as("b"),
      T.fingerprint(lit("beta alpha gamma")).as("c"),
      T.fingerprint(lit("alpha beta gamma")).as("d")).head()
    assert(r.getLong(0) === r.getLong(1)) // normalization-insensitive
    assert(r.getLong(0) !== r.getLong(2)) // order-sensitive
    assert(r.getLong(0) === r.getLong(3)) // deterministic
  }

  test("html extraction: text, title, links, entity decode") {
    import graft.functions.{HtmlFunctions => H}
    val html = "<html><head><title>T &amp; U</title><style>p{color:red}</style>" +
      "</head><body><p>Hello <b>world</b></p><a href=\"https://a.b/c\">l</a>" +
      "<a href='/rel'>m</a><script>if (1 < 2) x();</script><!-- gone --></body></html>"
    val r = spark.range(1).select(
      H.htmlToText(lit(html)).as("t"),
      H.htmlTitle(lit(html)).as("ti"),
      H.htmlLinks(lit(html)).as("l")).head()
    assert(r.getString(0) === "T & U Hello world l m")
    assert(r.getString(1) === "T & U")
    assert(r.getSeq[String](2) === Seq("https://a.b/c", "/rel"))
    // &amp;lt; decodes to the literal "&lt;", not "<"
    val dbl = spark.range(1)
      .select(H.htmlToText(lit("a &amp;lt; b")).as("t")).head().getString(0)
    assert(dbl === "a &lt; b")
  }

  test("useragent parsing: browser precedence, os versions, spiders") {
    import graft.functions.{UserAgentFunctions => U}
    import spark.implicits._
    val uas = Seq(
      ("chrome_win", "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36"),
      ("edge", "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36 Edg/120.0.2210.91"),
      ("safari_ios", "Mozilla/5.0 (iPhone; CPU iPhone OS 17_1 like Mac OS X) AppleWebKit/605.1.15 (KHTML, like Gecko) Version/17.1 Mobile/15E148 Safari/604.1"),
      ("firefox_linux", "Mozilla/5.0 (X11; Linux x86_64; rv:121.0) Gecko/20100101 Firefox/121.0"),
      ("samsung", "Mozilla/5.0 (Linux; Android 14; SM-S918B) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0.0.0 Mobile Safari/537.36"),
      ("bot", "Mozilla/5.0 (compatible; Googlebot/2.1; +http://www.google.com/bot.html)"))
      .toDF("tag", "ua")
    val out = uas.select(col("tag"), U.parseUserAgent(col("ua")).as("p"))
      .select(col("tag"), col("p.browser.family").as("bf"),
        col("p.browser.version").as("bv"), col("p.os.family").as("of"),
        col("p.os.version").as("ov"), col("p.device.brand").as("db"),
        col("p.isSpider").as("sp"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("chrome_win").getString(1) === "Chrome" &&
      out("chrome_win").getString(2).startsWith("120") &&
      out("chrome_win").getString(3) === "Windows" &&
      out("chrome_win").getString(4) === "10.0")
    // Edge carries Chrome/ + Safari/ tokens; precedence must pick Edge
    assert(out("edge").getString(1) === "Edge")
    assert(out("safari_ios").getString(1) === "Safari" &&
      out("safari_ios").getString(3) === "iOS" &&
      out("safari_ios").getString(4) === "17.1" &&
      out("safari_ios").getString(5) === "Apple")
    assert(out("firefox_linux").getString(1) === "Firefox" &&
      out("firefox_linux").getString(3) === "Linux")
    assert(out("samsung").getString(5) === "Samsung")
    assert(out("bot").getBoolean(6))
    assert(!out("chrome_win").getBoolean(6))
  }

  test("langId is deterministic and in-domain") {
    val langs = docs.select(T.langId(col("text")).as("l"))
      .distinct().collect().map(_.getString(0)).toSet
    assert(langs.subsetOf(Set("en", "fr", "es", "de", "it", "und")))
  }

  test("geo distance: zero at same point, symmetric") {
    import spark.implicits._
    val df = Seq((48.85, 2.35, 40.71, -74.0)).toDF("la1", "lo1", "la2", "lo2")
    val r = df.select(
      M.geoDistanceKm(col("la1"), col("lo1"), col("la1"), col("lo1")).as("zero"),
      M.geoDistanceKm(col("la1"), col("lo1"), col("la2"), col("lo2")).as("ab"),
      M.geoDistanceKm(col("la2"), col("lo2"), col("la1"), col("lo1")).as("ba")).head()
    assert(r.getDouble(0) === 0.0)
    assert(math.abs(r.getDouble(1) - r.getDouble(2)) < 1e-9)
    // Paris -> NYC is ~5830 km
    assert(r.getDouble(1) > 5700 && r.getDouble(1) < 5950)
  }

  test("nfcNormalize composes decomposed accents; identity on ASCII and composed input") {
    import spark.implicits._
    val decomposed = "cafe" + "e\u0301" + " nai\u0308ve"   // e+combining acute, i+diaeresis
    val composed = "cafe\u00e9 na\u00efve"
    val df = Seq((decomposed, composed, "plain ascii")).toDF("d", "c", "a")
    val r = df.select(
      T.nfcNormalize(col("d")).as("nd"),
      T.nfcNormalize(col("c")).as("nc"),
      T.nfcNormalize(col("a")).as("na")).head()
    assert(r.getString(0) === composed)   // composed form out
    assert(r.getString(1) === composed)                            // already-NFC passes through
    assert(r.getString(2) === "plain ascii")                       // ASCII fast path
    // matches the JDK normalizer on the raw corpus (differential)
    val n = docs.limit(200).select(col("text"), T.nfcNormalize(col("text")).as("nfc"))
      .collect().count { row =>
        row.getString(1) != java.text.Normalizer.normalize(
          row.getString(0), java.text.Normalizer.Form.NFC)
      }
    assert(n === 0)
  }

  test("nfcNormalize agrees between codegen and interpreted eval") {
    // exercise the interpreted path directly (doGenCode is what the
    // projection uses; nullSafeEval must match it)
    val e = graft.plans.NfcNormalize(
      org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString("ze\u0301bre"),
        org.apache.spark.sql.types.StringType))
    assert(e.eval(null).toString === "z\u00e9bre")
    import spark.implicits._
    val viaPlan = Seq("ze\u0301bre").toDF("t")
      .select(T.nfcNormalize(col("t"))).as[String].head()
    assert(viaPlan === "z\u00e9bre")
  }

  test("fixText runs the full cleanup chain in order") {
    import spark.implicits._
    val dirty = "  bad\u0007ctl\r\nA  B\tC \n \n\n\n d" +
      " \u201Cq\u201D\u2018s\u2019 a\u2014b\u2013c\u00a0d  "
    val want = "bad" + "ctl\nA B C\n\nd \"q\"'s' a-b-c d"
    val got = Seq(dirty).toDF("t").select(T.fixText(col("t"))).as[String].head()
    assert(got === want)
  }

  test("fixText is idempotent on the corpus") {
    val n = docs.select(T.fixText(col("text")).as("once"))
      .select(col("once"), T.fixText(col("once")).as("twice"))
      .filter(col("once") =!= col("twice")).count()
    assert(n === 0)
  }
}
