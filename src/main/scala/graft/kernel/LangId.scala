package graft.kernel

/**
 * Character-n-gram language identification (Cavnar–Trenkle out-of-place
 * rank distance over trigram profiles) — the classic n-gram heuristic for
 * training-data pipelines, complementing the stopword-vote lang scorer on
 * the SQL surface. Profiles are built once per JVM from small embedded seed
 * texts (authored for this repo); everything is deterministic and
 * allocation-light so it can run per-row inside mapPartitions or a
 * codegen'd expression.
 */
object LangId {

  val Unknown = "und"
  private val ProfileSize = 160
  private val MinChars = 24 // too short to call -> und

  // Seed corpora: generic sentences per language (authored here; the point
  // is characteristic trigram statistics, not content).
  private val seeds: Map[String, String] = Map(
    "en" -> ("the quick brown fox jumps over the lazy dog and then it runs away " +
      "through the green fields while the people of the town are watching with " +
      "great interest because they have never seen anything like this before " +
      "it is said that the weather in the north of the country will be better " +
      "than it was during the last week and everyone should bring water with them"),
    "de" -> ("der schnelle braune fuchs springt über den faulen hund und läuft dann " +
      "durch die grünen felder während die menschen der stadt mit großem interesse " +
      "zuschauen weil sie so etwas noch nie gesehen haben es wird gesagt dass das " +
      "wetter im norden des landes besser sein wird als in der letzten woche und " +
      "jeder sollte genügend wasser mitbringen damit nichts schief gehen kann"),
    "es" -> ("el rápido zorro marrón salta sobre el perro perezoso y luego corre por " +
      "los campos verdes mientras la gente del pueblo observa con gran interés " +
      "porque nunca han visto algo así se dice que el tiempo en el norte del país " +
      "será mejor que la semana pasada y todos deberían llevar suficiente agua " +
      "para que nada salga mal durante la excursión de mañana por la montaña " +
      "y también es importante que las personas lean los documentos y escriban " +
      "sus propias conclusiones en el cuaderno porque la información y el " +
      "conocimiento son las herramientas que permiten entender el mundo y " +
      "pueden ayudar a construir una ciudad mejor para todos los vecinos"),
    "fr" -> ("le rapide renard brun saute par dessus le chien paresseux et court " +
      "ensuite à travers les champs verts pendant que les gens de la ville " +
      "regardent avec beaucoup d'intérêt parce qu'ils n'ont jamais rien vu de tel " +
      "on dit que le temps dans le nord du pays sera meilleur que la semaine " +
      "dernière et tout le monde devrait apporter de l'eau pour la randonnée"),
    "it" -> ("la veloce volpe marrone salta sopra il cane pigro e poi corre " +
      "attraverso i campi verdi mentre la gente della città guarda con grande " +
      "interesse perché non hanno mai visto niente del genere si dice che il " +
      "tempo nel nord del paese sarà migliore della settimana scorsa e tutti " +
      "dovrebbero portare abbastanza acqua per la gita di domani in montagna"),
    "pt" -> ("a rápida raposa marrom pula sobre o cachorro preguiçoso e depois corre " +
      "pelos campos verdes enquanto as pessoas da cidade observam com grande " +
      "interesse porque nunca viram algo assim dizem que o tempo no norte do " +
      "país será melhor do que na semana passada e todos deveriam levar água " +
      "suficiente para que nada dê errado no passeio de amanhã pela montanha " +
      "e também é importante que as pessoas leiam os documentos e escrevam as " +
      "suas próprias conclusões no caderno porque a informação e o conhecimento " +
      "são as ferramentas que permitem entender o mundo e podem ajudar a " +
      "construir uma cidade melhor para todos os moradores do bairro"))

  /** Ranked trigram profile: trigram -> rank (0 = most frequent). */
  private[kernel] def profile(text: String, top: Int = ProfileSize): Map[String, Int] = {
    val counts = scala.collection.mutable.HashMap.empty[String, Int]
    val norm = normalize(text)
    var i = 0
    while (i + 3 <= norm.length) {
      val g = norm.substring(i, i + 3)
      counts(g) = counts.getOrElse(g, 0) + 1
      i += 1
    }
    counts.toSeq.sortBy { case (g, c) => (-c, g) }.take(top)
      .zipWithIndex.map { case ((g, _), r) => g -> r }.toMap
  }

  /** Lowercase, collapse whitespace runs to single spaces, strip digits. */
  private def normalize(text: String): String = {
    val sb = new java.lang.StringBuilder(math.min(text.length, 8192) + 2)
    sb.append(' ')
    var pend = false
    var i = 0
    val cap = math.min(text.length, 8192) // profiles converge long before
    while (i < cap) {
      val c = text.charAt(i)
      if (Character.isWhitespace(c) || Character.isDigit(c)) pend = sb.length() > 1
      else {
        if (pend) sb.append(' ')
        pend = false
        sb.append(Character.toLowerCase(c))
      }
      i += 1
    }
    sb.append(' ')
    sb.toString
  }

  private lazy val langProfiles: Map[String, Map[String, Int]] =
    seeds.map { case (l, s) => l -> profile(s) }

  /** Out-of-place distance of `textProfile` vs a language profile. */
  private def distance(textProfile: Map[String, Int], lang: Map[String, Int]): Long = {
    var d = 0L
    textProfile.foreach { case (g, r) =>
      d += math.abs(lang.getOrElse(g, ProfileSize) - r)
    }
    d
  }

  /** Best language code, or "und" for texts too short to call. */
  def detect(text: String): String = detectScored(text)._1

  /** (lang, margin) — margin is the relative gap to the runner-up (0 when
    * und or a single candidate). */
  def detectScored(text: String): (String, Double) = {
    if (text == null || text.length < MinChars) return (Unknown, 0.0)
    val tp = profile(text)
    if (tp.size < 8) return (Unknown, 0.0)
    val scored = langProfiles.toSeq
      .map { case (l, p) => (l, distance(tp, p)) }
      .sortBy { case (l, d) => (d, l) }
    val (best, d1) = scored.head
    val d2 = if (scored.length > 1) scored(1)._2 else d1
    (best, if (d2 == 0) 0.0 else (d2 - d1).toDouble / d2)
  }
}
