#!/usr/bin/env python3
"""Generate src/main/scala/graft/functions/LangIdTrigramTable.scala.

Trains character-TRIGRAM frequency profiles per language — the public
n-gram language-ID design (Cavnar & Trenkle 1994, "N-Gram-Based Text
Categorization"; fastText's character n-grams are the same signal):
a document is scored against each language by summing the language's
per-million frequency of every trigram the document contains, argmax
wins. Frequencies are scaled to INTEGER per-million weights so the
score is an exact integer sum — order-independent, replayable verbatim
by any SQL engine (the BPE-table playbook).

Training text is AUTHORED sample prose embedded below (no external
downloads; a few hundred words per language is ample for trigram
profiles — Cavnar-Trenkle report high accuracy from profiles this
small). Normalization is the exact pipeline the Scala operator and the
DuckDB oracle replay:

    lower → replace /[^a-z]+/ runs with one space → pad with one
    leading and one trailing space → all trigrams (overlapping).

Run from the repo root:  python3 tools/langid_train_table.py
"""
import collections
import re

TOP_K = 200          # trigrams kept per language
SCALE = 1_000_000    # integer per-million weights
OUT = "src/main/scala/graft/functions/LangIdTrigramTable.scala"

# Authored sample prose, deliberately rich in each language's function
# words and characteristic letter sequences.
CORPUS = {
    "en": """
        The old house stood at the end of the road, and the children
        walked past it every morning on their way to school. It was
        said that nobody had lived there for many years, but the
        garden was always full of flowers in the spring. One day the
        youngest of them decided that she would knock on the door and
        ask who was taking care of the roses. The others waited by
        the gate while she went up the path. When the door opened, an
        old woman smiled at her and said that she had been waiting
        for someone to ask that question for a very long time. They
        became friends, and from that day on the children would stop
        at the house after school to hear stories about the town as
        it had been before they were born. There is always more to a
        quiet place than what you can see from the street, and those
        who take the time to look will often find something worth
        keeping for the rest of their lives.
        The engine reads each table in order and sorts the rows by
        key before the merge, so that every partition of the batch
        can join against the stream without a second scan. A query
        that filters early will group and aggregate less data, and a
        window over a sorted column is faster than a hash over the
        whole value set. Small tables broadcast; large tables shuffle
        in parts; the slow path is the one that reads every row twice.
    """,
    "de": """
        Das alte Haus stand am Ende der Strasse, und die Kinder
        gingen jeden Morgen auf dem Weg zur Schule daran vorbei. Man
        sagte, dass dort seit vielen Jahren niemand mehr wohnte, aber
        der Garten war im Fruehling immer voller Blumen. Eines Tages
        beschloss die Juengste von ihnen, an die Tuer zu klopfen und
        zu fragen, wer sich um die Rosen kuemmerte. Die anderen
        warteten am Tor, waehrend sie den Weg hinaufging. Als die
        Tuer sich oeffnete, laechelte eine alte Frau und sagte, dass
        sie schon sehr lange darauf gewartet habe, dass jemand diese
        Frage stellte. Sie wurden Freunde, und von diesem Tag an
        blieben die Kinder nach der Schule stehen, um Geschichten
        ueber die Stadt zu hoeren, wie sie vor ihrer Geburt gewesen
        war. In einem stillen Ort steckt immer mehr, als man von der
        Strasse aus sehen kann, und wer sich die Zeit nimmt, findet
        oft etwas, das er fuer den Rest seines Lebens behalten wird.
    """,
    "fr": """
        La vieille maison se trouvait au bout de la route, et les
        enfants passaient devant elle chaque matin en allant a
        l'ecole. On disait que personne n'y habitait depuis de
        nombreuses annees, mais le jardin etait toujours plein de
        fleurs au printemps. Un jour, la plus jeune d'entre eux
        decida qu'elle frapperait a la porte pour demander qui
        s'occupait des roses. Les autres attendaient pres de la
        grille pendant qu'elle montait le chemin. Quand la porte
        s'ouvrit, une vieille femme lui sourit et lui dit qu'elle
        attendait depuis tres longtemps que quelqu'un pose cette
        question. Elles devinrent amies, et des ce jour les enfants
        s'arretaient a la maison apres l'ecole pour ecouter des
        histoires sur la ville telle qu'elle etait avant leur
        naissance. Il y a toujours plus dans un endroit tranquille
        que ce que l'on peut voir depuis la rue, et ceux qui prennent
        le temps de regarder trouvent souvent quelque chose qui vaut
        la peine d'etre garde pour le reste de leur vie.
    """,
    "es": """
        La vieja casa estaba al final del camino, y los ninos pasaban
        delante de ella cada manana de camino a la escuela. Se decia
        que nadie vivia alli desde hacia muchos anos, pero el jardin
        siempre estaba lleno de flores en primavera. Un dia, la mas
        joven de ellos decidio que llamaria a la puerta para
        preguntar quien cuidaba de las rosas. Los demas esperaban
        junto a la verja mientras ella subia por el sendero. Cuando
        la puerta se abrio, una anciana le sonrio y le dijo que
        llevaba mucho tiempo esperando a que alguien hiciera esa
        pregunta. Se hicieron amigas, y desde ese dia los ninos se
        detenian en la casa despues de la escuela para escuchar
        historias sobre el pueblo tal como era antes de que ellos
        nacieran. Siempre hay mas en un lugar tranquilo de lo que se
        puede ver desde la calle, y quienes se toman el tiempo de
        mirar encuentran a menudo algo que vale la pena guardar para
        el resto de sus vidas.
    """,
    "it": """
        La vecchia casa si trovava alla fine della strada, e i
        bambini ci passavano davanti ogni mattina andando a scuola.
        Si diceva che nessuno ci abitasse da molti anni, ma il
        giardino era sempre pieno di fiori in primavera. Un giorno la
        piu giovane di loro decise che avrebbe bussato alla porta per
        chiedere chi si prendesse cura delle rose. Gli altri
        aspettavano al cancello mentre lei saliva per il sentiero.
        Quando la porta si apri, una vecchia signora le sorrise e le
        disse che aspettava da molto tempo che qualcuno facesse
        quella domanda. Diventarono amiche, e da quel giorno i
        bambini si fermavano alla casa dopo la scuola per ascoltare
        storie sulla citta come era prima che loro nascessero. In un
        luogo tranquillo ce sempre di piu di quello che si vede dalla
        strada, e chi si prende il tempo di guardare trova spesso
        qualcosa che vale la pena di conservare per il resto della
        vita.
    """,
    "pt": """
        A velha casa ficava no fim da estrada, e as criancas passavam
        por ela todas as manhas a caminho da escola. Dizia-se que
        ninguem morava ali havia muitos anos, mas o jardim estava
        sempre cheio de flores na primavera. Um dia, a mais nova
        delas decidiu que bateria a porta para perguntar quem cuidava
        das rosas. Os outros esperavam junto ao portao enquanto ela
        subia o caminho. Quando a porta se abriu, uma velha senhora
        sorriu e disse que esperava havia muito tempo que alguem
        fizesse essa pergunta. Tornaram-se amigas, e desde esse dia
        as criancas paravam na casa depois da escola para ouvir
        historias sobre a cidade tal como era antes de elas
        nascerem. Ha sempre mais num lugar tranquilo do que aquilo
        que se pode ver da rua, e quem toma o tempo de olhar encontra
        muitas vezes algo que vale a pena guardar para o resto da
        vida.
    """,
    "nl": """
        Het oude huis stond aan het einde van de weg, en de kinderen
        liepen er elke ochtend langs op weg naar school. Er werd
        gezegd dat er al vele jaren niemand woonde, maar de tuin
        stond in de lente altijd vol bloemen. Op een dag besloot de
        jongste van hen dat ze op de deur zou kloppen om te vragen
        wie er voor de rozen zorgde. De anderen wachtten bij het hek
        terwijl zij het pad opliep. Toen de deur openging, glimlachte
        een oude vrouw naar haar en zei dat ze al heel lang wachtte
        tot iemand die vraag zou stellen. Ze werden vrienden, en
        vanaf die dag bleven de kinderen na school bij het huis staan
        om verhalen te horen over de stad zoals die was voordat zij
        geboren werden. Er zit altijd meer in een stille plek dan wat
        je vanaf de straat kunt zien, en wie de tijd neemt om te
        kijken vindt vaak iets dat de moeite waard is om de rest van
        zijn leven te bewaren.
    """,
}

LANGS = list(CORPUS)  # declaration order = argmax tie-break priority


def normalize(text):
    return " " + re.sub(r"[^a-z]+", " ", text.lower()) + " "


def trigrams(text):
    t = normalize(text)
    return [t[i:i + 3] for i in range(len(t) - 2)]


def train():
    table = []
    for lang in LANGS:
        counts = collections.Counter(trigrams(CORPUS[lang]))
        total = sum(counts.values())
        top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:TOP_K]
        for gram, c in sorted(top):
            w = round(SCALE * c / total)
            if w > 0:
                table.append((lang, gram, w))
    return table


def score(table, text):
    """Replica of the operator, for printing hand-check expectations."""
    weights = {}
    for lang, gram, w in table:
        weights.setdefault(gram, {})[lang] = w
    sums = {lang: 0 for lang in LANGS}
    for g in trigrams(text):
        for lang, w in weights.get(g, {}).items():
            sums[lang] += w
    if all(v == 0 for v in sums.values()):
        return "unknown", sums
    best = max(LANGS, key=lambda l: (sums[l], -LANGS.index(l)))
    return best, sums


def main():
    table = train()
    for lang, gram, w in table:
        assert re.fullmatch(r"[a-z ]{3}", gram), (lang, gram)
        assert 0 < w <= SCALE, (lang, gram, w)

    lines = []
    for i in range(0, len(table), 4):
        chunk = ", ".join(f'("{l}", "{g}", {w}L)' for l, g, w in table[i:i + 4])
        lines.append("    " + chunk + ("," if i + 4 < len(table) else ""))
    body = "\n".join(lines)
    langs = ", ".join(f'"{l}"' for l in LANGS)
    scala = f'''package graft.functions

/** GENERATED by tools/langid_train_table.py — do not hand-edit.
  *
  * Character-trigram frequency profiles for language identification
  * (Cavnar & Trenkle 1994 n-gram categorization, with integer
  * per-million weights so scores are exact integer sums any SQL
  * engine replays verbatim). Trained over the authored sample prose
  * embedded in the tool — top {TOP_K} trigrams per language, weight =
  * round(1e6 · count / total). Normalization contract shared by the
  * operator and the oracle: lower, collapse /[^a-z]+/ runs to one
  * space, pad one space each side, all overlapping trigrams.
  */
private[graft] object LangIdTrigramTable {{
  /** Declaration order is the argmax tie-break priority. */
  val languages: Seq[String] = Seq({langs})

  /** (language, trigram, per-million weight). */
  val entries: Seq[(String, String, Long)] = Seq(
{body})
}}
'''
    with open(OUT, "w") as fh:
        fh.write(scala)
    print(f"wrote {OUT} with {len(table)} entries, {len(LANGS)} languages")
    for probe in [
        "the quick brown fox jumps over the lazy dog and the cat",
        "der hund und die katze spielen in dem garten mit den kindern",
        "le chien et le chat jouent dans le jardin avec les enfants",
        "el perro y el gato juegan en el jardin con los ninos",
        "il cane e il gatto giocano nel giardino con i bambini",
        "o cachorro e o gato brincam no jardim com as criancas",
        "de hond en de kat spelen in de tuin met de kinderen",
        "12345 !!! ???",
    ]:
        lang, _ = score(table, probe)
        print(f"  {lang:8s} <- {probe!r}")


if __name__ == "__main__":
    main()
