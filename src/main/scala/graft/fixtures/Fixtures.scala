package graft.fixtures

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.dict.ConceptDict
import graft.functions.{Hashing, Vectorizer}
import graft.model._

/** Deterministic in-code fixtures: a mini concept dictionary shaped
  * like the reference's Neo4j graph (FIXTURES.md §2) and a seeded
  * transcript generator (FIXTURES.md §1). No wall-clock, no
  * randomness source other than splitmix64 over (conv, turn) — the
  * same inputs are reproduced bit-identically at any parallelism.
  *
  * Codes reuse real-looking NCIT codes cited in the reference
  * (C4878 "Lung Carcinoma" synonym_tool.py:61; C40625
  * exact_match.py:23; C3117 "Hypertension"
  * streamlit_multipage_app.py:224).
  */
object Fixtures {

  val Dim = 64

  /** char-trigram embedding used for dictionary + mention vectors in
    * the semantic ladder stage (robust to misspellings, unlike word
    * hashing; stands in for ada-002 per SURVEY.md §7.4). */
  def embed(text: String): Array[Float] = Vectorizer.vectorizeChar(text, Dim)

  // ---- dictionary source data (pure) ----

  /** (code, term, definition|null, synonyms*) */
  val ncitRows: Seq[(String, String, String, Seq[String])] = Seq(
    ("C4878", "lung carcinoma", "malignant lung neoplasm",
      Seq("carcinoma of the lung", "lung cancer", "pulmonary carcinoma")),
    ("C3117", "hypertension", "persistently high blood pressure",
      Seq("high blood pressure", "htn", "blood pressure elevation")),
    ("C40625", "estrogen receptor status", "er expression finding",
      Seq("er status")),
    ("C2991", "disease or disorder", "pathologic process",
      Seq("disease", "disorder")),
    ("C25200", "height", null, Seq("body height", "stature")), // null definition (ref exact_match.py:58)
    ("C25208", "weight", "body weight measurement", Seq("body weight")),
    ("C16576", "female", "female phenotype", Seq("woman")),
    ("C20197", "male", "male phenotype", Seq("man")),
    ("C1512", "interleukin 2", "t cell growth factor", Seq("il 2", "il2", "aldesleukin")),
    ("C15632", "chemotherapy", "treatment with cytotoxic agents",
      Seq("chemo", "cytotoxic therapy")),
    ("C15313", "radiation therapy", "ionizing radiation treatment",
      Seq("radiotherapy", "irradiation")),
    ("C4872", "breast carcinoma", "malignant breast neoplasm",
      Seq("breast cancer", "carcinoma of the breast", "mammary carcinoma")),
    ("C2926", "lung adenocarcinoma", "adenocarcinoma of the lung",
      Seq("adenocarcinoma of lung")),
    ("C3058", "glioblastoma", "grade iv astrocytoma", Seq("gbm", "glioblastoma multiforme")),
    ("C3008", "diabetes mellitus", "metabolic glucose disorder",
      Seq("diabetes", "dm")),
    ("C2985", "anemia", "reduced red cell mass", Seq("anaemia", "low hemoglobin")),
    ("C3036", "fatigue", "tiredness symptom", Seq("tiredness", "exhaustion")),
    ("C3262", "nausea", "urge to vomit", Seq("queasiness")),
    ("C2977", "cough", "sudden expulsion of air", Seq("tussis")),
    ("C3371", "fever", "elevated body temperature", Seq("pyrexia", "febrile episode")),
    ("C50577", "headache", "cephalic pain", Seq("cephalalgia", "head pain")),
    ("C26747", "pneumonia", "lung inflammation", Seq("lung infection")),
    ("C34830", "asthma", "reversible airway obstruction", Seq("bronchial asthma")),
    ("C2955", "colorectal carcinoma", "malignant colorectal neoplasm",
      Seq("colorectal cancer", "bowel cancer")),
    ("C4911", "melanoma", "malignant melanocytic neoplasm", Seq("malignant melanoma")),
    ("C7541", "retinoblastoma", "retinal neoplasm of childhood", Seq()),
    ("C9305", "malignant neoplasm", "cancerous tumor",
      Seq("cancer", "malignancy", "malignant tumor")),
    ("C18016", "tumor stage", "anatomic extent of tumor", Seq("staging")),
    ("C28554", "dead", "ceased to live", Seq("deceased", "death")),
    ("C37987", "alive", "living status", Seq("living")),
    ("C41260", "asian", "asian race designation", Seq()),
    ("C16352", "black or african american", "race designation", Seq("african american")),
    ("C41261", "white", "race designation caucasian", Seq("caucasian")),
    ("C17998", "unknown", "not known", Seq("not reported")),
    ("C49488", "yes indicator", "affirmative response", Seq("yes")),
    ("C49487", "no indicator", "negative response", Seq("no response")),
    ("C25301", "age", "time since birth", Seq("age in years")),
    ("C16423", "clinical trial", "prospective study", Seq("clinical study", "trial")),
    ("C15206", "biopsy", "tissue removal for diagnosis", Seq("tissue biopsy")),
    ("C25158", "dosage", "administered quantity", Seq("dose", "dose amount")),
    ("C71104", "creatinine level", "renal function marker", Seq("serum creatinine")),
    ("C64848", "hemoglobin level", "blood hemoglobin measure", Seq("hgb")),
    ("C105586", "systolic blood pressure", "peak arterial pressure",
      Seq("sbp", "blood pressure elevation")), // shared synonym with C3117 -> CC merge fixture
    ("C25298", "smoking status", "tobacco use classification", Seq("tobacco use")),
    ("C62656", "tumor grade", "histologic aggressiveness", Seq("grade")),
    ("C48885", "metastasis", "secondary tumor spread", Seq("metastatic spread", "mets")),
    ("C3247", "myocardial infarction", "heart muscle necrosis",
      Seq("heart attack", "mi")),
    ("C50542", "stroke", "cerebrovascular accident", Seq("cva", "brain attack")),
    ("C34797", "arthritis", "joint inflammation", Seq("joint swelling")),
    ("C26688", "obesity", "excess body fat", Seq("obese")))

  /** PV rows: (code, term, parent ncit code). PV term matching is
    * case-sensitive in the reference (synonym_tool.py:27) — terms
    * here are the canonical cased forms. */
  val pvRows: Seq[(String, String, String)] = Seq(
    ("PV001", "Stage IV", "C18016"), ("PV002", "Stage III", "C18016"),
    ("PV003", "Male", "C20197"), ("PV004", "Female", "C16576"),
    ("PV005", "Deceased", "C28554"), ("PV006", "Alive", "C37987"),
    ("PV007", "Asian", "C41260"), ("PV008", "White", "C41261"),
    ("PV009", "Unknown", "C17998"), ("PV010", "Current Smoker", "C25298"),
    ("PV011", "Former Smoker", "C25298"), ("PV012", "Grade 2", "C62656"),
    ("PV013", "Positive", "C40625"), ("PV014", "Negative", "C40625"),
    ("PV015", "Yes", "C49488"), ("PV016", "No", "C49487"))

  /** CDE rows: (code, term, vdm code). */
  val cdeRows: Seq[(String, String, String)] = Seq(
    ("CDE2001", "patient tumor stage category", "VDM01"),
    ("CDE2002", "patient vital status", "VDM02"),
    ("CDE2003", "patient gender category", "VDM03"),
    ("CDE2004", "patient race category", "VDM04"),
    ("CDE2005", "er status indicator", "VDM05"),
    ("CDE2006", "smoking history indicator", "VDM06"),
    ("CDE2007", "tumor histologic grade", "VDM07"),
    ("CDE2008", "yes no response indicator", "VDM08"))

  /** vdm code -> member pv codes. */
  val vdmPv: Map[String, Seq[String]] = Map(
    "VDM01" -> Seq("PV001", "PV002"),
    "VDM02" -> Seq("PV005", "PV006", "PV009"),
    "VDM03" -> Seq("PV003", "PV004"),
    "VDM04" -> Seq("PV007", "PV008", "PV009"),
    "VDM05" -> Seq("PV013", "PV014"),
    "VDM06" -> Seq("PV010", "PV011"),
    "VDM07" -> Seq("PV012"),
    "VDM08" -> Seq("PV015", "PV016"))

  /** (cde, dec, oc, oc term). CDE2008 has no DEC->OC — exercises the
    * rerank fallback (reference semantic_retrievers.py:216-219). */
  val decOc: Seq[(String, String, String, String)] = Seq(
    ("CDE2001", "DEC01", "OC01", "neoplasm"),
    ("CDE2002", "DEC02", "OC02", "patient"),
    ("CDE2003", "DEC03", "OC02", "patient"),
    ("CDE2004", "DEC04", "OC02", "patient"),
    ("CDE2005", "DEC05", "OC03", "receptor"),
    ("CDE2006", "DEC06", "OC02", "patient"),
    ("CDE2007", "DEC07", "OC01", "neoplasm"))

  /** (dec, pr code, pr term, grounding ncit code): the DEC's Property
    * component, grounded to NCIT — the DEC-[:HAS_PR]->PR-[:HAS_CONCEPT]
    * ->NCIT path of reference schema.png (never traversed by reference
    * code, present in its serving graph). One PR per DEC here. */
  val decPr: Seq[(String, String, String, String)] = Seq(
    ("DEC01", "PR01", "stage", "C18016"),
    ("DEC02", "PR02", "vital status", "C37987"),
    ("DEC03", "PR03", "gender", "C20197"),
    ("DEC04", "PR04", "race", "C41261"),
    ("DEC05", "PR05", "receptor status", "C40625"),
    ("DEC06", "PR06", "smoking status", "C25298"),
    ("DEC07", "PR07", "grade", "C62656"))

  /** OC-[:HAS_CONCEPT]->NCIT grounding (schema.png). Deliberately
    * PARTIAL: OC02 "patient" has no NCIT anchor in the fixture —
    * ungrounded OCs are the common real-world case and the graph
    * consumer must tolerate them. */
  val ocGround: Seq[(String, String)] = Seq(
    ("OC01", "C9305"),  // neoplasm -> malignant neoplasm
    ("OC03", "C40625")) // receptor -> estrogen receptor status

  /** SemanticType vertices (code, type name) — the UMLS-style typing
    * label of reference synonym_tool.py:90-96:
    * (n:NCIT {term:"Lung Carcinoma"})-[:HAS_SEMANTIC_TYPE]->
    * (m:SemanticType) RETURN m.type => "Neoplastic Process". */
  val stRows: Seq[(String, String)] = Seq(
    ("ST01", "neoplastic process"),
    ("ST02", "disease or syndrome"),
    ("ST03", "sign or symptom"),
    ("ST04", "finding"),
    ("ST05", "therapeutic or preventive procedure"),
    ("ST06", "organism attribute"),
    ("ST07", "quantitative concept"),
    ("ST08", "population group"),
    ("ST09", "amino acid peptide or protein"))

  /** NCIT -> SemanticType assignment (HAS_SEMANTIC_TYPE edges): every
    * fixture NCIT concept carries exactly one type. */
  val ncitSt: Seq[(String, String)] = Seq(
    "C4878" -> "ST01", "C4872" -> "ST01", "C2926" -> "ST01",
    "C3058" -> "ST01", "C2955" -> "ST01", "C4911" -> "ST01",
    "C7541" -> "ST01", "C9305" -> "ST01", "C48885" -> "ST01",
    "C3117" -> "ST02", "C3008" -> "ST02", "C2985" -> "ST02",
    "C26747" -> "ST02", "C34830" -> "ST02", "C3247" -> "ST02",
    "C50542" -> "ST02", "C34797" -> "ST02", "C26688" -> "ST02",
    "C2991" -> "ST02",
    "C3036" -> "ST03", "C3262" -> "ST03", "C2977" -> "ST03",
    "C3371" -> "ST03", "C50577" -> "ST03",
    "C40625" -> "ST04", "C28554" -> "ST04", "C37987" -> "ST04",
    "C17998" -> "ST04", "C49488" -> "ST04", "C49487" -> "ST04",
    "C25298" -> "ST04", "C62656" -> "ST04", "C18016" -> "ST04",
    "C15632" -> "ST05", "C15313" -> "ST05", "C16423" -> "ST05",
    "C15206" -> "ST05",
    "C25200" -> "ST06", "C25208" -> "ST06", "C25301" -> "ST06",
    "C16576" -> "ST06", "C20197" -> "ST06",
    "C71104" -> "ST07", "C64848" -> "ST07", "C105586" -> "ST07",
    "C25158" -> "ST07",
    "C41260" -> "ST08", "C16352" -> "ST08", "C41261" -> "ST08",
    "C1512" -> "ST09")

  def dict(spark: SparkSession): ConceptDict = {
    import spark.implicits._
    val ncit = ncitRows.map { case (code, term, defn, _) =>
      Concept(code, term, Option(defn), "NCIT", embed(term))
    }.toDS()
    val syns = ncitRows.flatMap { case (code, _, _, ss) =>
      ss.map(s => Synonym(code, s))
    }.toDS()
    val pv = pvRows.map { case (code, term, _) =>
      Concept(code, term, None, "PV", embed(term))
    }.toDS()
    val cde = cdeRows.map { case (code, term, _) =>
      Concept(code, term, Some(term), "CDE", embed(term))
    }.toDS()
    val vdm = vdmPv.keys.toSeq.sorted.map(c => (c, s"value domain $c")).toDF("code", "term")
    val dec = decOc.map { case (_, d, _, _) => (d, s"data element concept $d") }
      .distinct.toDF("code", "term")
    // dedupe on (code, term) BEFORE building Concepts: Concept holds an
    // Array[Float] whose equals is reference identity, so .distinct on
    // Concept rows silently keeps duplicates
    val oc = decOc.map { case (_, _, o, t) => (o, t) }.distinct
      .map { case (o, t) => Concept(o, t, None, "OC", embed(t)) }.toDS()
    val pr = decPr.map { case (_, p, t, _) => (p, t) }.distinct.toDF("code", "term")
    // HAS_CONCEPT spans its three source labels (schema.png):
    // PV->NCIT (queried by reference code) + OC->NCIT + PR->NCIT
    // grounding. Consumers that mean PV-only enforce the label by
    // joining the pv vertex table (SynonymLookup, SemanticNcitSearch).
    val hasConcept = (pvRows.map { case (p, _, n) => DictEdge(p, n) } ++
      ocGround.map { case (o, n) => DictEdge(o, n) } ++
      decPr.map { case (_, p, _, n) => DictEdge(p, n) }).toDS()
    val hasVdm = cdeRows.map { case (c, _, v) => DictEdge(c, v) }.toDS()
    val hasPv = vdmPv.toSeq.flatMap { case (v, ps) => ps.map(p => DictEdge(v, p)) }.toDS()
    val hasDec = decOc.map { case (c, d, _, _) => DictEdge(c, d) }.toDS()
    val hasOc = decOc.map { case (_, d, o, _) => DictEdge(d, o) }.distinct.toDS()
    val hasPr = decPr.map { case (d, p, _, _) => DictEdge(d, p) }.toDS()
    val st = stRows.toDF("code", "term")
    val hasSt = ncitSt.map { case (n, s) => DictEdge(n, s) }.toDS()
    ConceptDict(ncit, pv, cde, vdm, dec, oc, syns, hasConcept, hasVdm, hasPv,
      hasDec, hasOc, pr, hasPr, st, hasSt)
  }

  // ---- transcript synthesis ----

  private val BaseEpochMs = 1704067200000L // 2024-01-01T00:00:00Z, fixed

  private lazy val terms: IndexedSeq[(String, String)] = // (surface, code)
    ncitRows.map { case (c, t, _, _) => (t, c) }.toIndexedSeq
  private lazy val synSurfaces: IndexedSeq[(String, String)] =
    ncitRows.flatMap { case (c, _, _, ss) => ss.map(s => (s, c)) }.toIndexedSeq
  private lazy val pvSurfaces: IndexedSeq[(String, String)] =
    pvRows.map { case (c, t, _) => (t, c) }.toIndexedSeq

  private def misspell(s: String): String = {
    // drop one inner character, deterministically
    if (s.length < 4) s else s.substring(0, s.length / 2) + s.substring(s.length / 2 + 1)
  }

  @inline private def pick[T](xs: IndexedSeq[T], h: Long): T =
    xs(java.lang.Math.floorMod(h, xs.size.toLong).toInt)

  /** Pure per-turn spec: (role, text, tool, quotedExpected) where
    * `quotedExpected` covers only the quoted-value mention the AC
    * dictionary CANNOT resolve (misspellings -> semantic stage 5;
    * junk -> none). Dictionary-surface expectations are derived by
    * running the same matcher logic in [[expectedForTurn]] — single
    * source of truth for inputs and goldens. */
  def turnSpec(conv: Long, turn: Int): (String, String, Option[String], Seq[(String, Int)]) = {
    val h = Hashing.mix64(conv * 1315423911L + turn * 2654435761L + 17)
    val role = (turn % 3) match {
      case 0 => "user"; case 1 => "assistant"; case _ => "tool"
    }
    val tool = if (role == "tool") Some(pick(IndexedSeq("kg_lookup", "term_matcher", "semantic_search"), h >> 7)) else None
    val tpl = java.lang.Math.floorMod(h, 6L).toInt
    val (t1, c1) = pick(terms, h >> 13)
    val (t2, _) = pick(terms, h >> 23)
    tpl match {
      case 0 => (role, s"patient presents with $t1 at intake", tool, Seq.empty)
      case 1 => (role, s"prior history of $t1 recorded in the chart", tool, Seq.empty)
      case 2 =>
        val (syn, _) = pick(synSurfaces, h >> 13)
        (role, s"clinician suspects $syn per assessment", tool, Seq.empty)
      case 3 =>
        // quoted raw value: rotate pv-term / misspelled term / junk
        java.lang.Math.floorMod(h >> 33, 3L).toInt match {
          case 0 =>
            val (pvt, _) = pick(pvSurfaces, h >> 13)
            (role, s"""mapped raw value "$pvt" from source column""", tool, Seq.empty)
          case 1 =>
            val m = misspell(t1)
            // if the "misspelling" is unchanged (short term) the AC
            // resolves it; otherwise only the semantic stage can
            (role, s"""mapped raw value "$m" from source column""", tool,
              if (m == t1) Seq.empty else Seq((c1, 5)))
          case _ =>
            (role, s"""mapped raw value "zq${java.lang.Math.floorMod(h, 997L)}xv" from source column""", tool, Seq.empty)
        }
      case 4 =>
        (role, s"$t1 suspected and differential includes $t2", tool, Seq.empty)
      case _ => (role, "routine follow up without notable findings", tool, Seq.empty)
    }
  }

  // ---- golden expectation machinery (pure, driver+executor local) ----

  /** norm surface -> winning code at exact-term stage (stage 2):
    * NCIT/PV/CDE preferred terms, ties broken by min code (the
    * ladder's pinned tie-break, SURVEY.md §7.4). */
  lazy val exactTermResolve: Map[String, String] =
    (terms ++ pvSurfaces ++ cdeRows.map { case (c, t, _) => (t, c) })
      .groupBy { case (s, _) => Hashing.norm(s) }
      .map { case (n, xs) => n -> xs.map(_._2).min }

  /** norm synonym surface -> winning code at synonym stage (3). */
  lazy val synonymResolve: Map[String, String] =
    synSurfaces.groupBy { case (s, _) => Hashing.norm(s) }
      .map { case (n, xs) => n -> xs.map(_._2).min }

  lazy val allSurfaceNorms: Seq[String] =
    (terms ++ pvSurfaces ++ synSurfaces).map { case (s, _) => Hashing.norm(s) }.distinct

  @transient private lazy val localAc: graft.dict.AhoCorasick =
    graft.dict.AhoCorasick.build(allSurfaceNorms)

  /** Cascade-resolved expectation for one surface: exact term beats
    * synonym (reference priority cascade llm_agent_4o.py:485-508). */
  def resolveSurface(normSurface: String): Option[(String, Int)] =
    exactTermResolve.get(normSurface).map((_, 2))
      .orElse(synonymResolve.get(normSurface).map((_, 3)))

  /** All expected (code, stage) for a turn: AC dictionary hits
    * resolved through the cascade + quoted-value expectations.
    * Deduped per code keeping the best (lowest) stage. */
  def expectedForTurn(conv: Long, turn: Int): Seq[(String, Int)] = {
    val (_, text, _, quoted) = turnSpec(conv, turn)
    val acHits = localAc.findMatches(text).flatMap { case (b, e) =>
      resolveSurface(Hashing.norm(text.substring(b, e)))
    }
    (acHits ++ quoted).groupBy(_._1)
      .map { case (code, xs) => (code, xs.map(_._2).min) }
      .toSeq.sortBy(identity)
  }

  private def turnsInConv(conv: Long, turnsPerConv: Int, hotEvery: Int, hotFactor: Int): Int =
    if (hotEvery > 0 && conv % hotEvery == 0) turnsPerConv * hotFactor else turnsPerConv

  def mkTurn(conv: Long, turn: Int): Turn = {
    val (role, text, tool, _) = turnSpec(conv, turn)
    Turn(f"conv-$conv%06d", turn, role, text, tool,
      new Timestamp(BaseEpochMs + conv * 86400000L + turn * 60000L))
  }

  /** Distributed deterministic transcript table. Hot conversations
    * (every `hotEvery`-th) get `hotFactor`x turns — the skew fixture
    * the salting/AQE path must absorb. */
  def transcripts(spark: SparkSession, nConvs: Long, turnsPerConv: Int,
                  hotEvery: Int = 50, hotFactor: Int = 20): Dataset[Turn] = {
    import spark.implicits._
    // 4x cores slices: finer tasks smooth hot-conversation imbalance
    // and keep all threads busy across the pipeline's fused stages
    spark.range(0, nConvs, 1, math.max(4 * spark.sparkContext.defaultParallelism, 8))
      .flatMap { conv =>
        (0 until turnsInConv(conv, turnsPerConv, hotEvery, hotFactor))
          .iterator.map(t => mkTurn(conv, t))
      }
  }

  /** Golden expected links (conv_id, turn_idx, code, stage) for the
    * same generator parameters — the "Neo4j-era mapping fixtures"
    * P/R target set (north rule). */
  def goldenLinks(spark: SparkSession, nConvs: Long, turnsPerConv: Int,
                  hotEvery: Int = 50, hotFactor: Int = 20): Dataset[(String, Int, String, Int)] = {
    import spark.implicits._
    spark.range(0, nConvs, 1, math.max(spark.sparkContext.defaultParallelism, 8))
      .flatMap { conv =>
        (0 until turnsInConv(conv, turnsPerConv, hotEvery, hotFactor)).iterator.flatMap { t =>
          expectedForTurn(conv, t).map { case (code, stage) =>
            (f"conv-$conv%06d", t, code, stage)
          }
        }
      }
  }
}
