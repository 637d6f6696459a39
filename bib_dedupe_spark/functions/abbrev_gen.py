"""Structural journal-abbreviation variant generator.

Reference behavior this feeds: prep_container_title.py:145-161 (the
journal-variant translation table). The reference ships a ~1,350-row
curated CSV; the engine instead GENERATES the structurally derivable
part of that coverage from an owned word-level abbreviation dictionary
(ISO-4 / NLM-style, authored from public abbreviation conventions) plus
a seed list of canonical full journal titles — no reference data is
copied.

Why a generator works: the normalization cascade's ``_abbreviate``
(containers.py) collapses every word to a 4-char prefix, so an
NLM-style abbreviation and its full title already normalize identically
whenever each abbreviated word is >= the 4-char prefix of the full word
("J Clin Oncol" vs "Journal of Clinical Oncology" — both become
"j clin onco"). The class that genuinely needs a variant row is
abbreviation words SHORTER than that prefix ("N" for "New", "Dtsch" for
"Deutsche", "Wochenschr" for "Wochenschrift"). ``generate_variants``
emits a (variant → canonical) row exactly when the two forms would
otherwise normalize differently, pruning redundant rows automatically.
"""
from __future__ import annotations

# ISO-4/NLM-convention word abbreviations (authored; common scientific
# title vocabulary). Keys and values lowercase. Only words whose standard
# abbreviation differs from the 4-char-prefix collapse matter for
# coverage, but the full dictionary keeps generated variants faithful to
# the forms found in citation data.
WORD_ABBREVIATIONS: dict[str, str] = {
    "academic": "acad",
    "academy": "acad",
    "acta": "acta",
    "advances": "adv",
    "african": "afr",
    "agents": "agents",
    "agricultural": "agric",
    "american": "am",
    "anaesthesia": "anaesth",
    "anaesthesiologica": "anaesthesiol",
    "anesthesia": "anesth",
    "annals": "ann",
    "annual": "annu",
    "antimicrobial": "antimicrob",
    "applied": "appl",
    "archiv": "arch",
    "archive": "arch",
    "archives": "arch",
    "association": "assoc",
    "australian": "aust",
    "behavior": "behav",
    "behaviour": "behav",
    "biochemical": "biochem",
    "biochemistry": "biochem",
    "biological": "biol",
    "biology": "biol",
    "brazilian": "braz",
    "british": "br",
    "bulletin": "bull",
    "canadian": "can",
    "cancer": "cancer",
    "cardiology": "cardiol",
    "cellular": "cell",
    "chemical": "chem",
    "chemistry": "chem",
    "chemotherapy": "chemother",
    "childhood": "child",
    "chinese": "chin",
    "chirurgie": "chir",
    "clinical": "clin",
    "clinics": "clin",
    "college": "coll",
    "communications": "commun",
    "community": "community",
    "comparative": "comp",
    "computational": "comput",
    "computer": "comput",
    "critical": "crit",
    "current": "curr",
    "dentistry": "dent",
    "dermatologica": "dermatol",
    "dermatology": "dermatol",
    "deutsche": "dtsch",
    "development": "dev",
    "developmental": "dev",
    "disease": "dis",
    "diseases": "dis",
    "economic": "econ",
    "economics": "econ",
    "education": "educ",
    "electronic": "electron",
    "emergency": "emerg",
    "engineering": "eng",
    "england": "engl",
    "english": "engl",
    "environmental": "environ",
    "epidemiology": "epidemiol",
    "european": "eur",
    "experimental": "exp",
    "frontiers": "front",
    "gastroenterology": "gastroenterol",
    "general": "gen",
    "genetics": "genet",
    "geriatrics": "geriatr",
    "gynaecology": "gynaecol",
    "gynecologica": "gynecol",
    "gynecology": "gynecol",
    "history": "hist",
    "hospital": "hosp",
    "human": "hum",
    "hygiene": "hyg",
    "immunology": "immunol",
    "indian": "indian",
    "infectious": "infect",
    "institute": "inst",
    "institution": "inst",
    "internal": "intern",
    "international": "int",
    "investigation": "invest",
    "investigative": "invest",
    "japanese": "jpn",
    "journal": "j",
    "klinische": "klin",
    "laboratory": "lab",
    "laryngology": "laryngol",
    "letters": "lett",
    "magazine": "mag",
    "magnetic": "magn",
    "materials": "mater",
    "mathematical": "math",
    "mathematics": "math",
    "maxillofacial": "maxillofac",
    "mechanical": "mech",
    "medica": "med",
    "medical": "med",
    "medicine": "med",
    "medizinische": "med",
    "microbiology": "microbiol",
    "molecular": "mol",
    "morbidity": "morb",
    "mortality": "mortal",
    "national": "natl",
    "natural": "nat",
    "nature": "nat",
    "nederlands": "ned",
    "neurology": "neurol",
    "neuroscience": "neurosci",
    "new": "n",
    "nuclear": "nucl",
    "nursing": "nurs",
    "nutrition": "nutr",
    "obstetricia": "obstet",
    "obstetrics": "obstet",
    "occupational": "occup",
    "oncology": "oncol",
    "ophthalmology": "ophthalmol",
    "organic": "org",
    "organization": "organ",
    "orthopaedic": "orthop",
    "orthopaedica": "orthop",
    "orthopedic": "orthop",
    "otology": "otol",
    "paediatrica": "paediatr",
    "paediatrics": "paediatr",
    "pediatric": "pediatr",
    "pediatrics": "pediatr",
    "periodontology": "periodontol",
    "pharmaceutical": "pharm",
    "pharmacology": "pharmacol",
    "physical": "phys",
    "physics": "phys",
    "physiology": "physiol",
    "practice": "pract",
    "proceedings": "proc",
    "psychiatrica": "psychiatr",
    "psychiatry": "psychiatry",
    "psychological": "psychol",
    "psychology": "psychol",
    "psychosomatic": "psychosom",
    "public": "public",
    "quarterly": "q",
    "radiation": "radiat",
    "radiology": "radiol",
    "rehabilitation": "rehabil",
    "report": "rep",
    "reports": "rep",
    "research": "res",
    "resonance": "reson",
    "respiratory": "respir",
    "review": "rev",
    "reviews": "rev",
    "revista": "rev",
    "rheumatic": "rheum",
    "rheumatism": "rheum",
    "rheumatology": "rheumatol",
    "rhinology": "rhinol",
    "roentgenology": "roentgenol",
    "royal": "r",
    "scandinavian": "scand",
    "scandinavica": "scand",
    "school": "sch",
    "science": "sci",
    "sciences": "sci",
    "scientific": "sci",
    "seminars": "semin",
    "social": "soc",
    "society": "soc",
    "south": "s",
    "statistical": "stat",
    "statistics": "stat",
    "studies": "stud",
    "surgery": "surg",
    "surgical": "surg",
    "technology": "technol",
    "therapeutics": "ther",
    "therapy": "ther",
    "tijdschrift": "tijdschr",
    "transactions": "trans",
    "tropical": "trop",
    "university": "univ",
    "veterinary": "vet",
    "weekly": "wkly",
    "wochenschrift": "wochenschr",
    "world": "world",
    "zealand": "z",
    "zeitschrift": "z",
}

# words dropped in ISO-4/NLM abbreviations (articles/prepositions across
# the languages common in venue titles)
ABBREV_STOPWORDS = frozenset(
    "of the and for in on a an de la le les der die das du des und et "
    "voor van het em do da di e y el los".split()
)


def nlm_abbreviation(title: str) -> str:
    """ISO-4/NLM-style abbreviation of a full journal title.

    Single-word titles are never abbreviated (the ISO-4 rule: "Nature"
    stays "Nature"); otherwise stopwords drop and each word maps through
    the dictionary (unknown words pass through unabbreviated).
    """
    words = [w for w in title.lower().split() if w]
    if len(words) <= 1:
        return title.lower()
    kept = [w for w in words if w not in ABBREV_STOPWORDS]
    if not kept:
        kept = words
    return " ".join(WORD_ABBREVIATIONS.get(w, w) for w in kept)


def generate_variants(canonical: str, normalizer=None) -> list[str]:
    """Variant strings for ``canonical`` that the normalization cascade
    would NOT already collapse onto it.

    ``normalizer`` is the container-title cascade (injected to avoid a
    circular import); with it, redundant variants — those the 4-char
    prefix collapse already unifies — are pruned so the bundled table
    stays minimal.
    """
    abbrev = nlm_abbreviation(canonical)
    if abbrev == canonical.lower():
        return []
    # variant keys are matched as SUBSTRINGS of the (gated) haystack, so
    # short abbreviations risk false hits inside unrelated longer titles
    # ("cancer res" inside "breast cancer research ..."): only >=3-word
    # abbreviations are emitted, mirroring the length profile curated
    # variant tables keep for the same reason
    if len(abbrev.split()) < 3:
        return []
    if normalizer is not None:
        empty: dict = {}
        if normalizer(abbrev, empty) == normalizer(canonical, empty):
            return []  # cascade already unifies the pair
    return [abbrev]


def generated_mapping(canonicals, normalizer=None) -> dict[str, str]:
    """Ordered {variant_lower: canonical_lower} for a canonical-title list."""
    out: dict[str, str] = {}
    for canonical in canonicals:
        canonical = canonical.strip()
        if not canonical or canonical.startswith("#"):
            continue
        for var in generate_variants(canonical, normalizer):
            out.setdefault(var, canonical.lower())
    return out
