"""Deterministic synthetic bibliographic corpus with labeled duplicates.

Seed-fixed generator producing (records, golden duplicate pairs) for
differential tests, F1 evaluation and benchmarks. Duplicate variants
mirror the drift patterns of the reference's labeled cases
(/root/reference/tests/test_cases.json): author abbreviation, venue
abbreviation, upper-casing, dropped doi/pages/venue, ±1 year, early-view
pages, HTML-tagged titles — plus true-negative traps (part 1 vs part 2,
comment titles, adjacent page ranges, conference-vs-journal versions).
"""
from __future__ import annotations

import random

_WORDS = (
    "adaptive distributed neural spectral robust scalable latent causal "
    "dynamic sparse temporal spatial efficient probabilistic hierarchical "
    "streaming relational convex generative contrastive federated graph "
    "kernel bayesian stochastic entity resolution blocking matching "
    "clustering similarity retrieval embedding attention transformer"
).split()

_SURNAMES = (
    "wagner smith chen garcia mueller kim okafor rossi dubois tanaka "
    "novak silva patel johansson kowalski murphy ivanov haddad berg lund"
).split()

_GIVEN = (
    "Anna Bruno Carla David Elena Felix Gerit Hana Igor Julia Karl Lena "
    "Marco Nadia Omar Paula Quentin Rosa Stefan Tara"
).split()

_VENUES = [
    ("Journal of Information Systems", "article"),
    ("International Journal of Data Engineering", "article"),
    ("Transactions on Knowledge Discovery", "article"),
    ("Annals of Applied Statistics", "article"),
    ("European Journal of Operational Research", "article"),
    ("Proceedings of the Conference on Management of Data", "inproceedings"),
    ("Workshop on Web Information Retrieval", "inproceedings"),
    ("American Journal of Epidemiology", "article"),
    ("British Medical Journal", "article"),
    ("Advances in Neural Information Processing", "inproceedings"),
]


# realistic-entropy title pool: web/bibliographic text draws from a
# 10^4-10^5-word vocabulary with a Zipf frequency profile, unlike the
# deliberately tiny _WORDS pool above (which stresses the dense
# shared-word regime). Built lazily; deterministic.
_ZIPF_VOCAB = 5000
_ZIPF_S = 1.07
_zipf_pool: list = []
_zipf_cum: list = []


def _zipf_tables():
    if not _zipf_pool:
        import itertools

        # pronounceable deterministic pseudo-words, no digits (prep
        # strips digits from blocking keys)
        cons = "btkdrmnslpvgz"
        vow = "aeiou"
        syll = ["".join(p) for p in itertools.product(cons, vow)]
        words = []
        i = 0
        while len(words) < _ZIPF_VOCAB:
            a = syll[i % len(syll)]
            b = syll[(i * 7 + 3) % len(syll)]
            c = syll[(i * 13 + 11) % len(syll)]
            w = a + b + (c if i % 3 else "")
            if w not in words[-50:]:
                words.append(w)
            i += 1
        total = 0.0
        cum = []
        for r in range(len(words)):
            total += 1.0 / (r + 1) ** _ZIPF_S
            cum.append(total)
        _zipf_pool.extend(words)
        _zipf_cum.extend(c / total for c in cum)
    return _zipf_pool, _zipf_cum


def _zipf_word(rng: random.Random) -> str:
    import bisect

    pool, cum = _zipf_tables()
    return pool[bisect.bisect_left(cum, rng.random())]


def _title(rng: random.Random, vocab: str = "dense") -> str:
    n = rng.randint(6, 12)
    if vocab == "zipf":
        words = [_zipf_word(rng) for _ in range(n)]
    else:
        words = [rng.choice(_WORDS) for _ in range(n)]
    return (" ".join(words)).capitalize()


def _authors(rng: random.Random) -> list:
    n = rng.randint(1, 5)
    return [
        (rng.choice(_SURNAMES).capitalize(), rng.choice(_GIVEN))
        for _ in range(n)
    ]


def _fmt_authors_full(authors: list) -> str:
    return " and ".join(f"{s}, {g}" for s, g in authors)


def _fmt_authors_abbrev(authors: list) -> str:
    return "; ".join(f"{g[0]}. {s}" for s, g in authors)


def _abbrev_venue(venue: str) -> str:
    return ".".join(w[:4].title() for w in venue.split() if len(w) > 3) + "."


def _mess_up(rec: dict, rng: random.Random) -> dict:
    """Apply real-world formatting corruption (normalizers must undo it).

    Mirrors the messy formats the reference's prep layer handles:
    semicolon initials-surname authors, resolver-prefixed DOIs,
    parenthesized volume clutter, lettered/zero-padded pages, ISO dates in
    the year field, HTML/withdrawn/review title noise, copyright-tailed
    abstracts, 'Proceedings of the' venue prefixes.
    """
    rec = dict(rec)
    roll = rng.random()
    if roll < 0.3 and " and " in rec["author"]:
        parts = []
        for author in rec["author"].split(" and "):
            surname, given = [p.strip() for p in author.split(",", 1)]
            parts.append(f"{given[0]}. {surname}")
        rec["author"] = "; ".join(parts)
    elif roll < 0.4:
        rec["author"] = rec["author"].upper()

    if rng.random() < 0.3 and rec["volume"]:
        rec["volume"] = f"{rec['volume']} (3) ()(pp {rec['pages']}) {rec['year']}"
    if rng.random() < 0.2 and rec["number"]:
        rec["number"] = f"SUPPL.{rec['number']}"
    if rng.random() < 0.3 and rec["pages"]:
        start, end = rec["pages"].split("-")
        rec["pages"] = f"S{start}-S{end}"
    if rng.random() < 0.3 and rec["doi"]:
        rec["doi"] = "http://dx.doi.org/" + rec["doi"].upper()
    if rng.random() < 0.2:
        rec["year"] = f"{rec['year']}-05-01"
    title_roll = rng.random()
    if title_roll < 0.15:
        rec["title"] = f"<i>{rec['title']}</i>"
    elif title_roll < 0.25:
        rec["title"] = f"{rec['title']} (Review)"
    elif title_roll < 0.3:
        rec["title"] = f"WITHDRAWN: {rec['title']}"
    if rng.random() < 0.2 and rec["abstract"]:
        rec["abstract"] = (
            "Aims " + rec["abstract"] + ". Copyright 2019 Elsevier Ltd."
        )
    if rng.random() < 0.2 and rec["booktitle"]:
        rec["booktitle"] = "Proceedings of the " + rec["booktitle"]
    if rng.random() < 0.15 and rec["journal"]:
        rec["journal"] = rec["journal"] + " [Electronic Resource]"
    return rec


def generate(
    n_base: int = 200,
    dup_rate: float = 0.4,
    seed: int = 42,
    messy: bool = False,
    title_vocab: str = "dense",
) -> tuple:
    """Return (records: list[dict], duplicate_pairs: set[frozenset]).

    Each base record optionally gets one drifted duplicate variant; a
    fraction of records get a hard true-negative sibling instead.
    ``messy=True`` additionally corrupts field formatting with the
    real-world noise patterns the prep layer must normalize away.
    ``title_vocab="zipf"`` draws titles from a 5000-word Zipf pool (the
    realistic web-text entropy regime) instead of the tiny default pool;
    variants still derive from the base title, so golden duplicate pairs
    and the F1 evaluation remain meaningful in both regimes.
    """
    rng = random.Random(seed)
    records: list = []
    golden: set = set()
    rid = 0

    def next_id() -> str:
        nonlocal rid
        rid += 1
        return f"r{rid:06d}"

    for i in range(n_base):
        venue, entrytype = rng.choice(_VENUES)
        authors = _authors(rng)
        year = rng.randint(1980, 2024)
        volume = str(rng.randint(1, 120))
        number = str(rng.randint(1, 12))
        start = rng.randint(1, 900)
        pages = f"{start}-{start + rng.randint(4, 40)}"
        doi = f"10.{rng.randint(1000, 9999)}/{rng.randint(100000, 999999)}"
        title = _title(rng, title_vocab)
        abstract = ""
        if rng.random() < 0.4:
            abstract = (
                " ".join(rng.choice(_WORDS) for _ in range(30)).capitalize()
                + "."
            )
        base_id = next_id()
        base = {
            "ID": base_id,
            "ENTRYTYPE": entrytype,
            "author": _fmt_authors_full(authors),
            "title": title,
            "journal": venue if entrytype == "article" else "",
            "booktitle": venue if entrytype != "article" else "",
            "year": str(year),
            "volume": volume,
            "number": number,
            "pages": pages,
            "abstract": abstract,
            "doi": doi if rng.random() < 0.7 else "",
            "search_set": "",
        }
        records.append(base)

        roll = rng.random()
        if roll < dup_rate:
            # drifted true duplicate
            var = dict(base)
            var["ID"] = next_id()
            drift = rng.randint(0, 6)
            if drift == 0:
                var["author"] = _fmt_authors_abbrev(authors)
                var["doi"] = ""
            elif drift == 1:
                var["title"] = title.upper()
                var["journal"] = (
                    _abbrev_venue(venue) if var["journal"] else ""
                )
                var["booktitle"] = (
                    _abbrev_venue(venue) if var["booktitle"] else ""
                )
            elif drift == 2:
                var["pages"] = ""
                var["number"] = ""
            elif drift == 3:
                var["doi"] = ""
                var["volume"] = ""
                var["pages"] = "1-" + str(rng.randint(5, 30))  # early view
            elif drift == 4:
                var["title"] = f"<i>{title}</i> (Review)"
            elif drift == 5 and entrytype == "article":
                # forthcoming-vs-published year drift; conference papers are
                # excluded (the rule set vetoes inproceedings year mismatch
                # by design — same venue/different year means a new paper)
                var["year"] = str(year + 1)
                var["doi"] = base["doi"]
            else:
                var["author"] = _fmt_authors_full(
                    [(s.upper(), g) for s, g in authors]
                )
            records.append(var)
            golden.add(frozenset((base_id, var["ID"])))
        elif roll < dup_rate + 0.15:
            # hard true negative
            neg = dict(base)
            neg["ID"] = next_id()
            trap = rng.randint(0, 3)
            if trap == 0:
                neg["title"] = title + " part 2"
                records[-1]["title"] = title + " part 1"
                neg["pages"] = f"{start + 50}-{start + 80}"
                neg["doi"] = ""
            elif trap == 1:
                neg["title"] = "Comment on " + title.lower()
                neg["doi"] = ""
                neg["pages"] = ""
            elif trap == 2:
                end = int(pages.split("-")[1])
                neg["pages"] = f"{end + 1}-{end + 20}"  # adjacent range
                neg["title"] = _title(rng, title_vocab).capitalize()
                neg["doi"] = ""
            else:
                neg["year"] = str(year + 5)
                neg["volume"] = str(int(volume) + 5)
                neg["number"] = str((int(number) % 12) + 1)
                neg["pages"] = f"{start + 200}-{start + 230}"
                neg["doi"] = ""
            records.append(neg)

    if messy:
        records = [
            _mess_up(rec, rng) if rng.random() < 0.6 else rec
            for rec in records
        ]

    return records, golden


def pairwise_scores(found: set, golden: set) -> dict:
    """Precision/recall/F1 of unordered duplicate pairs."""
    tp = len(found & golden)
    fp = len(found - golden)
    fn = len(golden - found)
    precision = tp / (tp + fp) if tp + fp else 1.0
    recall = tp / (tp + fn) if tp + fn else 1.0
    f1 = (
        2 * precision * recall / (precision + recall)
        if precision + recall
        else 0.0
    )
    return {
        "tp": tp,
        "fp": fp,
        "fn": fn,
        "precision": precision,
        "recall": recall,
        "f1": f1,
    }
