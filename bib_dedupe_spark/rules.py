"""Decision rules: duplicate / non-duplicate / maybe predicates as Spark SQL.

Behavioral spec: /root/reference/bib_dedupe/match_conditions.py (builders
:19-50, 26 duplicate conditions :74-114, 8 veto conditions :116-134) and
the maybe classification in match.py:103-123. The reference evaluates
pandas ``query`` strings; here the same rule algebra is emitted as ANSI
SQL predicate strings over the scored pair table and compiled by Catalyst
into one fused filter. Parenthesization is explicit everywhere (pandas
``&`` binds tighter than ``|``, same as SQL AND/OR).

Extension point: pass custom rule lists to the match stage — these are
plain SQL strings over the similarity + raw pair columns.
"""
from __future__ import annotations

import re

from bib_dedupe_spark import constants as C

AUTHOR = C.AUTHOR
TITLE = C.TITLE
CONTAINER_TITLE = C.CONTAINER_TITLE
YEAR = C.YEAR
VOLUME = C.VOLUME
NUMBER = C.NUMBER
PAGES = C.PAGES
ABSTRACT = C.ABSTRACT
DOI = C.DOI
PRA = C.PAGE_RANGES_ADJACENT
ENTRYTYPE = C.ENTRYTYPE

# The smallest similarity threshold ANY rule (duplicate, maybe, veto)
# applies to the abstract similarity column: every comparison is either
# `abstract > t` with t >= this value or `abstract = 1.0`
# (non_contradicting(ABSTRACT) compares the RAW strings, not the sim).
# The sim stage passes this to sim_abstract as the lossless
# partial-ratio cutoff; test_rules pins it against the rule strings.
MIN_ABSTRACT_SIM_THRESHOLD = 0.8


def mismatch(*keys: str) -> str:
    """Each field present on both sides and different."""
    return " AND ".join(
        f" ({k}_1 != {k}_2 AND {k}_1 != '' AND {k}_2 != '') " for k in keys
    )


def sim_match(*fields: str, threshold: float = 1.0) -> str:
    """Similarity meets the threshold AND both raw sides are non-empty."""
    if threshold == 1.0:
        sims = " AND ".join(f" ({f} = 1.0) " for f in fields)
    else:
        sims = " AND ".join(f" ({f} > {threshold}) " for f in fields)
    non_empty = " AND ".join(
        f" ({f}_1 != '' AND {f}_2 != '') " for f in fields
    )
    return f"({sims}) AND ({non_empty})"


def non_contradicting(*keys: str) -> str:
    """Raw values equal, or either side missing."""
    return " AND ".join(
        f" ( {k}_1 = {k}_2 OR {k}_1 = '' OR {k}_2 = '' ) " for k in keys
    )


def both_entrytypes(entrytype: str) -> str:
    return f"({ENTRYTYPE}_1 = '{entrytype}' AND {ENTRYTYPE}_2 = '{entrytype}')"


# graded author/title/container-title gates (match_conditions.py:53-61)
au07_ti10_ct10 = f" {sim_match(TITLE, CONTAINER_TITLE)} AND {AUTHOR} > 0.7 "
au10_ti07_ct10 = f" ({sim_match(AUTHOR, CONTAINER_TITLE)} AND {TITLE} > 0.7 ) "
au10_ti10_ct07 = f" {sim_match(TITLE, AUTHOR)} AND {CONTAINER_TITLE} > 0.7 "
au095_ti09_ct075 = (
    f" ({AUTHOR} > 0.95 AND {TITLE} > 0.9 AND  {CONTAINER_TITLE} > 0.75) "
)
au08_ti09_ct09 = f" ({AUTHOR} > 0.8 AND {TITLE} > 0.9 AND {CONTAINER_TITLE} > 0.9) "
au09_ti09_ctXX = f" ({AUTHOR} > 0.9 AND {TITLE} > 0.9) "
auXX_ti095_ct095 = f" ({TITLE} > 0.95 AND {CONTAINER_TITLE} > 0.95) "
au10_tiXX_ct10 = f" ({sim_match(AUTHOR)} AND {sim_match(CONTAINER_TITLE)}) "
au10_ti10_ctNC = (
    f" {sim_match(AUTHOR, TITLE)} AND {non_contradicting(CONTAINER_TITLE)} "
)

DUPLICATE_CONDITIONS = [
    # substantial difference in exactly one of author/title/container
    f"({au07_ti10_ct10} AND {sim_match(VOLUME, PAGES)})",
    f"({au07_ti10_ct10} AND {non_contradicting(VOLUME, NUMBER, PAGES, YEAR, DOI)})",
    f"({au10_ti07_ct10} AND {non_contradicting(NUMBER, PAGES, YEAR, DOI)})",
    f"({au10_ti10_ct07} AND {non_contradicting(VOLUME, NUMBER, PAGES, YEAR, DOI)})",
    # moderate differences across all three
    f"({au08_ti09_ct09} AND {non_contradicting(VOLUME, NUMBER, YEAR, DOI)} AND {PAGES} > 0.75 )",
    f"({au08_ti09_ct09} AND {non_contradicting(VOLUME, NUMBER, PAGES, DOI)})",
    f"({au095_ti09_ct075} AND {non_contradicting(VOLUME, NUMBER, PAGES, YEAR, DOI)})",
    f"({au095_ti09_ct075} AND {sim_match(NUMBER, PAGES)})",
    f"({au095_ti09_ct075} AND {sim_match(VOLUME, NUMBER)})",
    f"({au095_ti09_ct075} AND {sim_match(VOLUME, PAGES)})",
    f"({au095_ti09_ct075} AND {sim_match(VOLUME)} AND {ABSTRACT} > 0.9)",
    f"({au095_ti09_ct075} AND {sim_match(YEAR, ABSTRACT)})",
    # inproceedings need a matching year
    f"({au095_ti09_ct075} AND {both_entrytypes('inproceedings')} AND {sim_match(YEAR)})",
    # updated records linked by DOI
    f"({au07_ti10_ct10} AND {DOI} > 0.9)",
    # author missing on either side
    f"({auXX_ti095_ct095} AND {non_contradicting(VOLUME, NUMBER, PAGES, YEAR, DOI)})",
    f"({auXX_ti095_ct095} AND {sim_match(VOLUME, NUMBER, PAGES, YEAR)} AND {non_contradicting(DOI, ABSTRACT)})",
    # container missing (e.g. GROBID extractions)
    f"({au10_ti10_ctNC} AND {sim_match(VOLUME, YEAR)} AND {non_contradicting(NUMBER, PAGES, DOI, ABSTRACT)})",
    f"({au10_ti10_ctNC} AND {sim_match(YEAR, DOI)} AND {non_contradicting(VOLUME, NUMBER, PAGES, ABSTRACT)})",
    f"({au10_ti10_ctNC} AND {sim_match(YEAR)} AND {non_contradicting(VOLUME, NUMBER, PAGES, DOI, ABSTRACT)})",
    f"({au09_ti09_ctXX} AND {sim_match(PAGES, DOI)} AND {non_contradicting(VOLUME, NUMBER, ABSTRACT)} AND {YEAR} > 0.9)",
    f"({au09_ti09_ctXX} AND ({sim_match(NUMBER)} AND {non_contradicting(PAGES)} OR {non_contradicting(NUMBER)} AND {sim_match(PAGES)}) AND {non_contradicting(VOLUME, YEAR, DOI, ABSTRACT)})",
    f"({au09_ti09_ctXX} AND {sim_match(VOLUME, PAGES)})",
    f"({au09_ti09_ctXX} AND {sim_match(PAGES, YEAR)} AND {non_contradicting(VOLUME, NUMBER, DOI)})",
    # DOI-exact with strong corroboration
    f"(({sim_match(DOI)} AND NOT (doi_1 = '' OR doi_2 = '')) AND ({TITLE} > 0.95) AND ({AUTHOR} > 0.9) AND ({YEAR} > 0.9)) AND {non_contradicting(CONTAINER_TITLE)} ",
    # title mismatch but full bibliographic agreement
    f"({au10_tiXX_ct10} AND {sim_match(VOLUME, NUMBER, PAGES, YEAR)} AND {non_contradicting(DOI)} AND ({ABSTRACT} > 0.95 OR {non_contradicting(ABSTRACT)}))",
    # early-view (pages '1-…', missing volume) vs final version
    f"({au095_ti09_ct075}"
    f" AND {non_contradicting(DOI)}"
    f" AND ((volume_1 != '' AND volume_2 = '') OR (volume_2 != '' AND volume_1 = ''))"
    f" AND ((number_1 != '' AND number_2 = '') OR (number_2 != '' AND number_1 = '') OR {non_contradicting(NUMBER)})"
    f" AND (pages_1 RLIKE '^1[-–]' OR pages_2 RLIKE '^1[-–]')"
    f")",
]

NON_DUPLICATE_CONDITIONS = [
    f"({mismatch(YEAR)} AND NOT ({sim_match(VOLUME)} OR {sim_match(NUMBER)} OR {sim_match(PAGES)} OR {sim_match(DOI)} OR {sim_match(CONTAINER_TITLE)}))",
    f"({mismatch(TITLE)} AND ({PRA} = 'adjacent' OR {PRA} = 'non_overlapping'))",
    f"(NOT (doi_1 = '' OR doi_2 = '') AND {DOI} < 0.8 AND NOT ({non_contradicting(AUTHOR, TITLE, YEAR, CONTAINER_TITLE, VOLUME, NUMBER, PAGES)}))",
    f"({mismatch(VOLUME, NUMBER, PAGES)})",
    # editorials: small volume/number/pages differences are meaningful
    f"(contains(title_1, 'editor') AND length(title_1) < 60 AND ( {mismatch(VOLUME)} OR {mismatch(NUMBER)} OR {mismatch(PAGES)}))",
    # journal vs conference/workshop venues
    f"((contains({CONTAINER_TITLE}_1, 'j') AND "
    f" NOT (contains({CONTAINER_TITLE}_1, 'conf') OR contains({CONTAINER_TITLE}_1, 'work') OR contains({CONTAINER_TITLE}_1, 'proc')) ) AND "
    f" ( (contains({CONTAINER_TITLE}_2, 'conf') OR contains({CONTAINER_TITLE}_2, 'work') OR contains({CONTAINER_TITLE}_2, 'proc')) AND "
    f"  NOT contains({CONTAINER_TITLE}_2, 'j') ))",
    f"((contains({CONTAINER_TITLE}_2, 'j') AND "
    f" NOT (contains({CONTAINER_TITLE}_2, 'conf') OR contains({CONTAINER_TITLE}_2, 'work') OR contains({CONTAINER_TITLE}_2, 'proc')) ) AND "
    f" ( (contains({CONTAINER_TITLE}_1, 'conf') OR contains({CONTAINER_TITLE}_1, 'work') OR contains({CONTAINER_TITLE}_1, 'proc')) AND "
    f"  NOT contains({CONTAINER_TITLE}_1, 'j') ))",
    # inproceedings are sensitive to year mismatches
    f"({both_entrytypes('inproceedings')} AND {mismatch(YEAR)})",
]

# maybe classification (match.py:106-123); the year-gap guard coalesces to
# false so NULL arithmetic matches pandas NaN-comparison semantics
MAYBE_CONDITION = (
    f"({TITLE} > 0.85) AND ({AUTHOR} > 0.75)"
    f" OR ({TITLE} > 0.8) AND ({ABSTRACT} > 0.8)"
    f" OR ({TITLE} > 0.8) AND ({CONTAINER_TITLE} > 0.8)"
    f" OR ({DOI} IS NULL OR {DOI} > 0.99 OR {DOI} = 0)"
    f" AND NOT ("
    f"   COALESCE(try_cast({YEAR}_1 AS DOUBLE) - try_cast({YEAR}_2 AS DOUBLE) > 1, false)"
    f"   OR COALESCE(try_cast({YEAR}_2 AS DOUBLE) - try_cast({YEAR}_1 AS DOUBLE) > 1, false)"
    f" )"
)


# ---------------------------------------------------------------------------
# Factored (tree-shrunk) rule evaluation.
#
# The fused 26-way disjunction repeats the same fragments dozens of times
# (au095_ti09_ct075 appears 8x; each non_contradicting key expands to 3
# comparisons) — Catalyst re-analyzes the whole ~2k-node tree on every
# match() call (~1.5s, paid per streaming micro-batch). Factoring each
# repeated fragment into a boolean flag column shrinks the filter tree an
# order of magnitude with BIT-IDENTICAL semantics: the rewrite is verbatim
# string substitution of exactly the fragment texts the conditions were
# built from (test_rules pins substitution completeness).
# ---------------------------------------------------------------------------

_PIECE_FIELDS = (
    AUTHOR,
    TITLE,
    CONTAINER_TITLE,
    YEAR,
    VOLUME,
    NUMBER,
    PAGES,
    DOI,
    ABSTRACT,
)

_PIECE_ATOMS = {}
for _f in _PIECE_FIELDS:
    # exactly the per-key texts emitted by non_contradicting / sim_match /
    # mismatch above — substitution relies on verbatim equality
    _PIECE_ATOMS[f"_r_nc_{_f}"] = (
        f" ( {_f}_1 = {_f}_2 OR {_f}_1 = '' OR {_f}_2 = '' ) "
    )
    _PIECE_ATOMS[f"_r_eq_{_f}"] = f" ({_f} = 1.0) "
    _PIECE_ATOMS[f"_r_ne_{_f}"] = f" ({_f}_1 != '' AND {_f}_2 != '') "
    _PIECE_ATOMS[f"_r_mm_{_f}"] = (
        f" ({_f}_1 != {_f}_2 AND {_f}_1 != '' AND {_f}_2 != '') "
    )

_GATE_ATOMS = {
    "_r_g_au07_ti10_ct10": au07_ti10_ct10,
    "_r_g_au10_ti07_ct10": au10_ti07_ct10,
    "_r_g_au10_ti10_ct07": au10_ti10_ct07,
    "_r_g_au095_ti09_ct075": au095_ti09_ct075,
    "_r_g_au08_ti09_ct09": au08_ti09_ct09,
    "_r_g_au09_ti09_ctXX": au09_ti09_ctXX,
    "_r_g_auXX_ti095_ct095": auXX_ti095_ct095,
    "_r_g_au10_tiXX_ct10": au10_tiXX_ct10,
    "_r_g_au10_ti10_ctNC": au10_ti10_ctNC,
}


def factored_rule_plan():
    """(piece_flags, gate_flags, rewrite) for tree-shrunk rule filters.

    ``piece_flags`` are flag-column SQL over the sim columns; ``gate_flags``
    reference piece flags (add them in a second withColumns). ``rewrite``
    maps any predicate built from the module's fragments onto the flags.
    """
    pieces = dict(_PIECE_ATOMS)
    gates = {}
    for name, sql in _GATE_ATOMS.items():
        for pname, psql in pieces.items():
            sql = sql.replace(psql, f" ({pname}) ")
        gates[name] = sql

    def rewrite(sql: str) -> str:
        for gname, gsql in _GATE_ATOMS.items():
            sql = sql.replace(gsql, f" ({gname}) ")
        for pname, psql in pieces.items():
            sql = sql.replace(psql, f" ({pname}) ")
        return sql

    return pieces, gates, rewrite


def duplicate_predicate() -> str:
    return " OR ".join(DUPLICATE_CONDITIONS)


def veto_predicate() -> str:
    return "NOT (" + " OR ".join(NON_DUPLICATE_CONDITIONS) + ")"


# ---------------------------------------------------------------------------
# Staged (lazy) similarity support: three-valued rule bounds.
#
# The expensive kernels are author and abstract. Every atom referencing
# the author/abstract SIM columns in the default rule set is of the form
# `sim > t` or `sim = 1.0` and appears in a NOT-free (positive) context,
# so each predicate is monotone NON-DECREASING in both unknowns:
# substituting 1.0 yields an upper bound (can-the-rule-fire) and 0.0 a
# lower bound (must-the-rule-fire), for ANY actual value in [0,1] or
# NULL. The veto conditions read only raw columns + cheap sims, so they
# are exact before the expensive kernels run. match.py uses these bounds
# to decide most pairs on cheap sims alone. Monotonicity is pinned by
# test_rules (token scan: no NOT enclosing an author/abstract sim atom).
# ---------------------------------------------------------------------------

# bare sim-column tokens; \b does not match before '_', so author_1,
# author_full_1, abstract_2 etc. are untouched
_AUTHOR_TOKEN = re.compile(rf"\b{AUTHOR}\b")
_ABSTRACT_TOKEN = re.compile(rf"\b{ABSTRACT}\b")


def substitute_expensive(sql: str, author_val: float, abstract_val: float) -> str:
    """Replace bare ``author``/``abstract`` sim references with literals."""
    sql = _AUTHOR_TOKEN.sub(f"CAST({author_val} AS DOUBLE)", sql)
    sql = _ABSTRACT_TOKEN.sub(f"CAST({abstract_val} AS DOUBLE)", sql)
    return sql


def references_expensive(sql: str) -> bool:
    """Does ``sql`` read the author or abstract SIM column?"""
    return bool(_AUTHOR_TOKEN.search(sql) or _ABSTRACT_TOKEN.search(sql))


def not_scopes(sql: str):
    """Yield the parenthesized argument of every ``NOT (...)`` in sql."""
    for m in re.finditer(r"\bNOT\s*\(", sql):
        depth, start = 1, m.end()
        i = start
        while depth and i < len(sql):
            if sql[i] == "(":
                depth += 1
            elif sql[i] == ")":
                depth -= 1
            i += 1
        yield sql[start : i - 1]


# atoms provably monotone NON-DECREASING in the sim value over [0,1]:
# `sim > t`, `sim >= t`, and the exact-match step `sim = 1.0`
_MONOTONE_ATOM = re.compile(
    rf"\b(?:{AUTHOR}|{ABSTRACT})\b\s*"
    rf"(?:(?:>=|>)\s*[0-9]*\.?[0-9]+|=\s*1\.0\b)"
)


def monotone_in_expensive(conditions) -> bool:
    """Can these predicates be bound by substituting author/abstract=0/1?

    True iff every reference to the author/abstract SIM columns is a
    monotone-nondecreasing atom (`> t`, `>= t`, `= 1.0`) outside any
    NOT(...) scope — the soundness condition for the staged match path's
    hi/lo substitution. Conservative: anything unrecognized refuses.
    """
    for cond in conditions:
        for scope in not_scopes(cond):
            if references_expensive(scope):
                return False
        stripped = _MONOTONE_ATOM.sub(" TRUE ", cond)
        if references_expensive(stripped):
            return False
    return True


_CMP_RIGHT = re.compile(
    rf"\b{ABSTRACT}\b\s*(>=|<=|!=|=|>|<)\s*([0-9]*\.?[0-9]+)"
)
_CMP_LEFT = re.compile(
    rf"([0-9]*\.?[0-9]+)\s*(>=|<=|!=|=|>|<)\s*\b{ABSTRACT}\b"
)
_FLIP = {">": "<", "<": ">", ">=": "<=", "<=": ">=", "=": "=", "!=": "!="}


def validate_abstract_cutoff(conditions, cutoff: float) -> None:
    """Raise unless every ``abstract``-sim comparison in ``conditions`` is
    decided identically by the banded kernel's lower-bound contract.

    The sim stage computes ``sim_abstract`` with a partial-ratio cutoff:
    values STRICTLY above ``cutoff`` are exact, values at or below it may
    be lower bounds. `abstract > t` with t >= cutoff is therefore
    unaffected, and `>= t` / `= t` need t strictly above the cutoff (a
    true sim exactly at the cutoff can be reported as a lower bound,
    flipping those forms from fire to no-fire); any comparison against a
    threshold below the cutoff (or any `<`/`<=`/`!=` form, which a lower
    bound can flip) could silently change under banding. Callers with such rules must
    request exact scoring (``abstract_cutoff=0.0``).
    """
    for cond in conditions:
        hits = [
            (op, float(val)) for op, val in _CMP_RIGHT.findall(cond)
        ] + [
            (_FLIP[op], float(val)) for val, op in _CMP_LEFT.findall(cond)
        ]
        stripped = _CMP_RIGHT.sub(" TRUE ", cond)
        stripped = _CMP_LEFT.sub(" TRUE ", stripped)
        if _ABSTRACT_TOKEN.search(stripped):
            raise ValueError(
                "rule reads the abstract sim column in a form the banded-"
                "kernel validator cannot prove safe: "
                f"{cond!r}. Pass abstract_cutoff=0.0 to match()/score() "
                "for exact abstract similarities."
            )
        for op, val in hits:
            # the kernel contract is exact only STRICTLY above the
            # cutoff (the Lipschitz prunes compare <= cutoff*len1, so a
            # true sim exactly AT the cutoff may come back as a lower
            # bound): `> t` tolerates t == cutoff, but `>= t` and `= t`
            # need t strictly above it
            safe = (op == ">" and val >= cutoff) or (
                op in (">=", "=") and val > cutoff
            )
            if not safe:
                raise ValueError(
                    f"rule compares abstract sim with '{op} {val}', below "
                    f"the banded-kernel cutoff {cutoff}: outcomes would "
                    "depend on lower-bound (inexact) values. Pass "
                    "abstract_cutoff=0.0 to match()/score() for exact "
                    "abstract similarities, or raise the rule threshold."
                )
