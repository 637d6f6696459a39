"""Property-based tests for the string kernels.

The bit-parallel LCS and the packed-bigint window scan are checked
against naive dynamic-programming references on random inputs; the
number-word parser is checked for idempotence and digit-only output on
number phrases.
"""
from hypothesis import example, given, settings
from hypothesis import strategies as st

from bib_dedupe_spark.kernels import fuzz, numwords
from bib_dedupe_spark.kernels.fuzz import _best_window_similarity
from bib_dedupe_spark.kernels.fuzz_np import best_window_similarity

_alpha = st.text(alphabet="abcdef gh", max_size=60)


def _lcs_naive(a: str, b: str) -> int:
    prev = [0] * (len(b) + 1)
    for ca in a:
        cur = [0]
        for j, cb in enumerate(b):
            cur.append(
                prev[j] + 1 if ca == cb else max(prev[j + 1], cur[-1])
            )
        prev = cur
    return prev[-1]


@settings(max_examples=200, deadline=None)
@given(_alpha, _alpha)
def test_lcs_matches_naive(a, b):
    assert fuzz.lcs_length(a, b) == _lcs_naive(a, b)


@settings(max_examples=200, deadline=None)
@given(_alpha, _alpha)
def test_ratio_bounds_and_symmetry(a, b):
    r = fuzz.ratio(a, b)
    assert 0.0 <= r <= 100.0
    assert r == fuzz.ratio(b, a)
    assert fuzz.ratio(a, a) == 100.0


@settings(max_examples=150, deadline=None)
# pinned: the FINAL alignment haystack[len2-len1:] must be scanned (or
# reachable through the suffix-edge scan) — the round-3 edge-skip bound
# anchors on it, and skipping it lost the ' '-in-'a ' match entirely
@example(" ", "a ")
@example("ab", "xxab")
@given(_alpha, _alpha)
def test_window_scans_agree(a, b):
    shorter, longer = (a, b) if len(a) <= len(b) else (b, a)
    if not shorter:
        return
    assert abs(
        _best_window_similarity(shorter, longer)
        - best_window_similarity(shorter, longer)
    ) < 1e-12


@settings(max_examples=150, deadline=None)
@given(_alpha, _alpha)
def test_partial_ratio_substring_is_perfect(a, b):
    # a needle embedded verbatim in the haystack always scores 100
    # (NOTE: partial_ratio is NOT ≥ ratio in general — windows are capped
    # at needle length, so a spread-out alignment can beat every window)
    if not a:
        return
    assert fuzz.partial_ratio(a, b + a + b) == 100.0
    assert 0.0 <= fuzz.partial_ratio(a, b) <= 100.0 if b else True


_number_words = st.lists(
    st.sampled_from(
        "one two three seven nine twelve twenty fifty hundred thousand".split()
    ),
    min_size=1,
    max_size=4,
)


@settings(max_examples=100, deadline=None)
@given(_number_words)
def test_numwords_parse_produces_digits(words):
    out = numwords.parse(" ".join(words))
    assert out
    for token in out.split(" "):
        assert token.isdigit(), out
    # idempotent: re-parsing changes nothing
    assert numwords.parse(out) == out


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet="xyz qrs", max_size=30))
def test_numwords_passthrough(text):
    # no number words → unchanged tokenization
    assert numwords.parse(text) == " ".join(text.split(" ")) or text == ""


# ---------------------------------------------------------------------------
# Pinned number-word cases OUTSIDE the golden corpus (round-1 advice).
#
# number_parser is not installed in this environment, so these expectations
# are KERNEL-PINNED (regression protection + documented subset boundary),
# not library-differential. Where upstream number_parser documents the
# behavior (README cardinal examples; ordinals are a separate
# parse_ordinal API and parse() leaves them alone), the pin matches it.
# prep_title pre-normalization turns hyphens into spaces
# (prep_title.py:155 `[^A-Za-z0-9,\[\]]+` -> ' ') and strips the
# stopwords 'a'/'and' BEFORE parse, so hyphenated forms never reach the
# parser and 'a hundred and five' arrives as 'hundred five'.
# ---------------------------------------------------------------------------
import pytest as _pytest


@_pytest.mark.parametrize(
    "text,expected",
    [
        ("twenty two", "22"),  # hyphenated input after prep normalization
        ("one hundred and five", "105"),
        ("hundred five", "105"),  # 'a hundred and five' after stopwords
        ("nineteen eighty four", "19 84"),  # year-speak stays two numbers
        ("two thousand and one", "2001"),
        ("first results", "first results"),  # ordinals: parse() no-op
        ("twenty first century", "20 first century"),
        ("a hundred dogs", "a 100 dogs"),  # bare article untouched
        ("one million two hundred thousand", "1200000"),
        ("five hundred and sixty three", "563"),
    ],
)
def test_numwords_pinned_forms(text, expected):
    assert numwords.parse(text) == expected


def test_prep_title_hyphenated_number_words():
    """End-to-end: hyphens normalize to spaces before number parsing."""
    from bib_dedupe_spark.functions.titles import norm_title

    assert norm_title("Twenty-One Candles: A Study") == "21 candles study"


@settings(max_examples=150, deadline=None)
@given(
    st.text(alphabet="abcd", min_size=1, max_size=60),
    st.text(alphabet="abcd", min_size=0, max_size=400),
    st.sampled_from([0.0, 0.3, 0.5, 0.8, 0.95]),
)
def test_banded_window_scan_cutoff_contract(needle, hay, cutoff):
    """fuzz_np.best_window_similarity is exact above the cutoff and a
    lower bound below it, for every window-set branch (individual /
    packed / stride+refine)."""
    from bib_dedupe_spark.kernels import fuzz_np

    if len(hay) < len(needle):  # production always passes shorter→longer
        needle, hay = hay, needle
    if not needle:
        return
    exact = fuzz._best_window_similarity(needle, hay)
    got = fuzz_np.best_window_similarity(needle, hay, cutoff)
    if exact > cutoff:
        assert abs(got - exact) < 1e-12
    else:
        assert got <= exact + 1e-12


@settings(max_examples=60, deadline=None)
@given(
    st.text(alphabet="abc", min_size=1, max_size=40),
    st.text(alphabet="abc", min_size=0, max_size=200),
)
def test_partial_ratio_cutoff_zero_is_exact(needle, hay):
    """score_cutoff=0 must be byte-identical to the unbanded result."""
    assert fuzz.partial_ratio(needle, hay) == fuzz.partial_ratio(
        needle, hay, score_cutoff=0.0
    )


def test_bisect_branch_seeded_differential():
    """Deterministic sweep of the few-windows-long-needle (bisection)
    branch + edge-skip bound: exact at cutoff=0 and cutoff-contract-safe
    at the rule cutoff, vs the pure-Python window scan. (A 10k-case
    version of this ran clean when the branch landed; this seeded slice
    keeps the coverage in CI time.)"""
    import random

    from bib_dedupe_spark.kernels import fuzz_np

    rnd = random.Random(321)
    alpha = "abcdefg hij"
    for _ in range(120):
        l1 = rnd.randint(150, 400)
        n_win = rnd.randint(1, max(2, l1 // 12))
        a = "".join(rnd.choice(alpha) for _ in range(l1))
        b = "".join(rnd.choice(alpha) for _ in range(l1 + n_win))
        if rnd.random() < 0.4:
            pos = rnd.randint(0, n_win)
            mut = list(a)
            for _ in range(rnd.randint(0, 6)):
                mut[rnd.randrange(l1)] = rnd.choice(alpha)
            b = b[:pos] + "".join(mut) + b[pos + l1:]
        want = fuzz._best_window_similarity(a, b)
        got = fuzz_np.best_window_similarity(a, b)
        assert abs(want - got) < 1e-12, (l1, n_win, want, got)
        banded = fuzz_np.best_window_similarity(a, b, 0.8)
        if want > 0.8:
            assert abs(banded - want) < 1e-12, (l1, n_win, want, banded)
        else:
            assert banded <= want + 1e-12, (l1, n_win, want, banded)
