"""Golden tests for the similarity kernels.

Cases are lifted from /root/reference/tests/sim_test.py (exact float
expectations — these pin our rapidfuzz-compatible Indel kernels).
"""
import pytest

from bib_dedupe_spark.kernels import similarity as sim
from tests.reference_cases import reference_available, sim_cases

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not available"
)


@pytest.mark.parametrize("c1,c2,expected", sim_cases("test_sim_container_title"))
def test_sim_container_title(c1, c2, expected):
    assert sim.sim_container_title(c1, c2) == pytest.approx(expected, abs=1e-9)


@pytest.mark.parametrize("t1,t2,expected", sim_cases("test_sim_title"))
def test_sim_title(t1, t2, expected):
    assert sim.sim_title(t1, t2) == pytest.approx(expected, abs=1e-9)


@pytest.mark.parametrize("a1,f1,a2,f2,expected", sim_cases("test_sim_author"))
def test_sim_author(a1, f1, a2, f2, expected):
    assert sim.sim_author(a1, f1, a2, f2) == pytest.approx(expected, abs=1e-9)


@pytest.mark.parametrize("y1,y2,expected", sim_cases("test_sim_year"))
def test_sim_year(y1, y2, expected):
    assert sim.sim_year(y1, y2) == pytest.approx(expected, abs=1e-9)


@pytest.mark.parametrize("p1,p2,expected", sim_cases("test_sim_page"))
def test_sim_page(p1, p2, expected):
    assert sim.sim_page(p1, p2) == pytest.approx(expected, abs=1e-9)


@pytest.mark.parametrize("p1,p2,expected", sim_cases("test_page_ranges_adjacent"))
def test_page_ranges_adjacent(p1, p2, expected):
    assert sim.page_ranges_adjacent(p1, p2) == expected


@pytest.mark.parametrize("n1,n2,expected", sim_cases("test_sim_number"))
def test_sim_number(n1, n2, expected):
    assert sim.sim_number(n1, n2) == pytest.approx(expected, abs=1e-9)


@pytest.mark.parametrize("v1,v2,expected", sim_cases("test_sim_volume"))
def test_sim_volume(v1, v2, expected):
    assert sim.sim_volume(v1, v2) == pytest.approx(expected, abs=1e-9)


@pytest.mark.parametrize("a1,a2,expected", sim_cases("test_sim_abstract"))
def test_sim_abstract(a1, a2, expected):
    assert sim.sim_abstract(a1, a2) == pytest.approx(expected, abs=1e-9)


def test_fuzz_primitives_basic():
    from bib_dedupe_spark.kernels import fuzz

    assert fuzz.ratio("", "") == 100.0
    assert fuzz.ratio("abc", "abc") == 100.0
    assert fuzz.ratio("abc", "") == 0.0
    assert fuzz.indel_distance("abc", "abd") == 2
    assert fuzz.partial_ratio("abc", "xxabcxx") == 100.0
    assert fuzz.token_sort_ratio("b a", "a b") == 100.0
    assert fuzz.token_set_ratio("a b c", "c b a extra") == 100.0
