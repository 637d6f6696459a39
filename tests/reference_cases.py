"""Extract golden test cases from the reference repo's test suite.

The reference checkout at ``/root/reference`` (read-only) pins exact
string/float expectations for every normalizer and similarity kernel in
``tests/prep_test.py`` and ``tests/sim_test.py`` via
``pytest.mark.parametrize`` literals. We lift those literals with ``ast``
at collection time — data only, no code — so our kernels are tested
against the identical corpus. When the reference checkout is absent the
dependent tests are skipped (the rest of the suite is self-contained).
"""
from __future__ import annotations

import ast
import os
from pathlib import Path

REFERENCE_ROOT = Path(os.environ.get("BIB_DEDUPE_REFERENCE", "/root/reference"))


def reference_available() -> bool:
    return (REFERENCE_ROOT / "tests").is_dir()


def extract_parametrize_cases(test_file: str, test_name: str) -> list:
    """Return the literal case list of ``@pytest.mark.parametrize`` on
    ``test_name`` inside ``REFERENCE_ROOT/tests/<test_file>``."""
    path = REFERENCE_ROOT / "tests" / test_file
    tree = ast.parse(path.read_text())
    for node in tree.body:
        if isinstance(node, ast.FunctionDef) and node.name == test_name:
            for dec in node.decorator_list:
                if (
                    isinstance(dec, ast.Call)
                    and getattr(dec.func, "attr", "") == "parametrize"
                ):
                    return ast.literal_eval(dec.args[1])
    raise LookupError(f"no parametrize found for {test_name} in {test_file}")


def sim_cases(test_name: str) -> list:
    if not reference_available():
        return []
    return extract_parametrize_cases("sim_test.py", test_name)


def prep_cases(test_name: str) -> list:
    if not reference_available():
        return []
    return extract_parametrize_cases("prep_test.py", test_name)
