"""Registry-order lock + tools/ compile smoke.

The driver's correctness gate reads the FIRST 50 registry entries in
registration order (see ``workload/__init__.py``). Registration order
is an import side effect, so an innocent module reorder or decorator
refactor would silently shift which queries the gate verifies. These
tests freeze the order: the first-50 window hash is pinned to the
value the driver has recorded since round 4, and the round-9 prefix
(93 entries) is pinned so new queries can only ever be APPENDED.

No Spark session needed — importing the workload package registers
everything.
"""

from __future__ import annotations

import hashlib
import pathlib
import py_compile

import pytest

from hrtech_etl_spark.workload import REGISTRY

# The driver-gate window hash, unchanged since entries 1-50 froze
# (recorded per-round in commit messages; VERDICT r7-r9 verify it).
FIRST50_MD5 = "a312d1e4b34339ba6573db257c4f2694"

# Hash of the full 93-entry prefix at the end of round 9. Appending
# entry 94+ keeps positions 0..92 stable, so this never needs to
# change; it only fails if an existing entry is renamed, removed, or
# reordered.
R9_PREFIX_LEN = 93
R9_PREFIX_MD5 = "899ee0173155e7559b7ee7a40b4e18fb"

# Same contract, advanced to the end of round 10 (156 entries).
R10_PREFIX_LEN = 156
R10_PREFIX_MD5 = "ad55657b6d4a5137cce0fa612073088a"


def _names() -> list[str]:
    return list(REGISTRY)


def test_first50_window_hash_locked():
    names = _names()
    assert len(names) >= 50
    got = hashlib.md5("\n".join(names[:50]).encode()).hexdigest()
    assert got == FIRST50_MD5, (
        "the driver's 50-entry correctness window SHIFTED — an import "
        "or registration reorder changed which queries the gate "
        f"verifies; first 50 now: {names[:50]}"
    )


def test_registry_grows_append_only():
    names = _names()
    assert len(names) >= R9_PREFIX_LEN
    got = hashlib.md5(
        "\n".join(names[:R9_PREFIX_LEN]).encode()
    ).hexdigest()
    assert got == R9_PREFIX_MD5, (
        "an entry inside the frozen round-9 prefix was renamed, "
        "removed, or reordered — new queries must be APPENDED after "
        f"position {R9_PREFIX_LEN - 1}"
    )


def test_registry_r10_prefix_locked():
    names = _names()
    assert len(names) >= R10_PREFIX_LEN
    got = hashlib.md5(
        "\n".join(names[:R10_PREFIX_LEN]).encode()
    ).hexdigest()
    assert got == R10_PREFIX_MD5, (
        "an entry inside the frozen round-10 prefix was renamed, "
        "removed, or reordered — new queries must be APPENDED after "
        f"position {R10_PREFIX_LEN - 1}"
    )


# Category families that the driver's 50-entry window must keep
# covering (prefix before the first underscore). The window hash above
# already pins exact order; this pins the INTENT — a future re-freeze
# of the window (new FIRST50_MD5) cannot silently drop a whole
# category from driver-visible breadth. Families appended after the
# round-4 freeze (corpus, sketch, graph, events, ts, funnel, layout,
# profile, sql) live past position 50 by construction and are covered
# by the full-registry sweeps instead.
FIRST50_FAMILIES = {
    "text", "dedup", "sim", "multimodal", "stream",
    "udaf", "udtf", "udf",
    "etl", "join", "agg", "window", "sort", "setop", "scalar",
}


def test_first50_window_covers_locked_families():
    families = {n.split("_")[0] for n in _names()[:50]}
    missing = FIRST50_FAMILIES - families
    assert not missing, (
        "driver-visible category breadth shrank — these families no "
        f"longer have an entry in the first-50 window: {sorted(missing)}"
    )


def test_registry_names_unique_and_nonempty():
    names = _names()
    assert len(names) == len(set(names))
    assert all(names)


TOOLS_DIR = pathlib.Path(__file__).resolve().parent.parent / "tools"


@pytest.mark.parametrize(
    "path",
    sorted(TOOLS_DIR.glob("*.py")),
    ids=lambda p: p.name,
)
def test_tools_compile(path):
    """Every tool must at least byte-compile (tools/ is not imported
    by the suite, so a half-committed refactor would otherwise ship a
    SyntaxError unnoticed — happened to scale_smoke.py in round 9)."""
    py_compile.compile(str(path), doraise=True)
