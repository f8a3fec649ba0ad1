"""clear_session_caches must evict EVERY module-level session cache.

Round-14 verdict: five ``_*_CACHE`` dicts added over rounds 13-14 were
missing from the old hand-maintained list in
``tables.clear_session_caches`` (a long-lived multi-sf session then
retains every localCheckpoint RDD ever built — the ADVICE-r10 leak).
The function now discovers caches by the naming convention; these
tests pin (a) that the convention catches every cache that exists on
disk, and (b) that a call actually empties them all.
"""

from __future__ import annotations

import re
from pathlib import Path

from vectordb_agentic_rag_spark import tables
from vectordb_agentic_rag_spark.registry import (
    _DEFERRED_OPERATOR_MODULES,
    _OPERATOR_MODULES,
    load_all_operators,
    load_deferred_operators,
)

PKG_ROOT = Path(__file__).resolve().parents[1] / "vectordb_agentic_rag_spark"

# module-level assignment of a session cache: `_FOO_CACHE: dict = {}`
# (annotated or bare). Matches at column 0 only — locals don't count.
_DECL = re.compile(r"^(_[A-Z0-9_]*_CACHE)\s*[:=]", re.MULTILINE)


def _declared_caches_on_disk() -> dict[str, set[str]]:
    """Map dotted module name -> cache globals found by text scan."""
    found: dict[str, set[str]] = {}
    for py in PKG_ROOT.rglob("*.py"):
        names = set(_DECL.findall(py.read_text()))
        if not names:
            continue
        rel = py.relative_to(PKG_ROOT.parent).with_suffix("")
        found[".".join(rel.parts)] = names
    return found


def test_every_cache_module_is_sweepable():
    # every file that declares a _*_CACHE global must be reachable from
    # the registry module lists (or the tables._EXTRA_CACHE_MODULES
    # list for non-operator modules), or clear_session_caches can't
    # see it
    sweepable = (
        set(_OPERATOR_MODULES)
        | set(_DEFERRED_OPERATOR_MODULES)
        | set(tables._EXTRA_CACHE_MODULES)
    )
    for mod, names in _declared_caches_on_disk().items():
        assert mod in sweepable, (
            f"{mod} declares session caches {sorted(names)} but is not "
            "in _OPERATOR_MODULES/_DEFERRED_OPERATOR_MODULES — "
            "clear_session_caches would never evict them"
        )


def test_clear_session_caches_empties_every_cache():
    load_all_operators()
    load_deferred_operators()
    import importlib

    touched = []
    for mod_name, names in _declared_caches_on_disk().items():
        mod = importlib.import_module(mod_name)
        for name in names:
            cache = getattr(mod, name)
            assert isinstance(cache, dict), f"{mod_name}.{name} is not a dict"
            cache["__sentinel__"] = object()
            touched.append((mod_name, name, cache))
    assert touched, "text scan found no session caches — pattern broken?"

    tables.clear_session_caches()
    leftovers = [f"{m}.{n}" for m, n, c in touched if c]
    assert not leftovers, f"clear_session_caches missed: {leftovers}"
    assert not tables._scan_cache and not tables._hot_cached
