"""Gate-window audit: every query whose oracle SQL or Spark source
changed since a baseline commit (default: the last round's snapshot)
must sit inside the driver's 50-query correctness window — old green
rows don't vouch for new outputs.

Usage: python tools/check_window.py [baseline_ref]

Exit 0 iff head-50 covers all changed + new oracle-bearing queries
(rows-only queries are exempt: the driver records a weaker check for
them wherever they sit).
"""

from __future__ import annotations

import importlib
import inspect
import re
import shutil
import subprocess
import sys
import tempfile
import textwrap

sys.path.insert(0, ".")

# Matches both single-line and parenthesized multi-line import forms
# (round-10 ADVICE fix: the old `([^\n]+)` captured only "(" for the
# 7 parenthesized registry imports, yielding empty dep fingerprints).
_IMPORT_RE = re.compile(
    r"from\s+\.((?:operators|streaming|plans|functions|sources)\.\w+)"
    r"\s+import\s+(\([^)]*\)|(?:[^\n\\]|\\\n)+)",
    re.DOTALL,
)


def _split_names(names: str) -> list[str]:
    """'(a,\n b as c)' -> ['a', 'b as c']."""
    out = []
    for item in re.split(r"[,\n]+", names.strip().strip("()")):
        item = item.strip().strip("\\").strip()
        if item:
            out.append(item)
    return out


def _symbol_source(obj, fallback_label: str) -> str:
    try:
        return textwrap.dedent(inspect.getsource(obj))
    except (TypeError, OSError):
        return f"{fallback_label}={obj!r}"


def _module_symbol_sources(registry_module) -> dict[str, str]:
    """local-name -> source for every symbol the registry module
    imports at module level (column-0 `from .x import ...`).  Query
    functions reference these without a body-level import, so they
    were invisible to the old fn-body-only scan (round-10 ADVICE)."""
    src = inspect.getsource(registry_module)
    out: dict[str, str] = {}
    for m in _IMPORT_RE.finditer(src):
        line_start = src.rfind("\n", 0, m.start()) + 1
        if m.start() != line_start:  # indented => function-body import
            continue
        for item in _split_names(m.group(2)):
            local = re.split(r"\s+as\s+", item)[-1]
            obj = getattr(registry_module, local, None)
            out[local] = _symbol_source(obj, local)
    return out


def _dep_fingerprint(
    fn_source: str, pkg_name: str, module_syms: dict[str, str]
) -> str:
    """Concatenated sources of the repo SYMBOLS a query function
    depends on: body-level `from .operators.x import f as g` imports
    (multi-line and aliased forms included) plus registry
    module-level imports whose local name appears in the function
    body.  An operator-level rewrite must read as a CHANGE to every
    gate that calls it, not just to gates whose registry wrapper
    text moved.  Symbol granularity, not module granularity: a
    module-level hash flagged 43 gates when similarity.py changed
    one assign function.  Known limit: a change to a helper an
    imported function CALLS (but does not lexically contain) is
    still invisible — the direct operator surface is the
    fingerprint.  Word-match over-inclusion (a module symbol named
    in a comment/string) only flags extra gates — the conservative
    direction."""
    parts = []
    for mod, names in _IMPORT_RE.findall(fn_source):
        try:
            m = importlib.import_module(f"{pkg_name}.{mod}")
        except Exception as exc:  # pragma: no cover - import failure
            parts.append(f"<unimportable {mod}: {exc!r}>")
            continue
        for item in _split_names(names):
            orig = re.split(r"\s+as\s+", item)[0]
            parts.append(_symbol_source(getattr(m, orig, None),
                                        f"{mod}.{orig}"))
    for local in sorted(module_syms):
        if re.search(rf"\b{re.escape(local)}\b", fn_source):
            parts.append(module_syms[local])
    return "\n".join(parts)


def _fingerprint_registry(registry_module, pkg_name, path_norm=None):
    module_syms = _module_symbol_sources(registry_module)
    out = {}
    for s in registry_module._SPECS:
        oracle = s.oracle or ""
        if path_norm:
            # data-file paths embedded at import time differ by
            # checkout location; normalize so they don't read as
            # oracle changes
            oracle = oracle.replace(path_norm, "/root/repo")
        src = inspect.getsource(s.spark_fn)
        deps = _dep_fingerprint(src, pkg_name, module_syms)
        out[s.name] = (oracle, src, deps)
    return out


def snapshot(ref: str) -> dict[str, tuple[str, str, str]]:
    tmp = tempfile.mkdtemp()
    try:
        with open(f"{tmp}/a.tar", "wb") as fh:
            subprocess.run(["git", "archive", ref], stdout=fh, check=True)
        subprocess.run(["tar", "xf", "a.tar"], cwd=tmp, check=True)
        for m in list(sys.modules):
            if m.startswith("lofar_bf_pulsar_scripts_spark"):
                del sys.modules[m]
        sys.path.insert(0, tmp)
        import lofar_bf_pulsar_scripts_spark.registry as R_old

        return _fingerprint_registry(
            R_old, "lofar_bf_pulsar_scripts_spark", path_norm=tmp
        )
    finally:
        sys.path.remove(tmp)
        for m in list(sys.modules):
            if m.startswith("lofar_bf_pulsar_scripts_spark"):
                del sys.modules[m]
        shutil.rmtree(tmp)


def main() -> None:
    ref = sys.argv[1] if len(sys.argv) > 1 else "HEAD~1"
    old = snapshot(ref)
    import lofar_bf_pulsar_scripts_spark.registry as R

    cur = _fingerprint_registry(R, "lofar_bf_pulsar_scripts_spark")
    rows_only = {s.name for s in R._SPECS if s.oracle is None}
    head = [s.name for s in R.specs()[:50]]
    changed = sorted(n for n in cur if n in old and cur[n] != old[n])
    new = sorted(n for n in cur if n not in old)
    missing = [
        n for n in changed + new if n not in head and n not in rows_only
    ]
    print(f"baseline {ref}: {len(changed)} changed, {len(new)} new, "
          f"head={len(head)}")
    if missing:
        print("NOT GATED (changed/new but outside head-50):", missing)
        sys.exit(1)
    print("window OK: every changed/new oracle query is gated")
    sys.exit(0)


if __name__ == "__main__":
    main()
