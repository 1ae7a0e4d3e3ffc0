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

import inspect
import shutil
import subprocess
import sys
import tempfile

sys.path.insert(0, ".")


def _imported_symbol_sources(fn_source: str, pkg_name: str) -> str:
    """Concatenated sources of the repo SYMBOLS a query function
    imports in its body (`from .operators.x import f, g` etc.) — an
    operator-level rewrite must read as a CHANGE to every gate that
    calls it, not just to gates whose registry-level wrapper text
    moved (caught in round 9: the resample_ffill interval-explode
    rewrite was invisible to the fn-source-only fingerprint while
    its gate sat outside the head-50).  Symbol granularity, not
    module granularity: a module-level hash flagged 43 gates when
    similarity.py changed one assign function.  Known limit: a
    change to a module-level helper an imported function CALLS (but
    does not lexically contain) is still invisible — the direct
    operator surface is the fingerprint."""
    import importlib
    import re
    import textwrap

    parts = []
    for mod, names in re.findall(
        r"from \.((?:operators|streaming|plans|functions|sources)\.\w+)"
        r" import ([^\n]+)",
        fn_source,
    ):
        try:
            m = importlib.import_module(f"{pkg_name}.{mod}")
        except Exception as exc:  # pragma: no cover - import failure
            parts.append(f"<unimportable {mod}: {exc!r}>")
            continue
        for name in re.split(r"[,()]+", names):
            name = name.strip()
            if not name or name == "\\":
                continue
            obj = getattr(m, name, None)
            try:
                parts.append(textwrap.dedent(inspect.getsource(obj)))
            except (TypeError, OSError):
                parts.append(f"{mod}.{name}={obj!r}")
    return "\n".join(parts)


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
        from lofar_bf_pulsar_scripts_spark.registry import _SPECS

        out = {}
        for s in _SPECS:
            # data-file paths embedded at import time differ by checkout
            # location; normalize so they don't read as oracle changes
            oracle = (s.oracle or "").replace(tmp, "/root/repo")
            src = inspect.getsource(s.spark_fn)
            deps = _imported_symbol_sources(
                src, "lofar_bf_pulsar_scripts_spark"
            )
            out[s.name] = (oracle, src, deps)
        return out
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

    cur = {}
    for s in R._SPECS:
        src = inspect.getsource(s.spark_fn)
        deps = _imported_symbol_sources(
            src, "lofar_bf_pulsar_scripts_spark"
        )
        cur[s.name] = (s.oracle or "", src, deps)
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
