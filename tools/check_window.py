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


def snapshot(ref: str) -> dict[str, tuple[str, str]]:
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
            out[s.name] = (oracle, inspect.getsource(s.spark_fn))
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

    cur = {
        s.name: (s.oracle or "", inspect.getsource(s.spark_fn))
        for s in R._SPECS
    }
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
