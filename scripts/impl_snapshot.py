"""Per-query implementation fingerprints for gate-freshness (r07
ADVICE): a driver CORRECTNESS row only vouches for the code that was
live when it ran, so gate ordering must treat a hash-green query whose
implementation changed afterwards as UNVERIFIED.  This script captures
a fingerprint per registry query; ``gate_freshness.py`` compares the
committed snapshot against the current code and flags mismatches as
CHANGED (they belong in the prime gate slots regardless of how recent
their last driver check is — the r06/r07 staleness findings were
exactly this).

Fingerprint = sha1 of the wrapper function's source PLUS the full text
of every package module the wrapper imports (``from ..operators.x
import`` / ``from .pipelines import`` ...), so a rewrite inside the
operator module flags every query that routes through it.  Shared
registry helpers (_series/_rnd/SQL fragments) are covered by hashing
the registry module headers once into every query from that module.

Usage:
    python scripts/impl_snapshot.py            # rewrite impl_hashes.json
    python scripts/impl_snapshot.py --check    # list changed queries
"""

from __future__ import annotations

import hashlib
import inspect
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SNAPSHOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "impl_hashes.json")

PKG = "time_series_data_anomaly_detection_spark"

_IMPORT_RE = re.compile(r"^\s*from\s+(\.+[\w.]*)\s+import\s+", re.M)


def _module_file(base_mod: str, rel: str) -> str | None:
    """Resolve a relative import found in a wrapper body to a package
    file path (``..functions.dtw`` relative to ``pkg.plans.registry``)."""
    dots = len(rel) - len(rel.lstrip("."))
    name = rel.lstrip(".")
    parts = base_mod.split(".")
    base = parts[: len(parts) - dots]
    target = ".".join(base + ([name] if name else []))
    try:
        import importlib

        mod = importlib.import_module(target)
        f = getattr(mod, "__file__", None)
        return f if f and PKG in f else None
    except Exception:
        return None


def fingerprints() -> dict[str, str]:
    import __spark_entry__ as entrymod

    out: dict[str, str] = {}
    file_cache: dict[str, str] = {}

    def read(path: str) -> str:
        if path not in file_cache:
            try:
                file_cache[path] = open(path).read()
            except Exception:
                file_cache[path] = ""
        return file_cache[path]

    # the shared helper preamble of each registry module (everything
    # before the first query def) feeds every query defined in it
    preamble_cache: dict[str, str] = {}

    def preamble(path: str) -> str:
        if path not in preamble_cache:
            src = read(path)
            m = re.search(r"^def q_", src, re.M)
            preamble_cache[path] = src[: m.start()] if m else src
        return preamble_cache[path]

    # one level of transitive closure (r08 ADVICE): a module a query
    # imports may itself import package modules at ITS top (pipelines
    # imports operators/*); hash those too so an operator rewrite
    # flags every query routing through a pipeline facade
    dep_cache: dict[str, list[str]] = {}

    def dep_files(path: str, mod: str) -> list[str]:
        if path not in dep_cache:
            files = []
            for rel in sorted(set(_IMPORT_RE.findall(read(path)))):
                f = _module_file(mod, rel)
                if f:
                    files.append(f)
            dep_cache[path] = files
        return dep_cache[path]

    for name, fn in entrymod.queries().items():
        fn = inspect.unwrap(fn)  # past the cache-release wrapper:
        # hashing the wrapper gave every query ONE identical
        # fingerprint and drift detection never fired (r08 ADVICE)
        try:
            src = inspect.getsource(fn)
            mod = fn.__module__
            mod_file = sys.modules[mod].__file__
        except Exception:
            out[name] = "unhashable"
            continue
        h = hashlib.sha1()
        h.update(src.encode())
        h.update(preamble(mod_file).encode())
        # module files imported by the wrapper body AND by the
        # registry module header (module-top imports feed queries
        # that don't import inside the body), each with one level of
        # their own package imports
        seen: set[str] = set()
        first = [
            f
            for rel in sorted(set(_IMPORT_RE.findall(src))
                              | set(_IMPORT_RE.findall(preamble(mod_file))))
            for f in ([_module_file(mod, rel)] if _module_file(mod, rel) else [])
        ]
        queue = list(dict.fromkeys(first))
        for f in queue:
            if f in seen:
                continue
            seen.add(f)
            h.update(read(f).encode())
            fmod = _path_to_module(f)
            for g in dep_files(f, fmod):
                if g not in seen:
                    seen.add(g)
                    h.update(read(g).encode())
        out[name] = h.hexdigest()[:16]
    return out


def _path_to_module(path: str) -> str:
    """package file path -> dotted module name (for resolving ITS
    relative imports)."""
    parts = path.replace("\\", "/").split("/")
    try:
        i = parts.index(PKG)
    except ValueError:
        return PKG
    mod_parts = parts[i:]
    if mod_parts[-1].endswith(".py"):
        mod_parts[-1] = mod_parts[-1][:-3]
    if mod_parts[-1] == "__init__":
        mod_parts = mod_parts[:-1]
    return ".".join(mod_parts)


def main() -> None:
    cur = fingerprints()
    if "--check" in sys.argv:
        try:
            snap = json.load(open(SNAPSHOT))
        except Exception:
            print("# no snapshot committed yet", file=sys.stderr)
            return
        changed = [n for n, v in cur.items() if snap.get(n) not in (None, v)]
        new = [n for n in cur if n not in snap]
        for n in changed:
            print(f"CHANGED  {n}")
        for n in new:
            print(f"NEW      {n}")
        print(
            f"# {len(changed)} changed, {len(new)} new, "
            f"{len(cur)} total",
            file=sys.stderr,
        )
        return
    with open(SNAPSHOT, "w") as f:
        json.dump(cur, f, indent=0, sort_keys=True)
    print(f"# wrote {len(cur)} fingerprints to {SNAPSHOT}", file=sys.stderr)


if __name__ == "__main__":
    main()
