"""Code fingerprints for registry queries — the code-aware half of the
driver-window rotation (round-5 verdict item 1).

PROBLEM: the correctness driver checks only the first DRIVER_WINDOW
registry entries per round, and the rotation used to rank tails by
green-AGE alone.  A query whose backing operator was rewritten while it
sat outside the window shipped on stale driver evidence.  The fix:
fingerprint each query's *code closure*, persist the fingerprint that
each green round actually certified (``tools/query_fingerprints.json``,
written per round by ``tools/update_fingerprints.py``), and have the
rotation treat any query whose current fingerprint differs from its
last-green fingerprint as NEVER PROVEN — forced inside the window.

GRANULARITY: hashing whole dependency modules would mark every query in
``queries.py`` changed whenever the rotation code itself moves, and
every ``_t``-reading query changed whenever any helper in a shared
module is touched — overflowing the 50-slot window.  Instead the
fingerprint walks the query function's REACHABLE closure:

- the query function's own source and its oracle SQL text;
- every engine function/class it references (via module-level imports
  of its defining module, via function-local ``from hbase_tohdfs_spark
  ...`` imports, and via ``module.attr`` uses), RECURSIVELY;
- referenced engine constants by deterministic repr.

Reachability is approximated from compiled ``co_names`` (which includes
attribute names) plus an import-statement scan of each function's
source — over-approximation is safe (a query is at worst re-proven
unnecessarily), under-approximation is what the recursion guards
against.  Everything is stdlib reflection: no Spark session, no side
effects, deterministic across processes (md5 of sorted member hashes).
"""

from __future__ import annotations

import hashlib
import importlib
import inspect
import json
import os
import re
import types

ENGINE_PREFIX = "hbase_tohdfs_spark"

#: bump when the fingerprint algorithm changes incompatibly; recorded
#: rounds carry the algo they were computed with, and the rotation
#: ignores records from another algo (grandfathering, loudly) until
#: they are reconstructed from the historical commits.
ALGO = 1

#: committed per-round fingerprint record (round number -> name -> fp)
FINGERPRINTS_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tools",
    "query_fingerprints.json",
)

_LOCAL_IMPORT_RE = re.compile(
    rf"from\s+({ENGINE_PREFIX}[.\w]*)\s+import\s+(\(([^)]*)\)|[^\n]+)",
    re.DOTALL,
)


def _all_code_names(code: types.CodeType) -> set[str]:
    """co_names of a code object and every nested code object (closures,
    comprehensions, mapInPandas inner functions)."""
    names = set(code.co_names)
    for const in code.co_consts:
        if isinstance(const, types.CodeType):
            names |= _all_code_names(const)
    return names


def _is_engine_module(mod) -> bool:
    return isinstance(mod, types.ModuleType) and getattr(
        mod, "__name__", ""
    ).startswith(ENGINE_PREFIX)


def _is_engine_obj(obj) -> bool:
    return getattr(obj, "__module__", "").startswith(ENGINE_PREFIX)


def _canonical_repr(obj) -> str:
    """repr with container orders canonicalized: set iteration order is
    hash-randomized per process, so sets/frozensets render sorted."""
    if isinstance(obj, (set, frozenset)):
        inner = ", ".join(sorted(_canonical_repr(x) for x in obj))
        return "{" + inner + "}"
    if isinstance(obj, dict):
        inner = ", ".join(
            f"{_canonical_repr(k)}: {_canonical_repr(v)}"
            for k, v in sorted(obj.items(), key=lambda kv: repr(kv[0]))
        )
        return "{" + inner + "}"
    if isinstance(obj, (list, tuple)):
        inner = ", ".join(_canonical_repr(x) for x in obj)
        return ("[%s]" if isinstance(obj, list) else "(%s)") % inner
    return repr(obj)


#: value-hashable constant types.  dict/list/set globals are EXCLUDED on
#: purpose: module-level mutable containers are runtime caches
#: (``pivot_stream._SCHEMA_CACHE`` fills as queries run), and hashing
#: their VALUE would make a query's fingerprint drift within one process
#: — the fingerprint must be a function of the code, not of what has
#: executed so far.  Their presence is hashed by type identity only;
#: edits to such constants ship with the function edits that use them.
_STABLE_TYPES = (str, bytes, int, float, bool, complex, tuple, frozenset)


def _stable_value_hash(name: str, obj) -> str:
    """Deterministic digest for a non-callable global.  ``repr`` is used
    only for value-stable types; pyspark DataTypes render via their
    canonical json; everything else (mutable containers, rich objects
    whose default repr embeds a memory address) hashes as a type
    marker."""
    if obj is None or isinstance(obj, _STABLE_TYPES):
        r = _canonical_repr(obj)
        if " at 0x" in r:
            r = f"<{type(obj).__module__}.{type(obj).__qualname__}>"
    else:
        try:
            from pyspark.sql.types import DataType
        except ImportError:  # pragma: no cover
            DataType = ()
        if isinstance(obj, DataType):
            r = obj.json()
        else:
            r = f"<{type(obj).__module__}.{type(obj).__qualname__}>"
    return hashlib.md5(f"{name}={r}".encode()).hexdigest()


def _member_key(obj) -> str:
    return f"{getattr(obj, '__module__', '?')}.{getattr(obj, '__qualname__', getattr(obj, '__name__', '?'))}"


def _visit(obj, members: dict[str, str], seen: set[int]) -> None:
    """Hash ``obj``'s source into ``members`` and recurse into the
    engine objects it references."""
    if id(obj) in seen:
        return
    seen.add(id(obj))
    key = _member_key(obj)
    try:
        src = inspect.getsource(obj)
    except (OSError, TypeError):
        members[key] = hashlib.md5(key.encode()).hexdigest()
        return
    members[key] = hashlib.md5(src.encode()).hexdigest()

    code = getattr(obj, "__code__", None)
    gl = getattr(obj, "__globals__", None)
    if inspect.isclass(obj):
        # small dataclasses/holders here: recurse into methods
        for _, meth in sorted(vars(obj).items()):
            if isinstance(meth, (types.FunctionType, staticmethod, classmethod)):
                fn = getattr(meth, "__func__", meth)
                _visit(fn, members, seen)
        return
    if code is None:
        return
    names = _all_code_names(code)

    # 1) function-local `from hbase_tohdfs_spark... import ...`
    for m in _LOCAL_IMPORT_RE.finditer(src):
        mod_name = m.group(1)
        imported = m.group(3) if m.group(3) is not None else m.group(2)
        try:
            mod = importlib.import_module(mod_name)
        except ImportError:
            continue
        for token in re.split(r"[,\s]+", imported):
            token = token.strip()
            if not token or token == "as":
                continue
            target = getattr(mod, token, None)
            if target is None:
                # `from package import submodule`: the attribute only
                # exists once the submodule has been imported somewhere,
                # which would make reachability depend on what ALREADY
                # ran in this process.  Import it explicitly instead.
                try:
                    target = importlib.import_module(f"{mod_name}.{token}")
                except ImportError:
                    continue
            _dispatch(token, target, names, members, seen)

    # 2) module-level globals the code actually names
    if gl:
        for name in sorted(names):
            target = gl.get(name)
            if target is None:
                continue
            _dispatch(name, target, names, members, seen)


def _dispatch(name, target, names, members, seen) -> None:
    """Route one referenced object: engine modules scan used attrs,
    engine callables recurse, engine-adjacent constants hash by repr."""
    if _is_engine_module(target):
        # NOTE: no early-return on a repeated module — `names` is the
        # referencing function's co_names, so two functions using
        # different attrs of one module must each scan it.
        mkey = f"module:{target.__name__}"
        members[mkey] = hashlib.md5(target.__name__.encode()).hexdigest()
        for attr in sorted(names):
            if attr == name:
                continue
            sub = getattr(target, attr, None)
            if sub is None:
                continue
            if callable(sub) and _is_engine_obj(sub):
                _visit(sub, members, seen)
            elif not callable(sub) and not isinstance(sub, types.ModuleType):
                members[f"{target.__name__}.{attr}"] = _stable_value_hash(
                    attr, sub
                )
    elif callable(target) and _is_engine_obj(target):
        _visit(target, members, seen)
    elif not callable(target) and not isinstance(target, types.ModuleType):
        members[f"const:{name}"] = _stable_value_hash(name, target)


def fingerprint_query(fn, oracle: str | None) -> str:
    """Fingerprint of one registry query: md5 over the sorted member
    digests of the fn's engine closure plus the oracle text."""
    members: dict[str, str] = {}
    _visit(fn, members, set())
    h = hashlib.md5()
    for key in sorted(members):
        h.update(f"{key}:{members[key]}\n".encode())
    h.update(b"oracle:")
    h.update((oracle or "<rows-only>").encode())
    return h.hexdigest()


def registry_fingerprints(registry: dict) -> dict[str, str]:
    """name -> fingerprint for every entry of a ``queries.REGISTRY``-
    shaped dict (values expose ``.fn`` and ``.oracle``)."""
    return {
        name: fingerprint_query(spec.fn, spec.oracle)
        for name, spec in registry.items()
    }


def load_recorded() -> dict[str, dict[str, str]]:
    """The committed round -> {name -> fp} record, restricted to digit
    round keys.  {} if absent or recorded with a different ALGO (old
    records are incomparable; reconstruct them before trusting them —
    see tools/update_fingerprints.py)."""
    try:
        with open(FINGERPRINTS_PATH) as fh:
            data = json.load(fh)
    except (OSError, ValueError):
        return {}
    if not isinstance(data, dict) or data.get("_algo") != ALGO:
        return {}
    return {
        k: v for k, v in data.items() if k.isdigit() and isinstance(v, dict)
    }
