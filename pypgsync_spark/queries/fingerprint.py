"""Function-level verification fingerprints.

A driver-green CORRECTNESS row vouches for the CODE that produced it —
nothing else. The registry therefore needs a way to decide, at HEAD,
whether a query is still the code its last green row ran. Round 5 keyed
this on module mtimes, which is sound but far too coarse: appending one
query to ``textops.py`` re-staled every query in the file (the round-5
verdict measured 51 of 101 queries "stale" with zero actual behavior
changes). This module replaces that with a per-query *fingerprint*:

    sha256 over the AST-normalized source of the query callable plus
    every in-package function/class it (transitively, statically)
    references, plus simple module-level constants it reads, plus the
    registered oracle SQL.

Properties:

- **Function-granular.** Adding an unrelated query to the same module
  does not change an existing query's fingerprint.
- **Comment/formatting-insensitive.** Sources are normalized through
  ``ast.unparse`` with docstrings and decorators stripped, so doc
  edits, comment edits and reformatting do not un-verify anything.
- **Oracle-sensitive.** The DuckDB oracle text is hashed in: changing
  what "correct" means invalidates the old green row.
- **Conservative on resolution failure.** A referenced in-package
  module whose attribute cannot be resolved statically contributes its
  whole file; unresolvable dynamic dispatch simply contributes nothing
  (the sweep's age-based rotation remains the safety net — unverified
  or oldest-green queries still sort to the front of the driver cap).

The companion store is ``FINGERPRINTS.json`` at the repo root:
``{query_name: {"fp": <hex>, "round": N}}`` meaning "round N's green
row vouches for the code with this fingerprint". It is written by
``scripts/record_fingerprints.py`` at round start (when HEAD is
bit-identical to the code the sweep ran — the driver's verdict commit
only adds root report files) and backfilled for older rounds from git
history by ``scripts/backfill_fingerprints.py``.

This module is deliberately **stdlib-only and self-contained** so the
backfill script can load it by file path and apply it to an older
checkout of the package without importing the current package.
"""

from __future__ import annotations

import ast
import functools
import hashlib
import inspect
import json
import sys
import textwrap
import types

PACKAGE = "pypgsync_spark"

def _const_payload(obj, depth: int = 0) -> str | None:
    """Deterministic repr of a PURE-CONSTANT value, or None when the
    object contains anything non-constant (DataFrames, QuerySpecs,
    functions — runtime state, not source).

    r10 review: plain containers were skipped entirely, so editing a
    module-level CONFIG map (_TYPE_MAP, LANG_MARKERS, a placeholder
    dict) changed behavior without staling any query — the old green
    row kept vouching for code that no longer existed, the exact hole
    the fingerprint system exists to close. Containers of constants
    now hash by value (sets/dicts in sorted order, so iteration order
    cannot perturb the fingerprint); containers holding runtime
    objects (REGISTRY, caches) still contribute nothing.

    r13 determinism fix: the by-value rule captured module-level
    RUNTIME containers whenever their momentary contents were
    constant-shaped — an empty single-slot cache list hashed as
    ``list[]`` on a fresh import but vanished once a query persisted a
    DataFrame into it, and a stats ``Counter`` hashed its run-dependent
    tallies — so the same HEAD produced DIFFERENT fingerprints
    depending on what had already run in the process (found as a
    flaky golden-pin test: gen_goldens computes warm, the recorder
    computes fresh). Two rules close it without reopening the r10
    hole: (1) EMPTY mutable containers contribute nothing — at rest
    an empty list/set/dict is indistinguishable from a runtime
    accumulator, and a real config is never empty; (2) container
    SUBCLASSES (Counter, defaultdict — the accumulator types)
    contribute nothing, only exact list/tuple/set/frozenset/dict hash
    by value. Both states of every known runtime container now map to
    "contributes nothing", so fingerprints are process-state-free."""
    if isinstance(obj, (str, bytes, int, float, bool, type(None))):
        return repr(obj)
    if depth >= 5:
        return None
    if depth == 0 and type(obj) in (list, set, dict) and len(obj) == 0:
        # empty mutable container = accumulator at rest. DEPTH 0 ONLY
        # (r13 review): module-global caches are what flip between
        # runs; an empty container NESTED inside a config constant
        # ({"stopwords": [], "min": 50}) is part of the config's value
        # and must keep hashing — a blanket rule would let the sibling
        # fields change without staling anything (the r10 hole).
        return None
    if type(obj) in (tuple, list):
        parts = [_const_payload(x, depth + 1) for x in obj]
        if any(p is None for p in parts):
            return None
        return f"{type(obj).__name__}[{','.join(parts)}]"
    if type(obj) in (set, frozenset):
        parts = [_const_payload(x, depth + 1) for x in obj]
        if any(p is None for p in parts):
            return None
        return f"{type(obj).__name__}[{','.join(sorted(parts))}]"
    if type(obj) is dict:
        items = []
        for k, v in obj.items():
            kp = _const_payload(k, depth + 1)
            vp = _const_payload(v, depth + 1)
            if kp is None or vp is None:
                return None
            items.append(f"{kp}:{vp}")
        return "dict{" + ",".join(sorted(items)) + "}"
    return None


def _in_package(obj) -> bool:
    mod = getattr(obj, "__module__", None)
    return isinstance(mod, str) and (
        mod == PACKAGE or mod.startswith(PACKAGE + ".")
    )


class _DocDecoStripper(ast.NodeTransformer):
    """Drop decorator lists and docstrings so cosmetic edits (register
    doc text, module prose) do not perturb the hash. Oracle text is
    re-added explicitly by :func:`spec_fingerprint`."""

    def _strip_doc(self, node):
        body = node.body
        if (
            body
            and isinstance(body[0], ast.Expr)
            and isinstance(body[0].value, ast.Constant)
            and isinstance(body[0].value.value, str)
        ):
            node.body = body[1:] or [ast.Pass()]
        return node

    def visit_Module(self, node):
        # module docstrings must not perturb the whole-file fallback
        # hash either (r10 review: the class promised 'module prose'
        # insensitivity but only stripped def/class docstrings; for a
        # FUNCTION's parsed source the Module body is the def itself,
        # so this is a no-op there)
        self.generic_visit(node)
        return self._strip_doc(node)

    def visit_FunctionDef(self, node):
        node.decorator_list = []
        self.generic_visit(node)
        return self._strip_doc(node)

    def visit_AsyncFunctionDef(self, node):
        node.decorator_list = []
        self.generic_visit(node)
        return self._strip_doc(node)

    def visit_ClassDef(self, node):
        node.decorator_list = []
        self.generic_visit(node)
        return self._strip_doc(node)


@functools.lru_cache(maxsize=None)
def _normalized_source(obj) -> tuple[str, ast.AST | None]:
    """(normalized source, parsed tree) — '' when source is unavailable
    (builtins, C extensions). Memoized: shared operator/kernel modules
    sit in hundreds of query closures, and re-running
    getsource+parse+unparse per query made every registry import pay
    ~3 s (r10 review); the cache holds for the process lifetime, which
    is sound because source cannot change under a running process that
    already imported it."""
    try:
        src = textwrap.dedent(inspect.getsource(obj))
    except (OSError, TypeError):
        return "", None
    try:
        tree = ast.parse(src)
    except SyntaxError:
        return src, None
    tree = _DocDecoStripper().visit(tree)
    ast.fix_missing_locations(tree)
    try:
        return ast.unparse(tree), tree
    except Exception:
        return src, tree


@functools.lru_cache(maxsize=None)
def _module_file_source(mod: types.ModuleType) -> str:
    """Whole-file fallback for a referenced module we can't resolve
    attribute-by-attribute — coarse but safe (AST-normalized so
    comments still don't count)."""
    path = getattr(mod, "__file__", None)
    if not path:
        return ""
    try:
        with open(path, encoding="utf-8") as f:
            src = f.read()
    except OSError:
        return ""
    try:
        tree = _DocDecoStripper().visit(ast.parse(src))
        ast.fix_missing_locations(tree)
        return ast.unparse(tree)
    except Exception:
        return src


def _iter_refs(tree: ast.AST, globalns: dict):
    """Yield runtime objects statically referenced by ``tree``:

    - bare names resolved through ``globalns``;
    - one-level attributes on names that resolve to modules
      (``dedup.connected_components_hybrid``); unresolvable attrs on an
      in-package module yield the module itself (whole-file fallback);
    - in-function ``import`` / ``from ... import`` targets (the query
      fns import operator modules locally by convention).
    """
    for node in ast.walk(tree):
        if isinstance(node, ast.Name):
            if node.id in globalns:
                yield globalns[node.id]
        elif isinstance(node, ast.Attribute):
            base = node.value
            if isinstance(base, ast.Name) and base.id in globalns:
                owner = globalns[base.id]
                if isinstance(owner, types.ModuleType):
                    try:
                        yield getattr(owner, node.attr)
                    except AttributeError:
                        yield owner
        elif isinstance(node, ast.Import):
            for alias in node.names:
                top = alias.name
                if top == PACKAGE or top.startswith(PACKAGE + "."):
                    mod = _safe_import(top)
                    if mod is not None:
                        yield mod
        elif isinstance(node, ast.ImportFrom):
            m = node.module or ""
            if node.level == 0 and (
                m == PACKAGE or m.startswith(PACKAGE + ".")
            ):
                mod = _safe_import(m)
                if mod is None:
                    continue
                for alias in node.names:
                    try:
                        yield getattr(mod, alias.name)
                    except AttributeError:
                        sub = _safe_import(f"{m}.{alias.name}")
                        yield sub if sub is not None else mod


def _safe_import(name: str):
    mod = sys.modules.get(name)
    if mod is not None:
        return mod
    try:
        import importlib

        return importlib.import_module(name)
    except Exception:
        return None


def _entries(fn) -> list[tuple[str, str]]:
    """Sorted (key, normalized-source-or-repr) pairs for ``fn`` and its
    transitive in-package dependency closure."""
    seen: dict[str, str] = {}
    visited: set[int] = set()
    stack: list[object] = [fn]
    while stack:
        obj = stack.pop()
        try:
            obj = inspect.unwrap(obj)
        except Exception:
            pass
        if id(obj) in visited:
            continue
        visited.add(id(obj))

        if isinstance(obj, types.ModuleType):
            name = getattr(obj, "__name__", "")
            if not (name == PACKAGE or name.startswith(PACKAGE + ".")):
                continue
            key = f"module:{name}"
            if key not in seen:
                seen[key] = _module_file_source(obj)
            continue

        if inspect.isfunction(obj) or inspect.isclass(obj):
            if not _in_package(obj):
                continue
            key = f"{obj.__module__}.{getattr(obj, '__qualname__', getattr(obj, '__name__', '?'))}"
            if key in seen:
                continue
            src, tree = _normalized_source(obj)
            seen[key] = src
            if tree is None:
                continue
            if inspect.isfunction(obj):
                globalns = getattr(obj, "__globals__", {})
            else:
                mod = sys.modules.get(obj.__module__)
                globalns = vars(mod) if mod else {}
            stack.extend(_iter_refs(tree, globalns))
            continue

        if inspect.ismethod(obj):
            stack.append(obj.__func__)
            continue

        # module-level constant reads (bucket widths, SQL templates,
        # column-name constants, config MAPS): value participates when
        # the whole structure is constant; anonymous, so keyed by repr
        # (collisions are harmless — the pair just de-dupes)
        r = _const_payload(obj)
        if r is not None:
            seen.setdefault(f"const:{hashlib.sha256(r.encode()).hexdigest()[:16]}", r)

    return sorted(seen.items())


def callable_fingerprint(fn) -> str:
    """Hex fingerprint of ``fn``'s normalized source closure."""
    payload = json.dumps(_entries(fn), ensure_ascii=False)
    return hashlib.sha256(payload.encode()).hexdigest()


def spec_fingerprint(fn, oracle: str | None) -> str:
    """Fingerprint of a registered query: code closure + oracle text
    (whitespace-squeezed, so SQL reformatting doesn't un-verify)."""
    code = callable_fingerprint(fn)
    osql = " ".join((oracle or "").split())
    return hashlib.sha256(f"{code}|{osql}".encode()).hexdigest()
