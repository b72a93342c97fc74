#!/usr/bin/env python
"""One-shot splitter: registry.py (22.7k lines) -> registry/ package
(VERDICT r7 #7).  Cuts at the existing section banners, preserves
registration order via __init__ importing domain modules in the
original file order, rewrites one-dot relative imports to two dots,
and reports cross-module name references so the needed imports can be
added explicitly.  Deleted after use (committed once for provenance).
"""

from __future__ import annotations

import ast
import os

SRC = "aws_glue_jobs_incremental_database_etl_spark/registry.py"
PKG = "aws_glue_jobs_incremental_database_etl_spark/registry"

# (module_name, banner-title prefix that STARTS it)
SECTIONS = [
    ("rel", "Relational: aggregations"),
    ("etl_streaming", "ETL parity (the reference's own pipeline"),
    ("llm", "LLM-pipeline operators: dedup / similarity"),
    ("variants", "Inventory-completing variants"),
    ("wave2", "Round-2 session additions"),
    ("wave3_text", "Round-3 pipeline additions"),
    ("wave3_graph", "Round-3 third wave: graph analytics"),
    ("wave6_ts", "Round-6 wave: time-series diagnostics"),
    ("wave7_stats", "Round-7 wave: association / dispersion"),
    ("wave7_graph", "Round-7 wave: link prediction / forecast"),
    ("wave7_misc", "Round-7 wave 2: recommendations / survey"),
    ("__tail__", "Driver-facing registration order"),
]

HEADER = '''"""{title} — split from the single-file registry (VERDICT r7 #7).

Registration order is preserved by the package ``__init__`` importing
the domain modules in the original file order; ``Q``/``O`` are the
shared dicts from ``._core``.
"""

from __future__ import annotations

import tempfile  # noqa: F401  (several queries stage scratch dirs)

import pandas as pd  # noqa: F401  resolves pandas_udf string annotations

from pyspark.sql import DataFrame, SparkSession  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401
from pyspark.sql.window import Window  # noqa: F401

from ..functions import epoch_us  # noqa: F401
from ..tables import load_table  # noqa: F401
from ._core import (  # noqa: F401
    _LM_CE_SQL,
    _SHINGLE_INTER_SQL,
    O,
    Q,
    query,
)

'''


def main() -> None:
    with open(SRC) as f:
        lines = f.readlines()

    # locate each banner: a "# ====" line whose NEXT line holds the title
    starts: dict[str, int] = {}
    for i, ln in enumerate(lines):
        if ln.startswith("# ====") and i + 1 < len(lines):
            title = lines[i + 1].lstrip("# ").rstrip()
            for mod, prefix in SECTIONS:
                if title.startswith(prefix) and mod not in starts:
                    starts[mod] = i  # 0-based index of the banner line
    missing = [m for m, _ in SECTIONS if m not in starts]
    assert not missing, f"banners not found: {missing}"

    order = [m for m, _ in SECTIONS]
    bounds = [(m, starts[m]) for m in order]
    os.makedirs(PKG, exist_ok=True)

    # _core.py: everything before the first section banner
    core_body = "".join(lines[: bounds[0][1]])
    with open(f"{PKG}/_core.py", "w") as f:
        f.write(core_body.replace("from .functions import", "from ..functions import")
                .replace("from .tables import", "from ..tables import"))

    defined: dict[str, set[str]] = {}
    for k, (mod, s) in enumerate(bounds):
        if mod == "__tail__":
            break
        e = bounds[k + 1][1]
        body = "".join(lines[s:e])
        # one-dot package-internal imports are now one level deeper
        body = body.replace("from .operators", "from ..operators")
        body = body.replace("from .functions", "from ..functions")
        body = body.replace("from .tables", "from ..tables")
        body = body.replace("from .streaming", "from ..streaming")
        body = body.replace("from .pipeline", "from ..pipeline")
        body = body.replace("from .catalog", "from ..catalog")
        body = body.replace("from .bookmarks", "from ..bookmarks")
        body = body.replace("from .config", "from ..config")
        body = body.replace("from .sinks", "from ..sinks")
        body = body.replace("from .sharding", "from ..sharding")
        body = body.replace("from .transforms", "from ..transforms")
        body = body.replace("from .types", "from ..types")
        body = body.replace("from .merge", "from ..merge")
        body = body.replace("from .maintenance", "from ..maintenance")
        body = body.replace("from .aggregates", "from ..aggregates")
        body = body.replace("from .txn", "from ..txn")
        body = body.replace("from .session", "from ..session")
        title = lines[s + 1].lstrip("# ").rstrip()
        with open(f"{PKG}/{mod}.py", "w") as f:
            f.write(HEADER.format(title=title))
            f.write(body)
        tree = ast.parse(body)
        names = set()
        for node in tree.body:
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
                names.add(node.name)
            elif isinstance(node, ast.Assign):
                for t in node.targets:
                    if isinstance(t, ast.Name):
                        names.add(t.id)
        defined[mod] = names

    # tail -> __init__.py
    tail = "".join(lines[starts["__tail__"] :])
    mods = [m for m, _ in SECTIONS if m != "__tail__"]
    init = (
        '"""Query registry package: every implemented operator as a\n'
        "(spark, sf_dir) -> DataFrame callable in ``Q`` with a matching\n"
        "DuckDB oracle in ``O`` (split per domain from the original\n"
        "single-file registry — VERDICT r7 #7; conventions unchanged,\n"
        "see ``._core``).\"\"\"\n\n"
        "from __future__ import annotations\n\n"
        "from ._core import O, Q, query  # noqa: F401\n\n"
        "# Domain modules, imported in the ORIGINAL single-file order so\n"
        "# Q/O registration order is byte-identical before _reorder().\n"
    )
    for m in mods:
        init += f"from . import {m}  # noqa: E402,F401\n"
    init += "\n# re-exports kept for external references\n"
    init += "_RECURSIVE_DECAY_SQL = wave2._RECURSIVE_DECAY_SQL\n\n"
    init += tail
    with open(f"{PKG}/__init__.py", "w") as f:
        f.write(init)

    # cross-module reference report
    print("=== cross-module references needing imports ===")
    all_defs = {}
    for m, names in defined.items():
        for n in names:
            all_defs.setdefault(n, m)
    import builtins

    bset = set(dir(builtins))
    common = {
        "F", "Window", "DataFrame", "SparkSession", "pd", "tempfile",
        "epoch_us", "load_table", "O", "Q", "query", "_LM_CE_SQL",
        "_SHINGLE_INTER_SQL",
    }
    for m in mods:
        with open(f"{PKG}/{m}.py") as f:
            tree = ast.parse(f.read())
        local: set[str] = set()
        for node in ast.walk(tree):
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
                local.add(node.name)
                for a in getattr(node.args, "args", []) if hasattr(node, "args") else []:
                    pass
            elif isinstance(node, ast.Assign):
                for t in node.targets:
                    if isinstance(t, ast.Name):
                        local.add(t.id)
            elif isinstance(node, (ast.Import, ast.ImportFrom)):
                for a in node.names:
                    local.add((a.asname or a.name).split(".")[0])
        used = set()
        # names assigned anywhere (incl. inside functions) count as local
        for node in ast.walk(tree):
            if isinstance(node, ast.Name) and isinstance(node.ctx, (ast.Store, ast.Del)):
                local.add(node.id)
            elif isinstance(node, ast.arg):
                local.add(node.arg)
            elif isinstance(node, ast.comprehension):
                pass
        for node in ast.walk(tree):
            if isinstance(node, ast.Name) and isinstance(node.ctx, ast.Load):
                used.add(node.id)
        unresolved = used - local - bset - common
        ext = {n: all_defs[n] for n in sorted(unresolved) if n in all_defs and all_defs[n] != m}
        truly = sorted(n for n in unresolved if n not in all_defs)
        if ext:
            print(f"{m}: import {ext}")
        if truly:
            print(f"{m}: UNRESOLVED {truly}")


if __name__ == "__main__":
    main()
