"""One-off mechanical splitter for plans/registry.py (VERDICT r11
item 4): cut the 25k-line registry into per-domain modules
(registry_ts/doc/emb/events/graph/stream/tpch + registry_common)
behind the unchanged ``all_queries()``/``all_oracles()`` façade.

Pure refactor by construction: every top-level statement moves
VERBATIM (with its preceding comment block) into exactly one module,
keeping original relative order; cross-module name use becomes an
explicit import. The façade re-exports every top-level name so
``registry.<anything>`` keeps working for tests and callers.

Run from the repo root: ``python tools/split_registry.py``.
Idempotence is not a goal — it reads the monolithic registry.py and
must not be re-run after the split.
"""

from __future__ import annotations

import ast
import collections
import re

PKG = "big_data_stock_price_forecast_spark/plans"
SRC = f"{PKG}/registry.py"
FACADE = {"all_queries", "all_oracles", "_oracle_sql_map"}
DOMAINS = ["ts", "doc", "emb", "events", "graph", "stream", "tpch"]

HEADERS = {
    "common": (
        "Shared registry plumbing: the base candle/series CTE pair "
        "(Spark + DuckDB), rounding/canonicalization helpers, and "
        "every helper used by two or more query domains."
    ),
    "ts": "Time-series / flagship query domain (candles from events).",
    "doc": "Document / text-analysis query domain (documents table).",
    "emb": (
        "Embedding / ANN / kNN / window-embedding / multimodal query "
        "domain (embeddings table, media payloads)."
    ),
    "events": "Event-analytics query domain (events table).",
    "graph": "Graph-analytics query domain (edges from TPC-H/events).",
    "stream": "Structured Streaming query domain (batch-oracle twins).",
    "tpch": "TPC-H relational query domain (orders/lineitem/part/...).",
}


def domain_of(name: str) -> str | None:
    low = name.lower().lstrip("_")
    for pre in ("q_", "sql_"):
        if low.startswith(pre):
            low = low[len(pre):]
            break
    if re.match(
        r"(tpch|part_|lineitem|supplier|customer|orders_|nation"
        r"|top_orders|top_revenue|customers_)",
        low,
    ):
        return "tpch"
    if low.startswith(("ts_", "flagship")):
        return "ts"
    if low.startswith("doc_"):
        return "doc"
    if low.startswith(("emb_", "knn_", "win_", "media_")):
        return "emb"
    if low.startswith("stream_"):
        return "stream"
    if low.startswith("events_"):
        return "events"
    if low.startswith("graph_"):
        return "graph"
    return None


def main() -> None:
    src_lines = open(SRC).read().splitlines(keepends=True)
    tree = ast.parse("".join(src_lines))

    stmts = []
    for node in tree.body:
        defined: set[str] = set()
        is_import = isinstance(node, (ast.Import, ast.ImportFrom))
        if isinstance(node, (ast.FunctionDef, ast.ClassDef)):
            defined.add(node.name)
        elif isinstance(node, ast.Assign):
            for t in node.targets:
                if isinstance(t, ast.Name):
                    defined.add(t.id)
                elif isinstance(t, (ast.Tuple, ast.List)):
                    for el in t.elts:
                        if isinstance(el, ast.Name):
                            defined.add(el.id)
        elif isinstance(node, ast.AnnAssign) and isinstance(
            node.target, ast.Name
        ):
            defined.add(node.target.id)
        elif is_import:
            for a in node.names:
                defined.add((a.asname or a.name).split(".")[0])
        refs = {
            sub.id
            for sub in ast.walk(node)
            if isinstance(sub, ast.Name) and isinstance(sub.ctx, ast.Load)
        }
        start = node.lineno
        if getattr(node, "decorator_list", None):
            start = min(start, node.decorator_list[0].lineno)
        stmts.append(
            dict(
                start=start,
                end=node.end_lineno,
                defined=defined,
                refs=refs,
                is_import=is_import,
                is_docstring=(
                    isinstance(node, ast.Expr)
                    and isinstance(node.value, ast.Constant)
                ),
            )
        )

    def_idx: dict[str, list[int]] = collections.defaultdict(list)
    for i, st in enumerate(stmts):
        for n in st["defined"]:
            def_idx[n].append(i)

    # ---- initial assignment ----
    assign: dict[int, str] = {}
    for i, st in enumerate(stmts):
        if st["is_import"] or st["is_docstring"]:
            assign[i] = "common"
            continue
        if st["defined"] & FACADE:
            assign[i] = "facade"
            continue
        doms = {domain_of(n) for n in st["defined"]} - {None}
        assert len(doms) <= 1, (st["start"], st["defined"])
        assign[i] = doms.pop() if doms else "common"

    # names defined by more than one statement must co-locate
    for n, idxs in def_idx.items():
        mods = {assign[i] for i in idxs}
        assert len(mods) == 1, (n, mods)

    # ---- fixpoint: anything a common statement references must
    # itself be common (transitively) ----
    changed = True
    while changed:
        changed = False
        for i, st in enumerate(stmts):
            if assign[i] != "common":
                continue
            for n in st["refs"]:
                for j in def_idx.get(n, []):
                    if assign[j] not in ("common", "facade"):
                        assign[j] = "common"
                        changed = True

    # ---- cross-domain edges -> explicit imports; assert acyclic ----
    needs: dict[str, dict[str, set[str]]] = collections.defaultdict(
        lambda: collections.defaultdict(set)
    )
    for i, st in enumerate(stmts):
        dx = assign[i]
        if dx == "facade":
            continue
        for n in st["refs"]:
            for j in def_idx.get(n, []):
                dy = assign[j]
                if dy == dx or dy == "facade":
                    continue
                needs[dx][dy].add(n)
    order: list[str] = []
    remaining = set(DOMAINS)
    placed = {"common"}
    while remaining:
        progress = [
            d for d in remaining if set(needs.get(d, {})) <= placed
        ]
        assert progress, f"cyclic module deps: {remaining}"
        for d in sorted(progress):
            order.append(d)
            placed.add(d)
            remaining.discard(d)

    # ---- slice source text: each statement owns the gap (comments /
    # blank lines) above it, so no byte of the file is dropped ----
    segments: list[str] = []
    prev_end = 0
    for st in stmts:
        seg = "".join(src_lines[prev_end : st["end"]])
        segments.append(seg)
        prev_end = st["end"]
    tail = "".join(src_lines[prev_end:])

    by_mod: dict[str, list[int]] = collections.defaultdict(list)
    for i in range(len(stmts)):
        by_mod[assign[i]].append(i)

    # ---- emit common (keeps the original import prelude verbatim) --
    common_body = []
    for i in by_mod["common"]:
        if stmts[i]["is_docstring"]:
            continue  # replaced by the module docstring below
        common_body.append(segments[i])
    with open(f"{PKG}/registry_common.py", "w") as f:
        f.write(f'"""{HEADERS["common"]}\n\nSplit mechanically from the')
        f.write(" monolithic plans/registry.py (r12);\nstatement order")
        f.write(" and text preserved verbatim.\n\"\"\"\n")
        f.write("".join(common_body).lstrip("\n"))

    # ---- emit domain modules ----
    for d in order:
        imports = [
            "from __future__ import annotations\n",
            "\n",
            "from .registry_common import *  # noqa: F401,F403 — the\n",
            "# original monolith's prelude + shared helpers; underscore\n",
            "# names are imported explicitly below\n",
        ]
        for dep in sorted(needs.get(d, {})):
            names = sorted(needs[d][dep])
            mod = (
                "registry_common" if dep == "common" else f"registry_{dep}"
            )
            imports.append(
                f"from .{mod} import (  # noqa: F401\n"
                + "".join(f"    {n},\n" for n in names)
                + ")\n"
            )
        body = [segments[i] for i in by_mod[d]]
        with open(f"{PKG}/registry_{d}.py", "w") as f:
            f.write(f'"""{HEADERS[d]}\n\nSplit mechanically from the')
            f.write(" monolithic plans/registry.py (r12);\nstatement")
            f.write(" order and text preserved verbatim.\n\"\"\"\n")
            f.write("".join(imports))
            f.write("\n")
            f.write("".join(body))

    # star-import won't carry underscore-prefixed names: extend each
    # needs[d]['common'-like] import list with EVERY underscore name the
    # module references (recomputed above already includes them, since
    # needs[] is built from def_idx regardless of prefix) — but names
    # reachable only via the star import must be public. Verify:
    for d in order:
        refs = set().union(*(stmts[i]["refs"] for i in by_mod[d]))
        for n in refs:
            for j in def_idx.get(n, []):
                if assign[j] == d or assign[j] == "facade":
                    continue
                dep = assign[j]
                if n.startswith("_") and n not in needs[d].get(dep, set()):
                    raise AssertionError((d, dep, n))

    # ---- rewrite the façade ----
    facade_imports = []
    facade_imports.append("from .registry_common import (  # noqa: F401\n")
    common_names = sorted(
        n
        for n, idxs in def_idx.items()
        if assign[idxs[0]] == "common" and n != "annotations"
    )
    facade_imports.append("".join(f"    {n},\n" for n in common_names))
    facade_imports.append(")\n")
    for d in order:
        names = sorted(
            n for n, idxs in def_idx.items() if assign[idxs[0]] == d
        )
        facade_imports.append(
            f"from .registry_{d} import (  # noqa: F401\n"
            + "".join(f"    {n},\n" for n in names)
            + ")\n"
        )
    facade_body = [segments[i] for i in by_mod["facade"]]
    doc_i = next(i for i, st in enumerate(stmts) if st["is_docstring"])
    with open(SRC, "w") as f:
        f.write(segments[doc_i].lstrip("\n"))
        f.write("\nfrom __future__ import annotations\n\n")
        f.write("from collections.abc import Callable  # noqa: F401\n\n")
        f.write(
            "from pyspark.sql import DataFrame, SparkSession"
            "  # noqa: F401\n\n"
        )
        f.write("".join(facade_imports))
        f.write("".join(facade_body))
        f.write(tail)

    counts = {m: len(v) for m, v in sorted(by_mod.items())}
    print("module statement counts:", counts)
    print("module import order:", order)


if __name__ == "__main__":
    main()
