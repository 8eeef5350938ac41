"""One-shot mechanical splitter for arrowhouse_spark/suite.py (round-9
verdict item 8): positional chunks at @register boundaries so the
registration order — which the driver-window rotation depends on — is
byte-identical. Kept in tools/ as the record of how the split was made."""

from __future__ import annotations

import ast
import builtins
import os

SRC = "arrowhouse_spark/suite.py"
PKG = "arrowhouse_spark/suite"

# (module_name, start_line_1based) — end is the next start; core is 1..379
CHUNKS = [
    ("foundation", 380),        # flagship Q1, SSA, agg/sort/join/window parity
    ("text_hash", 1113),        # text analysis + hash-parity oracles
    ("dedup_core", 2659),       # dedup family + doc quality gates
    ("ann_limits", 3273),       # ANN, groupby-limit modes, asof/IVF/multimodal
    ("pipelines_pack", 3915),   # incremental dedup, packing, sampling, corpus
    ("text_bpe", 5303),         # url/vocab/KL/encoding + BPE family
    ("events_graph", 6730),     # OHLC/gapfill/SCD2/pagerank/zorder
    ("stats_ext", 8181),        # rolling/winsorize/PIT, TPC-H q5+, rank family
    ("tpch_completion", 9777),  # TPC-H q2..q22, basket, CMS, GDPR
    ("late_waves", 11295),      # attribution, benford, sig-jaccard, ewma, ...
]
CORE_END = 379  # core = lines 1..CORE_END inclusive

lines = open(SRC).read().splitlines(keepends=True)
n = len(lines)

# header imports shared by every chunk: from `from __future__` line to the
# line before `QueryFn =`
hdr_start = next(i for i, l in enumerate(lines) if l.startswith("from __future__"))
hdr_end = next(i for i, l in enumerate(lines) if l.startswith("QueryFn ="))
header = "".join(lines[hdr_start:hdr_end])

# names defined by the core (importable by chunks from the package)
core_src = "".join(lines[:CORE_END])
core_tree = ast.parse(core_src)
core_names = set()
for node in core_tree.body:
    if isinstance(node, ast.FunctionDef):
        core_names.add(node.name)
    elif isinstance(node, ast.Assign):
        for t in node.targets:
            if isinstance(t, ast.Name):
                core_names.add(t.id)

os.makedirs(PKG, exist_ok=True)

bounds = [s for _, s in CHUNKS] + [n + 1]
chunk_defs: dict[str, set[str]] = {}  # module -> top-level names it defines
prev_mods: list[str] = []

for idx, (mod, start) in enumerate(CHUNKS):
    body = "".join(lines[start - 1 : bounds[idx + 1] - 1])
    tree = ast.parse(body)
    defined = set()
    for node in tree.body:
        if isinstance(node, ast.FunctionDef):
            defined.add(node.name)
        elif isinstance(node, ast.Assign):
            for t in node.targets:
                if isinstance(t, ast.Name):
                    defined.add(t.id)
    chunk_defs[mod] = defined

    # names this chunk loads that are neither local, header-imported,
    # builtins, nor its own top-level defs → must import from the package
    # (core) or an earlier chunk
    header_names = set()
    for node in ast.parse(header).body:
        if isinstance(node, (ast.Import, ast.ImportFrom)):
            for a in node.names:
                header_names.add((a.asname or a.name).split(".")[0])

    class Scope(ast.NodeVisitor):
        def __init__(self):
            self.loads: set[str] = set()
            self.stores: set[str] = set()

        def visit_Name(self, node):
            if isinstance(node.ctx, ast.Load):
                self.loads.add(node.id)
            else:
                self.stores.add(node.id)
            self.generic_visit(node)

        def visit_FunctionDef(self, node):
            self.stores.add(node.name)
            self.stores.update(a.arg for a in node.args.args)
            self.stores.update(a.arg for a in node.args.kwonlyargs)
            if node.args.vararg:
                self.stores.add(node.args.vararg.arg)
            if node.args.kwarg:
                self.stores.add(node.args.kwarg.arg)
            self.generic_visit(node)

        visit_AsyncFunctionDef = visit_FunctionDef

        def visit_Lambda(self, node):
            self.stores.update(a.arg for a in node.args.args)
            self.generic_visit(node)

        def visit_comprehension(self, node):
            for t in ast.walk(node.target):
                if isinstance(t, ast.Name):
                    self.stores.add(t.id)
            self.generic_visit(node)

        def visit_ExceptHandler(self, node):
            if node.name:
                self.stores.add(node.name)
            self.generic_visit(node)

        def visit_Import(self, node):
            for a in node.names:
                self.stores.add((a.asname or a.name).split(".")[0])

        def visit_ImportFrom(self, node):
            for a in node.names:
                self.stores.add(a.asname or a.name)

    sc = Scope()
    sc.visit(tree)
    unresolved = (
        sc.loads
        - sc.stores
        - defined
        - header_names
        - set(dir(builtins))
    )
    from_core = sorted(u for u in unresolved if u in core_names)
    from_chunks: dict[str, list[str]] = {}
    leftover = []
    for u in sorted(unresolved - set(from_core)):
        for pm in reversed(prev_mods):
            if u in chunk_defs[pm]:
                from_chunks.setdefault(pm, []).append(u)
                break
        else:
            leftover.append(u)
    if leftover:
        raise SystemExit(f"{mod}: unresolvable names {leftover}")

    prelude = [
        f'"""Query suite chunk: see the package __init__ docstring. '
        f"Positional slice of the original suite.py (registration order is "
        f'load-bearing for the driver rotation — do not reorder)."""\n',
        "\n",
        "# ruff: noqa: F401  (shared header imports; unused ones kept "
        "for uniformity)\n",
        header,
        "\n",
    ]
    if from_core:
        prelude.append(
            "from arrowhouse_spark.suite import (\n"
            + "".join(f"    {u},\n" for u in from_core)
            + ")\n"
        )
    for pm, us in sorted(from_chunks.items()):
        prelude.append(
            f"from arrowhouse_spark.suite.{pm} import (\n"
            + "".join(f"    {u},\n" for u in us)
            + ")\n"
        )
    prelude.append("\n")
    with open(f"{PKG}/{mod}.py", "w") as f:
        f.write("".join(prelude) + body)
    prev_mods.append(mod)
    print(f"wrote {mod}.py defs={len(defined)} core_imports={len(from_core)} "
          f"chunk_imports={ {k: len(v) for k, v in from_chunks.items()} }")

# __init__.py: the core verbatim, then ordered chunk imports
init = core_src
init += (
    "\n\n# --- registration: import order IS registry order (driver rotation"
    " depends on it) ---\n"
)
for mod, _ in CHUNKS:
    init += f"from arrowhouse_spark.suite import {mod} as _{mod}  # noqa: E402,F401\n"
init += (
    "\n# compatibility re-exports (tests import these from the package)\n"
    "_WYHASH_LENS_HASHES = _text_hash._WYHASH_LENS_HASHES\n"
)
# package __file__ is one level deeper than suite.py was: repo root needs
# an extra dirname
init = init.replace(
    "here = artifact_dir or os.path.dirname(\n"
    "        os.path.dirname(os.path.abspath(__file__))\n"
    "    )",
    "here = artifact_dir or os.path.dirname(\n"
    "        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))\n"
    "    )",
)
assert "os.path.dirname(os.path.dirname(os.path.abspath(__file__)))" in init
with open(f"{PKG}/__init__.py", "w") as f:
    f.write(init)
print("wrote __init__.py")
