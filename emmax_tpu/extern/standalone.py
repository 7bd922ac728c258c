"""Standalone single-file export bundler.

The reference ships a self-contained ``modeling_prismatic.py`` on the Hub
(``/root/reference/prismatic/extern/hf/modeling_prismatic.py:213-489``) so a
``trust_remote_code`` consumer needs no package install. The TPU rebuild's
equivalent: :func:`build_standalone_source` concatenates the transitive
module closure of the HF facade (model code, ops, serving engines, solver,
tokenizer, config registry — JAX/numpy deps only, **no** ``emmax_tpu``
import) into one importable ``modeling_emmax.py``.

Mechanics: modules are topologically ordered by their top-level
intra-package imports, then each source is spliced — top-level
``from emmax_tpu.* import ...`` / ``from __future__`` statements removed,
function-local intra-package imports replaced by alias bindings (every
bundled name lives in the one shared module namespace).
"""

from __future__ import annotations

import ast
import re
from pathlib import Path
from typing import Dict, List, Tuple

PKG = "emmax_tpu"
PKG_ROOT = Path(__file__).resolve().parent.parent

# Roots of the closure: the three auto_map surfaces + the loader.
ROOTS = [
    "emmax_tpu.extern.hf_config",
    "emmax_tpu.extern.hf_processor",
    "emmax_tpu.extern.hf_facade",
    "emmax_tpu.models.load",
]

# Package __init__ modules are re-export shims; their names come from the
# bundled submodules directly.
_SKIP = {"emmax_tpu", "emmax_tpu.conf", "emmax_tpu.models", "emmax_tpu.ops",
         "emmax_tpu.vla", "emmax_tpu.extern", "emmax_tpu.serving",
         "emmax_tpu.parallel", "emmax_tpu.data", "emmax_tpu.training",
         "emmax_tpu.util"}

# Same-name-different-class collisions across modules, resolved by renaming
# inside one module's chunk (word-boundary textual rename).
_RENAMES: Dict[str, Dict[str, str]] = {
    # the facade's thin wrapper vs the serializable HF processor (the
    # auto_map target keeps the public name)
    "emmax_tpu.extern.hf_facade": {"EmmaXProcessor": "EmmaXFacadeProcessor"},
}


def _mod_path(mod: str) -> Path:
    rel = Path(*mod.split(".")[1:])
    p = PKG_ROOT / rel.with_suffix(".py")
    if p.exists():
        return p
    return PKG_ROOT / rel / "__init__.py"


def _intra_imports(tree: ast.AST, top_level_only: bool) -> List[ast.stmt]:
    out = []
    nodes = ast.iter_child_nodes(tree) if top_level_only else ast.walk(tree)
    for node in nodes:
        if isinstance(node, ast.ImportFrom) and node.module and (
                node.module == PKG or node.module.startswith(PKG + ".")):
            out.append(node)
        elif isinstance(node, ast.Import) and any(
                a.name == PKG or a.name.startswith(PKG + ".")
                for a in node.names):
            out.append(node)
    return out


def _closure() -> List[str]:
    """Transitive closure over ALL (incl. nested) intra-package imports,
    then a topological order by top-level imports."""
    seen: Dict[str, ast.Module] = {}
    stack = list(ROOTS)
    while stack:
        mod = stack.pop()
        if mod in seen or mod in _SKIP:
            continue
        tree = ast.parse(_mod_path(mod).read_text())
        seen[mod] = tree
        for node in _intra_imports(tree, top_level_only=False):
            if isinstance(node, ast.ImportFrom):
                target = node.module
            else:
                target = node.names[0].name
            if target in _SKIP:
                # `from emmax_tpu.conf import X`: the package __init__ is a
                # re-export shim — chase ITS imports to find the defining
                # submodules (the names resolve in the flat bundle namespace)
                init_tree = ast.parse(_mod_path(target).read_text())
                for sub in _intra_imports(init_tree, top_level_only=True):
                    if isinstance(sub, ast.ImportFrom) and sub.module:
                        stack.append(sub.module)
                continue
            stack.append(target)

    # topological sort on TOP-LEVEL edges only (nested imports execute at
    # call time, when the whole bundle namespace already exists)
    order: List[str] = []
    marked: Dict[str, int] = {}

    def visit(mod: str) -> None:
        state = marked.get(mod, 0)
        if state == 2:
            return
        if state == 1:  # cycle via top-level imports would be a real bug
            raise RuntimeError(f"top-level import cycle through {mod}")
        marked[mod] = 1
        for node in _intra_imports(seen[mod], top_level_only=True):
            target = (node.module if isinstance(node, ast.ImportFrom)
                      else node.names[0].name)
            if target in seen:
                visit(target)
            elif target in _SKIP:
                # `from emmax_tpu.conf import X` through a re-export shim:
                # the ordering edge must reach the DEFINING submodules,
                # exactly like the closure stage — without this, bundle
                # order fell back to alphabetical luck and a consumer
                # sorting before its definition would NameError at import
                init_tree = ast.parse(_mod_path(target).read_text())
                for sub in _intra_imports(init_tree, top_level_only=True):
                    if (isinstance(sub, ast.ImportFrom) and sub.module
                            and sub.module in seen):
                        visit(sub.module)
        marked[mod] = 2
        order.append(mod)

    for mod in sorted(seen):
        visit(mod)
    return order


def _splice(mod: str) -> str:
    """Module source with intra-package/future imports removed (top level)
    or replaced by alias bindings (nested)."""
    src = _mod_path(mod).read_text()
    lines = src.splitlines()
    tree = ast.parse(src)

    edits: List[Tuple[int, int, str]] = []  # (start0, end0, replacement)
    for node in ast.walk(tree):
        repl = None
        if isinstance(node, ast.ImportFrom) and node.module == "__future__":
            repl = ""
        elif isinstance(node, (ast.Import, ast.ImportFrom)) and \
                node in _intra_imports(tree, top_level_only=False):
            indent = " " * node.col_offset
            if node.col_offset == 0:
                repl = ""
            else:
                aliases = [f"{a.asname} = {a.name}" for a in node.names
                           if a.asname and a.asname != a.name]
                repl = indent + ("; ".join(aliases) if aliases else "pass") \
                    + f"  # bundled: {ast.unparse(node)}"
        if repl is not None:
            edits.append((node.lineno - 1, node.end_lineno - 1, repl))

    for start, end, repl in sorted(edits, reverse=True):
        lines[start:end + 1] = [repl] if repl else []

    chunk = "\n".join(lines)
    for old, new in _RENAMES.get(mod, {}).items():
        chunk = re.sub(rf"\b{old}\b", new, chunk)
    return chunk


_HEADER = '''\
"""modeling_emmax.py — SELF-CONTAINED Emma-X TPU model file.

Generated by `emmax_tpu.extern.standalone.build_standalone_source` (do not
edit by hand). Bundles the full inference surface of the emmax_tpu package
— PrismaticVLM/EmmaX model code, Pallas/XLA ops, serving engines, solver,
tokenizers, config registry — into one file with NO dependency on the
emmax_tpu package being installed. External deps: jax, numpy (optional:
orbax for checkpoint restore, PIL for image decode).

Role-equivalent to the reference's standalone Hub file
(/root/reference/prismatic/extern/hf/modeling_prismatic.py:213-489).

Entry points: EmmaXForVision2Seq.from_pretrained(dir),
EmmaXProcessor (processing), EmmaXVLAConfig (configuration), load_vla(dir).
"""

from __future__ import annotations

'''


def build_standalone_source() -> str:
    parts = [_HEADER]
    for mod in _closure():
        parts.append(f"\n# {'=' * 70}\n# bundled from {mod}\n# {'=' * 70}\n")
        parts.append(_splice(mod))
    parts.append(
        "\n\n__all__ = [\"EmmaXForVision2Seq\", \"EmmaXProcessor\", "
        "\"EmmaXVLAConfig\", \"EmmaXImageProcessor\", \"load_vla\", "
        "\"load\"]\n")
    bundle = "\n".join(parts)
    # sanity: the generated file must parse
    ast.parse(bundle)
    return bundle
