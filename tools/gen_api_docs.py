"""Regenerate docs/api.md from source docstrings (first line per name)."""

from __future__ import annotations

import sys
from pathlib import Path

_repo = Path(__file__).resolve().parent.parent
if str(_repo) not in sys.path:
    sys.path.insert(0, str(_repo))

import importlib
import inspect

MODULES = [
    "semanticlens_tpu",
    "semanticlens_tpu.lens",
    "semanticlens_tpu.scores",
    "semanticlens_tpu.collect",
    "semanticlens_tpu.collect.engine",
    "semanticlens_tpu.models",
    "semanticlens_tpu.foundation_models",
    "semanticlens_tpu.foundation_models.sentencepiece",
    "semanticlens_tpu.foundation_models.assets",
    "semanticlens_tpu.foundation_models.reparam",
    "semanticlens_tpu.data",
    "semanticlens_tpu.data.native_decoder",
    "semanticlens_tpu.core",
    "semanticlens_tpu.parallel",
    "semanticlens_tpu.relevance",
    "semanticlens_tpu.ops.aggregators",
    "semanticlens_tpu.ops.topk",
    "semanticlens_tpu.ops.kmeans",
    "semanticlens_tpu.ops.preprocess",
    "semanticlens_tpu.ops.pallas_ops",
    "semanticlens_tpu.utils",
    "semanticlens_tpu.utils.render",
]


def public_names(mod):
    if hasattr(mod, "__all__"):
        return list(mod.__all__)
    return [
        n
        for n, v in vars(mod).items()
        if not n.startswith("_")
        and (inspect.isclass(v) or inspect.isfunction(v))
        and getattr(v, "__module__", "").startswith("semanticlens_tpu")
    ]


def describe(mod, name):
    obj = getattr(mod, name)
    doc = (inspect.getdoc(obj) or "").split("\n")[0]
    if inspect.isclass(obj):
        return f"- **`{name}`** (class) — {doc}"
    if inspect.isfunction(obj):
        try:
            sig = str(inspect.signature(obj))
        except (TypeError, ValueError):
            sig = "(...)"
        return f"- **`{name}{sig}`** (fn) — {doc}"
    return f"- **`{name}`** (obj) — {doc}"


def main():
    out = ["# Public API reference", "", "Generated from source docstrings (first line). Module → public names.", ""]
    out += ["Regenerate with `python tools/gen_api_docs.py`.", ""]
    for modname in MODULES:
        mod = importlib.import_module(modname)
        names = public_names(mod)
        if not names:
            continue
        out.append(f"## `{modname}`")
        out.append("")
        for n in names:
            try:
                out.append(describe(mod, n))
            except AttributeError:
                continue
        out.append("")
    (_repo / "docs" / "api.md").write_text("\n".join(out))
    print(f"wrote docs/api.md ({len(out)} lines)")


if __name__ == "__main__":
    main()
