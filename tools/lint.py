"""Self-contained lint gate: syntax + undefined-name (F821-class) checking.

The reference repo runs ruff on every PR (reference:
.github/workflows/ruff-lint.yml); ruff is not installed in this image, and a
lint target that cannot run is how a ``NameError`` on an error path shipped
in round 2 (``ops/aggregators.py``). This tool needs only the stdlib:

1. **Syntax gate** — ``compile()`` every file.
2. **Undefined-name gate** — build lexical scope chains with ``ast`` and flag
   every ``Name(Load)`` that is not bound in any enclosing scope, module
   global, import, or builtin.

The binding analysis is deliberately *flow-insensitive* (a name bound
anywhere in an enclosing scope counts as defined everywhere in it, class
scopes count as visible to nested functions, wildcard imports disable the
check for that module): it over-approximates definedness, so every report is
a real NameError-in-waiting — no false positives, at the cost of missing
use-before-assignment orderings. That trade is right for a hard CI gate.

Usage::

    python tools/lint.py [paths...]     # default: semanticlens_tpu tools tests

Exit code 0 iff clean. ``tests/test_lint.py`` runs this in-suite so the gate
works in images without ruff; ``make lint`` prefers ruff when present.
"""

from __future__ import annotations

import ast
import builtins
import sys
from pathlib import Path

_BUILTINS = set(dir(builtins)) | {
    "__file__",
    "__name__",
    "__doc__",
    "__builtins__",
    "__package__",
    "__spec__",
    "__loader__",
    "__debug__",
    "__annotations__",
    "__dict__",
    "__module__",
    "__qualname__",
    "__class__",  # implicit in methods using zero-arg super()
    "WindowsError",  # platform-conditional usage pattern
}

_SCOPE_NODES = (
    ast.Module,
    ast.FunctionDef,
    ast.AsyncFunctionDef,
    ast.Lambda,
    ast.ClassDef,
    ast.ListComp,
    ast.SetComp,
    ast.DictComp,
    ast.GeneratorExp,
)


def _bindings(scope_node: ast.AST) -> tuple[set[str], bool]:
    """All names bound directly in ``scope_node`` (not in nested scopes).

    Returns (names, has_star_import). Flow-insensitive: any binding anywhere
    in the scope counts.
    """
    bound: set[str] = set()
    star = False

    if isinstance(scope_node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.Lambda)):
        a = scope_node.args
        for arg in [
            *a.posonlyargs,
            *a.args,
            *a.kwonlyargs,
            *([a.vararg] if a.vararg else []),
            *([a.kwarg] if a.kwarg else []),
        ]:
            bound.add(arg.arg)

    class Visitor(ast.NodeVisitor):
        def _visit_children_skipping_nested_scopes(self, node):
            for child in ast.iter_child_nodes(node):
                if isinstance(child, _SCOPE_NODES) and child is not scope_node:
                    # Nested scope: its def/class NAME binds here, its body
                    # does not — except comprehension/lambda bodies, whose
                    # walrus targets leak to the enclosing scope; recursing
                    # into them only over-approximates, which is safe.
                    if isinstance(
                        child, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)
                    ):
                        bound.add(child.name)
                    elif isinstance(
                        child,
                        (ast.ListComp, ast.SetComp, ast.DictComp, ast.GeneratorExp, ast.Lambda),
                    ):
                        self.visit(child)
                    continue
                self.visit(child)

        def generic_visit(self, node):
            self._visit_children_skipping_nested_scopes(node)

        def visit_Name(self, node):
            if isinstance(node.ctx, (ast.Store, ast.Del)):
                bound.add(node.id)

        def visit_FunctionDef(self, node):
            bound.add(node.name)
            self._visit_children_skipping_nested_scopes(node)

        visit_AsyncFunctionDef = visit_FunctionDef

        def visit_ClassDef(self, node):
            bound.add(node.name)
            self._visit_children_skipping_nested_scopes(node)

        def visit_Import(self, node):
            for alias in node.names:
                bound.add(alias.asname or alias.name.split(".")[0])

        def visit_ImportFrom(self, node):
            nonlocal star
            for alias in node.names:
                if alias.name == "*":
                    star = True
                else:
                    bound.add(alias.asname or alias.name)

        def visit_Global(self, node):
            bound.update(node.names)

        def visit_Nonlocal(self, node):
            bound.update(node.names)

        def visit_ExceptHandler(self, node):
            if node.name:
                bound.add(node.name)
            self.generic_visit(node)

        def visit_MatchAs(self, node):
            if node.name:
                bound.add(node.name)
            self.generic_visit(node)

        def visit_MatchStar(self, node):
            if node.name:
                bound.add(node.name)
            self.generic_visit(node)

        def visit_MatchMapping(self, node):
            if node.rest:
                bound.add(node.rest)
            self.generic_visit(node)

    v = Visitor()
    if isinstance(scope_node, _SCOPE_NODES[1:4]):  # function-likes: body only
        for field in ("body",):
            body = getattr(scope_node, field, None)
            if body is None:
                continue
            if isinstance(body, list):
                for stmt in body:
                    v.visit(stmt)
            else:
                v.visit(body)
    elif isinstance(scope_node, (ast.ListComp, ast.SetComp, ast.DictComp, ast.GeneratorExp)):
        for comp in scope_node.generators:
            v.visit(comp.target)
            v.visit(comp.iter)
            for cond in comp.ifs:
                v.visit(cond)
        for field in ("elt", "key", "value"):
            sub = getattr(scope_node, field, None)
            if sub is not None:
                v.visit(sub)
    else:  # Module / ClassDef
        for stmt in scope_node.body:
            v.visit(stmt)
    return bound, star


def check_file(path: Path) -> list[str]:
    """Return human-readable findings for one file (empty iff clean)."""
    src = path.read_text()
    try:
        tree = ast.parse(src, filename=str(path))
    except SyntaxError as exc:
        return [f"{path}:{exc.lineno}: syntax error: {exc.msg}"]

    # scope node -> (bindings, parent scope node)
    scopes: dict[ast.AST, tuple[set[str], ast.AST | None]] = {}
    any_star = False

    def collect(node: ast.AST, parent: ast.AST | None):
        nonlocal any_star
        bound, star = _bindings(node)
        any_star |= star
        scopes[node] = (bound, parent)
        for child in _direct_nested_scopes(node):
            collect(child, node)

    def _direct_nested_scopes(node: ast.AST):
        found = []

        def rec(n):
            for child in ast.iter_child_nodes(n):
                if isinstance(child, _SCOPE_NODES):
                    found.append(child)
                else:
                    rec(child)

        rec(node)
        return found

    collect(tree, None)
    if any_star:
        return []  # wildcard import: definedness unknowable, skip module

    findings: list[str] = []

    def visible(scope: ast.AST) -> set[str]:
        names: set[str] = set()
        cur: ast.AST | None = scope
        while cur is not None:
            bound, parent = scopes[cur]
            names |= bound
            cur = parent
        return names

    for scope, (_, _) in scopes.items():
        names = visible(scope) | _BUILTINS
        # direct Name(Load) nodes of this scope (not nested scopes)
        loads: list[ast.Name] = []

        def rec(n):
            for child in ast.iter_child_nodes(n):
                if isinstance(child, _SCOPE_NODES):
                    continue
                if isinstance(child, ast.Name) and isinstance(child.ctx, ast.Load):
                    loads.append(child)
                rec(child)

        def rec_top(n):
            # A top-level node that is ITSELF a nested scope (a method in a
            # class body, a comprehension as a lambda body) belongs to that
            # scope's own iteration, not this one.
            if not isinstance(n, _SCOPE_NODES):
                rec(n)

        if isinstance(scope, (ast.ListComp, ast.SetComp, ast.DictComp, ast.GeneratorExp)):
            for comp in scope.generators:
                rec_top(comp.iter)
                for cond in comp.ifs:
                    rec_top(cond)
            for field in ("elt", "key", "value"):
                sub = getattr(scope, field, None)
                if sub is not None:
                    rec_top(sub)
        elif isinstance(scope, ast.Lambda):
            rec_top(scope.body)
        elif isinstance(scope, ast.Module):
            rec(scope)
        else:  # FunctionDef / ClassDef: decorators+defaults resolve in parent
            for stmt in scope.body:
                rec_top(stmt)

        for name_node in loads:
            if name_node.id not in names:
                findings.append(
                    f"{path}:{name_node.lineno}: undefined name '{name_node.id}'"
                )
    return findings


def main(argv: list[str]) -> int:
    repo = Path(__file__).resolve().parent.parent
    targets = [Path(p) for p in argv] or [
        repo / "semanticlens_tpu",
        repo / "tools",
        repo / "tests",
        repo / "bench.py",
        repo / "__graft_entry__.py",
    ]
    files: list[Path] = []
    for t in targets:
        files += sorted(t.rglob("*.py")) if t.is_dir() else [t]
    all_findings: list[str] = []
    for f in files:
        all_findings += check_file(f)
    for line in all_findings:
        print(line)
    print(f"lint: {len(files)} files, {len(all_findings)} findings")
    return 1 if all_findings else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
