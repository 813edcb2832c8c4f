"""The lint gate must RUN in this image (VERDICT r2: a NameError shipped
because `make lint` required ruff, which isn't installed here).

Two layers: ``compileall`` (syntax) and ``tools/lint.py`` (undefined-name,
F821-class — the exact bug class that shipped). Reference analogue: the
ruff CI gate (.github/workflows/ruff-lint.yml).
"""

from __future__ import annotations

import compileall
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "tools"))

import lint  # noqa: E402


def test_compileall_clean():
    for target in ("semanticlens_tpu", "tools"):
        assert compileall.compile_dir(
            str(REPO / target), quiet=2, force=False
        ), f"syntax error under {target}/"


def test_no_undefined_names():
    findings: list[str] = []
    for target in ("semanticlens_tpu", "tools", "tests"):
        for f in sorted((REPO / target).rglob("*.py")):
            findings += lint.check_file(f)
    for f in (REPO / "bench.py", REPO / "__graft_entry__.py"):
        findings += lint.check_file(f)
    assert not findings, "undefined names:\n" + "\n".join(findings)


def test_lint_catches_the_shipped_bug_class(tmp_path):
    # Regression for ops/aggregators.py r2: a name referenced only on an
    # error path, never defined anywhere.
    bad = tmp_path / "bad.py"
    bad.write_text(
        "def f(x):\n"
        "    if x.ndim != 3:\n"
        "        raise ValueError('bad: ' + _ERROR_MESSAGE)\n"
        "    return x\n"
    )
    findings = lint.check_file(bad)
    assert any("_ERROR_MESSAGE" in f for f in findings)


def test_lint_no_false_positives_on_scope_shapes(tmp_path):
    ok = tmp_path / "ok.py"
    ok.write_text(
        "import numpy as np\n"
        "X = 1\n"
        "class A:\n"
        "    field = X\n"
        "    def m(self, y=X):\n"
        "        def inner():\n"
        "            return self, np\n"
        "        with open('/dev/null') as fh:\n"
        "            data = fh.read()\n"
        "        z = [i * y for i in range(3) if i > X]\n"
        "        lam = lambda a: a + y\n"
        "        try:\n"
        "            pass\n"
        "        except ValueError as exc:\n"
        "            return exc\n"
        "        return inner, data, z, lam\n"
    )
    assert lint.check_file(ok) == []
