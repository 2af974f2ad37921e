"""docs/API.md must not rot: every import it shows has to execute.

Extracts the ``from multimodal_supernovae_tpu... import ...`` statements
from the fenced code blocks (including parenthesized multi-line forms and
the prose-referenced dotted names) and runs them.
"""

from __future__ import annotations

import importlib
import os
import re

API_MD = os.path.join(os.path.dirname(__file__), "..", "docs", "API.md")


def _import_statements(text: str):
    # parenthesized (multi-line) and plain single-line from-imports
    paren = re.compile(
        r"^from (multimodal_supernovae_tpu[\w.]*) import \(([^)]*)\)",
        re.MULTILINE,
    )
    plain = re.compile(
        r"^from (multimodal_supernovae_tpu[\w.]*) import ([^(\n]+)$",
        re.MULTILINE,
    )
    matches = [(m.group(1), m.group(2)) for m in paren.finditer(text)]
    matches += [(m.group(1), m.group(2)) for m in plain.finditer(text)]
    for module, names in matches:
        # strip comments and keep bare names
        cleaned = []
        for line in names.splitlines():
            line = line.split("#")[0]
            for tok in line.split(","):
                tok = tok.strip().rstrip(",")
                if tok:
                    cleaned.append(tok)
        yield module, cleaned


def test_every_documented_import_resolves():
    text = open(API_MD).read()
    statements = list(_import_statements(text))
    assert len(statements) >= 10, "extraction regressed"
    for module, names in statements:
        mod = importlib.import_module(module)
        for name in names:
            assert hasattr(mod, name), f"{module}.{name} documented but absent"


def test_documented_dotted_references_resolve():
    """Prose references like `utils.seed.set_seed` / `data.folds.stratified_kfolds`."""
    text = open(API_MD).read()
    refs = set(re.findall(
        r"`((?:data|models|ops|parallel|training|evaluation|serving|utils|"
        r"config)\.[\w.]+)`", text))
    assert refs, "extraction regressed"
    for ref in sorted(refs):
        parts = ref.split(".")
        # longest importable prefix, then attribute-walk the rest
        obj = None
        for i in range(len(parts), 0, -1):
            try:
                obj = importlib.import_module(
                    "multimodal_supernovae_tpu." + ".".join(parts[:i]))
                rest = parts[i:]
                break
            except ImportError:
                continue
        assert obj is not None, ref
        for attr in rest:
            obj = getattr(obj, attr, None)
            assert obj is not None, f"{ref} documented but absent"
